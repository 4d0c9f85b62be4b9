package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed
  * `Aggregator[Long, Array[Byte], Array[Byte]]` over PRE-HASHED 64-bit
  * values (hash with the codegen'd `xxhash64`/`hash` on the way in, so
  * the hot path stays whole-stage; the aggregator only buckets) —
  * Flajolet et al. 2007, with the standard small-range linear-counting
  * correction. The buffer is 2^p one-byte registers (p=12 → 4 KiB, ~1.6%
  * standard error): per input, register hash>>>(64-p) takes
  * max(register, 1 + leading-zeros of the remaining bits).
  *
  * Why it matters at 100 TB: `merge` is an element-wise register MAX —
  * commutative, associative, idempotent — so the sketch state is
  * PARTITION-INDEPENDENT (bit-equal under any split or merge order,
  * spec-pinned) and a persisted 4 KiB register file is a streaming
  * distinct-count state that never grows with the corpus, unlike the
  * md5 table the exact profile keeps. Registered rows-only: DuckDB's
  * approx_count_distinct is a different HLL implementation, so no
  * cross-engine oracle exists by construction.
  */
class HllAggregator(p: Int = HllAggregator.DefaultP)
  extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(p >= 4 && p <= 16, "p in [4,16]")
  private val m = 1 << p

  def zero: Array[Byte] = new Array[Byte](m)

  def reduce(b: Array[Byte], hash: Long): Array[Byte] = {
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rank = (if (w == 0L) (64 - p) else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > b(idx)) b(idx) = rank.toByte
    b
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(b: Array[Byte]): Array[Byte] = b

  def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
  def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
}

object HllAggregator {
  val DefaultP = 12

  /** The HLL cardinality estimate of a register array (deterministic —
    * no randomness anywhere, so the same data always yields the same
    * estimate regardless of partitioning).
    */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / invSum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }
}
