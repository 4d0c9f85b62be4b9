package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed
  * `Aggregator[Seq[Int], Array[Long], Array[Long]]` over PRE-COMPUTED
  * cell indices: the `depth` cells of a token are derived OUTSIDE the
  * aggregator from codegen'd SQL functions (md5 → hex prefix → int, see
  * [[CountMinAggregator.cellsOf]] for the exact nibble layout), so the
  * whole hot path up to the aggregation buffer stays in whole-stage
  * codegen and the aggregator itself is pure integer adds.
  *
  * The buffer is a flat depth×width long array; `merge` is element-wise
  * SUM — commutative and associative — so the sketch state is
  * PARTITION-INDEPENDENT (bit-equal under any split or merge order,
  * ScalaCheck-pinned) and a persisted array is a constant-size streaming
  * frequency state, the estimate twin of the Misra-Gries candidate
  * sketch. Unlike Misra-Gries (top-k candidates), CMS answers point
  * frequency queries for ANY token with a one-sided error: the estimate
  * `min over rows of bucket sum` never under-counts, and over-counts
  * only by hash-collision mass (≤ 2·n/width with probability
  * 1 − 2^-depth).
  *
  * Everything is exact integer arithmetic on md5-derived cells, so the
  * same sketch — and the same estimates — come out of any engine with an
  * md5, which is what makes the registered query DuckDB-oracle-checkable
  * (unlike the HLL register sketch, where no cross-engine twin exists).
  */
class CountMinAggregator(depth: Int, width: Int)
  extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 2, "depth >= 1, width >= 2")

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(b: Array[Long], cells: Seq[Int]): Array[Long] = {
    var r = 0
    while (r < depth) {
      b(r * width + cells(r)) += 1L
      r += 1
    }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {
  /** Default geometry: 4 rows × 4096 columns = 128 KiB of longs. At
    * width 4096 the expected collision over-count on a 10^6-token corpus
    * is ~250 per row minimum-ed across 4 independent rows — small enough
    * that bench-scale heavy tokens rank correctly, constant-size at any
    * corpus scale.
    */
  val DefaultDepth = 4
  val DefaultWidth = 4096

  /** Row r's cell = the 3 hex chars of md5(token) at 1-based positions
    * 8r+1 … 8r+3, read as one base-16 integer (values 0‥4095). Rows use
    * disjoint 3-of-8 char windows of the same digest, so one md5 per
    * token serves all four rows; the identical bytes come out of Spark's
    * codegen'd `conv(substring(md5(x), 8*r+1, 3), 16, 10)` and DuckDB's
    * per-nibble `strpos('0123456789abcdef', substr(md5(x), …, 1)) - 1`
    * arithmetic — the cross-engine contract the oracle replays.
    *
    * At the default width 4096 the 3-nibble value IS the cell (mod is
    * identity — which is what lets the SQL side skip the modulo);
    * narrower sketches fold it with a plain mod.
    */
  def cellsOf(token: String, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    Array.tabulate(depth)(r =>
      Integer.parseInt(hex.substring(8 * r, 8 * r + 3), 16) % width)
  }

  /** Point-frequency estimate: min over rows of the token's bucket. */
  def estimate(sketch: Array[Long], cells: Array[Int], width: Int = DefaultWidth): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < cells.length) {
      val v = sketch(r * width + cells(r))
      if (v < m) m = v
      r += 1
    }
    m
  }
}
