package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.C: `Aggregator[IN, BUF, OUT]` is the
  * idiomatic expression-level aggregate extension): element-wise mean
  * of fixed-width double vectors in ONE pass with map-side partials —
  * the buffer is (runningSum[dim], count), merged associatively, so the
  * shuffle carries one buffer per group instead of dim rows (the
  * posexplode + per-dimension groupBy alternative shuffles dim× more
  * rows and aggregates twice).
  */
class VectorMeanAggregator(dim: Int)
  extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    val (sum, n) = b
    var i = 0
    val m = math.min(dim, v.length)
    while (i < m) { sum(i) += v(i); i += 1 }
    (sum, n + 1)
  }

  def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, na) = a
    val (sb, nb) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  def finish(b: (Array[Double], Long)): Array[Double] = {
    val (sum, n) = b
    if (n == 0) sum
    else {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = sum(i) / n; i += 1 }
      out
    }
  }

  // native encoders: the buffer ships as (array<double>, bigint), not
  // java serialization blobs
  def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
