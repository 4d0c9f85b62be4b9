package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded minimum-k selector over (sortKey, id) pairs as a typed
  * `Aggregator` (the [[MisraGriesAggregator]] shell, but EXACT: the k
  * smallest elements of a union are the k smallest of each side's k
  * smallest, so min-k is a lossless mergeable summary — no merge-order
  * sensitivity, no approximation). Buffers never exceed k entries, so a
  * per-key top-k rides ONE map-side-combining aggregation whose shuffle
  * carries ≤ k pairs per (key, partition) — the scale-safe replacement
  * for a key-partitioned rank window, whose per-key sort funnels the
  * whole key's mass through single tasks (measured 26× vs the trunk's
  * 4.9× on the ×100 one-band worst case before this existed).
  *
  * Ordering is the natural (String, Long) tuple order — sortKey
  * ascending, id ascending as the tie-break — matching the md5-rank
  * sampling contract. `finish` returns the winners already sorted, so
  * rank = array position + 1.
  */
class MinKPairsAggregator(k: Int)
  extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private val ord = implicitly[Ordering[(String, Long)]]

  def zero: Seq[(String, Long)] = Seq.empty

  def reduce(b: Seq[(String, Long)], x: (String, Long)): Seq[(String, Long)] =
    if (b.length >= k && ord.lteq(b.last, x)) b // full and x can't win
    else (b :+ x).sorted.take(k)

  def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    (a ++ b).sorted.take(k)

  def finish(b: Seq[(String, Long)]): Seq[(String, Long)] = b

  def bufferEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()

  def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
