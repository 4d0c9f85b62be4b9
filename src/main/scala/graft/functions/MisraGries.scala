package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters sketch as a typed
  * `Aggregator[String, Map[String, Long], Map[String, Long]]` (SURVEY.md
  * §2.C expression-level extension, the [[VectorMeanAggregator]]
  * pattern): at most `k` counters per buffer, so the shuffle carries one
  * fixed-size summary per partition instead of the corpus's full
  * (token, count) table — the sketch half of the sketch-then-verify
  * heavy-hitters pattern (`TextAnalysis.taHeavyHitters`).
  *
  * Guarantees (Misra–Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): after any sequence of reduces and
  * merges over n items, every stored estimate satisfies
  * f(x) − n/(k+1) <= est(x) <= f(x), so every item with true frequency
  * f(x) > n/(k+1) is GUARANTEED present — regardless of partitioning or
  * merge order. The candidate SET varies with merge order (which is why
  * the registered query re-counts candidates exactly before thresholding
  * — its output is deterministic, the sketch is not), but the superset
  * property never does.
  *
  * reduce: count if present; else add if room; else decrement ALL
  * counters by 1, dropping zeros (amortized O(1)). merge: sum counters,
  * then if over k, subtract the (k+1)-th largest count from all and
  * drop non-positives — the mergeable-summaries rule.
  */
class MisraGriesAggregator(k: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        b.iterator.flatMap { case (t, c) =>
          if (c > 1L) Iterator.single(t -> (c - 1L)) else Iterator.empty
        }.toMap
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.valuesIterator.toArray.sortBy(-_).apply(k)
      sum.iterator.flatMap { case (t, c) =>
        if (c > cut) Iterator.single(t -> (c - cut)) else Iterator.empty
      }.toMap
    }
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
