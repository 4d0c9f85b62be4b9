package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative event-time window transforms for StreamingPipeline
  * (SURVEY.md §2.A flags these as a reference gap: the reference only
  * reaches windowed aggregation through opaque user `transform()` code).
  * Each returns a `DataFrame => DataFrame` that drops into
  * `StreamingPipeline(transform = …)` and works identically on batch
  * frames — the property the stream-batch parity specs pin down.
  *
  * At scale: all three compile to streaming state-store aggregations
  * keyed by (window, keys); with a watermark the store evicts closed
  * windows, bounding state by active-window count, not stream length.
  */
object WindowTransforms {

  /** Tumbling window: non-overlapping fixed buckets. */
  def tumbling(tsCol: String, duration: String, keys: Seq[String], aggs: Seq[Column]): DataFrame => DataFrame =
    df => df.groupBy(window(col(tsCol), duration) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding window: overlapping buckets every `slide`. */
  def sliding(tsCol: String, duration: String, slide: String, keys: Seq[String], aggs: Seq[Column]): DataFrame => DataFrame =
    df => df.groupBy(window(col(tsCol), duration, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session window: gap-based dynamic windows (Spark's native
    * session_window — the declarative alternative to the
    * flatMapGroupsWithState sessionizer in [[StatefulTransforms]]).
    */
  def session(tsCol: String, gap: String, keys: Seq[String], aggs: Seq[Column]): DataFrame => DataFrame =
    df => df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
}
