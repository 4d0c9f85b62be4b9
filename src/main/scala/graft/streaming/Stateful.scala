package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => SparkOutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming transforms (the gap SURVEY.md §2.A notes: the
  * reference reaches mapGroupsWithState only through user transform()
  * code — here they are first-class, reusable transforms).
  *
  * State lives in Spark's per-key state store (RocksDB/HDFS-backed on a
  * cluster), checkpointed with the query: at scale the working set is
  * bounded by active keys, not stream length, and timeouts evict idle
  * keys.
  */
object StatefulTransforms {

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Per-user running totals via flatMapGroupsWithState in Update mode:
    * each micro-batch folds its events into per-key state and emits the
    * updated totals for keys seen in the batch.
    */
  def runningUserTotals(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        SparkOutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(key, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          events.foreach { e => n += 1; total += e.value }
          val next = UserTotals(key, n, total)
          state.update(next)
          Iterator(next)
      }
      .toDF()
  }

  /** [[runningUserTotals]] on the MODERN arbitrary-stateful API
    * (`transformWithState` + `StatefulProcessor`, SPARK-49564 — the
    * operator Spark 4 positions as the successor to
    * (flat)mapGroupsWithState): per-key state is a named, individually
    * encoded [[ValueState]] in the state store (RocksDB-backed on a
    * cluster, TTL-evictable per state variable, schema-evolvable),
    * instead of one opaque per-key blob. Output is bit-identical to
    * the legacy form on any input (spec-pinned three ways: tws ==
    * fmgws == the batch aggregation) — this is the migration target a
    * production deployment moves its stateful transforms onto, kept
    * beside the legacy form so both surfaces stay exercised.
    */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var totals: ValueState[UserTotals] = _
    override def init(outputMode: SparkOutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals](
        "totals", Encoders.product[UserTotals], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserTotals] = {
      val prev =
        if (totals.exists()) totals.get() else UserTotals(key, 0L, 0.0)
      var n = prev.n_events
      var total = prev.total_value
      rows.foreach { e => n += 1; total += e.value }
      val next = UserTotals(key, n, total)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Per-user running totals via the transformWithState processor —
    * the modern twin of [[runningUserTotals]].
    */
  def runningUserTotalsTws(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), SparkOutputMode.Update())
      .toDF()
  }

  final case class SessionState(nEvents: Long, lastSeenMs: Long)
  final case class SessionOut(user_id: Long, n_events: Long)

  /** Gap-based session aggregation with processing-time timeout:
    * a key's session closes (and emits) when no event arrives within
    * `gap`. The timeout eviction is what keeps state bounded on an
    * unbounded stream.
    */
  def sessionize(df: DataFrame, gap: String = "30 minutes"): Dataset[SessionOut] = {
    val s = df.sparkSession
    import s.implicits._
    df.select("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        SparkOutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: Long, events: Iterator[UserEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st => SessionOut(key, st.nEvents))
            state.remove()
            out.iterator
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val n = prev.nEvents + events.size
            state.update(SessionState(n, System.currentTimeMillis()))
            state.setTimeoutDuration(gap)
            Iterator.empty
          }
      }
  }
}
