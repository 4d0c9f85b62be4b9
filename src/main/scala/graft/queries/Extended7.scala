package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Seventh extension block (SURVEY.md §2.B): completes the temporal
  * join families. As-of family: q25 is the backward cross-table as-of
  * (LATERAL-oracled), q64 the forward-with-tolerance member; q82 adds
  * the SAME-STREAM backward member (event attribution) and — the real
  * point — is the first of the family checked against DuckDB's NATIVE
  * `ASOF JOIN` operator, so the window re-expression is validated by
  * an independent engine-native algorithm rather than another SQL
  * formulation. Range-join family: q63 is the keyless banded
  * self-join; q83 adds interval CONTAINMENT against a bounded
  * interval dimension — the broadcast-side shape (BroadcastNestedLoop
  * on a K-row table) that complements q63's band-bucketed self-join.
  */
object Extended7 {

  /** q82: same-stream AS-OF join — for every click, the latest view
    * of the same user at-or-before it (the attribution form of the
    * kdb/Flint trade-vs-quote primitive; q25/q64 are the cross-table
    * members). Spark lacks the operator; the scale-right formulation is ONE
    * window over the tagged union of both streams: sort each user's
    * events by time with views ordered ahead of clicks at equal
    * timestamps (ASOF's ≤ semantics), then the running max of
    * view-times IS the as-of match — one shuffle on user_id, no
    * row-vs-row probing, no range explosion. The DuckDB oracle uses
    * its NATIVE `ASOF LEFT JOIN`, so two independent algorithms must
    * agree row-for-row.
    *
    * 100 TB shape: one user-keyed exchange + per-user sort (the same
    * shape any sessionization pays); output is integer microseconds
    * end-to-end. A whale user is one sorted partition-slice, not a
    * cross product.
    */
  def q82AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .filter($"event_type".isin("view", "click"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("tus"),
        when($"event_type" === "view", 1).otherwise(0).as("is_view"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"tus".asc, $"is_view".desc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_view_us",
        max(when($"is_view" === 1, $"tus")).over(w))
      .filter($"is_view" === 0)
      .select($"event_id", $"user_id", $"tus".as("click_us"),
        $"last_view_us", ($"tus" - $"last_view_us").as("gap_us"))
      .orderBy("event_id")
  }

  /** Number of quadratically-spaced windows in [[q83RangeWindows]] —
    * small enough to broadcast anywhere, irregular enough that the
    * arithmetic-bucketing shortcut (floor-divide into equal buckets)
    * does NOT apply and a genuine non-equi range join is required.
    */
  val RangeWindowsK = 12L

  /** q83: range (interval) join — events against a table of
    * deterministic, IRREGULAR time windows (quadratic boundaries
    * bᵢ = min + span·i²/K², derived in-plan from the corpus time
    * domain): per window, event/user/purchase counts, empty windows
    * included. The window table is bounded (K rows), so the right
    * plan is a BROADCAST theta-join (BroadcastNestedLoopJoin) — the
    * bounded-side-broadcast discipline every range join at scale
    * needs — followed by a K-key aggregation and a K-row fill join
    * for empty windows. Equal-width windows would reduce to a pure
    * arithmetic bucket map (no join at all); the quadratic spacing is
    * chosen precisely so the operator under test is the join.
    *
    * 100 TB shape: the fact side streams once past K broadcast rows
    * (no shuffle for the join itself); the distinct-user count is the
    * only exchange and is keyed by (w_id) — K keys.
    */
  def q83RangeWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_type")
    val k = RangeWindowsK
    val bounds = ev.agg(min($"tus").as("mn"),
      (max($"tus") - min($"tus") + 1L).as("span"))
    val windows = bounds
      .select(explode(sequence(lit(0L), lit(k - 1L))).as("w_id"),
        $"mn", $"span")
      .select($"w_id",
        // `div`, not `/`: Spark's `/` on longs is DOUBLE division
        expr(s"mn + span * w_id * w_id div ${k * k}").as("w_start_us"),
        expr(s"mn + span * (w_id + 1) * (w_id + 1) div ${k * k}")
          .as("w_end_us"))
    val counts = ev.join(broadcast(windows),
        $"tus" >= $"w_start_us" && $"tus" < $"w_end_us")
      .groupBy($"w_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
    windows.join(counts, Seq("w_id"), "left")
      .select($"w_id", $"w_start_us", $"w_end_us",
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"n_users", lit(0L)).as("n_users"),
        coalesce($"n_purchases", lit(0L)).as("n_purchases"))
      .orderBy("w_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_asof_join" -> q82AsofJoin,
    "q83_range_windows" -> q83RangeWindows)

  val oracles: Map[String, String] = Map(
    // DuckDB's NATIVE ASOF operator — an independent algorithm, not a
    // replay of the Spark window formulation
    "q82_asof_join" -> """
      WITH e AS (
        SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
        FROM events),
      c AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'click'),
      v AS (SELECT user_id, tus FROM e WHERE event_type = 'view')
      SELECT c.event_id, c.user_id, c.tus AS click_us,
        v.tus AS last_view_us, c.tus - v.tus AS gap_us
      FROM c ASOF LEFT JOIN v
        ON c.user_id = v.user_id AND v.tus <= c.tus
      ORDER BY c.event_id""",
    "q83_range_windows" -> s"""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_type FROM events),
      b AS (
        SELECT MIN(tus) AS mn, MAX(tus) - MIN(tus) + 1 AS span FROM e),
      w AS (
        SELECT CAST(i AS BIGINT) AS w_id,
          mn + span * i * i // ($RangeWindowsK * $RangeWindowsK)
            AS w_start_us,
          mn + span * (i + 1) * (i + 1) // ($RangeWindowsK * $RangeWindowsK)
            AS w_end_us
        FROM b, UNNEST(range(0, $RangeWindowsK)) u(i)),
      cnt AS (
        SELECT w_id, CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
        FROM e JOIN w ON tus >= w_start_us AND tus < w_end_us
        GROUP BY w_id)
      SELECT w.w_id, w_start_us, w_end_us,
        COALESCE(n_events, 0) AS n_events,
        COALESCE(n_users, 0) AS n_users,
        COALESCE(n_purchases, 0) AS n_purchases
      FROM w LEFT JOIN cnt ON cnt.w_id = w.w_id
      ORDER BY w.w_id""")
}
