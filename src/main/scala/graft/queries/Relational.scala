package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables.t

/** Relational query surface (SURVEY.md §2.B): the full set of relational
  * capabilities reachable through the reference's `SqlTransform`
  * pass-through (reference: examples/batch.py:251-293), re-expressed with
  * the declarative DataFrame API so Catalyst performs pushdown, pruning,
  * join selection, and whole-stage codegen.
  *
  * Determinism conventions (the driver hash-compares against a DuckDB
  * oracle):
  *  - money/quantity aggregates go through DECIMAL(18,4) INTERNALLY so
  *    sums are exact and order-independent (double summation is not),
  *    but the FINAL projection is always DOUBLE/BIGINT/STRING — never
  *    decimal. The driver loads the oracle via DuckDB→pandas (decimal →
  *    float64) but Spark parquet decimals arrive as python Decimal
  *    objects, so a decimal output column hash-mismatches even when
  *    values are equal. Decimal→double is correctly rounded in both
  *    engines, so casting the exact sum to double is bit-deterministic;
  *  - averages = exact decimal sum cast to double, divided by count
  *    (single IEEE division — bit-identical across engines);
  *  - DuckDB SUM(BIGINT) yields HUGEINT (→ float64 in pandas): oracle
  *    SQL must CAST integer sums back to BIGINT;
  *  - every result has a total ORDER BY with a unique tiebreaker;
  *  - timestamps are never echoed raw (physical unit mismatch ms/us/ns);
  *    they are projected as DATE or formatted strings.
  */
object Relational {
  private val D = DecimalType(18, 4)
  private def dec(c: org.apache.spark.sql.Column) = sum(c.cast(D)).cast("double")

  /** Money arithmetic is done in exact DECIMAL, not double: the source
    * columns are 2-dp money values, so products have ≤6 decimal places and
    * decimal multiplication is exact + order-independent. Summing computed
    * DOUBLEs instead would make results depend on partition merge order —
    * unacceptable when a DuckDB oracle hash-compares the output.
    */
  private val M = DecimalType(14, 2)   // raw money column
  private val F = DecimalType(6, 4)    // (1±small factor), exact at 4 dp
  private def money(c: org.apache.spark.sql.Column) = c.cast(M)
  private def factor(c: org.apache.spark.sql.Column) = c.cast(F)

  /** q1: TPC-H Q1-style pricing summary. Partial aggregation (map-side
    * combine) happens automatically for sum/count; at 100 TB this is one
    * shuffle of ~6 groups — the scan dominates, as it should.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("2001-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dec($"l_quantity").as("sum_qty"),
        dec($"l_extendedprice").as("sum_base_price"),
        sum(money($"l_extendedprice") * factor(lit(1.0) - $"l_discount"))
          .cast("double").as("sum_disc_price"),
        sum(money($"l_extendedprice") * factor(lit(1.0) - $"l_discount") * factor(lit(1.0) + $"l_tax"))
          .cast("double").as("sum_charge"),
        (sum($"l_quantity".cast(D)).cast("double") / count(lit(1))).as("avg_qty"),
        (sum($"l_extendedprice".cast(D)).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q2: filter + projection + scalar string functions. The filter and the
    * 3-column projection both push into the parquet scan (PushedFilters /
    * ReadSchema) — at 100 TB only the needed columns are read.
    */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_totalprice" > 450000.0 && $"o_orderstatus" =!= "P")
      .select(
        $"o_orderkey",
        upper($"o_orderpriority").as("priority_uc"),
        lower($"o_orderstatus").as("status_lc"),
        $"o_totalprice".as("price"))
      .orderBy("o_orderkey")
  }

  /** q3: join + aggregation. customer is small relative to orders at every
    * SF → broadcast-hash join (no shuffle of the orders side).
    */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        dec($"o_totalprice").as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** q4: five-table star join — revenue per nation. Dimension chain
    * region→nation→customer stays broadcast; only lineitem⋈orders is a
    * real (shuffle) join, and AQE may convert it too at small SF.
    */
  def q4StarJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dims = broadcast(
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"n_name", $"r_name"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(dims, $"o_custkey" === $"c_custkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum(money($"l_extendedprice") * factor(lit(1.0) - $"l_discount"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** q5: window functions — top-3 orders per customer by price.
    * Single shuffle on o_custkey; rank tiebreak on o_orderkey keeps the
    * result deterministic.
    */
  def q5WindowTopPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        row_number().over(w).cast("long").as("rn"),
        sum($"o_totalprice".cast(D)).over(Window.partitionBy($"o_custkey")).cast("double").as("cust_total"))
      .filter($"rn" <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** q6: distinct (dropDuplicates → partial+final HashAggregate). */
  def q6Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_nationkey", $"c_mktsegment")
      .distinct()
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** q7: global top-k → TakeOrderedAndProject (no full sort: each
    * partition keeps k rows, driver merges — the only safe "global sort"
    * pattern at 100 TB).
    */
  def q7TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  /** q8: set operations — customers that placed both an 'F' and an 'O'
    * order, minus those who also placed a 'P' order (INTERSECT + EXCEPT).
    */
  def q8SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    def keys(status: String) =
      o.filter($"o_orderstatus" === status).select($"o_custkey")
    keys("F").intersect(keys("O")).except(keys("P"))
      .orderBy("o_custkey")
  }

  /** q9: anti join — customers with no pending ('P') orders. Catalyst
    * runs this as a broadcast/shuffled hash anti-join; NOT EXISTS in SQL.
    */
  def q9AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pending = t(s, dir, "orders").filter($"o_orderstatus" === "P")
    t(s, dir, "customer")
      .join(pending, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy("c_custkey")
  }

  /** q9b: semi join — suppliers in nations that have customers. */
  def q9SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "supplier")
      .join(t(s, dir, "customer"), $"s_nationkey" === $"c_nationkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy("s_suppkey")
  }

  /** q10: ROLLUP — revenue by region/nation with subtotals + grand total.
    * grouping() distinguishes rollup-generated nulls.
    */
  def q10Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val joined = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
    joined
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"), dec($"o_totalprice").as("revenue"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** q11: scalar expression zoo — casts, CASE WHEN, string + date
    * functions. All stay inside whole-stage codegen.
    */
  def q11Scalars(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderkey" % 100 === 0)
      .select(
        $"o_orderkey",
        concat_ws("-", lit("ord"), $"o_orderkey".cast("string")).as("tag"),
        substring($"o_orderpriority", 1, 1).as("prio_code"),
        lpad($"o_orderstatus", 3, "_").as("status_pad"),
        year($"o_orderdate").cast("int").as("order_year"),
        month($"o_orderdate").cast("int").as("order_month"),
        to_date($"o_orderdate").as("order_date"),
        when($"o_totalprice" > 250000.0, lit("big"))
          .when($"o_totalprice" > 100000.0, lit("mid"))
          .otherwise(lit("small")).as("size_class"),
        ($"o_totalprice" / 1000.0).as("price_k"))
      .orderBy("o_orderkey")
  }

  /** q12: HAVING — priorities with above-threshold order counts. */
  def q12Having(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .filter($"n_orders" > 10)
      .orderBy("o_orderpriority")
  }

  /** q13: conditional aggregation (TPC-H Q14 pattern). */
  def q13CaseAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(when($"l_returnflag" =!= "R", 1L).otherwise(0L)).as("n_kept"),
        dec(when($"l_returnflag" === "R", $"l_extendedprice").otherwise(lit(0.0))).as("returned_value"))
      .orderBy("l_linestatus")
  }

  /** q14: correlated-subquery shape — orders whose price is above their
    * customer's average order price. Expressed as join-with-aggregate
    * (what Catalyst decorrelates EXISTS/IN subqueries into anyway).
    */
  def q14AboveCustAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val avgByCust = o.groupBy($"o_custkey".as("k"))
      .agg((sum($"o_totalprice".cast(D)).cast("double") / count(lit(1))).as("avg_price"))
    o.join(avgByCust, $"o_custkey" === $"k")
      .filter($"o_totalprice" > $"avg_price" * 1.5)
      .select($"o_orderkey", $"o_custkey")
      .orderBy("o_orderkey")
  }

  /** q15: SQL pass-through — the reference's SqlTransform component
    * executes arbitrary SQL against temp views
    * (reference: examples/batch.py:286-293). Same text goes through
    * spark.sql here.
    */
  def q15SqlPassthrough(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("q15_lineitem")
    s.sql("""
      SELECT l_returnflag,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM q15_lineitem
      WHERE l_discount BETWEEN 0.02 AND 0.08
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  }

  /** q16: tumbling-window aggregation over the events table (batch
    * equivalent of a streaming windowed agg). Window key projected as a
    * formatted string to avoid timestamp physical-unit mismatch.
    */
  def q16EventsHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        dec($"value").as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy("hour", "event_type")
  }

  /** q17: gap-based sessionization over events — lag + cumulative sum
    * window pattern; one shuffle on user_id covers both windows.
    */
  def q17Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val gapUs = 30 * 60 * 1000000L
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts",
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(byUser)).as("gap"))
      .select($"user_id", $"event_id", $"ts",
        sum(when($"gap".isNull || $"gap" > gapUs, 1L).otherwise(0L))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_id"))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_filter_project" -> q2FilterProject,
    "q3_join_agg" -> q3JoinAgg,
    "q4_star_join" -> q4StarJoin,
    "q5_window_top_per_key" -> q5WindowTopPerKey,
    "q6_distinct" -> q6Distinct,
    "q7_topk" -> q7TopK,
    "q8_setops" -> q8SetOps,
    "q9_anti_join" -> q9AntiJoin,
    "q9b_semi_join" -> q9SemiJoin,
    "q10_rollup" -> q10Rollup,
    "q11_scalars" -> q11Scalars,
    "q12_having" -> q12Having,
    "q13_case_agg" -> q13CaseAgg,
    "q14_above_cust_avg" -> q14AboveCustAvg,
    "q15_sql_passthrough" -> q15SqlPassthrough,
    "q16_events_hourly" -> q16EventsHourly,
    "q17_sessionize" -> q17Sessionize)

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0-l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0-l_discount AS DECIMAL(6,4)) * CAST(1.0+l_tax AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)/COUNT(*) AS avg_qty,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)/COUNT(*) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_project" -> """
      SELECT o_orderkey,
        UPPER(o_orderpriority) AS priority_uc,
        LOWER(o_orderstatus) AS status_lc,
        o_totalprice AS price
      FROM orders
      WHERE o_totalprice > 450000.0 AND o_orderstatus <> 'P'
      ORDER BY o_orderkey""",
    "q3_join_agg" -> """
      SELECT c_mktsegment,
        COUNT(*) AS n_orders,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q4_star_join" -> """
      SELECT r_name, n_name,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0-l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",
    "q5_window_top_per_key" -> """
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS VARCHAR) AS DOUBLE) AS cust_total
        FROM orders) x
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",
    "q6_distinct" -> """
      SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      ORDER BY c_nationkey, c_mktsegment""",
    "q7_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q8_setops" -> """
      SELECT o_custkey FROM (
        (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus='O')
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus='P') x
      ORDER BY o_custkey""",
    "q9_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      ORDER BY c_custkey""",
    "q9b_semi_join" -> """
      SELECT s_suppkey, s_name FROM supplier
      WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = s_nationkey)
      ORDER BY s_suppkey""",
    "q10_rollup" -> """
      SELECT r_name, n_name,
        COUNT(*) AS n_orders,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "q11_scalars" -> """
      SELECT o_orderkey,
        'ord-' || CAST(o_orderkey AS VARCHAR) AS tag,
        SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
        LPAD(o_orderstatus, 3, '_') AS status_pad,
        CAST(YEAR(o_orderdate) AS INT) AS order_year,
        CAST(MONTH(o_orderdate) AS INT) AS order_month,
        CAST(o_orderdate AS DATE) AS order_date,
        CASE WHEN o_totalprice > 250000.0 THEN 'big'
             WHEN o_totalprice > 100000.0 THEN 'mid'
             ELSE 'small' END AS size_class,
        o_totalprice / 1000.0 AS price_k
      FROM orders
      WHERE o_orderkey % 100 = 0
      ORDER BY o_orderkey""",
    "q12_having" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_orderpriority
      HAVING COUNT(*) > 10
      ORDER BY o_orderpriority""",
    "q13_case_agg" -> """
      SELECT l_linestatus,
        SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS n_returned,
        SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        CAST(CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS returned_value
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus""",
    "q14_above_cust_avg" -> """
      SELECT o_orderkey, o_custkey
      FROM orders
      JOIN (SELECT o_custkey AS k,
              CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)/COUNT(*) AS avg_price
            FROM orders GROUP BY o_custkey) a
        ON o_custkey = k
      WHERE o_totalprice > avg_price * 1.5
      ORDER BY o_orderkey""",
    "q15_sql_passthrough" -> """
      SELECT l_returnflag,
        COUNT(*) AS n_items,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE l_discount BETWEEN 0.02 AND 0.08
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q16_events_hourly" -> """
      SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        event_type,
        COUNT(*) AS n_events,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2""",
    "q17_sessionize" -> """
      WITH gaps AS (
        SELECT user_id, event_id, ts,
          EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
        FROM events),
      sess AS (
        SELECT user_id, event_id,
          CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM gaps)
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")
}
