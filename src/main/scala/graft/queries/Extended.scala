package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables.t

/** Extended relational surface: the SQL-pass-through capabilities from
  * SURVEY.md §2.B not already covered by Relational — CUBE/GROUPING
  * SETS, PIVOT, JSON extraction, array/collection functions, EXISTS/IN
  * subqueries through spark.sql, and UNION ALL. All stay declarative so
  * Catalyst owns the physical plan.
  */
object Extended {
  private val D = DecimalType(18, 4)

  /** q18: CUBE over two dims — 4 grouping combinations in one pass
    * (Spark expands to an Expand node: one shuffle, not four scans).
    */
  def q18Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(D)).cast("double").as("revenue"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  /** q19: PIVOT — explicit value list so the schema is static (a
    * dynamic pivot would need an extra distinct-scan job).
    */
  def q19Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("c_mktsegment")
  }

  /** q20: JSON extraction from the events props column + aggregation.
    * get_json_object is codegen'd; schema-on-read without parsing cost
    * for unused keys.
    */
  def q20Json(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .filter($"props".isNotNull)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy("event_type")
  }

  /** q21: EXISTS + scalar subquery through SQL text (the reference's
    * SqlTransform path). Catalyst decorrelates EXISTS into a semi join.
    */
  def q21ExistsSql(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("x_customer")
    t(s, dir, "orders").createOrReplaceTempView("x_orders")
    s.sql("""
      SELECT c_custkey, c_name
      FROM x_customer
      WHERE EXISTS (SELECT 1 FROM x_orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        AND c_acctbal > (SELECT AVG(c_acctbal) FROM x_customer)
      ORDER BY c_custkey
    """)
  }

  /** q22: GROUPING SETS via SQL with GROUPING() disambiguation. */
  def q22GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("x_lineitem")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             COUNT(*) AS n
      FROM x_lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)
  }

  /** q23: collection functions — per-nation sorted list of market
    * segments (collect_set is order-unstable; array_sort makes the
    * result deterministic) + element access.
    */
  def q23ArrayAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(array_sort(collect_set($"c_mktsegment")).as("seg"))
      .select($"c_nationkey",
        array_join($"seg", ",").as("segments"),
        size($"seg").cast("int").as("n_segments"),
        element_at($"seg", 1).as("first_segment"))
      .orderBy("c_nationkey")
  }

  /** q24: UNION ALL + distinct-union parity across two filters. */
  def q24Union(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val big = o.filter($"o_totalprice" > 400000.0)
      .select($"o_orderkey", lit("big").as("tag"))
    val urgent = o.filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 400000.0)
      .select($"o_orderkey", lit("urgent").as("tag"))
    big.unionAll(urgent).orderBy("o_orderkey", "tag")
  }

  /** q25: AS-OF join — each event matched to the most recent order of
    * its user at-or-before the event time. Spark has no native as-of
    * join; per the custom-operator preference order this is option (a),
    * composition of existing ops: UNION both sides keyed by (key, time)
    * and take a running `last(orderCols, ignoreNulls)` window — ONE
    * shuffle on the key, O(n log n) in-partition sort, no range
    * cross-join blowup. Tie-breaks are explicit (orders sort before
    * same-timestamp events; equal order timestamps resolve to the
    * highest order key) so the result is deterministic and
    * hash-comparable against DuckDB's LATERAL form.
    */
  def q25AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id",
        lit(null).cast("struct<od:timestamp,ok:bigint>").as("ord"),
        lit(1).as("tag"))
    val orders = t(s, dir, "orders")
      .select($"o_custkey".as("user_id"), $"o_orderdate".as("ts"),
        lit(null).cast("long").as("event_id"),
        struct($"o_orderdate".as("od"), $"o_orderkey".as("ok")).as("ord"),
        lit(0).as("tag"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"tag".asc, $"ord.ok".asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.unionByName(orders)
      .withColumn("m", last($"ord", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("event_time"),
        $"m.ok".as("matched_orderkey"),
        date_format($"m.od", "yyyy-MM-dd HH:mm:ss").as("matched_orderdate"))
      .orderBy("event_id")
  }

  /** q26: RANGE window frame — per-customer trailing-90-day revenue at
    * each order date. RANGE frames bound by the ORDER BY *value* (epoch
    * day here), so all same-day rows enter the frame together — which
    * also makes the result deterministic under ties, unlike a ROWS
    * frame. One shuffle on o_custkey.
    */
  def q26RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"day")
      .rangeBetween(-90, Window.currentRow)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        datediff(to_date($"o_orderdate"), lit("1990-01-01").cast("date"))
          .cast("long").as("day"),
        $"o_totalprice")
      .withColumn("trailing_90d_revenue",
        sum($"o_totalprice".cast(D)).over(w).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"day", $"trailing_90d_revenue")
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  /** q27: multiset set-ops — EXCEPT ALL / INTERSECT ALL keep duplicate
    * multiplicity (the plain set forms in q8 deduplicate). Exercised on
    * the per-customer status multiset of orders.
    */
  def q27MultisetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    def keys(status: String) =
      o.filter($"o_orderstatus" === status).select($"o_custkey")
    val except = keys("O").exceptAll(keys("F"))
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .select($"o_custkey", $"n", lit("except_all").as("op"))
    val intersect = keys("O").intersectAll(keys("F"))
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .select($"o_custkey", $"n", lit("intersect_all").as("op"))
    except.unionByName(intersect).orderBy("op", "o_custkey")
  }

  /** q28: time-series gap fill — a dense hourly grid per event type
    * with zero-filled missing buckets (regular time grids are what
    * downstream trainers consume). The grid is generated from the
    * global [min,max] hour (one tiny scalar agg) × the distinct type
    * dimension — both broadcast-sized — then left-joined to the actual
    * hourly aggregates; the only real shuffle is the hourly groupBy.
    */
  def q28GapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
      .select(date_trunc("hour", $"ts").as("h"), $"event_type", $"value")
    val grid = e.agg(min($"h").as("mn"), max($"h").as("mx"))
      .select(explode(sequence($"mn", $"mx", expr("interval 1 hour"))).as("h"))
      .crossJoin(e.select($"event_type").distinct())
    val counts = e.groupBy($"h", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast(D)).cast("double").as("sum_value"))
    grid.join(counts, Seq("h", "event_type"), "left")
      .select(
        date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type",
        coalesce($"n", lit(0L)).as("n"),
        coalesce($"sum_value", lit(0.0)).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_cube" -> q18Cube,
    "q19_pivot" -> q19Pivot,
    "q20_json" -> q20Json,
    "q21_exists_sql" -> q21ExistsSql,
    "q22_grouping_sets" -> q22GroupingSets,
    "q23_array_agg" -> q23ArrayAgg,
    "q24_union" -> q24Union,
    "q25_asof_join" -> q25AsofJoin,
    "q26_range_frame" -> q26RangeFrame,
    "q27_multiset_ops" -> q27MultisetOps,
    "q28_gap_fill" -> q28GapFill)

  val oracles: Map[String, String] = Map(
    "q18_cube" -> """
      SELECT o_orderstatus, o_orderpriority,
        COUNT(*) AS n_orders,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q19_pivot" -> """
      SELECT c_mktsegment,
        COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
        COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
        COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q20_json" -> """
      SELECT event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events
      WHERE props IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type""",
    "q21_exists_sql" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      ORDER BY c_custkey""",
    "q22_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q23_array_agg" -> """
      SELECT c_nationkey,
        array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
        CAST(len(list_distinct(list(c_mktsegment))) AS INT) AS n_segments,
        list_sort(list_distinct(list(c_mktsegment)))[1] AS first_segment
      FROM customer
      GROUP BY c_nationkey
      ORDER BY c_nationkey""",
    "q24_union" -> """
      SELECT o_orderkey, tag FROM (
        SELECT o_orderkey, 'big' AS tag FROM orders WHERE o_totalprice > 400000.0
        UNION ALL
        SELECT o_orderkey, 'urgent' AS tag FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000.0) u
      ORDER BY o_orderkey, tag""",
    "q25_asof_join" -> """
      SELECT e.event_id, e.user_id,
        STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS event_time,
        o.o_orderkey AS matched_orderkey,
        STRFTIME(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS matched_orderdate
      FROM events e LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders
        WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON TRUE
      ORDER BY e.event_id""",
    "q26_range_frame" -> """
      SELECT o_custkey, o_orderkey,
        CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
          PARTITION BY o_custkey
          ORDER BY CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
          RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS trailing_90d_revenue
      FROM orders
      ORDER BY o_custkey, day, o_orderkey""",
    "q27_multiset_ops" -> """
      WITH ex AS (
        SELECT o_custkey FROM orders WHERE o_orderstatus='O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus='F'),
      ia AS (
        SELECT o_custkey FROM orders WHERE o_orderstatus='O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus='F')
      SELECT o_custkey, n, op FROM (
        SELECT o_custkey, COUNT(*) AS n, 'except_all' AS op FROM ex GROUP BY o_custkey
        UNION ALL
        SELECT o_custkey, COUNT(*) AS n, 'intersect_all' AS op FROM ia GROUP BY o_custkey) u
      ORDER BY op, o_custkey""",
    "q28_gap_fill" -> """
      WITH e AS (
        SELECT DATE_TRUNC('hour', ts) AS h, event_type, value FROM events),
      grid AS (
        SELECT g.h, t.event_type
        FROM (SELECT UNNEST(generate_series((SELECT MIN(h) FROM e),
                                            (SELECT MAX(h) FROM e),
                                            INTERVAL 1 HOUR)) AS h) g
        CROSS JOIN (SELECT DISTINCT event_type FROM e) t),
      counts AS (
        SELECT h, event_type, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        FROM e GROUP BY h, event_type)
      SELECT STRFTIME(grid.h, '%Y-%m-%d %H:%M:%S') AS hour,
        grid.event_type,
        COALESCE(counts.n, 0) AS n,
        COALESCE(counts.sum_value, 0.0) AS sum_value
      FROM grid LEFT JOIN counts USING (h, event_type)
      ORDER BY hour, event_type""")
}
