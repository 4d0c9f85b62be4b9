package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Second extension block of the SQL-pass-through surface (SURVEY.md
  * §2.B): ranking/offset window functions, date/time arithmetic,
  * UNPIVOT, exact median, the string-function zoo, and the
  * generator/table-function path (explode over split text). Same
  * determinism conventions as [[Relational]] — final outputs are
  * double/bigint/string/date only, every query totally ordered with a
  * unique tiebreaker.
  */
object Extended2 {

  /** q29: ranking + offset window functions — lead/lag/ntile/
    * percent_rank/cume_dist in one windowed pass (one shuffle on
    * o_custkey; all five functions share the same sort).
    * percent_rank and cume_dist divide exact integers — bit-identical
    * across engines.
    */
  def q29WindowZoo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .filter($"o_custkey" % 50 === 0)
      .select(
        $"o_custkey", $"o_orderkey",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q30: date/time arithmetic zoo — trunc, last_day, day offsets,
    * diffs, ISO weekday. All codegen'd date expressions on the scan.
    */
  def q30Datetime(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderkey" % 100 === 0)
      .select(
        $"o_orderkey",
        to_date($"o_orderdate").as("d"),
        date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
        last_day($"o_orderdate").as("month_end"),
        date_add(to_date($"o_orderdate"), 30).as("plus_30d"),
        datediff(to_date($"o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"),
        (weekday($"o_orderdate") + 1).cast("long").as("isodow"),
        quarter($"o_orderdate").cast("long").as("qtr"))
      .orderBy("o_orderkey")
  }

  /** q31: UNPIVOT/melt — wide metric columns to (metric, value) rows
    * via the Dataset.unpivot API (an Expand node: no shuffle, rows×3
    * emitted straight out of the scan stage).
    */
  def q31Unpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_orderkey" % 500 === 0)
      .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
        $"l_quantity", $"l_discount", $"l_tax")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_discount", $"l_tax"),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")
  }

  /** q32: exact per-group median without a percentile UDF: sort-window
    * row_number + count, keep the middle row (odd n) or both middle
    * rows (even n) and average. Deterministic — unlike interpolating
    * percentile implementations, whose FP op order is engine-specific.
    */
  def q32MedianWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .select($"o_orderpriority", $"o_totalprice",
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy($"o_orderpriority")).as("n"))
      // DIV: Column./ is always double division; the midpoint index must
      // be integer arithmetic to match the oracle's `//`
      .filter($"rn" === expr("(n + 1) DIV 2") || $"rn" === expr("(n + 2) DIV 2"))
      .groupBy($"o_orderpriority")
      .agg((sum($"o_totalprice") / count(lit(1))).as("median_price"),
        max($"n").as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** q33: string-function zoo — all codegen'd scalar expressions chosen
    * for identical semantics in DuckDB (1-based instr, 0-if-absent,
    * etc.).
    */
  def q33StringZoo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .filter($"c_custkey" % 20 === 0)
      .select(
        $"c_custkey",
        length($"c_name").cast("long").as("name_len"),
        reverse($"c_name").as("name_rev"),
        substring_index($"c_name", "#", 1).as("name_prefix"),
        regexp_replace($"c_name", "[0-9]+", "N").as("name_norm"),
        instr($"c_name", "#").cast("long").as("hash_pos"),
        md5($"c_name").as("name_md5"),
        repeat($"c_mktsegment", 2).as("seg2"),
        translate($"c_mktsegment", "AEIOU", "aeiou").as("seg_tr"))
      .orderBy("c_custkey")
  }

  /** q34: generator/table-function path — explode the split word array
    * (a Generate node) and count global top-20 words. The explode
    * multiplies rows inside the scan stage; only the word counts
    * shuffle.
    */
  def q34ExplodeWords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("word"))
      .filter(length($"word") >= 5)
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word".asc)
      .limit(20)
  }

  /** q35: FULL OUTER join — per-customer order counts vs per-user event
    * counts; either side may be missing. Shuffle join on the key with
    * both sides aggregated first (join inputs are one row per key, so
    * the join is the cheap part).
    */
  def q35FullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
      .groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("n_orders"))
    val events = t(s, dir, "events")
      .groupBy($"user_id".as("k")).agg(count(lit(1)).as("n_events"))
    orders.join(events, Seq("k"), "full_outer")
      .select($"k",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_events", lit(0L)).as("n_events"))
      .orderBy("k")
  }

  /** q36: higher-order array functions + map access — transform/filter/
    * aggregate over a collected array, reduced to scalars (array
    * columns never reach the output; the driver compare is
    * scalar-only). HOFs are interpreted in Catalyst, fine here: the
    * arrays are per-group segment lists (≤5 elements), not per-row hot
    * loops.
    */
  def q36ArrayHof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(array_sort(collect_set($"c_mktsegment")).as("segs"))
      .select(
        $"c_nationkey",
        aggregate(transform($"segs", x => length(x)), lit(0),
          (acc, x) => acc + x).cast("long").as("total_len"),
        size(filter($"segs", x => x.startsWith("A"))).cast("long").as("n_a_segs"),
        element_at(map_from_arrays($"segs", transform($"segs", x => length(x))),
          element_at($"segs", 1)).cast("long").as("first_len"),
        regexp_extract(element_at($"segs", -1), "^([A-Z]+)", 1).as("last_word"))
      .orderBy("c_nationkey")
  }

  /** q37: exact discrete quantiles (p25/p50/p75) per group — the q32
    * midpoint mechanism generalized: rank rows once, pick the
    * ceil(p·n)-th value per quantile via conditional aggregation. One
    * shuffle, no sort-to-driver, engine-independent (no interpolation).
    */
  def q37Quantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    def pick(p: Double) =
      max(when($"rn" === greatest(ceil(lit(p) * $"n"), lit(1L)), $"o_totalprice"))
    t(s, dir, "orders")
      .select($"o_orderpriority", $"o_totalprice", $"o_orderkey",
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy($"o_orderpriority")).as("n"))
      .groupBy($"o_orderpriority")
      .agg(
        pick(0.25).as("p25"),
        pick(0.50).as("p50"),
        pick(0.75).as("p75"),
        max($"n").as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_quantiles" -> q37Quantiles,
    "q36_array_hof" -> q36ArrayHof,
    "q35_full_outer" -> q35FullOuter,
    "q29_window_zoo" -> q29WindowZoo,
    "q30_datetime" -> q30Datetime,
    "q31_unpivot" -> q31Unpivot,
    "q32_median_window" -> q32MedianWindow,
    "q33_string_zoo" -> q33StringZoo,
    "q34_explode_words" -> q34ExplodeWords)

  val oracles: Map[String, String] = Map(
    "q37_quantiles" -> """
      WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
          COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT o_orderpriority,
        MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.25 * n) AS BIGINT), 1) THEN o_totalprice END) AS p25,
        MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.50 * n) AS BIGINT), 1) THEN o_totalprice END) AS p50,
        MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.75 * n) AS BIGINT), 1) THEN o_totalprice END) AS p75,
        CAST(MAX(n) AS BIGINT) AS n_orders
      FROM ranked
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q36_array_hof" -> """
      WITH segs AS (
        SELECT c_nationkey, list_sort(list_distinct(list(c_mktsegment))) AS s
        FROM customer GROUP BY c_nationkey)
      SELECT c_nationkey,
        CAST(list_sum(list_transform(s, x -> len(x))) AS BIGINT) AS total_len,
        CAST(len(list_filter(s, x -> starts_with(x, 'A'))) AS BIGINT) AS n_a_segs,
        CAST(len(s[1]) AS BIGINT) AS first_len,
        regexp_extract(s[-1], '^([A-Z]+)', 1) AS last_word
      FROM segs
      ORDER BY c_nationkey""",
    "q35_full_outer" -> """
      SELECT COALESCE(o.k, e.k) AS k,
        COALESCE(o.n_orders, 0) AS n_orders,
        COALESCE(e.n_events, 0) AS n_events
      FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
      FULL OUTER JOIN (SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1) e
        ON o.k = e.k
      ORDER BY k""",
    "q29_window_zoo" -> """
      SELECT o_custkey, o_orderkey,
        LAG(o_totalprice, 1) OVER w AS prev_price,
        LEAD(o_totalprice, 1) OVER w AS next_price,
        CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        PERCENT_RANK() OVER w AS pct_rank,
        CUME_DIST() OVER w AS cume
      FROM orders
      WHERE o_custkey % 50 = 0
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey""",
    "q30_datetime" -> """
      SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS d,
        CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
        CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
        CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr
      FROM orders
      WHERE o_orderkey % 100 = 0
      ORDER BY o_orderkey""",
    "q31_unpivot" -> """
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, metric, value
      FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
        FROM lineitem WHERE l_orderkey % 500 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey % 500 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey % 500 = 0) u
      ORDER BY l_orderkey, l_linenumber, metric""",
    "q32_median_window" -> """
      WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
          COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT o_orderpriority,
        SUM(o_totalprice) / COUNT(*) AS median_price,
        CAST(MAX(n) AS BIGINT) AS n_orders
      FROM ranked
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q33_string_zoo" -> """
      SELECT c_custkey,
        CAST(LENGTH(c_name) AS BIGINT) AS name_len,
        REVERSE(c_name) AS name_rev,
        split_part(c_name, '#', 1) AS name_prefix,
        regexp_replace(c_name, '[0-9]+', 'N', 'g') AS name_norm,
        CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        md5(c_name) AS name_md5,
        repeat(c_mktsegment, 2) AS seg2,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr
      FROM customer
      WHERE c_custkey % 20 = 0
      ORDER BY c_custkey""",
    "q34_explode_words" -> """
      SELECT word, COUNT(*) AS n
      FROM (SELECT UNNEST(string_split_regex(TRIM(text), '\s+')) AS word
            FROM documents)
      WHERE LENGTH(word) >= 5
      GROUP BY word
      ORDER BY n DESC, word ASC
      LIMIT 20""")
}
