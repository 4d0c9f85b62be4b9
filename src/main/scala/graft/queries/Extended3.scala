package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables.t

/** Third extension block of the SQL-pass-through surface (SURVEY.md
  * §2.B): multi-distinct aggregation (Expand), the regex zoo, time-based
  * RANGE INTERVAL window frames, IGNORE NULLS window functions (LOCF),
  * bitwise aggregates, map-typed intermediate columns, correlated scalar
  * subqueries, LATERAL joins, and JSON struct round-trips. Same
  * determinism conventions as [[Relational]]: final outputs are
  * double/bigint/string/date only, every query totally ordered with a
  * unique tiebreaker, double aggregation goes through DECIMAL(18,4) so
  * accumulation order can't perturb bits.
  */
object Extended3 {

  private val D = DecimalType(18, 4)

  /** q38: multi-distinct aggregation — several COUNT(DISTINCT …) over
    * different columns plus a conditional distinct in one GROUP BY.
    * Catalyst plans this with an Expand node (one row replica per
    * distinct group) feeding a single aggregation — no per-distinct
    * re-scan of the input, which is what keeps k distinct measures at
    * one shuffle instead of k at 100 TB.
    */
  def q38MultiDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        countDistinct($"o_custkey").as("n_cust"),
        countDistinct(when($"o_totalprice" > 200000, $"o_custkey")).as("n_big_cust"),
        countDistinct($"o_orderstatus").as("n_status"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** q39: regex zoo — extract with group index, match-count, masking
    * replace, and an anchored match predicate, all on the events props
    * JSON-ish strings. Patterns stay in the Java∩RE2 common subset
    * (no backreferences, no lookaround) so one pattern text runs
    * identically under Spark and DuckDB.
    */
  def q39RegexZoo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .filter($"event_id" % 20 === 0)
      .select(
        $"event_id",
        regexp_extract($"props", "\"k\": ([0-9]+)", 1).as("k_str"),
        regexp_extract($"props", "\"k\": ([0-9]+)", 1).cast("long").as("k_val"),
        regexp_count($"props", lit("[0-9]")).cast("long").as("n_digits"),
        regexp_replace($"props", "[0-9]+", "#").as("masked"),
        $"event_type".rlike("^(click|view)$").as("is_cv"))
      .orderBy("event_id")
  }

  /** q40: time-based RANGE window frame — per-user trailing-1-hour
    * event count and value sum at each event, frame bounded by the
    * ORDER BY timestamp VALUE (`RANGE INTERVAL 1 HOUR PRECEDING`), not
    * by row position — so same-timestamp rows enter together and the
    * result is tie-deterministic. The sum accumulates in DECIMAL so
    * frame-slide order can't perturb double bits. One shuffle on
    * user_id.
    */
  def q40TimeRangeFrame(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("q40_events")
    s.sql("""
      SELECT event_id, user_id, unix_micros(ts) AS ts_us,
        COUNT(*) OVER w AS n_events_1h,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_value_1h
      FROM q40_events
      WHERE user_id % 25 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts_us, event_id""")
  }

  /** q41: IGNORE NULLS window functions — last-observation-carried-
    * forward (LOCF) over a sparsely observed measure, the canonical
    * sensor/feature-fill operation. `last(col, ignoreNulls)` over a
    * running frame + `first(col, ignoreNulls)` over the full partition;
    * one shuffle on user_id, both functions share the sort.
    */
  def q41IgnoreNulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val run = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .filter($"user_id" % 25 === 0)
      .withColumn("obs", when($"event_type" =!= "click", $"value"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"obs",
        last($"obs", ignoreNulls = true).over(run).as("locf_value"),
        first($"obs", ignoreNulls = true).over(full).as("first_obs"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** q42: bitwise aggregates — AND/OR/XOR folds over integer keys per
    * group (fingerprint/bitmap-style reductions), plus scalar shift/xor
    * pre-projection. All codegen'd; partial aggregation applies since
    * the three folds are associative+commutative.
    */
  def q42BitAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_returnflag",
        $"l_orderkey",
        expr("(l_partkey << 3) ^ l_suppkey").as("mixed"))
      .groupBy($"l_returnflag")
      .agg(
        expr("bit_and(l_orderkey)").as("key_and"),
        expr("bit_or(l_orderkey)").as("key_or"),
        expr("bit_xor(l_orderkey)").as("key_xor"),
        expr("bit_xor(mixed)").as("mixed_xor"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** q43: map-typed intermediate columns — per-nation segment→count map
    * assembled with map_from_entries, then consumed with element_at /
    * map_keys / map_values + aggregate. The map never reaches the
    * output (driver compare is scalar-only); the point is the map
    * expression surface over a grouped intermediate.
    */
  def q43MapZoo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"c_nationkey")
      .agg(map_from_entries(collect_list(struct($"c_mktsegment", $"cnt"))).as("m"))
      .select(
        $"c_nationkey".cast("long").as("c_nationkey"),
        size(map_keys($"m")).cast("long").as("n_segs"),
        coalesce(element_at($"m", "BUILDING"), lit(0L)).as("n_building"),
        array_join(array_sort(map_keys($"m")), ",").as("segs"),
        aggregate(map_values($"m"), lit(0L), (acc, x) => acc + x).as("n_customers"))
      .orderBy("c_nationkey")
  }

  /** q44: correlated scalar subqueries in the projection — per-customer
    * order count and max price written as scalar subqueries; Catalyst
    * decorrelates both into ONE left outer aggregate join (check the
    * plan: a single shuffle on o_custkey, not a per-row probe — the
    * form that survives 100 TB).
    */
  def q44CorrelatedScalar(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("q44_customer")
    t(s, dir, "orders").createOrReplaceTempView("q44_orders")
    s.sql("""
      SELECT c_custkey, c_acctbal,
        CAST((SELECT COUNT(*) FROM q44_orders o WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
        (SELECT MAX(o_totalprice) FROM q44_orders o WHERE o.o_custkey = c.c_custkey) AS max_price
      FROM q44_customer c
      WHERE c_custkey % 10 = 0
      ORDER BY c_custkey""")
  }

  /** q45: LATERAL correlated subquery join — top-3 customers by balance
    * per nation, the SQL-standard spelling of per-key top-k. Catalyst
    * rewrites the correlated LIMIT into a ranked window join rather
    * than a per-nation re-scan.
    */
  def q45Lateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("q45_nation")
    t(s, dir, "customer").createOrReplaceTempView("q45_customer")
    s.sql("""
      SELECT n.n_name, t.c_custkey, t.c_acctbal
      FROM q45_nation n,
      LATERAL (SELECT c_custkey, c_acctbal
               FROM q45_customer c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3) t
      ORDER BY n_name, c_acctbal DESC, c_custkey""")
  }

  /** q46: JSON struct round-trip — serialize a typed struct to a JSON
    * string, then re-extract and type the fields. Both engines render
    * compact JSON with shortest-roundtrip doubles, so the string itself
    * is comparable.
    */
  def q46JsonStruct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .filter($"c_custkey" % 50 === 0)
      .select($"c_custkey",
        to_json(named_struct(
          lit("id"), $"c_custkey",
          lit("seg"), $"c_mktsegment",
          lit("bal"), $"c_acctbal")).as("js"))
      .select($"c_custkey", $"js",
        get_json_object($"js", "$.id").cast("long").as("id_back"),
        get_json_object($"js", "$.seg").as("seg_back"),
        get_json_object($"js", "$.bal").cast("double").as("bal_back"))
      .orderBy("c_custkey")
  }

  /** q47: positional generator — posexplode over the token array keeps
    * (pos, word) pairs; the Generate node multiplies rows inside the
    * scan stage, and only the tiny output sorts.
    */
  def q47Posexplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .filter($"doc_id" % 100 === 0)
      .select($"doc_id", posexplode(graft.ops.TextAnalysis.tokens($"text")))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"col".as("word"))
      .orderBy("doc_id", "pos")
  }

  /** q48: month-granularity date arithmetic — add_months clamps to the
    * target month's last day exactly like SQL INTERVAL month addition,
    * so the two engines agree on every end-of-month edge.
    */
  def q48AddMonths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderkey" % 100 === 0)
      .select($"o_orderkey",
        to_date($"o_orderdate").as("d"),
        add_months(to_date($"o_orderdate"), 3).as("plus_3m"),
        add_months(to_date($"o_orderdate"), -1).as("minus_1m"),
        date_trunc("quarter", $"o_orderdate").cast("date").as("quarter_start"))
      .orderBy("o_orderkey")
  }

  /** q49: ordered string aggregation — per-nation sorted name roll-up.
    * collect_list is partition-order-nondeterministic, so the sort
    * INSIDE the aggregate (array_sort before join) is what makes the
    * result reproducible — same contract as SQL string_agg ORDER BY.
    */
  def q49StringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .filter($"c_custkey" % 25 === 0)
      .groupBy($"c_nationkey".cast("long").as("c_nationkey"))
      .agg(array_join(array_sort(collect_list($"c_name")), "|").as("names"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  /** q50: NULL ordering semantics — rank with DESC NULLS LAST and a
    * running non-null count, over a sparsely observed measure. NULL
    * placement is engine-defined unless spelled out; this pins it.
    */
  def q50NullsOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rankW = Window.partitionBy($"user_id")
      .orderBy($"obs".desc_nulls_last, $"event_id".asc)
    t(s, dir, "events")
      .filter($"user_id" % 50 === 0)
      .withColumn("obs", when($"event_type" =!= "click", $"value"))
      .select($"event_id", $"user_id", $"obs",
        row_number().over(rankW).cast("long").as("rnk_nulls_last"),
        count($"obs").over(Window.partitionBy($"user_id")).as("n_obs"))
      .orderBy("user_id", "event_id")
  }

  /** q51: zip_with + sequence — per-order position-weighted quantity
    * fold over the (line_number, quantity)-ordered quantity array (the
    * quantity tiebreak matters: the synthetic lineitem repeats line
    * numbers within an order). The arrays are per-group (≤9 elements),
    * so the interpreted HOF cost is bounded; quantities are small
    * integers in doubles, so the fold is exact in any order.
    */
  def q51ZipWith(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_orderkey" % 50 === 0)
      .groupBy($"l_orderkey")
      .agg(transform(
        sort_array(collect_list(struct($"l_linenumber", $"l_quantity"))),
        x => x.getField("l_quantity")).as("qtys"))
      .select($"l_orderkey",
        size($"qtys").cast("long").as("n_lines"),
        aggregate(
          zip_with(sequence(lit(1), size($"qtys")), $"qtys", (i, q) => i * q),
          lit(0.0), (acc, x) => acc + x).as("weighted_qty"))
      .orderBy("l_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_posexplode" -> q47Posexplode,
    "q48_add_months" -> q48AddMonths,
    "q49_string_agg" -> q49StringAgg,
    "q50_nulls_order" -> q50NullsOrder,
    "q51_zip_with" -> q51ZipWith,
    "q38_multi_distinct" -> q38MultiDistinct,
    "q39_regex_zoo" -> q39RegexZoo,
    "q40_time_range_frame" -> q40TimeRangeFrame,
    "q41_ignore_nulls" -> q41IgnoreNulls,
    "q42_bit_agg" -> q42BitAgg,
    "q43_map_zoo" -> q43MapZoo,
    "q44_correlated_scalar" -> q44CorrelatedScalar,
    "q45_lateral" -> q45Lateral,
    "q46_json_struct" -> q46JsonStruct)

  val oracles: Map[String, String] = Map(
    "q47_posexplode" -> """
      SELECT doc_id,
        unnest(range(0, len(ws))) AS pos,
        unnest(ws) AS word
      FROM (SELECT doc_id,
              list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS ws
            FROM documents
            WHERE doc_id % 100 = 0)
      ORDER BY doc_id, pos""",
    "q48_add_months" -> """
      SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS d,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE) AS minus_1m,
        CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS quarter_start
      FROM orders
      WHERE o_orderkey % 100 = 0
      ORDER BY o_orderkey""",
    "q49_string_agg" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        string_agg(c_name, '|' ORDER BY c_name) AS names,
        COUNT(*) AS n
      FROM customer
      WHERE c_custkey % 25 = 0
      GROUP BY c_nationkey
      ORDER BY c_nationkey""",
    "q50_nulls_order" -> """
      SELECT event_id, user_id,
        CASE WHEN event_type <> 'click' THEN value END AS obs,
        CAST(ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY (CASE WHEN event_type <> 'click' THEN value END) DESC NULLS LAST,
                   event_id ASC) AS BIGINT) AS rnk_nulls_last,
        COUNT(CASE WHEN event_type <> 'click' THEN value END)
          OVER (PARTITION BY user_id) AS n_obs
      FROM events
      WHERE user_id % 50 = 0
      ORDER BY user_id, event_id""",
    "q51_zip_with" -> """
      SELECT l_orderkey,
        CAST(len(qtys) AS BIGINT) AS n_lines,
        list_sum(list_transform(range(len(qtys)), i -> (i + 1) * qtys[i + 1])) AS weighted_qty
      FROM (SELECT l_orderkey,
              array_agg(l_quantity ORDER BY l_linenumber, l_quantity) AS qtys
            FROM lineitem
            WHERE l_orderkey % 50 = 0
            GROUP BY l_orderkey)
      ORDER BY l_orderkey""",
    "q38_multi_distinct" -> """
      SELECT o_orderpriority,
        COUNT(DISTINCT o_custkey) AS n_cust,
        COUNT(DISTINCT CASE WHEN o_totalprice > 200000 THEN o_custkey END) AS n_big_cust,
        COUNT(DISTINCT o_orderstatus) AS n_status,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q39_regex_zoo" -> """
      SELECT event_id,
        regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str,
        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val,
        CAST(len(regexp_extract_all(props, '[0-9]')) AS BIGINT) AS n_digits,
        regexp_replace(props, '[0-9]+', '#', 'g') AS masked,
        regexp_matches(event_type, '^(click|view)$') AS is_cv
      FROM events
      WHERE event_id % 20 = 0
      ORDER BY event_id""",
    "q40_time_range_frame" -> """
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        COUNT(*) OVER w AS n_events_1h,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS sum_value_1h
      FROM events
      WHERE user_id % 25 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts_us, event_id""",
    "q41_ignore_nulls" -> """
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        CASE WHEN event_type <> 'click' THEN value END AS obs,
        last_value(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
        first_value(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_obs
      FROM events
      WHERE user_id % 25 = 0
      ORDER BY user_id, ts_us, event_id""",
    "q42_bit_agg" -> """
      SELECT l_returnflag,
        bit_and(l_orderkey) AS key_and,
        bit_or(l_orderkey) AS key_or,
        bit_xor(l_orderkey) AS key_xor,
        bit_xor(xor(l_partkey << 3, l_suppkey)) AS mixed_xor,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q43_map_zoo" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        COUNT(DISTINCT c_mktsegment) AS n_segs,
        CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS BIGINT) AS n_building,
        string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
        COUNT(*) AS n_customers
      FROM customer
      GROUP BY c_nationkey
      ORDER BY c_nationkey""",
    "q44_correlated_scalar" -> """
      SELECT c_custkey, c_acctbal,
        CAST((SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
        (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
      FROM customer c
      WHERE c_custkey % 10 = 0
      ORDER BY c_custkey""",
    "q45_lateral" -> """
      SELECT n.n_name, t.c_custkey, t.c_acctbal
      FROM nation n,
      LATERAL (SELECT c_custkey, c_acctbal
               FROM customer c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3) t
      ORDER BY n_name, c_acctbal DESC, c_custkey""",
    "q46_json_struct" -> """
      SELECT c_custkey,
        to_json(struct_pack(id := c_custkey, seg := c_mktsegment, bal := c_acctbal)) AS js,
        c_custkey AS id_back,
        c_mktsegment AS seg_back,
        c_acctbal AS bal_back
      FROM customer
      WHERE c_custkey % 50 = 0
      ORDER BY c_custkey""")
}
