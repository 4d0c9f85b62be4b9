package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Fourth extension block of the SQL-pass-through surface (SURVEY.md
  * §2.B): error-safe (`try_*`) arithmetic and casts, map higher-order
  * functions, a second array higher-order-function zoo, and GROUPING
  * SETS introspection via grouping()/grouping_id semantics. Same
  * determinism conventions as [[Relational]].
  */
object Extended4 {

  /** q52: error-safe arithmetic — try_divide (null on zero divisor),
    * try_add at Long.MaxValue (null on overflow instead of a thrown
    * error), try_cast of non-numeric and numeric strings, and
    * try_element_at past the end of an array. ANSI-mode pipelines keep
    * running on dirty data because of exactly these forms; each maps to
    * an explicit CASE guard in engines without try_ variants.
    */
  def q52TryArithmetic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_orderkey" % 37 === 0 && $"l_linenumber" === 1)
      .select(
        $"l_orderkey",
        expr("try_divide(l_extendedprice, l_quantity - 25.0)").as("per_off25"),
        expr("try_add(9223372036854775807L, l_orderkey + 1)").as("overflowed"),
        expr("try_cast(l_returnflag AS DOUBLE)").as("flag_num"),
        expr("try_cast(cast(l_quantity AS STRING) AS DOUBLE)").as("qty_rt"),
        expr("try_element_at(array(l_quantity, l_discount), 5)").as("oob"))
      .orderBy("l_orderkey")
  }

  /** q53: map higher-order functions — a per-user map of event-type
    * counts transformed with transform_keys / transform_values /
    * map_filter and reduced back to scalars with aggregate over
    * map_values. The map stays an INTERMEDIATE (final schema is
    * scalar-only); the oracle computes the same reductions relationally.
    */
  def q53MapZoo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"user_id")
      .agg(map_from_entries(
        array_sort(collect_list(struct($"event_type", $"cnt")))).as("m"))
      .select(
        $"user_id",
        size($"m").cast("long").as("n_types"),
        concat_ws(",",
          array_sort(map_keys(transform_keys($"m", (k, _) => upper(k))))).as("keys_str"),
        aggregate(map_values(transform_values($"m", (_, v) => v * 2L)),
          lit(0L), (acc, x) => acc + x).as("doubled_sum"),
        aggregate(map_values(map_filter($"m", (_, v) => v >= 3L)),
          lit(0L), (acc, x) => acc + x).as("busy_sum"))
      .orderBy("user_id")
  }

  /** q54: array higher-order functions, second zoo — exists / forall /
    * filter + element_at (first match), array_distinct, array_remove,
    * slice on a per-order quantity array assembled in linenumber order.
    */
  def q54ArrayZoo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_orderkey" % 19 === 0)
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_list(struct($"l_linenumber", $"l_quantity"))).as("ln"))
      .select($"l_orderkey",
        transform($"ln", e => e.getField("l_quantity")).as("arr"))
      .select(
        $"l_orderkey",
        size($"arr").cast("long").as("n"),
        size(array_distinct($"arr")).cast("long").as("n_distinct"),
        exists($"arr", x => x > 45.0).as("has_gt45"),
        forall($"arr", x => x > 0.0).as("all_pos"),
        try_element_at(filter($"arr", x => x > 40.0), lit(1)).as("first_gt40"),
        size(array_remove($"arr", 1.0)).cast("long").as("n_no_ones"),
        aggregate(slice($"arr", 1, 3), lit(0.0), (acc, x) => acc + x).as("head3_sum"))
      .orderBy("l_orderkey")
  }

  /** q55: GROUPING SETS with grouping() introspection — subtotal rows
    * are labeled by the grouping bitmask built explicitly from
    * grouping(col) terms (portable across engines, unlike native
    * grouping_id() whose bit order is a per-engine convention).
    * One Expand + one aggregation, like q22.
    */
  def q55GroupingId(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("x_orders")
    s.sql("""
      SELECT
        coalesce(o_orderstatus, '<all>') AS status,
        coalesce(o_orderpriority, '<all>') AS priority,
        CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM x_orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY gid, status, priority""")
  }

  /** q56: string-function zoo 2 + width_bucket histogramming — the
    * SQL-standard bucketing function plus split_part / translate /
    * lpad / repeat / reverse, none exercised by q33's first string zoo.
    * All run identically under Spark and DuckDB (pure codegen, one
    * scan).
    */
  def q56StringBucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .filter($"event_id" % 13 === 0)
      .select(
        $"event_id",
        expr("width_bucket(value, 0.0, 100.0, 10)").as("vbucket"),
        expr("split_part(event_type, 'i', 1)").as("et_head"),
        translate($"event_type", "aeiou", "AEIOU").as("et_caps"),
        lpad($"event_type", 10, ".").as("et_pad"),
        repeat(substring($"event_type", 1, 2), 3).as("et_rep"),
        reverse($"event_type").as("et_rev"))
      .orderBy("event_id")
  }

  /** q57: mode() / str_to_map / percentile_disc. Attributes are packed
    * into a 'k:v;k:v' string, parsed back with str_to_map, and the
    * grouped aggregation takes the modal band plus DISCRETE percentiles.
    * percentile_disc always returns an actual data value, so it is
    * engine-portable; percentile_cont is deliberately avoided — its
    * interpolation op ORDER differs across engines, which breaks
    * hash-exactness on the last ulp. The mode's band split (quantity
    * <= 40 → ~4:1 majority) makes the modal value tie-free by
    * construction, sidestepping cross-engine tie-break divergence.
    */
  def q57ModePercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_quantity",
        expr("""str_to_map(
          concat('band:', CASE WHEN l_quantity <= 40.0 THEN 'common' ELSE 'rare' END,
                 ';qty:', CAST(CAST(l_quantity AS INT) AS STRING)),
          ';', ':')""").as("m"))
      .select($"l_returnflag", $"l_quantity",
        expr("m['band']").as("band"),
        expr("CAST(m['qty'] AS INT)").as("qty_i"))
      .groupBy($"l_returnflag")
      .agg(
        expr("mode(band)").as("mode_band"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY qty_i) AS BIGINT)")
          .as("med_qty"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)")
          .as("q1_qty"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)")
          .as("p90_qty"),
        count(lit(1)).as("n"),
        sum(when($"band" === "common", 1L).otherwise(0L)).as("n_common"))
      .orderBy("l_returnflag")
  }

  /** q58: correlation/regression statistics with ENGINE-EXACT moments —
    * the dq_anomaly integer-quantization trick applied to bivariate
    * stats. The built-in corr()/regr_slope() aggregates accumulate
    * floats in partition order (non-reproducible bit patterns), so
    * instead x quantizes to whole units and y to whole dollars, the
    * five moment sums accumulate as BIGINTs (order-free), and
    * corr/slope/intercept/r² re-derive through a fixed IEEE op chain
    * both engines replay bit-identically. A spec cross-checks the
    * derived values against Spark's built-in corr()/regr_slope() to
    * 1e-9 relative, so the portable form provably computes the standard
    * statistics. y = revenue (extendedprice × (1−discount)) against
    * x = extendedprice (whole dollars): a genuinely correlated pair
    * whose slope ≈ the mean discount retention.
    */
  def q58CorrRegression(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = $"n".cast("double")
    val mx = $"sx".cast("double") / n
    val my = $"sy".cast("double") / n
    val cov = $"sxy".cast("double") / n - mx * my
    val varX = $"sxx".cast("double") / n - mx * mx
    val varY = $"syy".cast("double") / n - my * my
    val corrC = cov / (sqrt(varX) * sqrt(varY))
    val slope = cov / varX
    t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus",
        floor($"l_extendedprice" + 0.5).cast("long").as("qx"),
        floor($"l_extendedprice" * (lit(1.0) - $"l_discount") + 0.5)
          .cast("long").as("qy"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum($"qx").as("sx"), sum($"qy").as("sy"),
        sum($"qx" * $"qx").as("sxx"), sum($"qy" * $"qy").as("syy"),
        sum($"qx" * $"qy").as("sxy"))
      .select($"l_returnflag", $"l_linestatus", $"n",
        corrC.as("corr_xy"), slope.as("slope"),
        (my - slope * mx).as("intercept"),
        (corrC * corrC).as("r2"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q59: scalar bit-manipulation zoo — bit_count popcount, shifts,
    * and/or/xor masks, and hex rendering (two's-complement 64-bit for
    * both engines). Complements q42's bitwise AGGREGATES with the
    * scalar forms; all pure codegen over one scan.
    */
  def q59BitOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderkey" % 31 === 0)
      .select(
        $"o_orderkey",
        bit_count($"o_orderkey").cast("long").as("popcount"),
        shiftleft($"o_orderkey", 3).as("shl3"),
        shiftright($"o_orderkey", 2).as("shr2"),
        ($"o_orderkey".bitwiseAND(lit(255L))).as("low_byte"),
        ($"o_orderkey".bitwiseOR(lit(4096L))).as("with_flag"),
        ($"o_orderkey".bitwiseXOR(lit(255L))).as("flipped"),
        hex($"o_orderkey").as("hx"))
      .orderBy("o_orderkey")
  }

  /** q60: array SET operations — array_intersect / array_union /
    * array_except / flatten over per-order quantity sets against a
    * constant probe array. Outputs render as sorted comma-joined INT
    * strings: the driver compare rejects LIST-typed columns, and
    * sorting canonicalizes the (engine-unspecified) set-op element
    * order, so the strings are hash-exact.
    */
  def q60ArraySetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probe = array((10 to 50 by 10).map(i => lit(i)): _*)
    t(s, dir, "lineitem")
      .filter($"l_orderkey" % 23 === 0)
      .groupBy($"l_orderkey")
      .agg(array_sort(array_distinct(collect_list($"l_quantity".cast("int"))))
        .as("arr"))
      .select(
        $"l_orderkey",
        concat_ws(",", array_sort(array_intersect($"arr", probe))).as("inter_s"),
        concat_ws(",", array_sort(array_union($"arr", probe))).as("union_s"),
        concat_ws(",", array_sort(array_except($"arr", probe))).as("except_s"),
        concat_ws(",", flatten(array($"arr", probe))).as("flat_s"),
        size(array_intersect($"arr", probe)).cast("long").as("n_inter"))
      .orderBy("l_orderkey")
  }

  /** q61: recursive CTE hierarchy walk (Spark 4's WITH RECURSIVE) —
    * region → nation → customer as a parent/child tree, each node
    * carrying its ROOT region down the recursion; the aggregate then
    * reports subtree sizes and an id checksum per (root, depth). A tree
    * walk recurses in O(depth) rounds with no path explosion (every
    * node has exactly one parent), so the recursion is scale-safe —
    * each round is one join of the frontier against the edge table,
    * exactly the label-propagation shape the dedup connected-components
    * operators run. The oracle runs the IDENTICAL text in DuckDB
    * (shared recursive-SQL dialect).
    */
  def q61RecursiveHierarchy(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "region").createOrReplaceTempView("q61_region")
    t(s, dir, "nation").createOrReplaceTempView("q61_nation")
    t(s, dir, "customer").createOrReplaceTempView("q61_customer")
    s.sql(q61Sql("q61_region", "q61_nation", "q61_customer"))
  }

  private def q61Sql(region: String, nation: String, customer: String): String = s"""
      WITH RECURSIVE edges AS (
        SELECT 'R' || CAST(r_regionkey AS STRING) AS parent,
               'N' || CAST(n_nationkey AS STRING) AS child,
               CAST(n_nationkey AS BIGINT) AS child_key
        FROM $nation JOIN $region ON n_regionkey = r_regionkey
        UNION ALL
        SELECT 'N' || CAST(c_nationkey AS STRING) AS parent,
               'C' || CAST(c_custkey AS STRING) AS child,
               CAST(c_custkey AS BIGINT) AS child_key
        FROM $customer),
      walk(node, root, depth, node_key) AS (
        SELECT 'R' || CAST(r_regionkey AS STRING),
               'R' || CAST(r_regionkey AS STRING),
               0, CAST(r_regionkey AS BIGINT)
        FROM $region
        UNION ALL
        SELECT e.child, w.root, w.depth + 1, e.child_key
        FROM walk w JOIN edges e ON e.parent = w.node)
      SELECT root, CAST(depth AS BIGINT) AS depth,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(node_key) AS BIGINT) AS key_sum
      FROM walk
      GROUP BY root, depth
      ORDER BY root, depth"""

  /** The oracle is the same recursive SQL over the raw tables. */
  private[queries] def q61Oracle: String =
    q61Sql("region", "nation", "customer")

  /** q62: strict-order funnel analysis over the events stream — per
    * user, the first 'view', the first 'click' strictly AFTER that
    * view, and the first 'purchase' strictly after that click (the
    * standard conversion-funnel contract: later stages can't borrow
    * events that preceded the earlier stage). Three conditional-min
    * aggregations chained by broadcast-joined thresholds — each stage
    * is one groupBy(user) with map-side partials, no window over the
    * raw stream and no self-join on events; at scale the funnel costs
    * three aggregations of (user, ts) pairs regardless of event volume.
    * Timestamps ship as epoch micros (the q28/q40 parity convention).
    */
  def q62Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t_view"))
    val c = ev.filter($"event_type" === "click")
      .join(broadcast(v), "user_id")
      .filter($"us" > $"t_view")
      .groupBy($"user_id").agg(min($"us").as("t_click"))
    val p = ev.filter($"event_type" === "purchase")
      .join(broadcast(c), "user_id")
      .filter($"us" > $"t_click")
      .groupBy($"user_id").agg(min($"us").as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id", $"t_view", $"t_click", $"t_purchase",
        (lit(1L) + when($"t_click".isNotNull, 1L).otherwise(0L) +
          when($"t_purchase".isNotNull, 1L).otherwise(0L)).as("depth"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_funnel" -> q62Funnel,
    "q61_recursive_hierarchy" -> q61RecursiveHierarchy,
    "q60_array_setops" -> q60ArraySetOps,
    "q59_bit_ops" -> q59BitOps,
    "q58_corr_regression" -> q58CorrRegression,
    "q52_try_arithmetic" -> q52TryArithmetic,
    "q53_map_zoo" -> q53MapZoo,
    "q54_array_zoo2" -> q54ArrayZoo,
    "q55_grouping_id" -> q55GroupingId,
    "q56_string_bucket" -> q56StringBucket,
    "q57_mode_percentile" -> q57ModePercentile)

  val oracles: Map[String, String] = Map(
    "q62_funnel" -> """
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      v AS (
        SELECT user_id, MIN(us) AS t_view FROM ev
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, MIN(e.us) AS t_click
        FROM ev e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.us > v.t_view
        GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, MIN(e.us) AS t_purchase
        FROM ev e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.us > c.t_click
        GROUP BY e.user_id)
      SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
        CAST(1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END
             AS BIGINT) AS depth
      FROM v
      LEFT JOIN c ON v.user_id = c.user_id
      LEFT JOIN p ON v.user_id = p.user_id
      ORDER BY v.user_id""",
    "q61_recursive_hierarchy" -> q61Oracle,
    "q60_array_setops" -> """
      WITH arrs AS (
        SELECT l_orderkey,
          list_sort(list_distinct(list(CAST(l_quantity AS INT)))) AS arr
        FROM lineitem
        WHERE l_orderkey % 23 = 0
        GROUP BY l_orderkey)
      SELECT l_orderkey,
        -- DuckDB renders an empty list as NULL; Spark's concat_ws gives ''
        COALESCE(array_to_string(list_sort(list_intersect(arr, [10,20,30,40,50])), ','), '') AS inter_s,
        COALESCE(array_to_string(list_sort(list_distinct(list_concat(arr, [10,20,30,40,50]))), ','), '') AS union_s,
        COALESCE(array_to_string(list_sort(list_filter(arr, e -> NOT list_contains([10,20,30,40,50], e))), ','), '') AS except_s,
        COALESCE(array_to_string(list_concat(arr, [10,20,30,40,50]), ','), '') AS flat_s,
        CAST(len(list_intersect(arr, [10,20,30,40,50])) AS BIGINT) AS n_inter
      FROM arrs
      ORDER BY l_orderkey""",
    "q59_bit_ops" -> """
      SELECT o_orderkey,
        CAST(bit_count(o_orderkey) AS BIGINT) AS popcount,
        o_orderkey << 3 AS shl3,
        o_orderkey >> 2 AS shr2,
        o_orderkey & 255 AS low_byte,
        o_orderkey | 4096 AS with_flag,
        xor(o_orderkey, 255) AS flipped,
        hex(o_orderkey) AS hx
      FROM orders
      WHERE o_orderkey % 31 = 0
      ORDER BY o_orderkey""",
    "q58_corr_regression" -> """
      WITH m AS (
        SELECT l_returnflag, l_linestatus,
          CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS qx,
          CAST(floor(l_extendedprice * (1.0 - l_discount) + 0.5) AS BIGINT) AS qy
        FROM lineitem),
      s AS (
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          CAST(sum(qx) AS BIGINT) AS sx, CAST(sum(qy) AS BIGINT) AS sy,
          CAST(sum(qx*qx) AS BIGINT) AS sxx, CAST(sum(qy*qy) AS BIGINT) AS syy,
          CAST(sum(qx*qy) AS BIGINT) AS sxy
        FROM m GROUP BY l_returnflag, l_linestatus),
      d AS (
        SELECT l_returnflag, l_linestatus, n,
          CAST(sx AS DOUBLE)/CAST(n AS DOUBLE) AS mx,
          CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) AS my,
          CAST(sxy AS DOUBLE)/CAST(n AS DOUBLE)
            - (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) AS cov,
          CAST(sxx AS DOUBLE)/CAST(n AS DOUBLE)
            - (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) AS var_x,
          CAST(syy AS DOUBLE)/CAST(n AS DOUBLE)
            - (CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) AS var_y
        FROM s)
      SELECT l_returnflag, l_linestatus, n,
        cov / (sqrt(var_x) * sqrt(var_y)) AS corr_xy,
        cov / var_x AS slope,
        my - (cov / var_x) * mx AS intercept,
        (cov / (sqrt(var_x) * sqrt(var_y))) * (cov / (sqrt(var_x) * sqrt(var_y))) AS r2
      FROM d
      ORDER BY l_returnflag, l_linestatus""",
    "q57_mode_percentile" -> """
      WITH enriched AS (
        SELECT l_returnflag, l_quantity,
          CASE WHEN l_quantity <= 40.0 THEN 'common' ELSE 'rare' END AS band,
          CAST(l_quantity AS INT) AS qty_i
        FROM lineitem)
      SELECT l_returnflag,
        mode(band) AS mode_band,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY qty_i) AS BIGINT) AS med_qty,
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS q1_qty,
        CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p90_qty,
        COUNT(*) AS n,
        CAST(SUM(CASE WHEN band = 'common' THEN 1 ELSE 0 END) AS BIGINT) AS n_common
      FROM enriched
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q52_try_arithmetic" -> """
      SELECT l_orderkey,
        CASE WHEN l_quantity - 25.0 = 0 THEN NULL
             ELSE l_extendedprice / (l_quantity - 25.0) END AS per_off25,
        CAST(NULL AS BIGINT) AS overflowed,
        TRY_CAST(l_returnflag AS DOUBLE) AS flag_num,
        TRY_CAST(CAST(l_quantity AS STRING) AS DOUBLE) AS qty_rt,
        ([l_quantity, l_discount])[5] AS oob
      FROM lineitem
      WHERE l_orderkey % 37 = 0 AND l_linenumber = 1
      ORDER BY l_orderkey""",
    "q53_map_zoo" -> """
      WITH cnts AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY user_id, event_type)
      SELECT user_id,
        count(*) AS n_types,
        string_agg(upper(event_type), ',' ORDER BY upper(event_type)) AS keys_str,
        CAST(sum(cnt * 2) AS BIGINT) AS doubled_sum,
        CAST(coalesce(sum(cnt) FILTER (WHERE cnt >= 3), 0) AS BIGINT) AS busy_sum
      FROM cnts
      GROUP BY user_id
      ORDER BY user_id""",
    "q54_array_zoo2" -> """
      WITH arrs AS (
        SELECT l_orderkey,
          list(l_quantity ORDER BY l_linenumber, l_quantity) AS arr
        FROM lineitem
        WHERE l_orderkey % 19 = 0
        GROUP BY l_orderkey)
      SELECT l_orderkey,
        CAST(len(arr) AS BIGINT) AS n,
        CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct,
        len([x for x in arr if x > 45.0]) > 0 AS has_gt45,
        len([x for x in arr if x <= 0.0]) = 0 AS all_pos,
        ([x for x in arr if x > 40.0])[1] AS first_gt40,
        CAST(len([x for x in arr if x <> 1.0]) AS BIGINT) AS n_no_ones,
        list_sum([CAST(x AS DOUBLE) for x in arr[1:3]]) AS head3_sum
      FROM arrs
      ORDER BY l_orderkey""",
    "q56_string_bucket" -> """
      SELECT event_id,
        CAST(CASE WHEN value < 0.0 THEN 0
                  WHEN value >= 100.0 THEN 11
                  ELSE CAST(floor((value - 0.0) / ((100.0 - 0.0) / 10)) AS BIGINT) + 1
             END AS BIGINT) AS vbucket,
        split_part(event_type, 'i', 1) AS et_head,
        translate(event_type, 'aeiou', 'AEIOU') AS et_caps,
        lpad(event_type, 10, '.') AS et_pad,
        repeat(substr(event_type, 1, 2), 3) AS et_rep,
        reverse(event_type) AS et_rev
      FROM events
      WHERE event_id % 13 = 0
      ORDER BY event_id""",
    "q55_grouping_id" -> """
      SELECT
        coalesce(o_orderstatus, '<all>') AS status,
        coalesce(o_orderpriority, '<all>') AS priority,
        CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY gid, status, priority""")
}
