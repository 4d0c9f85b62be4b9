package graft.core

import graft.SparkSpec
import graft.core.quality._
import graft.core.schema._

/** Quality checks against the reference's canonical 4-row fixture
  * (tests/integration/test_quality_checks_spark.py:27-39, FIXTURES.md §2):
  * id 1..4 unique; name has 1 null + a duplicate; age 25..40;
  * score has 1 null.
  */
class QualitySpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("age", LongType, nullable = false),
      StructField("score", DoubleType, nullable = true)))
    val rows = Seq(
      Row(1L, "Alice", 25L, 85.0),
      Row(2L, "Bob", 30L, 92.5),
      Row(3L, "Alice", 35L, 78.0),
      Row(4L, null, 40L, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
      .createOrReplaceTempView("dq_test_data")
  }

  test("row_count_check") {
    assert(Checks.rowCountCheck("dq_test_data", 4).check(spark).passed)
    assert(!Checks.rowCountCheck("dq_test_data", 5).check(spark).passed)
  }

  test("null_check: 25% nulls in name") {
    val r = Checks.nullCheck("dq_test_data", "name", 25.0).check(spark)
    assert(r.passed && r.metrics("null_pct") == 25.0)
    assert(!Checks.nullCheck("dq_test_data", "name", 10.0).check(spark).passed)
    assert(Checks.nullCheck("dq_test_data", "id", 0.0).check(spark).passed)
  }

  test("unique_check: id unique, name not, composite (id,name) unique") {
    assert(Checks.uniqueCheck("dq_test_data", Seq("id")).check(spark).passed)
    assert(!Checks.uniqueCheck("dq_test_data", Seq("name")).check(spark).passed)
    assert(Checks.uniqueCheck("dq_test_data", Seq("id", "name")).check(spark).passed)
  }

  test("range_check: [20,50] passes, [30,50] has violations, min-only works") {
    assert(Checks.rangeCheck("dq_test_data", "age", Some(20), Some(50)).check(spark).passed)
    val r = Checks.rangeCheck("dq_test_data", "age", Some(30), Some(50)).check(spark)
    assert(!r.passed && r.metrics("violations") == 1.0)
    assert(Checks.rangeCheck("dq_test_data", "age", min = Some(0)).check(spark).passed)
  }

  test("schema_check: declared fields + type matching") {
    import GDataType._
    val good = SchemaDefinition(Seq(
      SchemaField("id", GLong), SchemaField("name", GString),
      SchemaField("age", GLong), SchemaField("score", GDouble)))
    assert(Checks.schemaCheck("dq_test_data", good).check(spark).passed)
    val badType = SchemaDefinition(Seq(SchemaField("id", GString)))
    assert(!Checks.schemaCheck("dq_test_data", badType).check(spark).passed)
    val missing = SchemaDefinition(Seq(SchemaField("ghost", GString)))
    assert(!Checks.schemaCheck("dq_test_data", missing).check(spark).passed)
    // checkTypes=false: presence only
    assert(Checks.schemaCheck("dq_test_data", badType, checkTypes = false).check(spark).passed)
  }

  test("percentile_check: median of age within bounds") {
    assert(Checks.percentileCheck("dq_test_data", "age", 0.5,
      min = Some(25), max = Some(40)).check(spark).passed)
    assert(!Checks.percentileCheck("dq_test_data", "age", 0.5,
      max = Some(10)).check(spark).passed)
    intercept[IllegalArgumentException](
      Checks.percentileCheck("dq_test_data", "age", 1.5, min = Some(0)))
  }

  test("pattern_check: match share against threshold; nulls excluded") {
    // names: Alice, Bob, Alice, null -> 2/3 start with 'A' = 66.7%
    assert(Checks.patternCheck("dq_test_data", "name", "^A", 60.0).check(spark).passed)
    assert(!Checks.patternCheck("dq_test_data", "name", "^A", 70.0).check(spark).passed)
    assert(Checks.patternCheck("dq_test_data", "name", "^[A-Z][a-z]+$").check(spark).passed)
  }

  test("referential_check: orphans detected; null child keys ignored") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("pid", "pv").createOrReplaceTempView("dq_parent")
    Seq(Some(1L), Some(2L), Some(1L), None).toDF("fk").createOrReplaceTempView("dq_child_ok")
    Seq(Some(1L), Some(9L)).toDF("fk").createOrReplaceTempView("dq_child_bad")
    assert(Checks.referentialCheck("dq_child_ok", "fk", "dq_parent", "pid")
      .check(spark).passed)
    val bad = Checks.referentialCheck("dq_child_bad", "fk", "dq_parent", "pid").check(spark)
    assert(!bad.passed && bad.metrics("orphans") == 1.0)
  }

  test("freshness_check: age computed against caller-supplied asOf") {
    import spark.implicits._
    Seq("2024-01-30 10:00:00").toDF("s")
      .selectExpr("CAST(s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("dq_fresh")
    val asOf = java.time.Instant.parse("2024-01-30T11:00:00Z")
    assert(Checks.freshnessCheck("dq_fresh", "ts",
      java.time.Duration.ofHours(2), asOf).check(spark).passed)
    val stale = Checks.freshnessCheck("dq_fresh", "ts",
      java.time.Duration.ofMinutes(30), asOf).check(spark)
    assert(!stale.passed && stale.metrics("age_ms") == 3600000.0)
    spark.emptyDataFrame.selectExpr("CAST(NULL AS TIMESTAMP) AS ts")
      .limit(0).createOrReplaceTempView("dq_fresh_empty")
    assert(!Checks.freshnessCheck("dq_fresh_empty", "ts",
      java.time.Duration.ofHours(1), asOf).check(spark).passed)
  }

  test("distribution_check: category share bounds") {
    val ok = Checks.distributionCheck("dq_test_data", "name", "Alice", 0.25, 0.75)
      .check(spark)
    assert(ok.passed && ok.metrics("share") == 0.5)
    assert(!Checks.distributionCheck("dq_test_data", "name", "Alice", 0.0, 0.25)
      .check(spark).passed)
  }

  test("benford_check: conforming sample passes, uniform digits fail, subunit values count") {
    import spark.implicits._
    // counts proportional to log10(1+1/d) — worst per-digit deviation is
    // the rounding residue, far under the 0.05 gate. Mix magnitudes
    // (d, d/100, d*1000) so the first-SIGNIFICANT-digit extraction is
    // exercised across plain and subunit renderings.
    val shares = Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)
    val benford = shares.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(j => (i + 1).toDouble * Seq(1.0, 0.01, 1000.0)(j % 3))
    }
    benford.toDF("v").createOrReplaceTempView("dq_benford_ok")
    val ok = Checks.benfordCheck("dq_benford_ok", "v").check(spark)
    assert(ok.passed, ok.message)
    // uniform first digits: every digit at ~1/9, digit 1 deviates by ~0.19
    (100 to 999).map(_.toDouble).toDF("v")
      .createOrReplaceTempView("dq_benford_uniform")
    val bad = Checks.benfordCheck("dq_benford_uniform", "v").check(spark)
    assert(!bad.passed && bad.metrics("worst_dev") > 0.15, bad.message)
    // all-zero column: no first digits at all
    Seq(0.0, 0.0).toDF("v").createOrReplaceTempView("dq_benford_zero")
    assert(!Checks.benfordCheck("dq_benford_zero", "v").check(spark).passed)
  }

  test("anomaly_check: z-score outlier share, exact integer statistics") {
    import spark.implicits._
    // one group of 100 tight values plus two wild outliers
    val vals = (1 to 100).map(i => ("a", 50.0 + (i % 5))) ++
      Seq(("a", 5000.0), ("a", -4000.0))
    vals.toDF("g", "v").createOrReplaceTempView("dq_anom")
    val tight = Checks.anomalyCheck("dq_anom", "v", "g",
      zThreshold = 3.0, maxOutlierPct = 0.5).check(spark)
    assert(!tight.passed, s"2/102 outliers must fail a 0.5% gate: ${tight.message}")
    assert(tight.metrics("outliers") == 2.0)
    val loose = Checks.anomalyCheck("dq_anom", "v", "g",
      zThreshold = 3.0, maxOutlierPct = 5.0).check(spark)
    assert(loose.passed, loose.message)
  }

  test("anomaly_check: zero-variance and single-row groups flag nothing, not NaN") {
    import spark.implicits._
    // group "c" is constant (variance 0 → z would be 0/0 = NaN), group
    // "s" has one row (n = 1), group "a" is the normal case with one
    // genuine outlier among 100 tight values
    val vals = (1 to 50).map(_ => ("c", 7.0)) ++
      Seq(("s", 3.0)) ++
      (1 to 100).map(i => ("a", 50.0 + (i % 5))) ++ Seq(("a", 9999.0))
    vals.toDF("g", "v").createOrReplaceTempView("dq_anom_zv")
    val res = Checks.anomalyCheck("dq_anom_zv", "v", "g",
      zThreshold = 3.0, maxOutlierPct = 2.0).check(spark)
    // guarded groups contribute rows to the denominator but can never
    // flag: exactly 1 outlier out of all 152 scanned rows
    assert(res.metrics("outliers") == 1.0, res.message)
    assert(res.message.contains("of 152"), res.message)
    assert(res.passed, res.message)
  }

  test("custom_sql_check with passed + message columns") {
    val ok = Checks.customSqlCheck("no_minors",
      "SELECT COUNT(*) = 0 AS passed, 'minors found' AS message FROM dq_test_data WHERE age < 18")
    assert(ok.check(spark).passed)
    val bad = Checks.customSqlCheck("all_scored",
      "SELECT COUNT(*) = 0 AS passed FROM dq_test_data WHERE score IS NULL")
    assert(!bad.check(spark).passed)
  }

  test("quality hooks: timings, failure modes, threshold counting") {
    import graft.runner._
    val failing = Checks.rowCountCheck("dq_test_data", 100)
    val warnOnly = failing.copy(name = "warn", failureMode = FailureMode.WarnOnly)
    val threshold = failing.copy(name = "thr",
      failureMode = FailureMode.Threshold, maxFailures = 2)
    val before = Checks.rowCountCheck("dq_test_data", 1)
      .copy(name = "pre", timing = CheckTiming.BeforePipeline)
    val hooks = new DataQualityHooks(
      Seq(failing, warnOnly, threshold, before), () => spark)

    hooks.beforePipeline("p")
    assert(hooks.results.map(_.name) == Seq("pre"))
    hooks.afterPipeline("p", PipelineResult("p", PipelineStatus.Success, Nil, 0))
    assert(hooks.results.size == 4)
    // fail_on_error check failed => overall not passed
    assert(!hooks.passed)
    // warn-only alone would pass; threshold with 1 failure <= 2 passes
    val lenient = new DataQualityHooks(Seq(warnOnly, threshold), () => spark)
    lenient.afterPipeline("p", PipelineResult("p", PipelineStatus.Success, Nil, 0))
    assert(lenient.passed)
  }

  test("cross-field check: planted ship-before-order violation is counted, clean data passes") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val orders = Seq(
      (10L, ts("2024-01-05 00:00:00")),
      (11L, ts("2024-02-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val clean = Seq(
      (10L, ts("2024-01-06 00:00:00")),
      (10L, ts("2024-01-05 00:00:00")), // same instant: allowed (>=)
      (11L, ts("2024-03-01 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    val ok = graft.queries.QualityQueries.dqCrossFieldOf(clean, orders).head()
    assert(ok.getLong(1) == 3L && ok.getLong(2) == 0L && ok.getBoolean(3))
    val dirty = clean.unionByName(
      Seq((11L, ts("2024-01-31 00:00:00"))).toDF("l_orderkey", "l_shipdate"))
    val bad = graft.queries.QualityQueries.dqCrossFieldOf(dirty, orders).head()
    assert(bad.getLong(1) == 4L && bad.getLong(2) == 1L && !bad.getBoolean(3))
  }
}

class SchemaSpec extends SparkSpec {
  import GDataType._

  test("round-trip SchemaDefinition <-> StructType incl. nested types") {
    val schema = SchemaDefinition(Seq(
      SchemaField("s", GString), SchemaField("i", GInteger, nullable = false),
      SchemaField("arr", GArray(GDouble)),
      SchemaField("m", GMap(GString, GLong)),
      SchemaField("st", GStruct(Seq(SchemaField("x", GBoolean))))))
    val st = SchemaConverter.toStructType(schema)
    assert(SchemaConverter.fromStructType(st) == schema)
  }

  test("string spellings coerce; nested array spelling parses") {
    assert(GDataType.from("BIGINT") == GLong)
    assert(GDataType.from("int") == GInteger)
    assert(GDataType.from("array<string>") == GArray(GString))
    intercept[IllegalArgumentException](GDataType.from("wat"))
  }

  test("validator: identity valid, missing field error, extra is warning") {
    val p = SchemaDefinition(Seq(SchemaField("a", GLong), SchemaField("b", GString)))
    assert(SchemaValidator.validate(Some(p), Some(p)).isValid)

    val consumer = SchemaDefinition(Seq(SchemaField("a", GLong), SchemaField("c", GString)))
    val r = SchemaValidator.validate(Some(p), Some(consumer))
    assert(!r.isValid && r.errors.exists(_.field == "c"))
    assert(r.warnings.exists(_.field == "b"))
  }

  test("validator: type mismatch + nullability narrowing are errors") {
    val p = SchemaDefinition(Seq(SchemaField("a", GLong, nullable = true)))
    val cType = SchemaDefinition(Seq(SchemaField("a", GString)))
    assert(!SchemaValidator.validate(Some(p), Some(cType)).isValid)
    val cNull = SchemaDefinition(Seq(SchemaField("a", GLong, nullable = false)))
    assert(!SchemaValidator.validate(Some(p), Some(cNull)).isValid)
  }

  test("validator: None sides valid unless strict") {
    assert(SchemaValidator.validate(None, None).isValid)
    assert(!SchemaValidator.validate(None, None, strict = true).isValid)
  }

  test("skew audit: planted hot key detected, uniform key clean") {
    import spark.implicits._
    // 1000 rows on one key + 10 rows each on 100 keys: mean ≈ 19.8,
    // hot key is 50× the mean — far past the 10× threshold
    val hot = Seq.fill(1000)(0L) ++ (1L to 100L).flatMap(k => Seq.fill(10)(k))
    val r = graft.queries.QualityQueries
      .keySkew(hot.toDF("k"), "k", "hot").head()
    assert(r.getAs[Long]("n_rows") == 2000 && r.getAs[Long]("n_keys") == 101)
    assert(r.getAs[Long]("max_cnt") == 1000)
    assert(r.getAs[Long]("n_heavy_keys") == 1 &&
      r.getAs[Long]("heavy_rows") == 1000)
    assert(r.getAs[Double]("heavy_share") == 0.5)
    assert(r.getAs[Double]("skew_factor") == 1000.0 * 101 / 2000)
    val uni = (1L to 100L).flatMap(k => Seq.fill(10)(k))
    val u = graft.queries.QualityQueries
      .keySkew(uni.toDF("k"), "k", "uniform").head()
    assert(u.getAs[Long]("n_heavy_keys") == 0)
    assert(u.getAs[Double]("skew_factor") == 1.0)
  }

  test("KMV sketch: sub-k side exact, full side within theory, jaccard near truth") {
    val r = graft.queries.QualityQueries.dqKmvOverlap(spark, sfDir).head()
    val (nA, nB) = (r.getAs[Long]("n_a_exact"), r.getAs[Long]("n_b_exact"))
    assert(nA == 15 && nB == 150) // sf0.001 fixture
    // A has fewer distinct keys than k → its sketch IS the key set and
    // the estimate must be exact, not estimated
    assert(r.getAs[Double]("est_a") == nA.toDouble)
    // B is k-saturated → relative error within ~3σ = 3/sqrt(k-2)
    val relB = math.abs(r.getAs[Double]("est_b") - nB) / nB
    assert(relB < 3.0 / math.sqrt(64 - 2), s"est_b off by $relB")
    val jEx = r.getAs[Double]("jaccard_exact")
    val jEst = r.getAs[Double]("jaccard_est")
    assert(jEx == 0.1)
    assert(math.abs(jEst - jEx) < 0.2, s"jaccard est $jEst vs $jEx")
  }

  test("cluster purity: totals conserve the corpus, purity consistent with counts") {
    val rows = graft.ops.Curation.simClusterPurity(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == 500)
    rows.foreach { r =>
      val (n, top, p) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("top_n"),
        r.getAs[Double]("purity"))
      assert(top >= 1 && top <= n)
      assert(p == top.toDouble / n)
      assert(p > 0.0 && p <= 1.0)
    }
    // naive replay: per-cluster top label from the assignment itself
    val asg = graft.ops.Curation.assignClusters(spark, sfDir)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = asg.groupBy(_._2).map { case (c, ms) =>
      // keys is a SET — materialize to a Seq before mapping to labels,
      // or the per-label counts collapse to 1
      val byLabel = ms.keys.toSeq.map(labels).groupBy(identity)
        .map { case (l, xs) => (l, xs.size) }
      val (topL, topN) = byLabel.toSeq.sortBy { case (l, n) => (-n, l) }.head
      c -> ((ms.size.toLong, topL, topN.toLong))
    }
    rows.foreach { r =>
      val c = r.getAs[Long]("cluster")
      assert(want(c) == ((r.getAs[Long]("n_vecs"),
        r.getAs[Int]("top_label"), r.getAs[Long]("top_n"))),
        s"cluster $c mismatch")
    }
  }

  test("null trend: planted rising null series gives exact slope 1, flat gives 0") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
        + day * 86400000L + i * 1000L)
    // day d carries d null rows (+ 5 non-null) → per-day y = 0,1,2 → the
    // least-squares slope is exactly 1 null/day (num=den=6)
    val rising = (0 to 2).flatMap { d =>
      (1 to 5).map(i => (ts(d, i), "v")) ++
        (1 to d).map(i => (ts(d, 100 + i), null: String))
    }
    val r = graft.queries.QualityQueries
      .nullTrendOf(rising.toDF("ts", "props")).head()
    assert(r.getAs[Long]("n_days") == 3 && r.getAs[Long]("null_total") == 3)
    assert(r.getAs[Long]("slope_num") == 6 && r.getAs[Long]("slope_den") == 6)
    assert(r.getAs[Double]("slope") == 1.0 && r.getAs[Boolean]("rising"))
    val flat = (0 to 2).flatMap(d => (1 to 4).map(i => (ts(d, i), "v")))
    val f = graft.queries.QualityQueries
      .nullTrendOf(flat.toDF("ts", "props")).head()
    assert(f.getAs[Long]("slope_num") == 0 && !f.getAs[Boolean]("rising"))
    assert(f.getAs[Double]("slope") == 0.0)
  }

  test("CUSUM: planted level shift localized at the shift point") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(i: Int) = new java.sql.Timestamp(base.getTime + i * 60000L)
    // group a: 100 then 200 cents, shift after k=50 → argmax |S_k| at 50;
    // group b: constant → S_k = 0 everywhere, argmax ties break to k=1
    val rows =
      (1 to 50).map(i => ("a", i.toLong, ts(i), 100L)) ++
      (51 to 100).map(i => ("a", i.toLong, ts(i), 200L)) ++
      (1 to 40).map(i => ("b", i.toLong, ts(i), 77L))
    val got = graft.queries.QualityQueries
      .cusumOf(rows.toDF("event_type", "event_id", "ts", "cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(5)))
    val a = got.find(_._1 == "a").get
    assert(a._2 == 100 && a._3 == 50, s"shift must localize at k=50: $a")
    // |S_50|·1 = |n·prefix − k·total| = |100·5000 − 50·15000| = 250000
    assert(a._4 == 250000L)
    val b = got.find(_._1 == "b").get
    assert(b._3 == 1 && b._4 == 0L, s"constant series: zero CUSUM, k=1: $b")
  }

  test("volume z-score: full-window rows only; JVM replay of mean and z") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.t(spark, sfDir, "events")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val got = graft.queries.QualityQueries.dqVolumeZscore(spark, sfDir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val w = graft.queries.QualityQueries.ZscoreWindow
    assert(got.length == math.max(0, daily.length - w),
      "exactly the days with a full trailing window score")
    got.foreach { case (day, n, mean7, z) =>
      val i = daily.indexWhere(_._1 == day)
      val trail = daily.slice(i - w, i).map(_._2)
      assert(trail.length == w)
      val m = trail.sum.toDouble / w.toDouble
      assert(mean7 == m, s"$day: mean $mean7 != $m")
      val sd = math.sqrt((trail.map(x => x * x).sum.toDouble -
        trail.sum.toDouble * trail.sum.toDouble / w.toDouble) / w.toDouble)
      if (sd > 0.0) assert(z.contains((n.toDouble - m) / sd))
      else assert(z.isEmpty, s"$day: zero-variance baseline must yield null z")
    }
  }

  test("seasonality: conserves events, dow anchored to Monday, shares sum to 1") {
    val ev = graft.Tables.t(spark, sfDir, "events")
    val got = graft.queries.QualityQueries.dqSeasonality(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._2).sum == ev.count(), "every event lands in one dow")
    assert(got.forall(r => r._1 >= 0L && r._1 <= 6L))
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
    // anchor check: 2024-01-01 is a Monday -> its events must be dow 0
    import org.apache.spark.sql.functions._
    val jan1 = ev.filter(col("ts").cast("date") === lit("2024-01-01")).count()
    if (jan1 > 0) {
      val viaLocalDate = java.time.LocalDate.of(2024, 1, 1).getDayOfWeek
      assert(viaLocalDate == java.time.DayOfWeek.MONDAY)
      assert(got.exists(_._1 == 0L), "Monday bucket must exist")
    }
  }

  test("dup rows: planted redelivery slice accounted exactly; clean key has zero dups") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.QualityQueries.dqDupRows(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val ev = graft.Tables.t(spark, sfDir, "events")
    val n = ev.count()
    val planted = ev.filter(col("event_id") % 97 === 0).count()
    val (rows, distinct, groups, extra, maxm) = got("_all")
    // every replayed row is one extra copy of an existing distinct row
    assert(rows == n + planted && distinct == n)
    assert(groups == planted && extra == planted)
    assert(maxm == (if (planted > 0) 2L else 1L))
    assert(planted > 0, "plant must fire at this SF")
    // per-type rows conserve the rollup
    val types = got.view.filterKeys(_ != "_all").values
    assert(types.map(_._1).sum == rows && types.map(_._4).sum == extra)
  }

  test("manifest: order-free signature; any single-document edit flips exactly its source row") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val base = graft.queries.QualityQueries.manifestOf(docs)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // shuffle arrival order: signature must not move (bit_xor commutes)
    val shuffled = graft.queries.QualityQueries.manifestOf(
        docs.orderBy(md5(col("text"))))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(shuffled == base)
    // flip one character of one document: ONLY its source's sig changes
    val victim = docs.select(col("doc_id"), col("source"))
      .orderBy(col("doc_id")).head()
    val edited = graft.queries.QualityQueries.manifestOf(
        docs.withColumn("text",
          when(col("doc_id") === victim.getLong(0),
            concat(col("text"), lit("X"))).otherwise(col("text"))))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(edited(victim.getString(1)) != base(victim.getString(1)),
      "edited source signature must flip")
    assert((edited - victim.getString(1)) == (base - victim.getString(1)),
      "untouched sources must keep their signatures")
  }

  test("dyadic EWMA: hand-computed recurrence; planted 10x spike flags exactly once") {
    import spark.implicits._
    import java.sql.Date
    // volumes 8, 8, 8, 80 (the spike), 8 — s: 8, 8, 8, 44, 26
    val daily = Seq(
      (Date.valueOf("2024-03-01"), 8L),
      (Date.valueOf("2024-03-02"), 8L),
      (Date.valueOf("2024-03-03"), 8L),
      (Date.valueOf("2024-03-04"), 80L),
      (Date.valueOf("2024-03-05"), 8L)).toDF("day", "n_events")
    val got = graft.queries.QualityQueries.ewmaDyadicOf(daily).collect()
      .map(r => (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3), r.getBoolean(4)))
    // s_t = (s_{t-1} + x_t)/2 exactly; ratio = x_t / s_{t-1}
    assert(got.map(t => (t._1, t._2, t._4)).toSeq == Seq(
      (8L, 8.0, false), (8L, 8.0, false), (8L, 8.0, false),
      (80L, 44.0, true), (8L, 26.0, false)))
    assert(got(3)._3 == 10.0, "spike day ratio = 80/8")
    assert(got(4)._3 == 8.0 / 44.0, "post-spike ratio vs the elevated EWMA")
  }

  test("dyadic EWMA fails loudly past the 2^(t-2) exponent budget (ADVICE r10 #1)") {
    import spark.implicits._
    import java.sql.Date
    def series(lastDay: Long) = ((1 to 30).map(d =>
      (Date.valueOf(f"2024-01-$d%02d"), 1L)) :+
      (Date.valueOf("2024-01-31"), lastDay)).toDF("day", "n_events")
    // the SILENT-wrap regime the guard uniquely covers: after 30 quiet
    // days a 2^40 day needs bitlen 41 + (31-2) = 70 > 63 bits, but the
    // cumulative W is tiny (2^29), so ANSI sum overflow never fires —
    // without the guard shiftleft masks the shift mod 64 and wt wraps
    // with NO error at all
    val e = intercept[Exception] {
      graft.queries.QualityQueries.ewmaDyadicOf(series(1L << 40)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exponent overflow")),
      s"expected the exponent-overflow raise_error, got: ${msgs(e)}")
    // inside the budget the same shape still computes exactly: 2^32
    // needs 33+29 = 62 ≤ 63 bits — the guard is tight, not paranoid.
    // W_31 = 2^29·(1 + 2^32), so ewma_31 = W_31/2^30 = 2^31 + 0.5
    val rows = graft.queries.QualityQueries.ewmaDyadicOf(series(1L << 32))
      .collect()
    assert(rows.length == 31)
    assert(rows.last.getDouble(2) == math.pow(2.0, 31) + 0.5,
      "edge-of-budget day must still be dyadic-exact")
  }
}
