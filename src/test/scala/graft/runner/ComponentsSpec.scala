package graft.runner

import graft.SparkSpec
import graft.core.config.ConfigLoader
import graft.runtime.SessionWrapper

/** Catalog-backed component round-trip (WriteTable/ReadTable) and
  * session-wrapper ownership semantics.
  */
class ComponentsSpec extends SparkSpec {

  test("WriteTable -> ReadTable round-trip through the catalog with partitioning") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS ct_orders")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, "ct_orders")
    if (loc.exists()) { def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit }; rm(loc) }

    Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0))
      .toDF("id", "grp", "v").createOrReplaceTempView("ct_src")
    val cfg = ConfigLoader.loadString("""
      name = catalog-demo
      components = [
        { name = save, component_type = sink
          class_path = "graft.components.WriteTable"
          config { input_view = ct_src, output_table = ct_orders,
            partition_by = [grp] } },
        { name = readback, component_type = source
          class_path = "graft.components.ReadTable"
          depends_on = [save]
          config { table_name = ct_orders, output_view = ct_back,
            filter_condition = "grp = 'A'" } }
      ]
    """)
    val r = new SimplePipelineRunner(cfg, NoOpHooks, Some(spark)).run()
    assert(r.status == PipelineStatus.Success)
    // partitioned layout on disk + filtered readback view
    assert(spark.table("ct_orders").count() == 3)
    assert(spark.table("ct_back").count() == 2)
    assert(new java.io.File(loc, "grp=A").exists(), "partition dirs written")
    spark.sql("DROP TABLE IF EXISTS ct_orders")
  }

  test("ReadFormat/WriteFormat round-trip json and orc with options + schema") {
    import graft.components.{ReadFormat, WriteFormat}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").createOrReplaceTempView("fmt_in")
    for (fmt <- Seq("json", "orc")) {
      val w = WriteFormat.fromConfig(Map(
        "input_view" -> "fmt_in", "format" -> fmt, "path" -> s"$dir/$fmt"))
        .asInstanceOf[graft.core.component.DataFlow]
      w.setSparkSession(spark); w.run()
      val r = ReadFormat.fromConfig(Map(
        "format" -> fmt, "path" -> s"$dir/$fmt", "output_view" -> s"fmt_out_$fmt",
        "schema" -> "id LONG, v STRING"))
        .asInstanceOf[graft.core.component.DataFlow]
      r.setSparkSession(spark); r.run()
      val back = spark.table(s"fmt_out_$fmt").orderBy("id")
        .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
      assert(back == Seq((1L, "a"), (2L, "b")), s"round-trip failed for $fmt")
    }
  }

  test("ReadFormat PERMISSIVE mode captures malformed jsonl rows instead of failing") {
    import graft.components.ReadFormat
    val dir = java.nio.file.Files.createTempDirectory("badjson")
    java.nio.file.Files.writeString(dir.resolve("data.jsonl"),
      """{"id": 1, "v": "ok"}
        |{"id": not-json at all
        |{"id": 3, "v": "fine"}
        |""".stripMargin)
    val r = ReadFormat.fromConfig(Map(
      "format" -> "json", "path" -> dir.toString,
      "output_view" -> "bad_json",
      "options" -> Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt"),
      "schema" -> "id LONG, v STRING, _corrupt STRING"))
      .asInstanceOf[graft.core.component.DataFlow]
    r.setSparkSession(spark); r.run()
    val rows = spark.table("bad_json").collect()
    assert(rows.length == 3, "all three lines must surface")
    val corrupt = rows.filter(!_.isNullAt(2))
    assert(corrupt.length == 1 &&
      corrupt.head.getString(2).contains("not-json"),
      "the malformed line must land in the corrupt-record column")
    assert(rows.filter(_.isNullAt(2)).map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L), "well-formed rows parse normally")
  }

  test("UnimaxMix component: balanced selection with epoch replication through the runner") {
    import spark.implicits._
    // two sources: tiny (12 tokens capacity-bound) and large (share-bound)
    val docs = ((1L to 3L).map(i => (i, "tiny", s"a b c d")) ++
      (10L to 29L).map(i => (i, "big", (1 to 10).map(j => s"w$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    docs.createOrReplaceTempView("um_src")
    val cfg = ConfigLoader.loadString("""
      name = unimax-demo
      components = [
        { name = mix, component_type = transformation
          class_path = "graft.components.UnimaxMix"
          config { input_view = um_src, output_view = um_out,
            budget_tokens = 60, max_epochs = 2 } }
      ]
    """)
    val r = new SimplePipelineRunner(cfg, NoOpHooks, Some(spark)).run()
    assert(r.status == PipelineStatus.Success)
    val out = spark.table("um_out")
      .select($"doc_id", $"source", $"epoch")
      .collect().map(r2 => (r2.getLong(0), r2.getString(1), r2.getLong(2)))
    // tiny source: capacity 12*2=24 < fair share 30 -> fully used, BOTH
    // epochs of all 3 docs present (epoch replication visible)
    assert(out.count(_._2 == "tiny") == 6, s"tiny fully used twice: ${out.toSeq}")
    // big source: share-bound at 60-24=36 tokens -> 3 docs of epoch 1
    val big = out.filter(_._2 == "big")
    assert(big.length == 3 && big.forall(_._3 == 1L), s"big share-bound: ${big.toSeq}")
    // matches the op-level selection exactly
    val want = graft.ops.Sampling.unimaxSelection(docs, budget = 60, maxEpochs = 2)
      .select($"doc_id", $"source", $"epoch")
      .collect().map(r2 => (r2.getLong(0), r2.getString(1), r2.getLong(2)))
    assert(out.sorted.toSeq == want.sorted.toSeq)
  }

  test("quality gate keeps zero-token docs under a keep-everything floor (ADVICE r7)") {
    import spark.implicits._
    // doc 2 tokenizes to zero tokens; the gate's left-join scores it 0
    // instead of silently dropping it via the old inner join
    Seq((1L, "real words here", "s"), (2L, "   ", "s"))
      .toDF("doc_id", "text", "source").createOrReplaceTempView("qg_src")
    val cfg = ConfigLoader.loadString("""
      name = gate-demo
      components = [
        { name = gate, component_type = transformation
          class_path = "graft.components.QualityClassifierGate"
          config { input_view = qg_src, output_view = qg_out,
            min_score = -100000 } }
      ]
    """)
    val r = new SimplePipelineRunner(cfg, NoOpHooks, Some(spark)).run()
    assert(r.status == PipelineStatus.Success)
    val out = spark.table("qg_out")
      .select($"doc_id", $"quality_score", $"quality_n_tokens")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted
    assert(out.map(_._1).toSeq == Seq(1L, 2L), s"both docs survive: ${out.toSeq}")
    assert(out(1) == ((2L, 0L, 0L)), "token-less doc scored 0/0")
  }

  test("NeymanSample + BucketWasteReport components: allocation drawn, report materialized") {
    import spark.implicits._
    // source a: zero variance (weight 0) -> 0 drawn; b: all budget
    Seq((1L, "a", 10L, "w w w"), (2L, "a", 10L, "w w"),
        (3L, "b", 0L, "x"), (4L, "b", 20L, "x y z"))
      .toDF("doc_id", "source", "n_chars", "text")
      .createOrReplaceTempView("ny_src")
    val cfg = ConfigLoader.loadString("""
      name = neyman-demo
      components = [
        { name = draw, component_type = transformation
          class_path = "graft.components.NeymanSample"
          config { input_view = ny_src, output_view = ny_out, target = 1 } },
        { name = waste, component_type = transformation
          class_path = "graft.components.BucketWasteReport"
          depends_on = [draw]
          config { input_view = ny_src, output_view = ny_waste } }
      ]
    """)
    val r = new SimplePipelineRunner(cfg, NoOpHooks, Some(spark)).run()
    assert(r.status == PipelineStatus.Success)
    val drawn = spark.table("ny_out")
      .select($"doc_id", $"source").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(drawn.length == 1 && drawn.head._2 == "b",
      s"all budget goes to the only positive-variance source: ${drawn.toSeq}")
    // membership is the md5-rank rule — recomputable, so rerunning draws
    // the same doc
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = Seq(3L, 4L).minBy(id => (h(id), id))
    assert(drawn.head._1 == expect)
    val waste = spark.table("ny_waste").collect()
    assert(waste.nonEmpty && waste.forall(_.getLong(5) >= 0L))
  }

  test("session wrapper: injected sessions are never stopped; connect gating") {
    val injected = new SessionWrapper(injected = Some(spark))
    assert(!injected.ownsSession)
    injected.stop() // must be a no-op on an injected session
    assert(!spark.sparkContext.isStopped, "injected session must survive stop()")

    val connect = new SessionWrapper(
      graft.core.config.SparkConfig(connectString = Some("sc://example:15002")))
    assert(connect.isConnect)
    intercept[UnsupportedOperationException](connect.sparkContext)
  }

  test("SpanCorruptionPlan + DupSpanAudit components chain over one view") {
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "alpha beta gamma delta epsilon zeta eta theta"),
        (3L, "completely different words here"))
      .toDF("doc_id", "text")
      .createOrReplaceTempView("sc_src")
    val cfg = ConfigLoader.loadString("""
      name = span-demo
      components = [
        { name = plan, component_type = transformation
          class_path = "graft.components.SpanCorruptionPlan"
          config { input_view = sc_src, output_view = sc_plan } },
        { name = audit, component_type = transformation
          class_path = "graft.components.DupSpanAudit"
          depends_on = [plan]
          config { input_view = sc_src, output_view = sc_audit, span_chars = 10 } }
      ]
    """)
    val r = new SimplePipelineRunner(cfg, NoOpHooks, Some(spark)).run()
    assert(r.status == PipelineStatus.Success)
    val plan = spark.table("sc_plan").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(6)))).toMap
    // every doc planned; targets = masked + spans + 1 ≥ 1
    assert(plan.keySet == Set(1L, 2L, 3L))
    assert(plan.values.forall { case (n, tl) => n > 0L && tl >= 1L })
    val audit = spark.table("sc_audit").collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    // docs 1 and 2 are verbatim copies: their whole text is one
    // duplicated span; doc 3 shares nothing
    assert(audit(1L) > 0L && audit(1L) == audit(2L))
    assert(audit(3L) == 0L)
  }
}
