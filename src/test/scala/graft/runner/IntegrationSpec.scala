package graft.runner

import java.nio.file.Files
import graft.SparkSpec
import graft.core.audit.{AuditHooks, FileAuditSink}
import graft.core.config.ConfigLoader
import graft.core.metrics.InMemoryMeterRegistry
import graft.core.quality.{Checks, CheckTiming}

/** Full-surface integration: one pipeline run with every cross-cutting
  * service composed — logging, metrics, audit trail, data-quality
  * hooks, and checkpointing — asserting each produced its artifact.
  * This is the wiring the reference demonstrates across separate
  * examples, exercised in a single run.
  */
class IntegrationSpec extends SparkSpec {

  test("pipeline run with metrics + audit + quality + checkpoint composed") {
    val work = Files.createTempDirectory("graft-int")
    val in = work.resolve("in.csv")
    Files.writeString(in,
      "id,score\n1,10.5\n2,20.0\n3,30.5\n4,15.0\n")
    val outDir = work.resolve("out").toString

    val cfg = ConfigLoader.loadString(s"""
      name = integration-demo
      hooks { logging = true, metrics = true, audit = true }
      components = [
        { name = read, component_type = source
          class_path = "graft.components.ReadCsv"
          config { path = "$in", output_view = scores_raw } },
        { name = clean, component_type = transformation
          class_path = "graft.components.SqlTransform"
          depends_on = [read]
          config { output_view = scores,
            sql = "SELECT id, score FROM scores_raw WHERE score > 12.0" } },
        { name = write, component_type = sink
          class_path = "graft.components.WriteCsv"
          depends_on = [clean]
          config { input_view = scores, path = "$outDir" } }
      ]
    """)

    val registry = new InMemoryMeterRegistry
    val auditFile = work.resolve("audit.jsonl").toString
    val checks = Seq(
      Checks.rowCountCheck("scores", 2),
      Checks.rangeCheck("scores", "score", min = Some(0), max = Some(100)),
      Checks.percentileCheck("scores", "score", 0.5, min = Some(10)),
      Checks.rowCountCheck("scores_raw", 4)
        .copy(name = "pre_clean_count", timing = CheckTiming.AfterComponent,
          componentName = Some("clean")))
    val dq = new DataQualityHooks(checks, () => spark)
    val hooks = new CompositeHooks(Seq(
      new LoggingHooks,
      new MetricsHooks(registry),
      new AuditHooks(new FileAuditSink(auditFile)),
      dq))
    val store = new CheckpointStore(work.resolve("cp").toString)

    val result = new SimplePipelineRunner(cfg, hooks, Some(spark),
      checkpointStore = Some(store)).run()

    // run result
    assert(result.status == PipelineStatus.Success)
    assert(result.components.map(_.name) == Seq("read", "clean", "write"))

    // sink output: 3 of 4 rows survive the score filter
    assert(spark.read.option("header", "true").csv(outDir).count() == 3)

    // metrics recorded per component and pipeline
    assert(registry.counter("pipeline.runs",
      "pipeline" -> "integration-demo", "status" -> "Success").value == 1)
    assert(registry.counter("component.runs",
      "component" -> "clean", "status" -> "Success").value == 1)
    assert(registry.timer("pipeline.duration_ms",
      "pipeline" -> "integration-demo").count == 1)

    // audit trail: start/finish per pipeline + per component, one trace id
    val lines = scala.jdk.CollectionConverters
      .ListHasAsScala(Files.readAllLines(java.nio.file.Paths.get(auditFile))).asScala
    assert(lines.count(_.contains("\"pipeline_start\"")) == 1)
    assert(lines.count(_.contains("\"component_finish\"")) == 3)
    val trace = "\"trace_id\": \"([0-9a-f-]+)\"".r
      .findFirstMatchIn(lines.head).get.group(1)
    assert(lines.forall(_.contains(trace)))

    // quality: all four checks ran (incl. the after-component one) and passed
    assert(dq.results.size == 4)
    assert(dq.passed)
    assert(dq.results.exists(_.name == "pre_clean_count"))

    // checkpoint cleared after full success
    assert(store.load("integration-demo").isEmpty)
  }
}
