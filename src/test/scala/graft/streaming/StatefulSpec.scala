package graft.streaming

import java.nio.file.Files
import graft.SparkSpec

object StatefulSpec {
  // static so executor-side foreachBatch lambdas see the same instance
  val collected = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long, Double)]()
}

class StatefulSpec extends SparkSpec {

  test("flatMapGroupsWithState accumulates per-user totals across batches") {
    import spark.implicits._
    StatefulSpec.collected.clear()
    val work = Files.createTempDirectory("graft-state")
    val in = work.resolve("in"); Files.createDirectories(in)
    val cp = work.resolve("cp").toString
    Seq((1L, 10.0), (1L, 5.0), (2L, 2.0))
      .toDF("user_id", "value")
      .write.parquet(in.resolve("b1").toString)

    // memory sink cannot recover from a checkpoint; foreachBatch can,
    // which also exercises the ForeachBatchSink extension point
    def runBatch(): Unit = {
      val q = new StreamingPipeline(
        source = FileStreamingSource(in.toString + "/*",
          schemaDdl = Some("user_id LONG, value DOUBLE")),
        sink = ForeachBatchSink((df, _) =>
          df.collect().foreach(r => StatefulSpec.collected.add(
            (r.getLong(0), r.getLong(1), r.getDouble(2))))),
        transform = StatefulTransforms.runningUserTotals,
        outputMode = OutputMode.Update,
        trigger = TriggerConfig.AvailableNow,
        checkpointLocation = Some(cp)).startStream(spark)
      q.awaitTermination(60000)
    }
    runBatch()
    val first = StatefulSpec.collected.toArray
      .map(_.asInstanceOf[(Long, Long, Double)])
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(first(1L) == ((2L, 15.0)))
    assert(first(2L) == ((1L, 2.0)))

    // second batch: per-key state must carry over via the checkpoint
    Seq((1L, 1.0), (3L, 7.0)).toDF("user_id", "value")
      .write.parquet(in.resolve("b2").toString)
    runBatch()
    val latest = StatefulSpec.collected.toArray
      .map(_.asInstanceOf[(Long, Long, Double)])
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(t => (t._2, t._3)).maxBy(_._1) }
    assert(latest(1L) == ((3L, 16.0)), "user 1 state accumulated across batches")
    assert(latest(3L) == ((1L, 7.0)))
  }

  test("transformWithState twin matches the legacy form across batches (RocksDB store)") {
    import spark.implicits._
    StatefulSpec.collected.clear()
    val work = Files.createTempDirectory("graft-tws")
    val in = work.resolve("in"); Files.createDirectories(in)
    val cp = work.resolve("cp").toString
    // transformWithState requires the RocksDB state store provider —
    // scope the conf to this test and restore the default after
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      Seq((1L, 10.0), (1L, 5.0), (2L, 2.0))
        .toDF("user_id", "value")
        .write.parquet(in.resolve("b1").toString)
      def runBatch(): Unit = {
        val q = new StreamingPipeline(
          source = FileStreamingSource(in.toString + "/*",
            schemaDdl = Some("user_id LONG, value DOUBLE")),
          sink = ForeachBatchSink((df, _) =>
            df.collect().foreach(r => StatefulSpec.collected.add(
              (r.getLong(0), r.getLong(1), r.getDouble(2))))),
          transform = StatefulTransforms.runningUserTotalsTws,
          outputMode = OutputMode.Update,
          trigger = TriggerConfig.AvailableNow,
          checkpointLocation = Some(cp)).startStream(spark)
        q.awaitTermination(60000)
      }
      runBatch()
      val first = StatefulSpec.collected.toArray
        .map(_.asInstanceOf[(Long, Long, Double)])
        .map(t => t._1 -> ((t._2, t._3))).toMap
      // bit-identical to the legacy flatMapGroupsWithState assertions
      assert(first(1L) == ((2L, 15.0)))
      assert(first(2L) == ((1L, 2.0)))
      Seq((1L, 1.0), (3L, 7.0)).toDF("user_id", "value")
        .write.parquet(in.resolve("b2").toString)
      runBatch()
      val latest = StatefulSpec.collected.toArray
        .map(_.asInstanceOf[(Long, Long, Double)])
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(t => (t._2, t._3)).maxBy(_._1) }
      assert(latest(1L) == ((3L, 16.0)), "ValueState carried across batches")
      assert(latest(3L) == ((1L, 7.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
