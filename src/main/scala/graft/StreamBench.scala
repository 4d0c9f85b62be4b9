package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming._

/** Streaming throughput benchmark (BASELINE.md protocol step 2): rate
  * source at a fixed rows/sec → transform (projection + bucket hash) →
  * parquet file sink, measured through the listener-backed hooks the
  * pipeline wires for every query. Prints ONE JSON line:
  *
  *   {"metric":"stream_rows_per_sec","value":N,"unit":"rows/sec",
  *    "batches":B,"rows":R,"elapsed_sec":S,
  *    "source_rows_per_sec":RPS}
  *
  * Env: SPARK_GRAFT_STREAM_RPS (default 200000),
  *      SPARK_GRAFT_STREAM_SECS (default 15).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rps = sys.env.getOrElse("SPARK_GRAFT_STREAM_RPS", "200000").toInt
    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "15").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files.createTempDirectory("streambench").toString
    @volatile var rows = 0L
    @volatile var batches = 0L
    val hooks = new StreamingHooks {
      override def onBatchProgress(batchId: Long, numInputRows: Long, durationMs: Long): Unit = {
        rows += numInputRows; batches += 1
      }
    }
    val t0 = System.nanoTime()
    val q = new StreamingPipeline(
      source = RateStreamingSource(rowsPerSecond = rps, numPartitions = cpus.toInt),
      sink = FileStreamingSink(s"$out/data"),
      checkpointLocation = Some(s"$out/cp"),
      transform = df => df.select(
        col("timestamp"), col("value"),
        (col("value") * 2).as("value_x2"),
        pmod(hash(col("value")), lit(64)).as("bucket")),
      outputMode = OutputMode.Append,
      trigger = TriggerConfig.ProcessingTime("1 second"),
      hooks = hooks)
      .startStream(spark)
    Thread.sleep(secs * 1000L)
    q.stop()
    q.awaitTermination()
    val elapsed = (System.nanoTime() - t0) / 1e9
    val throughput = rows / elapsed
    println(s"""{"metric":"stream_rows_per_sec","value":$throughput,"unit":"rows/sec","batches":$batches,"rows":$rows,"elapsed_sec":$elapsed,"source_rows_per_sec":$rps}""")
    spark.stop()
  }
}
