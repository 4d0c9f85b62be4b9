package graft

import org.apache.spark.sql.SparkSession

// Throwaway debug driver — deleted before commit.
object DbgMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("dbg")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("dbg-cur")
    val state = work.resolve("state").toString
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps nearby today"
    Seq((1L, base), (2L, "completely different content about spark plans and shuffle behavior mail bob@x.io"))
      .toDF("doc_id", "text").write.parquet(work.resolve("in/b1").toString)
    val q1 = graft.examples.StreamingCuration.start(spark, work.resolve("in").toString + "/*", state)
    println("q1 done-> " + q1.awaitTermination(60000))
    println("q1 lastProgress-> " + Option(q1.lastProgress).map(p => s"batch=${p.batchId} rows=${p.numInputRows}"))
    Seq((10L, base), (11L, base + " extra"), (12L, "a wholly novel document with enough tokens to pass the quality gate fine"))
      .toDF("doc_id", "text").write.parquet(work.resolve("in2/b2").toString)
    val q2 = graft.examples.StreamingCuration.start(spark, work.resolve("in2").toString + "/*", state)
    println("q2 done-> " + q2.awaitTermination(60000))
    println("q2 lastProgress-> " + Option(q2.lastProgress).map(p => s"batch=${p.batchId} rows=${p.numInputRows}"))
    println("q2 exception-> " + q2.exception)
    spark.read.parquet(s"$state/corpus_docs").show(false)
    spark.stop()
  }
}
