package graft

import org.apache.spark.sql.SparkSession

/** Stage-level timing for slow operators: runs labeled sub-plans and
  * prints seconds per stage. Usage:
  *   sbt "runMain graft.Profile /root/testdata/sf0.1"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.t(spark, sfDir, "documents")
    time("docs count")(docs.count())
    // same compiled shingling path the ops use
    val sh = docs.select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.trim.split("\\s+").filter(_.nonEmpty)
        if (ws.length < 3) Iterator.empty
        else (0 to ws.length - 3).iterator
          .map(i => (id, ops.Dedup.fnv64(ws.slice(i, i + 3).mkString(" "))))
          .distinct
      }.toDF("doc_id", "sh").cache()
    time("shingle flatMap + cache")(sh.count())
    val sigs = time("minhash signatures build")(
      ops.Dedup.minhashSignatures(sh))
    time("minhash signatures count")(sigs.count())
    val buckets = ops.Dedup.lshBuckets(sigs)
    time("lsh buckets count")(buckets.count())
    val bucketsC = buckets.cache()
    time("lsh buckets cache")(bucketsC.count())
    val cand = ops.Dedup.candidatePairs(bucketsC)
    time("candidate pairs count")(cand.count())
    time("verify jaccard count")(
      ops.Dedup.verifyJaccard(cand, sh, 0.8).count())
    time("minhash lsh end-to-end")(
      ops.Dedup.dedupMinhashLsh(spark, sfDir).count())

    val rare = sh.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("df") <= 100).drop("df")
    time("ngram rare count")(rare.count())
    val cand2 = rare.as("x").join(rare.as("y"),
      col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    time("ngram candidates count")(cand2.count())
    time("ngram verify count")(
      ops.Dedup.verifyJaccard(cand2, sh, 0.8).count())
    sh.unpersist()
    spark.stop()
  }
}
