package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All queries take the scale-factor
  * directory as a parameter so the same code runs at any SF — on a real
  * cluster the path would be an object-store prefix and the parquet
  * scans below would be split across executors by Spark's FileSourceScan.
  */
object Tables {
  /** Parquet scan. Column pruning + predicate pushdown reach the reader
    * because every downstream query is expressed declaratively.
    *
    * `events.ts` is physically INT64 TIMESTAMP(NANOS) which Spark 4 only
    * reads as a long (spark.sql.legacy.parquet.nanosAsLong=true — set by
    * Verify/Bench/specs); we floor-divide to micros and restore a proper
    * TimestampType column so downstream queries see normal semantics.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("CAST(ts DIV 1000 AS LONG)")))
    else df
  }

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
