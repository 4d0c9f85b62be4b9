package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspector for a registered query: prints the
  * `explain("formatted")` output plus node-type counts (scans,
  * exchanges, reuse, windows) — the count line is what plan-shape
  * investigations diff (e.g. "does this DAG re-execute its heavy
  * subtree per reference, or does ReuseExchange collapse the copies?").
  *
  * Usage: `runMain graft.PlanProbe <queryName> [sfDir]`
  * (default sfDir /root/testdata/sf0.001 — plan SHAPE is
  * scale-independent, so the cheapest fixture is the right default).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val p = df.queryExecution.executedPlan.toString
    def n(pat: String) = pat.r.findAllIn(p).size
    println(s"[planprobe] $name scans=${n("Scan parquet|FileScan")} " +
      s"exchange=${n("Exchange (hash|range|single)")} " +
      s"reusedExchange=${n("ReusedExchange")} " +
      s"bcastExchange=${n("BroadcastExchange")} " +
      s"window=${n("Window")} agg=${n("HashAggregate|SortAggregate|ObjectHashAggregate")} " +
      s"sortMergeJoin=${n("SortMergeJoin")} bhj=${n("BroadcastHashJoin")} " +
      s"bnlj=${n("BroadcastNestedLoopJoin")} cartesian=${n("CartesianProduct")}")
    spark.stop()
  }
}
