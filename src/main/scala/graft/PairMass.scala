package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pair-mass certificate for the near-dup verify operators (VERDICT r7
  * ask #4): measures, at each scale factor, how many candidate pairs
  * the df-capped inverted-index BLOCKING stage emits versus how many
  * pairs the exact verify keeps. The claim under test: candidate mass
  * grows ~linearly with corpus size (the blocking is what makes the
  * operator scale), while VERIFIED pairs on the synthetic ×10 sf1
  * corpus grow superlinearly because replication multiplies true
  * near-dup pair mass — a property of the ScaleSmoke corpus
  * construction, not of the plan. Results are recorded in NOTES.md.
  *
  * Usage: `sbt "runMain graft.PairMass"` — runs sf0.1 and the
  * ScaleSmoke sf1 materialization (built on demand); pass explicit sf
  * dirs as args to override.
  */
object PairMass {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dirs: Seq[(String, String)] =
      if (args.nonEmpty) args.toSeq.map(d => (d, d))
      else Seq(
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", ScaleSmoke.ensureSf1(spark, "/root/testdata/sf0.1")))

    dirs.foreach { case (label, dir) =>
      val docs = Tables.t(spark, dir, "documents").select($"doc_id", $"text")
      val nDocs = docs.count()
      val editCand = ops.Dedup.editCandidatesOf(docs).count()
      val editVerified = ops.Dedup.dedupEditDistanceOf(docs).count()
      val sets = ops.Dedup.shingleSetsOf(docs)
      val containCand = ops.Dedup.containmentCandidatesOf(sets).count()
      val containVerified = ops.Dedup.dedupContainmentOf(docs).count()
      println(f"[pairmass] $label%-6s docs=$nDocs%8d " +
        f"edit_cand=$editCand%10d edit_verified=$editVerified%8d " +
        f"contain_cand=$containCand%10d contain_verified=$containVerified%8d")
    }
    spark.stop()
  }
}
