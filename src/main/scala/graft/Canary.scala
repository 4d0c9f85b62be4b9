package graft

import org.apache.spark.sql.SparkSession

/** Isolated canary re-measure (VERDICT r12 ask #1a): the bench floor
  * artifact (`BENCH_floor_local.json`, r10) stopped being reproducible —
  * every r12 measurement (builder 177–193 s, driver 204.6 s, judge
  * in-between) sat uniformly above it, so "uniform elevation" judgments
  * routed through a denominator nobody could hit. This main re-measures
  * a FIXED set of byte-stable queries spanning families, each under the
  * min-of-4 isolated protocol the `dedup_jaccard_hist` bisect used
  * (1 unmeasured warm sweep + 4 measured, per-query min), and prints ONE
  * JSON line. The per-round NOTES canary table records these figures;
  * `tools/bench_diff.py` normalizes new/floor per-query ratios by the
  * canary median so a real single-query regression stays detectable
  * under whole-machine elevation (ask #1b).
  *
  * The set must stay byte-stable: if a canary's implementation is ever
  * rewritten, REPLACE it here (and in `CANARY_QUERIES` in
  * tools/bench_diff.py — CanarySpec pins the two lists equal) rather
  * than letting a real change masquerade as elevation.
  */
object Canary {

  /** Byte-stable queries spanning families (all present in the r10 floor
    * artifact): relational agg / star join / window frame / lateral,
    * the LSH chain, the blocked edit-distance verify, the triangle
    * kernel, TF-IDF, the MAD outlier kernel, and the multimodal decode
    * chain. r14 ROTATION (the documented replace-don't-mask rule):
    * dedup_jaccard_hist was rewritten onto the decomposed
    * intersectCandidatesOf trunk this round, so it left the canary set
    * — dedup_editdist (byte-unchanged since r10, same near-dup family,
    * floor entry 2.253) replaces it.
    */
  val Queries: Seq[String] = Seq(
    "q1_pricing_summary", "q4_star_join", "q40_time_range_frame",
    "q45_lateral", "dedup_minhash_lsh", "dedup_editdist",
    "sim_triangles", "ta_tfidf", "dq_outlier_mad", "mm_decode")

  val MeasuredSweeps = 4

  /** Measurement list: the pinned canary set by default;
    * SPARK_GRAFT_CANARY_QUERIES=<name,name,…> overrides it for one-off
    * isolated min-of-4 measurements (the floor-entry RE-ARM protocol,
    * VERDICT r13 ask #1a: a query that flags in ≥2 consecutive rounds
    * gets its floor entry replaced by a fresh isolated measurement,
    * provenance-logged in BENCH_floor_provenance.json). The override
    * never touches [[Queries]] — CanarySpec keeps the pinned list equal
    * to tools/bench_diff.py's CANARY_QUERIES.
    */
  def measurementList: Seq[String] =
    sys.env.get("SPARK_GRAFT_CANARY_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .getOrElse(Queries)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      def pass(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warm (JIT, codegen cache, page cache) — unmeasured
      (1 to MeasuredSweeps).map(_ => pass()).min
    }
    val results = measurementList.map(n => n -> runOne(n))
    // Locale.ROOT: a comma-decimal default locale (de_DE) would render
    // "1,234" and corrupt the machine-read JSON artifact (r13 ADVICE)
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val overridden = measurementList != Queries
    val metric = if (overridden) "canary_rearm" else "canary"
    val line = s"""{"metric":"$metric","unit":"sec","sweeps":$MeasuredSweeps,"queries":$qs,"sf":"$sfDir","value":${fmt(results.map(_._2).sum)}}"""
    // an overridden (re-arm) run must not clobber the real canary
    // artifact — default it to /tmp unless explicitly pointed elsewhere
    val defaultOut =
      if (overridden) s"${System.getProperty("java.io.tmpdir")}/CANARY_rearm.json"
      else "/root/repo/CANARY_local.json"
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_CANARY_OUT", defaultOut)),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[canary] write failed: $e") }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(line)
    System.out.flush()
  }
}
