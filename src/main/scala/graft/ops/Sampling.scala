package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * The split key is `md5(id)` compared lexicographically against hex
  * thresholds: stable across runs, engines, partitionings, and cluster
  * sizes — unlike `randomSplit`/`sample`, whose assignment depends on
  * partition layout and seed plumbing. Deterministic membership is what
  * makes train/test contamination auditable after the fact: any row's
  * split is recomputable from its id alone, anywhere.
  *
  * Fractions are approximate (hash-uniform): a threshold prefix `cd`
  * captures 205/256 ≈ 80.1% of the hash space. At corpus scale the
  * binomial deviation is negligible; exactness of FRACTIONS is not the
  * contract, exactness of MEMBERSHIP is.
  */
object Sampling {

  /** Default thresholds: ~80/10/10 train/val/test. */
  val TrainUpper = "cd" // [00, cd) ≈ 80.1%
  val ValUpper = "e7"   // [cd, e7) ≈ 10.2%

  /** Split assignment column from an id column. */
  def splitColumn(id: Column): Column = {
    val h = md5(id.cast("string"))
    when(h < TrainUpper, lit("train"))
      .when(h < ValUpper, lit("val"))
      .otherwise(lit("test"))
  }

  /** Attach a deterministic split column keyed on `idCol`. */
  def hashSplit(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("split", splitColumn(col(idCol)))

  /** Deterministic per-class sample: keep ~fraction of each class,
    * membership decided by md5(id) against the class-independent
    * threshold — the stable alternative to `sampleBy`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0,1]")
    val limit = f"${(fraction * 256).toInt}%02x"
    df.filter(md5(col(idCol).cast("string")) < limit)
  }

  /** Split summary as an oracle-checkable query: per-split counts and
    * id checksums prove membership determinism, not just sizes.
    */
  def splitSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    hashSplit(t(s, dir, "documents"), "doc_id")
      .groupBy($"split")
      .agg(
        count(lit(1)).as("n"),
        sum($"doc_id").as("sum_ids"),
        min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"))
      .orderBy("split")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_split" -> splitSummary)

  val oracles: Map[String, String] = Map(
    "sample_split" -> s"""
      SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '$TrainUpper' THEN 'train'
                  WHEN md5(CAST(doc_id AS VARCHAR)) < '$ValUpper' THEN 'val'
                  ELSE 'test' END AS split,
        COUNT(*) AS n,
        CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        MIN(doc_id) AS min_id,
        MAX(doc_id) AS max_id
      FROM documents
      GROUP BY 1 ORDER BY 1""")
}
