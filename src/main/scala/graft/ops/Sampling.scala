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

  /** Temperature-flattening constant: keepFrac(domain) = min(1, K/√n).
    * Big domains are downsampled ∝ n^-1/2 (α = 0.5 temperature), small
    * domains kept whole — the standard multi-source mixing move that
    * stops one giant crawl from drowning curated sources.
    */
  val TempK = 8.0

  /** Deterministic per-domain temperature sampling over `source`:
    * membership = 16-bit md5 prefix under a per-domain cutoff, so the
    * sample is recomputable row-by-row anywhere. All cutoff arithmetic
    * is correctly-rounded IEEE ops (÷, √, ×, floor) in a fixed order —
    * bit-identical in any engine, which is what lets DuckDB replay it.
    *
    * 100 TB shape: one small per-domain aggregate (|domains| rows)
    * broadcast back onto the scan; the filter is pure codegen per row —
    * no shuffle of the corpus.
    */
  def temperatureSummary(s: SparkSession, dir: String, k: Double = TempK): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"source")
    val cut = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("cutoff",
        floor(least(lit(1.0), lit(k) / sqrt($"n_docs".cast("double"))) * 65536.0)
          .cast("long"))
    val kept = docs.join(broadcast(cut), "source")
      .filter($"cutoff" >= 65536L ||
        substring(md5($"doc_id".cast("string")), 1, 4) <
          format_string("%04x", $"cutoff"))
    cut.join(
        kept.groupBy($"source").agg(
          count(lit(1)).as("n_kept"), sum($"doc_id").as("sum_kept_ids")),
        Seq("source"), "left")
      .select($"source", $"n_docs", $"cutoff",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"sum_kept_ids", lit(0L)).as("sum_kept_ids"))
      .orderBy("source")
  }

  /** Per-source document cap (C4/RefinedWeb-style domain capping). */
  val CapPerSource = 15

  /** Cap every source at `cap` documents, chosen by md5(doc_id) rank —
    * an unbiased, recomputable draw (same membership contract as the
    * split/temperature ops), unlike "first N by id", which biases
    * toward whatever the id order encodes (usually crawl time). The
    * standard guard against one domain dominating a mixed corpus when
    * temperature flattening is too gentle.
    *
    * 100 TB shape: one window rank partitioned by source — a single
    * shuffle on the cap key; a pathologically hot source concentrates
    * its rank in one partition, which AQE splits, and the alternative
    * (16-bit-prefix threshold like temperature sampling) trades the
    * exact cap for shuffle-freedom when that matters more.
    */
  def capPerSourceSummary(
      s: SparkSession, dir: String, cap: Int = CapPerSource): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    t(s, dir, "documents").select($"doc_id", $"source")
      .withColumn("rk", row_number().over(w))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"rk" <= cap, 1L).otherwise(0L)).as("n_kept"),
        sum(when($"rk" <= cap, $"doc_id").otherwise(0L)).as("sum_kept_ids"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_split" -> splitSummary,
    "sample_temperature" -> ((s, d) => temperatureSummary(s, d)),
    "sample_cap_per_source" -> ((s, d) => capPerSourceSummary(s, d)))

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
      GROUP BY 1 ORDER BY 1""",
    "sample_temperature" -> s"""
      WITH cut AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(floor(LEAST(CAST(1.0 AS DOUBLE),
            CAST($TempK AS DOUBLE) / sqrt(CAST(COUNT(*) AS DOUBLE))) * 65536.0)
            AS BIGINT) AS cutoff
        FROM documents GROUP BY source),
      kept AS (
        SELECT d.source, d.doc_id
        FROM documents d JOIN cut c ON d.source = c.source
        WHERE c.cutoff >= 65536
           OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', c.cutoff))
      SELECT c.source, c.n_docs, c.cutoff,
        CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
        CAST(COALESCE(SUM(k.doc_id), 0) AS BIGINT) AS sum_kept_ids
      FROM cut c LEFT JOIN kept k ON c.source = k.source
      GROUP BY c.source, c.n_docs, c.cutoff
      ORDER BY c.source""",
    "sample_cap_per_source" -> s"""
      WITH ranked AS (
        SELECT source, doc_id,
          row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        FROM documents)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN rk <= $CapPerSource THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN rk <= $CapPerSource THEN doc_id ELSE 0 END) AS BIGINT) AS sum_kept_ids
      FROM ranked GROUP BY source ORDER BY source""")
}
