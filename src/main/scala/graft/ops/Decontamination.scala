package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination over the `documents` table: find training
  * documents that share word n-grams with a held-out evaluation set, so
  * they can be dropped before training (the standard "did the eval set
  * leak into the corpus?" sweep an LLM data pipeline runs last).
  *
  * The evaluation set here is the deterministic hash tail of the corpus
  * — `md5(doc_id) >= "f8"` (~3.1% of docs), the same stable-membership
  * idiom as [[Sampling]]: any row's eval membership is recomputable from
  * its id alone, which is what makes a contamination audit repeatable.
  * In production the eval side is an external benchmark table; the
  * operator shape is identical.
  *
  * 100 TB shape: shingles leave the scan already fnv64-hashed to longs
  * ([[Dedup.shingled]]), so the contamination probe joins on 8-byte
  * keys. The eval side is BOUNDED (benchmarks are small — thousands of
  * docs, not billions), so it broadcasts and the corpus is scanned once
  * with a broadcast hash join — no shuffle of the training side at all.
  * The per-pair `count` aggregates (train_id, eval_id) — cardinality
  * bounded by |eval| × matches, not by the corpus.
  */
object Decontamination {

  /** Eval docs = top ~3.1% of the md5 hash space (8/256). */
  val EvalLower = "f8"

  /** Pairs must share at least this many distinct shingles to count as
    * contamination (1 shared trigram among unrelated docs is noise).
    */
  val MinShared = 2L

  private def isEval(id: Column): Column =
    md5(id.cast("string")) >= EvalLower

  /** (train_id, eval_id, n_shared) for every train/eval pair sharing ≥
    * [[MinShared]] distinct 3-gram shingles.
    */
  def contaminationPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // filter BEFORE shingling: the md5 predicate runs on the scan, so the
    // eval side reads ~3% of the corpus and the broadcast stays bounded
    val docs = graft.Tables.t(s, dir, "documents")
    val evalSh = Dedup.shingledOf(docs.filter(isEval($"doc_id")))
      .select($"doc_id".as("eval_id"), $"sh")
    Dedup.shingledOf(docs.filter(!isEval($"doc_id")))
      .join(broadcast(evalSh), "sh")
      .groupBy($"doc_id".as("train_id"), $"eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= MinShared)
      .orderBy("train_id", "eval_id")
  }

  /** Per-eval-doc contamination report: how many training docs hit it,
    * and how hard — the summary a pipeline gates a training run on.
    */
  def contaminationReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    contaminationPairs(s, dir)
      .groupBy($"eval_id")
      .agg(
        count(lit(1)).as("n_train_docs"),
        max($"n_shared").as("max_shared"),
        sum($"n_shared").as("total_shared"))
      .orderBy("eval_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decon_pairs" -> contaminationPairs,
    "decon_report" -> contaminationReport)

  private val pairsSql = s"""
      WITH ${Dedup.shingleCte},
      pairs AS (
        SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
          CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sh t JOIN sh e ON t.sh = e.sh
        WHERE md5(CAST(e.doc_id AS VARCHAR)) >= '$EvalLower'
          AND md5(CAST(t.doc_id AS VARCHAR)) < '$EvalLower'
        GROUP BY 1, 2
        HAVING COUNT(*) >= $MinShared)"""

  val oracles: Map[String, String] = Map(
    "decon_pairs" -> s"""
      $pairsSql
      SELECT train_id, eval_id, n_shared FROM pairs
      ORDER BY train_id, eval_id""",
    "decon_report" -> s"""
      $pairsSql
      SELECT eval_id,
        CAST(COUNT(*) AS BIGINT) AS n_train_docs,
        MAX(n_shared) AS max_shared,
        CAST(SUM(n_shared) AS BIGINT) AS total_shared
      FROM pairs GROUP BY eval_id ORDER BY eval_id""")
}
