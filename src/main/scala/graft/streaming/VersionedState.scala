package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe, replay-idempotent commit protocol for the foreachBatch
  * streaming states ([[graft.examples.StreamingCuration]]).
  *
  * Two hazards of the naive read→overwrite-in-place fold, both closed
  * here with ONE mechanism (VERDICT r9 ask #1, ADVICE r9 #4):
  *
  *  1. '''Crash mid-write loses all state''' — `mode("overwrite")`
  *     deletes the live directory before writing, so a crash between
  *     delete and commit leaves nothing readable. Here every fold
  *     writes a FRESH `<name>_v<N+1>/` directory and the previous
  *     version stays intact until the new one is fully committed;
  *     readers only ever see the latest COMMITTED version.
  *  2. '''At-least-once replay double-counts''' — count-based states
  *     (BM25 df/n_docs, token totals, length profiles, ablation
  *     counters, vocab growth, CMS/Misra-Gries registers…) assume each
  *     micro-batch folds exactly once; a redelivered `foreachBatch`
  *     call would fold it twice. Here every commit records the highest
  *     `batchId` folded so far inside the committed version
  *     ([[watermark]]), and [[alreadyFolded]] makes a replayed batch a
  *     no-op — `foreachBatch` batch ids are monotonic and a replay
  *     redelivers the SAME id, so `batchId <= watermark` ⇔ "this batch
  *     is already inside the state".
  *
  * Layout and commit point: a version directory holds the payload
  * parquet table(s) written by the caller plus a 1-row `state_meta`
  * parquet written LAST — `state_meta/_SUCCESS` is the commit marker
  * (the bm25_v<N> protocol of r6, generalized to every state). Older
  * versions are deleted best-effort only AFTER the new commit; a
  * half-written, never-committed `v<N+1>` from a crashed fold is
  * invisible to [[latest]] and simply overwritten by the next attempt.
  *
  * Scale shape: each state is bounded (vocabulary-, key-cardinality-,
  * sketch- or budget-bounded — never corpus-sized; see each merge's
  * doc), so the per-fold rewrite is state-sized, not stream-sized, and
  * the meta read is one 1-row parquet footer.
  *
  * Format-versioning non-goal: a version dir committed by a PROTOCOL
  * this library never shipped (e.g. a marker other than
  * `state_meta/_SUCCESS`) is indistinguishable from a crashed partial
  * and is ignored — the state restarts from its next fold and the
  * orphan dir above the new latest is leaked until manually removed.
  * No released state format predates this protocol, so no migration
  * path is carried; re-folding the source is the migration.
  */
object VersionedState {

  /** Meta table written last inside a version dir; its `_SUCCESS` is
    * the commit point. One row: (folded_watermark: long).
    */
  val MetaTable = "state_meta"

  /** Latest COMMITTED (version, path) of state `name` under `root`:
    * the highest `<name>_v<N>` whose `state_meta/_SUCCESS` exists.
    */
  def latest(root: String, name: String): Option[(Int, String)] = {
    val r = new java.io.File(root)
    Option(r.listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith(name + "_v") &&
            new java.io.File(f, s"$MetaTable/_SUCCESS").exists())
          scala.util.Try(n.stripPrefix(name + "_v").toInt).toOption
            .map(v => (v, f.getPath))
        else None
      }
      .sortBy(-_._1).headOption
  }

  /** Highest batchId ever folded into `name` (−1 when the state does
    * not exist yet or only unmanaged folds were applied).
    */
  def watermark(spark: SparkSession, root: String, name: String): Long =
    latest(root, name) match {
      case None => -1L
      case Some((_, dir)) =>
        spark.read.parquet(s"$dir/$MetaTable").head().getLong(0)
    }

  /** True iff `batchId` is a managed id (≥ 0) the state has already
    * folded — the caller must skip the fold (replay no-op). Unmanaged
    * folds (batchId = −1, e.g. direct spec calls) always apply.
    */
  def alreadyFolded(spark: SparkSession, root: String, name: String,
      batchId: Long): Boolean =
    batchId >= 0L && batchId <= watermark(spark, root, name)

  /** Payload table `table` of the latest committed version (None when
    * the state has never been committed).
    */
  def readTable(spark: SparkSession, root: String, name: String,
      table: String = "data"): Option[DataFrame] =
    latest(root, name).map { case (_, dir) =>
      spark.read.parquet(s"$dir/$table")
    }

  /** Commit one fold: `write` persists the payload table(s) under the
    * fresh version directory it is handed (use `mode("overwrite")` so
    * a crashed prior attempt's partial files are replaced); then the
    * meta row — watermark = max(previous watermark, batchId) — commits
    * the version, and older versions are deleted best-effort.
    *
    * IMPORTANT ordering contract for callers: any plan that READS the
    * previous version (the usual `prior.unionByName(batch)` merge) is
    * executed by `write` while the previous version still exists; only
    * after the meta commit does cleanup run.
    */
  def commit(spark: SparkSession, root: String, name: String,
      batchId: Long)(write: String => Unit): Unit = {
    import spark.implicits._
    val prior = latest(root, name)
    // read the watermark from the already-located prior version rather
    // than re-listing the root (one listing + one 1-row read per commit)
    val prevWm = prior match {
      case None => -1L
      case Some((_, dir)) =>
        spark.read.parquet(s"$dir/$MetaTable").head().getLong(0)
    }
    val nextV = prior.map(_._1 + 1).getOrElse(1)
    val dir = s"$root/${name}_v$nextV"
    write(dir)
    Seq(math.max(prevWm, batchId)).toDF("folded_watermark")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$MetaTable")
    // delete the version dirs that actually EXIST below the new commit
    // (one listing), not a 1..v probe walk — that walk was O(v) stat
    // calls per commit, O(v²) over a stream's life
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        val n = f.getName
        if (n.startsWith(name + "_v"))
          scala.util.Try(n.stripPrefix(name + "_v").toInt).toOption
            .filter(_ < nextV)
            .foreach(_ => graft.ops.Curation.deleteRecursively(f))
      }
  }
}
