package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, TextAnalysis}
import graft.streaming.{FileStreamingSource, ForeachBatchSink, StreamingPipeline, TriggerConfig, VersionedState}
import graft.ops.Scale.GatedCheckpoint

/** Incremental streaming curation — the batch capstone pipeline
  * ([[TrainingDataPipeline]]) restructured for the production shape: a
  * stream of document batches lands against a STORED corpus, and each
  * micro-batch pays cost ∝ batch size, never corpus size.
  *
  * Per micro-batch:
  *   1. PII redaction      — codegen'd replace chain, no shuffle
  *   2. quality gate       — same thresholds as ta_quality
  *   3. exact dedup        — in-batch md5 canonicalization, then a
  *                           broadcast-able anti-join against the stored
  *                           corpus md5 table (never corpus×corpus)
  *   4. near-dup dedup     — in-batch LSH + components keeps cluster
  *                           canonicals; [[Dedup.crossCorpusNearDups]]
  *                           drops batch docs near-duplicating the
  *                           corpus (bucket tables only join where a
  *                           NEW doc lands)
  *   5. accept + split     — deterministic md5 split; accepted docs and
  *                           their shingle sets APPEND to the corpus
  *                           state tables, becoming the base for the
  *                           next batch
  *
  * Corpus state = two parquet tables under `stateDir`:
  * `corpus_docs(doc_id, text_md5, split)` and
  * `corpus_sets(doc_id, set)` — the precomputed shingle sets the
  * cross-corpus join needs, stored once at accept time so no batch
  * ever re-shingles the corpus.
  */
object StreamingCuration {

  /** The latest committed payload table of a versioned state
    * ([[graft.streaming.VersionedState]] layout) — loud error when the
    * state has never been committed (readers are only meaningful after
    * at least one fold).
    */
  private def stateTable(spark: SparkSession, stateDir: String,
      name: String, table: String = "data"): DataFrame =
    VersionedState.readTable(spark, stateDir, name, table).getOrElse(
      sys.error(s"no committed '$name' state under $stateDir"))

  /** Quality gate shared with the batch pipeline. */
  def qualityGate(df: DataFrame): DataFrame = {
    val nTok = TextAnalysis.tokenCount(col("text"))
    val nonAlpha = length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long")
    df.filter(
      nTok >= 5L && nTok <= 10000L &&
        (nonAlpha.cast("double") / greatest(length(col("text")).cast("long"), lit(1L))) < 0.3)
  }

  /** One micro-batch through the curation graph. Accepted documents
    * append to the state tables; returns the POST-APPEND total corpus
    * row count (callers wanting the per-batch acceptance count should
    * diff successive returns or count the appended split table).
    *
    * Replay contract (VERDICT r9 ask #1): pass the foreachBatch
    * `batchId` and an at-least-once redelivery of a micro-batch leaves
    * EVERY state bit-identical — the count-based monitor folds are
    * watermark-gated inside [[graft.streaming.VersionedState]], the
    * sketch states (bloom/HLL/KMV) are idempotent merges, and the
    * corpus tables themselves are naturally replay-safe because the
    * exact-dedup gate anti-joins the very corpus the first delivery
    * appended to (a replayed doc is, by definition, a duplicate now).
    * The guarantee holds across a crash at ANY point in the batch, not
    * just clean redelivery: the docs append is the accept-phase COMMIT
    * POINT and runs last, every earlier write tolerates re-execution
    * (idempotent sets append, watermark-gated folds, verify-backed
    * bloom), and a partially-visible crashed docs append self-repairs
    * — see the commit-order comment in the accept phase.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
      threshold: Double = 0.8,
      bloomExpectedDocs: Long = BloomExpectedDocs,
      batchId: Long = -1L): Long = {
    import spark.implicits._
    val docsDir = s"$stateDir/corpus_docs"
    val setsDir = s"$stateDir/corpus_sets"
    val haveCorpus = graft.streaming.StateFs.exists(docsDir)

    // 0: per-source profile state — the incoming batch's volume, dup
    // and short-doc counts fold into profile_texts BEFORE any curation
    // stage, so the accumulated profile describes what ARRIVED (the
    // health signal a pipeline alerts on), not what survived
    mergeProfileState(spark, stateDir, batch, batchId)
    // 0b: token-frequency sketch state — same pre-gate placement, so
    // cmsEstimateFromState answers "how often has token X arrived"
    // without any corpus rescan (constant-size register fold ∝ batch)
    mergeCmsState(spark, stateDir, batch, batchId)
    // 0c: doc-length quantile sketch state — arriving documents' token
    // counts fold into the bounded decimal-bucket sketch, so p50/p99
    // document length stays monitorable per batch (quantilesFromState)
    // with a constant-size state rewrite and no corpus rescan
    mergeQuantileState(spark, stateDir,
      batch.select(TextAnalysis.tokenCount($"text").cast("double").as("value")),
      batchId)
    // 0d: per-source key-count state — the arriving stream's skew audit
    // (skewFromState) folds additively, key-cardinality-bounded
    mergeKeyCountState(spark, stateDir,
      if (batch.columns.contains("source")) batch
      else batch.withColumn("source", lit("stream")),
      "source", batchId)
    // 0e: KMV sketch state over arriving doc_ids — distinct-volume
    // telemetry at k rows of state (kmvEstimateFromState)
    mergeKmvState(spark, stateDir, batch, "doc_id", batchId)
    // 0f: batching-waste state — the arriving stream's padding-waste
    // report folds additively per length bucket (bucketWasteFromState)
    mergeBucketWasteState(spark, stateDir, batch, batchId)
    // 0g: (source, token) count state — the additive sufficient
    // statistic for Simpson diversity and source-vs-corpus TVD
    // (simpsonFromState / divergenceFromState)
    mergeTokenCountState(spark, stateDir, batch, batchId)
    // 0h: vocabulary-growth state — the live Heaps curve over arrival
    // order (heapsCurveFromState)
    mergeVocabGrowthState(spark, stateDir, batch, batchId)
    // 0i: embedding-norm health bands, when the stream carries vectors
    // (normHistFromState)
    if (batch.columns.contains("embedding"))
      mergeNormHistState(spark, stateDir, batch, batchId)

    // 1–2: redact, gate
    val clean = qualityGate(
      batch.select($"doc_id", TextAnalysis.redactPii($"text").as("text")))

    // 3: exact dedup — in-batch canonical (min doc_id per md5), then
    // novelty against the corpus via the PERSISTED BLOOM: the corpus
    // md5 broadcast would grow with the corpus (unbounded at 1e9 docs),
    // while the bloom stays fixed-size; only bloom-positive rows (batch
    // × fpp + true dups) pay the exact anti-join, so the join probe is
    // batch-bounded too. Bloom filters have no false negatives, so the
    // novelty answer is exact.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"text_md5").orderBy($"doc_id".asc)
    val inBatchExact = clean.withColumn("text_md5", md5($"text"))
      .withColumn("__rk", row_number().over(w))
      .filter($"__rk" === 1).drop("__rk")
    val novelExact =
      if (!haveCorpus) inBatchExact
      else inBatchExact.join(
        Dedup.bloomNovelWith(
            inBatchExact.select($"doc_id", $"text_md5"),
            readOrRebuildBloom(spark, stateDir, bloomExpectedDocs),
            spark.read.parquet(docsDir))
          .select($"doc_id"),
        Seq("doc_id"), "left_semi")

    // 4: near-dup dedup — in-batch clusters keep their canonical, then
    // cross-corpus candidates drop batch docs near-duplicating the base
    // localCheckpoint (not cache): the later append to docsDir triggers a
    // refreshByPath that would INVALIDATE a cache whose plan reads docsDir
    // (novelExact's anti-join does), forcing re-evaluation against the
    // batch's own appended rows. Checkpointing truncates the lineage so
    // the sets append cannot see the docs append.
    val batchSets = Dedup.shingleSetsOf(novelExact).gatedCheckpoint()
    try {
      val inBatchPairs = Dedup.verifyJaccardSets(
        Dedup.candidatePairs(Dedup.lshBucketsFused(batchSets)), batchSets, threshold)
      val inBatchDups = Dedup.connectedComponents(inBatchPairs)
        .filter($"doc_id" =!= $"component_id").select($"doc_id")
      val crossDups =
        if (!haveCorpus) inBatchDups.limit(0)
        else Dedup.crossCorpusNearDups(
            batchSets, spark.read.parquet(setsDir), threshold)
          .select($"a".as("doc_id")).distinct()
      val acceptedDedup = novelExact
        .join(inBatchDups.unionByName(crossDups).distinct(), Seq("doc_id"), "left_anti")

      // 4b: benchmark decontamination — when the state dir carries a
      // frozen eval-shingle snapshot, batch docs sharing n-grams with
      // the benchmark are rejected before they can enter the corpus.
      // Preference order: the latest VERSIONED snapshot
      // (Decontamination.writeEvalShinglesVersioned — refreshes are
      // crash-safe, a torn refresh leaves the previous snapshot
      // servable), else the legacy flat writeEvalShingles dir. Probe
      // cost ∝ batch (the eval side broadcasts); absent both, the gate
      // is a no-op.
      val evalShDir = s"$stateDir/eval_shingles"
      val evalSh = graft.ops.Decontamination
        .latestEvalShingles(spark, stateDir)
        .orElse {
          if (graft.streaming.StateFs.exists(evalShDir))
            Some(spark.read.parquet(evalShDir))
          else None
        }
      val accepted = evalSh match {
        case None => acceptedDedup
        case Some(es) => acceptedDedup.join(
          graft.ops.Decontamination
            .contaminationAgainst(acceptedDedup, es)
            .select($"train_id".as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      }

      // 5: split assignment; state writes (sets, folds, bloom, then
      // docs LAST — the accept-phase commit point, see below).
      // MATERIALIZE before any append: the plan anti-joins
      // spark.read.parquet(docsDir), so a lazy re-evaluation after the
      // docs append would see the batch's own rows and resolve to empty.
      // localCheckpoint(eager) truncates the lineage so every write
      // reads the same computed set.
      val withSplit = Sampling.hashSplit(accepted, "doc_id")
        .select($"doc_id", $"text_md5", $"split")
        .gatedCheckpoint()
      // 6: chunk-frequency state for incremental boilerplate removal —
      // the accepted docs' distinct chunk hashes, ALSO materialized
      // before any append (same lazy-re-read hazard as withSplit:
      // `accepted` anti-joins the docsDir read)
      val newChunks = graft.ops.Curation
        .distinctChunkHashes(accepted.select($"doc_id", $"text"))
        .gatedCheckpoint()
      // 6b: first-occurrence novelty state input — the accepted docs'
      // (doc_id, text), ALSO materialized before any append (the same
      // lazy-re-read hazard: `accepted` anti-joins the docsDir read,
      // so evaluating it after the docs append would resolve empty and
      // silently fold nothing)
      val noveltyDocs = accepted.select($"doc_id", $"text")
        .gatedCheckpoint()
      // ACCEPT-PHASE COMMIT ORDER (r10 review finding #1): the docs
      // append is the COMMIT POINT and runs LAST. Until it lands, a
      // redelivery recomputes the IDENTICAL accepted set (the dedup
      // gate's corpus is unchanged), so every earlier write just has
      // to tolerate re-execution: the sets append is made idempotent
      // by an anti-join on already-present doc_ids (same cost class as
      // the cross-corpus join that reads setsDir anyway), the
      // chunk/novelty/para folds are watermark-gated (a replay skips
      // them, and their first execution already folded the full
      // accepted set), and the bloom fold is harmless to repeat —
      // bloom positives are exact-verified, so pre-commit bloom
      // entries cannot drop a replayed doc. The former order (docs
      // first) could crash between the two appends and leave the
      // corpus permanently missing its shingle sets, with the
      // watermarks blocking any repair.
      val setsToAppend = {
        val acceptedSets = batchSets
          .join(withSplit.select($"doc_id"), Seq("doc_id"), "left_semi")
        val novel =
          if (!graft.streaming.StateFs.exists(setsDir)) acceptedSets
          else acceptedSets.join(
            spark.read.parquet(setsDir).select($"doc_id"),
            Seq("doc_id"), "left_anti")
        // materialize: the anti-join READS the table being appended
        novel.localCheckpoint(eager = true)
      }
      setsToAppend.write.mode("append").parquet(setsDir)
      mergeChunkFreq(spark, stateDir, newChunks, batchId)
      mergeNoveltyState(spark, stateDir, noveltyDocs, batchId)
      // line first-occurrence state for incremental paragraph dedup —
      // reuses the already-materialized accepted (doc_id, text) frame
      mergeParaState(spark, stateDir, noveltyDocs, batchId)
      // fold the accepted md5s into the persisted corpus bloom (the
      // collect is batch-bounded; withSplit is already materialized)
      updateBloom(spark, stateDir,
        withSplit.select($"text_md5").collect().map(_.getString(0)),
        bloomExpectedDocs)
      // COMMIT POINT: only now do the accepted docs enter the corpus
      // the dedup gate reads — a partially-visible crashed append
      // self-repairs on replay (visible rows are dropped by the gate,
      // missing rows are re-accepted and re-appended)
      withSplit.write.mode("append").parquet(docsDir)
      val corpusSize = spark.read.parquet(docsDir).count() // post-append
      // lifecycle trigger: once the corpus outgrows the sizing the
      // bloom was created with, its fpp degrades toward all-positive —
      // still correct (positives are exact-verified) but every row pays
      // the anti-join. Rebuild distributed, at double the current size.
      maybeRebuildBloom(spark, stateDir, corpusSize, bloomExpectedDocs)
      // per-batch appends fragment the state tables one file per
      // partition per batch — compact once the count crosses the
      // threshold (liststatus check only; a no-op most batches)
      maybeCompactCorpus(spark, stateDir)
      corpusSize
    } finally { batchSets.unpersist(); () }
  }

  /** Compact the append-fragmented corpus state tables once either
    * crosses `maxFiles` parquet files — micro-batch appends are the
    * canonical small-file generator ([[graft.ops.Scale.compactSmallFiles]]
    * doc); rows are preserved exactly, and every consumer re-lists the
    * directory per batch, so a swap between batches is safe.
    */
  def maybeCompactCorpus(spark: SparkSession, stateDir: String,
      maxFiles: Int = 256, targetBytes: Long = 128L << 20): Unit = {
    // the ExactSubstr append-only index accumulates files at the same
    // per-batch rate as the sets table; it compacts in the
    // duplicate-safe swap order (move-in before delete) because its
    // readers dedup on natural keys and — unlike the bloom — the index
    // is NOT rebuildable from another table, so a crash mid-swap must
    // err toward duplicates, never loss (r11 review finding #1)
    Seq((s"$stateDir/corpus_docs", false), (s"$stateDir/corpus_sets", false),
        (s"$stateDir/substr_gram_index", true),
        (s"$stateDir/substr_doc_lens", true))
      .foreach { case (dir, dupSafe) =>
        if (graft.streaming.StateFs.exists(dir)) {
          val n = graft.streaming.StateFs.list(dir)
            .count(_.getName.endsWith(".parquet"))
          if (n > maxFiles) {
            graft.ops.Scale.compactSmallFiles(spark, dir, targetBytes,
              duplicateSafe = dupSafe)
            ()
          }
        }
      }
  }

  /** Persisted corpus Bloom filter — the fixed-size exact-dedup
    * prefilter (see [[graft.ops.Dedup.bloomNovelWith]]): sized for 10M
    * docs at 1% fpp (~12 MB) by default. The sizing it was created with
    * persists in a sidecar capacity file; when the corpus outgrows it,
    * [[maybeRebuildBloom]] rebuilds at double the corpus size with a
    * DISTRIBUTED sketch aggregation (fpp degradation is a throughput
    * problem, never a correctness one — positives are exact-verified,
    * and bloom filters have no false negatives).
    */
  val BloomExpectedDocs = 10000000L
  val BloomFpp = 0.01

  private def bloomPath(stateDir: String) = s"$stateDir/corpus_bloom.bin"
  private def capacityPath(stateDir: String) = s"$stateDir/corpus_bloom.capacity"

  def readBloom(stateDir: String): org.apache.spark.util.sketch.BloomFilter = {
    val in = graft.streaming.StateFs.open(bloomPath(stateDir))
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
    finally in.close()
  }

  /** The doc count the stored bloom was sized for (None: sketch written
    * by a version without the sidecar — callers fall back to the
    * configured default).
    */
  def bloomCapacity(stateDir: String): Option[Long] = {
    val p = capacityPath(stateDir)
    if (!graft.streaming.StateFs.exists(p)) None
    else Some(new String(
      graft.streaming.StateFs.readAllBytes(p), "UTF-8").trim.toLong)
  }

  /** A corpus without a sketch (state written by an earlier version, or
    * a deleted/torn file) must not crash ingestion OR silently skip the
    * dedup gate: rebuild the bloom from the authoritative corpus_docs
    * table, persist it, and proceed.
    */
  def readOrRebuildBloom(
      spark: SparkSession, stateDir: String,
      expectedDocs: Long = BloomExpectedDocs): org.apache.spark.util.sketch.BloomFilter =
    if (graft.streaming.StateFs.exists(bloomPath(stateDir))) readBloom(stateDir)
    else {
      rebuildBloom(spark, stateDir,
        math.max(expectedDocs,
          2L * spark.read.parquet(s"$stateDir/corpus_docs").count()))
      readBloom(stateDir)
    }

  /** Rebuild the sketch when the corpus has outgrown the capacity the
    * stored one was created with. The check is two cheap scalars (the
    * post-append count the caller already has + the sidecar file);
    * the rebuild itself is corpus-sized but runs distributed and fires
    * O(log corpus) times over a corpus's lifetime (capacity doubles).
    */
  def maybeRebuildBloom(
      spark: SparkSession, stateDir: String, corpusSize: Long,
      expectedDocs: Long = BloomExpectedDocs): Boolean = {
    val cap = bloomCapacity(stateDir).getOrElse(expectedDocs)
    val outgrown = corpusSize > cap
    if (outgrown)
      rebuildBloom(spark, stateDir,
        math.max(expectedDocs, 2L * corpusSize))
    outgrown
  }

  /** Rebuild from the authoritative corpus_docs table with Spark's
    * distributed bloom aggregation — executors fold partitions into
    * partial sketches and only the final ~MB sketch reaches the driver
    * (the md5 rows never do).
    */
  def rebuildBloom(spark: SparkSession, stateDir: String, capacity: Long): Unit = {
    val bloom = spark.read.parquet(s"$stateDir/corpus_docs")
      .stat.bloomFilter("text_md5", math.max(1L, capacity), BloomFpp)
    writeBloomAtomic(stateDir, bloom, capacity)
  }

  /** Put a batch's accepted md5s into the stored bloom (creating it on
    * first use). A missing sidecar with an EXISTING corpus is a
    * torn/crashed write (the [[graft.streaming.StateFs.writeAtomic]]
    * object-store copy+delete window), not first use — minting an
    * empty sketch there would mark every prior doc bloom-negative, and
    * their future duplicates would flow through `bloomNovelWith`'s
    * definite-novel branch straight into the corpus (ADVICE r11 #1).
    * So this reader gets the same rebuild-from-authoritative-table
    * fallback as the gate's read path: [[readOrRebuildBloom]].
    */
  def updateBloom(spark: SparkSession, stateDir: String,
      acceptedMd5s: Array[String],
      expectedDocs: Long = BloomExpectedDocs): Unit = {
    val bloom =
      if (graft.streaming.StateFs.exists(bloomPath(stateDir)))
        readBloom(stateDir)
      else if (graft.streaming.StateFs.exists(s"$stateDir/corpus_docs"))
        readOrRebuildBloom(spark, stateDir, expectedDocs)
      else // genuinely first use: no corpus appended yet
        org.apache.spark.util.sketch.BloomFilter
          .create(math.max(1L, expectedDocs), BloomFpp)
    acceptedMd5s.foreach(bloom.putString)
    // the rebuild path re-wrote the capacity sidecar, so reading it
    // back is uniform across all three branches
    writeBloomAtomic(stateDir, bloom,
      bloomCapacity(stateDir).getOrElse(expectedDocs))
  }

  /** Write-to-temp + rename for sketch and capacity sidecar, so a
    * crashed update can't leave a torn pair. Routed through
    * [[graft.streaming.StateFs.writeAtomic]] (VERDICT r10 ask #2) so
    * remote state dirs get the same protection; see that method's doc
    * for the object-store rename caveat (covered here by
    * [[readOrRebuildBloom]]'s rebuild fallback).
    */
  private def writeBloomAtomic(
      stateDir: String, bloom: org.apache.spark.util.sketch.BloomFilter,
      capacity: Long): Unit = {
    graft.streaming.StateFs.writeAtomic(bloomPath(stateDir))(bloom.writeTo)
    graft.streaming.StateFs.writeAtomic(capacityPath(stateDir))(
      _.write(capacity.toString.getBytes("UTF-8")))
  }

  /** Fold a batch's (doc_id, h) distinct chunk hashes into the
    * persistent `chunk_freq(h, nd)` table (nd = how many accepted docs
    * ever contained the chunk; doc_ids are unique across batches, so
    * per-batch distinct counts add). Crash-safe + replay-idempotent
    * via the [[graft.streaming.VersionedState]] commit protocol: the
    * merge reads the previous committed version and writes a fresh
    * one, and a redelivered batchId is a no-op.
    */
  def mergeChunkFreq(spark: SparkSession, stateDir: String,
      newChunks: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "chunk_freq", batchId)) return
    val batchCounts = newChunks.groupBy($"h").agg(count(lit(1)).as("nd"))
    val merged = VersionedState.readTable(spark, stateDir, "chunk_freq") match {
      case None => batchCounts
      case Some(prior) => prior.unionByName(batchCounts)
        .groupBy($"h").agg(sum($"nd").as("nd"))
    }
    VersionedState.commit(spark, stateDir, "chunk_freq", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Fold a batch into the persistent per-source profile state
    * `profile_texts(source, m, n, tokens, short)` — one row per
    * (source, text-md5) with additive doc/token/short-doc counts. Every
    * [[graft.ops.Curation.taProfile]] metric is derivable from it
    * EXACTLY: n_docs = Σn, total_tokens = Σtokens, distinct_texts =
    * row count, dup_docs = Σn − rows, short_docs = Σshort — so corpus
    * health stays monitorable per batch without ever rescanning the
    * corpus (the [[mergeChunkFreq]] pattern; doc rows never accumulate,
    * only the md5-keyed counts do). Batches without a `source` column
    * profile under the single source "stream".
    */
  def mergeProfileState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "profile_texts", batchId)) return
    val src =
      if (batch.columns.contains("source")) col("source") else lit("stream")
    val rows = batch
      .select(src.as("source"), md5(col("text")).as("m"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .groupBy($"source", $"m")
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("tokens"),
        sum(when($"n_tokens" < 5L, 1L).otherwise(0L)).as("short"))
    val merged = VersionedState.readTable(spark, stateDir, "profile_texts") match {
      case None => rows
      case Some(prior) => prior.unionByName(rows)
        .groupBy($"source", $"m")
        .agg(sum($"n").as("n"), sum($"tokens").as("tokens"),
          sum($"short").as("short"))
    }
    VersionedState.commit(spark, stateDir, "profile_texts", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated profile, shaped exactly like
    * [[graft.ops.Curation.taProfile]] (same columns, same types, same
    * ordering): integer metrics aggregate exactly from the state table
    * and mean_tokens is the same two-integer IEEE division, so after N
    * batches this EQUALS the batch profile of their concatenation
    * (spec-pinned in StreamingCurationSpec).
    */
  def profileFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    stateTable(spark, stateDir, "profile_texts")
      .groupBy($"source")
      .agg(sum($"n").as("n_docs"), sum($"tokens").as("total_tokens"),
        count(lit(1)).as("distinct_texts"), sum($"short").as("short_docs"))
      .select($"source", $"n_docs", $"total_tokens", $"distinct_texts",
        ($"n_docs" - $"distinct_texts").as("dup_docs"), $"short_docs",
        ($"total_tokens".cast("double") / $"n_docs".cast("double"))
          .as("mean_tokens"))
      .orderBy("source")
  }

  /** Fold a batch into the persistent token-budget mix state — the
    * incremental form of [[graft.ops.Curation.mixBudgetOf]]. Per
    * source the batch is filled in the same greedy order (n_chars
    * desc, doc_id), CONTINUING the source's cumulative run from
    * `mix_runs(source, run)`; admitted rows append to `mix_selected`
    * and the run advances by the batch's TOTAL tokens (admitted or
    * not), exactly like the batch form's prefix-cut semantics — so
    * when batches arrive in greedy order the accumulated selection is
    * row-identical to the batch fill of their concatenation
    * (spec-pinned), and a source that exhausted its budget admits
    * nothing ever after. Driver state is one bounded #sources-row
    * collect per batch (the same boundedness as the prefix-sum bases);
    * selection work is ∝ batch via the shared two-pass kernel.
    *
    * Both halves — the #sources `runs` table and the budget-BOUNDED
    * `selected` table (admission stops at `budget` tokens, so its size
    * is capped by the budget, never the stream) — commit together in
    * ONE [[graft.streaming.VersionedState]] version: the former
    * append-selected/overwrite-runs pair could crash between the two
    * writes and leave selection ahead of the run bases, double-
    * admitting on refold. A replayed batchId is a no-op that returns
    * the batch's already-admitted rows (tagged per-fold via the stored
    * `__batch_id` column).
    *
    * `stateName` selects the state family: the default `"mix"` is the
    * single-budget fill; [[mergeMixCurveState]] folds the same kernel
    * at the budget SWEEP's cap into a separate `"mix_curve"` state so
    * the two selections (bounded at 600 vs 2400 tokens/source) never
    * mix.
    */
  def mergeMixState(spark: SparkSession, stateDir: String, batch: DataFrame,
      budget: Long = graft.ops.Curation.MixBudget,
      batchId: Long = -1L, stateName: String = "mix"): DataFrame = {
    import spark.implicits._
    val selOf = (df: DataFrame) => df.drop("__batch_id")
    if (VersionedState.alreadyFolded(spark, stateDir, stateName, batchId))
      return selOf(stateTable(spark, stateDir, stateName, "selected")
        .filter($"__batch_id" === batchId))
    val prior: Map[String, Long] =
      VersionedState.readTable(spark, stateDir, stateName, "runs") match {
        case None => Map.empty
        case Some(r) => r.collect()
          .map(x => x.getString(0) -> x.getLong(1)).toMap
      }
    val sel = graft.ops.Curation
      .mixBudgetOf(batch, budget, initialRuns = prior)
      .withColumn("__batch_id", lit(batchId))
      .gatedCheckpoint()
    val allSel = VersionedState.readTable(spark, stateDir, stateName, "selected") match {
      case None => sel
      case Some(p) => p.unionByName(sel)
    }
    val batchTotals = batch
      .groupBy($"source")
      .agg(sum(graft.ops.TextAnalysis.tokenCount($"text")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val runs = (prior.keySet ++ batchTotals.keySet).toSeq.sorted
      .map(src => (src, prior.getOrElse(src, 0L) + batchTotals.getOrElse(src, 0L)))
    VersionedState.commit(spark, stateDir, stateName, batchId) { dir =>
      allSel.write.mode("overwrite").parquet(s"$dir/selected")
      runs.toDF("source", "run").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/runs")
    }
    selOf(sel)
  }

  /** The accumulated mix selection, shaped exactly like the batch
    * [[graft.ops.Curation.mixBudgetOf]] output (cum_tokens continues
    * across batches).
    */
  def mixFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    stateTable(spark, stateDir, "mix", "selected").drop("__batch_id")
      .orderBy($"source", $"cum_tokens")
  }

  /** Fold a batch into the budget-SWEEP mix state — the incremental
    * half of [[graft.ops.Curation.mixBudgetCurve]]: the same greedy
    * kernel as [[mergeMixState]] (replay gate, crash-atomic
    * selected+runs commit, run continuation included) but capped at the
    * sweep's LARGEST candidate budget into the separate `"mix_curve"`
    * state, so the accumulated selection contains every row any
    * candidate budget could keep. Fold cost ∝ batch; the state stays
    * bounded at sources × maxBudget tokens' worth of rows.
    */
  def mergeMixCurveState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): DataFrame =
    mergeMixState(spark, stateDir, batch,
      budget = graft.ops.Curation.MixCurveBudgets.max,
      batchId = batchId, stateName = "mix_curve")

  /** The per-budget mix tuning curve served from the accumulated
    * `"mix_curve"` state — [[graft.ops.Curation.mixCurveOfRuns]] (the
    * registered query's own aggregate tail, so the derivations cannot
    * drift) over the state's greedy runs, whose cum_tokens continue
    * across batches exactly like the batch fill of their concatenation
    * (spec-pinned). Reading the curve costs one pass over the BOUNDED
    * state table — no corpus re-scan per budget ablation.
    */
  def mixCurveFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Curation.mixCurveOfRuns(
      stateTable(spark, stateDir, "mix_curve", "selected").drop("__batch_id"))
  }

  /** Fold a batch into the persistent window-frequency state
    * `window_freq(h, nd)` — the incremental half of
    * [[graft.ops.Curation.taExactSubstr]], the [[mergeChunkFreq]]
    * pattern at sliding-window granularity: per batch, each distinct
    * window hash contributes its batch distinct-doc count. Under the
    * pipeline's invariant that every accepted document enters exactly
    * one batch (exact/near-dup gates run first), the accumulated nd
    * equals the corpus-wide distinct-doc count, so state-driven removal
    * matches the batch operator exactly (spec-pinned).
    */
  def mergeWindowFreq(spark: SparkSession, stateDir: String, batch: DataFrame,
      k: Int = graft.ops.Curation.SubstrWindow, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "window_freq", batchId)) return
    val batchCounts = graft.ops.Curation.windowHashes(batch, k)
      .groupBy($"h").agg(countDistinct($"doc_id").as("nd"))
    val merged = VersionedState.readTable(spark, stateDir, "window_freq") match {
      case None => batchCounts
      case Some(prior) => prior.unionByName(batchCounts)
        .groupBy($"h").agg(sum($"nd").as("nd"))
    }
    VersionedState.commit(spark, stateDir, "window_freq", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Strip repeated spans from documents against the ACCUMULATED
    * window-frequency state — cost ∝ the scored frame, never a corpus
    * rescan.
    */
  def exactSubstrAgainstState(
      spark: SparkSession, stateDir: String, docs: DataFrame,
      k: Int = graft.ops.Curation.SubstrWindow,
      minDocs: Int = graft.ops.Curation.BoilerMinDocs): DataFrame = {
    import spark.implicits._
    val dup = VersionedState.readTable(spark, stateDir, "window_freq") match {
      case None => Seq.empty[String].toDF("h")
      case Some(st) => st.filter($"nd" >= minDocs).select($"h")
    }
    graft.ops.Curation.exactSubstrWithDup(docs, dup, k)
  }

  /** Fold a batch's distinct-text evidence into a persistent
    * HyperLogLog register file — a CONSTANT-SIZE (2^p bytes) streaming
    * distinct-count state, the bounded twin of the profile state's
    * exact md5 table. Register max is commutative/associative/
    * idempotent, so the folded state is bit-equal to a single pass over
    * the concatenated batches (spec-pinned) — re-delivered documents
    * cannot inflate the count.
    */
  def mergeDistinctSketch(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    // register max is idempotent — a replay couldn't corrupt it — but
    // the watermark skip still saves the fold, and the versioned
    // commit (vs the former overwrite-in-place) survives a crash
    if (VersionedState.alreadyFolded(spark, stateDir, "hll_regs", batchId)) return
    val agg = new graft.functions.HllAggregator()
    val hll = udaf(agg)
    val batchRegs = batch.select(xxhash64(col("text")).as("h"))
      .agg(hll($"h")).head().getAs[Array[Byte]](0)
    val merged = VersionedState.readTable(spark, stateDir, "hll_regs") match {
      case None => batchRegs
      case Some(prior) => agg.merge(prior.head().getAs[Array[Byte]](0), batchRegs)
    }
    VersionedState.commit(spark, stateDir, "hll_regs", batchId) { dir =>
      Seq(merged).toDF("regs").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated distinct-text estimate (deterministic). */
  def distinctFromState(spark: SparkSession, stateDir: String): Long =
    graft.functions.HllAggregator.estimate(
      stateTable(spark, stateDir, "hll_regs").head().getAs[Array[Byte]](0))

  /** Fold a batch into the persistent heavy-hitter sketch state: ONE
    * bounded Misra–Gries summary (<= k counters) plus the running token
    * total — per-batch cost is one aggregation over the batch and a
    * <= k-row state rewrite, never a corpus rescan. Mergeability
    * (Agarwal et al.) makes the folded state carry the same guarantee
    * as a single-pass sketch over the concatenation: every token above
    * n/(k+1) of ALL tokens seen so far is in the candidate set.
    */
  def mergeHeavyHitterState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    // count-based (MG counters + token total add) → watermark-gated;
    // the sketch and total also commit in ONE version now, so a crash
    // can no longer leave the pair torn (formerly two separate writes)
    if (VersionedState.alreadyFolded(spark, stateDir, "hh", batchId)) return
    val agg = new graft.functions.MisraGriesAggregator(TextAnalysis.HhSketchK)
    val mg = udaf(agg)
    val row = batch
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .agg(count(lit(1)), mg(col("token")))
      .head()
    val batchN = row.getLong(0)
    val batchSketch = row.getMap[String, Long](1).toMap
    val (priorN, priorSketch) = readHeavyHitterState(spark, stateDir)
    VersionedState.commit(spark, stateDir, "hh", batchId) { dir =>
      agg.merge(priorSketch, batchSketch).toSeq.toDF("token", "est")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/sketch")
      Seq(priorN + batchN).toDF("n")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/n")
    }
  }

  /** (total tokens seen, sketch) — bounded: 1 + <= k rows. */
  def readHeavyHitterState(spark: SparkSession, stateDir: String): (Long, Map[String, Long]) =
    VersionedState.latest(stateDir, "hh") match {
      case None => (0L, Map.empty)
      case Some((_, dir)) => (
        spark.read.parquet(s"$dir/n").head().getLong(0),
        spark.read.parquet(s"$dir/sketch").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap)
    }

  /** The on-demand verify half over an accumulated corpus: exact
    * recount RESTRICTED to the <= k sketch candidates (a filtered scan
    * that counts at most k distinct tokens — it never shuffles the
    * vocabulary), thresholded like the batch op. Output equals
    * [[graft.ops.TextAnalysis.heavyHittersOf]] of the corpus whenever
    * the corpus is exactly the concatenation of the folded batches
    * (spec-pinned).
    */
  def heavyHittersFromState(spark: SparkSession, stateDir: String,
      corpus: DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val (n, sketch) = readHeavyHitterState(spark, stateDir)
    val cand = sketch.keys.toSeq
    if (cand.isEmpty) Seq.empty[(String, Long)].toDF("token", "freq")
    else corpus
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .filter(col("token").isin(cand: _*))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
      .filter($"freq" * TextAnalysis.HhPhiInv > n)
      .orderBy($"freq".desc, $"token".asc)
  }

  /** Fold a batch into the persistent count-min frequency state: one
    * constant-size depth×width register file regardless of vocabulary
    * or corpus size — the point-estimate twin of the heavy-hitter
    * candidate state (which answers "which tokens are heavy"; this one
    * answers "roughly how often is token X" for ANY token). The batch
    * sketch comes from the same codegen'd md5-cell pipeline as the
    * registered [[graft.ops.TextAnalysis.cmsFreqOf]]; element-wise-sum
    * mergeability makes the folded state BIT-EQUAL to a single-pass
    * sketch over the concatenation (spec-pinned), so estimates keep the
    * one-sided error bound at any batch split.
    */
  def mergeCmsState(spark: SparkSession, stateDir: String, batch: DataFrame,
      batchId: Long = -1L): Unit = {
    import spark.implicits._
    // register SUMS add — NOT idempotent — so the watermark gate is
    // what keeps a replayed micro-batch from inflating every estimate
    if (VersionedState.alreadyFolded(spark, stateDir, "cms_sketch", batchId)) return
    val depth = graft.functions.CountMinAggregator.DefaultDepth
    val width = graft.functions.CountMinAggregator.DefaultWidth
    val agg = new graft.functions.CountMinAggregator(depth, width)
    val cm = udaf(agg)
    val cells = (0 until depth).map(r =>
      conv(substring(md5(col("token")), 8 * r + 1, 3), 16, 10).cast("int"))
    val batchSketch = batch
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .select(array(cells: _*).as("cells"))
      .agg(cm(col("cells"))).head().getSeq[Long](0).toArray
    val merged = agg.merge(readCmsState(spark, stateDir), batchSketch)
    VersionedState.commit(spark, stateDir, "cms_sketch", batchId) { dir =>
      Seq(merged).toDF("sketch").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated register file (zeros when no state exists). */
  def readCmsState(spark: SparkSession, stateDir: String): Array[Long] =
    VersionedState.readTable(spark, stateDir, "cms_sketch") match {
      case None =>
        new Array[Long](graft.functions.CountMinAggregator.DefaultDepth *
          graft.functions.CountMinAggregator.DefaultWidth)
      case Some(st) => st.head().getSeq[Long](0).toArray
    }

  /** Point-frequency estimate for any token from the accumulated state
    * — a pure driver-side array lookup, no corpus rescan.
    */
  def cmsEstimateFromState(spark: SparkSession, stateDir: String, token: String): Long =
    graft.functions.CountMinAggregator.estimate(
      readCmsState(spark, stateDir),
      graft.functions.CountMinAggregator.cellsOf(token))

  /** Fold a batch of positive numeric `value` rows into the persistent
    * decimal quantile-sketch state `quantile_buckets(lo, width, cnt)` —
    * the [[graft.queries.QualityQueries.sketchBuckets]] cells merged by
    * plain count addition. The sketch is bounded (two significant
    * decimal digits → ≤ 90 cells per decade), so each fold costs one
    * batch aggregation plus a constant-size state rewrite, and integer
    * counts make the fold EXACT: the folded state equals the one-shot
    * sketch over the concatenation of all folded batches (spec-pinned),
    * so rank estimates from state carry the batch query's ≤10%
    * relative-error certificate unchanged.
    */
  def mergeQuantileState(spark: SparkSession, stateDir: String,
      values: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "quantile_buckets", batchId)) return
    val batchB = graft.queries.QualityQueries.sketchBuckets(values)
    val merged = VersionedState.readTable(spark, stateDir, "quantile_buckets") match {
      case None => batchB
      case Some(prior) => prior.unionByName(batchB)
        .groupBy($"lo", $"width").agg(sum($"cnt").as("cnt"))
    }
    VersionedState.commit(spark, stateDir, "quantile_buckets", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Quantile estimates from the accumulated sketch state — the same
    * kernel as the batch `dq_quantile_sketch` query, over state only.
    */
  def quantilesFromState(spark: SparkSession, stateDir: String): DataFrame =
    graft.queries.QualityQueries.quantilesFromBuckets(
      stateTable(spark, stateDir, "quantile_buckets"),
      graft.queries.QualityQueries.QsPcts)

  /** Fold a batch's per-key row counts into the persistent key-count
    * state `key_counts_<col>(k, cnt)` — additive integer counts (the
    * chunk-freq pattern), bounded by the key cardinality, so the skew
    * audit of EVERYTHING THAT EVER ARRIVED stays answerable per batch
    * without a corpus rescan.
    */
  def mergeKeyCountState(spark: SparkSession, stateDir: String,
      batch: DataFrame, keyCol: String, batchId: Long = -1L): Unit = {
    import spark.implicits._
    val name = s"key_counts_$keyCol"
    if (VersionedState.alreadyFolded(spark, stateDir, name, batchId)) return
    val bc = batch.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt"))
    val merged = VersionedState.readTable(spark, stateDir, name) match {
      case None => bc
      case Some(prior) => prior.unionByName(bc)
        .groupBy($"k").agg(sum($"cnt").as("cnt"))
    }
    VersionedState.commit(spark, stateDir, name, batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Fold a batch's whitespace-token frequencies into persistent
    * state — the additive sufficient statistic of the BPE trainer
    * (r12, the 29th streaming twin): the trainer's first move is
    * collapsing the corpus to (word, freq), and counts add across
    * batches in any order, so a benchmark-cadence retrain
    * ([[bpeTrainFromState]]) reads the folded vocabulary instead of
    * re-scanning corpus text — at 100 TB the retrain input is
    * vocabulary-sized (~10^8 rows), not corpus-sized (~10^12 docs).
    * Rides [[mergeKeyCountState]] with the token as the key.
    */
  def mergeTokenFreqState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit =
    mergeKeyCountState(spark, stateDir,
      batch.select(explode(
        graft.ops.TextAnalysis.tokens(lower(col("text")))).as("token")),
      "token", batchId)

  /** Retrain the BPE merge table from the folded vocabulary state —
    * equals the one-shot [[graft.ops.TextAnalysis.bpeTrainOf]] over
    * every folded doc exactly (the trainer is a pure function of the
    * word-frequency table; spec-pinned).
    */
  def bpeTrainFromState(spark: SparkSession, stateDir: String,
      nMerges: Int = graft.ops.TextAnalysis.BpeMerges): DataFrame =
    graft.ops.TextAnalysis.bpeTrainFromFreq(
      stateTable(spark, stateDir, "key_counts_token")
        .select(col("k").as("w"), col("cnt").as("freq")),
      nMerges)

  /** The merge-budget ablation curve from the folded vocabulary state
    * (30th streaming twin) — [[graft.ops.TextAnalysis.taBpeCurve]]'s
    * arithmetic over [[mergeTokenFreqState]]'s counts under a frozen
    * merge table: the curve a tokenizer owner re-reads on retrain
    * cadence, priced at one vocabulary-sized kernel pass with zero
    * corpus-text rescans (spec-pinned equal to the batch curve).
    */
  def bpeCurveFromState(spark: SparkSession, stateDir: String,
      merges: Seq[(String, String)],
      budgets: Seq[Int] = graft.ops.TextAnalysis.BpeCurveBudgets): DataFrame =
    graft.ops.TextAnalysis.bpeCurveFromFreq(
      stateTable(spark, stateDir, "key_counts_token")
        .select(col("k").as("w"), col("cnt").as("freq")),
      merges, budgets)

  /** Fold a batch's unigram and bigram counts into the persistent
    * add-one bigram LM model state (37th streaming twin — the
    * incremental form of [[graft.ops.TextAnalysis.taLmSurprisal]]'s
    * model): both tables are additive sufficient statistics, so
    * folding batches in any order equals the one-shot model exactly,
    * and a scoring pass reads the folded model instead of re-counting
    * the corpus — at 100 TB the model is observed-bigram-bounded
    * (Heaps-law sublinear), not corpus-sized, and scoring new data
    * against yesterday's frozen model is exactly the production
    * perplexity-filter deployment. Two VersionedState commits
    * (`lm_uni`, `lm_big`) under the same batchId: a crash between them
    * replays into the per-table alreadyFolded gate, so each folds
    * exactly once.
    */
  def mergeLmModelState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (!VersionedState.alreadyFolded(spark, stateDir, "lm_uni", batchId)) {
      val bc = graft.ops.TextAnalysis.lmTokensOf(batch)
        .groupBy($"w").agg(count(lit(1)).as("c_w"))
      val merged = VersionedState.readTable(spark, stateDir, "lm_uni") match {
        case None => bc
        case Some(prior) => prior.unionByName(bc)
          .groupBy($"w").agg(sum($"c_w").as("c_w"))
      }
      VersionedState.commit(spark, stateDir, "lm_uni", batchId) { dir =>
        merged.write.mode("overwrite").parquet(s"$dir/data")
      }
    }
    if (!VersionedState.alreadyFolded(spark, stateDir, "lm_big", batchId)) {
      val bc = graft.ops.TextAnalysis.lmBigramsOf(batch)
        .groupBy($"prev", $"w").agg(count(lit(1)).as("c_bw"))
      val merged = VersionedState.readTable(spark, stateDir, "lm_big") match {
        case None => bc
        case Some(prior) => prior.unionByName(bc)
          .groupBy($"prev", $"w").agg(sum($"c_bw").as("c_bw"))
      }
      VersionedState.commit(spark, stateDir, "lm_big", batchId) { dir =>
        merged.write.mode("overwrite").parquet(s"$dir/data")
      }
    }
  }

  /** Score a (doc_id, text) frame against the ACCUMULATED bigram model
    * — identical columns to the batch
    * [[graft.ops.TextAnalysis.taLmSurprisal]], via the shared
    * [[graft.ops.TextAnalysis.lmScoreWith]] scoring tail (the two
    * derivations cannot drift). Bigrams absent from the folded model
    * are unscorable-OOV and drop out — the documented frozen-model
    * semantics.
    */
  def lmScoreAgainstState(spark: SparkSession, stateDir: String,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.ops.TextAnalysis.lmScoreWith(docs,
      stateTable(spark, stateDir, "lm_uni"),
      stateTable(spark, stateDir, "lm_big"))
  }

  /** Fold a batch's trigram counts into the persistent trigram-LM
    * model state (39th streaming twin — the incremental form of
    * [[graft.ops.TextAnalysis.taLmTrigram]]'s model): the trigram
    * table is one more additive sufficient statistic, so this DELEGATES
    * the unigram+bigram halves to [[mergeLmModelState]] (one combined
    * state serves BOTH the bigram scorer and the trigram-backoff
    * scorer — they are the same counts) and commits `lm_tri` under the
    * same batchId with its own alreadyFolded gate.
    */
  def mergeLmTrigramModelState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    mergeLmModelState(spark, stateDir, batch, batchId)
    if (!VersionedState.alreadyFolded(spark, stateDir, "lm_tri", batchId)) {
      val bc = graft.ops.TextAnalysis.lmTrigramsOf(batch)
        .groupBy($"a", $"b", $"c").agg(count(lit(1)).as("c_t"))
      val merged = VersionedState.readTable(spark, stateDir, "lm_tri") match {
        case None => bc
        case Some(prior) => prior.unionByName(bc)
          .groupBy($"a", $"b", $"c").agg(sum($"c_t").as("c_t"))
      }
      VersionedState.commit(spark, stateDir, "lm_tri", batchId) { dir =>
        merged.write.mode("overwrite").parquet(s"$dir/data")
      }
    }
  }

  /** Score a (doc_id, text) frame against the ACCUMULATED trigram
    * model — identical columns to the batch
    * [[graft.ops.TextAnalysis.taLmTrigram]], via the shared
    * [[graft.ops.TextAnalysis.lmTrigramScoreWith]] tail. Frozen-model
    * semantics compose with Katz backoff: a trigram the model never
    * saw backs off (it is the unreliable class, not an error); only a
    * transition whose BACKOFF estimator — the (b,c) bigram or the b
    * unigram — is out-of-model is unscorable-OOV and drops.
    */
  def lmTrigramScoreAgainstState(spark: SparkSession, stateDir: String,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.ops.TextAnalysis.lmTrigramScoreWith(docs,
      stateTable(spark, stateDir, "lm_uni"),
      stateTable(spark, stateDir, "lm_big"),
      Some(stateTable(spark, stateDir, "lm_tri")))
  }

  /** Fold a batch's 4-gram counts into the persistent KN-4-gram model
    * state (43rd streaming twin — the incremental form of
    * [[graft.ops.TextAnalysis.taLmKn4]]'s model): the 4-gram count
    * table is one more additive sufficient statistic, and EVERY
    * continuation-count table of the KN recursion derives from it at
    * read time (they are distinct-TYPE counts of the folded table, not
    * foldable themselves — folding per-batch type counts would double-
    * count types seen in two batches, so the recursion re-derives from
    * the lexicon-sized state, which is exactly as cheap as it is in
    * the one-shot). DELEGATES uni/bi/tri to
    * [[mergeLmTrigramModelState]]: ONE combined state now serves
    * THREE scorers (bigram, trigram-backoff, KN-4-gram).
    */
  def mergeLmKn4ModelState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    mergeLmTrigramModelState(spark, stateDir, batch, batchId)
    if (!VersionedState.alreadyFolded(spark, stateDir, "lm_quad", batchId)) {
      val bc = graft.ops.TextAnalysis.lmQuadgramsOf(batch)
        .groupBy($"a", $"b", $"c", $"d").agg(count(lit(1)).as("c4"))
      val merged = VersionedState.readTable(spark, stateDir, "lm_quad") match {
        case None => bc
        case Some(prior) => prior.unionByName(bc)
          .groupBy($"a", $"b", $"c", $"d").agg(sum($"c4").as("c4"))
      }
      VersionedState.commit(spark, stateDir, "lm_quad", batchId) { dir =>
        merged.write.mode("overwrite").parquet(s"$dir/data")
      }
    }
  }

  /** Score a (doc_id, text) frame against the ACCUMULATED 4-gram
    * model — identical columns to the batch
    * [[graft.ops.TextAnalysis.taLmKn4]], via the shared
    * [[graft.ops.TextAnalysis.lmKn4ScoredWith]] tail. Frozen-model
    * semantics compose with the continuation ladder: an unseen 4-gram
    * merely lacks level-0 evidence and backs off down the ladder; only
    * a transition whose d was NEVER seen as a continuation in the
    * model is unscorable-OOV and drops. V comes from the folded
    * unigram table (the same |vocab| the one-shot derives).
    */
  def lmKn4ScoreAgainstState(spark: SparkSession, stateDir: String,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    val (qocc, scored) = graft.ops.TextAnalysis.lmKn4ScoredWith(docs,
      Some(stateTable(spark, stateDir, "lm_quad")),
      Some(stateTable(spark, stateDir, "lm_uni")
        .agg(count(lit(1)).as("v"))))
    graft.ops.TextAnalysis.lmKn4PerDoc(qocc, scored)
  }

  /** Fold a batch's per-key md5-rank draw into persistent min-k state
    * (40th/41st streaming twins — the incremental form of the
    * [[graft.ops.Sampling.capPerSourceSummary]] /
    * [[graft.ops.Sampling.sampleLmBand]] cap stage): min-k is a
    * LOSSLESS mergeable summary (the k smallest of a union are the k
    * smallest of each side's k smallest), so folding per-batch min-k
    * buffers in ANY order equals the one-shot draw exactly — and the
    * state is the first O(cap × |keys|)-BOUNDED twin state by
    * construction: the fold never stores more than `cap`
    * (h, doc_id) rows per key no matter how many batches fold, so
    * fold cost is batch-mass + (cap × keys), never corpus mass.
    * Two tables per named draw, committed under the same batchId with
    * per-table alreadyFolded gates (the lm-model crash contract):
    * `min_k_draw_<name>(k, h, doc_id)` — the surviving buffers — and
    * `min_k_counts_<name>(k, n_docs)` — the additive per-key totals
    * the cap-summary reader reports alongside the draw.
    *
    * `keyed` is a (k: String, doc_id: Long) frame; the md5-rank draw
    * contract (h = md5(doc_id), ties doc_id asc) is owned HERE so no
    * caller can fold an inconsistent order. For the band sampler the
    * key must come from a FROZEN scorer (score new docs against twin
    * #37's accumulated LM state, then band) — a self-trained band
    * would re-band old docs as the model drifts, which is exactly the
    * semantics a frozen-model deployment avoids.
    */
  def mergeMinKDrawState(spark: SparkSession, stateDir: String,
      name: String, keyed: DataFrame, cap: Int,
      batchId: Long = -1L): Unit = {
    import spark.implicits._
    val drawT = s"min_k_draw_$name"
    val cntT = s"min_k_counts_$name"
    val batchRows = keyed
      .select(col("k").cast("string").as("k"),
        md5(col("doc_id").cast("string")).as("h"),
        col("doc_id").cast("long").as("doc_id"))
    if (!VersionedState.alreadyFolded(spark, stateDir, drawT, batchId)) {
      val pool = VersionedState.readTable(spark, stateDir, drawT) match {
        case None => batchRows
        case Some(prior) => prior.unionByName(batchRows)
      }
      // re-select min-k over prior-buffer ∪ batch: ≤ cap + batch rows
      // per key reach the aggregation, and ≤ cap survive it
      val merged = pool.as[(String, String, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(new graft.functions.MinKPairsAggregator(cap)
          .toColumn.name("top"))
        .toDF("k", "top")
        .select($"k", explode($"top").as("p"))
        .select($"k", $"p._1".as("h"), $"p._2".as("doc_id"))
      VersionedState.commit(spark, stateDir, drawT, batchId) { dir =>
        merged.write.mode("overwrite").parquet(s"$dir/data")
      }
    }
    if (!VersionedState.alreadyFolded(spark, stateDir, cntT, batchId)) {
      val bc = keyed.select(col("k").cast("string").as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n_docs"))
      val merged = VersionedState.readTable(spark, stateDir, cntT) match {
        case None => bc
        case Some(prior) => prior.unionByName(bc)
          .groupBy($"k").agg(sum($"n_docs").as("n_docs"))
      }
      VersionedState.commit(spark, stateDir, cntT, batchId) { dir =>
        merged.write.mode("overwrite").parquet(s"$dir/data")
      }
    }
  }

  /** Fold a batch of raw documents into the per-SOURCE cap draw —
    * [[mergeMinKDrawState]] with source as the key and the registered
    * cap (the [[graft.ops.Sampling.capPerSourceSummary]] contract).
    */
  def mergeCapPerSourceState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L,
      cap: Int = graft.ops.Sampling.CapPerSource): Unit =
    mergeMinKDrawState(spark, stateDir, "cap_per_source",
      batch.select(col("source").as("k"), col("doc_id")), cap, batchId)

  /** The per-source cap summary from folded state — identical columns
    * to the batch [[graft.ops.Sampling.capPerSourceSummary]]. All
    * inputs are state-bounded (≤ cap rows per source + one count row
    * per source), so the report is state-mass work, zero corpus scans.
    */
  def capPerSourceFromState(spark: SparkSession,
      stateDir: String): DataFrame = {
    import spark.implicits._
    val draw = stateTable(spark, stateDir, "min_k_draw_cap_per_source")
      .groupBy($"k")
      .agg(count(lit(1)).cast("long").as("n_kept"),
        sum($"doc_id").as("sum_kept_ids"))
    stateTable(spark, stateDir, "min_k_counts_cap_per_source")
      .join(draw, Seq("k"), "left")
      .select($"k".as("source"), $"n_docs",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"sum_kept_ids", lit(0L)).as("sum_kept_ids"))
      .orderBy("source")
  }

  /** Fold a batch of PRE-BANDED rows (bpb_band: Long, doc_id) into the
    * per-band draw — [[mergeMinKDrawState]] with the band as the key
    * (the [[graft.ops.Sampling.sampleLmBand]] contract). Banding
    * belongs to the CALLER because it must come from a frozen scorer
    * ([[lmScoreAgainstState]] + floor) for batches to be rebandable-
    * free; the parity spec folds the one-shot model's bands to pin
    * the machinery against the batch operator exactly.
    */
  def mergeLmBandState(spark: SparkSession, stateDir: String,
      banded: DataFrame, batchId: Long = -1L,
      cap: Int = graft.ops.Sampling.LmBandCap): Unit =
    mergeMinKDrawState(spark, stateDir, "lm_band",
      banded.select(col("bpb_band").cast("string").as("k"), col("doc_id")),
      cap, batchId)

  /** The band-stratified draw from folded state — identical columns
    * and ranks to the batch [[graft.ops.Sampling.sampleLmBand]].
    * Ranks come from per-key sorted collect_list over the ≤ cap
    * surviving buffer rows (state-bounded — no window over corpus
    * mass, nothing corpus-sized exists here at all).
    */
  def lmBandFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    stateTable(spark, stateDir, "min_k_draw_lm_band")
      .groupBy($"k")
      .agg(sort_array(collect_list(struct($"h", $"doc_id"))).as("top"))
      .select($"k".cast("long").as("bpb_band"), posexplode($"top"))
      .select($"col.doc_id".as("doc_id"), $"bpb_band",
        ($"pos" + 1).cast("long").as("rk"))
      .orderBy("bpb_band", "rk")
  }

  /** Fold a batch's per-day event counts into persistent state — the
    * additive sufficient statistic for the LIVE dyadic-EWMA volume
    * monitor (25th streaming twin): daily counts add across batches in
    * any order, so [[ewmaFromState]] equals the one-shot batch
    * [[graft.queries.QualityQueries.dqEwmaDyadic]] exactly
    * (spec-pinned). Rides the [[mergeKeyCountState]] machinery with
    * `day` as the key — state is one row per calendar day, bounded by
    * the time span, never the volume.
    */
  def mergeDailyVolumeState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit =
    mergeKeyCountState(spark, stateDir,
      batch.select(col("ts").cast("date").as("day")), "day", batchId)

  /** The accumulated-stream EWMA volume monitor — identical columns to
    * the batch [[graft.queries.QualityQueries.dqEwmaDyadic]].
    */
  def ewmaFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    graft.queries.QualityQueries.ewmaDyadicOf(
      stateTable(spark, stateDir, "key_counts_day")
        .select($"k".as("day"), $"cnt".as("n_events")))
  }

  /** Re-anchor the daily-volume EWMA epoch (the operational move the
    * [[graft.queries.QualityQueries.ewmaDyadicOf]] exponent guard
    * directs: W_t = Σ x·2^{t−2} budgets ~63 bits of exponent, so a
    * stream whose day count approaches 65 − bitlen(max daily volume)
    * rotates BEFORE the guard trips — t re-anchors at the next fold
    * and the full budget re-opens). Implemented as a VersionedState
    * commit of an EMPTY day-count payload: the fold WATERMARK carries
    * over, so a pre-rotation batch redelivered after the rotation is
    * still a no-op — rotation never re-opens the replay window. After
    * rotating, [[ewmaFromState]] equals the one-shot monitor over the
    * POST-rotation days only (the re-anchored epoch), by design.
    */
  def rotateDailyVolumeEpoch(spark: SparkSession, stateDir: String): Unit = {
    import spark.implicits._
    VersionedState.commit(spark, stateDir, "key_counts_day", -1L) { dir =>
      Seq.empty[(java.sql.Date, Long)].toDF("k", "cnt")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Fold a batch's documents into the persistent ExactSubstr state —
    * the incremental form of the Lee et al. 2022 §4.1 duplicated-span
    * audit (VERDICT r10 next-step #8): the sufficient statistic is the
    * gram INVERTED INDEX (doc_id, p, h) plus the per-doc length table,
    * both APPEND-ONLY (a doc's grams never change once ingested), so
    * the fold is strictly ∝ batch — the batch's one gram projection +
    * two appends; the accumulated index is never read, rewritten, or
    * re-grammed at fold time. [[substrSpansFromState]] then equals the
    * one-shot [[graft.ops.Curation.dedupSubstrSpans]] over everything
    * that ever arrived (spec-pinned), INCLUDING retroactive spans: a
    * doc folded in batch 1 gains its duplicated spans the moment batch
    * 7 delivers the second occurrence, because occurrence counting
    * happens at report time over the whole index.
    *
    * Replay/crash contract: clean redeliveries are watermark-gated
    * no-ops ([[VersionedState]] — the meta fold is also this state's
    * commit point, carrying a 1-row audit payload); a crash BETWEEN
    * the appends and the meta commit re-appends on replay, and the
    * duplicate rows are healed AT READ by `dropDuplicates` on the
    * natural primary keys ((doc_id, p) for grams, doc_id for lengths)
    * — the knnNeighbors enforce-at-read pattern, which costs one
    * exchange the report's own window needs anyway. This is STRONGER
    * than the corpus_sets anti-join idempotence: it tolerates even a
    * torn job commit that left a fraction of the batch's files
    * visible, and the fold never pays an index read for it.
    *
    * 100 TB shape: fold ∝ batch (gram projection + append); the index
    * is corpus-gram-sized — the same class as the corpus_docs/sets
    * tables, i.e. the STATE IS THE INDEX, not a summary; the report is
    * one h-partitioned window + per-doc merge over the index, never a
    * text re-scan or re-hash.
    */
  def mergeSubstrSpanState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    val name = "substr_spans"
    if (VersionedState.alreadyFolded(spark, stateDir, name, batchId)) return
    val docs = batch.select($"doc_id", $"text")
    // the gram projection materializes exactly ONCE — into the index
    // append; the audit's gram count is a pure function of n_chars
    // (grams per doc = max(n_chars − L + 1, 0)), so it rides the cheap
    // checkpointed lens table instead of a second gram pass (r11
    // review finding #6)
    val lens = docs.select($"doc_id",
      length($"text").cast("long").as("n_chars")).gatedCheckpoint()
    graft.ops.Curation.substrGramsOf(docs)
      .write.mode("append").parquet(s"$stateDir/substr_gram_index")
    lens.write.mode("append").parquet(s"$stateDir/substr_doc_lens")
    VersionedState.commit(spark, stateDir, name, batchId) { dir =>
      // audit payload: what this fold contributed (the appends above
      // become durable exactly when this meta row commits)
      lens.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(greatest(
            $"n_chars" - (graft.ops.Curation.SubstrSpanL - 1), lit(0L))),
            lit(0L)).as("n_grams"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated-stream duplicated-span report — identical columns
    * to the batch [[graft.ops.Curation.dedupSubstrSpans]], served from
    * the gram index (no text re-scan). `dropDuplicates` heals any
    * crashed double-append (see [[mergeSubstrSpanState]]).
    */
  def substrSpansFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Curation.substrSpansFromGrams(
      spark.read.parquet(s"$stateDir/substr_doc_lens")
        .dropDuplicates("doc_id"),
      spark.read.parquet(s"$stateDir/substr_gram_index")
        .dropDuplicates("doc_id", "p"))
  }

  /** Benchmark refresh with snapshot ROTATION — the streaming
    * cross-snapshot audit's write half (VERDICT r11 ask #8): the
    * currently-served snapshot is re-committed under
    * `eval_shingles_prev` BEFORE the new one commits under
    * `eval_shingles`, so after every refresh the state serves both the
    * outgoing (V1) and incoming (V2) benchmark. Both commits ride the
    * crash-safe [[graft.streaming.VersionedState]] protocol: a crash
    * between them leaves prev == current (a zero-delta audit — stale
    * but consistent), and a refresh RETRY re-copies the still-old
    * current before committing the new one, converging to the intended
    * pair. The accept gate ([[processBatch]] step 4b) keeps reading
    * only the latest snapshot — rotation never changes what blocks
    * ingestion, only what the audit compares.
    */
  def refreshEvalShingles(spark: SparkSession, stateDir: String,
      evalDocs: DataFrame, n: Int = graft.ops.Dedup.ShingleN): Unit =
    rotationLock.synchronized {
    graft.ops.Decontamination.latestEvalShingles(spark, stateDir)
      .foreach { cur =>
        // materialize before the commit: the new eval_shingles commit
        // below deletes the version dir this plan reads
        val snap = cur.localCheckpoint(true)
        VersionedState.commit(spark, stateDir, "eval_shingles_prev", -1L) {
          dir => snap.write.mode("overwrite").parquet(s"$dir/data")
        }
      }
    // a rotation starts a NEW audit EPOCH: hit rows folded under the
    // outgoing pair must not mix with the incoming pair's, and the
    // fold watermark must reset with the data it summarizes (the
    // gram-index retention rule) — else post-refresh redeliveries of
    // pre-refresh batchIds would skip instead of auditing under the
    // new pair. A crash inside this window heals by re-running the
    // refresh (every step is idempotent and re-converges).
    graft.streaming.StateFs.deleteRecursively(s"$stateDir/cross_snapshot_hits")
    // the tier-evidence state audits against the SERVED snapshot, so a
    // refresh resets its epoch too (same watermark-with-data rule)
    graft.streaming.StateFs.deleteRecursively(s"$stateDir/tier_evidence")
    graft.streaming.StateFs.list(stateDir).foreach { p =>
      val n = p.getName
      if (n.startsWith("cross_snapshot_v") || n.startsWith("tier_evidence_v"))
        graft.streaming.StateFs.deleteRecursively(p.toString)
    }
    graft.ops.Decontamination
      .writeEvalShinglesVersioned(spark, stateDir, evalDocs, n)
  }

  /** Serializes snapshot ROTATION against the epoch-scoped batch folds
    * (r12 ADVICE #2): the epoch reset inside [[refreshEvalShingles]]
    * (delete hit state + fold watermark, then commit the new snapshot)
    * is multiple non-atomic steps, and a [[mergeCrossSnapshotState]] /
    * [[mergeTierEvidenceState]] fold INTERLEAVED with them could append
    * hits computed under the outgoing snapshot pair yet watermark-commit
    * its batchId under the new epoch — a redelivery would then skip
    * instead of re-auditing. The crash-heal argument in the rotation
    * scaladoc covers sequential retry only, so concurrent execution must
    * be excluded, not healed. This lock closes the single-driver case —
    * the only deployment shape here, since both folds run inside
    * foreachBatch on the driver and rotation is a driver-side admin
    * action. A multi-driver deployment (two Spark apps sharing one
    * stateDir) must serialize rotation against folds externally; that
    * topology is out of scope for every state protocol in this file
    * (VersionedState assumes a single committer likewise).
    */
  private[graft] val rotationLock = new Object

  /** Incremental benchmark-refresh audit — the streaming twin of the
    * batch [[graft.ops.Decontamination.deconCrossSnapshot]]: each
    * accepted batch is probed ONCE against the broadcast tagged union
    * of the rotated snapshot pair ([[refreshEvalShingles]]) and its
    * per-train-doc hit row appended; doc_ids are unique across
    * batches, so appends ARE the merge (the ExactSubstr pattern), a
    * crashed double-append heals at read via the train_id natural key,
    * and a replayed batchId is a watermark-gated no-op. Fold cost ∝
    * batch (the eval side is bounded and broadcast; the corpus is
    * never re-scanned). Before the first rotation produces a snapshot
    * PAIR the fold is a documented no-op — a deployment backfills
    * pre-rotation batches with the batch query.
    */
  def mergeCrossSnapshotState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit =
    rotationLock.synchronized {
    import spark.implicits._
    val name = "cross_snapshot"
    if (VersionedState.alreadyFolded(spark, stateDir, name, batchId)) return
    val prev = VersionedState.readTable(spark, stateDir, "eval_shingles_prev")
    val cur = graft.ops.Decontamination.latestEvalShingles(spark, stateDir)
    (prev, cur) match {
      case (Some(v1), Some(v2)) =>
        val tagged = v1.select($"eval_id", $"sh", lit(1).as("snap"))
          .unionByName(v2.select($"eval_id", $"sh", lit(2).as("snap")))
        // the audit universe excludes benchmark members themselves —
        // the batch query's "docs in NEITHER snapshot" filter
        val train = batch.select($"doc_id", $"text")
          .join(broadcast(tagged.select($"eval_id".as("doc_id")).distinct()),
            Seq("doc_id"), "left_anti")
        val hits = graft.ops.Decontamination
          .crossSnapshotHitsOf(train, tagged)
          .gatedCheckpoint()
        hits.write.mode("append").parquet(s"$stateDir/cross_snapshot_hits")
        VersionedState.commit(spark, stateDir, name, batchId) { dir =>
          hits.agg(count(lit(1)).as("n_hit_docs"))
            .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
        }
      case _ => ()
    }
  }

  /** Fold a batch's contamination evidence against the served
    * eval-shingle snapshot into persistent state (31st streaming
    * twin) — the per-(train, eval) `n_shared` counts are complete
    * within a doc's batch (whole documents arrive in one row), so
    * appends ARE the merge, exactly the cross-snapshot/ExactSubstr
    * contract: crashed double-appends heal at read on the
    * (train_id, eval_id) natural key, replays are watermark-gated
    * no-ops, and fold cost ∝ batch (the eval side is bounded and
    * broadcast). Benchmark members are excluded from the audited
    * universe via the same broadcast anti-join as the cross-snapshot
    * twin (a shingle-less eval doc is absent from the shingle table
    * but produces no pairs either way). No snapshot yet → documented
    * no-op; the batch query backfills.
    */
  def mergeTierEvidenceState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit =
    rotationLock.synchronized {
    import spark.implicits._
    val name = "tier_evidence"
    if (VersionedState.alreadyFolded(spark, stateDir, name, batchId)) return
    graft.ops.Decontamination.latestEvalShingles(spark, stateDir) match {
      case None => ()
      case Some(evalSh) =>
        val train = batch.select($"doc_id", $"text")
          .join(broadcast(evalSh.select($"eval_id".as("doc_id")).distinct()),
            Seq("doc_id"), "left_anti")
        val pairs = graft.ops.Decontamination
          .contaminationAgainst(train, evalSh, minShared = 1L)
          .gatedCheckpoint()
        pairs.write.mode("append").parquet(s"$stateDir/tier_evidence")
        VersionedState.commit(spark, stateDir, name, batchId) { dir =>
          pairs.agg(count(lit(1)).as("n_pairs"))
            .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
        }
    }
  }

  /** Fold a batch's combined-width (3-gram + 13-gram) contamination
    * evidence against a provided benchmark set into persistent state
    * (32nd streaming twin — the incremental form of
    * [[graft.ops.Decontamination.deconSmearReport]]): per-(train, eval)
    * width counts are complete within a doc's batch (whole documents
    * arrive in one row), so appends ARE the merge — the
    * tier-evidence/ExactSubstr contract: crashed double-appends heal at
    * read on the (train_id, eval_id) natural key, replays are
    * watermark-gated no-ops, and fold cost ∝ batch + |eval| (the eval
    * side shingles per fold but benchmarks are bounded; both widths
    * leave ONE tokenize of the batch). Benchmark members are excluded
    * from the audited universe via the same broadcast anti-join as the
    * sibling twins. The eval set is caller-provided (the production
    * shape — an external benchmark table), so this state carries no
    * rotation epoch; a deployment auditing the SERVED snapshot uses the
    * tier-evidence twin instead.
    *
    * CONTRACT (r13 ADVICE #4): `evalDocs` must be DETERMINISTIC per
    * `batchId` — snapshot/materialize the benchmark table before
    * folding (mirroring the eval_shingles versioning the
    * rotation-scoped twins use). The crash-heal path relies on it: a
    * torn append heals at read via [[healTornAppend]] (max per
    * (train_id, eval_id)), which equals either row exactly when the
    * retry recomputes IDENTICAL (n_shared_3, n_shared_13) counts; a
    * live eval table that changed between the torn append and the
    * retry leaves two conflicting rows for one key, and the heal then
    * serves the deterministic conservative (max) reading rather than
    * an arbitrary winner.
    */
  def mergeSmearEvidenceState(spark: SparkSession, stateDir: String,
      batch: DataFrame, evalDocs: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    val name = "smear_evidence"
    if (VersionedState.alreadyFolded(spark, stateDir, name, batchId)) return
    val train = batch.select($"doc_id", $"text")
      .join(broadcast(evalDocs.select($"doc_id").distinct()),
        Seq("doc_id"), "left_anti")
    val pairs = graft.ops.Decontamination.smearPairsOf(train, evalDocs)
      .gatedCheckpoint()
    pairs.write.mode("append").parquet(s"$stateDir/smear_evidence")
    VersionedState.commit(spark, stateDir, name, batchId) { dir =>
      pairs.agg(count(lit(1)).as("n_pairs"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Fold a batch's character-level winnow-fingerprint contamination
    * evidence against a provided benchmark set into persistent state
    * (35th streaming twin — the incremental form of
    * [[graft.ops.Decontamination.deconWinnow]]): per-(train, eval)
    * distinct-shared-fingerprint counts are complete within a doc's
    * batch (whole documents arrive in one row and the compiled kernel
    * emits per-doc deduplicated fingerprints), so appends ARE the
    * merge — the smear-evidence contract exactly: crashed
    * double-appends heal at read on the (train_id, eval_id) natural
    * key, replays are watermark-gated no-ops, and fold cost ∝ batch +
    * |eval| (the bounded eval side re-fingerprints per fold, df cap
    * included — the cap is a property of the benchmark snapshot, so it
    * rides [[graft.ops.Decontamination.cappedEvalWinnowFps]] unchanged
    * between batch and twin). Benchmark members are excluded from the
    * audited universe via the same broadcast anti-join as the sibling
    * twins.
    *
    * CONTRACT (shared with [[mergeSmearEvidenceState]], r13 ADVICE
    * #4): `evalDocs` must be DETERMINISTIC per `batchId` —
    * snapshot/materialize the benchmark table before folding; the torn
    * -append heal is only sound when a retry recomputes identical
    * counts.
    */
  def mergeWinnowEvidenceState(spark: SparkSession, stateDir: String,
      batch: DataFrame, evalDocs: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    val name = "winnow_evidence"
    if (VersionedState.alreadyFolded(spark, stateDir, name, batchId)) return
    val train = batch.select($"doc_id", $"text")
      .join(broadcast(evalDocs.select($"doc_id").distinct()),
        Seq("doc_id"), "left_anti")
    val pairs = graft.ops.Decontamination
      .winnowProbeOf(train,
        graft.ops.Decontamination.cappedEvalWinnowFps(evalDocs))
      .gatedCheckpoint()
    pairs.write.mode("append").parquet(s"$stateDir/winnow_evidence")
    VersionedState.commit(spark, stateDir, name, batchId) { dir =>
      pairs.agg(count(lit(1)).as("n_pairs"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Deterministic torn-append heal (ADVICE r14 #3): a crashed
    * double-append leaves two rows for one natural key; under the
    * deterministic-evalDocs contract both rows carry IDENTICAL counts,
    * so `max` per key equals either. If the contract is ever violated
    * (a retry recomputed against a changed eval table), `max` still
    * serves ONE deterministic value — the more-contaminated reading,
    * the conservative side for a leakage gate — where
    * `dropDuplicates` would pick whichever row a shuffle surfaced
    * first and the served report would wobble run-to-run.
    */
  private def healTornAppend(df: DataFrame, keyCols: Seq[String],
      countCols: Seq[String]): DataFrame = {
    val aggs = countCols.map(c => max(col(c)).as(c))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The accumulated-stream winnow contamination report — identical
    * columns to the batch
    * [[graft.ops.Decontamination.deconWinnow]], served from the folded
    * evidence (no corpus re-scan; the gate tail is the shared
    * [[graft.ops.Decontamination.winnowGate]] trunk).
    * [[healTornAppend]] heals any crashed double-append.
    */
  def winnowReportFromState(spark: SparkSession, stateDir: String): DataFrame = {
    val path = s"$stateDir/winnow_evidence"
    val pairs =
      if (graft.streaming.StateFs.exists(path)) spark.read.parquet(path)
      else {
        import spark.implicits._
        Seq.empty[(Long, Long, Long)]
          .toDF("train_id", "eval_id", "n_shared")
      }
    graft.ops.Decontamination.winnowGate(
      healTornAppend(pairs, Seq("train_id", "eval_id"), Seq("n_shared")))
  }

  /** The accumulated-stream combined-width leakage report — identical
    * columns to the batch
    * [[graft.ops.Decontamination.deconSmearReport]], served from the
    * folded evidence (no corpus re-scan; the gate/class tail is the
    * shared [[graft.ops.Decontamination.smearClassOf]] trunk).
    * [[healTornAppend]] heals any crashed double-append (over every
    * `n_shared*` width the folded schema carries, so a state written
    * before a width was added heals the widths it has).
    */
  def smearReportFromState(spark: SparkSession, stateDir: String): DataFrame = {
    val path = s"$stateDir/smear_evidence"
    val raw =
      if (graft.streaming.StateFs.exists(path))
        // mergeSchema: a state can hold appends from BOTH sides of the
        // r15 char-width widening; merge so no file's width is dropped
        spark.read.option("mergeSchema", "true").parquet(path)
      else {
        import spark.implicits._
        Seq.empty[(Long, Long, Long, Long, Long)]
          .toDF("train_id", "eval_id", "n_shared_3", "n_shared_13",
            "n_shared_w")
      }
    // schema evolution: evidence folded before the r15 char-width
    // widening has no n_shared_w column (all-old state) or reads it
    // as null (mixed state) — those batches were never probed at the
    // char level, so their char evidence is zero (the pair can still
    // gate/class through its word widths; re-fold the corpus to gain
    // char evidence retroactively)
    val pairs =
      if (!raw.columns.contains("n_shared_w"))
        raw.withColumn("n_shared_w", lit(0L))
      else raw.withColumn("n_shared_w", coalesce(col("n_shared_w"), lit(0L)))
    graft.ops.Decontamination.smearClassOf(
      healTornAppend(pairs, Seq("train_id", "eval_id"),
        pairs.columns.filter(_.startsWith("n_shared")).toSeq))
  }

  /** The accumulated-stream evidence-threshold tuning curve —
    * identical columns to the batch
    * [[graft.ops.Decontamination.deconTierCurve]], served from the
    * folded evidence (no corpus re-scan; the rollup input is the
    * bounded contaminated-pair table, not the stream).
    */
  def tierCurveFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val path = s"$stateDir/tier_evidence"
    val pairs =
      if (graft.streaming.StateFs.exists(path)) spark.read.parquet(path)
      else Seq.empty[(Long, Long, Long)].toDF("train_id", "eval_id", "n_shared")
    graft.ops.Decontamination.tierCurveOfPairs(
      healTornAppend(pairs, Seq("train_id", "eval_id"), Seq("n_shared")))
  }

  /** The accumulated-stream refresh audit — identical columns to the
    * batch [[graft.ops.Decontamination.deconCrossSnapshot]], served
    * from the folded hit state (no corpus re-scan). [[healTornAppend]]
    * on the natural key heals any crashed double-append; an epoch with
    * no folds yet (fresh rotation, or no contaminated docs) reads as
    * the empty report rather than a missing-path error.
    */
  def crossSnapshotFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val path = s"$stateDir/cross_snapshot_hits"
    val hits =
      if (graft.streaming.StateFs.exists(path)) spark.read.parquet(path)
      else Seq.empty[(Long, Long, Long)].toDF("train_id", "n_eval_v1", "n_eval_v2")
    graft.ops.Decontamination
      .crossSnapshotStatus(healTornAppend(hits, Seq("train_id"),
        Seq("n_eval_v1", "n_eval_v2")))
      .orderBy("train_id")
  }

  /** The accumulated-stream skew audit — the batch
    * [[graft.queries.QualityQueries.keySkew]] statistics over state.
    */
  def skewFromState(spark: SparkSession, stateDir: String,
      keyCol: String): DataFrame =
    graft.queries.QualityQueries.keySkewFromCounts(
      stateTable(spark, stateDir, s"key_counts_$keyCol"),
      s"stream.$keyCol")

  /** Fold a batch's docs into the persistent batching-waste state:
    * per power-of-2 length bucket, the additive (docs, windows,
    * tokens, padded) counters of [[graft.ops.Packing.packBucketWasteOf]].
    * Every counter is a plain sum over disjoint batches, so the folded
    * state EXACTLY equals the one-shot report over everything that
    * ever arrived (spec-pinned); state is ≤ 9 rows.
    */
  def mergeBucketWasteState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "bucket_waste", batchId)) return
    val bs = graft.ops.Packing.packBucketWasteOf(batch)
      .select($"bucket", $"n_docs", $"n_windows", $"n_tokens", $"n_padded")
    val merged = VersionedState.readTable(spark, stateDir, "bucket_waste") match {
      case None => bs
      case Some(prior) => prior.unionByName(bs)
        .groupBy($"bucket").agg(
          sum($"n_docs").as("n_docs"),
          sum($"n_windows").as("n_windows"),
          sum($"n_tokens").as("n_tokens"),
          sum($"n_padded").as("n_padded"))
    }
    VersionedState.commit(spark, stateDir, "bucket_waste", batchId) { dir =>
      merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated batching-waste report — identical columns to the
    * batch [[graft.ops.Packing.packBucketWasteOf]].
    */
  def bucketWasteFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    stateTable(spark, stateDir, "bucket_waste")
      .select($"bucket", $"n_docs", $"n_windows", $"n_tokens", $"n_padded",
        ($"n_padded" - $"n_tokens").as("waste"),
        (($"n_padded" - $"n_tokens").cast("double") /
          $"n_padded".cast("double")).as("waste_frac"))
      .orderBy($"bucket")
  }

  /** Fold a batch of embedding vectors into the persistent norm-band
    * state — additive per-band counts of
    * [[graft.ops.Similarity.simNormHist]] semantics, so an
    * unnormalized or zero-vector batch shows up in the accumulated
    * histogram the moment it arrives. Folded == one-shot by
    * arithmetic (spec-pinned); state is a handful of band rows.
    * Callers pass the batch's (embedding: array<float|double>) frame.
    */
  def mergeNormHistState(spark: SparkSession, stateDir: String,
      vecs: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "norm_hist", batchId)) return
    val bs = vecs.select(
        floor(graft.ops.Similarity.norm(
          col("embedding").cast("array<double>")) * 10)
          .cast("long").as("norm_band"))
      .groupBy($"norm_band").agg(count(lit(1)).as("n_vecs"))
    val merged = VersionedState.readTable(spark, stateDir, "norm_hist") match {
      case None => bs
      case Some(prior) => prior.unionByName(bs)
        .groupBy($"norm_band").agg(sum($"n_vecs").as("n_vecs"))
    }
    VersionedState.commit(spark, stateDir, "norm_hist", batchId) { dir =>
      merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated norm histogram — identical columns to the batch
    * [[graft.ops.Similarity.simNormHist]].
    */
  def normHistFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    stateTable(spark, stateDir, "norm_hist").orderBy($"norm_band")
  }

  /** The PURE readStream → writeStream form of the curation monitor —
    * the declarative sibling of [[processBatch]]'s foreachBatch form
    * (NOTES r8 forward note): the quality signals (token count,
    * language id, a Gopher-style keep gate) run as codegen'd column
    * expressions INSIDE the stream, a watermarked tumbling window
    * aggregates per (window, source), and the sink is an ordinary
    * streaming sink — no foreachBatch, no manual state files; the
    * streaming state store holds only open windows (watermark-evicted
    * under append mode). Returned as a plain DataFrame => DataFrame so
    * the spec pins stream == batch on the same fixture — the
    * [[graft.streaming.WindowTransforms]] parity contract.
    *
    * Input contract: (event_ts: timestamp, source, text). At 100 TB/s
    * scale the aggregation state is (active windows × sources) rows —
    * independent of stream length.
    */
  def declarativeCurationTransform(
      windowLen: String = "1 minute"): DataFrame => DataFrame = df =>
    df.withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("keep", col("n_tokens") >= 20L && col("lang_pred") =!= "und")
      .groupBy(window(col("event_ts"), windowLen), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))

  /** Fold a batch's (source, token-length) histogram into persistent
    * state — the LIVE per-source length profile: the (length, count)
    * collapse is additive, so percentiles probed from the accumulated
    * state equal the one-shot
    * [[graft.ops.CorpusFilters.taLenProfile]] exactly (spec-pinned).
    * State is |sources| × |distinct lengths| rows — bounded by the
    * value DOMAIN, not the stream volume.
    */
  def mergeLenProfileState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "len_profile", batchId)) return
    val b = batch
      .select($"source", graft.ops.TextAnalysis.tokenCount($"text").as("len"))
      .groupBy($"source", $"len").agg(count(lit(1)).as("c"))
    val merged = VersionedState.readTable(spark, stateDir, "len_profile") match {
      case None => b
      case Some(prior) => prior.unionByName(b)
        .groupBy($"source", $"len").agg(sum($"c").as("c"))
    }
    VersionedState.commit(spark, stateDir, "len_profile", batchId) { dir =>
      merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated-stream length profile — identical columns to the
    * batch [[graft.ops.CorpusFilters.taLenProfile]].
    */
  def lenProfileFromState(spark: SparkSession, stateDir: String): DataFrame =
    graft.ops.CorpusFilters.lenProfileOfCounts(
      stateTable(spark, stateDir, "len_profile"))

  /** The accumulated-stream max-sequence-length sweep (33rd streaming
    * twin) — identical columns to the batch
    * [[graft.ops.Packing.packBudgetCurve]], served from the SAME
    * `len_profile` value-domain histogram the length-profile twin
    * folds: state REUSE (the token_counts → simpson/divergence/bpe
    * pattern), so this twin adds NO new fold and never re-scans the
    * corpus. The curve's sums are linear in the histogram counts
    * ([[graft.ops.Packing.packBudgetCurveOfCounts]]), so per-source
    * rows add freely and folded == one-shot exactly.
    */
  def budgetCurveFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Packing.packBudgetCurveOfCounts(
      stateTable(spark, stateDir, "len_profile").select($"len", $"c"))
  }

  /** Fold a batch into the corpus-manifest state — the LIVE
    * reproducibility manifest: counts and sums add, and the 60-bit
    * content signature is a bit_xor (commutative, associative,
    * self-inverse), so folding batches in ANY arrival order equals the
    * one-shot [[graft.queries.QualityQueries.dqManifest]] exactly
    * (spec-pinned) — and a re-delivered batch can even be RETRACTED by
    * xor-folding it again with negated counts. State is |sources| rows.
    */
  def mergeManifestState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    // xor is SELF-INVERSE: a double-folded batch would silently CANCEL
    // its own signature — the watermark gate is load-bearing here
    if (VersionedState.alreadyFolded(spark, stateDir, "manifest", batchId)) return
    val b = batch.select($"source",
        graft.ops.TextAnalysis.tokenCount($"text").as("nt"),
        $"n_chars",
        conv(substring(md5($"text"), 1, 15), 16, 10).cast("long").as("sig"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"nt").as("n_tokens"),
        sum($"n_chars").as("n_chars"), expr("bit_xor(sig)").as("content_sig"))
    val merged = VersionedState.readTable(spark, stateDir, "manifest") match {
      case None => b
      case Some(prior) => prior.unionByName(b)
        .groupBy($"source")
        .agg(sum($"n_docs").as("n_docs"), sum($"n_tokens").as("n_tokens"),
          sum($"n_chars").as("n_chars"),
          expr("bit_xor(content_sig)").as("content_sig"))
    }
    VersionedState.commit(spark, stateDir, "manifest", batchId) { dir =>
      merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated manifest — identical columns to the batch
    * [[graft.queries.QualityQueries.dqManifest]].
    */
  def manifestFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    stateTable(spark, stateDir, "manifest")
      .select($"source", $"n_docs", $"n_tokens", $"n_chars", $"content_sig")
      .orderBy($"source")
  }

  /** Fold a batch's Gopher-rule ablation counters into persistent
    * state — the LIVE ablation table: per-doc rule flags are
    * independent of every other doc, so the 7-row (rule_id, rule,
    * n_fail, n_unique_fail, words_unique_fail) table of
    * [[graft.ops.TextAnalysis.filterAblationOf]] is ADDITIVE across
    * batches and folded == one-shot exactly (spec-pinned). State is
    * 7 rows.
    */
  def mergeFilterAblationState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "filter_ablation", batchId)) return
    val b = graft.ops.TextAnalysis.filterAblationOf(batch)
    val merged = VersionedState.readTable(spark, stateDir, "filter_ablation") match {
      case None => b
      case Some(prior) => prior.unionByName(b)
        .groupBy($"rule_id", $"rule")
        .agg(sum($"n_fail").as("n_fail"),
          sum($"n_unique_fail").as("n_unique_fail"),
          sum($"words_unique_fail").as("words_unique_fail"))
    }
    VersionedState.commit(spark, stateDir, "filter_ablation", batchId) { dir =>
      merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated ablation table — identical columns to the batch
    * [[graft.ops.TextAnalysis.taFilterAblation]].
    */
  def filterAblationFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    stateTable(spark, stateDir, "filter_ablation")
      .select($"rule_id", $"rule", $"n_fail", $"n_unique_fail",
        $"words_unique_fail")
      .orderBy($"rule_id")
  }

  /** Fold a batch into the vocabulary-growth state — the LIVE Heaps
    * curve: state is (w, first_gpos) minima over the stream's global
    * token positions plus the running token total, so
    * [[heapsCurveFromState]] reports vocabulary-vs-token-mass deciles
    * over everything that ever arrived without a rescan. Positions are
    * assigned arrival-order-globally (previous total + batch-local
    * doc_id-ordered prefix), so feeding doc_id-ordered batches folds
    * to EXACTLY the one-shot [[graft.ops.CorpusFilters.heapsCurveOf]]
    * (spec-pinned); min-merge makes re-seen tokens free.
    */
  def mergeVocabGrowthState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    // The min-merged first positions are idempotent, but the running
    // token total ADDS — the watermark gate keeps a replayed batch
    // from shifting every later batch's global positions
    if (VersionedState.alreadyFolded(spark, stateDir, "vocab_first", batchId)) return
    // State is ONE parquet table: token rows (w, first_gpos) plus a
    // reserved row w = "" whose f carries the running token total —
    // "" can never be a token (whitespace split + length>0 filter), so
    // a single versioned commit carries positions AND total together.
    // The former two-file layout (parquet + vocab_total.txt) could
    // crash between the writes and leave positions computed against a
    // stale total, corrupting every later batch's global positions
    // (ADVICE r8 #3); the versioned commit also survives a crash
    // MID-write, which the overwrite-in-place form did not
    // (ADVICE r9 #4).
    val priorState = VersionedState.readTable(spark, stateDir, "vocab_first")
    val prevTotal = priorState match {
      case None => 0L
      case Some(st) => st.filter($"w" === "")
        .agg(coalesce(max($"f"), lit(0L))).as[Long].head()
    }
    val tk = batch.select($"doc_id", posexplode(filter(
        split(trim(lower($"text")), "\\s+"), x => length(x) > 0))
      .as(Seq("pos", "w")))
    val cnts = tk.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .gatedCheckpoint()
    val wDoc = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = cnts.select($"doc_id",
      coalesce(sum($"n").over(wDoc), lit(0L)).as("off"))
    val firstB = tk.join(offs, "doc_id")
      .select($"w", (lit(prevTotal) + $"off" + $"pos" + 1L).as("f"))
      .groupBy($"w").agg(min($"f").as("f"))
    val batchTokens = cnts.agg(coalesce(sum($"n"), lit(0L))).as[Long].head()
    val tokens = priorState match {
      case None => firstB
      case Some(st) => st.filter($"w" =!= "").unionByName(firstB)
        .groupBy($"w").agg(min($"f").as("f"))
    }
    val merged = tokens.unionByName(
      Seq(("", prevTotal + batchTokens)).toDF("w", "f"))
    VersionedState.commit(spark, stateDir, "vocab_first", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The accumulated-stream Heaps curve — identical columns to the
    * batch [[graft.ops.CorpusFilters.heapsCurveOf]]. The running total
    * comes from the state's reserved w = "" row; decile boundaries are
    * exact integer ceil-div on the driver (the [[heapsCurveOf]]
    * doctrine — no IEEE division in the token-mass arithmetic).
    */
  def heapsCurveFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val state = stateTable(spark, stateDir, "vocab_first")
    val total = state.filter($"w" === "")
      .agg(coalesce(max($"f"), lit(0L))).as[Long].head()
    val firstOcc = state.filter($"w" =!= "")
    val dec = (1L to 10L).map(d => (d, (total * d + 9L) / 10L))
      .toDF("decile", "tokens_seen")
    dec.join(firstOcc, $"f" <= $"tokens_seen")
      .groupBy($"decile", $"tokens_seen")
      .agg(count(lit(1)).as("vocab"))
      .select($"decile", $"tokens_seen", $"vocab",
        ($"vocab".cast("double") / $"tokens_seen".cast("double")).as("ttr"))
      .orderBy($"decile")
  }

  /** Fold a batch's (source, token) counts into persistent state —
    * the additive sufficient statistic for BOTH the Simpson diversity
    * profile and the source-vs-corpus TVD ([[simpsonFromState]] /
    * [[divergenceFromState]] equal their one-shot batch ops exactly,
    * spec-pinned). State is vocabulary×sources rows — the
    * key-cardinality-bounded regime of [[mergeKeyCountState]]; a
    * deployment that can't hold its vocabulary swaps in the CMS
    * register state at the cost of exactness.
    */
  def mergeTokenCountState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "token_counts", batchId)) return
    val src = if (batch.columns.contains("source")) batch
      else batch.withColumn("source", lit("stream"))
    val bc = src
      .select($"source", explode(filter(
        split(trim(lower($"text")), "\\s+"), x => length(x) > 0)).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
    val merged = VersionedState.readTable(spark, stateDir, "token_counts") match {
      case None => bc
      case Some(prior) => prior.unionByName(bc)
        .groupBy($"source", $"w").agg(sum($"c").as("c"))
    }
    VersionedState.commit(spark, stateDir, "token_counts", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Simpson diversity over the accumulated stream — identical columns
    * to [[graft.ops.CorpusFilters.simpsonDiversityOf]].
    */
  def simpsonFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    stateTable(spark, stateDir, "token_counts")
      .groupBy($"source")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum($"c" * $"c").as("sumsq"))
      .select($"source", $"n_tokens", $"vocab", $"sumsq",
        ($"sumsq".cast("double") /
          ($"n_tokens".cast("double") * $"n_tokens".cast("double")))
          .as("simpson"),
        (($"n_tokens".cast("double") * $"n_tokens".cast("double")) /
          $"sumsq".cast("double")).as("effective_vocab"))
      .orderBy("source")
  }

  /** Source-vs-corpus TVD over the accumulated stream — identical
    * columns to [[graft.ops.CorpusFilters.sourceDivergenceOf]],
    * via the same OOV-mass identity over the state counts.
    */
  def divergenceFromState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val st = stateTable(spark, stateDir, "token_counts")
      .gatedCheckpoint()
    val dt = st.groupBy($"w").agg(sum($"c").as("d"))
    val totals = st.groupBy($"source").agg(sum($"c").as("ctot"))
    val dTot = dt.agg(coalesce(sum($"d"), lit(0L)).as("dtot"))
    st.join(dt, "w")
      .join(totals, "source")
      .crossJoin(broadcast(dTot))
      .groupBy($"source")
      .agg(
        first($"ctot").as("n_tokens"),
        count(lit(1)).as("vocab"),
        first($"dtot").as("dtot"),
        sum(abs($"c" * $"dtot" - $"d" * $"ctot")).as("in_vocab_num"),
        sum($"d").as("d_in_vocab"))
      .select($"source", $"n_tokens", $"vocab",
        ($"in_vocab_num" + $"n_tokens" * ($"dtot" - $"d_in_vocab"))
          .as("tvd_num"),
        (($"in_vocab_num" + $"n_tokens" * ($"dtot" - $"d_in_vocab"))
          .cast("double") /
          (lit(2.0) * $"n_tokens".cast("double") * $"dtot".cast("double")))
          .as("tvd"))
      .orderBy("source")
  }

  /** Fold a batch's keys into the persistent KMV sketch state: the k
    * smallest md5 values seen so far. k-min-of-union == min-merge of
    * k-min sketches (order-free, duplicate-safe — md5 of a re-seen key
    * is already in or above the sketch), so the folded state is
    * EXACTLY the one-shot sketch over everything that ever arrived,
    * and the distinct-count estimate inherits KMV's guarantee. State
    * is ≤ k rows; per-batch cost is one distinct + TakeOrdered.
    */
  def mergeKmvState(spark: SparkSession, stateDir: String,
      batch: DataFrame, keyCol: String, batchId: Long = -1L): Unit = {
    import spark.implicits._
    val k = graft.queries.QualityQueries.KmvK
    val name = s"kmv_$keyCol"
    if (VersionedState.alreadyFolded(spark, stateDir, name, batchId)) return
    val bs = batch
      .select(md5(concat(lit("kmv:"), col(keyCol).cast("string"))).as("h"))
      .distinct().orderBy($"h").limit(k)
    val merged = VersionedState.readTable(spark, stateDir, name) match {
      case None => bs
      case Some(prior) => prior.unionByName(bs)
        .distinct().orderBy($"h").limit(k)
    }
    VersionedState.commit(spark, stateDir, name, batchId) { dir =>
      merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** Distinct-key estimate from the accumulated KMV state — exact
    * below k distinct keys, (k−1)/kth-minimum above.
    */
  def kmvEstimateFromState(spark: SparkSession, stateDir: String,
      keyCol: String): Double = {
    import spark.implicits._
    val k = graft.queries.QualityQueries.KmvK
    val r = stateTable(spark, stateDir, s"kmv_$keyCol")
      .agg(count(lit(1)), max($"h")).head()
    val n = r.getLong(0)
    if (n < k) n.toDouble
    else ((k - 1L) * (1L << 48)).toDouble /
      java.lang.Long.parseLong(r.getString(1).substring(0, 12), 16).toDouble
  }

  /** Fold a batch into the persistent BM25 corpus-statistics state:
    * (token, df) per distinct token — vocabulary-sized, the same bound
    * as the window-freq/chunk-freq states, never corpus-sized — plus
    * the (n_docs, total_tokens) scalar pair. All integer counts, so the
    * folded state is EXACTLY the stats a one-shot pass over the
    * concatenation computes (spec-pinned), which is what lets
    * [[bm25FromState]] reproduce batch BM25 scores bit-identically
    * without ever rescanning the corpus — the streaming-retrieval twin
    * of [[graft.ops.TextAnalysis.bm25Of]]'s stats pass.
    */
  def mergeBm25State(spark: SparkSession, stateDir: String, batch: DataFrame,
      batchId: Long = -1L): Unit = {
    import spark.implicits._
    // Crash-safe versioned commit (ADVICE r6, generalized to every
    // state in r10 as [[graft.streaming.VersionedState]]): each fold
    // writes a FRESH bm25_v<N>/ directory — df and scalars first, then
    // the meta row whose parquet _SUCCESS marker is the commit point
    // readers key on. A crash mid-merge leaves an incomplete vN+1 that
    // every reader ignores while vN stays intact. The recorded batchId
    // watermark makes an at-least-once REPLAY a no-op (VERDICT r9 ask
    // #1): re-folding a doc would double-count its tokens into
    // df/n_docs, so the former "dedupe upstream" scaladoc caveat is
    // now an engineered guarantee (spec: folding the same batchId
    // twice equals folding it once).
    if (VersionedState.alreadyFolded(spark, stateDir, "bm25", batchId)) return
    val toks = batch
      .select(col("doc_id"), explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
    val batchDf = toks.distinct().groupBy($"token").agg(count(lit(1)).as("df"))
    val row = toks.agg(countDistinct($"doc_id"), count(lit(1))).head()
    val (batchNd, batchTt) = (row.getLong(0), row.getLong(1))
    val (priorNd, priorTt) = readBm25Scalars(spark, stateDir)
    val merged = VersionedState.readTable(spark, stateDir, "bm25", "df") match {
      case None => batchDf
      case Some(prior) => prior.unionByName(batchDf)
        .groupBy($"token").agg(sum($"df").as("df"))
    }
    VersionedState.commit(spark, stateDir, "bm25", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/df")
      Seq((priorNd + batchNd, priorTt + batchTt)).toDF("n_docs", "total_tokens")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/scalars")
    }
  }

  /** (docs seen, tokens seen) — the BM25 scalars (zeros when absent). */
  def readBm25Scalars(spark: SparkSession, stateDir: String): (Long, Long) =
    VersionedState.readTable(spark, stateDir, "bm25", "scalars") match {
      case None => (0L, 0L)
      case Some(st) =>
        val r = st.head()
        (r.getLong(0), r.getLong(1))
    }

  /** BM25 top-n of `docs` against the ACCUMULATED corpus statistics:
    * dfs for the query's ≤k terms come from a filtered state read
    * (bounded collect), nd/tt from the scalar pair, and the scoring
    * kernel is the identical exact-rational closed form as
    * [[graft.ops.TextAnalysis.bm25Of]] — so when `docs` is the
    * concatenation of the folded batches, the output is bit-equal to
    * the one-shot batch op (spec-pinned). Per-call cost ∝ scored docs,
    * never the corpus.
    */
  def bm25FromState(spark: SparkSession, stateDir: String, docs: DataFrame,
      query: String, n: Int): DataFrame = {
    import spark.implicits._
    val terms: Array[String] =
      query.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty).distinct
    val k = terms.length
    require(k > 0, "bm25 needs at least one query term")
    val (nd, tt) = readBm25Scalars(spark, stateDir)
    val dfMap = VersionedState.readTable(spark, stateDir, "bm25", "df") match {
      case None => Map.empty[String, Long]
      case Some(st) => st
        .filter($"token".isin(terms.toSeq: _*))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val dfs = terms.map(t => dfMap.getOrElse(t, 0L))
    docs.select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
          val tfs = new Array[Long](k)
          toks.foreach { tk =>
            var i = 0
            while (i < k) { if (terms(i) == tk) tfs(i) += 1L; i += 1 }
          }
          var score = 0.0
          var i = 0
          while (i < k) {
            val tf = tfs(i)
            val num = (2L * nd - 2L * dfs(i) + 1L) * 44L * tf * tt
            val den = (2L * dfs(i) + 1L) *
              (20L * tf * tt + 6L * tt + 18L * toks.length.toLong * nd)
            score += num.toDouble / den.toDouble
            i += 1
          }
          (id, toks.length.toLong, score)
        }
      }
      .filter(_._2 > 0L)
      .toDF("doc_id", "n_tokens", "score")
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(n)
  }

  /** Fold a batch into the persistent shingle FIRST-OCCURRENCE table:
    * (sh, first_id) with min-merge — the streaming twin of
    * [[graft.ops.TextAnalysis.taNovelty]]. State is
    * shingle-vocabulary-bounded (the window-freq/chunk-freq bound, one
    * row per distinct trigram ever seen, never corpus-sized) and the
    * fold is associative/idempotent (min), so re-folding an identical
    * batch cannot corrupt it. Crash-safe versioned commit via
    * [[graft.streaming.VersionedState]]; the watermark skip just saves
    * a replayed batch the wasted fold.
    */
  def mergeNoveltyState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "novelty", batchId)) return
    val batchFirst = Dedup.shingledOf(batch.select(col("doc_id"), col("text")))
      .groupBy($"sh").agg(min($"doc_id").as("first_id"))
    val merged = VersionedState.readTable(spark, stateDir, "novelty", "first") match {
      case None => batchFirst
      case Some(prior) => prior.unionByName(batchFirst)
        .groupBy($"sh").agg(min($"first_id").as("first_id"))
    }
    VersionedState.commit(spark, stateDir, "novelty", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/first")
    }
  }

  /** Score a batch's novelty against the ACCUMULATED first-occurrence
    * state: a shingle is novel for doc d iff NO prior batch saw it AND
    * d is its first holder within this batch. When batches arrive in
    * ascending doc_id order (the streaming contract — ids are
    * monotonic), the concatenation of per-batch scores is EXACTLY the
    * one-shot [[graft.ops.TextAnalysis.noveltyOf]] over the full
    * corpus (spec-pinned): the state stands in for "every earlier
    * doc", so a batch pays batch-scan + state-join cost, never a
    * corpus rescan.
    */
  def noveltyFromState(spark: SparkSession, stateDir: String, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val sh = Dedup.shingledOf(docs.select(col("doc_id"), col("text")))
    val batchFirst = sh.groupBy($"sh").agg(min($"doc_id").as("bfirst"))
    val withState = VersionedState.readTable(spark, stateDir, "novelty", "first") match {
      case None => sh.join(batchFirst, Seq("sh"))
        .withColumn("sfirst", lit(null).cast("long"))
      case Some(st) => sh.join(batchFirst, Seq("sh"))
        .join(st.withColumnRenamed("first_id", "sfirst"), Seq("sh"), "left")
    }
    withState
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"sfirst".isNull && $"doc_id" === $"bfirst", 1L)
          .otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_shingles", $"n_novel",
        ($"n_novel".cast("double") / $"n_shingles".cast("double")).as("novelty"))
      .orderBy("doc_id")
  }

  /** Fold a batch into the persistent line first-occurrence table:
    * (key, fdoc, fidx) with struct-min merge — the streaming twin of
    * [[graft.ops.CorpusFilters.paragraphDedupOf]] (RefinedWeb exact
    * line dedup). State is one row per distinct normalized line ever
    * seen (vocabulary-bounded like the novelty/chunk-freq states, never
    * corpus-sized); the fold is associative and idempotent, so
    * re-delivery of a batch cannot corrupt it. Same crash-safe
    * versioned-commit protocol as [[mergeNoveltyState]].
    */
  def mergeParaState(spark: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long = -1L): Unit = {
    import spark.implicits._
    if (VersionedState.alreadyFolded(spark, stateDir, "paradedup", batchId)) return
    val batchFirst = graft.ops.CorpusFilters
      .lines(batch.select(col("doc_id"), col("text")))
      .withColumn("key", md5(lower(trim($"line"))))
      .groupBy($"key").agg(min(struct($"doc_id", $"idx")).as("f"))
      .select($"key", $"f.doc_id".as("fdoc"), $"f.idx".as("fidx"))
    val merged = VersionedState.readTable(spark, stateDir, "paradedup", "first") match {
      case None => batchFirst
      case Some(prior) => prior.unionByName(batchFirst)
        .groupBy($"key").agg(min(struct($"fdoc", $"fidx")).as("f"))
        .select($"key", $"f.fdoc".as("fdoc"), $"f.fidx".as("fidx"))
    }
    VersionedState.commit(spark, stateDir, "paradedup", batchId) { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/first")
    }
  }

  /** Deduplicate a batch's lines against the ACCUMULATED
    * first-occurrence state: a line instance survives iff no prior
    * batch holds its key AND it is the batch-first instance. Under
    * ascending doc_id batches (the streaming contract), the
    * concatenation of per-batch results is EXACTLY the one-shot
    * [[graft.ops.CorpusFilters.paragraphDedupOf]] over the full corpus
    * (spec-pinned): every prior doc_id is smaller than every current
    * one, so "state hit" ⇔ "an earlier doc held the line". A batch
    * pays batch-scan + state-join cost, never a corpus rescan.
    */
  def paraDedupFromState(spark: SparkSession, stateDir: String, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val l = graft.ops.CorpusFilters
      .lines(docs.select(col("doc_id"), col("text")))
      .withColumn("key", md5(lower(trim($"line"))))
    val batchFirst = l.groupBy($"key")
      .agg(min(struct($"doc_id", $"idx")).as("bf"))
    val withState = VersionedState.readTable(spark, stateDir, "paradedup", "first") match {
      case None => l.join(batchFirst, Seq("key"))
        .withColumn("sdoc", lit(null).cast("long"))
      case Some(st) => l.join(batchFirst, Seq("key"))
        .join(st.select($"key", $"fdoc".as("sdoc")), Seq("key"), "left")
    }
    withState
      .withColumn("kept", $"sdoc".isNull && struct($"doc_id", $"idx") === $"bf")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(!$"kept", 1L).otherwise(0L)).as("n_removed"),
        md5(array_join(
          transform(sort_array(collect_list(when($"kept",
            struct($"idx", $"line")))), x => x.getField("line")),
          "\n")).as("clean_md5"))
      .withColumn("kept_frac",
        ($"n_lines" - $"n_removed").cast("double") / $"n_lines".cast("double"))
      .orderBy("doc_id")
  }

  /** Score documents against the ACCUMULATED chunk-frequency state:
    * chunks that `minDocs`+ accepted corpus documents contain are
    * stripped (the incremental form of [[graft.ops.Curation.taBoilerplate]] —
    * the stored counts stand in for the corpus-wide frequency pass, so
    * a batch pays batch-sized cost only).
    */
  def boilerplateAgainstState(
      spark: SparkSession, stateDir: String, docs: DataFrame,
      minDocs: Int = graft.ops.Curation.BoilerMinDocs,
      broadcastBudget: Int = graft.ops.Curation.BoilerBroadcastBudget): DataFrame = {
    import spark.implicits._
    VersionedState.readTable(spark, stateDir, "chunk_freq") match {
      case None => graft.ops.Curation.removeChunks(docs, Set.empty[String])
      // same budget switch as the batch form: the accumulated frequent
      // set stays a DataFrame and is only collected if it fits the
      // broadcast budget — a long-lived corpus's chunk_freq table is
      // exactly the case that outgrows the driver
      case Some(st) => graft.ops.Curation.boilerplateWithFrequent(
        docs,
        st.filter($"nd" >= minDocs).select($"h"),
        broadcastBudget = broadcastBudget)
    }
  }

  /** Wire the per-batch graph into a file-source micro-batch stream. */
  def start(spark: SparkSession, inGlob: String, stateDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    new StreamingPipeline(
      source = FileStreamingSource(inGlob, schemaDdl = Some("doc_id LONG, text STRING")),
      sink = ForeachBatchSink { (batch, batchId) =>
        processBatch(batch.sparkSession, batch, stateDir, batchId = batchId); ()
      },
      trigger = TriggerConfig.AvailableNow).startStream(spark)
}
