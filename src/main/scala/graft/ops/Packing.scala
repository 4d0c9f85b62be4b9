package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Sequence assembly for LLM training and retrieval pipelines, over the
  * `documents` table.
  *
  * Two operators:
  *
  *  - '''pack_sequences''' — GPT-style concat-and-chunk packing: every
  *    document is laid out at its global token offset (documents
  *    concatenated in doc_id order), and fixed-length training sequences
  *    of [[SeqLen]] tokens are cut across document boundaries. Output is
  *    one row per (document, sequence) incidence with the token slice of
  *    the document that lands in that sequence — exactly the index a
  *    packed-dataset loader needs, with zero padding waste.
  *  - '''pack_chunks''' — RAG-style per-document sliding-window chunking
  *    ([[ChunkLen]] tokens, [[ChunkOverlap]] overlap). Embarrassingly
  *    parallel, pure codegen (`sequence` + `explode`), no shuffle.
  *
  * 100 TB shape of pack_sequences: the global token offset is a prefix
  * sum over a total order — the naive form (`Window.orderBy` with no
  * partition key) funnels the corpus through ONE task. This
  * implementation is the standard two-pass distributed prefix sum
  * instead: range-partition by doc_id, per-partition token totals (one
  * tiny job: #partitions rows to the driver — 1000 rows on a
  * 1000-executor cluster), then each partition emits its rows knowing
  * only its base offset. Cost is two scans of (doc_id, n_tokens) and no
  * wide shuffle of text at all.
  */
object Packing {

  val SeqLen = 2048L
  val ChunkLen = 512L
  val ChunkOverlap = 64L
  val ChunkStride: Long = ChunkLen - ChunkOverlap

  /** (doc_id, n_tokens) for non-empty docs, range-partitioned and sorted
    * so partition p holds a contiguous doc_id range and ranges ascend
    * with p. localCheckpoint freezes the layout: the totals job and the
    * emit job MUST see identical partitions (the range boundaries come
    * from sampling, so two independent evaluations could legally split
    * differently).
    */
  private def rangedTokenCounts(s: SparkSession, dir: String, partitions: Int) = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .filter($"n" > 0L)
      .repartitionByRange(partitions, $"doc_id")
      .sortWithinPartitions($"doc_id")
      .as[(Long, Long)]
      .localCheckpoint(true)
  }

  /** Concat-and-chunk packing: rows (doc_id, seq_id, tok_from, tok_to) —
    * tokens [tok_from, tok_to) of doc_id belong to training sequence
    * seq_id. A document longer than `seqLen` spans several sequences; a
    * sequence boundary mid-document splits the document's slice.
    */
  def packSequences(s: SparkSession, dir: String, seqLen: Long = SeqLen,
      partitions: Int = 32): DataFrame =
    packSequencesOf(rangedTokenCounts(s, dir, partitions), seqLen)

  /** [[packSequences]] over a pre-ranged (doc_id, n) Dataset — the form
    * the ScalaCheck property drives with generated corpora. The input
    * MUST be range-partitioned and sorted by doc_id (the registered
    * query's rangedTokenCounts guarantees it).
    */
  def packSequencesOf(
      ranged: org.apache.spark.sql.Dataset[(Long, Long)],
      seqLen: Long): DataFrame = {
    val s = ranged.sparkSession
    // pass 1: per-partition token totals -> base offset per partition
    val totals = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L
        it.foreach(sum += _._2)
        Iterator.single((pid, sum))
      }
      .collect()
      .sortBy(_._1)
    val base = new Array[Long](totals.length + 1)
    totals.foreach { case (pid, sum) => base(pid + 1) = sum }
    var i = 1
    while (i < base.length) { base(i) += base(i - 1); i += 1 }
    val baseBc = s.sparkContext.broadcast(base)
    // pass 2: emit (doc, seq) incidences from the per-partition scan
    val rows = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = baseBc.value(pid)
      it.flatMap { case (id, n) =>
        val start = off
        off += n
        val first = start / seqLen
        val last = (start + n - 1) / seqLen
        (first to last).iterator.map { sq =>
          (id, sq, math.max(0L, sq * seqLen - start),
            math.min(n, (sq + 1) * seqLen - start))
        }
      }
    }
    s.createDataFrame(rows)
      .toDF("doc_id", "seq_id", "tok_from", "tok_to")
      .orderBy("doc_id", "seq_id")
  }

  /** Sliding-window chunking: rows (doc_id, chunk_id, tok_from, tok_to);
    * chunk k of a doc covers tokens [k*stride, min(n, k*stride+chunkLen)).
    * Every chunk start below n emits, so consecutive chunks overlap by
    * `ChunkOverlap` tokens. Pure narrow codegen over the scan.
    */
  def packChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .filter($"n" > 0L)
      .select($"doc_id", $"n",
        explode(sequence(lit(0L), $"n" - 1L, lit(ChunkStride))).as("tok_from"))
      .select($"doc_id",
        ($"tok_from" / ChunkStride).cast("long").as("chunk_id"),
        $"tok_from",
        least($"n", $"tok_from" + ChunkLen).as("tok_to"))
      .orderBy("doc_id", "chunk_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pack_sequences" -> ((s, d) => packSequences(s, d)),
    "pack_chunks" -> packChunks)

  /** DuckDB token count, identical to TextAnalysis.tokenCount (parity
    * proven by the ta_tokens oracle).
    */
  private val tokCte = """
    toks AS (
      SELECT doc_id,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS BIGINT) AS n
      FROM documents)"""

  val oracles: Map[String, String] = Map(
    "pack_sequences" -> s"""
      WITH $tokCte,
      cum AS (
        SELECT doc_id, n,
          CAST(SUM(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS strt
        FROM toks WHERE n > 0),
      spans AS (
        SELECT doc_id, n, strt,
          unnest(range(strt // $SeqLen, (strt + n - 1) // $SeqLen + 1)) AS seq_id
        FROM cum)
      SELECT doc_id, seq_id,
        CAST(GREATEST(0, seq_id * $SeqLen - strt) AS BIGINT) AS tok_from,
        CAST(LEAST(n, (seq_id + 1) * $SeqLen - strt) AS BIGINT) AS tok_to
      FROM spans ORDER BY doc_id, seq_id""",
    "pack_chunks" -> s"""
      WITH $tokCte
      SELECT doc_id,
        tok_from // $ChunkStride AS chunk_id,
        tok_from,
        CAST(LEAST(n, tok_from + $ChunkLen) AS BIGINT) AS tok_to
      FROM (SELECT doc_id, n, unnest(range(0, n, $ChunkStride)) AS tok_from
            FROM toks WHERE n > 0)
      ORDER BY doc_id, chunk_id""")
}
