package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride through Spark as opaque `binary` columns with
  * typed metadata, and per-item decode/feature-extraction runs as a
  * partition-local batch transform.
  *
  * The decode itself is a STUB — media codec libraries are not in this
  * build, so [[FakeCodec]] derives deterministic pseudo-media properties
  * from the payload bytes. Everything around the stub is the real
  * engineering surface and is tested: the (id, kind, payload, metadata)
  * schema, binary columns flowing through shuffles/joins, the
  * partition-local batch execution shape (`mapPartitions` over a typed
  * Dataset — the JVM analog of a vectorized batch UDF: one codec init
  * per partition, then a streamed batch of records), and byte-level
  * stats computed as codegen'd expressions where no decode is needed.
  *
  * At 100 TB: payloads dominate the bytes. Rules encoded here —
  * (a) never shuffle payloads for metadata-only queries (prune to
  * metadata columns first, `mmStats` reads only byte lengths);
  * (b) decode once per partition batch, not per row;
  * (c) keep per-partition batches bounded by repartitioning on media_id
  * before the decode stage.
  */
object Multimodal {

  /** Typed record: media payload + metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  final case class DecodedFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int, // image/video: pixels; audio: 0
      height: Int,
      channels: Int,
      duration_ms: Long, // audio/video: derived; image: 0
      feature: Array[Float]) // fixed-width embedding-like vector

  /** Deterministic stand-in for a real media codec. A production build
    * replaces decode() with actual JNI/library calls — the call shape
    * (bytes in, typed features out, partition-local init) is what the
    * pipeline depends on, not the pixel math.
    *
    * Pseudo-properties derive from the md5 of the payload (not a JVM
    * hashCode): md5 is reproducible in any engine, so the decode stage
    * is cross-system auditable — and oracle-checkable — rather than
    * JVM-bound. All arithmetic stays in non-negative ints (no
    * engine-specific negative division/modulo semantics) and the
    * feature components are IEEE single-precision quotients, which
    * divide identically on every IEEE-754 platform.
    */
  object FakeCodec {
    /** Per-partition "codec handle" — stands in for an expensive native
      * init that must NOT happen per record.
      */
    final class Handle private[FakeCodec] () {
      private val md = java.security.MessageDigest.getInstance("MD5")
      def decode(r: MediaRecord): DecodedFeatures = {
        val len = r.payload.length.toLong
        val hx = TextAnalysis.md5Hex(md, r.payload)
        def nib(i: Int): Int = Character.digit(hx.charAt(i), 16)
        // 28-bit non-negative value from the first 7 md5 nibbles
        var hv = 0
        var i = 0
        while (i < 7) { hv = (hv << 4) | nib(i); i += 1 }
        val w = 64 + hv % 512
        val ht = 64 + (hv / 512) % 512
        val feat = Array.tabulate(8)(i => nib(i).toFloat / 15.0f)
        r.kind match {
          case "image" => DecodedFeatures(r.media_id, r.kind, len, w, ht, 3, 0L, feat)
          case "audio" => DecodedFeatures(r.media_id, r.kind, len, 0, 0, 2, 1 + len / 4, feat)
          case _ => DecodedFeatures(r.media_id, r.kind, len, w, ht, 3, 1 + len / 100, feat)
        }
      }
    }
    def open(): Handle = new Handle()
  }

  /** Synthesize a media table from `documents` (no binary fixtures ship
    * with the testdata): payload = UTF-8 text bytes, kind assigned
    * round-robin. Deterministic, so oracles can recompute byte stats.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(
      $"doc_id".as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3 + 1).cast("int")).as("kind"),
      encode($"text", "UTF-8").as("payload"),
      $"source")
  }

  /** Metadata-only stats over binary payloads — pure expressions, no
    * decode, and crucially no shuffle of the payload bytes: the
    * aggregation reads only (kind, length(payload)).
    */
  def mmStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select($"kind", length($"payload").cast("long").as("blen"))
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_files"),
        sum($"blen").as("total_bytes"),
        min($"blen").as("min_bytes"),
        max($"blen").as("max_bytes"))
      .orderBy("kind")
  }

  /** Partition-local batch decode: one codec handle per partition, then
    * a streamed pass over its records (the mapPartitions analog of a
    * vectorized batch UDF). Repartition bounds batch size and spreads
    * decode work regardless of upstream file layout.
    */
  def decodeFeatures(media: Dataset[MediaRecord], partitions: Int): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        val codec = FakeCodec.open() // once per partition, not per row
        it.map(codec.decode)
      }
  }

  /** Decode stage as a query: documents-derived media → features.
    * Feature vector echoed as its sum (scalar) to keep the result
    * hash-friendly. The sum is folded inside the typed decode pass —
    * compiled JVM loop, not Catalyst's interpreted `aggregate` HOF.
    */
  def mmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir).as[MediaRecord]
    decodeFeatures(media, partitions = 32)
      .map { d =>
        var sum = 0.0
        var i = 0
        while (i < d.feature.length) { sum += d.feature(i); i += 1 }
        (d.media_id, d.kind, d.byte_len, d.width.toLong, d.height.toLong,
          d.channels.toLong, d.duration_ms, sum)
      }
      .toDF("media_id", "kind", "byte_len", "width", "height",
        "channels", "duration_ms", "feature_sum")
      .orderBy("media_id")
  }

  /** Resize plumbing: new dims from a target box, payload re-emitted
    * (stub: truncation stands in for re-encoding). The point under test
    * is binary columns surviving a transform + shuffle round-trip.
    */
  def mmResize(s: SparkSession, dir: String, maxDim: Int = 128): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir).as[MediaRecord]
    val decoded = decodeFeatures(media, partitions = 32).toDF()
      .select($"media_id", $"width", $"height")
    mediaTable(s, dir)
      .join(decoded, "media_id")
      .select(
        $"media_id",
        $"width".cast("long").as("width"), $"height".cast("long").as("height"),
        least($"width", lit(maxDim)).cast("long").as("new_width"),
        least($"height", lit(maxDim)).cast("long").as("new_height"),
        substring($"payload", 1, 1024).as("payload_head"))
      .select($"media_id", $"width", $"height", $"new_width", $"new_height",
        length($"payload_head").cast("long").as("head_len"))
      .orderBy("media_id")
  }

  /** Frame sampling: split a "video" payload into fixed-size frame
    * chunks and keep every k-th — the batch-shape pattern for
    * video-to-image fan-out (explode multiplies rows, payload bytes
    * stay partition-local until the explode).
    */
  def mmFrameSample(s: SparkSession, dir: String, frameBytes: Int = 256, every: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .filter($"kind" === "video")
      .select($"media_id", length($"payload").cast("long").as("blen"), $"payload")
      .select($"media_id", $"blen",
        explode(sequence(lit(0),
          greatest((($"blen" - 1) / frameBytes).cast("int"), lit(0)))).as("frame_no"))
      .filter($"frame_no" % every === 0)
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_sampled_frames"),
        max($"frame_no").cast("long").as("last_frame"))
      .orderBy("media_id")
  }

  val AudioWindowBytes = 64
  val AudioHopBytes = 32

  /** STFT-style framing over audio payloads: overlapping byte windows
    * (64-byte window, 32-byte hop), per-window energy = sum of unsigned
    * byte values — integer arithmetic end to end, so unlike a real FFT
    * the whole framing+feature stage is hash-oracle-checkable. The
    * kernel shape is the real one (per-partition streamed pass over
    * payload bytes, one output row per media item); a production build
    * swaps the energy loop for the DSP call. Payloads shorter than one
    * window emit nothing (matching the oracle's empty range).
    */
  def mmAudioWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val W = AudioWindowBytes
    val H = AudioHopBytes
    mediaTable(s, dir)
      .filter($"kind" === "audio")
      .select($"media_id", $"payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val n = bytes.length
          if (n < W) Iterator.empty
          else {
            val nw = (n - W) / H + 1
            var total = 0L
            var peak = Long.MinValue
            var peakW = -1L
            var w = 0
            while (w < nw) {
              var e = 0L
              var i = w * H
              val end = i + W
              while (i < end) { e += (bytes(i) & 0xff).toLong; i += 1 }
              total += e
              if (e > peak) { peak = e; peakW = w.toLong }
              w += 1
            }
            Iterator.single((id, nw.toLong, total, peak, peakW))
          }
        }
      }
      .toDF("media_id", "n_windows", "total_energy", "peak_energy", "peak_window")
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_stats" -> mmStats,
    "mm_decode" -> ((s, d) => mmDecode(s, d)),
    "mm_resize" -> ((s, d) => mmResize(s, d)),
    "mm_frame_sample" -> ((s, d) => mmFrameSample(s, d)),
    "mm_audio_windows" -> mmAudioWindows)

  /** kind expression shared by the oracles (media_id % 3 → image/audio/
    * video; DuckDB lists are 1-based like element_at).
    */
  private val kindSql =
    "(['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)]"

  /** DuckDB mirror of the stub codec's md5-nibble math. md5(text) in
    * DuckDB hashes the UTF-8 bytes — exactly the payload bytes — and
    * `CAST(n AS REAL)/CAST(15 AS REAL)` is the same IEEE single
    * division the JVM performs, so feature_sum is bit-identical when
    * added in the same left-to-right order.
    */
  private def nibSql(i: Int) =
    s"(strpos('0123456789abcdef', substr(hx, ${i + 1}, 1)) - 1)"
  private val featureSumSql = (0 until 8)
    .map(i => s"CAST(CAST(${nibSql(i)} AS REAL) / CAST(15 AS REAL) AS DOUBLE)")
    .reduce((a, b) => s"($a + $b)")
  private val hvSql = (0 until 7).map(nibSql).reduce((a, b) => s"($a * 16 + $b)")
  private val decodedCte = s"""
    d AS (
      SELECT doc_id AS media_id, $kindSql AS kind,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        md5(text) AS hx
      FROM documents),
    geom AS (
      SELECT media_id, kind, byte_len, hx, $hvSql AS hv
      FROM d)"""

  val oracles: Map[String, String] = Map(
    // documents text is ASCII, so ord(char) == UTF-8 byte value and the
    // oracle can frame the TEXT where the kernel frames payload BYTES
    "mm_audio_windows" -> s"""
      WITH audio AS (
        SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1),
      b AS (
        SELECT media_id, [ord(substr(text, i, 1)) for i in range(1, len(text)+1)] AS bv
        FROM audio),
      wins AS (
        SELECT media_id, u.w AS w,
          CAST(list_sum(bv[(u.w*$AudioHopBytes+1):(u.w*$AudioHopBytes+$AudioWindowBytes)]) AS BIGINT) AS energy
        FROM b, UNNEST(range(0,
          CAST(floor((len(bv)-$AudioWindowBytes)/$AudioHopBytes.0) AS BIGINT) + 1)) AS u(w)
        WHERE len(bv) >= $AudioWindowBytes),
      ranked AS (
        SELECT media_id, w, energy,
          ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY energy DESC, w ASC) AS rk
        FROM wins)
      SELECT media_id,
        count(*) AS n_windows,
        CAST(sum(energy) AS BIGINT) AS total_energy,
        CAST(max(energy) AS BIGINT) AS peak_energy,
        CAST(min(CASE WHEN rk = 1 THEN w END) AS BIGINT) AS peak_window
      FROM ranked GROUP BY media_id ORDER BY media_id""",
    "mm_decode" -> s"""
      WITH $decodedCte
      SELECT media_id, kind, byte_len,
        CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + hv % 512 END AS BIGINT) AS width,
        CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (hv // 512) % 512 END AS BIGINT) AS height,
        CAST(CASE WHEN kind = 'audio' THEN 2 ELSE 3 END AS BIGINT) AS channels,
        CAST(CASE kind WHEN 'image' THEN 0
                       WHEN 'audio' THEN 1 + byte_len // 4
                       ELSE 1 + byte_len // 100 END AS BIGINT) AS duration_ms,
        $featureSumSql AS feature_sum
      FROM geom ORDER BY media_id""",
    "mm_resize" -> s"""
      WITH $decodedCte,
      dims AS (
        SELECT media_id, byte_len,
          CASE WHEN kind = 'audio' THEN 0 ELSE 64 + hv % 512 END AS w,
          CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (hv // 512) % 512 END AS h
        FROM geom)
      SELECT media_id,
        CAST(w AS BIGINT) AS width,
        CAST(h AS BIGINT) AS height,
        CAST(LEAST(w, 128) AS BIGINT) AS new_width,
        CAST(LEAST(h, 128) AS BIGINT) AS new_height,
        LEAST(byte_len, 1024) AS head_len
      FROM dims ORDER BY media_id""",
    "mm_stats" -> s"""
      SELECT $kindSql AS kind,
        COUNT(*) AS n_files,
        CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
        MIN(CAST(octet_length(encode(text)) AS BIGINT)) AS min_bytes,
        MAX(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
      FROM documents
      GROUP BY 1 ORDER BY 1""",
    "mm_frame_sample" -> s"""
      WITH v AS (
        SELECT doc_id AS media_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS blen
        FROM documents
        WHERE $kindSql = 'video'),
      frames AS (
        SELECT media_id, unnest(range(0, GREATEST(CAST((blen - 1) / 256 AS INT), 0) + 1)) AS frame_no
        FROM v)
      SELECT media_id,
        COUNT(*) AS n_sampled_frames,
        MAX(frame_no) AS last_frame
      FROM frames
      WHERE frame_no % 4 = 0
      GROUP BY media_id
      ORDER BY media_id""")
}
