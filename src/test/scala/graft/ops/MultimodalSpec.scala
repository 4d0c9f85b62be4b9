package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("media table: binary payload column with typed metadata") {
    val df = mediaTable(spark, sfDir)
    assert(df.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(df.select("kind").distinct().collect().map(_.getString(0)).toSet ==
      Set("image", "audio", "video"))
    assert(df.count() == 500)
  }

  test("decode is deterministic, batch-shaped, and kind-aware") {
    import spark.implicits._
    val media = mediaTable(spark, sfDir).as[MediaRecord]
    val a = decodeFeatures(media, 8).collect().map(f => f.media_id -> f).toMap
    val b = decodeFeatures(media, 3).collect().map(f => f.media_id -> f).toMap
    assert(a.keySet == b.keySet)
    // partitioning must not change decoded values
    assert(a.forall { case (id, f) =>
      val g = b(id)
      f.width == g.width && f.byte_len == g.byte_len &&
        f.feature.toSeq == g.feature.toSeq
    })
    val byKind = a.values.groupBy(_.kind)
    assert(byKind("image").forall(f => f.duration_ms == 0 && f.width > 0))
    assert(byKind("audio").forall(f => f.width == 0 && f.duration_ms > 0))
    assert(byKind("video").forall(f => f.duration_ms > 0 && f.width > 0))
    assert(a.values.forall(_.feature.length == 8))
  }

  test("decoded byte_len matches the payload length") {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
    val expected = media
      .select($"media_id", length($"payload").cast("long").as("blen"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decoded = decodeFeatures(media.as[MediaRecord], 8)
      .collect().map(f => f.media_id -> f.byte_len).toMap
    assert(decoded == expected)
  }

  test("resize never exceeds the target box; payload survives the join") {
    val out = mmResize(spark, sfDir, maxDim = 100).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("new_width") <= 100)
      assert(r.getAs[Long]("new_height") <= 100)
      assert(r.getAs[Long]("head_len") > 0)
    }
  }

  test("frame sampling keeps every 4th frame") {
    val rows = mmFrameSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("last_frame") % 4 == 0)
      assert(r.getAs[Long]("n_sampled_frames") >= 1)
    }
  }

  test("audio windows: overlapping frames match an in-memory reference") {
    import spark.implicits._
    val audio = mediaTable(spark, sfDir).filter($"kind" === "audio")
      .select($"media_id", $"payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    val W = Multimodal.AudioWindowBytes
    val H = Multimodal.AudioHopBytes
    val expected = audio.collect { case (id, bytes) if bytes.length >= W =>
      val wins = (0 to (bytes.length - W) / H).map { w =>
        bytes.slice(w * H, w * H + W).map(b => (b & 0xff).toLong).sum
      }
      val peakW = wins.indexOf(wins.max).toLong
      id -> ((wins.length.toLong, wins.sum, wins.max, peakW))
    }.toMap
    val got = Multimodal.mmAudioWindows(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // 50% hop: consecutive windows genuinely overlap
    assert(got.values.exists(_._1 > 1), "multi-window payloads exist")
  }

  test("scene cuts: equals an in-memory frame-energy replay; mixed outcomes") {
    val W = Multimodal.SceneFrameBytes
    val T = Multimodal.SceneCutThreshold
    val vids = graft.Tables.t(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 2)
      .collect().map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val expected = vids.flatMap { case (id, bytes) =>
      val n = bytes.length / W
      if (n < 1) None
      else {
        val e = (0 until n).map(f =>
          (f * W until (f + 1) * W).map(i => (bytes(i) & 0xff).toLong).sum)
        val ds = (1 until n).map(f => math.abs(e(f) - e(f - 1)))
        val cutIdx = (1 until n).filter(f => ds(f - 1) >= T)
        Some(id -> ((n.toLong, cutIdx.length.toLong, cutIdx.length + 1L,
          ds.sum, cutIdx.headOption.map(_.toLong).getOrElse(-1L))))
      }
    }.toMap
    val got = Multimodal.mmSceneCuts(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "some videos must have cuts")
    assert(got.values.exists(v => v._2 == 0 && v._1 > 1),
      "some multi-frame videos must have none")
  }

  test("batch shapes: conserves visual media; tiers bound pixels; pad non-negative") {
    import org.apache.spark.sql.functions._
    val got = Multimodal.mmBatchShapes(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val visual = Multimodal.mmDecode(spark, sfDir)
      .filter(col("kind") =!= "audio").count()
    assert(got.map(_._3).sum == visual,
      "every non-audio medium lands in exactly one (shape, tier) cell")
    got.foreach { case (shape, tier, n, totalPx, padPx) =>
      assert(Seq("wide", "tall", "square").contains(shape))
      assert(Multimodal.ShapeTiers.contains(tier), s"unknown tier $tier")
      assert(totalPx <= tier * n, "pixels cannot exceed the tier canvas")
      assert(padPx == tier * n - totalPx && padPx >= 0L)
    }
  }
}
