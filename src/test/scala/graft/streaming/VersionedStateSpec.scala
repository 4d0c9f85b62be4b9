package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.examples.StreamingCuration
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based adversarial check of the round-10 versioned-commit
  * protocol: random valid foreachBatch traces — fresh batches,
  * at-least-once REPLAYS of any already-folded id, unmanaged manual
  * folds, and CRASHES that leave a partial uncommitted version dir —
  * are run against the real `mergeKeyCountState` fold, and after every
  * operation the on-disk state and watermark must equal a trivial
  * in-memory model (apply iff the id is new; crashes change nothing).
  * This is the whole replay/crash contract in one property, rather
  * than the three example-based specs alone.
  */
class VersionedStateSpec extends SparkSpec {

  private val name = "key_counts_source"

  sealed trait Op
  case class Fold(replay: Boolean, rows: List[String]) extends Op
  case class Manual(rows: List[String]) extends Op
  case object CrashPartial extends Op

  private val genRows: Gen[List[String]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> genRows.map(Fold(replay = false, _)),
    3 -> genRows.map(Fold(replay = true, _)),
    1 -> genRows.map(Manual(_)),
    2 -> Gen.const(CrashPartial))

  private val genTrace: Gen[List[Op]] =
    Gen.choose(4, 9).flatMap(n => Gen.listOfN(n, genOp))

  test("random fold/replay/crash traces match the in-memory model exactly") {
    import spark.implicits._
    (1 to 8).foreach { i =>
      genTrace(Gen.Parameters.default, Seed(i.toLong)).foreach { trace =>
        val dir = Files.createTempDirectory(s"graft-vsprop$i").toString
        var model = Map.empty[String, Long]
        var wm = -1L
        var nextId = 0L
        trace.foreach {
          case Fold(replay, rows) =>
            // a valid foreachBatch trace: a REPLAY redelivers an
            // already-assigned id; a fresh batch gets the next one
            val id = if (replay && wm >= 0L) wm else nextId
            StreamingCuration.mergeKeyCountState(spark, dir,
              rows.toDF("source"), "source", id)
            if (id > wm) {
              rows.foreach(k => model += k -> (model.getOrElse(k, 0L) + 1L))
              wm = id
            }
            nextId = math.max(nextId, id + 1L)
          case Manual(rows) =>
            // unmanaged fold (batchId = -1) always applies, never
            // advances the watermark
            StreamingCuration.mergeKeyCountState(spark, dir,
              rows.toDF("source"), "source")
            rows.foreach(k => model += k -> (model.getOrElse(k, 0L) + 1L))
          case CrashPartial =>
            // a crash mid-write: a higher version dir with payload but
            // no committed meta — must be invisible to everything
            val v = VersionedState.latest(dir, name).map(_._1).getOrElse(0) + 1
            Seq(("junk", 999L)).toDF("k", "cnt")
              .write.mode("overwrite").parquet(s"$dir/${name}_v$v/data")
        }
        val got =
          if (model.isEmpty) Map.empty[String, Long]
          else VersionedState.readTable(spark, dir, name).get
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == model, s"seed $i: state diverged from model ($trace)")
        assert(VersionedState.watermark(spark, dir, name) == wm,
          s"seed $i: watermark diverged ($trace)")
      }
    }
  }

  test("out-of-order managed folds apply exactly once and compact (VERDICT r10 #1)") {
    import spark.implicits._
    // the r10 bare-watermark guard silently DROPPED any id below an
    // already-folded higher id; the folded-id set applies each id
    // exactly once in ANY order, and a contiguous prefix compacts so
    // the persisted set is empty once every gap fills
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-vsooo$seed").toString
      val ids = rnd.shuffle((0L until 6L).toList)
      val deliveries = ids ++ rnd.shuffle(ids).take(2) // + 2 redeliveries
      var model = Map.empty[String, Long]
      var folded = Set.empty[Long]
      deliveries.foreach { id =>
        val rows = List.fill(1 + (id % 3).toInt)(s"k$id")
        StreamingCuration.mergeKeyCountState(spark, dir,
          rows.toDF("source"), "source", id)
        if (!folded.contains(id)) {
          rows.foreach(k => model += k -> (model.getOrElse(k, 0L) + 1L))
          folded += id
        }
      }
      val got = VersionedState.readTable(spark, dir, name).get
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == model, s"seed $seed: out-of-order state diverged ($ids)")
      assert(VersionedState.watermark(spark, dir, name) == 5L,
        s"seed $seed: full prefix must compact into the watermark")
      assert(VersionedState.meta(spark, dir, name).foldedAbove.isEmpty,
        s"seed $seed: persisted set must be empty once every gap fills")
    }
  }

  test("state protocol works against a non-file:// scheme (VERDICT r10 ask #2)") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val local = Files.createTempDirectory("graft-vsfs").toString
    val dir = s"graftfs:$local"
    // fold, crash mid-write, fold, replay — the full protocol trace,
    // through a path java.io.File cannot even parse
    StreamingCuration.mergeKeyCountState(spark, dir,
      Seq("a", "b", "a").toDF("source"), "source", 0L)
    Seq(("junk", 9L)).toDF("k", "cnt")
      .write.mode("overwrite").parquet(s"$dir/${name}_v2/data")
    def state() = VersionedState.readTable(spark, dir, name).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state() == Map("a" -> 2L, "b" -> 1L),
      "uncommitted partial version must be invisible on the remote scheme")
    StreamingCuration.mergeKeyCountState(spark, dir,
      Seq("b").toDF("source"), "source", 1L)
    StreamingCuration.mergeKeyCountState(spark, dir,
      Seq("b").toDF("source"), "source", 1L) // replay: must be a no-op
    assert(state() == Map("a" -> 2L, "b" -> 2L),
      "replay must be a no-op on the remote scheme")
    assert(VersionedState.watermark(spark, dir, name) == 1L)
    // bloom + capacity sidecars ride the same FileSystem resolution
    StreamingCuration.updateBloom(spark, dir, Array("x", "y"), expectedDocs = 100L)
    assert(StreamingCuration.readBloom(dir).mightContainString("x"))
    assert(StreamingCuration.bloomCapacity(dir).contains(100L))
  }

  test("gram-index compaction lifecycle works on a non-file:// scheme (VERDICT r11 ask #5)") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val local = Files.createTempDirectory("graft-compactfs").toString
    val state = s"graftfs:$local"
    val idx = s"$state/substr_gram_index"
    // fragment the append-only index the way micro-batches do: one
    // small append per batch
    (0 until 6).foreach { b =>
      Seq((b.toLong, b * 100L, b + 7L)).toDF("g", "doc_id", "p")
        .coalesce(1).write.mode("append").parquet(idx)
    }
    val preFiles = StateFs.list(idx).count(_.getName.endsWith(".parquet"))
    assert(preFiles >= 6, s"fixture needs one file per append, got $preFiles")
    val preRows = spark.read.parquet(idx).collect().map(_.toSeq).toSet
    // the scheduled lifecycle entry point, exactly as processBatch
    // calls it — duplicate-safe swap order on the Hadoop FS resolved
    // from the graftfs: path itself
    StreamingCuration.maybeCompactCorpus(spark, state, maxFiles = 2)
    val postFiles = StateFs.list(idx).count(_.getName.endsWith(".parquet"))
    assert(postFiles < preFiles,
      s"compaction must reduce files on the remote scheme: $preFiles -> $postFiles")
    assert(spark.read.parquet(idx).collect().map(_.toSeq).toSet == preRows,
      "compaction must preserve the index rows exactly")
    // the tmp staging dir must not leak
    assert(!StateFs.exists(s"${idx}_compact_tmp"))
  }
}
