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
}
