package graft.runner

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import graft.core.config.PipelineConfig

/** Checkpoint/resume (reference: runner/checkpoint.py:106-292):
  * a JSON journal of completed component names plus a structural
  * fingerprint of the pipeline; resume refuses to skip anything when the
  * fingerprint changed. Writes are atomic (write-then-rename).
  *
  * Fingerprint semantics (checkpoint.py:159-173, deliberately preserved):
  * SHA-256 over each component's `name`, `class_path`, and SORTED
  * `depends_on`, in declaration order — config maps and `enabled` flags
  * are intentionally NOT covered, so tuning a component or toggling it
  * does not invalidate a resume.
  */
final class CheckpointStore(dir: String) {
  private def fileFor(pipeline: String): Path =
    Paths.get(dir, s"$pipeline.checkpoint.json")

  def fingerprint(config: PipelineConfig): String = {
    val md = MessageDigest.getInstance("SHA-256")
    config.components.foreach { c =>
      md.update(c.name.getBytes(StandardCharsets.UTF_8))
      md.update(0.toByte)
      md.update(c.classPath.getBytes(StandardCharsets.UTF_8))
      md.update(0.toByte)
      c.dependsOn.sorted.foreach { d =>
        md.update(d.getBytes(StandardCharsets.UTF_8))
        md.update(0.toByte)
      }
      md.update(1.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  final case class Checkpoint(fingerprint: String, completed: Seq[String])

  def save(pipeline: String, cp: Checkpoint): Unit = {
    Files.createDirectories(Paths.get(dir))
    val json = {
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      s"""{"fingerprint": ${q(cp.fingerprint)}, "completed": [${cp.completed.map(q).mkString(", ")}]}"""
    }
    val target = fileFor(pipeline)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def load(pipeline: String): Option[Checkpoint] = {
    val f = fileFor(pipeline)
    if (!Files.exists(f)) return None
    val text = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
    // minimal parse of the exact shape `save` writes
    val fpr = "\"fingerprint\"\\s*:\\s*\"([0-9a-f]+)\"".r
    val arr = "\"completed\"\\s*:\\s*\\[(.*?)\\]".r
    for {
      fp <- fpr.findFirstMatchIn(text).map(_.group(1))
      items <- arr.findFirstMatchIn(text).map(_.group(1))
    } yield Checkpoint(fp,
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(items)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq)
  }

  def markCompleted(pipeline: String, config: PipelineConfig, component: String): Unit = {
    val fp = fingerprint(config)
    val prev = load(pipeline).filter(_.fingerprint == fp).map(_.completed).getOrElse(Nil)
    if (!prev.contains(component))
      save(pipeline, Checkpoint(fp, prev :+ component))
  }

  /** Completed set for resume; error if structure changed
    * (checkpoint.py:263-292).
    */
  def completedFor(pipeline: String, config: PipelineConfig): Set[String] =
    load(pipeline) match {
      case None => Set.empty
      case Some(cp) =>
        if (cp.fingerprint != fingerprint(config))
          throw CheckpointStore.FingerprintMismatch(pipeline)
        cp.completed.toSet
    }

  def clear(pipeline: String): Unit =
    Files.deleteIfExists(fileFor(pipeline))
}

object CheckpointStore {
  final case class FingerprintMismatch(pipeline: String)
    extends RuntimeException(
      s"pipeline $pipeline: structure changed since checkpoint; refusing to resume")
}

/** Hooks that journal completions as they happen
  * (runner/checkpoint.py:181-255).
  */
final class CheckpointHooks(store: CheckpointStore, config: PipelineConfig)
  extends PipelineHooks {
  override def afterComponent(component: String, result: ComponentResult): Unit =
    if (result.status == ComponentStatus.Success)
      store.markCompleted(config.name, config, component)
  override def afterPipeline(pipeline: String, result: PipelineResult): Unit =
    if (result.status == PipelineStatus.Success)
      store.clear(pipeline)
}
