package graft.core.audit

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Audit trail (reference: core/audit/{types,sinks,filters}.py +
  * runner/audit_hooks.py): structured events with a per-run trace id,
  * JSONL/logging/composite sinks, and secret redaction of config maps
  * before they are logged.
  */
final case class AuditEvent(
    action: String,
    actor: String,
    resource: String,
    status: String,
    timestampMillis: Long,
    traceId: String,
    metadata: Map[String, String] = Map.empty) {

  def toJson: String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val md = metadata.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    s"""{"action": ${q(action)}, "actor": ${q(actor)}, "resource": ${q(resource)}, """ +
      s""""status": ${q(status)}, "timestamp_ms": $timestampMillis, """ +
      s""""trace_id": ${q(traceId)}, "metadata": $md}"""
  }
}

trait AuditSink { def emit(event: AuditEvent): Unit }

final class LoggingAuditSink extends AuditSink {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.audit")
  def emit(e: AuditEvent): Unit = log.info(e.toJson)
}

/** Append-only JSONL file sink (core/audit/sinks.py FileAuditSink). */
final class FileAuditSink(path: String) extends AuditSink {
  def emit(e: AuditEvent): Unit = synchronized {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, (e.toJson + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}

final class CompositeAuditSink(sinks: Seq[AuditSink]) extends AuditSink {
  def emit(e: AuditEvent): Unit = sinks.foreach { s =>
    try s.emit(e)
    catch { case _: Throwable => () } // sinks never fail the pipeline
  }
}

/** Secret redaction before config values hit logs
  * (core/audit/filters.py:7-44): any key containing one of the sensitive
  * substrings has its value replaced.
  */
object ConfigFilter {
  private val Sensitive =
    Seq("password", "secret", "token", "key", "credential", "auth")
  val Redacted = "***REDACTED***"

  def scrub(config: Map[String, Any]): Map[String, Any] =
    config.map { case (k, v) =>
      val lower = k.toLowerCase
      if (Sensitive.exists(lower.contains)) k -> Redacted
      else k -> (v match {
        case m: Map[String @unchecked, Any @unchecked] => scrub(m)
        case other => other
      })
    }
}

/** Runner-lifecycle audit hooks (runner/audit_hooks.py:18-150): one
  * trace id per run; pipeline/component start+finish events.
  */
final class AuditHooks(
    sink: AuditSink,
    actor: String = sys.props.getOrElse("user.name", "unknown"),
    now: () => Long = () => System.currentTimeMillis())
  extends graft.runner.PipelineHooks {

  private var traceId: String = java.util.UUID.randomUUID().toString
  def currentTraceId: String = traceId

  private def emit(action: String, resource: String, status: String,
      md: Map[String, String] = Map.empty): Unit =
    sink.emit(AuditEvent(action, actor, resource, status, now(), traceId, md))

  override def beforePipeline(p: String): Unit = {
    traceId = java.util.UUID.randomUUID().toString
    emit("pipeline_start", p, "running")
  }
  override def afterPipeline(p: String, r: graft.runner.PipelineResult): Unit =
    emit("pipeline_finish", p, r.status.toString,
      Map("duration_ms" -> r.totalDurationMs.toString,
        "failed" -> r.failed.size.toString))
  override def beforeComponent(c: String): Unit =
    emit("component_start", c, "running")
  override def afterComponent(c: String, r: graft.runner.ComponentResult): Unit =
    emit("component_finish", c, r.status.toString,
      Map("duration_ms" -> r.durationMs.toString,
        "retries" -> r.retries.toString))
  override def onComponentFailure(c: String, e: Throwable): Unit =
    emit("component_failure", c, "failed", Map("error" -> String.valueOf(e.getMessage)))
}
