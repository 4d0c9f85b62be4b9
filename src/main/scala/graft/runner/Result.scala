package graft.runner

/** Execution results (reference: runner/result.py:9-45). */

sealed trait ComponentStatus
object ComponentStatus {
  case object Success extends ComponentStatus
  case object Failed extends ComponentStatus
  case object Skipped extends ComponentStatus
}

final case class ComponentResult(
    name: String,
    status: ComponentStatus,
    durationMs: Long = 0,
    retries: Int = 0,
    error: Option[Throwable] = None)

sealed trait PipelineStatus
object PipelineStatus {
  case object Success extends PipelineStatus
  case object PartialSuccess extends PipelineStatus
  case object Failure extends PipelineStatus
}

final case class PipelineResult(
    pipeline: String,
    status: PipelineStatus,
    components: Seq[ComponentResult],
    totalDurationMs: Long,
    errors: Seq[String] = Nil) {
  def succeeded: Seq[ComponentResult] =
    components.filter(_.status == ComponentStatus.Success)
  def failed: Seq[ComponentResult] =
    components.filter(_.status == ComponentStatus.Failed)
  def skipped: Seq[ComponentResult] =
    components.filter(_.status == ComponentStatus.Skipped)
}

object PipelineResult {
  import PipelineStatus._

  /** Status aggregation rule (runner/simple_runner.py:150-155): no
    * executed results or no failure → SUCCESS; all executed failed →
    * FAILURE; mixed → PARTIAL_SUCCESS. Skips don't count as executed.
    */
  def statusOf(components: Seq[ComponentResult]): PipelineStatus = {
    val executed = components.filterNot(_.status == ComponentStatus.Skipped)
    val failed = executed.count(_.status == ComponentStatus.Failed)
    if (executed.isEmpty || failed == 0) Success
    else if (failed == executed.size) Failure
    else PartialSuccess
  }
}
