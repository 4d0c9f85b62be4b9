package graft.runner

import org.apache.spark.sql.SparkSession
import graft.core.quality._

/** Quality-check execution at lifecycle points (reference:
  * runner/quality_hooks.py:73-139). Checks run via the hook protocol and
  * are error-swallowed like all hooks — a FAIL_ON_ERROR check failure is
  * recorded and logged, and the caller inspects `results` / `passed`
  * after the run (the documented caveat at quality_hooks.py:33-39: a
  * failing check never aborts the pipeline mid-flight).
  */
final class DataQualityHooks(
    checks: Seq[DataQualityCheck],
    spark: () => SparkSession) extends PipelineHooks {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.quality")
  private val resultsBuf = scala.collection.mutable.ListBuffer[CheckResult]()
  private val failureCounts = scala.collection.mutable.Map[String, Int]()

  def results: Seq[CheckResult] = resultsBuf.toSeq

  /** Overall verdict per failure-mode semantics (types.py:14-63 +
    * threshold counting at quality_hooks.py:107-118).
    */
  def passed: Boolean = checks.forall { c =>
    c.failureMode match {
      case FailureMode.WarnOnly => true
      case FailureMode.FailOnError =>
        resultsBuf.filter(_.name == c.name).forall(_.passed)
      case FailureMode.Threshold =>
        failureCounts.getOrElse(c.name, 0) <= c.maxFailures
    }
  }

  private def runChecks(timing: CheckTiming, component: Option[String]): Unit =
    checks
      .filter(_.timing == timing)
      .filter(c => timing != CheckTiming.AfterComponent ||
        c.componentName.forall(component.contains))
      .foreach { c =>
        // results are keyed by the DataQualityCheck's name (a factory
        // check renamed via .copy must be tracked under the new name)
        val r =
          (try c.check(spark())
          catch {
            case e: Throwable =>
              CheckResult(c.name, passed = false, s"check error: ${e.getMessage}")
          }).copy(name = c.name)
        resultsBuf += r
        if (!r.passed) {
          failureCounts(c.name) = failureCounts.getOrElse(c.name, 0) + 1
          c.failureMode match {
            case FailureMode.WarnOnly => log.warn(s"DQ ${c.name}: ${r.message}")
            case _ => log.error(s"DQ ${c.name}: ${r.message}")
          }
        } else log.info(s"DQ ${c.name}: ok — ${r.message}")
      }

  override def beforePipeline(pipeline: String): Unit =
    runChecks(CheckTiming.BeforePipeline, None)
  override def afterPipeline(pipeline: String, result: PipelineResult): Unit =
    runChecks(CheckTiming.AfterPipeline, None)
  override def afterComponent(component: String, result: ComponentResult): Unit =
    if (result.status == ComponentStatus.Success)
      runChecks(CheckTiming.AfterComponent, Some(component))
}
