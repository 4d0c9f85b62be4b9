package graft.core.config

import graft.runtime.ComponentLoader

/** Pre-flight config validation / dry-run (reference:
  * core/config/validator.py:85-181): phase-tagged issues; class-path
  * resolution and instantiation-without-execution.
  */
object ConfigValidator {
  sealed abstract class Phase(val name: String)
  case object ConfigSyntax extends Phase("config_syntax")
  case object RequiredFields extends Phase("required_fields")
  case object TypeResolution extends Phase("type_resolution")
  case object ComponentConfigPhase extends Phase("component_config")

  final case class Issue(phase: Phase, component: Option[String], message: String)
  final case class Report(issues: Seq[Issue]) {
    def isValid: Boolean = issues.isEmpty
  }

  /** Validate a parsed pipeline config: every class path must resolve;
    * with `dryRun` each component is also instantiated from its config
    * map (but never run).
    */
  def validate(config: PipelineConfig, dryRun: Boolean = false): Report = {
    val issues = scala.collection.mutable.ListBuffer[Issue]()
    config.components.foreach { c =>
      val factory =
        try Some(ComponentLoader.resolve(c.classPath))
        catch {
          case e: Throwable =>
            issues += Issue(TypeResolution, Some(c.name),
              s"cannot resolve class_path ${c.classPath}: ${e.getMessage}")
            None
        }
      if (dryRun) factory.foreach { f =>
        try f.fromConfig(c.config)
        catch {
          case e: Throwable =>
            issues += Issue(ComponentConfigPhase, Some(c.name),
              s"instantiation failed: ${e.getMessage}")
        }
      }
    }
    Report(issues.toSeq)
  }

  /** Parse + validate a config file, mapping parse/shape failures to the
    * syntax/required-fields phases.
    */
  def validateFile(path: String, dryRun: Boolean = false): Report =
    try validate(ConfigLoader.loadFile(path), dryRun)
    catch {
      case e: Hocon.ParseError =>
        Report(Seq(Issue(ConfigSyntax, None, e.getMessage)))
      case e: ConfigError =>
        Report(Seq(Issue(RequiredFields, None, e.message)))
    }
}
