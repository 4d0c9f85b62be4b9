package graft.runner

import graft.core.config.{ConfigLoader, ConfigValidator}

/** CLI entrypoint (reference: runner/cli.py:15-95):
  *
  *   graft-run config.conf [--dry-run] [--no-fail-fast]
  *                         [--skip-validation] [--log-level LEVEL]
  *
  * Exit codes: 0 success, 1 failure/invalid, 2 partial success.
  */
object Cli {
  final case class Args(
      configPath: String,
      dryRun: Boolean = false,
      failFast: Boolean = true,
      skipValidation: Boolean = false,
      logLevel: String = "INFO")

  private val usage =
    "usage: graft-run <config.conf> [--dry-run] [--no-fail-fast] [--skip-validation] [--log-level LEVEL]"

  /** Single left-to-right pass: value-bearing flags consume the following
    * token, so `--log-level DEBUG cfg.conf` and `cfg.conf --log-level
    * DEBUG` both parse.
    */
  def parseArgs(argv: Seq[String]): Either[String, Args] = {
    var positional = List.empty[String]
    var a = Args("")
    var rest = argv.toList
    while (rest.nonEmpty) rest match {
      case "--dry-run" :: t => a = a.copy(dryRun = true); rest = t
      case "--no-fail-fast" :: t => a = a.copy(failFast = false); rest = t
      case "--skip-validation" :: t => a = a.copy(skipValidation = true); rest = t
      case "--log-level" :: v :: t if !v.startsWith("--") =>
        a = a.copy(logLevel = v); rest = t
      case "--log-level" :: _ => return Left("--log-level requires a value")
      case other :: _ if other.startsWith("--") => return Left(s"unknown option: $other")
      case p :: t => positional = p :: positional; rest = t
      case Nil => ()
    }
    positional.reverse match {
      case path :: Nil => Right(a.copy(configPath = path))
      case _ => Left(usage)
    }
  }

  /** Returns the process exit code (side effect free apart from the run
    * itself, so tests can call it directly).
    */
  def execute(argv: Seq[String]): Int = parseArgs(argv) match {
    case Left(msg) =>
      System.err.println(msg)
      1
    case Right(args) =>
      if (!args.skipValidation) {
        val report = ConfigValidator.validateFile(args.configPath, dryRun = true)
        if (!report.isValid) {
          report.issues.foreach(i =>
            System.err.println(s"[${i.phase.name}] ${i.component.getOrElse("-")}: ${i.message}"))
          return 1
        }
      }
      if (args.dryRun) {
        println("dry run ok")
        return 0
      }
      val config = ConfigLoader.loadFile(args.configPath)
      val runner = new SimplePipelineRunner(config, new LoggingHooks,
        failFast = args.failFast)
      try {
        val result = runner.run()
        result.status match {
          case PipelineStatus.Success => 0
          case PipelineStatus.PartialSuccess => 2
          case PipelineStatus.Failure => 1
        }
      } finally runner.close()
  }

  def main(argv: Array[String]): Unit = sys.exit(execute(argv.toSeq))
}
