package graft.core.component

import org.apache.spark.sql.SparkSession
import graft.core.config.ComponentConfig

/** Component model (reference: core/component/base.py:6-31 and
  * core/component/protocols.py). A component is a named unit of work;
  * Spark-aware components additionally receive an injected session
  * (runtime/dataflow/base.py:15-87).
  */
trait PipelineComponent {
  def name: String
  def run(): Unit
}

/** Optional open/close lifecycle around run() — executor calls open
  * before run and close in a finally (runner/component_executor.py:91-123).
  */
trait Resource {
  def open(): Unit = ()
  def close(): Unit = ()
}

/** Spark-aware component: session injected by the executor before run().
  * Mirrors DataFlow (runtime/dataflow/base.py): the reference injects via
  * set_spark_session; accessing the session before injection is an error.
  */
trait DataFlow extends PipelineComponent {
  private var _spark: Option[SparkSession] = None
  final def setSparkSession(s: SparkSession): Unit = { _spark = Some(s) }
  final def spark: SparkSession = _spark.getOrElse(
    throw new IllegalStateException(
      s"component $name: SparkSession accessed before injection"))
  @transient protected lazy val log: org.slf4j.Logger =
    org.slf4j.LoggerFactory.getLogger(getClass)
}

/** Optional declared input/output schemas for cross-component contract
  * validation (core/component/protocols.py:34-49).
  */
trait SchemaContract {
  def inputSchema: Option[graft.core.schema.SchemaDefinition] = None
  def outputSchema: Option[graft.core.schema.SchemaDefinition] = None
}

/** Factory protocol: components are built from the per-component config
  * map (reference resolves `from_config(dict)` reflectively,
  * runtime/loader.py:63-86; on the JVM a companion factory replaces
  * Python's **kwargs construction).
  */
trait ComponentFactory {
  def fromConfig(config: Map[String, Any]): PipelineComponent
}

sealed abstract class ComponentException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)
final case class ComponentNotFoundError(msg: String) extends ComponentException(msg)
final case class ComponentInstantiationError(msg: String, cause: Throwable = null)
  extends ComponentException(msg, cause)
final case class ComponentExecutionError(component: String, cause: Throwable)
  extends ComponentException(s"component $component failed: ${cause.getMessage}", cause)

/** Config-map accessors shared by built-in components. */
object Cfg {
  def str(c: Map[String, Any], k: String): String =
    c.get(k).map(String.valueOf(_)).getOrElse(
      throw ComponentInstantiationError(s"missing config key '$k'"))
  def strOpt(c: Map[String, Any], k: String): Option[String] =
    c.get(k).collect { case v if v != null => String.valueOf(v) }
  def strOr(c: Map[String, Any], k: String, d: String): String =
    strOpt(c, k).getOrElse(d)
  def boolOr(c: Map[String, Any], k: String, d: Boolean): Boolean =
    c.get(k) match {
      case Some(b: Boolean) => b
      case Some(s: String) => s.toBoolean
      case Some(o) => throw ComponentInstantiationError(s"key '$k': expected boolean, got $o")
      case None => d
    }
  def intOr(c: Map[String, Any], k: String, d: Int): Int =
    longOr(c, k, d.toLong).toInt
  def longOr(c: Map[String, Any], k: String, d: Long): Long =
    c.get(k) match {
      case Some(n: Number) => n.longValue()
      case Some(s: String) => s.toLong
      case Some(o) => throw ComponentInstantiationError(s"key '$k': expected number, got $o")
      case None => d
    }
  def seqOr(c: Map[String, Any], k: String, d: Seq[String]): Seq[String] =
    c.get(k) match {
      case Some(l: List[Any @unchecked]) => l.map(String.valueOf(_))
      case Some(o) => throw ComponentInstantiationError(s"key '$k': expected array, got $o")
      case None => d
    }
  def mapOr(c: Map[String, Any], k: String): Map[String, String] =
    c.get(k) match {
      case Some(m: Map[String @unchecked, Any @unchecked]) =>
        m.map { case (mk, mv) => mk -> String.valueOf(mv) }
      case Some(o) => throw ComponentInstantiationError(s"key '$k': expected object, got $o")
      case None => Map.empty
    }
}
