package graft.runtime

import org.apache.spark.sql.SparkSession
import graft.core.config.SparkConfig

/** Spark session lifecycle (reference: runtime/session/wrapper.py:18-208):
  * thread-safe lazy creation from SparkConfig, injected-session mode
  * (Databricks/EMR — caller owns the session), and Spark Connect via
  * `builder.remote(sc://…)` when `connectString` is set. `sparkContext`
  * access is gated off in Connect mode (wrapper.py:107-115).
  */
final class SessionWrapper(
    config: SparkConfig = SparkConfig(),
    injected: Option[SparkSession] = None) {

  @volatile private var created: Option[SparkSession] = None
  private val lock = new Object

  /** True when this wrapper created (and therefore owns) the session. */
  def ownsSession: Boolean = injected.isEmpty && created.nonEmpty

  def isConnect: Boolean = config.connectString.nonEmpty && injected.isEmpty

  def session: SparkSession = injected.getOrElse {
    created.getOrElse(lock.synchronized {
      created.getOrElse {
        val s = build()
        created = Some(s)
        s
      }
    })
  }

  private def build(): SparkSession = {
    val b = SparkSession.builder()
    config.connectString match {
      case Some(sc) => b.remote(sc)
      case None => config.master.foreach(b.master)
    }
    config.toSparkConfMap.foreach { case (k, v) =>
      if (k != "spark.master") b.config(k, v)
    }
    b.getOrCreate()
  }

  /** Gated context access: unavailable over Spark Connect. */
  def sparkContext: org.apache.spark.SparkContext = {
    if (isConnect)
      throw new UnsupportedOperationException(
        "sparkContext is not available in Spark Connect mode")
    session.sparkContext
  }

  /** Stop only if owned (never stop an injected session —
    * wrapper.py:150-164).
    */
  def stop(): Unit = lock.synchronized {
    if (ownsSession) {
      created.foreach(_.stop())
      created = None
    }
  }
}
