package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus draining: the
  * construction-laziness specs assert "zero jobs ran" through
  * `statusTracker`, which is fed ASYNCHRONOUSLY by the listener bus — a
  * just-submitted job could be invisible at assert time and the spec
  * would false-pass. Draining the bus first makes the zero-job check
  * deterministic.
  */
object ListenerBusFlush {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
