package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus API: draining the bus
  * between benchmarked queries makes per-query task-metric deltas
  * (shuffle bytes) attributable to the right query.
  */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
