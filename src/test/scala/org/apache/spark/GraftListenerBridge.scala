package org.apache.spark

/** Test-only accessor for `SparkContext.listenerBus` (private[spark]).
  *
  * The DPP-probe pin in AnalyticsOpsSpec must assert that `Par.spread`
  * submitted ZERO jobs; listener delivery is asynchronous, so the assert
  * needs the bus drained, not a fixed sleep that can under-wait on a
  * loaded host and mask the regression it pins.
  */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
