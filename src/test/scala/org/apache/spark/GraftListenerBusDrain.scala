package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: the
  * QueryExecutionListener events ride the shared LiveListenerBus, so
  * draining it makes PlanSizeAuditSpec's construction-time max
  * deterministic instead of racing a fixed sleep (a loaded CI box could
  * under-read maxSeen and silently pass an exponential-lineage
  * regression).
  */
object GraftListenerBusDrain {
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
