package org.apache.spark

/** Bridge into the `private[spark]` listener bus for deterministic event
  * delivery. The QueryExecutionListener rides the shared async
  * LiveListenerBus: without a flush, an observed-metric event can arrive
  * AFTER the action returns, so attributing metrics to the query that just
  * ran by before/after diffing is a race (a late event lands in the next
  * query's diff). Draining the bus between queries makes the attribution
  * exact.
  */
object GraftListenerBridge {

  /** Block until every queued listener event is delivered, or the timeout
    * elapses. Returns false on timeout (delivery then remains async — the
    * caller should treat subsequent attribution as best-effort).
    */
  def drain(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
