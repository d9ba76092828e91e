package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** `private[spark]` doorway to the listener bus: the bench's joblog pass
  * snapshots a counting listener after each query, and a fixed sleep
  * (r15) let late stage-completion events from a slow query bleed into
  * the next query's delta. Draining the bus is the correct barrier —
  * exactly what Spark's own TestUtils does between asserted jobs.
  */
object ListenerBusShim {
  /** Block until every queued listener event is dispatched, or
    * `timeoutMillis` elapses; returns false on timeout.
    */
  def drain(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
