package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into Spark's private[spark] listener bus: the
  * streaming plan-hygiene sweep must drain the ASYNC listener bus
  * before attributing captured SQLExecutionStart plans to the query
  * that just ran — otherwise a slow bus leaks one query's micro-batch
  * plans into the next query's window. */
object ListenerBusFlush {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
