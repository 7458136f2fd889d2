package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench/test-only: block until the async listener bus has delivered every
  * queued event, so per-query task-metric deltas attribute to the query
  * that produced them (the bus is async; without a drain the last stage's
  * counters can land on the NEXT query's window). `waitUntilEmpty` is
  * `private[spark]` — this shim lives under org.apache.spark solely to
  * reach it; nothing else in the library touches Spark internals.
  */
object BusDrain {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
