package org.apache.spark.graftmetrics

import org.apache.spark.SparkContext

/** Bench instrumentation helper: block until the async listener bus has
  * delivered every queued event, so per-query metric snapshots (shuffle
  * bytes via `onTaskEnd`) attribute to the query that produced them
  * instead of racing the bus. `LiveListenerBus.waitUntilEmpty` is
  * `private[spark]` (it exists for exactly this — Spark's own tests call
  * it between action and assertion), hence this one-line shim under the
  * org.apache.spark package; no other internals are touched. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
