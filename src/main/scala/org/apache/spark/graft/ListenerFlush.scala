package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`, but per-query metric
  * attribution needs a flush point: task-end events are delivered
  * asynchronously, so snapshotting listener-accumulated counters right
  * after an action returns would bleed a query's last tasks into the
  * next query's numbers. This is the same technique Spark's own test
  * utilities use (`SparkContext.listenerBus.waitUntilEmpty`), exposed
  * through a package-scoped shim rather than reflection so it breaks
  * loudly at compile time if the internal API moves.
  */
object ListenerFlush {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
