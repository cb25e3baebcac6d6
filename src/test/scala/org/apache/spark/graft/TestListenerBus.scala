package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into the `private[spark]` listener bus: the PlanGuard
  * job-count census must drain queued listener events between query builds,
  * or a job fired by query N would be attributed (asynchronously) to query
  * N+1. `waitUntilEmpty` is exactly the primitive Spark's own test suites
  * use for this.
  */
object TestListenerBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
