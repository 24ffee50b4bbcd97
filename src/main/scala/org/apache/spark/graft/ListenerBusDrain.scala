package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Package-local bridge to the `private[spark]` listener bus.
  *
  * The async event queues deliver stage-completed events after the job's
  * action has already returned, so metrics snapshotted from a
  * SparkListener immediately after an action can undercount the job's
  * last stages or misattribute them to the next measured segment.
  * Draining the bus before each snapshot makes segment attribution
  * deterministic (the same reason Spark's own test harness exposes
  * `waitUntilEmpty`).
  */
object ListenerBusDrain {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(30000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
