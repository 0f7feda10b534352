package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/**
 * `SparkContext.listenerBus` is `private[spark]`; Bench needs to drain it
 * so per-gate stage-metric snapshots (shuffle bytes) are attributed to
 * the gate that produced them, not the next one. Same escape-hatch
 * convention as the sql bridges.
 */
object SparkInternals {
  def waitListenerEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
