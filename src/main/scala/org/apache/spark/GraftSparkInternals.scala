package org.apache.spark

/** Package-private-access shims for the bench harness. The listener bus
  * delivers stage events asynchronously, so a per-query shuffle-bytes
  * ledger read without a drain would credit a query's final stages to the
  * NEXT query's ledger; `waitUntilEmpty` is `private[spark]`, hence this
  * one-method accessor (the standard org.apache.spark escape hatch — no
  * Spark internals are modified or copied).
  */
object GraftSparkInternals {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
