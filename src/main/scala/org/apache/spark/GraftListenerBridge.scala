package org.apache.spark

/** Second (and last) `private[spark]` doorway, used only by the bench
  * harness: the listener bus posts task-end events asynchronously, so a
  * CPU-time-summing listener must drain the bus before its counter is
  * read, and `SparkContext.listenerBus.waitUntilEmpty()` is
  * `private[spark]`. Production code paths never touch this — it exists
  * so BENCH_FULL.json can carry contention-immune `executorCpuTime`
  * readings beside wall time.
  */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
