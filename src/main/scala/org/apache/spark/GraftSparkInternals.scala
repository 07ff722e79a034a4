package org.apache.spark

/** Bench forensics flushes the async listener bus before reading per-rep
  * task metrics; `SparkContext.listenerBus` and
  * `LiveListenerBus.waitUntilEmpty` are `private[spark]`, so this one
  * accessor lives in the `org.apache.spark` package. No other internals
  * are touched.
  */
object GraftSparkInternals {
  /** Block until all queued listener events are delivered (bounded). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
