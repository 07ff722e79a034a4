package org.apache.spark.sql

/** Streaming state-store hygiene for the bench harness. Across a
  * 324-entry suite the ~15 streaming entries (× reps) accumulate
  * providers in the executor-singleton `StateStore.loadedProviders`,
  * and its maintenance task's per-interval snapshot/cleanup work grows
  * with them — the prime suspect for the recurring streaming-family
  * drift mode (q71 3.2 s isolated vs 15–26 s late in a full suite on
  * unchanged code, zero spill, quiet calibrations). `StateStore.stop()`
  * unloads every provider and stops the maintenance task; the next
  * streaming query lazily reloads from its own checkpoint, so calling
  * it between entries (nothing running) is safe and idempotent. It is
  * `private[sql]`, hence this accessor.
  */
object GraftStreamingInternals {
  /** Unload all state-store providers + stop the maintenance task. */
  def stopStateStores(): Unit =
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case scala.util.control.NonFatal(_) => () }
}
