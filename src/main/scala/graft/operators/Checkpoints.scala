package graft.operators

import org.apache.spark.sql.DataFrame

/** Storage lifecycle for checkpoint-backed results.
  *
  * Iterative operators (`Graph.pageRank`, `KMeans.assign`,
  * `IncrementalDedup.processBatch`) return `localCheckpoint`-materialized
  * frames: the caller owns them, and `Dataset.unpersist` CANNOT release
  * them — checkpoint blocks are plain persisted RDDs with no CacheManager
  * entry, so unpersist on the Dataset is a silent no-op. Call
  * [[Checkpoints.release]] on such a result when done with it (the bench
  * does exactly this per entry); cache-`persist`ed results (the dedup pair
  * tables) keep using plain `unpersist()`.
  */
object Checkpoints {
  /** Release the storage behind a `localCheckpoint`ed frame. Safe on any
    * frame: non-checkpoint plans contain no `LogicalRDD` and nothing
    * happens. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false))
}
