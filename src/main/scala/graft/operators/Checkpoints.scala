package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared checkpoint-storage helper for iterative operators: checkpoint
  * blocks are plain persisted RDDs, invisible to `Dataset.unpersist`, so
  * superseded per-round checkpoints must be released through the RDD that
  * backs them or they stay pinned for the life of the session. */
private[operators] object Checkpoints {
  /** Release the storage behind a `localCheckpoint`ed frame. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false))
}
