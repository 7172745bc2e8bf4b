package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Block release for locally-checkpointed DataFrames. `localCheckpoint`
 * materializes at the RDD level (the plan becomes a `LogicalRDD` over
 * the persisted RDD), NOT through the SQL CacheManager — so
 * `Dataset.unpersist` is a silent no-op on it, and without this helper
 * an iterative operator's superseded checkpoints linger until the JVM
 * garbage-collects the RDD and the ContextCleaner notices. Lives in the
 * spark.sql package to reach `LogicalRDD` (the same arrangement as the
 * engine's native expressions).
 */
object CheckpointSupport {

  /** Unpersist the checkpoint RDD(s) beneath a locally-checkpointed
    * frame. No-op on frames that are not checkpoint-backed. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ =>
    }
}
