package org.apache.spark.sql

import org.apache.spark.SparkContext
import org.apache.spark.sql.execution.LogicalRDD

/** Test-only accessors for `private[spark]` state, used to simulate
  * cluster failure modes inside local-mode specs.
  *
  *   - [[dropCheckpointBlocks]] removes a checkpointed frame's blocks
  *     from the block manager WITHOUT unpersisting the RDD — exactly
  *     the state an executor death leaves behind (storage level still
  *     set, blocks gone), which `rdd.unpersist` cannot reproduce (it
  *     resets the storage level too).
  *   - [[setCheckpointDir]] sets or CLEARS the context checkpoint dir
  *     (the public `SparkContext.setCheckpointDir` cannot clear it), so
  *     a spec can exercise the reliable-checkpoint mode and restore the
  *     shared session for the suites that follow. */
object GraftTestShim {

  /** Simulate executor loss for a localCheckpoint()ed Dataset: drop its
    * storage blocks from the block manager, keeping the RDD's storage
    * level (and the stale master metadata an executor death would
    * leave). No-op for non-checkpoint plans. */
  def dropCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        org.apache.spark.SparkEnv.get.blockManager.master
          .removeRdd(lr.rdd.id, blocking = true)
      case _ => ()
    }

  /** Set (Some) or clear (None) the context's checkpoint directory. */
  def setCheckpointDir(sc: SparkContext, dir: Option[String]): Unit =
    dir match {
      case Some(d) => sc.setCheckpointDir(d)
      case None => sc.checkpointDir = None
    }
}
