package org.apache.spark.sql

import org.apache.spark.sql.internal.{SortOrder => SortOrderNode}

/** Minimal accessor for `Column`'s internal node (`private[sql]` in
  * Spark 4): unwraps an explicit `.asc`/`.desc` into its child column +
  * direction, so graft's rank machinery can derive a numeric bucketing
  * lead from the FIRST order column of a caller-supplied sort. Columns
  * that are not sort orders pass through as ascending.
  *
  * The third element flags Spark's DEFAULT null placement (asc ⇒ NULLS
  * FIRST, desc ⇒ NULLS LAST) — the only placements the bucket rank's
  * dedicated null bucket reproduces. An explicit `asc_nulls_last` /
  * `desc_nulls_first` returns false so the caller can take a
  * null-ordering-faithful path instead of silently mis-ranking nulls. */
object GraftColumnShim {
  def unwrapSortOrder(c: Column): (Column, Boolean, Boolean) = c.node match {
    case so: SortOrderNode =>
      val asc = so.sortDirection == SortOrderNode.Ascending
      val defaultNulls =
        if (asc) so.nullOrdering == SortOrderNode.NullsFirst
        else so.nullOrdering == SortOrderNode.NullsLast
      (Column(so.child), asc, defaultNulls)
    case _ => (c, true, true)
  }

  /** Release the cached blocks behind a `localCheckpoint()`ed Dataset:
    * its analyzed plan is a `LogicalRDD` over the checkpointed
    * (persisted) RDD, so unpersist that RDD directly —
    * `Dataset.unpersist` only touches `CacheManager` entries and would
    * leave localCheckpoint blocks orphaned. Matches ONLY the plan ROOT
    * (the frame `localCheckpoint()` itself returned): walking the whole
    * plan would also free any still-shared UPSTREAM checkpoint a derived
    * frame happens to reference (e.g. a frame built on the cached q32
    * pairs spine), and localCheckpoint blocks are unrecoverable by
    * design. Callers therefore keep a handle to the checkpointed frame
    * itself, never a projection of it. No-op for other plans;
    * non-blocking. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }


  /** True iff every partition block behind a `localCheckpoint()`ed
    * Dataset is still reported by the block manager master. Local
    * checkpoint blocks are unrecoverable BY DESIGN — a lost executor
    * takes its partitions with it, and any consumer then fails with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND even though recompute is
    * possible. A service that MEMOIZES checkpointed frames must
    * therefore validate liveness at serve time and treat dead blocks as
    * a cache miss. Conservative: plans other than a checkpoint scan
    * return true (nothing to validate). */
  def checkpointBlocksLive(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val rdd = lr.rdd
        if (rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE) true
        else {
          val ids = (0 until rdd.getNumPartitions)
            .map(p => org.apache.spark.storage.RDDBlockId(rdd.id, p))
            .toArray[org.apache.spark.storage.BlockId]
          val master = org.apache.spark.SparkEnv.get.blockManager.master
          master.getLocations(ids).forall(_.nonEmpty)
        }
      case _ => true
    }

  /** Drain the async listener bus (`private[spark]`), so a metrics
    * listener's counters are complete before a caller snapshots them —
    * task-end events post asynchronously and can land AFTER the action
    * that produced them returns. Bounded wait; a saturated bus past the
    * timeout shows up as a torn snapshot, not a hang. */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long = 10000L): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
