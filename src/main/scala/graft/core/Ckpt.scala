package graft.core

import org.apache.spark.sql.DataFrame

/** Central lineage-bounding materialization for the iterative operators
  * (pageRank, connected components, semanticDedup refinement, BPE vocab
  * rounds, GD classifier rounds, the shared pair-spine memo).
  *
  * Mode is picked from the session, not a knob: when the context has a
  * checkpoint directory (`sc.setCheckpointDir(...)` — the standard
  * cluster deployment step for iterative Spark jobs), frames checkpoint
  * RELIABLY to it and survive executor loss; otherwise they
  * `localCheckpoint()` — faster (no DFS write), but the blocks live on
  * the executors that computed them and die with them BY DESIGN. The
  * multi-executor ladder rung measured exactly that failure: one
  * executor heap-OOMed mid-suite and every consumer of its blocks
  * failed with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (SCALE.md §5). At
  * 1000 executors, loss is routine — production deployments set the
  * checkpoint dir (and `spark.cleaner.referenceTracking.cleanCheckpoints`
  * to reap finished checkpoints); local[n] development keeps the fast
  * path, where executor loss cannot happen short of JVM death.
  *
  * [[org.apache.spark.sql.GraftColumnShim.unpersistCheckpoint]] stays
  * the matching release call for both modes (reliable-checkpoint scans
  * hold no storage blocks, so it degrades to a no-op). */
object Ckpt {
  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager)
    else df.localCheckpoint(eager)

  /** [[apply]], but a LOCAL checkpoint pins DISK_ONLY instead of
    * MEMORY_AND_DISK. For CORPUS-SIZED transients (e.g. pageRank's
    * deduplicated edge list): a memory-resident block that big evicts
    * its way through the storage pool and squeezes execution memory to
    * zero — the ×100 rung measured exactly that
    * (UNABLE_TO_ACQUIRE_MEMORY in the build aggregation on the 8 GB rig
    * with the default level, clean with DISK_ONLY). Reliable mode
    * already writes files, so the level is moot there. Compact
    * per-entity frames (dict, rank spine, outputs) stay on [[apply]] —
    * they are the blocks that SHOULD live in memory. */
  def spill(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager)
    else df.localCheckpoint(eager,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)

  /** Call-site syntax: `df.ckpt()` / `df.ckpt(eager = false)` /
    * `df.ckptSpill()`. */
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(eager: Boolean = true): DataFrame = Ckpt(df, eager)
    def ckptSpill(eager: Boolean = true): DataFrame = Ckpt.spill(df, eager)
  }
}
