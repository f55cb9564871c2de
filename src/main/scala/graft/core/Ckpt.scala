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

  /** Call-site syntax: `df.ckpt()` / `df.ckpt(eager = false)`. */
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(eager: Boolean = true): DataFrame = Ckpt(df, eager)
  }
}
