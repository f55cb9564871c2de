package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Ckpt.CkptOps

/** Link-graph analytics for corpus curation. Web-scale training-data
  * pipelines weight documents by graph centrality (harmonic/PageRank over
  * the hyperlink graph is the canonical crawl-quality prior); the same
  * primitive ranks entities in any derived relation graph.
  */
object Graph {

  /** PageRank over a directed edge list, fixed iteration count.
    *
    * r_{i+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_i(u) / outdeg(u)
    *
    * This is the "leaky" formulation: mass flowing from dangling nodes
    * (no out-edges) is dropped, not redistributed — symmetrize the edge
    * list first (as the undirected-graph callers do) if every node must
    * keep out-degree ≥ 1. Deterministic: no RNG, fixed `iters`.
    *
    * 100 TB shape: the edge list is deduplicated and joined with its
    * out-degrees ONCE, then localCheckpoint-ed — it re-enters every
    * round's join with bounded lineage and AQE re-plans each round on
    * real propagated sizes (same discipline as
    * [[Dedup.connectedComponentsWithStats]]). Each round is exactly one
    * shuffle join (ranks meet edges on src) plus one partial-aggregated
    * groupBy (contributions meet on dst) — never an all-pairs form, and
    * per-round state is one (node, rank) row per node. The only driver
    * scalar is N (node count — free, counted off the already-checkpointed
    * node blocks). Hub nodes (a page every doc links to) produce a
    * skewed dst groupBy — partial aggregation bounds it at one row per
    * (dst × task).
    *
    * Unlike connected components (unbounded rounds, per-round
    * convergence probe), the iteration count here is FIXED, so rounds
    * chain LAZILY into one job and only checkpoint every
    * `checkpointEvery` rounds — shallow runs (iters < checkpointEvery)
    * execute as a single action with no per-round driver round-trips,
    * while deep runs keep lineage (and optimizer time) bounded.
    *
    * Returns (id, rank) for every node appearing in any edge. */
  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iters: Int = 5,
               damping: Double = 0.85, checkpointEvery: Int = 7): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    // INTEGRAL-ID FAST PATH: when both endpoint columns are already
    // integer-typed, the dense-long relabel below is pure overhead — the
    // ids ARE compact spine keys. Skipping it removes, per run: the
    // dictionary build (a distinct + eager checkpoint job), TWO
    // relabel joins that each shuffle the whole edge list on STRING
    // keys, and the final label-back join — and every remaining shuffle
    // carries 8-byte longs instead of strings (narrower types + removed
    // shuffles; before/after numbers in OPTIMIZATION_r19.md).
    val integral = {
      import org.apache.spark.sql.types._
      def ok(n: String) = edges.schema(n).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      ok(srcCol) && ok(dstCol)
    }
    if (integral) return pageRankLong(edges, srcCol, dstCol, iters,
      damping, checkpointEvery)
    // ONE eager materialization of the caller's upstream: dict and spine
    // both read the deduplicated edge list, and without this checkpoint
    // each build job recomputes the whole upstream subtree (for q84 that
    // is an orders⋈lineitem join — measured 2-3 recomputes costing more
    // than the 5 rank rounds themselves). ckptSpill = DISK_ONLY when
    // local: a corpus-sized string block in the memory pool squeezed
    // execution memory to zero at ×100 on the 8 GB rig
    // (UNABLE_TO_ACQUIRE_MEMORY in the build aggregation) — on disk it
    // is read twice and competes with nothing. Freed with the other
    // working blocks below; the per-ROUND state stays on the compact
    // dense-long spine regardless (SCALE.md §3.5).
    val eStr = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .distinct()
      .ckptSpill()
    // RELABEL to dense longs before iterating — the standard engine move
    // (GraphX, GraphFrames, every native graph engine run on integer
    // vertex ids). The spine re-enters every round's join and lives in
    // block storage for the whole run; carrying the caller's string ids
    // through it costs ~3-4× the memory of two longs (measured: the ×100
    // ladder rung, 120M symmetrized edges, OOMed the 8 GB rig's
    // aggregates under a ~12 GB deserialized string spine and thrashed
    // at 24 GB; the long spine is ~3.8 GB). monotonically_increasing_id
    // is partition-dependent, so the dictionary is FROZEN by an eager-
    // via-count localCheckpoint before anything reads it — downstream
    // determinism comes from the materialized blocks, and the public
    // output maps back to the caller's ids regardless.
    val dict = eStr.select(col("src").as("name"))
      .union(eStr.select(col("dst").as("name")))
      .distinct()
      .select(col("name"), monotonically_increasing_id().as("nid"))
      .ckpt(false)
    val n = dict.count() // materializes dict; one driver scalar, not data
    val e = eStr
      .join(dict.select(col("name").as("src"), col("nid").as("srcId")), "src")
      .join(dict.select(col("name").as("dst"), col("nid").as("dstId")), "dst")
      .select(col("srcId").as("src"), col("dstId").as("dst"))
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg) long-keyed spine — reused by every round's join
    val spine = e.join(outDeg, "src").ckpt()
    var ranks = dict.select(col("nid").as("id"), lit(1.0 / n).as("rank"))
    val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (round <- 0 until iters) {
      val contribs = spine
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("deg")).as("cin"))
      ranks = dict.select(col("nid").as("id")).join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("cin"), lit(0.0))).as("rank"))
      // periodic eager checkpoint: deep iteration counts keep lineage
      // and planning time bounded; shallow runs stay one lazy chain
      // into the final checkpoint below
      if ((round + 1) % checkpointEvery == 0 && round + 1 < iters) {
        ranks = ranks.ckpt()
        intermediates += ranks
      }
    }
    // ONE eager checkpoint of the (node, rank)-sized result — mapped
    // back to the CALLER's node ids — then free every working block:
    // dict, spine, periodic round checkpoints. Without this the
    // returned lazy chain re-runs all `iters` joins on EVERY caller
    // action, and the working blocks stay pinned for the session (the
    // long-lived-session leak class: a hundred queries of leaked spines
    // eventually evict each other into disk thrash).
    val out = ranks.join(dict, ranks("id") === dict("nid"))
      .select(col("name").as("id"), col("rank"))
      .ckpt()
    (Seq(eStr, dict, spine) ++ intermediates).foreach(
      org.apache.spark.sql.GraftColumnShim.unpersistCheckpoint)
    out
  }

  /** [[pageRank]] for integer-typed endpoint ids — identical rank
    * arithmetic, no relabel. The node frame replaces the dictionary (it
    * seeds the per-round left join that re-attaches in-neighborless
    * nodes), and the (src, dst, deg) spine is EXPLICITLY hash-partitioned
    * on `src` before its checkpoint: localCheckpoint preserves output
    * partitioning, so every round's ranks⋈spine join reuses the spine's
    * exchange and each round pays exactly ONE data shuffle — the
    * contribution groupBy on dst (one-exchange-per-round; the same
    * share-the-exchange move as guide §2.4). Without the explicit
    * repartition the spine's layout depends on how AQE planned the
    * outDeg join (broadcast at small scale), and every round re-shuffles
    * the edge list. */
  private def pageRankLong(edges: DataFrame, srcCol: String, dstCol: String,
                           iters: Int, damping: Double,
                           checkpointEvery: Int): DataFrame = {
    // LAZY checkpoints, materialized by the two actions that already
    // exist (nodes.count here, the output checkpoint below): the eager
    // form ran one driver job per checkpoint — three extra job
    // round-trips whose scheduling cost rivals the rank rounds at
    // bench scale. Blocks still bound lineage exactly as before; the
    // unpersists at the end run strictly after materialization.
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .ckptSpill(false)
    val nodes = e.select(col("src").as("nid"))
      .union(e.select(col("dst").as("nid")))
      .distinct()
      .ckpt(false)
    val n = nodes.count() // materializes e + nodes; one driver scalar
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val parts = math.max(1,
      edges.sparkSession.sessionState.conf.numShufflePartitions)
    val spine = e.join(outDeg, "src").repartition(parts, col("src"))
      .ckpt(false) // materialized inside the output job's first round
    var ranks = nodes.select(col("nid").as("id"), lit(1.0 / n).as("rank"))
    val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (round <- 0 until iters) {
      val contribs = spine
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("deg")).as("cin"))
      ranks = nodes.select(col("nid").as("id")).join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("cin"), lit(0.0))).as("rank"))
      if ((round + 1) % checkpointEvery == 0 && round + 1 < iters) {
        ranks = ranks.ckpt()
        intermediates += ranks
      }
    }
    val out = ranks.ckpt()
    (Seq(e, nodes, spine) ++ intermediates).foreach(
      org.apache.spark.sql.GraftColumnShim.unpersistCheckpoint)
    out
  }
}
