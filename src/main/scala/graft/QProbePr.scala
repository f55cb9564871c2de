package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ckpt.CkptOps

/** Dev probe (r20): pageRank ROUND-LOOP variants, same JVM, interleaved
  * — the in-loop plan is internal to [[graft.operators.Graph]], so the
  * bench/Explain mains can only show the post-checkpoint scan. This
  * probe rebuilds q84's edge frame, runs the shared setup
  * (e/nodes/spine exactly as pageRankLong), then times N interleaved
  * executions of each round-loop variant and prints round-2's formatted
  * plan for each — the artifact the r19 verdict asked for
  * (plans/r20/q84_pagerank_round_*.txt).
  *
  * Variants:
  *   A "leftjoin"   — r19 shape: per-round nodes ⋈ contribs left join
  *   B "union"      — r20 shape: once-computed no-in-edge constant frame
  *                    unioned per round
  *   C "unionbc"    — B with an explicit broadcast hint on the ranks
  *                    side of the spine join (scale-UNSAFE — probe only:
  *                    quantifies what the planner loses when the union
  *                    leaf's unknown stats block the broadcast)
  */
object QProbePr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val iters = 5; val damping = 0.85
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // micro-check: does a checkpoint scan retain a recognizable
    // HashPartitioning (i.e. does a downstream same-key join skip the
    // exchange)? Tried eager + lazy, with AQE on.
    if (sys.env.contains("GRAFT_CKPT_CHECK")) {
      val base = spark.range(100000)
        .select(col("id").as("k"), (col("id") % 7).as("v"))
      for ((tag, eager) <- Seq(("eager", true), ("lazy", false))) {
        val ck = base.repartition(8, col("k")).localCheckpoint(eager)
        val other = spark.range(1000).select(col("id").as("k"))
        val j = ck.join(other.hint("SHUFFLE_HASH"), "k")
        println(s"===== ckpt-check $tag =====")
        j.explain("formatted")
      }
      spark.stop(); return
    }

    // q84's edge frame (QueriesStats.q84) — packed long ids
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("src"),
        (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))

    // shared setup, exactly pageRankLong's
    val e = sym.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().ckptSpill(false)
    val nodes = e.select(col("src").as("nid"))
      .union(e.select(col("dst").as("nid"))).distinct().ckpt(false)
    val n = nodes.count()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val parts = math.max(1,
      spark.sessionState.conf.numShufflePartitions)
    val spine = e.join(outDeg, "src").repartition(parts, col("src")).ckpt()
    val noInRanks = nodes
      .join(e.select(col("dst").as("nid")).distinct(), Seq("nid"), "left_anti")
      .select(col("nid").as("id"), lit((1.0 - damping) / n).as("rank"))
      .ckpt()

    def initRanks = nodes.select(col("nid").as("id"), lit(1.0 / n).as("rank"))

    def loopA(): DataFrame = {
      var ranks = initRanks
      for (_ <- 0 until iters) {
        val contribs = spine
          .join(ranks.select(col("id").as("src"), col("rank")), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(col("rank") / col("deg")).as("cin"))
        ranks = nodes.select(col("nid").as("id")).join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit((1.0 - damping) / n) +
              lit(damping) * coalesce(col("cin"), lit(0.0))).as("rank"))
      }
      ranks
    }

    def loopB(hint: String): DataFrame = {
      var ranks = initRanks
      for (_ <- 0 until iters) {
        val rSide0 = ranks.select(col("id").as("src"), col("rank"))
        val rSide = hint match {
          case "bc" => broadcast(rSide0)
          case "shj" => rSide0.hint("SHUFFLE_HASH")
          case _ => rSide0
        }
        ranks = spine
          .join(rSide, "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(col("rank") / col("deg")).as("cin"))
          .select(col("id"),
            (lit((1.0 - damping) / n) +
              lit(damping) * col("cin")).as("rank"))
          .unionByName(noInRanks)
      }
      ranks
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "leftjoin" -> (() => loopA()),
      "union" -> (() => loopB("")),
      "unionshj" -> (() => loopB("shj")),
      "unionbc" -> (() => loopB("bc")))

    if (sys.env.contains("GRAFT_PR_EXPLAIN")) {
      variants.foreach { case (name, mk) =>
        println(s"\n===== round-loop plan: $name (iters=$iters) =====")
        mk().explain("formatted")
      }
    }

    // interleaved timing: A,B,C,A,B,C,... noop-sink forced evaluation
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    variants.foreach { case (name, mk) => // untimed warm-up
      mk().write.format("noop").mode("overwrite").save(); times(name) = Nil }
    System.gc()
    for (_ <- 0 until rounds; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      times(name) = times(name) :+ (t1 - t0) / 1e9
    }
    variants.foreach { case (name, _) =>
      val t = times(name)
      println(f"""{"variant":"$name","runs":[${t.map(x => f"$x%.3f").mkString(",")}],"median":${t.sorted.apply(t.size / 2)}%.3f}""")
    }
    spark.stop()
  }
}
