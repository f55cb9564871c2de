package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ladder measurement main (dev tool): times the dedup/ANN/graph
  * cost centers on ONE [[GenScale]] fixture dir and emits a JSON line,
  * so exponents can be fitted across ×1/×3/×10 (SCALE.md). Protocol
  * matches Bench — one untimed warm-up, median of `runs` timed runs,
  * one JVM per dir (no cross-scale cache bleed).
  *
  * Beyond the 8 bench queries (run with their EXACT bench knobs — fixed
  * nlist/caps/thresholds, so the ladder measures what the bench
  * measures), three scale-path variants:
  *
  *   - q86_scaled_nlist: SemDeDup with nlist grown ∝ corpus (cells stay
  *     ~500 vectors) — the 100 TB configuration, vs q86's oracle-pinned
  *     nlist=4 whose cells grow with N and the within-cell verify with
  *     them (quadratic by construction).
  *   - q32_natural / q105_natural: MinHash-LSH and SimHash on the
  *     natural-vocab corpus (fingerprint entropy grows with N, bucket
  *     sizes stay O(1)) vs the closed-vocab corpus where buckets — and
  *     the verified-pair OUTPUT — grow with N.
  *
  * A query whose warm-up exceeds SPARK_GRAFT_LADDER_MAXSEC (default
  * 600) records that single time flagged `"capped":true` and skips its
  * timed runs — a blow-up at ×10 is itself the measurement.
  *
  * Usage: runMain graft.ScaleLadder <fixtureDir> [outJsonPath] */
object ScaleLadder {

  private val benchNames = Seq(
    "q31_dedup_exact", "q32_minhash_pairs", "q65_neardup_clusters",
    "q84_pagerank", "q86_semantic_dedup", "q96_cross_dedup",
    "q102_cdc_dedup", "q105_simhash_pairs",
    // round-12 widening: every other LLM-pipeline cost center whose
    // inputs GenScale reproduces (documents/embeddings only)
    "q40_embedding_neardup", "q45_pipeline", "q55_contamination",
    "q66_token_budget_mix", "q82_heavy_hitters", "q88_bpe_encode",
    "q91_quality_classifier", "q98_tfidf", "q99_canonical_survivors")

  private def extras: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_scaled_nlist" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val nlist = math.max(4, (n / 500).toInt)
      // refineTarget = None pinned: this row IS the measured cap-plateau
      // counterfactual the refined default replaces (SCALE.md §3.2)
      graft.operators.Similarity.semanticDedup(emb, "vec_id", "embedding",
        nlist = nlist, threshold = 0.4, maxCellSize = Some(4096),
        refineTarget = None)
    }),
    "q86_scaled_tight_cap" -> ((s, dir) => {
      // the cap-plateau probe: GenScale embeddings have ~10 intrinsic
      // label clusters, and a pseudo-centroid (direction-argmax)
      // partitioner cannot split a tight cluster — so cells bottom out
      // at the cluster mass whatever nlist is, and the within-cell
      // verify is quadratic in that mass UNTIL maxCellSize binds. With
      // a cap that binds at every rung (1024 < cluster mass from x3 on),
      // per-cell cost is C(cap,2) and the total tracks occupied cells —
      // the curve must flatten where the 4096-cap variant still grows.
      graft.functions.GraftFunctions.register(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val nlist = math.max(4, (n / 500).toInt)
      graft.operators.Similarity.semanticDedup(emb, "vec_id", "embedding",
        nlist = nlist, threshold = 0.4, maxCellSize = Some(1024),
        refineTarget = None)
    }),
    "q86_scaled_refined" -> ((s, dir) => {
      // the round-12 scale configuration: nlist ∝ corpus AND oversized
      // cells (intrinsic clusters the pseudo-centroids cannot split)
      // recursively peeled by data-dependent Voronoi pivots with star
      // edges — bounded per-cell cost like the tight cap, but EVERY row
      // keeps deduping instead of only the cap's elected ids
      graft.functions.GraftFunctions.register(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val nlist = math.max(4, (n / 500).toInt)
      graft.operators.Similarity.semanticDedup(emb, "vec_id", "embedding",
        nlist = nlist, threshold = 0.4, maxCellSize = Some(4096),
        refineTarget = Some(1024))
    }),
    "q32_natural" -> ((s, dir) =>
      graft.operators.Dedup.minhashNearDups(
        s.read.parquet(s"$dir/documents_nat.parquet"), "doc_id", "text",
        shingleWidth = 3, numHashes = 12, bands = 4, threshold = 0.2,
        maxBucketSize = Some(64))),
    "q105_natural" -> ((s, dir) =>
      // bits = 16 pinned: this row IS the measured Θ(N²/64) counter-
      // factual the 64-bit default replaces (SCALE.md §3.3)
      graft.operators.Dedup.simhashNearDups(
        s.read.parquet(s"$dir/documents_nat.parquet"), "doc_id", "text",
        maxHamming = 2, maxBucketSize = Some(4096), bits = 16)),
    "q105_natural64" -> ((s, dir) =>
      // the bits = 64 scale path: ~21-bit band keys instead of ~5-bit,
      // so bucket occupancy — and the Θ(N²/64) 16-bit pair volume —
      // collapses to the corpus's true near-dup density
      graft.operators.Dedup.simhashNearDups(
        s.read.parquet(s"$dir/documents_nat.parquet"), "doc_id", "text",
        maxHamming = 2, maxBucketSize = Some(4096), bits = 64)))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleLadder <fixtureDir> [outJsonPath]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // the median index s(s.length/2) needs at least one timed run; 0
    // would fail later with a bare IndexOutOfBounds on an empty buffer
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    val maxSec = sys.env.getOrElse("SPARK_GRAFT_LADDER_MAXSEC", "600").toDouble
    val only = sys.env.get("SPARK_GRAFT_LADDER_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // independent of cpus: big rungs need more (smaller) shuffle
    // partitions exactly as a real cluster sizes them — x100's 60M-edge
    // pagerank OOMs the per-partition hash agg at 32 partitions on the
    // 8 GB rig, and runs clean at 256
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // SPARK_GRAFT_MASTER overrides local[cpus] — the multi-executor rung
    // (SCALE.md §5) runs `local-cluster[2,16,4096]`: 2 separate executor
    // JVMs, so closures/rows cross a real serialization boundary and
    // broadcasts hit real executor memory instead of driver-shared heap
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // local-cluster executors are fresh JVMs launched from SPARK_HOME —
    // they need the graft classes on their classpath explicitly
    if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_CLASSES",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
    // ContextCleaner reads this once at construction — it cannot be set
    // after getOrCreate. Backstop for GC-released checkpoint frames;
    // graft's own release calls reap their checkpoint dirs eagerly
    builder.config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CKPT_DIR switches graft.core.Ckpt to RELIABLE
    // checkpoints (survive executor loss) — the cluster deployment mode;
    // unset keeps localCheckpoint (single-JVM speed). Graft's own
    // release calls (GraftColumnShim.unpersistCheckpoint) reap their
    // rdd-<id> checkpoint dirs eagerly; cleanCheckpoints (set on the
    // builder above) backstops frames released only by GC — production
    // deployments should set both, else finished checkpoints accrete on
    // the DFS until application end
    sys.env.get("SPARK_GRAFT_CKPT_DIR").foreach(
      spark.sparkContext.setCheckpointDir)
    graft.functions.GraftFunctions.register(spark)

    val all: Seq[(String, (SparkSession, String) => DataFrame)] =
      benchNames.map(n => n -> SparkEntry.queries(n)) ++ extras.toSeq
    val results = all
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        System.gc()
        // a throw anywhere (warm-up or timed) marks the query FAILED —
        // its fast-fail elapsed time must never enter an exponent fit
        var failed = false
        // result-row count from the last successful run: the OUTPUT
        // VOLUME curve is the evidence behind density claims (q105's
        // 16- vs 64-bit pair counts), not just the wall-time curve
        var rows = -1L
        def once(): Double = {
          val t0 = System.nanoTime()
          try { rows = fn(spark, dir).count() } catch { case e: Throwable =>
            failed = true
            System.err.println(s"[ladder] $name failed: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        val warm = once()
        if (failed) name -> (warm, -1L, false, true)
        else if (warm > maxSec) {
          System.err.println(f"[ladder] $name warm-up $warm%.1f s > $maxSec — capped")
          name -> (warm, rows, true, false)
        } else {
          // on a mid-timing failure, short-circuit: the fail-run's
          // fast-fail time must not enter the median and the stale `rows`
          // from the last good run must not ride next to it — emit a
          // self-consistent (fail time, rows = -1, failed) record
          val times = collection.mutable.ArrayBuffer[Double]()
          var i = 0
          while (i < runs && !failed) { times += once(); i += 1 }
          if (failed) name -> (times.last, -1L, false, true)
          else {
            val s = times.sorted
            name -> (s(s.length / 2), rows, false, false)
          }
        }
      }
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (v, rows, capped, failed)) =>
      s"\"$k\":{\"sec\":${fmt(v)},\"rows\":$rows,\"capped\":$capped,\"failed\":$failed}"
    }.mkString("{", ",", "}")
    val line = s"""{"dir":"$dir","runs":$runs,"queries":$qs}"""
    if (args.length > 1)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        (line + "\n").getBytes("UTF-8"))
    spark.stop()
    println(line)
  }
}
