package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.GraftColumnShim.MemStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-tier scale measurement (dev tool): replays a [[GenScale]]
  * fixture through the streaming dedup twins in deterministic
  * micro-batches and records, PER BATCH, the input rows, wall ms, rows
  * emitted, and the state store's row/memory counters from the query
  * progress — the measured evidence behind the state-bound contracts
  * (SCALE.md streaming section). Scenarios:
  *
  *   - exact_watermark: [[graft.streaming.StreamOps.streamingDedup]]
  *     keyed on the text digest, event time advancing one minute per
  *     batch against a 2-minute watermark — state must RISE then DECAY
  *     as the watermark passes old keys (the bounded-state contract).
  *   - neardup_full / neardup_ttl: streamingNearDupCandidates with the
  *     full register vs a 2 s TTL with 3 s inter-batch quiet — the full
  *     register grows with distinct band keys, the TTL curve must bend
  *     as quiet keys are evicted (the duplication-horizon contract).
  *   - cdc_full / cdc_ttl: streamingCdcChunkCandidates, same contrast —
  *     the register is the distinct-chunk set unless TTL bounds it.
  *   - semantic_cells: streamingSemanticDedupCandidates(nlist = 64) —
  *     state must CAP at ≤ nlist rows however many vectors stream by.
  *
  * State store defaults to RocksDB (the production shape; the parity
  * specs restart from its checkpoints) — SPARK_GRAFT_STREAM_STORE=hdfs
  * selects the default provider for an A/B. Batches default to 10
  * (SPARK_GRAFT_STREAM_BATCHES); scenarios filter with
  * SPARK_GRAFT_STREAM_ONLY (substring).
  *
  * Usage: runMain graft.StreamLadder <fixtureDir> [outJsonlPath] */
object StreamLadder {

  /** One batch record, JSON-lined to stdout + the out file. */
  private final case class BatchRec(scenario: String, batch: Int,
      input: Long, ms: Long, emitted: Long, stateRows: Long,
      stateMem: Long, removed: Long) {
    def json: String =
      s"""{"scenario":"$scenario","batch":$batch,"input":$input,"ms":$ms,""" +
        s""""emitted":$emitted,"state_rows":$stateRows,"state_mem":$stateMem,""" +
        s""""removed":$removed}"""
  }

  /** SIGKILL one executor JVM — REAL failure injection for the cluster
    * rung (`destroyForcibly` = SIGKILL on Linux: no shutdown hooks, no
    * block-manager dereg courtesy — the state-store instances and
    * shuffle files on it are simply gone, exactly like a lost node).
    * Victim: the lowest-pid descendant process running
    * CoarseGrainedExecutorBackend (local-cluster executors are
    * grandchildren via the Worker, so the walk is over descendants,
    * not children). The standalone master relaunches a replacement;
    * the streaming query must rebuild that executor's RocksDB state
    * from the checkpoint snapshot + changelog and keep its output
    * contract. None on local[*] masters (no executor JVM exists). */
  private def killOneExecutor(): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val victims = ProcessHandle.current().descendants().iterator().asScala
      .filter(p => p.info().commandLine()
        .map[Boolean](_.contains("CoarseGrainedExecutorBackend"))
        .orElse(false))
      .toSeq.sortBy(_.pid())
    victims.headOption.map { p =>
      // a kill_event in the record is failure-injection EVIDENCE — it
      // must never describe a victim that survived. destroyForcibly
      // can return false (permission, pid race), and even a granted
      // SIGKILL is asynchronous: require the request to land, then
      // await actual termination, loudly.
      val requested = p.destroyForcibly()
      require(requested || !p.isAlive,
        s"SIGKILL request rejected for executor pid ${p.pid()}")
      try p.onExit().get(15, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException => sys.error(
          s"executor pid ${p.pid()} still alive 15 s after SIGKILL — " +
            "refusing to record a kill_event for a surviving victim")
      }
      p.pid()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamLadder <fixtureDir> [outJsonlPath]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "10").toInt
    // failure injection (cluster rung): before feeding batch K of each
    // scenario, SIGKILL one executor JVM. The scenario must still
    // complete with its emitted totals and state contracts intact —
    // that is the RocksDB+changelog restore claim, exercised against a
    // real executor death instead of the happy path.
    val killBatch = sys.env.get("SPARK_GRAFT_STREAM_KILL_BATCH").map(_.toInt)
    // the pacing every sink runs under (StreamOps.pacedTrigger — the
    // MANDATORY configuration for TTL'd twins); also the denominator of
    // each scenario's empty-batch bound
    val pacedIntervalMs = 500L
    val only = sys.env.get("SPARK_GRAFT_STREAM_ONLY")
    val store = sys.env.getOrElse("SPARK_GRAFT_STREAM_STORE", "rocksdb")
    // SPARK_GRAFT_STREAM_MASTER=local-cluster[2,16,4096] runs the ladder
    // across REAL executor JVMs (separate heaps, RPC'd state
    // checkpoints) — the cluster rung for the streaming tier; default
    // stays in-process
    val master = sys.env.getOrElse("SPARK_GRAFT_STREAM_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      // state-heavy shuffles: one state-store instance per partition, so
      // keep the partition count at the core count like the bench
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_CLASSES",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
    if (store == "rocksdb") {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        GraftColumnShim.rocksDBStateStoreProviderClass)
      // changelog checkpointing: upload per-batch DELTAS instead of
      // re-zipping full SST sets every micro-batch — the production
      // setting for high-frequency triggers
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the replay corpus, materialized once on the driver (this harness IS
    // the stream source; GenScale rows are small by construction)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toSeq.sortBy(_._1)
    val dims = vecs.head._2.length
    System.err.println(s"[stream-ladder] ${docs.size} docs, ${vecs.size} vecs ($dims dims), $nBatches batches, store=$store")

    val out = new StringBuilder
    def emit(r: BatchRec): Unit = { println(r.json); out.append(r.json).append('\n') }

    /** Snapshot (state rows, state mem, removed-this-batch) from the
      * last progress. */
    def stateOf(q: StreamingQuery): (Long, Long, Long) = {
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty) {
        val ops = p.stateOperators
        (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum,
          ops.map(_.numRowsRemoved).sum)
      } else (-1L, -1L, -1L)
    }

    /** Drive one scenario: chunk `rows` into micro-batches, snapshot the
      * query progress after each, pause `quietMs` between batches (lets
      * processing-time TTLs expire). `mkQuery` starts the stream against
      * a counting foreachBatch sink.
      *
      * Synchronization: `processAllAvailable` NEVER RETURNS for a query
      * with processing-time timeouts — the engine keeps
      * `shouldRunAnotherBatch` true forever so timers can fire, and the
      * no-new-data latch never sets (measured: the first harness run
      * parked there for 848 s while the paced trigger ran empty timer
      * sweeps). TTL scenarios (quietMs > 0) instead poll the query
      * progress until the source commits the offset `addData` returned;
      * a final SETTLE record (batch -1) after 3 quiet intervals captures
      * the post-expiry register. */
    def run[T](name: String, rows: Seq[T], quietMs: Long)
              (mkStream: () => MemStream[T],
               mkQuery: (MemStream[T], Long => Unit) => StreamingQuery): Unit = {
      if (!only.forall(name.contains)) return
      val mem = mkStream()
      val emitted = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = mkQuery(mem, n => { emitted.addAndGet(n); () })
      val chunk = math.max(1, (rows.size + nBatches - 1) / nBatches)
      def awaitOffset(off: org.apache.spark.sql.connector.read.streaming.Offset): Unit = {
        // MemoryStream offsets are LongOffsets whose json IS the number.
        // Parse them as such and FAIL LOUDLY on anything else — the
        // previous strip-non-digits parse would silently concatenate the
        // fields of a composite offset JSON into a nonsense number
        def parse(json: String): Long =
          try json.trim.toLong
          catch { case _: NumberFormatException => throw new IllegalStateException(
            s"$name: offset json '$json' is not a bare LongOffset — " +
              "the ladder's offset synchronization only understands MemoryStream") }
        val want = GraftColumnShim.longOffsetValue(off)
          .getOrElse(parse(off.json))
        val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
        var done = false
        while (!done && System.nanoTime < deadline) {
          val p = q.lastProgress
          done = p != null && p.sources.nonEmpty &&
            Option(p.sources(0).endOffset).exists(parse(_) >= want)
          if (!done) Thread.sleep(100)
        }
        require(done, s"$name: offset $want not committed within 120 s")
      }
      val tScenario0 = System.nanoTime()
      var i = 0
      var killed = false
      for (slice <- rows.grouped(chunk)) {
        if (i > 0 && quietMs > 0) Thread.sleep(quietMs)
        if (killBatch.contains(i) && !killed) {
          killOneExecutor() match {
            case Some(pid) =>
              killed = true
              val ev = s"""{"scenario":"$name","kill_event":true,"batch":$i,"pid":$pid}"""
              println(ev); out.append(ev).append('\n')
            case None =>
              // loud, not silent: a kill rung on a master with no
              // executor JVMs would otherwise record a happy-path run
              // as failure-injection evidence
              throw new IllegalStateException(
                s"$name: SPARK_GRAFT_STREAM_KILL_BATCH set but no " +
                  "CoarseGrainedExecutorBackend descendant found — " +
                  "is the master local-cluster?")
          }
        }
        val t0 = System.nanoTime()
        val off = mem.addData(slice)
        if (quietMs > 0) awaitOffset(off) else q.processAllAvailable()
        val ms = (System.nanoTime() - t0) / 1000000L
        val (sr, sm, rm) = stateOf(q)
        emit(BatchRec(name, i, slice.size.toLong, ms, emitted.get(), sr, sm, rm))
        i += 1
      }
      if (quietMs > 0) {
        // settle: let the paced trigger sweep the expired registers
        Thread.sleep(3 * quietMs)
        val (sr, sm, rm) = stateOf(q)
        emit(BatchRec(name, -1, 0L, 0L, emitted.get(), sr, sm, rm))
      }
      // EMPTY-BATCH BOUND (the free-run regression gate): with the paced
      // trigger, empty timeout sweeps tick at most once per interval, so
      // executed batches beyond the data batches are bounded by
      // wall/interval. A default-trigger regression here free-runs
      // (measured batch 2281 on a 10-batch replay) and fails this
      // require loudly instead of silently poisoning the curves.
      // MemoryStream drains all available rows per batch, so each
      // addData is one data batch.
      val wallMs = (System.nanoTime() - tScenario0) / 1000000L
      val totalBatches = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L)
      val emptyBatches = math.max(0L, totalBatches - i)
      val emptyBound = wallMs / pacedIntervalMs + 8 // slack: settle + startup
      val summary = s"""{"scenario":"$name","summary":true,""" +
        s""""wall_ms":$wallMs,"data_batches":$i,"total_batches":$totalBatches,""" +
        s""""empty_batches":$emptyBatches,"empty_bound":$emptyBound,""" +
        s""""rows":${rows.size},"emitted":${emitted.get()}}"""
      println(summary); out.append(summary).append('\n')
      require(emptyBatches <= emptyBound,
        s"$name: $emptyBatches empty batches > bound $emptyBound over " +
          s"$wallMs ms — is the sink trigger still paced?")
      q.stop()
    }

    def ckpt(): String = java.nio.file.Files
      .createTempDirectory("graft-stream-ladder").toString

    /** Start `ds` against a counting foreachBatch sink. The trigger is
      * PACED, not default: with processing-time timeouts registered the
      * default trigger free-runs EMPTY micro-batches back-to-back (the
      * first run measured batch 2281 where the replay feeds 10 — all 32
      * RocksDB stores re-checkpointing per empty batch, pure overhead
      * that would swamp the curves being measured). 500 ms pacing keeps
      * timeout sweeps firing through the inter-batch quiet windows at a
      * bounded rate. */
    def sink[T](ds: org.apache.spark.sql.Dataset[T], cnt: Long => Unit): StreamingQuery =
      ds.writeStream.outputMode("append")
        .trigger(graft.streaming.StreamOps.pacedTrigger(s"$pacedIntervalMs milliseconds"))
        .option("checkpointLocation", ckpt())
        .foreachBatch((d: org.apache.spark.sql.Dataset[T], _: Long) => cnt(d.count()))
        .start()

    import graft.streaming.StreamOps

    // exact dedup vs watermark: event time advances 1 min per batch via a
    // batch counter stamped at add time; keys older than the 2-min
    // watermark are evicted — the state curve must rise then plateau/decay
    val digests = docs.map { case (id, text) => (id, text.hashCode.toLong & 0x7fffffffL) }
    val chunkSz = math.max(1, (digests.size + nBatches - 1) / nBatches)
    val stamped = digests.zipWithIndex.map { case ((id, dg), ix) =>
      (id, dg, (ix / chunkSz).toLong * 60L) } // seconds offset per batch
    run[(Long, Long, Long)]("exact_watermark", stamped, 0L)(
      () => GraftColumnShim.memoryStream[(Long, Long, Long)](spark),
      (mem, cnt) => sink(StreamOps.streamingDedup(
        mem.toDF().toDF("doc_id", "digest", "off")
          .withColumn("ts", timestamp_seconds(col("off") + lit(1700000000L)))
          .drop("off"),
        Seq("digest"), "ts", "2 minutes"), cnt))

    run[(Long, String)]("neardup_full", docs, 0L)(
      () => GraftColumnShim.memoryStream[(Long, String)](spark),
      (mem, cnt) => sink(StreamOps.streamingNearDupCandidates(mem.toDS(), ttl = None), cnt))

    run[(Long, String)]("neardup_ttl", docs, 3000L)(
      () => GraftColumnShim.memoryStream[(Long, String)](spark),
      (mem, cnt) => sink(StreamOps.streamingNearDupCandidates(
        mem.toDS(), ttl = Some("2 seconds")), cnt))

    run[(Long, String)]("cdc_full", docs, 0L)(
      () => GraftColumnShim.memoryStream[(Long, String)](spark),
      (mem, cnt) => sink(StreamOps.streamingCdcChunkCandidates(mem.toDS(), ttl = None), cnt))

    run[(Long, String)]("cdc_ttl", docs, 3000L)(
      () => GraftColumnShim.memoryStream[(Long, String)](spark),
      (mem, cnt) => sink(StreamOps.streamingCdcChunkCandidates(
        mem.toDS(), ttl = Some("2 seconds")), cnt))

    run[(Long, Seq[Float])]("semantic_cells", vecs, 0L)(
      () => GraftColumnShim.memoryStream[(Long, Seq[Float])](spark),
      (mem, cnt) => sink(StreamOps.streamingSemanticDedupCandidates(
        mem.toDS(), nlist = 64, dims = dims), cnt))

    if (args.length > 1)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
