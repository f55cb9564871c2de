package graft

import org.apache.spark.sql.SparkSession

/** Repeat-run EXECUTOR heap census for reliable-checkpoint mode
  * (SCALE.md §5 left it as "noted, not chased": the ×30 local-cluster
  * rung heap-OOM'd an executor on run 3-of-3 inside one JVM while a
  * single-shot run was clean — the long-lived-session leak class on
  * the executor side; the driver side was audited in r9).
  *
  * Runs the named queries N times each inside ONE JVM on
  * `local-cluster[2,16,4096]` (the §5 rig) with a checkpoint dir set
  * (reliable mode — the regime that OOM'd), recording after every run:
  *
  *   - per-executor peak JVM heap since the previous run (executor
  *     metrics ride heartbeats and stage completions);
  *   - per-executor block-manager storage in use (accreted cache
  *     blocks show up here);
  *   - driver persistent-RDD count (leaked handles pin blocks);
  *   - checkpoint-dir file count + bytes (reaping evidence: eager
  *     release + cleanCheckpoints should keep this flat);
  *   - driver heap in use after a System.gc().
  *
  * Output: one JSON line per (query, run) to args(1). Flat curves close
  * the §5 note; a rising one names the accretor's layer.
  *
  * Usage: `tools/run_main.sh graft.HeapCensus scaledata/x30 out.jsonl`
  * with SPARK_GRAFT_CENSUS_RUNS (default 4) and
  * SPARK_GRAFT_CENSUS_ONLY (default q84_pagerank,q86_semantic_dedup). */
object HeapCensus {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: HeapCensus <fixtureDir> <out.jsonl>")
    val dir = args(0)
    val outPath = java.nio.file.Paths.get(args(1))
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_CENSUS_RUNS", "4").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_CENSUS_ONLY",
      "q84_pagerank,q86_semantic_dedup").split(',').map(_.trim).filter(_.nonEmpty)
    val master = sys.env.getOrElse("SPARK_GRAFT_CENSUS_MASTER",
      "local-cluster[2,16,4096]")

    val ckptDir = java.nio.file.Files.createTempDirectory("graft-census-ckpt")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.codingErrorAction", "true")
      .config("spark.ui.enabled", "false")
      // the §5 rig: executors are fresh JVMs — ship the graft classes
      .config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_CLASSES",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
      // faster heartbeats so per-run executor-metric peaks have samples
      .config("spark.executor.heartbeatInterval", "2s")
      .config("spark.executor.metrics.pollingInterval", "1s")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    // default executor heap is 1 GB regardless of worker memory (the
    // §5 units correction); set this to make the rig mean what the
    // worker-memory figure says, e.g. SPARK_GRAFT_EXECUTOR_MEM=4g
    sys.env.get("SPARK_GRAFT_EXECUTOR_MEM")
      .foreach(m => builder.config("spark.executor.memory", m))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    graft.functions.GraftFunctions.register(spark)

    val peaks = new CensusMetrics
    spark.sparkContext.addSparkListener(peaks)

    def ckptInventory(): (Long, Long) = {
      var files = 0L; var bytes = 0L
      val s = java.nio.file.Files.walk(ckptDir)
      try s.forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) {
          files += 1; bytes += java.nio.file.Files.size(p)
        }
      } finally s.close()
      (files, bytes)
    }
    def executorStorage(): Map[String, Long] =
      spark.sparkContext.getExecutorMemoryStatus.map { case (addr, (max, rem)) =>
        addr -> (max - rem)
      }.toMap

    // fresh file per census (append-mode below would otherwise mix runs)
    java.nio.file.Files.deleteIfExists(outPath)
    // the census exists to chase crashes: every record is APPENDED to
    // the output file as it is produced (the tail-bounded stdout mirror
    // cannot be the durable copy), so a mid-census OOM loses nothing
    def appendOut(line: String): Unit =
      java.nio.file.Files.write(outPath, (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    def record(query: String, run: Int, wallSec: Double, rows: Long): Unit = {
      System.gc()
      Thread.sleep(3000) // let a heartbeat carry post-gc executor metrics
      org.apache.spark.sql.GraftColumnShim.drainListenerBus(spark)
      val heaps = peaks.peakHeaps()
      val storage = executorStorage()
      val (ckFiles, ckBytes) = ckptInventory()
      val rt = Runtime.getRuntime
      val driverUsed = rt.totalMemory() - rt.freeMemory()
      def m(mp: Map[String, Long]): String = mp.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
      val line = s"""{"query":"$query","run":$run,"sec":${f"$wallSec%.1f"},""" +
        s""""rows":$rows,"peak_heap":${m(heaps)},"storage_used":${m(storage)},""" +
        s""""persistent_rdds":${spark.sparkContext.getPersistentRDDs.size},""" +
        s""""ckpt_files":$ckFiles,"ckpt_bytes":$ckBytes,""" +
        s""""driver_heap":$driverUsed}"""
      appendOut(line)
      println(s"[census] $line")
      peaks.reset()
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (r <- 1 to runsPer) {
        val t0 = System.nanoTime()
        val rows = try fn(spark, dir).count() catch {
          case e: Throwable =>
            System.err.println(s"[census] $name run $r FAILED: $e")
            -1L
        }
        record(name, r, (System.nanoTime() - t0) / 1e9, rows)
      }
    }
    spark.stop()
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(ckptDir.toFile)
  }
}

/** Tracks peak JVMHeapMemory per executor since the last [[reset]] —
  * fed by heartbeat executor-metric updates and stage-completion
  * peaks (both carry ExecutorMetrics). */
final class CensusMetrics extends org.apache.spark.scheduler.SparkListener {
  private val peaks = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def bump(execId: String, v: Long): Unit = {
    peaks.merge(execId, v, (a, b) => math.max(a, b)); ()
  }
  def peakHeaps(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    peaks.asScala.map { case (k, v) => k -> v.longValue }.toMap
  }
  def reset(): Unit = peaks.clear()
  override def onExecutorMetricsUpdate(
      e: org.apache.spark.scheduler.SparkListenerExecutorMetricsUpdate): Unit =
    e.executorUpdates.foreach { case (_, metrics) =>
      bump(e.execId, metrics.getMetricValue("JVMHeapMemory"))
    }
  override def onStageExecutorMetrics(
      e: org.apache.spark.scheduler.SparkListenerStageExecutorMetrics): Unit =
    bump(e.execId, e.executorMetrics.getMetricValue("JVMHeapMemory"))
}
