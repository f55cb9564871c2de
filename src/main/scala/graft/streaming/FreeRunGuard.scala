package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Hard guard against TTL'd streaming twins free-running under the
  * default trigger.
  *
  * A query with PROCESSING-TIME timeouts (the `ttl` option of
  * [[StreamOps.streamingNearDupCandidates]] /
  * [[StreamOps.streamingCdcChunkCandidates]] / [[StreamOps.streamingAsof]])
  * never latches "no new data": the engine keeps `shouldRunAnotherBatch`
  * true so timers can fire, and under the DEFAULT trigger
  * (`ProcessingTime(0)`) it re-runs empty micro-batches back-to-back —
  * measured: batch 2281 on a 10-batch replay, all 32 RocksDB stores
  * re-checkpointing per empty batch (SCALE.md §6). A paced trigger is
  * mandatory for these operators; this guard moves that mandate from
  * the docs into the API.
  *
  * Armed automatically (idempotent per session) by every TTL'd twin at
  * construction. Fires when a query accumulates
  * [[FreeRunGuard.threshold]] CONSECUTIVE empty batches while running
  * under an unpaced trigger — a paced query ticking empty through a
  * quiet period never fires (its trigger is interval > 0), and an
  * unpaced NON-timer query never free-runs empty batches in the first
  * place (the no-data latch holds), so the predicate is precise, not a
  * heuristic. On fire: one ERROR log naming the fix per query run;
  * `SPARK_GRAFT_FREERUN=stop` hard-stops the offending query instead
  * (from a separate thread — `stop()` joins the stream thread, which
  * may itself be posting to the listener bus); `SPARK_GRAFT_FREERUN=off`
  * disarms entirely. */
object FreeRunGuard extends org.apache.spark.internal.Logging {
  /** Consecutive unpaced empty batches before firing. Test hook; the
    * default (32) is ~10 s of free-running on the measured host, far
    * past any legitimate empty-batch burst (AvailableNow drain,
    * watermark flush). */
  @volatile private[graft] var threshold: Int = 32

  /** Fire action: "warn" (default) logs one ERROR per query run,
    * "stop" hard-stops the offending query, "off" disarms. Seeded from
    * SPARK_GRAFT_FREERUN; a var (not a raw env read) so the stop path
    * is spec-testable — env is frozen at JVM start. */
  @volatile private[graft] var mode: String =
    sys.env.getOrElse("SPARK_GRAFT_FREERUN", "warn")

  /** runId → consecutive empty batches (unpaced queries only). */
  private val empties = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Integer]()
  /** runIds already fired (one action per query run). */
  private val fired = java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
  // weak keys: arming must not PIN a session — a service that discards
  // sessions mid-application (newSession over a shared context) would
  // otherwise accrete them here for the life of the JVM. The listener
  // itself dies with the session's stream manager.
  private val armedSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private[graft] def firedCount: Int = fired.size()
  private[graft] def hasFired(runId: java.util.UUID): Boolean =
    fired.contains(runId)
  private[graft] def consecutiveEmpties(runId: java.util.UUID): Int =
    Option(empties.get(runId)).map(_.intValue).getOrElse(0)

  /** True iff the query runs under a trigger that free-runs on timer
    * batches: the default `ProcessingTime(0)`. Delegates to
    * [[org.apache.spark.sql.GraftColumnShim.unpacedTrigger]] — the
    * inspection touches `execution.streaming` internals, and every
    * such version-fragile reference lives in the one shim file. */
  private def unpaced(q: org.apache.spark.sql.streaming.StreamingQuery): Boolean =
    org.apache.spark.sql.GraftColumnShim.unpacedTrigger(q)

  /** Idempotent per session; called by the TTL'd twins at construction.
    * `reason` names the operator for the error message. */
  def arm(spark: SparkSession, reason: String): Unit = {
    if (mode == "off") return
    if (!armedSessions.add(spark)) return
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryIdle(
          e: StreamingQueryListener.QueryIdleEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
        empties.remove(e.runId); fired.remove(e.runId); ()
      }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) { empties.put(p.runId, 0); return }
        val q = try spark.streams.get(p.id) catch { case _: Throwable => null }
        if (q == null || !unpaced(q)) { empties.put(p.runId, 0); return }
        val n = Option(empties.get(p.runId)).map(_.intValue).getOrElse(0) + 1
        empties.put(p.runId, n)
        if (n >= threshold && fired.add(p.runId)) {
          val msg = s"graft streaming guard: query ${p.id} (run ${p.runId}) " +
            s"has executed $n consecutive EMPTY micro-batches under the " +
            "default (unpaced) trigger — a processing-time-TTL operator " +
            s"($reason) keeps the engine re-running batches so its timers " +
            "can fire, and every empty batch re-checkpoints every state " +
            "store. Set .trigger(Trigger.ProcessingTime(...)) on the " +
            "writeStream (see StreamOps.pacedTrigger). " +
            "SPARK_GRAFT_FREERUN=stop hard-stops instead; =off disarms."
          logError(msg)
          System.err.println(s"[graft] ERROR: $msg")
          if (mode == "stop") {
            val t = new Thread(() => {
              try q.stop() catch { case _: Throwable => () }
            }, s"graft-freerun-stop-${p.runId}")
            t.setDaemon(true)
            t.start()
          }
        }
      }
    })
  }
}
