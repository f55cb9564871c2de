package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's /proc parsers feed the per-run host-vs-self CPU
  * attribution that adjudicates graded-vs-builder timing excursions —
  * a silently wrong field index would mis-name the cause. Pinned
  * against realistic lines, including the adversarial comm cases. */
class BenchParseSpec extends AnyFunSuite {

  test("self-stat parse: utime+stime after the LAST ')' of comm") {
    // fields: pid (comm) state ppid pgrp sess tty tpgid flags minflt
    // cminflt majflt cmajflt utime stime ...  → utime=100, stime=23
    val plain = "1234 (java) S 1 1 1 0 -1 4194560 9000 0 12 0 100 23 5 2 20 0 64 0 12345 999 888 18446744073709551615"
    assert(Bench.parseSelfStatMs(plain) == 1230L)
    // comm may contain spaces AND parens — field counting from the
    // left would shift every index
    val evil = "77 (my (weird) proc) R 1 1 1 0 -1 0 0 0 0 0 7 3 0 0 20 0 1 0 1 1 1 1"
    assert(Bench.parseSelfStatMs(evil) == 100L)
  }

  test("self-stat parse: utime/stime SPLIT and fault counters") {
    // same line as above: minflt=9000 (remainder idx 7), majflt=12
    // (idx 9), utime=100, stime=23 — the split is what lets the diag
    // say whether CPU inflation was user compute or kernel work
    val plain = "1234 (java) S 1 1 1 0 -1 4194560 9000 0 12 0 100 23 5 2 20 0 64 0 12345 999 888 18446744073709551615"
    val s = Bench.parseSelfStat(plain)
    assert(s == Bench.SelfStat(1000L, 230L, 9000L, 12L))
  }

  test("cgroup cpu.stat parse: v1 (ns) and v2 (usec) layouts") {
    // v1: throttled_time is NANOSECONDS
    val v1 = "nr_periods 84\nnr_throttled 7\nthrottled_time 2500000000\nnr_bursts 0\nburst_time 0"
    assert(Bench.parseCgroupCpuStat(v1) == ((7L, 2500L)))
    // v2: throttled_usec is MICROSECONDS, extra keys ignored
    val v2 = "usage_usec 100\nuser_usec 60\nsystem_usec 40\nnr_periods 10\nnr_throttled 3\nthrottled_usec 1500000\nnr_bursts 0"
    assert(Bench.parseCgroupCpuStat(v2) == ((3L, 1500L)))
    // no throttle keys at all (root v2 without cpu controller) → (-1,-1)
    assert(Bench.parseCgroupCpuStat("usage_usec 5\nuser_usec 3") == ((-1L, -1L)))
  }

  test("PSI parse: 'some' stall total in ms; absent line → -1") {
    val psi = "some avg10=0.00 avg60=0.06 avg300=0.15 total=1301020\n" +
      "full avg10=0.00 avg60=0.00 avg300=0.00 total=12"
    assert(Bench.parsePsiSomeTotalMs(psi) == 1301L)
    assert(Bench.parsePsiSomeTotalMs("") == -1L)
  }

  test("ctxt-switch parse: voluntary/nonvoluntary keys; absent → -1") {
    val status = "Name:\tjava\nState:\tS (sleeping)\nThreads:\t300\n" +
      "voluntary_ctxt_switches:\t123456\nnonvoluntary_ctxt_switches:\t789\n"
    assert(Bench.parseCtxtSwitches(status) == ((123456L, 789L)))
    // a kernel that exposes neither key (or a truncated read) must not
    // masquerade as "zero switches"
    assert(Bench.parseCtxtSwitches("Name:\tjava\nThreads:\t3\n") == ((-1L, -1L)))
  }

  test("vmstat THP parse: fault/collapse counters; absent → -1") {
    val vmstat = "nr_free_pages 100\nthp_fault_alloc 4211\n" +
      "thp_fault_fallback 2\nthp_collapse_alloc 57\nthp_collapse_alloc_failed 0\n"
    assert(Bench.parseVmstatThp(vmstat) == ((4211L, 57L)))
    assert(Bench.parseVmstatThp("nr_free_pages 100") == ((-1L, -1L)))
  }

  test("THP enabled parse: bracketed mode; malformed → unknown") {
    assert(Bench.parseThpEnabled("always [madvise] never") == "madvise")
    assert(Bench.parseThpEnabled("[always] madvise never") == "always")
    assert(Bench.parseThpEnabled("garbage") == "unknown")
  }

  test("schedstat parse: run-delay is field 2 (ns); malformed → -1") {
    assert(Bench.parseSchedstatDelayNs("203894 4567000 2") == 4567000L)
    assert(Bench.parseSchedstatDelayNs("garbage") == -1L)
    assert(Bench.parseSchedstatDelayNs("42") == -1L)
  }

  test("interrupts parse: labeled row summed across CPUs; absent → -1") {
    val text = "           CPU0       CPU1       CPU2\n" +
      "  0:         36          0          0   IO-APIC    2-edge      timer\n" +
      "RES:      60617      62256      62544   Rescheduling interrupts\n" +
      "TLB:        100        200        300   TLB shootdowns\n"
    assert(Bench.parseInterruptsRow(text, "TLB") == 600L)
    assert(Bench.parseInterruptsRow(text, "RES") == 185417L)
    // the trailing description must not be summed; a missing row is -1
    assert(Bench.parseInterruptsRow(text, "CAL") == -1L)
  }

  test("self-io parse: syscr + syscw; either key absent → -1") {
    val io = "rchar: 100\nwchar: 200\nsyscr: 1500\nsyscw: 500\n" +
      "read_bytes: 4096\nwrite_bytes: 8192\ncancelled_write_bytes: 0\n"
    assert(Bench.parseSelfIoSyscalls(io) == 2000L)
    assert(Bench.parseSelfIoSyscalls("rchar: 100\nsyscr: 5") == -1L)
  }

  test("probe gate: flags spin > 2x cal or fault > 3x cal, with guards") {
    // clean window: both probes at calibration
    assert(!Bench.probeContaminated(80.0, 80.0, 8.0, 8.0))
    // q74's r15 graded signature: spin 456 ms vs 79.5 ms cal (5.7x)
    assert(Bench.probeContaminated(456.0, 79.5, 8.0, 8.0))
    // cold-memory phase: fault probe 200 ms vs 8 ms warm floor
    assert(Bench.probeContaminated(80.0, 80.0, 200.0, 8.0))
    // just under both thresholds: clean
    assert(!Bench.probeContaminated(159.0, 80.0, 23.0, 8.0))
    // tiny fault cal: the 25 ms absolute floor keeps healthy jitter
    // (3x a 2 ms floor = 6 ms) from flagging
    assert(!Bench.probeContaminated(80.0, 80.0, 20.0, 2.0))
    assert(Bench.probeContaminated(80.0, 80.0, 26.0, 2.0))
    // failed calibration (<= 0) disables that axis, never flags
    assert(!Bench.probeContaminated(456.0, -1.0, 8.0, 8.0))
    assert(!Bench.probeContaminated(80.0, 80.0, 500.0, 0.0))
  }

  test("run-disturbance flag: host-self > max(2s, self/4); -1 never flags") {
    // idle box: host == self
    assert(!Bench.runDisturbed(50000, 50000))
    // heavy query, small absolute foreign CPU: relative arm holds it
    assert(!Bench.runDisturbed(52000, 50000))
    // the r14 induced-load signature: host-self ~ 150 s on a 50 s run
    assert(Bench.runDisturbed(200000, 50000))
    // sub-second query, jiffy rounding: absolute arm holds it
    assert(!Bench.runDisturbed(2300, 500))
    // sub-second query, real foreign burst
    assert(Bench.runDisturbed(3000, 500))
    // unmeasured counters never flag
    assert(!Bench.runDisturbed(-1, 500))
    assert(!Bench.runDisturbed(3000, -1))
  }

  test("host-stat parse: busy = sum minus idle minus iowait") {
    // cpu user nice system idle iowait irq softirq steal guest g_nice
    val line = "cpu  100 10 50 1000 40 5 5 10 0 0"
    // busy = 100+10+50+5+5+10 = 180 jiffies → 1800 ms
    assert(Bench.parseHostStatMs(line) == 1800L)
    // minimal 4-column shape (no iowait field): busy = sum - idle
    assert(Bench.parseHostStatMs("cpu 10 0 10 100") == 200L)
  }

  test("host-stat steal parse: column 8 in ms; absent column → -1") {
    // steal = 10 jiffies → 100 ms: the DIRECT hypervisor-starvation
    // counter the q74/q49 adjudications previously inferred by
    // elimination (round-17 directive #4)
    assert(Bench.parseHostStatStealMs("cpu  100 10 50 1000 40 5 5 10 0 0") == 100L)
    assert(Bench.parseHostStatStealMs("cpu  0 0 0 0 0 0 0 0 0 0") == 0L)
    // pre-steal kernel layout (7 time columns): unmeasured, never 0
    assert(Bench.parseHostStatStealMs("cpu 10 0 10 100 5 1 1") == -1L)
  }

  test("interrupts parse: a PRESENT row with no counts is -1, not a crash") {
    // the empty-token case: "FOO:" splits to [""] whose forall(isDigit)
    // is vacuously true — unguarded, "".toLong threw and the caller's
    // catch-all converted 'row present but empty' to -1 by accident;
    // the contract is now explicit (unmeasured -1, never zero)
    assert(Bench.parseInterruptsRow("FOO:\nTLB:  1  2\n", "FOO") == -1L)
    // a row with only a description and no numeric columns: same
    assert(Bench.parseInterruptsRow("ERR:   spurious only\n", "ERR") == -1L)
    // and the normal shape still sums
    assert(Bench.parseInterruptsRow("TLB:  1  2  desc\n", "TLB") == 3L)
  }

  test("cgroup candidates: root scope ('0::/') yields NO self path") {
    // "0::/" resolves to /sys/fs/cgroup//cpu.stat — the ROOT aggregate,
    // whose counters can name a clamp some OTHER container suffered.
    // A root-scoped process must resolve "root-only"/"none", never
    // masquerade as "self"
    assert(Bench.selfCgroupCpuStatPaths("0::/\n").isEmpty)
    assert(Bench.selfCgroupCpuStatPaths("0::\n").isEmpty)
    // a real v2 leaf resolves under the unified hierarchy
    assert(Bench.selfCgroupCpuStatPaths("0::/user.slice/s1\n") ==
      Seq("/sys/fs/cgroup/user.slice/s1/cpu.stat"))
    // v1 cpu controller line (root "/" likewise excluded)
    assert(Bench.selfCgroupCpuStatPaths("4:cpu,cpuacct:/docker/abc\n") ==
      Seq("/sys/fs/cgroup/cpu/docker/abc/cpu.stat"))
    assert(Bench.selfCgroupCpuStatPaths("4:cpu,cpuacct:/\n").isEmpty)
  }

  test("run-dirty: foreign-CPU, inter-run probe, or steal arm") {
    val cal = 80.0
    // clean run: host == self, probe at calibration, no steal
    assert(!Bench.runDirty(5000, 5000, 0, 80.0, cal))
    // foreign CPU mid-run (the round-16 arm, unchanged)
    assert(Bench.runDirty(20000, 5000, 0, 80.0, cal))
    // the q49/q09 class: host ≈ self but the pre-run probe reads slow
    // (SIGSTOP storm, clock clamp, hypervisor starvation) — the
    // round-16 record had NO arm for this
    assert(Bench.runDirty(5000, 5000, 0, 170.0, cal))
    // 2x is the bar, just under stays clean (q49's real 1.2-1.4x
    // probes were sub-threshold and stay so — the SIGNATURE diff
    // catches that class; the probe arm catches the blatant ones)
    assert(!Bench.runDirty(5000, 5000, 0, 159.0, cal))
    // failed calibration disables the probe arm, never flags
    assert(!Bench.runDirty(5000, 5000, 0, 500.0, -1.0))
    // steal arm rides along in runDirty
    assert(Bench.runDirty(5000, 5000, 1500, 80.0, cal))
  }

  test("steal-dirty: > max(1s, self/10); unmeasured never flags") {
    // the close2 case every other arm passed: q84 run 0 with 6.25 s
    // steal on 24.06 s self-CPU (26% of the window stolen)
    assert(Bench.stealDirty(6250, 24060))
    // benign sub-10% steal on a heavy query: q84 at 2.4 s/24 s stays
    // clean (the relative arm's whole point)
    assert(!Bench.stealDirty(2400, 24060))
    // light query, real episode: 1.5 s steal on 2 s self
    assert(Bench.stealDirty(1500, 1960))
    // calm-close ceiling: 0.55 s max per-run steal never flags
    assert(!Bench.stealDirty(550, 500))
    // unmeasured steal (-1) and unmeasured self handled
    assert(!Bench.stealDirty(-1, 5000))
    assert(Bench.stealDirty(1200, -1)) // absolute arm alone
  }

  test("run outlier: wall vs own window's min, min(2.5x, +2s)") {
    // q49 in the driver's 74.1 s record: runs [5.39, 3.77, 1.06] —
    // TWO corrupted runs own a median-of-3, and both probes read
    // clean (the burst sat inside the walls). The outlier arm names
    // runs 0 and 1 against the window's own 1.06 s floor
    assert(Bench.runOutlier(5.39, 1.06))
    assert(Bench.runOutlier(3.77, 1.06))
    assert(!Bench.runOutlier(1.06, 1.06))
    // q74's 8.5/8.3 s pair vs a 4.01 s floor: the absolute arm
    // (+2 s) catches what the relative arm (2.5x = 10 s) would miss
    assert(Bench.runOutlier(8.54, 4.01))
    // sub-second jitter: q38's worst clean spread (1.157 vs 0.507,
    // 2.28x) stays under min(1.268, 2.507) — zero hits across all 13
    // clean round-16 records, nearest miss 0.91x threshold
    assert(!Bench.runOutlier(1.157, 0.507))
    // the min-wall run itself (or a failed window) never flags
    assert(!Bench.runOutlier(5.0, -1.0))
    assert(!Bench.runOutlier(5.0, 0.0))
  }

  test("sig excursion: wall median leaves the band with stages constant") {
    // q49 in the driver's disturbed 74.1 s record: median 3.77 s vs a
    // [0.306, 0.692] clean band — the unflagged excursion round 17
    // exists to name (flags at > max(1.6*hi, hi+0.3) = 1.107)
    assert(Bench.sigExcursion(3.77, 0.692, stagesOk = true))
    // q09: 3.40 s vs hi 0.497
    assert(Bench.sigExcursion(3.40, 0.497, stagesOk = true))
    // in-band medians never flag
    assert(!Bench.sigExcursion(0.43, 0.692, stagesOk = true))
    // band-edge jitter: q12's worst clean median 0.845 vs hi 0.629 —
    // below max(1.6*0.629, 0.929) = 1.006, stays clean
    assert(!Bench.sigExcursion(0.845, 0.629, stagesOk = true))
    // sub-second absolute arm: hi 0.1, median 0.25 (2.5x!) stays clean
    // because 0.25 < 0.1 + 0.3 — ±25% swings on tiny queries are noise
    assert(!Bench.sigExcursion(0.25, 0.1, stagesOk = true))
    assert(Bench.sigExcursion(0.45, 0.1, stagesOk = true))
    // stale signature (stage count moved: new plan or fixture shape)
    // goes SILENT — a band that no longer describes the query must not
    // cry wolf. Task counts are never an input: regenerated fixtures
    // change tasks (q84: 80 → 193) with stages constant, so a
    // regenerated-fixture run cannot false-positive (directive #6)
    assert(!Bench.sigExcursion(3.77, 0.692, stagesOk = false))
    // unusable band (hi <= 0) never flags
    assert(!Bench.sigExcursion(3.77, -1.0, stagesOk = true))
  }

  test("signatures.json parse: bands, stages, sf tag; malformed → empty") {
    val json = """{"sf":"sf0.1","note":"x","queries":{
      "q49_ann_bucketed":{"stages":6,"wall":[0.306,0.692],
        "self_ms":[710,1500],"n":14},
      "q84_pagerank":{"stages":35,"wall":[5.716,7.214],
        "self_ms":[19470,60050],"n":14}}}"""
    val (sf, sigs) = Bench.parseSignatures(json)
    assert(sf == "sf0.1")
    assert(sigs("q49_ann_bucketed") ==
      Bench.QuerySig(6L, 0.306, 0.692, 710L, 1500L))
    assert(sigs("q84_pagerank").stages == 35L)
    // a query missing its band parses unusable (hi -1 → never flags)
    val (_, partial) = Bench.parseSignatures(
      """{"sf":"sf0.1","queries":{"qx":{"stages":3}}}""")
    assert(partial("qx").wallHi == -1.0)
    // garbage and missing sections degrade to empty, never throw
    assert(Bench.parseSignatures("not json") == (("", Map.empty)))
    assert(Bench.parseSignatures("""{"sf":"sf0.1"}""")._2.isEmpty)
  }

  test("committed signatures.json is well-formed: 106 queries, sane bands") {
    // guards regeneration: a malformed or truncated signatures.json
    // would silently disable the excursion protocol (parse failures
    // degrade to an empty map by design) — pin the committed artifact
    val path = java.nio.file.Paths.get("signatures.json")
    assume(java.nio.file.Files.exists(path)) // worktrees without it skip
    val (sf, sigs) = Bench.parseSignatures(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
    assert(sf == "sf0.1")
    assert(sigs.size == 106)
    sigs.foreach { case (name, s) =>
      assert(s.stages > 0, s"$name: stages must be positive")
      assert(s.wallLo > 0 && s.wallHi >= s.wallLo, s"$name: wall band")
      assert(s.selfLo >= 0 && s.selfHi >= s.selfLo, s"$name: self band")
      // the robust cap: no clean-band hi may exceed 10 s (q84, the
      // slowest query, sits at ~7.2; anything above means an excursion
      // leaked into the band source)
      assert(s.wallHi < 10.0, s"$name: hi ${s.wallHi} suspiciously wide")
    }
  }

  test("run causes: each dirty arm named; clock/stall split by probe CPU") {
    def c(host: Long = 5000, self: Long = 5000, steal: Long = 0,
          preSpin: Double = 80.0, preSpinCpu: Double = 80.0,
          cal: Double = 80.0, wall: Double = 1.0, minWall: Double = 1.0) =
      Bench.runCauses(host, self, steal, preSpin, preSpinCpu, cal, wall, minWall)
    // clean run: no labels
    assert(c() == Seq.empty)
    // q47 run 0 in the r17 graded record: probe 465.7 ms vs 75.3 cal,
    // steal 0, host ≈ self (14300/14450) — the "disturbed, cause
    // unlabeled" class. With probe thread-CPU ≈ wall the core HELD its
    // CPU and still ran slow: "clock" (frequency/SMT/thermal — the
    // guest computed, slowly; self-CPU inflated WITH the wall)
    assert(c(host = 14300, self = 14450, preSpin = 465.7,
      preSpinCpu = 450.0, cal = 75.3) == Seq("clock"))
    // same probe wall but thread-CPU ≪ wall: the thread was runnable
    // and not running — SIGSTOP storm / starvation the steal counter
    // misses (the bench_r17_stopstorm class)
    assert(c(preSpin = 465.7, preSpinCpu = 90.0, cal = 75.3) ==
      Seq("stall"))
    // thread-CPU unmeasured (old JVM): generic "probe"
    assert(c(preSpin = 465.7, preSpinCpu = -1.0, cal = 75.3) ==
      Seq("probe"))
    // steal + foreign both name themselves (q47 run 3: steal 1330 ms)
    assert(c(steal = 1330, self = 9080) == Seq("steal"))
    assert(c(host = 20000, self = 5000) == Seq("foreign"))
    // wall outlier against its own window (q49's 5.39 s vs 1.06 floor)
    assert(c(wall = 5.39, minWall = 1.06) == Seq("outlier"))
    // arms compose: a stolen run that is also the window outlier
    assert(c(host = 2000, self = 2000, steal = 1500, wall = 5.0,
      minWall = 1.0) == Seq("steal", "outlier"))
    // failed calibration disables the probe split, like runDirty
    assert(c(preSpin = 465.7, preSpinCpu = 450.0, cal = -1.0) == Seq.empty)
  }

  test("calm window: probe <= 1.5x cal AND steal delta <= 50ms") {
    // calm: probe at calibration, negligible steal across the poll
    assert(Bench.calmWindow(80.0, 80.0, 10))
    // the retry gate is TIGHTER than the 2x dirty bar — a retry must
    // start from better weather than the window it repairs
    assert(!Bench.calmWindow(125.0, 80.0, 0))
    assert(Bench.calmWindow(119.0, 80.0, 0))
    // an active steal episode blocks the gate even with a clean probe
    assert(!Bench.calmWindow(80.0, 80.0, 300))
    // unmeasured arms (no cal / no steal column) never block
    assert(Bench.calmWindow(500.0, -1.0, 10))
    assert(Bench.calmWindow(80.0, 80.0, -1))
  }

  test("retry accept: clean runs + stage identity + improvement only") {
    // the q47 target case: 5.62 s disturbed median, clean 0.66 s retry
    assert(Bench.retryAccept(5.62, 0.66, retryDirtyN = 0, stagesOk = true))
    // ANY dirty retry run self-rejects (the weather followed us)
    assert(!Bench.retryAccept(5.62, 0.66, retryDirtyN = 1, stagesOk = true))
    // stage drift means the retry measured a different plan
    assert(!Bench.retryAccept(5.62, 0.66, retryDirtyN = 0, stagesOk = false))
    // a slower "clean" retry never replaces — flagged queries are
    // flagged SLOW; the original (already named dirty) stands
    assert(!Bench.retryAccept(0.66, 0.70, retryDirtyN = 0, stagesOk = true))
  }

  test("graded retry median: warm retries floor at the signature lo band") {
    // the r18 motivating case: q24_join_brand's accepted retry
    // measured 0.266 s against a [0.434, 0.700] clean band — 39%
    // below the best of 18 clean in-suite records, because suite-end
    // retries run JIT-warm with a hot page cache. The grade claims at
    // best the best clean value ever observed; the raw measurement
    // stays in the record (retry_median_raw)
    assert(Bench.gradedRetryMedian(0.266, 0.434) == 0.434)
    // an in-band retry grades as measured
    assert(Bench.gradedRetryMedian(0.5, 0.434) == 0.5)
    // no usable lo band (no signature / partial suite / other SF):
    // raw median, exactly the r18 behavior
    assert(Bench.gradedRetryMedian(0.266, -1.0) == 0.266)
    assert(Bench.gradedRetryMedian(0.266, 0.0) == 0.266)
  }

  test("soft excursion: over-hi under-bar is retry-eligible, verdict-silent") {
    // the r18 motivating case: q32_minhash_pairs graded 3.196 s vs
    // band hi 2.434 — below the hard bar max(1.6*hi, hi+0.3) = 3.894
    // and only 2/5 runs dirty, so it kept a ~1 s phantom. The soft
    // bar hi + max(0.3, 0.15*hi) = 2.799 names it
    assert(Bench.sigSoftExcursion(3.196, 2.434, stagesOk = true))
    // a HARD excursion is not also soft (the tiers partition)
    assert(Bench.sigExcursion(4.0, 2.434, stagesOk = true))
    assert(!Bench.sigSoftExcursion(4.0, 2.434, stagesOk = true))
    // the clean pool's worst over-hi median (q12: 0.845 vs hi 0.630,
    // +0.215 s) stays under the 0.3 s absolute floor — replayed over
    // all 19 clean records the tier fires ZERO times
    assert(!Bench.sigSoftExcursion(0.845, 0.630, stagesOk = true))
    // heavy-query relative arm: hi 7.2 → soft above 8.28 (the hard
    // bar sits at 11.5 — the soft tier is what prices this gap)
    assert(Bench.sigSoftExcursion(8.5, 7.2, stagesOk = true))
    assert(!Bench.sigSoftExcursion(8.2, 7.2, stagesOk = true))
    // stale signature / unusable band go silent, like the hard tier
    assert(!Bench.sigSoftExcursion(3.196, 2.434, stagesOk = false))
    assert(!Bench.sigSoftExcursion(3.196, -1.0, stagesOk = true))
  }

  test("retry stage identity: fallback must match the ORIGINAL plan") {
    // with a signature: the retry must reproduce the signature stages
    assert(Bench.retryStagesOk(Some(6L), Seq(6, 6, 6), Seq(6, 6, 6)))
    assert(!Bench.retryStagesOk(Some(6L), Seq(6, 6, 6), Seq(7, 7, 7)))
    // without one (non-sf0.1 / BENCH_ONLY): internal consistency AND
    // agreement with the original window — the r18 fallback accepted
    // any self-consistent retry, so an AQE-drifted retry (original
    // plan 4 stages, retry re-planned to 5) could replace the graded
    // median while measuring a different plan (round-19 ADVICE)
    assert(Bench.retryStagesOk(None, Seq(5, 5, 5), Seq(5, 5, 5)))
    assert(!Bench.retryStagesOk(None, Seq(4, 4, 4), Seq(5, 5, 5)))
    assert(!Bench.retryStagesOk(None, Seq(5, 5, 5), Seq(4, 5, 5)))
    // an empty original window cannot anchor the comparison: closed
    assert(!Bench.retryStagesOk(None, Seq.empty, Seq(5, 5, 5)))
    assert(!Bench.retryStagesOk(Some(6L), Seq(6), Seq.empty))
  }

  test("session verdict: each arm independently sufficient, validated set") {
    def v(cont: Int = 0, sig: Int = 0, dirty: Int = 0, foreign: Long = 0L,
          cal: Double = 80.0, end: Double = 80.0) =
      Bench.sessionVerdict(cont, sig, dirty, foreign, cal, end)
    // the 13 clean round-16 records: all arms quiet
    assert(v(foreign = 5000L)._1 == "clean")
    // the driver's 74.1 s graded record: 8 contaminated (+7 sig)
    assert(v(cont = 8, sig = 7, foreign = 4700L)._1 == "disturbed")
    // the 63.0 s self-discard: 5 dirty queries, 55 s foreign CPU
    assert(v(dirty = 5, foreign = 55300L)._1 == "disturbed")
    // the 61.5 s record: ONE sig excursion (q74's 8.3 s) is a
    // per-query discount, not a session indictment
    assert(v(sig = 1)._1 == "clean")
    assert(v(sig = 2)._1 == "disturbed")
    // calibration drift: the machine degraded under the suite
    assert(v(cal = 80.0, end = 170.0)._1 == "disturbed")
    assert(v(cal = 80.0, end = 155.0)._1 == "clean")
    // failed calibration disables the drift arm
    assert(v(cal = -1.0, end = 500.0)._1 == "clean")
    // reasons name the firing arms
    val (verdict, reasons) = v(cont = 8, sig = 7, foreign = 4700L)
    assert(verdict == "disturbed" && reasons.size == 2)
    assert(reasons.exists(_.startsWith("sig_excursions=7")))
    assert(reasons.exists(_.startsWith("contaminated=8")))
  }
}
