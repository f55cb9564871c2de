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
}
