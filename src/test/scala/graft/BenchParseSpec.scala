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

  test("host-stat parse: busy = sum minus idle minus iowait") {
    // cpu user nice system idle iowait irq softirq steal guest g_nice
    val line = "cpu  100 10 50 1000 40 5 5 10 0 0"
    // busy = 100+10+50+5+5+10 = 180 jiffies → 1800 ms
    assert(Bench.parseHostStatMs(line) == 1800L)
    // minimal 4-column shape (no iowait field): busy = sum - idle
    assert(Bench.parseHostStatMs("cpu 10 0 10 100") == 200L)
  }
}
