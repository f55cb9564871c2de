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

  test("host-stat parse: busy = sum minus idle minus iowait") {
    // cpu user nice system idle iowait irq softirq steal guest g_nice
    val line = "cpu  100 10 50 1000 40 5 5 10 0 0"
    // busy = 100+10+50+5+5+10 = 180 jiffies → 1800 ms
    assert(Bench.parseHostStatMs(line) == 1800L)
    // minimal 4-column shape (no iowait field): busy = sum - idle
    assert(Bench.parseHostStatMs("cpu 10 0 10 100") == 200L)
  }
}
