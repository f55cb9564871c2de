#!/bin/bash
# Interleaved cross-round whole-suite bench A/B: alternate full graft.Bench
# processes built from two commits (A = prior round close, B = current
# tree) so host-load drift hits both variants equally. Each process does
# its own warm-up and reports per-query medians of SPARK_GRAFT_BENCH_RUNS
# runs; we interleave A,B,A,B,... at process granularity and compare
# per-query medians across rounds offline (tools/bench_ab_compare.py).
#
# Usage: bench_ab_rounds.sh <classesA> <classesB> <rounds> <outdir>
set -u
A_CLASSES=$1; B_CLASSES=$2; ROUNDS=$3; OUT=$4
mkdir -p "$OUT"
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-1}
# HEAP=8g reproduces driver-record conditions (the driver runs 8 GB);
# the default stays the harness's generous 48g
HEAP=${HEAP:-48g}
for i in $(seq 1 "$ROUNDS"); do
  for v in A B; do
    cls=$([ "$v" = A ] && echo "$A_CLASSES" || echo "$B_CLASSES")
    # grep for the record line, not tail -1: Spark 4's default log4j2
    # console appender writes WARNs to STDOUT, so plain tail can grab a
    # log line (this is also why the graded BENCH parsed field read null
    # in r8/r9 — Bench now prints the JSON after spark.stop())
    SPARK_GRAFT_SF_DIR=$SF \
      java -cp "/opt/spark/jars/*:$cls" "-Xmx$HEAP" -XX:+UseG1GC graft.Bench \
      2>"$OUT/${v}_$i.err" | grep '"metric"' | tail -1 >"$OUT/${v}_$i.json"
    echo "round $i variant $v done: $(cut -c1-60 "$OUT/${v}_$i.json")"
  done
done
