#!/usr/bin/env python3
"""Compare interleaved A/B bench outputs from bench_ab_rounds.sh.

Usage: bench_ab_compare.py <outdir> [queryName ...]

Reads <outdir>/A_*.json and <outdir>/B_*.json (one graft.Bench JSON line
each), takes per-query MEDIANS across rounds for each variant, and prints
a per-query table sorted by B/A ratio (descending) plus the suite-level
median ratio. Optional query names restrict the table. Exit is always 0:
this is a measurement report, not a gate.
"""
import glob
import json
import os
import statistics
import sys


def medians(paths):
    per_query = {}
    totals = []
    for p in paths:
        with open(p) as f:
            line = f.read().strip()
        if not line:
            continue
        rec = json.loads(line)
        totals.append(rec.get("value", 0.0))
        for q, sec in rec.get("queries", {}).items():
            per_query.setdefault(q, []).append(sec)
    return ({q: statistics.median(v) for q, v in per_query.items()},
            statistics.median(totals) if totals else float("nan"),
            len(totals))


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    a, a_total, a_n = medians(sorted(glob.glob(os.path.join(outdir, "A_*.json"))))
    b, b_total, b_n = medians(sorted(glob.glob(os.path.join(outdir, "B_*.json"))))
    common = sorted(set(a) & set(b))
    if only:
        common = [q for q in common if q in only]
    rows = [(q, a[q], b[q], b[q] / a[q] if a[q] > 0 else float("inf"))
            for q in common]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':32s} {'A_med':>8s} {'B_med':>8s} {'B/A':>6s}")
    for q, am, bm, ratio in rows:
        print(f"{q:32s} {am:8.3f} {bm:8.3f} {ratio:6.2f}")
    ratios = [r[3] for r in rows if r[3] != float("inf")]
    if ratios:
        print(f"\nrounds: A={a_n} B={b_n}; common queries: {len(rows)}")
        print(f"median per-query B/A: {statistics.median(ratios):.3f}")
        print(f"suite-total medians: A={a_total:.2f}s B={b_total:.2f}s "
              f"(ratio {b_total / a_total:.3f})")


if __name__ == "__main__":
    main()
