#!/usr/bin/env python3
"""Build signatures.json — the per-query known-good band table — from
clean full-suite bench records in bench_history.jsonl.

Record selection (a record must be plausibly CLEAN to teach bands):
  * full suite (not partial), 106 queries, sf0.1
  * zero probe-contaminated queries, < 3 dirty-run queries
  * suite-summed positive (host - self) CPU < 20 s

Band construction is ROBUST to a lurking unflagged excursion inside a
"clean" record (the exact failure class the table exists to catch —
q74's 8.3 s median hides in a record every existing axis passes):
  wall band  = [min(medians), min(max(medians), 2 x median(medians))]
  self band  = same formula over per-record self-CPU medians (ms)
  stages     = per-run stage count, REQUIRED constant across records
               (verified; -1 disables the query's excursion predicate)
Task counts are deliberately NOT part of a signature: regenerated
fixtures change task counts (q84: 80 -> 193) with stages constant, so
keying on stages makes fixture regeneration a non-event.

Usage: make_signatures.py [history.jsonl] [out.json]
"""
import json
import statistics
import sys


def foreign_cpu_s(rec):
    return sum(
        max(0, h - s)
        for d in rec["diag"].values()
        for h, s in zip(d["host_ms"], d["self_ms"])
        if h >= 0 and s >= 0
    ) / 1000.0


def is_clean(rec):
    if rec.get("partial") or len(rec.get("queries", {})) != 106:
        return False
    if not rec.get("sf", "").rstrip("/").endswith("sf0.1"):
        return False
    if rec.get("contaminated"):
        return False
    # a record that adjudicated ITSELF disturbed (or carries stored
    # sig excursions) must not teach bands, even when the heuristics
    # below would admit it — the band source must satisfy the same
    # protocol it feeds (records predating session_verdict fall
    # through to the heuristics)
    if rec.get("session_verdict") == "disturbed" or rec.get("sig_excursions"):
        return False
    dirty_q = sum(1 for d in rec["diag"].values() if d.get("dirty_runs"))
    return dirty_q < 3 and foreign_cpu_s(rec) < 20.0


def band(medians, ndig):
    lo = min(medians)
    hi = min(max(medians), 2.0 * statistics.median(medians))
    return [round(lo, ndig), round(hi, ndig)]


def main():
    hist = sys.argv[1] if len(sys.argv) > 1 else "bench_history.jsonl"
    out = sys.argv[2] if len(sys.argv) > 2 else "signatures.json"
    recs = [json.loads(l) for l in open(hist) if l.strip()]
    clean = [r for r in recs if is_clean(r)]
    if len(clean) < 3:
        sys.exit(f"only {len(clean)} clean records — refusing to build bands")
    qs = sorted(clean[0]["queries"].keys())
    sigs = {}
    skipped = 0
    for q in qs:
        # a clean-verdict record can still carry 1-2 accepted-retry
        # queries (dirty_q < 3 admits it) whose RAW windows are
        # dirty-majority by construction — and whose retry windows are
        # JIT-warm (systematically below any cold-suite value). Neither
        # window may teach this query's band: skip the record for this
        # query only (round-19 ADVICE).
        srcs = [r for r in clean if not r["diag"][q].get("retry_accepted")]
        skipped += len(clean) - len(srcs)
        if len(srcs) < 3:
            sigs[q] = {"stages": -1, "wall": [-1.0, -1.0],
                       "self_ms": [-1, -1], "n": len(srcs)}
            continue
        stages = {s for r in srcs for s in r["diag"][q]["stages"]}
        wall_meds = [statistics.median(r["diag"][q]["raw"]) for r in srcs]
        self_meds = [statistics.median(r["diag"][q]["self_ms"]) for r in srcs]
        sigs[q] = {
            "stages": stages.pop() if len(stages) == 1 else -1,
            "wall": band(wall_meds, 3),
            "self_ms": [int(v) for v in band(self_meds, 0)],
            "n": len(srcs),
        }
    doc = {
        "sf": "sf0.1",
        "built_from": [r["ts"] for r in clean],
        "note": "per-query known-good bands from clean full-suite records; "
                "wall/self hi is capped at 2x the median-of-medians so an "
                "unflagged excursion inside a source record cannot widen "
                "its own detection band",
        "queries": sigs,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    unstable = [q for q in qs if sigs[q]["stages"] < 0]
    print(f"wrote {out}: {len(qs)} queries from {len(clean)} clean records "
          f"({skipped} retry-accepted query-windows excluded); "
          f"stage-unstable (predicate disabled): {unstable or 'none'}")


if __name__ == "__main__":
    main()
