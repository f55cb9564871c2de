#!/usr/bin/env python3
"""Replay the round-17 self-adjudication protocol (signature diff +
session verdict) over historical full-suite bench records — the
validation artifact for signatures.json and Bench.sigExcursion /
sessionVerdict. Mirrors the Scala predicates exactly:

  sig_excursion(q): all-runs stage count == signature stages AND
                    median wall > max(1.6 * hi, hi + 0.3)
  session verdict:  disturbed iff sig_n >= 2 | contaminated_n >= 3 |
                    dirty_query_n >= 3 | foreign_cpu > 20 s
                    (the end-cal drift arm needs the round-17 record's
                    end_spin_ms field; absent in older records)

Dirty runs are recomputed from host/self per-run deltas (old records
predate the field or the inter-run-probe arm).

Usage: validate_protocol.py [history.jsonl] [signatures.json]
"""
import json
import statistics
import sys


def median(xs):
    return statistics.median(xs)


def analyze(rec, sig):
    diag = rec["diag"]
    flags = []
    for q, d in diag.items():
        s = sig.get(q)
        if not s:
            continue
        med = median(d["raw"])
        hi = s["wall"][1]
        stages_ok = s["stages"] > 0 and all(
            x == s["stages"] for x in d["stages"])
        if stages_ok and hi > 0 and med > max(1.6 * hi, hi + 0.3):
            flags.append((q, round(med, 2), hi))
    cal_spin = rec.get("cal", {}).get("spin_ms", 0)

    def q_dirty(d):
        if any(h >= 0 and s >= 0 and (h - s) > max(2000, s / 4)
               for h, s in zip(d["host_ms"], d["self_ms"])):
            return True
        if any(st > max(1000, max(0, se) / 10)  # steal arm
               for st, se in zip(d.get("steal_ms", []), d["self_ms"])):
            return True
        # inter-run probe arm (records that carry probe_spin_run_ms)
        if cal_spin > 0 and any(p > 2 * cal_spin
                                for p in d.get("probe_spin_run_ms", [])):
            return True
        mn = min(d["raw"])  # intra-window wall-outlier arm
        return mn > 0 and any(w > min(2.5 * mn, mn + 2.0)
                              for w in d["raw"])

    dirty_q = sum(1 for d in diag.values() if q_dirty(d))
    foreign_ms = sum(
        max(0, h - s)
        for d in diag.values()
        for h, s in zip(d["host_ms"], d["self_ms"])
        if h >= 0 and s >= 0)
    steal_ms = sum(v for d in diag.values()
                   for v in d.get("steal_ms", []) if v > 0)
    cont = len(rec.get("contaminated", []))
    disturbed = (len(flags) >= 2 or cont >= 3 or dirty_q >= 3
                 or foreign_ms > 20000)
    cal = rec.get("cal", {})
    if cal.get("spin_ms", 0) > 0 and \
            cal.get("end_spin_ms", 0) > 2 * cal["spin_ms"]:
        disturbed = True
    return flags, cont, dirty_q, foreign_ms, steal_ms, \
        "disturbed" if disturbed else "clean"


def main():
    hist = sys.argv[1] if len(sys.argv) > 1 else "bench_history.jsonl"
    sigf = sys.argv[2] if len(sys.argv) > 2 else "signatures.json"
    sig = json.load(open(sigf))["queries"]
    recs = [json.loads(l) for l in open(hist) if l.strip()]
    full = [r for r in recs
            if not r.get("partial") and len(r.get("queries", {})) == 106]
    for r in full:
        flags, cont, dirty_q, foreign_ms, steal_ms, verdict = analyze(r, sig)
        fl = " ".join(f"{q.split('_')[0]}:{m}s/b{hi}" for q, m, hi in flags)
        print(f"{r['ts'][:19]} total={r['value']:6.1f} cont={cont} "
              f"dirtyq={dirty_q} foreign={foreign_ms/1000:5.1f}s "
              f"steal={steal_ms/1000:5.1f}s "
              f"sig={len(flags)} {verdict:9s} {fl}")


if __name__ == "__main__":
    main()
