#!/usr/bin/env python3
"""Replay the round-17 self-adjudication protocol (signature diff +
session verdict) over historical full-suite bench records — the
validation artifact for signatures.json and Bench.sigExcursion /
sessionVerdict. Mirrors the Scala predicates exactly:

  sig_excursion(q): all-runs stage count == signature stages AND
                    median wall > max(1.6 * hi, hi + 0.3)
  soft excursion:   median wall > hi + max(0.3, 0.15 * hi) and not a
                    hard excursion (round-19: retry-eligible,
                    verdict-silent — replayed here as `soft=N` to
                    prove zero false positives on clean records)
  session verdict:  disturbed iff sig_n >= 2 | contaminated_n >= 3 |
                    dirty_query_n >= 3 | foreign_cpu > 20 s
                    (the end-cal drift arm needs the round-17 record's
                    end_spin_ms field; absent in older records)

Dirty runs are recomputed from host/self per-run deltas (old records
predate the field or the inter-run-probe arm).

Round-19 addition: records carrying the round-18 `retries` block get a
RETRY REPLAY — flagged-set membership, retryAccept, and the graded
median swap (with the round-19 warm-retry floor, detected by the
presence of `retry_median_raw`; r18 records replay with the raw-swap
semantics they were graded under) are recomputed from the stored
per-query retry_* fields and compared with the stored adjudication.

Usage: validate_protocol.py [history.jsonl] [signatures.json]
"""
import json
import statistics
import sys


def median(xs):
    return statistics.median(xs)


def replay_retries(rec):
    """Recompute the retry pass from stored per-query fields; return
    (flag_ok, accept_ok, graded_ok, details) or None if the record
    predates the retry pass."""
    retr = rec.get("retries")
    if retr is None:
        return None
    diag = rec["diag"]
    details = []
    # eligibility: hard excursion | soft excursion | dirty-run majority
    # (stored per-query adjudication fields; sig_soft absent pre-r19)
    elig = {}
    for q, d in diag.items():
        dirty_major = 2 * len(d.get("dirty_runs", [])) > len(d["raw"])
        if d.get("sig_excursion") or d.get("sig_soft") or dirty_major:
            elig[q] = median(d["raw"])
    flagged = set(retr.get("flagged", []))
    # the bench retries the top-N eligible by (pre-retry) median
    top = set(sorted(elig, key=lambda q: -elig[q])[:len(flagged)])
    flag_ok = flagged == top
    if not flag_ok:
        details.append(f"flagged replay: stored {sorted(flagged)} != "
                       f"recomputed {sorted(top)}")
    accept_ok = True
    graded_ok = True
    repaired = 0.0
    for q, d in diag.items():
        if not d.get("retried"):
            continue
        rmed = median(d["retry_raw"])
        accept = (len(d.get("retry_dirty", [])) == 0
                  and d.get("retry_stages_ok", False)
                  and rmed < d["median_pre_retry"])
        if accept != d.get("retry_accepted"):
            accept_ok = False
            details.append(f"{q}: accept replay {accept} != stored "
                           f"{d.get('retry_accepted')}")
        if d.get("retry_accepted"):
            if "retry_median_raw" in d:  # r19+: warm-retry floor
                lo = d.get("sig_wall", [-1.0, -1.0])[0]
                graded = max(rmed, lo) if lo > 0 else rmed
                if abs(d["retry_median"] - graded) > 0.0015:
                    graded_ok = False
                    details.append(f"{q}: retry_median {d['retry_median']}"
                                   f" != floored replay {round(graded, 3)}")
            else:  # r18 generation: raw swap, as graded then
                graded = rmed
            repaired += d["median_pre_retry"] - graded
        else:
            graded = median(d["raw"])
        if abs(rec["queries"][q] - graded) > 0.0015:
            graded_ok = False
            details.append(f"{q}: graded {rec['queries'][q]} != replay "
                           f"{round(graded, 3)}")
    if retr.get("accepted") and abs(repaired - retr.get("repaired_s", 0)) \
            > 0.002 * max(1, len(retr["accepted"])):
        graded_ok = False
        details.append(f"repaired_s {retr.get('repaired_s')} != replay "
                       f"{round(repaired, 3)}")
    return flag_ok, accept_ok, graded_ok, details


def analyze(rec, sig):
    diag = rec["diag"]
    flags = []
    soft = []
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
        elif stages_ok and hi > 0 and med > hi + max(0.3, 0.15 * hi):
            soft.append((q, round(med, 2), hi))
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
    return flags, soft, cont, dirty_q, foreign_ms, steal_ms, \
        "disturbed" if disturbed else "clean"


def main():
    hist = sys.argv[1] if len(sys.argv) > 1 else "bench_history.jsonl"
    sigf = sys.argv[2] if len(sys.argv) > 2 else "signatures.json"
    sig = json.load(open(sigf))["queries"]
    recs = [json.loads(l) for l in open(hist) if l.strip()]
    full = [r for r in recs
            if not r.get("partial") and len(r.get("queries", {})) == 106]
    retry_recs = retry_ok = 0
    for r in full:
        flags, soft, cont, dirty_q, foreign_ms, steal_ms, verdict = \
            analyze(r, sig)
        fl = " ".join(f"{q.split('_')[0]}:{m}s/b{hi}" for q, m, hi in flags)
        sf = " ".join(f"~{q.split('_')[0]}:{m}s/b{hi}" for q, m, hi in soft)
        rr = replay_retries(r)
        if rr is None:
            rmark = ""
        else:
            retry_recs += 1
            flag_ok, accept_ok, graded_ok, details = rr
            if flag_ok and accept_ok and graded_ok:
                retry_ok += 1
                rmark = " retry-replay=ok"
            else:
                rmark = " retry-replay=MISMATCH"
        print(f"{r['ts'][:19]} total={r['value']:6.1f} cont={cont} "
              f"dirtyq={dirty_q} foreign={foreign_ms/1000:5.1f}s "
              f"steal={steal_ms/1000:5.1f}s "
              f"sig={len(flags)} soft={len(soft)} {verdict:9s}{rmark} "
              f"{fl} {sf}".rstrip())
        if rr is not None and rmark.endswith("MISMATCH"):
            for d in rr[3]:
                print(f"    {d}")
    print(f"retry replay: {retry_ok}/{retry_recs} records agree")


if __name__ == "__main__":
    main()
