#!/usr/bin/env python3
"""Summarize a graft bench record's per-query diag block (dev tool).

Usage: bench_diag_summary.py <bench_latest.json> [qprefix ...]

Prints one line per query (optionally filtered by name prefix) with the
round-15 attribution columns: wall raws, stages, host vs self CPU, the
utime/stime split, fault counts, cgroup throttle, PSI deltas, JIT time,
and the pre-query probes — plus the round-16 columns: vctx/ivctx
(process ctxt switches; NEGATIVE deltas mean threads exited between
snapshots and took their counters along — pool churn, not an error),
thp_fault/thp_collapse, rqdelay_ms (runqueue wait), tlb (shootdown
IPIs, system-wide), sysc (read/write syscall count), and the
CONTAMINATED flag (probe gate). Sorted by median wall, descending.
"""
import json
import sys

rec = json.load(open(sys.argv[1]))
prefixes = sys.argv[2:]
diag = rec.get("diag", {})


def med(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2] if xs else 0


rows = []
for name, d in diag.items():
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    rows.append((med(d["raw"]), name, d))
rows.sort(reverse=True)

print(f"cal: {rec.get('cal')}")
if "session_verdict" in rec:  # round-17: the record stamps itself
    print(f"SESSION VERDICT: {rec['session_verdict']} "
          f"reasons={rec.get('verdict_reasons', [])} "
          f"foreign_cpu_ms={rec.get('foreign_cpu_ms')}")
if rec.get("contaminated"):
    print(f"CONTAMINATED (probe gate): {rec['contaminated']}")
if rec.get("sig_excursions"):
    print(f"SIG EXCURSIONS (band diff): {rec['sig_excursions']}")
if rec.get("sig_soft"):  # round-19: retry-eligible, verdict-silent
    print(f"SOFT EXCURSIONS (over-hi, under-bar): {rec['sig_soft']}")
if rec.get("retries"):
    print(f"RETRIES: {rec['retries']}")
for m, name, d in rows:
    flag = " [CONTAMINATED]" if d.get("contaminated") else ""
    if d.get("dirty_runs"):
        flag += f" [DIRTY RUNS {d['dirty_runs']}]"
    if d.get("sig_excursion"):
        flag += f" [SIG EXCURSION vs {d.get('sig_wall')}]"
    if d.get("sig_soft"):
        flag += f" [SOFT vs {d.get('sig_wall')}]"
    if d.get("retried"):
        flag += (f" [RETRY {'accepted' if d.get('retry_accepted') else 'rejected'}"
                 f" {d.get('median_pre_retry')}->{d.get('retry_median')}"
                 + (f" raw {d.get('retry_median_raw')} FLOORED"
                    if d.get("retry_floored") else "") + "]")
    print(f"\n{name}: median {m:.2f}s raw={d['raw']} stages={d['stages']}{flag}")
    print(f"  host_ms={d['host_ms']} self_ms={d['self_ms']}")
    if "utime_ms" in d:
        print(f"  utime={d['utime_ms']} stime={d['stime_ms']} "
              f"minflt={d['minflt']} majflt={d['majflt']}")
        print(f"  thr_n={d['thr_n']} thr_ms={d['thr_ms']} "
              f"psi_cpu={d['psi_cpu_ms']} psi_mem={d['psi_mem_ms']} "
              f"psi_io={d['psi_io_ms']} jit_ms={d['jit_ms']}")
    if "vctx" in d:
        print(f"  vctx={d['vctx']} ivctx={d['ivctx']} "
              f"thp_f={d['thp_fault']} thp_c={d['thp_collapse']}")
    if "rqdelay_ms" in d:
        print(f"  rqdelay_ms={d['rqdelay_ms']} tlb={d['tlb']}" +
              (f" sysc={d['sysc']}" if "sysc" in d else ""))
    if "steal_ms" in d:  # round-17: direct hypervisor counter +
        # per-run pre-probe (the inter-run dirty arm's input)
        spr = [round(p, 1) for p in d.get("probe_spin_run_ms", [])]
        print(f"  steal_ms={d['steal_ms']} probe_spin_run_ms={spr}")
    if "sig_wall" in d:
        print(f"  sig: wall={d['sig_wall']} self_ms={d['sig_self_ms']} "
              f"stages={d['sig_stages']} stages_ok={d['sig_stages_ok']} "
              f"excursion={d['sig_excursion']}")
    probes = f"spin={d['probe_spin_ms']:.1f} disk={d['probe_disk_ms']:.1f}"
    if "probe_fault_ms" in d:
        probes += f" fault={d['probe_fault_ms']:.1f}"
    if "probe_spin_all_ms" in d:
        probes += f" spin_all={d['probe_spin_all_ms']:.1f}"
    print(f"  probes: {probes} load1={d['load1']:.2f} "
          f"task_gc={d['task_gc_ms']} jvm_gc={d['jvm_gc_ms']} "
          f"tasks={d['tasks']} run_ms={d['run_ms']} cpu_ms={d['cpu_ms']}")
    print(f"  shuf r/w={d['shuf_read_b']}/{d['shuf_write_b']} "
          f"spill d/m={d['spill_disk_b']}/{d['spill_mem_b']} "
          f"fetch_wait={d['fetch_wait_ms']}")
