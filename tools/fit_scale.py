#!/usr/bin/env python3
"""Fit per-query scaling exponents from ScaleLadder JSON records.

Usage: fit_scale.py <x1.json> <x3.json> <x10.json> [...]

Each input is one ScaleLadder output line:
  {"dir": ".../xM", "runs": N, "queries": {"name": {"sec": s, "capped": b, "failed": b}, ...}}

The multiplier is parsed from the dir basename (x1 / x3 / x10 / ...).
For each query present (and unflagged) at >=2 rungs, fits log(sec) =
a + e*log(m) by least squares and prints a markdown table sorted by
exponent. Capped/failed rungs are excluded from the fit but reported.
"""
import json
import math
import re
import sys


def load(path):
    with open(path) as f:
        rec = json.loads(f.read().strip())
    m = re.search(r"x([0-9.]+)$", rec["dir"].rstrip("/"))
    if not m:
        raise SystemExit(f"cannot parse multiplier from dir {rec['dir']!r}")
    return float(m.group(1)), rec["queries"]


def fit(pts):
    """Least-squares exponent of log(y) vs log(x) over (x, y) pairs."""
    if len(pts) < 2:
        return None
    xs = [math.log(x) for x, _ in pts]
    ys = [math.log(y) for _, y in pts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    return sxy / sxx if sxx else float("nan")


def main(paths):
    # key on the multiplier alone: tuples with dict payloads raise
    # TypeError on ties (e.g. a re-run rung)
    rungs = sorted((load(p) for p in paths), key=lambda t: t[0])
    names = []
    for _, qs in rungs:
        for n in qs:
            if n not in names:
                names.append(n)
    rows = []
    for name in names:
        pts, vol, flags = [], [], []
        for mult, qs in rungs:
            q = qs.get(name)
            if q is None:
                flags.append(f"x{mult:g}:absent")
            elif q.get("failed"):
                flags.append(f"x{mult:g}:FAILED")
            elif q.get("capped"):
                flags.append(f"x{mult:g}:CAPPED@{q['sec']:.0f}s")
            else:
                pts.append((mult, q["sec"]))
                # output-volume curve: the evidence behind density claims
                # (e.g. q105 16- vs 64-bit pair counts)
                if q.get("rows", -1) > 0:
                    vol.append((mult, q["rows"]))
        rows.append((name, pts, fit(pts), fit(vol), flags))

    rows.sort(key=lambda r: (-(r[2] if r[2] is not None else 99)))
    mults = [m for m, _ in rungs]
    hdr = " | ".join(f"x{m:g} (s)" for m in mults)
    print(f"| query | {hdr} | exponent | rows exp | flags |")
    print("|---" * (len(mults) + 4) + "|")
    for name, pts, exp, rexp, flags in rows:
        by = {m: s for m, s in pts}
        cells = " | ".join(f"{by[m]:.2f}" if m in by else "—" for m in mults)
        e = f"**{exp:.2f}**" if exp is not None and exp > 1.3 else (
            f"{exp:.2f}" if exp is not None else "—")
        r = f"{rexp:.2f}" if rexp is not None else "—"
        print(f"| {name} | {cells} | {e} | {r} | {', '.join(flags) or ''} |")


if __name__ == "__main__":
    main(sys.argv[1:])
