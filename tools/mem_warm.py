#!/usr/bin/env python3
"""First-touch the machine's free memory once, in parallel, then exit.

On this class of VM, memory the guest has NEVER touched is backed
lazily by the hypervisor: the first fault on such a page costs tens of
microseconds (measured ~50-80 µs, ~84 MB/s single-threaded) vs ~1-2 µs
on pages the guest has used before. Any allocation-heavy Spark phase
that grows into cold memory pays that cost as kernel time (stime) in
whatever thread faults — the in-JVM CPU-inflation signature chased
since round 10. Touching every free page ONCE converts the machine to
the warm state; freed pages return to the guest freelist already
hypervisor-backed, so the effect persists for the session.

Usage: mem_warm.py [gb]   (default: free minus 6 GiB headroom)
"""
import multiprocessing as mp
import sys
import time


def touch(gb):
    # 1 GiB chunks: bytearray(n) memsets, which first-touches every page.
    # ALL chunks stay resident until the worker has touched its full
    # share: freeing each chunk before allocating the next would let the
    # kernel hand the just-freed (already-warm) pages straight back, and
    # the sweep would recycle the same few GiB instead of first-touching
    # all cold free memory.
    held = []
    for i in range(gb):
        t0 = time.time()
        held.append(bytearray(1 << 30))
        dt = time.time() - t0
        if i % 4 == 0:
            print(f"[warm] worker chunk {i}: {1024 / dt:.0f} MB/s", flush=True)
    del held


if __name__ == "__main__":
    if len(sys.argv) > 1:
        gb = int(sys.argv[1])
    else:
        free_kb = 0
        for line in open("/proc/meminfo"):
            if line.startswith("MemAvailable"):
                free_kb = int(line.split()[1])
        gb = max(1, free_kb // (1 << 20) - 6)
    workers = min(8, gb)
    # distribute EXACTLY gb across workers (last worker takes the
    # remainder): with chunks held resident, workers*ceil(gb/workers)
    # would peak up to workers-1 GiB OVER the headroom budget — on a
    # tight host that is the difference between warming memory and
    # getting OOM-killed while trying to
    base = gb // workers
    shares = [base + (1 if i < gb % workers else 0) for i in range(workers)]
    shares = [s for s in shares if s > 0]
    print(f"[warm] touching {gb} GiB with {len(shares)} workers "
          f"(shares: {shares})", flush=True)
    t0 = time.time()
    ps = [mp.Process(target=touch, args=(s,)) for s in shares]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    print(f"[warm] done: {gb} GiB in {time.time() - t0:.0f}s "
          f"({gb * 1024 / (time.time() - t0):.0f} MB/s aggregate)", flush=True)
