"""Aggregate streaming-memory-bandwidth vs number of pinned processes.

Evidence tool for BASELINE.md's scaling section: each worker pins itself to
one core and repeatedly copies a 128 MB int64 array (256 MB of read+write
traffic per copy); the per-process best and the aggregate are reported for
increasing process counts. On a single-socket box the aggregate curve shows
where the DRAM controller saturates — the resource a real N -> 4N *node*
cluster scales with node count but this sandbox holds fixed.

  python tools/membw_probe.py            # probe 1,2,4,8,16,24,32 processes
  python tools/membw_probe.py 8 32       # probe just these counts

Prints one line per level and a final JSON line with the full table.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def _worker(core: int, q: "mp.Queue") -> None:
    os.sched_setaffinity(0, {core})
    a = np.zeros(16_000_000, np.int64)  # 128 MB
    a[:] = 3
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        b = a.copy()  # read + write = 256 MB of traffic
        dt = time.perf_counter() - t0
        best = min(best, dt)
        del b
    q.put(0.256 / best)  # GB/s per process


def probe(levels: list[int]) -> dict[int, dict]:
    out: dict[int, dict] = {}
    for p in levels:
        q: mp.Queue = mp.Queue()
        procs = [mp.Process(target=_worker, args=(i, q)) for i in range(p)]
        for pr in procs:
            pr.start()
        vals = sorted(q.get() for _ in procs)
        for pr in procs:
            pr.join()
        out[p] = {
            "per_proc_gbps": [round(v, 2) for v in vals],
            "aggregate_gbps": round(sum(vals), 2),
        }
        print(
            f"procs={p:2d} per-proc GB/s={out[p]['per_proc_gbps']} "
            f"aggregate={out[p]['aggregate_gbps']}",
            flush=True,
        )
    return out


if __name__ == "__main__":
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 24, 32]
    table = probe(levels)
    print(json.dumps({str(k): v for k, v in table.items()}))
