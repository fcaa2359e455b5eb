#!/usr/bin/env python
"""Pure-CPU scaling probe for the BENCH.md hardware control.

Runs an integer-hash busy loop (no memory traffic beyond L1) in N
concurrent processes and reports aggregate ops/sec at 1, 8 and 32
processes.  If even this cache-resident workload scales below 4x from
8->32 processes, the box's vCPUs do not deliver 4x the cycles (SMT
sharing or hypervisor steal), which bounds ANY job's raw 8->32
efficiency and is part of the hardware envelope BENCH.md documents
alongside the STREAM-triad memory sweep."""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _spin(q, iters: int = 30_000_000):
    x = 0x9E3779B97F4A7C15
    t0 = time.time()
    for i in range(iters):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    q.put(iters / (time.time() - t0))


def sweep(counts=(1, 8, 32)) -> list[tuple[int, float]]:
    out = []
    for n in counts:
        q = mp.Queue()
        ps = [mp.Process(target=_spin, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        out.append((n, round(sum(q.get() for _ in range(n)) / 1e6, 1)))
    return out


if __name__ == "__main__":
    res = sweep()
    agg = dict(res)
    print(json.dumps({
        "unit": "M hash-ops/sec aggregate",
        "per_level": agg,
        "scaling_8_to_32": round(agg[32] / agg[8], 2) if 8 in agg and 32 in agg else None,
    }))
