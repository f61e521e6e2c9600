"""Host-health probe: measure memory bandwidth + single-core throughput.

This box is a VM on a shared host and is memory-bandwidth-bound above ~8
cores (BASELINE.md). Co-tenant pressure on the HOST's memory subsystem is
invisible to guest vmstat (no steal, CPU reads "busy") yet was measured to
cut effective bandwidth >200x for minutes-long episodes — a 256 MB numpy
copy took >10 s during one (normal: <50 ms), inflating identical Spark jobs
7-10x. Every timing run must therefore carry its own weather report.

    python tools/host_probe.py            # one JSON line
    from tools.host_probe import probe    # {'bw_gbps': ..., 'spc_mops': ...}

Healthy readings on this box: bw_gbps >= 5 (typically 8-15), spc_mops >= 8.
pipeline_sweep.py records a probe before/after each op and refuses to
transcribe results taken under a degraded probe unless --force.
"""

from __future__ import annotations

import json
import time

import numpy as np

# floor below which timing results are labeled degraded (healthy: 8-15 GB/s)
BW_HEALTHY_GBPS = 5.0


def probe(size_mb: int = 256, reps: int = 3) -> dict:
    """Return {'bw_gbps', 'spc_mops'}: copy bandwidth (read+write bytes /
    wall) best-of-reps, and single-core Python loop rate (M iters/s)."""
    a = np.zeros(size_mb * 1024 * 1024 // 8)
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        b = a.copy()
        best = min(best, time.perf_counter() - t)
        del b
    bw = (2 * size_mb / 1024.0) / best  # GB moved (r+w) per second
    n = 5_000_000
    t = time.perf_counter()
    x = 0
    for i in range(n):
        x += i
    spc = n / (time.perf_counter() - t) / 1e6
    return {"bw_gbps": round(bw, 2), "spc_mops": round(spc, 2)}


def is_healthy(p: dict | None = None) -> bool:
    return (p or probe())["bw_gbps"] >= BW_HEALTHY_GBPS


if __name__ == "__main__":
    print(json.dumps(probe()))
