"""DRAM-bandwidth ceiling probe for the 8v32 scaling stand-in.

Measures aggregate memory READ bandwidth at several thread counts by
summing disjoint slices of one large array in parallel (each worker is a
C-speed numpy reduction over its own gigabyte-scale slice — no Python
loop, no allocation in the timed region). If aggregate GB/s stops
growing between 8 and 32 threads, the host's memory system — not the
engine — is the scaling ceiling for scan-bound work.

Usage: python scripts/membw_bench.py [total_gb] [threads ...]
Writes BENCH/MEMBW.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    total_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    threads = [int(t) for t in sys.argv[2:]] or [1, 8, 32]
    n = int(total_gb * (1 << 30) // 8)
    a = np.ones(n, dtype=np.int64)  # touch every page
    out = {"total_gb": total_gb, "levels": {}}
    for t in threads:
        chunk = n // t
        slices = [a[i * chunk:(i + 1) * chunk] for i in range(t)]
        best = None
        for _ in range(3):
            with ThreadPoolExecutor(max_workers=t) as pool:
                t0 = time.time()
                sums = list(pool.map(lambda s: int(s.sum()), slices))
                dt = time.time() - t0
            assert sum(sums) == chunk * t
            best = dt if best is None else min(best, dt)
        gbs = (chunk * t * 8) / best / (1 << 30)
        out["levels"][str(t)] = {"sec": round(best, 3), "gb_per_sec": round(gbs, 2)}
        print(f"threads={t}: {gbs:.1f} GB/s", file=sys.stderr)
    l8 = out["levels"].get("8", {}).get("gb_per_sec")
    l32 = out["levels"].get("32", {}).get("gb_per_sec")
    if l8 and l32:
        out["bw_ratio_32v8"] = round(l32 / l8, 3)
        out["bw_efficiency_32v8"] = round(l32 / l8 / 4.0, 3)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "MEMBW.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
