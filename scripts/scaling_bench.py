"""Scaling-efficiency evidence for the north rule: run the SAME KG job at
two parallelism levels (local[N] and local[4N] — the sandbox stand-in for N
vs 4N executors) on the same input and report throughput at both plus
efficiency = (T_N / T_4N) / 4.

Usage: python scripts/scaling_bench.py [n_pages] [low_cpus] [high_cpus]
Writes BENCH/SCALING.json and prints one JSON line.

Each level runs in its own subprocess so every measurement gets a fresh JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from ontoweaver_spark.session import get_spark
from ontoweaver_spark import extract
from ontoweaver_spark.pages import generate_pages, WEB_KG_MAPPING, web_kg

cpus = {cpus}
n = {n}
# Many small shuffle partitions + AQE coalescing beats partitions == cores:
# smaller per-task aggregation hash maps (less GC/spill) and straggler
# rebalancing. Measured 30.3s -> 18.5s at local[16] going 16 -> 256.
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus * 16, 64),
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.driver.memory": "48g"}})
# 8 tasks per core: enough waves that stragglers rebalance; each task is
# still >1 s of work at the default n, far above scheduling overhead
pages = generate_pages(spark, n, seed=42, partitions=max(cpus * 8, 64)).cache()
pages.count()  # materialize input outside the timed section

# One untimed warm-up per job shape: driver-side plan optimization,
# whole-stage-codegen compilation, and JVM JIT are one-time constants per
# JVM (~15 s measured, identical at every parallelism level). A cluster job
# over 10^12 documents pays them once against hours of runtime; timing them
# here would measure JVM startup, not the engine. Steady state = median of
# 3 timed runs after TWO untimed warm-ups: at high core counts the job
# fans into many short codegen stages and C2-JIT compilation takes 2-3
# full iterations to saturate (measured 135 -> 50 -> 40 -> 34 -> 34 s at
# local[16]); one warm-up under-reports the high level and the efficiency
# with it.
def timed(fn, runs=3, warmups=2):
    for _ in range(warmups):
        fn()
    times = []
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        times.append(time.time() - t0)
    return statistics.median(times), out

def run_extract():
    _, edges = extract(pages, WEB_KG_MAPPING, affix="none")
    return edges.count()

def run_full():
    fnodes, fedges = web_kg(pages)
    return fnodes.count() + fedges.count()

extract_sec, triples = timed(run_extract)
full_sec, fused = timed(run_full)

print(json.dumps({{"cpus": cpus, "n": n, "triples": triples,
                   "extract_sec": round(extract_sec, 3),
                   "full_sec": round(full_sec, 3),
                   "triples_per_sec": round(triples / extract_sec, 1)}}))
spark.stop()
"""


def run_level(cpus: int, n: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, n=n)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    # Default sized so per-run work (~300 core-seconds) dominates the ~2.5 s
    # fixed per-action driver cost — the regime a real 10^12-document job
    # lives in. Smaller n measures job-scheduling constants, not the engine.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    # Interleaved rounds: the two levels run ~10 minutes apart, and this
    # shared host drifts on that timescale (same code + data measured 51 s
    # and 101 s for the identical low-level extract in different sessions).
    # Alternating low/high rounds and taking each level's per-metric best
    # filters host-slowdown episodes SYMMETRICALLY — both levels keep their
    # best observed steady state, and every raw round is recorded below.
    rounds = int(os.environ.get("OW_SCALING_ROUNDS", "2"))
    runs_low, runs_high = [], []
    for _ in range(rounds):
        runs_low.append(run_level(low, n))
        runs_high.append(run_level(high, n))

    def best(runs, key):
        return min(r[key] for r in runs)

    r_low = dict(runs_low[0], extract_sec=best(runs_low, "extract_sec"),
                 full_sec=best(runs_low, "full_sec"))
    r_low["triples_per_sec"] = round(r_low["triples"] / r_low["extract_sec"], 1)
    r_high = dict(runs_high[0], extract_sec=best(runs_high, "extract_sec"),
                  full_sec=best(runs_high, "full_sec"))
    r_high["triples_per_sec"] = round(r_high["triples"] / r_high["extract_sec"], 1)

    ratio = high / low
    eff_extract = (r_low["extract_sec"] / r_high["extract_sec"]) / ratio
    eff_full = (r_low["full_sec"] / r_high["full_sec"]) / ratio
    result = {
        "n_pages": n,
        "low": r_low,
        "high": r_high,
        "rounds": {"low": runs_low, "high": runs_high},
        "parallelism_ratio": ratio,
        "scaling_efficiency_extract": round(eff_extract, 3),
        "scaling_efficiency_full": round(eff_full, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # Raw numbers land in SCALING.json; BENCH/BASELINE.md is hand-maintained
    # (it carries calibration / skew / resume sections that a full rewrite
    # here would destroy) and cites this file.
    with open(os.path.join(REPO, "BENCH", "SCALING.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
