"""Scaling-efficiency evidence for the north rule: run the SAME KG job at
two parallelism levels (local[N] and local[4N] — the sandbox stand-in for N
vs 4N executors) on the same input and report throughput at both plus
efficiency = (T_N / T_4N) / 4.

Usage: python scripts/scaling_bench.py [n_pages] [low_cpus] [high_cpus]
Writes BENCH/BASELINE.md and prints one JSON line.

Each level runs in its own subprocess so every measurement gets a fresh JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from ontoweaver_spark.session import get_spark
from ontoweaver_spark import extract
from ontoweaver_spark.pages import generate_pages, WEB_KG_MAPPING, web_kg

cpus = {cpus}
n = {n}
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8),
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.driver.memory": "24g"}})
pages = generate_pages(spark, n, seed=42, partitions=max(cpus * 2, 8)).cache()
pages.count()  # materialize input outside the timed section

t0 = time.time()
_, edges = extract(pages, WEB_KG_MAPPING, affix="none")
triples = edges.count()
extract_sec = time.time() - t0

t1 = time.time()
fnodes, fedges = web_kg(pages)
fused = fnodes.count() + fedges.count()
full_sec = time.time() - t1

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    r_low = run_level(low, n)
    r_high = run_level(high, n)

    ratio = high / low
    eff_extract = (r_low["extract_sec"] / r_high["extract_sec"]) / ratio
    eff_full = (r_low["full_sec"] / r_high["full_sec"]) / ratio
    result = {
        "n_pages": n,
        "low": r_low,
        "high": r_high,
        "parallelism_ratio": ratio,
        "scaling_efficiency_extract": round(eff_extract, 3),
        "scaling_efficiency_full": round(eff_full, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers

North-rule scaling evidence: the same KG-construction job (synthetic pages
-> triple extraction -> fusion) at two parallelism levels on the same input
(local[{low}] vs local[{high}], the sandbox stand-in for N vs 4N executors).

Input: {n:,} synthetic CC-style pages (deterministic, seed=42), cached
before timing so both levels read identical in-memory input.

| level | extract (s) | extract triples/s | extract+fuse (s) |
|---|---|---|---|
| local[{low}] | {r_low['extract_sec']} | {r_low['triples_per_sec']} | {r_low['full_sec']} |
| local[{high}] | {r_high['extract_sec']} | {r_high['triples_per_sec']} | {r_high['full_sec']} |

- triples extracted: {r_low['triples']:,}
- **scaling efficiency (extract, {low}->{high} cores): {eff_extract:.3f}**
- **scaling efficiency (extract+fusion, {low}->{high} cores): {eff_full:.3f}**
- target (north rule): >= 0.8 between N and 4N

Reproduce: `python scripts/scaling_bench.py {n} {low} {high}`
""")


if __name__ == "__main__":
    main()
