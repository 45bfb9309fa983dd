"""Measure the incremental-upsert claim: folding a small new batch into an
already fused graph (fusion.merge_into_graph) vs re-fusing everything from
scratch. The continuous-crawl cost model only works if the merge is
batch-proportional, not history-proportional.

Usage: python scripts/incremental_bench.py [n_history] [n_batch]
Prints one JSON line and appends nothing (numbers go into BENCH/BASELINE.md
by hand).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontoweaver_spark import extract  # noqa: E402
from ontoweaver_spark.fusion import merge_into_graph, reconciliate  # noqa: E402
from ontoweaver_spark.pages import WEB_KG_MAPPING, generate_pages  # noqa: E402
from ontoweaver_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_hist = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        app_name="incremental-bench", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
    )

    hist_pages = generate_pages(spark, n_hist, seed=42, partitions=cpus * 8)
    batch_pages = generate_pages(spark, n_batch, seed=7, partitions=cpus)
    hn, he = extract(hist_pages, WEB_KG_MAPPING, affix="none")
    bn, be = extract(batch_pages, WEB_KG_MAPPING, affix="none")

    # materialize the fused history once, as parquet (the realistic shape:
    # the history lives on disk between batches, not in a live plan)
    import tempfile

    d = tempfile.mkdtemp(prefix="incbench_")
    t0 = time.time()
    fn, fe = reconciliate(hn, he, raise_errors=False)
    fn.write.mode("overwrite").parquet(f"{d}/nodes")
    fe.write.mode("overwrite").parquet(f"{d}/edges")
    t_full_build = time.time() - t0
    old_n = spark.read.parquet(f"{d}/nodes")
    old_e = spark.read.parquet(f"{d}/edges")

    # incremental: fuse the batch alone + one join against the history
    t0 = time.time()
    mn, me = merge_into_graph(old_n, old_e, bn, be, raise_errors=False)
    inc_counts = (mn.count(), me.count())
    t_incremental = time.time() - t0

    # from-scratch: re-fuse history-raw union batch-raw
    t0 = time.time()
    sn, se = reconciliate(
        hn.unionByName(bn), he.unionByName(be), raise_errors=False
    )
    scratch_counts = (sn.count(), se.count())
    t_scratch = time.time() - t0

    result = {
        "n_history_pages": n_hist,
        "n_batch_pages": n_batch,
        "fused_history_build_sec": round(t_full_build, 2),
        "incremental_merge_sec": round(t_incremental, 2),
        "refuse_from_scratch_sec": round(t_scratch, 2),
        "speedup": round(t_scratch / t_incremental, 2),
        "counts_match": inc_counts == scratch_counts,
        "nodes": inc_counts[0],
        "edges": inc_counts[1],
        "cpus": cpus,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
