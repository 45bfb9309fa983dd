"""Scale evidence for the round-4 text/corpus operators: run
strip_boilerplate_lines, chunk_documents, pack_sequences and
tfidf_top_terms over N synthetic multi-line docs (heavy shared
boilerplate, Zipf-ish token mix) at two parallelism levels and report
per-op throughput plus low->high scaling efficiency.

Usage: python scripts/textops_scale_bench.py [n_docs] [low_cpus] [high_cpus] [ops]
``ops`` is a comma list of boilerplate,chunk,pack,tfidf (default all).
Prints one JSON line; numbers go into BENCH/BASELINE.md by hand.
Run the sub-second ops at >=8M docs so fixed job overhead (~0.4s) does
not swamp the measurement; tfidf is ~20x slower per doc, so 500k there.

Each level runs in its own subprocess (fresh JVM per measurement).
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
from pyspark.sql import functions as F
from ontoweaver_spark.session import get_spark
from ontoweaver_spark.textops import (
    chunk_documents, pack_sequences, strip_boilerplate_lines, tfidf_top_terms)

cpus = {cpus}
n = {n}
spark = get_spark(app_name=f"textops-scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus * 8, 64),
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.driver.memory": "48g"}})
# deterministic multi-line docs: ~40 body tokens from a 1k-word Zipf-ish
# vocab, a shared footer in EVERY doc (the hot line), a per-doc unique line
i = F.col("id")
word = lambda k: F.concat(F.lit("w"), ((i * (7 + k)) % (1 + (k * 37) % 997)).cast("string"))
body = F.concat_ws(" ", *[word(k) for k in range(40)])
docs = (spark.range(n, numPartitions=max(cpus * 8, 64))
        .select(i.alias("doc_id"),
                F.concat_ws(chr(10), body,
                            F.lit("(c) example corp all rights reserved"),
                            F.concat(F.lit("ref "), i.cast("string"))).alias("text"))
        .cache())
docs.count()  # materialize outside timed sections

def best3(fn):
    t = []
    for _ in range(3):
        t0 = time.time(); fn(); t.append(time.time() - t0)
    return min(t)

ops = {ops!r}
res = {{"cpus": cpus, "n_docs": n}}
# aggregate over the COMPUTED columns, never bare count(): count lets
# Catalyst prune the payload expressions (boilerplate's reassembled text,
# pack's cumsum) and times an empty shell of the plan
agg = lambda df, c: df.agg(F.sum(c)).collect()
if "boilerplate" in ops:
    res["boilerplate_s"] = best3(lambda: agg(
        strip_boilerplate_lines(docs, max_line_docs=10), F.length("clean_text")))
if "chunk" in ops:
    res["chunk_s"] = best3(lambda: agg(
        chunk_documents(docs, chunk_tokens=20, overlap=5), F.length("chunk")))
if "pack" in ops:
    res["pack_s"] = best3(lambda: agg(
        pack_sequences(docs, seq_len=2048), F.col("seq_id") + F.col("start_tok")))
if "tfidf" in ops:
    res["tfidf_s"] = best3(lambda: agg(
        tfidf_top_terms(docs, k=3, max_df_frac=0.5), F.col("score") + F.col("tf")))
print("CHILD_JSON " + json.dumps(res))
spark.stop()
"""


def run(cpus: int, n: int, ops: tuple[str, ...]) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, n=n, ops=ops)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_JSON "):
            return json.loads(line[len("CHILD_JSON "):])
    raise RuntimeError(f"child failed: {out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ops = tuple(
        sys.argv[4].split(",") if len(sys.argv) > 4
        else ("boilerplate", "chunk", "pack", "tfidf")
    )
    a, b = run(lo, n, ops), run(hi, n, ops)
    ratio = hi / lo
    out = {"n_docs": n, "low": a, "high": b, "efficiency": {}}
    for op in [o + "_s" for o in ops]:
        speedup = a[op] / b[op]
        out["efficiency"][op.replace("_s", "")] = {
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / ratio, 3),
            "docs_per_sec_high": round(n / b[op], 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
