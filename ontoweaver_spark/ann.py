"""ANN index CLI: the user-facing entry for the trained-IVF scale path.

    python -m ontoweaver_spark.ann build EMB_PARQUET INDEX_DIR \
        [--n-centroids 8] [--iters 5] [--vec-col embedding] [--id-col vec_id]
    python -m ontoweaver_spark.ann query INDEX_DIR PROBES_PARQUET OUT_PARQUET \
        [--k 5] [--nprobe 2] [--vec-col embedding] [--id-col vec_id]

``build`` trains spherical k-means centroids over the embedding corpus and
persists them with the list-assigned corpus (``similarity.build_ivf_index``);
``query`` runs trained-IVF top-k against the persisted index
(``similarity.topk_ivf_indexed``) and writes the results as parquet.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ontoweaver_spark.ann", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="train centroids + persist the IVF index")
    b.add_argument("corpus", help="embedding corpus parquet")
    b.add_argument("index_dir", help="output index directory")
    b.add_argument("--n-centroids", type=int, default=8)
    b.add_argument("--iters", type=int, default=5)

    q = sub.add_parser("query", help="top-k search against a built index")
    q.add_argument("index_dir")
    q.add_argument("probes", help="probe vectors parquet")
    q.add_argument("out", help="output parquet for (probe_id, neighbor_id, cos, rank)")
    q.add_argument("--k", type=int, default=5)
    q.add_argument("--nprobe", type=int, default=2)

    for p in (b, q):
        p.add_argument("--vec-col", default="embedding")
        p.add_argument("--id-col", default="vec_id")
        p.add_argument("--master", default=None)

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .session import get_spark
    from .similarity import build_ivf_index, topk_ivf_indexed

    # only stop a session this invocation created — main() is also callable
    # in-process from a host application with its own live session
    owned = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="ontoweave-ann", master=args.master)
    if args.cmd == "build":
        manifest = build_ivf_index(
            spark.read.parquet(args.corpus), args.index_dir,
            n_centroids=args.n_centroids, iters=args.iters,
            vec_col=args.vec_col, id_col=args.id_col,
        )
        print(json.dumps(manifest))
    else:
        out = topk_ivf_indexed(
            spark, args.index_dir, spark.read.parquet(args.probes),
            k=args.k, nprobe=args.nprobe,
            vec_col=args.vec_col, id_col=args.id_col,
        )
        out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out, "rows": spark.read.parquet(args.out).count()}))
    if owned:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
