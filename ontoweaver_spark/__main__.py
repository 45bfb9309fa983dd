"""CLI: the ``ontoweave`` analog (/root/reference/src/ontoweaver/ontoweave.py).

    python -m ontoweaver_spark DATA:MAPPING [DATA:MAPPING ...] \
        --out OUT_DIR [--affix none|prefix|suffix] [--affix-sep :] \
        [--reconciliate-sep "|"] [--chunks N] [--salt K] \
        [--register module.py] [--sub-sample PCT] [--master local[*]]

Each DATA:MAPPING pair is extracted; results union before one global
reconciliation (multi-source fusion, reference __init__.py:504-530); final
nodes/edges land in OUT_DIR as label-partitioned parquet with a manifest.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ontoweaver_spark", description=__doc__)
    ap.add_argument("pairs", nargs="+", metavar="DATA:MAPPING",
                    help="input table path and mapping YAML, colon-separated")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--affix", default="none", choices=["none", "prefix", "suffix"])
    ap.add_argument("--affix-sep", default=":")
    ap.add_argument("--reconciliate-sep", default="|")
    ap.add_argument("--chunks", type=int, default=1, help="resumable extraction chunks")
    ap.add_argument("--salt", type=int, default=0, help="fusion salt partitions (hub skew)")
    ap.add_argument("--register", action="append", default=[],
                    help="user transformer module path (may repeat)")
    ap.add_argument("--sub-sample", type=float, default=None, help="percent sample")
    ap.add_argument("--master", default=None)
    ap.add_argument("--sort", default=None, choices=["ascend", "descend"],
                    help="sort output by id before writing")
    ap.add_argument("--auto-schema", default=None, metavar="PATH",
                    help="derive a schema YAML from the mapping(s) and exit "
                         "(the reference's --auto-schema analog)")
    args = ap.parse_args(argv)

    from . import registry
    from .fusion import reconciliate
    from .loaders import read_table, sub_sample
    from .pipeline import _save_manifest
    from .session import get_spark
    from .spec import load_mapping

    for mod in args.register:
        registry.import_from_path(mod)

    if args.auto_schema:
        import yaml
        schema: dict = {}
        for pair in args.pairs:
            _, _, mapping_path = pair.rpartition(":")
            schema.update(load_mapping(mapping_path).autoschema())
        with open(args.auto_schema, "w") as f:
            yaml.safe_dump(schema, f, sort_keys=True)
        print(json.dumps({"auto_schema": args.auto_schema, "types": len(schema)}))
        return 0

    spark = get_spark(app_name="ontoweave-spark", master=args.master)

    from .compiler import compile_mapping

    if args.chunks > 1:
        # resumable chunked path (single source): manifest-tracked extraction
        if len(args.pairs) != 1:
            ap.error("--chunks requires exactly one DATA:MAPPING pair")
        from .pipeline import run_pipeline

        data_path, _, mapping_path = args.pairs[0].rpartition(":")
        df = read_table(spark, data_path)
        if args.sub_sample:
            df = sub_sample(df, args.sub_sample)
        report = run_pipeline(
            spark, df, load_mapping(mapping_path), args.out,
            affix=args.affix, type_affix_sep=args.affix_sep,
            reconciliate_sep=args.reconciliate_sep,
            n_chunks=args.chunks, salt=args.salt,
        )
        print(json.dumps({
            "nodes": report.fused_nodes, "edges": report.fused_edges,
            "out": args.out, "chunks_resumed": report.chunks_resumed,
            "chunks_extracted": report.chunks_extracted,
        }))
        spark.stop()
        return 0

    all_nodes, all_edges = None, None
    for pair in args.pairs:
        data_path, _, mapping_path = pair.rpartition(":")
        if not data_path:
            ap.error(f"expected DATA:MAPPING, got {pair!r}")
        df = read_table(spark, data_path)
        if args.sub_sample:
            df = sub_sample(df, args.sub_sample)
        res = compile_mapping(
            df, load_mapping(mapping_path),
            affix=args.affix, type_affix_sep=args.affix_sep,
        )
        all_nodes = res.nodes if all_nodes is None else all_nodes.unionByName(res.nodes)
        all_edges = res.edges if all_edges is None else all_edges.unionByName(res.edges)

    fnodes, fedges = reconciliate(
        all_nodes, all_edges,
        reconciliate_sep=args.reconciliate_sep, raise_errors=False, salt=args.salt,
    )
    if args.sort:
        # natural order like the reference's natsort --sort
        # (ontoweave.py:405-412): id2 before id10
        from .ids import natural_sort_key

        asc = args.sort == "ascend"
        key_n = natural_sort_key(fnodes.id)
        key_e = natural_sort_key(fedges.id)
        fnodes = fnodes.orderBy(key_n.asc() if asc else key_n.desc())
        fedges = fedges.orderBy(key_e.asc() if asc else key_e.desc())

    import os
    nodes_path, edges_path = os.path.join(args.out, "nodes"), os.path.join(args.out, "edges")
    fnodes.write.mode("overwrite").partitionBy("label").parquet(nodes_path)
    fedges.write.mode("overwrite").partitionBy("label").parquet(edges_path)
    n, e = (
        spark.read.parquet(nodes_path).count(),
        spark.read.parquet(edges_path).count(),
    )
    _save_manifest(args.out, {
        "chunks": {}, "final": {"nodes": n, "edges": e,
                                "nodes_path": nodes_path, "edges_path": edges_path},
        "inputs": args.pairs,
    })
    print(json.dumps({"nodes": n, "edges": e, "out": args.out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
