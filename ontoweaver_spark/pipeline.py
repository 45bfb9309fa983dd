"""End-to-end pipeline: read -> extract -> (checkpoint) -> fuse -> write,
with per-partition lineage + metrics and chunk-level resume.

The reference funnels everything into BioCypher writers
(/root/reference/src/ontoweaver/__init__.py:640-673) with no checkpointing;
this module is the Spark-native analog required by the north rule:

- **Phase 1 (extract)** is a row-local flatMap, embarrassingly parallel: the
  input is split into deterministic chunks (hash of a stable key); each
  chunk's raw nodes/edges are written to a staging area and recorded in a
  JSON manifest with lineage (input path, mapping hash, chunk id) and
  metrics (rows in, nodes/edges out). A re-run skips chunks already in the
  manifest — extraction work is never repeated after a crash.
- **Phase 2 (fuse)** reads all staged chunks and runs the global
  reconciliation, writing final nodes/edges parquet partitioned by label
  (partition pruning for per-type consumers) plus a run manifest.

At cluster scale each phase is one spark-submit-able job; staging parquet
plays the role of an Iceberg snapshot boundary.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compiler import EDGE_SCHEMA, NODE_SCHEMA, compile_mapping
from .fusion import reconciliate
from .spec import MappingSpec, load_mapping


@dataclass
class RunReport:
    out_dir: str
    mapping_hash: str
    chunks_total: int = 0
    chunks_resumed: int = 0
    chunks_extracted: int = 0
    rows_in: int = 0
    raw_nodes: int = 0
    raw_edges: int = 0
    fused_nodes: int = 0
    fused_edges: int = 0
    node_property_conflicts: int = 0
    edge_property_conflicts: int = 0
    seconds: float = 0.0
    partition_metrics: list = field(default_factory=list)
    integrity: Optional[dict] = None


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def _load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"chunks": {}, "final": None}


def _save_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))


def partition_metrics(df: DataFrame) -> list[dict]:
    """Per-partition row counts (lineage metric; executed as one cheap job)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    return [r.asDict() for r in rows]


def _clear_orphan_location(spark: SparkSession, table: str) -> None:
    """Remove a managed-table directory that has NO catalog owner — a
    leftover from a previous session's (local derby) metastore. Spark
    refuses to adopt such a location (LOCATION_ALREADY_EXISTS), and this
    only deletes when the catalog genuinely has no entry for ``table``.
    The managed layout is ``warehouse/<name>`` for the default database and
    ``warehouse/<db>.db/<name>`` otherwise."""
    if spark.catalog.tableExists(table):
        return
    import shutil
    from urllib.parse import urlparse

    parts = table.lower().split(".")
    name = parts[-1]
    db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("", "file"):
        base = wh.path if db == "default" else os.path.join(wh.path, f"{db}.db")
        stale = os.path.join(base, name)
        if os.path.isdir(stale):
            shutil.rmtree(stale, ignore_errors=True)


def write_bucketed_graph(
    fnodes: DataFrame,
    fedges: DataFrame,
    database: str = "kg",
    n_buckets: int = 64,
) -> None:
    """Materialize the fused graph as bucketed tables: nodes bucketed by
    ``id``, edges bucketed by ``src`` (the common join key for traversals).

    A downstream edge->node join on pre-bucketed tables needs NO shuffle —
    both sides are already hash-partitioned on the join key on disk
    (SortMergeJoin with zero Exchange; verified in
    tests/test_bucketed_graph.py). At 100 TB this turns every
    neighborhood-expansion query from a full-graph shuffle into a
    partition-local merge. Bucket count should match the downstream
    parallelism target (buckets = max useful tasks for the join).
    """
    spark = fnodes.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    _clear_orphan_location(spark, f"{database}.nodes")
    _clear_orphan_location(spark, f"{database}.edges")
    (
        fnodes.write.mode("overwrite")
        .bucketBy(n_buckets, "id").sortBy("id")
        .saveAsTable(f"{database}.nodes")
    )
    (
        fedges.write.mode("overwrite")
        .bucketBy(n_buckets, "src").sortBy("src")
        .saveAsTable(f"{database}.edges")
    )


def write_graph_catalog_tables(
    fnodes: DataFrame,
    fedges: DataFrame,
    prefix: str,
    fmt: Optional[str] = None,
    partition_col: str = "label",
) -> None:
    """Materialize the fused graph through the DataSourceV2 ``writeTo``
    API into catalog tables ``<prefix>_nodes`` / ``<prefix>_edges``,
    label-partitioned — the Iceberg-sink shape of the north rule.

    On a cluster with an Iceberg catalog configured pass ``fmt="iceberg"``
    and a catalog-qualified prefix (``lake.db.graph``): you get Iceberg
    tables with snapshot isolation and hidden partitioning, and
    ``read_table("iceberg:lake.db.graph_nodes")`` reads them back with
    pruning/pushdown intact. In this sandbox (no Iceberg runtime jar) the
    same call with ``fmt=None`` exercises the identical code path against
    the session catalog's default source — the gate is the cluster
    classpath, not this code."""
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import AnalysisException

    spark = fnodes.sparkSession
    for name, df in (("nodes", fnodes), ("edges", fedges)):
        table = f"{prefix}_{name}"
        writer = df.writeTo(table).partitionedBy(F.col(partition_col))
        writer = writer.using(fmt or "parquet")
        try:
            # atomic swap on real V2 catalogs (Iceberg RTAS)
            writer.createOrReplace()
        except AnalysisException:
            # V1 session-catalog fallback (no REPLACE TABLE AS SELECT).
            # A managed location with NO catalog entry is an orphan from a
            # previous metastore (local derby dies with the session); Spark
            # refuses to adopt it (LOCATION_ALREADY_EXISTS), so clear it —
            # only when the catalog genuinely has no owner for it.
            _clear_orphan_location(spark, table)
            (
                df.write.mode("overwrite")
                .format(fmt or "parquet")
                .partitionBy(partition_col)
                .saveAsTable(table)
            )


def run_pipeline(
    spark: SparkSession,
    input_df: Union[DataFrame, str],
    mapping: Union[dict, str, MappingSpec],
    out_dir: str,
    affix: str = "none",
    type_affix_sep: str = ":",
    reconciliate_sep: str = "|",
    chunk_key: Optional[str] = None,
    n_chunks: int = 1,
    salt: int = 0,
    raise_errors: bool = False,
    validate_mode: str = "report",
    property_mergers: Optional[dict] = None,
    prop_sep: Optional[str] = None,
    sort: Optional[str] = None,
    validate_output: bool = False,
    bucketed_out: Optional[str] = None,
    neo4j_out: Optional[str] = None,
) -> RunReport:
    """Run the full pipeline with checkpoint/resume.

    ``prop_sep`` / ``sort`` / ``validate_output`` / ``bucketed_out`` mirror
    the CLI's post-fusion flags so the chunked path honors them too
    (integrity is checked PRE-render, on raw ids, exactly like the
    single-shot path): render multi-valued properties joined with
    ``prop_sep``; natural-order ``sort`` ("ascend"/"descend") by id before
    writing; ``validate_output`` runs final-graph invariants into
    ``report.integrity``; ``bucketed_out`` also materializes bucketed
    tables in that database; ``neo4j_out`` writes the Neo4j bulk-import
    directory PRE-render (from array-typed properties, so multi-valued
    props get ``:string[]`` headers), the same ordering as the single-shot
    CLI path — exporting from the final parquet after ``prop_sep``
    rendering would emit scalar joined-string columns instead.

    ``chunk_key``: stable column used to split the input into resumable
    chunks (e.g. ``url``). With ``n_chunks=1`` staging is a single snapshot.

    ``validate_mode``: what a mapping-level ``validate:`` section does with
    invalid rows — the pipeline default is ``"report"`` (drop + surface the
    per-rule violation counts in the manifest); ``"raise"`` matches the
    reference's fail-loud InputValidator; ``"filter"`` drops silently.

    ``property_mergers``: optional {property name -> mergers.Merger} applied
    to the fused nodes before writing (``mergers.render_properties``); any
    ``EnsureIdentical`` conflicts they render are counted into the manifest
    as ``property_conflicts`` instead of merging silently.
    """
    t0 = time.time()
    if isinstance(input_df, str):
        input_df = spark.read.parquet(input_df)
    spec = mapping if isinstance(mapping, MappingSpec) else load_mapping(mapping)
    mhash = spec.spec_hash()

    staging = os.path.join(out_dir, "staging")
    manifest = _load_manifest(out_dir)
    # ANY parameter that affects chunk content invalidates the resume —
    # re-running the same out_dir with a different --affix must not reuse
    # chunks extracted under the old one
    extract_conf = {
        "mapping_hash": mhash, "affix": affix, "type_affix_sep": type_affix_sep,
        "n_chunks": n_chunks, "chunk_key": chunk_key,
        "validate_mode": validate_mode,
    }
    prior = manifest.get("extract_conf") or (
        # legacy manifests keyed only on mapping_hash: treat as mismatched
        # unless it is genuinely the same spec with default everything
        None if manifest.get("mapping_hash") is None else {"legacy": True}
    )
    if prior not in (None, extract_conf):
        manifest = {"chunks": {}, "final": None}
    manifest["extract_conf"] = extract_conf
    manifest["mapping_hash"] = mhash

    report = RunReport(out_dir=out_dir, mapping_hash=mhash, chunks_total=n_chunks)

    todo = [c for c in range(n_chunks) if not manifest["chunks"].get(str(c), {}).get("done")]

    # ---- phase 0: input validation (once, surfaced in the manifest) --------
    if spec.input_rules and validate_mode == "report":
        # staged input was written from already-validated rows: a crash-resume
        # with chunks left must not re-scan the raw input just to recompute
        # counts the manifest already holds
        if todo and not manifest.get("input_staged"):
            from .validate import validate_input

            input_df, vreport = validate_input(input_df, spec.input_rules)
            manifest["validation"] = {
                "total": vreport.total, "valid": vreport.valid,
                "invalid": vreport.invalid, "per_rule": vreport.per_rule,
            }
        # else: fully-resumed run — the counts from the original pass are
        # already in the manifest; recomputing them here would charge every
        # resume a full input scan (100 TB) before the manifest is even read
        # rules already applied (or nothing left to extract); chunks compile
        # with a plain filter (no-op)
        chunk_validate_mode = "filter"
    else:
        chunk_validate_mode = validate_mode

    # ---- phase 1: chunked extraction with resume ---------------------------
    # Multi-chunk runs stage the input ONCE, written partitioned by chunk id
    # (one full input scan total). Each chunk's extraction then reads only
    # its own partition directory (partition pruning) — the previous
    # where(pmod(hash)) approach re-scanned the ENTIRE input once per chunk:
    # n_chunks full scans of a 100 TB table.
    if n_chunks > 1 and todo:
        stage_in = os.path.join(out_dir, "staging_input")
        if not manifest.get("input_staged"):
            key = F.col(chunk_key) if chunk_key else F.concat_ws("\x1f", *input_df.columns)
            (
                input_df
                .withColumn("_ow_chunk", F.pmod(F.xxhash64(key), F.lit(n_chunks)))
                .write.mode("overwrite").partitionBy("_ow_chunk").parquet(stage_in)
            )
            manifest["input_staged"] = True
            _save_manifest(out_dir, manifest)
        staged_input = spark.read.parquet(stage_in)

    for chunk in range(n_chunks):
        ckey = str(chunk)
        node_path = os.path.join(staging, f"chunk-{chunk}", "nodes")
        edge_path = os.path.join(staging, f"chunk-{chunk}", "edges")
        if manifest["chunks"].get(ckey, {}).get("done"):
            report.chunks_resumed += 1
            continue

        if n_chunks > 1:
            part = staged_input.where(F.col("_ow_chunk") == chunk).drop("_ow_chunk")
        else:
            part = input_df

        res = compile_mapping(
            part, spec, affix=affix, type_affix_sep=type_affix_sep,
            validate_mode=chunk_validate_mode,
        )
        res.nodes.write.mode("overwrite").parquet(node_path)
        res.edges.write.mode("overwrite").parquet(edge_path)

        pm = partition_metrics(part)
        n_rows = sum(m["rows"] for m in pm)
        # explicit schemas: an edge-less mapping writes an EMPTY parquet
        # directory whose schema cannot be inferred back
        n_nodes = spark.read.schema(NODE_SCHEMA).parquet(node_path).count()
        n_edges = spark.read.schema(EDGE_SCHEMA).parquet(edge_path).count()
        manifest["chunks"][ckey] = {
            "done": True,
            "rows_in": n_rows,
            "nodes": n_nodes,
            "edges": n_edges,
            "partitions": pm,
            "lineage": {**extract_conf, "chunk": chunk},
            "ts": time.time(),
        }
        _save_manifest(out_dir, manifest)
        report.chunks_extracted += 1
        report.partition_metrics.extend(pm)

    report.rows_in = sum(c.get("rows_in", 0) for c in manifest["chunks"].values())
    report.raw_nodes = sum(c.get("nodes", 0) for c in manifest["chunks"].values())
    report.raw_edges = sum(c.get("edges", 0) for c in manifest["chunks"].values())

    # ---- phase 2: global fusion + final write -------------------------------
    fusion_conf = {"reconciliate_sep": reconciliate_sep, "salt": salt,
                   "n_chunks": n_chunks,
                   # merger functions aren't hashable across runs; keying on
                   # the property-name set invalidates the snapshot when the
                   # merged property SET changes (same-name merger swaps
                   # still require a fresh out_dir)
                   "property_mergers": sorted(property_mergers or []),
                   # post-fusion output shaping also invalidates the snapshot
                   "prop_sep": prop_sep, "sort": sort,
                   "validate_output": validate_output,
                   "bucketed_out": bucketed_out,
                   "neo4j_out": neo4j_out}
    final = manifest.get("final")
    if (
        report.chunks_extracted == 0
        and final
        and final.get("fusion_conf") == fusion_conf
    ):
        # full resume: no chunk re-extracted and the fused snapshot was
        # built from exactly these chunks with the same fusion parameters —
        # reuse it instead of re-shuffling the staged output
        report.fused_nodes = final["nodes"]
        report.fused_edges = final["edges"]
        pc = final.get("property_conflicts") or {}
        report.node_property_conflicts = pc.get("nodes", 0)
        report.edge_property_conflicts = pc.get("edges", 0)
        report.integrity = final.get("integrity")
        report.seconds = time.time() - t0
        return report

    node_paths = [os.path.join(staging, f"chunk-{c}", "nodes") for c in range(n_chunks)]
    edge_paths = [os.path.join(staging, f"chunk-{c}", "edges") for c in range(n_chunks)]
    raw_nodes = spark.read.schema(NODE_SCHEMA).parquet(*node_paths)
    raw_edges = spark.read.schema(EDGE_SCHEMA).parquet(*edge_paths)
    eff_salt = salt
    if salt == -1:
        # auto: heavy-hitter sample over the staged raw node ids
        from .fusion import suggest_salt

        eff_salt = suggest_salt(raw_nodes, ["id"])
    fnodes, fedges = reconciliate(
        raw_nodes, raw_edges,
        reconciliate_sep=reconciliate_sep, raise_errors=raise_errors, salt=eff_salt,
    )
    if property_mergers:
        from .mergers import render_properties

        fnodes = render_properties(fnodes, sep=reconciliate_sep,
                                   prop_mergers=property_mergers)
    if bucketed_out:
        write_bucketed_graph(fnodes, fedges, database=bucketed_out)
    if neo4j_out:
        # PRE-render, like the single-shot CLI: the emitter renders arrays
        # itself (`:string[]` headers + its own delimiter)
        from .neo4j_export import write_neo4j_import

        write_neo4j_import(fnodes, fedges, neo4j_out)
    if validate_output:
        # PRE-render, on raw ids — same order as the single-shot CLI path
        from .validate import graph_integrity

        report.integrity = graph_integrity(fnodes, fedges)
    if prop_sep is not None:
        from .fusion import format_for_export

        fnodes = format_for_export(fnodes, sep=prop_sep)
        fedges = format_for_export(fedges, sep=prop_sep)
    if sort:
        from .ids import natural_sort_key

        asc = sort == "ascend"
        key_n, key_e = natural_sort_key(fnodes.id), natural_sort_key(fedges.id)
        fnodes = fnodes.orderBy(key_n.asc() if asc else key_n.desc())
        fedges = fedges.orderBy(key_e.asc() if asc else key_e.desc())
    final_nodes = os.path.join(out_dir, "nodes")
    final_edges = os.path.join(out_dir, "edges")
    fnodes.write.mode("overwrite").partitionBy("label").parquet(final_nodes)
    fedges.write.mode("overwrite").partitionBy("label").parquet(final_edges)

    # one aggregation per table: total + EnsureIdentical conflict count
    # (conflicts render as !CONFLICT!-marked values; counting them here
    # surfaces what would otherwise merge silently)
    from .fusion import has_property_conflict

    def _count_with_conflicts(path: str, schema) -> tuple[int, int]:
        # explicit schema: an empty table (edge-less mapping) writes a
        # directory whose schema cannot be inferred back
        t = spark.read.schema(schema).parquet(path)
        row = t.agg(
            F.count("*").alias("n"),
            F.sum(has_property_conflict(t).cast("long")).alias("c"),
        ).collect()[0]
        return row["n"], row["c"] or 0

    report.fused_nodes, report.node_property_conflicts = _count_with_conflicts(
        final_nodes, fnodes.schema)
    report.fused_edges, report.edge_property_conflicts = _count_with_conflicts(
        final_edges, fedges.schema)
    report.seconds = time.time() - t0

    manifest["final"] = {
        "nodes": report.fused_nodes,
        "edges": report.fused_edges,
        "property_conflicts": {
            "nodes": report.node_property_conflicts,
            "edges": report.edge_property_conflicts,
        },
        "nodes_path": final_nodes,
        "edges_path": final_edges,
        "fusion_conf": fusion_conf,
        "integrity": report.integrity,
        "seconds": report.seconds,
        "ts": time.time(),
    }
    _save_manifest(out_dir, manifest)
    return report
