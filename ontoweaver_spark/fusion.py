"""Reconciliation / fusion: the engine's only shuffle stage.

Reproduces the reference fusion semantics
(/root/reference/src/ontoweaver/fusion.py:146-255) as groupBy aggregations:

- nodes congregate on **ID alone** (serialize.ID, fusion.py:173-177);
  label merge = EnsureIdentical (merge.py:254-265) -> conflicting labels for
  one ID raise (or are kept sorted-first when ``raise_errors=False``);
  properties merge = per-key set union (merge.dictry.Append, merge.py:166-202).
- edges congregate on (src, dst, label) (serialize.SourceTargetLabel);
  ID merge = OrderedSet joined with the separator (merge.py:348-371);
  src/dst = UseLast; properties = set union.

Determinism note: the reference's property union is a Python ``set`` whose
join order is nondeterministic (merge.py:196-202) and its OrderedSet keeps
encounter order, which is not reproducible under distributed execution. We
emit **sorted** unions — deterministic at any parallelism — and golden
comparisons treat multi-valued properties as sets (same policy as the
reference's own tests, /root/reference/tests/testing_functions.py:28-59).

Scale: hub entities (very frequent IDs at 10^12-doc scale) skew the
groupBy. Defense layers: (1) AQE skew handling, (2) optional salted
two-phase aggregation — partial per-(key, salt) distinct-union, then final
per-key merge — enabled with ``salt > 1``. collect_list/collect_set also
merge partially map-side, so post-salt state is bounded by distinct values
per key, not by duplicate count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FusionError(ValueError):
    """Label conflict under EnsureIdentical (merge.py:254-265).

    The default fusion path now surfaces conflicts at execution via
    ``raise_error`` inside the label projection (zero extra jobs); this
    class remains for API compatibility and driver-side validation."""


def _merge_props(
    df: DataFrame, keys: list[str], salt: int = 0, carry: list[str] = ()
) -> DataFrame:
    """Merge ``properties`` (map<string,array<string>>) per key-tuple:
    per-property-name distinct sorted union of all values. Also collects the
    distinct ``label`` set per key-tuple as ``_all_labels``, plus a sorted
    distinct set for every ``carry`` column as ``_all_<col>`` (used to fold
    the edge-ID OrderedSet merge into the same aggregation pass — one scan,
    no extra shuffle or join).

    Shuffle shape: one hash aggregation on (keys..., prop key) then one on
    (keys...), both AQE-coalesced; with ``salt>1`` an extra pre-aggregation
    on (keys..., prop key, salt) splits hub keys across tasks first.
    """
    label = F.col("label") if "label" in df.columns else F.lit(None).cast("string")
    exploded = df.select(
        *keys,
        label.alias("_lbl"),
        *[F.col(c).alias(f"_c_{c}") for c in carry],
        F.explode_outer("properties").alias("key", "vals"),
    )

    def _sets(stage: str):
        """collect/merge the label + carry sets at each aggregation stage."""
        if stage == "pre":
            return [F.collect_set("_lbl").alias("_lbls")] + [
                F.collect_set(f"_c_{c}").alias(f"_cs_{c}") for c in carry
            ]
        return [
            F.array_distinct(F.flatten(F.collect_list("_lbls"))).alias("_lbls")
        ] + [
            F.array_distinct(F.flatten(F.collect_list(f"_cs_{c}"))).alias(f"_cs_{c}")
            for c in carry
        ]

    if salt and salt > 1:
        pre = exploded.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(F.coalesce(F.concat_ws("\x1f", F.col("vals")), F.lit(""))),
                F.lit(salt),
            ),
        ).groupBy(*keys, "key", "_salt").agg(
            F.array_distinct(F.flatten(F.collect_list("vals"))).alias("vals"),
            *_sets("pre"),
        )
        per_prop = pre.groupBy(*keys, "key").agg(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("vals")))).alias("vals"),
            *_sets("merge"),
        )
    else:
        per_prop = exploded.groupBy(*keys, "key").agg(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("vals")))).alias("vals"),
            *_sets("pre"),
        )

    return per_prop.groupBy(*keys).agg(
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("key").isNotNull(), F.struct(F.col("key"), F.col("vals")))
            )
        ).alias("properties"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_lbls")))).alias("_all_labels"),
        *[
            F.array_sort(F.array_distinct(F.flatten(F.collect_list(f"_cs_{c}")))).alias(f"_all_{c}")
            for c in carry
        ],
    )


def reconciliate_nodes(
    nodes: DataFrame, raise_errors: bool = True, salt: int = 0, label_merger=None
) -> DataFrame:
    """Group nodes by ID; merge labels (EnsureIdentical by default, or a
    custom merger such as ``mergers.SpecificType`` for ontology-LCA
    resolution) and properties (set union). Output schema matches the input
    (id, label, properties).

    With ``raise_errors`` a label conflict raises AT EXECUTION, inside the
    label projection itself (``raise_error`` — the same zero-extra-job
    pattern as :func:`merge_into_graph`): plan construction stays lazy and
    no separate driver-side conflict-probe job runs. The error message
    names the conflicting node id and its label set."""
    merged = _merge_props(nodes, ["id"], salt=salt)
    if label_merger is not None:
        label_expr = label_merger(F.col("_all_labels"))
    elif raise_errors:
        label_expr = F.when(
            F.size("_all_labels") != 1,
            F.raise_error(F.concat(
                F.lit("reconciliate_nodes: conflicting labels for node id '"),
                F.col("id"), F.lit("': "),
                F.array_join("_all_labels", ", ", "NULL"),
            )).cast("string"),
        ).otherwise(F.element_at("_all_labels", 1))
    else:
        label_expr = F.element_at("_all_labels", 1)
    return merged.select("id", label_expr.alias("label"), "properties")


def reconciliate_edges(
    edges: DataFrame, reconciliate_sep: str = "|", salt: int = 0
) -> DataFrame:
    """Group edges by (src, dst, label); fuse IDs as a sorted distinct join
    (reference OrderedSet keeps encounter order — see module docstring).

    A raw edge id that itself contains ``reconciliate_sep`` raises at
    execution (inline in the projection, zero extra jobs): the joined id
    would be ambiguous to split back, silently breaking
    :func:`merge_into_graph`'s re-fusion-equivalence invariant. Pick a
    separator absent from the ids (the reference joins blindly and would
    emit the same ambiguous string without noticing)."""
    keys = ["src", "dst", "label"]
    merged = _merge_props(edges, keys, salt=salt, carry=["id"])
    sep_ok = F.when(
        F.exists("_all_id", lambda v: v.contains(reconciliate_sep)),
        F.raise_error(F.concat(
            F.lit("reconciliate_edges: raw edge id contains the "
                  f"reconciliate separator {reconciliate_sep!r} "
                  "(fused id would not split back losslessly): "),
            F.array_join("_all_id", " / "),
        )).cast("array<string>"),
    ).otherwise(F.col("_all_id"))
    return merged.select(
        F.array_join(sep_ok, reconciliate_sep).alias("id"),
        *keys,
        "properties",
    )


def reconciliate(
    nodes: DataFrame,
    edges: DataFrame,
    reconciliate_sep: str = "|",
    raise_errors: bool = True,
    salt: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Full reconciliation (fusion.reconciliate, fusion.py:258-300).

    Node IDs merge with UseKey, so the edge remap stage is a no-op by
    construction (the reference asserts the same, fusion.py:283-285).
    """
    fnodes = reconciliate_nodes(nodes, raise_errors=raise_errors, salt=salt)
    fedges = reconciliate_edges(edges, reconciliate_sep=reconciliate_sep, salt=salt)
    return fnodes, fedges


def suggest_salt(
    df: DataFrame,
    keys: list[str],
    sample_fraction: float = 0.01,
    rows_per_task: int = 2_000_000,
    max_salt: int = 256,
    seed: int = 42,
) -> int:
    """Heavy-hitter pre-pass: estimate the hottest fusion key from a sample
    and return a salt factor that splits it into ~``rows_per_task``-row
    partial groups (SURVEY.md §7 hub-skew plan).

    Cost: one pass over a 1% sample with a partial-aggregated groupBy —
    cheap relative to fusion itself, and the sample never leaves the
    executors except for one max row. Hub entities at web scale (a URL
    linked from 10^8 pages) otherwise put their whole group into one
    reducer task; ``salt=k`` bounds per-task group size at hot/k.
    """
    est = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(*keys)
        .count()
        .agg(F.max("count").alias("hot"))
        .collect()[0]["hot"]
    )
    if not est:
        return 0
    hottest = est / sample_fraction  # scale sample count to full data
    salt = int(hottest // rows_per_task) + 1
    return 0 if salt <= 1 else min(salt, max_salt)


def remap_edges(edges: DataFrame, id_mapping: DataFrame) -> DataFrame:
    """Rewrite edge endpoints through a node ID mapping (old_id -> new_id) —
    the analog of ``fusion.remap_edges``
    (/root/reference/src/ontoweaver/fusion.py:112-143), needed when node IDs
    merge with a non-default merger so fused nodes carry a new canonical ID.

    Two left joins against the (small) mapping; it is broadcast so the edge
    side — the big side — never shuffles. With the default UseKey node
    merger the mapping is empty and this is a no-op (the reference asserts
    the same, fusion.py:283-285)."""
    m = F.broadcast(id_mapping.select(
        F.col("old_id").alias("_ow_old"), F.col("new_id").alias("_ow_new")
    ))
    out = (
        edges.join(m, edges["src"] == F.col("_ow_old"), "left")
        .withColumn("src", F.coalesce(F.col("_ow_new"), F.col("src")))
        .drop("_ow_old", "_ow_new")
        .join(m, F.col("dst") == F.col("_ow_old"), "left")
        .withColumn("dst", F.coalesce(F.col("_ow_new"), F.col("dst")))
        .drop("_ow_old", "_ow_new")
    )
    return out


def _union_props(a, b):
    """Per-key sorted distinct union of two map<string,array<string>>
    property maps (null-safe) — the fused-property monoid operation."""
    ea = F.coalesce(a, F.create_map().cast("map<string,array<string>>"))
    eb = F.coalesce(b, F.create_map().cast("map<string,array<string>>"))
    return F.map_zip_with(
        ea, eb,
        lambda k, v1, v2: F.array_sort(F.array_distinct(F.concat(
            F.coalesce(v1, F.array().cast("array<string>")),
            F.coalesce(v2, F.array().cast("array<string>")),
        ))),
    )


def merge_into_graph(
    fused_nodes: DataFrame,
    fused_edges: DataFrame,
    new_nodes: DataFrame,
    new_edges: DataFrame,
    reconciliate_sep: str = "|",
    raise_errors: bool = True,
    salt: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Incremental fusion: fold a NEW raw extraction batch into an already
    fused graph, producing the same result as re-fusing everything from
    scratch (fusion is associative and idempotent on the set-union algebra
    — the same invariance the chunk-resume property tests pin down).

    This is the continuous-crawl shape at 100 TB: only the new batch is
    aggregated (its own shuffle, sized by the batch); the existing graph is
    touched by ONE full-outer join on the fused key. When the old graph is
    read back from ``pipeline.write_bucketed_graph`` tables (bucketed by
    ``id`` / ``src``), that join co-locates on the bucket columns instead
    of re-shuffling the full history every batch.

    Label conflicts between old and new follow ``raise_errors``: True
    raises at execution naming the ID (EnsureIdentical parity); False keeps
    the lexicographically smaller label (sorted-first, the same policy as
    ``reconciliate_nodes(raise_errors=False)``).
    """
    bn, be = reconciliate(
        new_nodes, new_edges,
        reconciliate_sep=reconciliate_sep, raise_errors=raise_errors, salt=salt,
    )

    ol, nl = F.col("_old_label"), F.col("_new_label")
    if raise_errors:
        label = F.when(
            ol.isNotNull() & nl.isNotNull() & (ol != nl),
            F.raise_error(F.concat(
                F.lit("merge_into_graph: conflicting labels for node id '"),
                F.col("id"), F.lit("': "), ol, F.lit(" vs "), nl,
            )).cast("string"),
        ).otherwise(F.coalesce(ol, nl))
    else:
        label = F.least(ol, nl)  # least() skips nulls: sorted-first policy
    nodes = (
        fused_nodes.select(
            "id", F.col("label").alias("_old_label"),
            F.col("properties").alias("_old_props"),
        )
        .join(
            bn.select(
                "id", F.col("label").alias("_new_label"),
                F.col("properties").alias("_new_props"),
            ),
            "id", "full",
        )
        .select(
            "id",
            label.alias("label"),
            _union_props(F.col("_old_props"), F.col("_new_props")).alias("properties"),
        )
    )

    keys = ["src", "dst", "label"]
    import re as _re

    def pieces(c):
        return F.split(c, _re.escape(reconciliate_sep), -1)

    edges = (
        fused_edges.select(
            *keys, F.col("id").alias("_old_id"),
            F.col("properties").alias("_old_props"),
        )
        .join(
            be.select(
                *keys, F.col("id").alias("_new_id"),
                F.col("properties").alias("_new_props"),
            ),
            keys, "full",
        )
        .select(
            F.array_join(
                F.array_sort(F.array_distinct(F.concat(
                    F.coalesce(pieces(F.col("_old_id")), F.array().cast("array<string>")),
                    F.coalesce(pieces(F.col("_new_id")), F.array().cast("array<string>")),
                ))),
                reconciliate_sep,
            ).alias("id"),
            *keys,
            _union_props(F.col("_old_props"), F.col("_new_props")).alias("properties"),
        )
    )
    return nodes, edges


from .mergers import CONFLICT_MARKER  # noqa: E402  (single source of truth)


def has_property_conflict(df: DataFrame, props_col: str = "properties") -> "Column":
    """Boolean Column: any property value carries the EnsureIdentical
    conflict marker (mergers.EnsureIdentical renders disagreeing values as
    ``!CONFLICT!a|b`` because a per-row raise is not expressible
    mid-aggregation). Use it to COUNT conflicts into run metrics instead of
    letting them pass silently. Handles both the pre-render
    map<string,array<string>> and the rendered map<string,string> shapes."""
    vtype = df.schema[props_col].dataType.valueType.simpleString()
    vals = F.map_values(props_col)
    if vtype.startswith("array"):
        vals = F.flatten(vals)
    return F.exists(vals, lambda v: v.startswith(CONFLICT_MARKER))


def format_for_export(df: DataFrame, sep: str = "|") -> DataFrame:
    """Render properties map<string,array<string>> -> map<string,string>:
    single-item lists collapse to the scalar
    (/root/reference/src/ontoweaver/iterative.py:196-201); multi-item lists
    join with the separator (merge.dictry.Append.get, merge.py:196-202)."""
    return df.withColumn(
        "properties",
        F.transform_values(
            "properties",
            lambda k, v: F.when(F.size(v) == 1, F.element_at(v, 1)).otherwise(
                F.array_join(v, sep)
            ),
        ),
    )


def retract_from_graph(
    fused_nodes: DataFrame,
    fused_edges: DataFrame,
    tombstones: DataFrame,
    drop_orphans: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Right-to-be-forgotten cascade: remove every tombstoned SUBJECT from
    the fused graph — the node, all its incident edges, and (by default)
    any object node left with no remaining edge at all — without
    re-running fusion. ``tombstones`` is one column ``id``. The inverse
    lifecycle half of :func:`merge_into_graph` (that one folds a batch
    IN; this folds one OUT), and the operation a crawl pipeline runs on
    takedown/robots-revocation lists (reference keeps graphs append-only
    and re-runs; a 10^12-triple graph cannot).

    Orphan rule: a node is dropped iff it is tombstoned, or it has zero
    incident edges AFTER the retraction but had at least one BEFORE
    (pre-existing isolated nodes — e.g. property-only subjects — are
    preserved; deleting them would make retraction non-idempotent on
    graphs that legitimately contain isolated nodes).

    Shape: three anti/semi joins on the node-id key, tombstones broadcast
    (takedown lists are small; drop the hint if yours is not), endpoint
    sets derived with one distinct-union per side. No window, no
    collect.
    """
    tomb = F.broadcast(tombstones.select(F.col("id").cast("string").alias("id")).distinct())
    kept_edges = (
        fused_edges.join(tomb, fused_edges["src"] == tomb["id"], "left_anti")
        .join(tomb, F.col("dst") == tomb["id"], "left_anti")
    )
    kept_nodes = fused_nodes.join(tomb, "id", "left_anti")
    if not drop_orphans:
        return kept_nodes, kept_edges

    def endpoints(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )

    had_edges = endpoints(fused_edges)
    still_has = endpoints(kept_edges)
    orphaned = had_edges.join(still_has, "id", "left_anti")
    return kept_nodes.join(orphaned, "id", "left_anti"), kept_edges


def sameas_canonicalize(
    nodes: DataFrame,
    edges: DataFrame,
    sameas: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """owl:sameAs canonicalization -> ``(nodes2, edges2, mapping)`` — the
    explicit *canonicalization* stage of the north-rule pipeline
    (extract -> link -> **canonicalize** -> materialize).

    ``sameas`` is an undirected pair table of equivalent entity ids
    (from alias linking, redirect resolution, or literal owl:sameAs
    triples). Equivalence classes come from
    :func:`ontoweaver_spark.dedup.connected_components` (min-label with
    pointer jumping, O(log diameter) rounds); every class member is
    rewritten to the class's smallest id. Node rows collapse to one per
    canonical id (min label — run :func:`reduce`-based fusion afterwards
    when property merging matters); edges are rewritten through the
    broadcast mapping and deduplicated.

    The reference reaches the same end state only when the mapping's
    ``translate`` table already maps every alias to its canonical form
    (transformer.py's translate); sameAs closure is what replaces that
    config-sized table when equivalences are DISCOVERED at corpus scale
    and form chains (a=b, b=c) no static dictionary closes.

    Shape at 10^12 edges: the class computation touches only the sameAs
    pairs (tiny vs the graph); the node/edge rewrite is the broadcast
    remap of :func:`remap_edges`; the final dedup is one hash aggregate
    on the rewritten edge key.
    """
    from .dedup import connected_components

    comp = connected_components(sameas, a_col=a_col, b_col=b_col)
    mapping = comp.where(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias("old_id"), F.col("component").alias("new_id")
    )
    nodes2 = (
        nodes.join(F.broadcast(mapping), nodes["id"] == F.col("old_id"), "left")
        .withColumn("id", F.coalesce(F.col("new_id"), F.col("id")))
        .drop("old_id", "new_id")
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    edges2 = remap_edges(edges, mapping).distinct()
    return nodes2, edges2, mapping
