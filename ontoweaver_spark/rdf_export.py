"""RDF N-Triples export of the fused KG — the serialization mirror of
``loaders.read_rdf_triples``.

The reference ships its graph to Neo4j via BioCypher
(`/root/reference/src/ontoweaver/ontoweave.py:441-452`); the RDF side of
its world is read-only (rdflib ingest, loader.py:318-421). A Spark
pipeline that BUILDS a KG also needs to publish one in the vendor-neutral
exchange format, so this module emits RDF 1.1 N-Triples — the only W3C
serialization that is line-delimited and therefore embarrassingly
parallel to write (one ``df.write.text`` of pre-rendered lines, no
document header/footer, parts concatenate into a valid file).

Scale shape (10^12 triples): everything is one JVM projection per input
frame plus the text write — zero shuffles, zero Python. Round-trip is
tested against this repo's own distributed ``.nt`` reader.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _esc_literal(c: Column) -> Column:
    """N-Triples literal escapes (backslash FIRST, then the rest — the
    same order constraint the reader resolves in reverse)."""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def _iri_segment(c: Column) -> Column:
    """Percent-encode a raw value (node id, label, property key) into an
    IRI path segment: ``url_encode`` then the form-encoding fixups
    (``+`` -> ``%20``; ``*`` is IRI-safe but encode it for stability)."""
    return F.regexp_replace(
        F.regexp_replace(F.url_encode(c), r"\+", "%20"), r"\*", "%2A"
    )


def serialize_ntriples(triples: DataFrame) -> DataFrame:
    """Render a flat triple frame ``(subject, predicate, object,
    object_kind[, object_lang, object_datatype])`` — the exact schema
    :func:`loaders.read_rdf_triples` produces — into one-line-per-triple
    ``(line)``. Subjects/objects beginning with ``_:`` stay blank-node
    labels; ``object_kind`` routes literal vs IRI rendering."""
    cols = set(triples.columns)
    s = F.col("subject")
    o = F.col("object")
    lang = F.col("object_lang") if "object_lang" in cols else F.lit(None)
    dtype = F.col("object_datatype") if "object_datatype" in cols else F.lit(None)

    subj = F.when(s.startswith("_:"), s).otherwise(F.concat(F.lit("<"), s, F.lit(">")))
    pred = F.concat(F.lit("<"), F.col("predicate"), F.lit(">"))
    lit = F.concat(F.lit('"'), _esc_literal(o), F.lit('"'))
    lit = (
        F.when(lang.isNotNull(), F.concat(lit, F.lit("@"), lang))
        .when(
            dtype.isNotNull(),
            F.concat(lit, F.lit("^^<"), dtype, F.lit(">")),
        )
        .otherwise(lit)
    )
    obj = (
        F.when(F.col("object_kind") == "literal", lit)
        .when(o.startswith("_:"), o)
        .otherwise(F.concat(F.lit("<"), o, F.lit(">")))
    )
    return triples.select(
        F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("line")
    )


def graph_to_triples(
    nodes: DataFrame,
    edges: DataFrame,
    base: str = "urn:ow:",
) -> DataFrame:
    """Fused KG ``(id, label, properties)`` nodes + ``(src, dst, label)``
    edges -> the flat triple frame: node typing as ``rdf:type``, each
    property value as a literal triple (multi-valued maps explode to one
    triple per value), each edge as ``<node/src> <rel/label> <node/dst>``.
    Raw ids/labels/keys percent-encode into the IRI, so any id the fusion
    stage can produce round-trips. Edge properties would need RDF
    reification and are deliberately out of scope (documented, loud)."""
    if "properties" in edges.columns:
        raise ValueError(
            "graph_to_triples: edge properties have no N-Triples encoding "
            "without reification - drop the column or export edges separately"
        )
    node_iri = lambda c: F.concat(F.lit(base + "node/"), _iri_segment(c))

    typed = nodes.select(
        node_iri(F.col("id")).alias("subject"),
        F.lit(RDF_TYPE).alias("predicate"),
        F.concat(F.lit(base + "class/"), _iri_segment(F.col("label"))).alias("object"),
        F.lit("uri").alias("object_kind"),
        F.lit(None).cast("string").alias("object_lang"),
        F.lit(None).cast("string").alias("object_datatype"),
    )
    frames = [typed]
    if "properties" in nodes.columns:
        ptype = nodes.schema["properties"].dataType
        if not isinstance(ptype, MapType):
            raise ValueError("graph_to_triples: properties must be a map column")
        kv = nodes.select(
            node_iri(F.col("id")).alias("subject"),
            F.explode("properties").alias("key", "val"),
        )
        if isinstance(ptype.valueType, ArrayType):
            kv = kv.select("subject", "key", F.explode("val").alias("val"))
        frames.append(
            kv.select(
                "subject",
                F.concat(F.lit(base + "prop/"), _iri_segment(F.col("key"))).alias(
                    "predicate"
                ),
                F.col("val").cast("string").alias("object"),
                F.lit("literal").alias("object_kind"),
                F.lit(None).cast("string").alias("object_lang"),
                F.lit(None).cast("string").alias("object_datatype"),
            )
        )
    frames.append(
        edges.select(
            node_iri(F.col("src")).alias("subject"),
            F.concat(F.lit(base + "rel/"), _iri_segment(F.col("label"))).alias(
                "predicate"
            ),
            node_iri(F.col("dst")).alias("object"),
            F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
    )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def write_ntriples(triples: DataFrame, path: str, mode: str = "error") -> None:
    """Distributed N-Triples write: serialize + ``write.text``. Part
    files concatenate into one valid ``.nt`` document (line-delimited,
    no header), so downstream consumers can read the directory as-is —
    including this repo's own ``read_rdf_triples``."""
    serialize_ntriples(triples).write.mode(mode).text(path)


def serialize_jsonld_lines(
    triples: DataFrame,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
) -> DataFrame:
    """Flat JSON-LD serialization -> one ``(subject, line)`` row per
    subject, where ``line`` is a self-contained JSON-LD node object:
    ``{"@id": s, p1: [o1, o2], p2: [o3], ...}`` with predicates AND
    objects sorted — the export mirror of ``loaders.read_jsonld`` (one
    object per line is the newline-delimited JSON-LD that streaming
    consumers and ``spark.read.json`` both eat directly; parts
    concatenate like the .nt writer's).

    Determinism is the point: the JSON string is BUILT from sorted
    parts (never ``to_json`` on a map, whose key order is
    engine-internal), so the same graph always serializes to the same
    bytes and a SQL oracle can hash-match it. One predicate-level
    aggregation + one subject-level aggregation — two map-side-combined
    shuffles on the natural keys, no driver collection.

    Escaping is full JSON string escaping: backslash, double-quote, and
    EVERY control character U+0000–U+001F (named escapes for
    ``\\n \\r \\t \\b \\f``, generic ``\\u00XX`` for the rest) — a bare
    newline in a value would otherwise both break the JSON and split
    the newline-delimited output line.  The returned ``subject`` column
    is the RAW subject (joins back to the source frame); the escaped
    form appears only inside ``line``.
    """
    def esc(c):
        c = F.regexp_replace(c, r"\\", r"\\\\")
        c = F.regexp_replace(c, '"', '\\\\"')
        named = {0x08: "b", 0x09: "t", 0x0A: "n", 0x0C: "f", 0x0D: "r"}
        for cp, letter in named.items():
            c = F.regexp_replace(c, chr(cp), "\\\\" + letter)
        for cp in range(0x20):
            if cp in named:
                continue
            # java.util.regex: \x00 etc. are literal chars in the pattern;
            # the replacement needs \\ to emit one literal backslash
            c = F.regexp_replace(c, re.escape(chr(cp)), "\\\\u%04x" % cp)
        return c

    per_pred = (
        triples.select(
            F.col(subject_col).cast("string").alias("s"),
            esc(F.col(predicate_col).cast("string")).alias("p"),
            esc(F.col(object_col).cast("string")).alias("o"),
        )
        .groupBy("s", "p")
        .agg(F.array_sort(F.collect_set("o")).alias("os"))
        .select(
            "s",
            F.concat(
                F.lit('"'), F.col("p"), F.lit('":["'),
                F.array_join("os", '","'), F.lit('"]'),
            ).alias("entry"),
        )
    )
    return (
        per_pred.groupBy("s")
        .agg(F.array_sort(F.collect_list("entry")).alias("entries"))
        .select(
            F.col("s").alias("subject"),
            F.concat(
                # entries carry their own opening quote: close the @id
                # string, comma, then splice
                F.lit('{"@id":"'), esc(F.col("s")), F.lit('",'),
                F.array_join("entries", ","), F.lit("}"),
            ).alias("line"),
        )
    )
