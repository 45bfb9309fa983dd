"""Input loaders (SURVEY.md §2.2; reference loader.py:149-562).

The canonical cell domain is string: every tabular source loads with all
columns cast to string, replicating the reference's ``dtype=str`` policy
(/root/reference/src/ontoweaver/loader.py:173-216). Parquet is the
north-star input format (Iceberg-style tables); CSV/TSV and JSON cover the
reference's fixture formats.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_SEPS = {".csv": ",", ".tsv": "\t", ".txt": "\t", ".dat": "\t"}


def as_string_cells(df: DataFrame) -> DataFrame:
    """Cast every column to the canonical string cell domain."""
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])


def read_table(
    spark: SparkSession,
    path: str,
    fmt: Optional[str] = None,
    sep: Optional[str] = None,
    **options,
) -> DataFrame:
    """Load a tabular file (csv/tsv/parquet/orc/json-lines) as string cells.
    Globs expand natively (multi-file concat, loader.py:274-312)."""
    lower = path.lower()
    if fmt is None:
        if lower.endswith(".parquet"):
            fmt = "parquet"
        elif lower.endswith(".orc"):
            fmt = "orc"
        elif lower.endswith(".jsonl") or lower.endswith(".ndjson"):
            fmt = "json"
        else:
            fmt = "csv"
    if fmt == "parquet":
        return as_string_cells(spark.read.parquet(path))
    if fmt == "orc":
        return as_string_cells(spark.read.orc(path))
    if fmt == "json":
        return as_string_cells(spark.read.json(path))
    if sep is None:
        sep = next((s for ext, s in _EXT_SEPS.items() if lower.endswith(ext)), ",")
    reader = (
        spark.read.option("header", "true")
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return as_string_cells(reader.csv(path))


_JSON_QUERY_RE = re.compile(r"^([A-Za-z_][\w]*)\[\*\]\.([\w.]+)$")


def read_json_queries(
    spark: SparkSession, path_or_text: str, columns: dict[str, str]
) -> DataFrame:
    """JSON document -> table via JMESPath-style column queries of the form
    ``root[*].field`` (the pattern used by the reference's JSON loader,
    /root/reference/src/ontoweaver/json.py:23-75). All queries must share
    the same array root; one output row per array element."""
    import json as _json

    if path_or_text.strip().startswith("{"):
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    doc = _json.loads(text)

    roots = set()
    fields = {}
    for name, query in columns.items():
        m = _JSON_QUERY_RE.match(query.strip())
        if not m:
            raise ValueError(f"unsupported JSON query {query!r} (expected root[*].field)")
        roots.add(m.group(1))
        fields[name] = m.group(2)
    if len(roots) != 1:
        raise ValueError(f"all JSON queries must share one array root, got {roots}")
    root = roots.pop()
    rows = doc.get(root, [])
    data = [
        tuple(str(_dig(r, fields[name])) if _dig(r, fields[name]) is not None else None
              for name in columns)
        for r in rows
    ]
    schema = ", ".join(f"`{name}` string" for name in columns)
    return spark.createDataFrame(data, schema)


def read_xml_queries(
    spark: SparkSession, path_or_text: str, columns: dict[str, str]
) -> DataFrame:
    """XML document -> table via per-column XPath queries (the reference's
    XML loader, /root/reference/src/ontoweaver/xml.py:22-74). Each query
    must select the same number of elements; column i of row j is the text
    of query i's j-th hit. Config-sized documents parse driver-side (the
    reference reads them whole too); row-shaped XML at scale should land in
    Parquet upstream instead."""
    import xml.etree.ElementTree as ET

    text = path_or_text
    if not path_or_text.lstrip().startswith("<"):
        with open(path_or_text) as f:
            text = f.read()
    root = ET.fromstring(text)

    hits = {}
    for name, xpath in columns.items():
        found = root.findall(xpath)
        hits[name] = [
            (e.text if hasattr(e, "text") else str(e)) for e in found
        ]
    lengths = {name: len(v) for name, v in hits.items()}
    if len(set(lengths.values())) > 1:
        raise ValueError(f"XPath queries select differing row counts: {lengths}")
    n = next(iter(lengths.values()), 0)
    data = [
        tuple(
            None if hits[name][j] is None else str(hits[name][j]).strip()
            for name in columns
        )
        for j in range(n)
    ]
    schema = ", ".join(f"`{name}` string" for name in columns)
    return spark.createDataFrame(data, schema)


def _dig(obj, dotted: str):
    for part in dotted.split("."):
        if not isinstance(obj, dict) or part not in obj:
            return None
        obj = obj[part]
    return obj


def sub_sample(df: DataFrame, pct: float, seed: int = 42) -> DataFrame:
    """--sub-sample analog (/root/reference/src/ontoweaver/__init__.py:415-420)."""
    return df.sample(fraction=pct / 100.0, seed=seed)
