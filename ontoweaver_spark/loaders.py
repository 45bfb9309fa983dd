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
    Globs expand natively (multi-file concat, loader.py:274-312).

    ``iceberg:<catalog.db.table>`` / ``table:<name>`` refs load through
    ``spark.read.table`` — the north-rule input shape (Iceberg-backed page
    tables): on a cluster with an Iceberg catalog configured
    (``spark.sql.catalog.*`` + the iceberg-spark-runtime jar), this is a
    DSv2 scan with partition pruning, column pruning, and predicate
    pushdown intact; in this sandbox (no Iceberg jar baked in) the same
    code path serves Hive-catalog and temp-view tables."""
    if path.startswith(("iceberg:", "table:")):
        return as_string_cells(spark.read.table(path.split(":", 1)[1]))
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


# --------------------------------------------------------------------------
# RDF triples (reference loader.py:318-421 loads ontologies through rdflib;
# here N-Triples / line-oriented Turtle parse DISTRIBUTED as one
# spark.read.text + regexp projection — no Python in the loop, any size.
# OWL reasoning/BioCypher export stay out of scope, SURVEY.md §2.2.)
# --------------------------------------------------------------------------

# subject: <uri>, _:blank, or prefixed name; predicate: <uri>, `a`, or
# prefixed name; object: anything up to the final dot
_PNAME = r'[\w.-]*:[^\s<>"]+'
_NT_RE = rf"^\s*(<[^>]*>|_:\S+|{_PNAME})\s+(<[^>]*>|a|{_PNAME})\s+(.*?)\s*\.\s*$"


def read_rdf_triples(
    spark: SparkSession, path: str, jsonld_contexts: dict | None = None
) -> DataFrame:
    """N-Triples (``.nt``) or Turtle (``.ttl``) -> DataFrame ``(subject,
    predicate, object, object_kind, object_lang, object_datatype)``.

    URIs are returned without angle brackets, literals as their unescaped
    lexical value with language/datatype split into their own columns —
    the flat triple table a mapping can consume directly.

    Execution routing (the 100-TB-safe shape): plain one-triple-per-line
    statements with no ``\\uXXXX`` escapes — the N-Triples bulk — parse as
    one JVM regexp projection, fully distributed. Statements with ``;``/
    ``,`` object-list continuations or unicode escapes (the rare subset in
    real ontologies) route to an Arrow-batched ``mapInPandas`` parser that
    tokenizes quotes-aware and decodes escapes. Multi-line statements are
    first folded back together by a terminator-line cumulative count —
    that fold is one ordered window (ontology files are config-sized next
    to the corpus; the reference parses them entirely in driver rdflib
    memory, loader.py:318-421). Triple-quoted (multi-line) literals stay
    out of scope and fail loudly.

    ``.rdf`` / ``.owl`` / ``.xml`` paths dispatch to :func:`read_rdf_xml`,
    ``.jsonld`` / ``.json-ld`` to :func:`read_jsonld` (``jsonld_contexts``
    passes through — vendored substitutes for remote ``@context`` URLs),
    ``.trig`` to :func:`read_trig`, ``.trix`` to :func:`read_trix` (all
    driver-side, config-sized). ``.n3`` is accepted for its Turtle-compatible subset —
    what virtually every published ``.n3`` file is; genuine N3 logic
    (formulas, rules, quantifiers) fails loudly with a convert hint.
    With this the loader covers every serialization in the reference's
    rdflib format table (loader.py:345-360)."""
    lower = path.lower()
    if lower.endswith((".rdf", ".owl", ".xml", ".rdfxml")):
        return read_rdf_xml(spark, path)
    if lower.endswith((".jsonld", ".json-ld")):
        return read_jsonld(spark, path, contexts=jsonld_contexts)
    if lower.endswith(".trig"):
        return read_trig(spark, path)
    if lower.endswith(".trix"):
        return read_trix(spark, path)
    lines = spark.read.text(path).select(F.col("value").alias("line"))
    if lower.endswith(".n3"):
        _reject_n3_logic(lines)
    return _parse_turtle_lines(spark, lines)


def _parse_turtle_lines(spark: SparkSession, lines: DataFrame) -> DataFrame:
    """The Turtle/N-Triples parse body of :func:`read_rdf_triples`, over an
    already-read one-column ``line`` frame (so TriG unwrapping and N3 can
    reuse the exact same distributed routing)."""
    body = lines.where(
        ~F.trim("line").startswith("#")
        & ~F.trim("line").startswith("@prefix")
        & ~F.trim("line").startswith("@base")
        & (F.trim("line") != "")
    )

    tq = body.where(F.col("line").contains('"""')).limit(1).collect()
    if tq:
        raise ValueError(
            f"triple-quoted Turtle literals are not supported — convert to "
            f"N-Triples (e.g. riot --output=ntriples): {tq[0]['line']!r}"
        )

    # @prefix table is config-sized by definition — collect and expand
    # inline (a handful of string replaces in the projection)
    prefixes = {
        m.group(1): m.group(2)
        for r in lines.where(F.trim("line").startswith("@prefix")).collect()
        if (m := re.match(r"@prefix\s+([\w-]*):\s*<([^>]*)>\s*\.", r["line"].strip()))
    }

    # any statement spanning lines? (a body line without the '.' terminator)
    if body.where(~F.col("line").rlike(r"\.\s*$")).limit(1).count() > 0:
        body = _fold_turtle_statements(body)

    # routing predicate: escapes and compound (;/, outside literals)
    # statements go to the Python parser; everything else stays JVM-side
    has_esc = F.regexp_replace("line", r"\\\\", "").rlike(r"\\[uU][0-9A-Fa-f]")
    delit = F.regexp_replace("line", r'"(?:[^"\\]|\\.)*"', '""')
    simple = F.col("line").rlike(_NT_RE) & ~has_esc & ~delit.rlike("[;,]")
    jvm = _project_nt_lines(body.where(simple), prefixes)
    fancy = _parse_turtle_python(body.where(~simple), prefixes)
    return jvm.unionByName(fancy)


def _reject_n3_logic(lines: DataFrame) -> None:
    """Raise on N3-only constructs (formulas ``{}``, rules ``=>``/``<=``,
    quantifiers, ``?``-variables, ``=`` sameAs shorthand) so ``.n3`` input
    either parses correctly as Turtle or fails loudly — never silently
    drops logic. One JVM-side scan: literals and URIs are blanked first so
    their content can't false-positive."""
    stripped = F.regexp_replace(
        F.regexp_replace("line", r'"(?:[^"\\]|\\.)*"', '""'), r"<[^>]*>", "<>"
    )
    n3_only = stripped.rlike(
        r"[{}]|=>|<=|@forAll\b|@forSome\b|@keywords\b|(^|\s)\?\w|(^|\s)=(\s|$)"
    )
    hit = lines.where(n3_only).limit(1).collect()
    if hit:
        raise ValueError(
            "N3 formulas/rules/variables are not supported — only the "
            "Turtle-compatible subset of N3 is; convert with "
            f"riot --output=ntriples: {hit[0]['line']!r}"
        )


def read_trig(spark: SparkSession, path: str) -> DataFrame:
    """TriG (``.trig`` — Turtle plus named-graph blocks; in the reference's
    rdflib format table, loader.py:345-360) -> the same flat triple frame
    as :func:`read_rdf_triples`.

    Graph blocks are unwrapped driver-side (quote/URI-aware scanner, same
    config-size bound as RDF/XML — the reference also loads these whole
    into rdflib driver memory) and the resulting plain-Turtle statements
    reuse the distributed :func:`_parse_turtle_lines` routing. Named-graph
    labels are flattened away — the mapping layer consumes one triple
    table, exactly like rdflib's union-graph view the reference adapters
    read."""
    import os

    size = os.path.getsize(path)
    if size > RDF_XML_MAX_BYTES:
        raise ValueError(
            f"{path} is {size} bytes — over the {RDF_XML_MAX_BYTES}-byte "
            "driver-side bound for TriG; convert to N-Triples for "
            "distributed loading (read_rdf_triples)"
        )
    with open(path) as f:
        stmts = _unwrap_trig(f.read(), path)
    lines = spark.createDataFrame([(s,) for s in stmts], "line string")
    return _parse_turtle_lines(spark, lines)


def _unwrap_trig(text: str, path: str) -> list[str]:
    """Strip TriG graph wrapping from ``text``, returning one complete
    Turtle statement per list entry. Handles ``GRAPH <g> { ... }``,
    bare-label ``<g> { ... }`` / ``_:g { ... }`` and anonymous ``{ ... }``
    blocks, top-level (default-graph) triples and directives, SPARQL-style
    ``PREFIX``/``BASE`` (normalized to ``@prefix``/``@base``), and the
    block-final statement's optional terminating dot. Comments are dropped
    quote-aware during the scan; a nested ``{`` (an N3 formula, not legal
    TriG) fails loudly."""
    out: list[str] = []
    buf: list[str] = []
    depth = 0
    i, n = 0, len(text)

    def peel_directives(stmt: str) -> str:
        # SPARQL-style PREFIX/BASE carry no terminating '.', so they run
        # together with whatever follows — peel them into their own
        # normalized @-statements
        while True:
            m = re.match(r"(?i)^@?prefix\s+([\w.-]*:)\s*(<[^>]*>)\s*\.?\s*", stmt)
            if m:
                out.append(f"@prefix {m.group(1)} {m.group(2)} .")
                stmt = stmt[m.end():]
                continue
            m = re.match(r"(?i)^@?base\s+(<[^>]*>)\s*\.?\s*", stmt)
            if m:
                out.append(f"@base {m.group(1)} .")
                stmt = stmt[m.end():]
                continue
            return stmt

    def flush(block_final: bool) -> None:
        stmt = peel_directives(" ".join("".join(buf).split()))
        buf.clear()
        if not stmt:
            return
        if not stmt.endswith("."):
            if not block_final:
                raise ValueError(
                    f"dangling TriG content (no statement terminator) in "
                    f"{path}: {stmt[:80]!r}"
                )
            stmt += " ."  # the block-final statement may omit its '.'
        out.append(stmt)

    def drop_label() -> None:
        # the chunk before '{' is [GRAPH] <label> — keep only any prefix/
        # base directives that ran together with it
        chunk = peel_directives(" ".join("".join(buf).split()))
        buf.clear()
        if not re.fullmatch(r"(?i)\s*(graph\s+)?(<[^>]*>|_:\S+|[\w.-]*:[^\s{]*|\[\s*\])?\s*", chunk):
            raise ValueError(f"unexpected content before '{{' in {path}: {chunk[:80]!r}")

    while i < n:
        c = text[i]
        if c == "#":  # comment to EOL (outside literals/URIs by position)
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "<":
            j = text.find(">", i)
            if j < 0:
                raise ValueError(f"unterminated <URI> in TriG file {path}")
            buf.append(text[i : j + 1])
            i = j + 1
            continue
        if c in "\"'":
            q = text[i : i + 3] if text[i : i + 3] in ('"""', "'''") else c
            j = i + len(q)
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text.startswith(q, j):
                    break
                j += 1
            if j >= n:
                raise ValueError(f"unterminated string literal in TriG file {path}")
            buf.append(text[i : j + len(q)])
            i = j + len(q)
            continue
        if c == "{":
            if depth:
                raise ValueError(
                    f"nested {{ in {path} — N3 formulas are not TriG; "
                    "convert with riot --output=ntriples"
                )
            drop_label()
            depth = 1
        elif c == "}":
            if not depth:
                raise ValueError(f"unbalanced }} in TriG file {path}")
            flush(block_final=True)
            depth = 0
        elif c == "." and (i + 1 >= n or text[i + 1] in " \t\r\n#}"):
            # a statement terminator — a '.' glued to a following name char
            # is pname-internal (ex:foo.bar) or decimal (1.5), not an end
            buf.append(c)
            flush(block_final=False)
        else:
            buf.append(c)
        i += 1
    if depth:
        raise ValueError(f"unclosed {{ in TriG file {path}")
    flush(block_final=False)
    return out


_TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"


def read_trix(spark: SparkSession, path: str) -> DataFrame:
    """TriX (``.trix`` — the XML named-graph serialization in the
    reference's rdflib format table, loader.py:345-360) -> the same flat
    triple frame as :func:`read_rdf_triples`.

    Driver-side stdlib ElementTree under the RDF/XML config-size bound.
    Term elements: ``<uri>``, ``<id>`` (blank node), ``<plainLiteral>``
    (optional ``xml:lang``), ``<typedLiteral datatype=...>``. Graph-name
    ``<uri>`` children are flattened away, like :func:`read_trig`."""
    import os
    import xml.etree.ElementTree as ET

    size = os.path.getsize(path)
    if size > RDF_XML_MAX_BYTES:
        raise ValueError(
            f"{path} is {size} bytes — over the {RDF_XML_MAX_BYTES}-byte "
            "driver-side bound for TriX; convert to N-Triples for "
            "distributed loading (read_rdf_triples)"
        )

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def term(e) -> tuple[str, str, str | None, str | None]:
        """-> (value, kind, lang, datatype)"""
        t, text = local(e.tag), e.text or ""
        if t == "uri":
            return text, "uri", None, None
        if t == "id":
            return f"_:{text}", "blank", None, None
        if t == "plainLiteral":
            return text, "literal", e.get(_XML_LANG), None
        if t == "typedLiteral":
            return text, "literal", None, e.get("datatype")
        raise ValueError(f"unsupported TriX term element <{t}> in {path}")

    root = ET.parse(path).getroot()
    if local(root.tag) not in ("TriX", "trix"):
        raise ValueError(f"{path} root element <{local(root.tag)}> is not TriX")
    triples: list[tuple] = []
    for graph in root:
        if local(graph.tag) != "graph":
            raise ValueError(f"unexpected TriX element <{local(graph.tag)}> in {path}")
        for el in graph:
            if local(el.tag) == "uri":
                continue  # the graph name — flattened away
            if local(el.tag) != "triple":
                raise ValueError(
                    f"unexpected TriX graph child <{local(el.tag)}> in {path}"
                )
            kids = list(el)
            if len(kids) != 3:
                raise ValueError(f"TriX <triple> with {len(kids)} terms in {path}")
            s, s_kind, _, _ = term(kids[0])
            if s_kind == "literal":
                raise ValueError(f"TriX literal subject in {path}")
            p, p_kind, _, _ = term(kids[1])
            if p_kind != "uri":
                raise ValueError(f"TriX non-URI predicate in {path}")
            o, o_kind, o_lang, o_dt = term(kids[2])
            triples.append((s, p, o, o_kind, o_lang, o_dt))
    return spark.createDataFrame(triples, _RDF_SCHEMA)


def _strip_turtle_comment(line: str) -> str:
    """Drop a trailing ``# ...`` comment, quote- and URI-aware (a ``#``
    inside ``<...>`` or a literal is content, not a comment)."""
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "#":
            return line[:i]
        if c == "<":
            j = line.find(">", i)
            if j < 0:
                return line  # unterminated URI — leave for the parser
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n and line[j] != '"':
                j += 2 if line[j] == "\\" else 1
            if j >= n:
                return line
            i = j + 1
        else:
            i += 1
    return line


def _fold_turtle_statements(body: DataFrame) -> DataFrame:
    """Reassemble multi-line Turtle statements: statement id = cumulative
    count of terminator lines (trailing ``.``) before each line, then the
    lines of each statement concatenate in file order. zipWithIndex gives
    the stable file-order index; the cumulative sum is one ordered window
    (single-task — fine for config-sized ontology files, see caller).

    Trailing comments are stripped (quote-aware, vectorized Python) BEFORE
    terminator detection: a commented continuation line would otherwise
    swallow the rest of its statement when the lines concatenate, and a
    commented terminator would merge two statements. (On the single-line
    fast path comments need no stripping — the statement tokenizer stops
    at ``#`` itself.)"""
    from pyspark.sql import Window

    def strip_batches(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["line"] = [_strip_turtle_comment(x) for x in pdf["line"]]
            yield pdf

    body = body.mapInPandas(strip_batches, "line string")
    df = (
        body.rdd.zipWithIndex()
        .map(lambda t: (t[0]["line"], t[1]))
        .toDF(["line", "idx"])
    )
    term = F.when(F.col("line").rlike(r"\.\s*$"), F.lit(1)).otherwise(F.lit(0))
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, -1)
    grouped = df.withColumn("stmt", F.coalesce(F.sum(term).over(w), F.lit(0)))
    return (
        grouped.groupBy("stmt")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "line"))).alias("ls"))
        .select(
            F.concat_ws(" ", F.transform("ls", lambda s: s["line"])).alias("line")
        )
    )


def _project_nt_lines(body: DataFrame, prefixes: dict) -> DataFrame:
    """The JVM fast path: one-triple-per-line statements (no escapes, no
    object lists) as a single regexp projection — no Python in the loop."""

    def strip_uri(c):
        return F.when(
            c.startswith("<"), F.regexp_extract(c, r"^<(.*)>$", 1)
        ).otherwise(c)

    def expand_prefixed(c):
        out = strip_uri(c)
        for p, uri in sorted(prefixes.items(), key=lambda kv: -len(kv[0])):
            is_pref = out.rlike(rf"^{re.escape(p)}:")
            out = F.when(
                is_pref, F.concat(F.lit(uri), F.substring(out, len(p) + 2, 1 << 20))
            ).otherwise(out)
        return out

    s = F.regexp_extract("line", _NT_RE, 1)
    p = F.regexp_extract("line", _NT_RE, 2)
    o = F.regexp_extract("line", _NT_RE, 3)

    pred = F.when(
        p == "a", F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    ).otherwise(expand_prefixed(p))

    is_literal = o.startswith('"')
    lex = F.regexp_extract(o, r'^"((?:[^"\\]|\\.)*)"', 1)
    # unescape ORDER matters: `\\` must resolve FIRST (via a \x00 sentinel,
    # impossible in N-Triples lexical forms) or the literal "a\\nb" — an
    # escaped backslash followed by a real 'n' — would decode its second
    # backslash + n into a newline instead of the intended backslash+n
    unescaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(lex, r"\\\\", "\x00"),
                        r"\\n", "\n",
                    ),
                    r"\\t", "\t",
                ),
                r"\\r", "\r",
            ),
            r'\\"', '"',
        ),
        "\x00", r"\\",
    )
    lang = F.regexp_extract(o, r'"@([A-Za-z0-9-]+)\s*$', 1)
    dtype = expand_prefixed(F.regexp_extract(o, r'"\^\^(\S+)\s*$', 1))

    obj = F.when(is_literal, unescaped).otherwise(expand_prefixed(o))
    kind = (
        F.when(is_literal, F.lit("literal"))
        .when(o.startswith("_:"), F.lit("blank"))
        .otherwise(F.lit("uri"))
    )
    return body.select(
        expand_prefixed(s).alias("subject"),
        pred.alias("predicate"),
        obj.alias("object"),
        kind.alias("object_kind"),
        F.when(lang != "", lang).alias("object_lang"),
        F.when(dtype != "", dtype).alias("object_datatype"),
    )


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
_RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
_RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
_RDF_SCHEMA = (
    "subject string, predicate string, object string, "
    "object_kind string, object_lang string, object_datatype string"
)


def _turtle_unescape(s: str) -> str:
    """Turtle/N-Triples string unescape incl. \\uXXXX / \\UXXXXXXXX."""
    out, i, n = [], 0, len(s)
    simple = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}
    while i < n:
        c = s[i]
        if c != "\\" or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        e = s[i + 1]
        if e == "u" and i + 6 <= n:
            out.append(chr(int(s[i + 2:i + 6], 16)))
            i += 6
        elif e == "U" and i + 10 <= n:
            out.append(chr(int(s[i + 2:i + 10], 16)))
            i += 10
        elif e in simple:
            out.append(simple[e])
            i += 2
        else:  # unknown escape kept verbatim (same leniency as the JVM path)
            out.append(c + e)
            i += 2
    return "".join(out)


def _tokenize_turtle(stmt: str) -> list[str]:
    """Quote- and escape-aware Turtle statement tokenizer: <uri>, literal
    (with @lang/^^dtype suffix attached), prefixed/blank/bare tokens, and
    the punctuation ``; , .`` as their own tokens."""
    toks: list[str] = []
    i, n = 0, len(stmt)
    while i < n:
        c = stmt[i]
        if c.isspace():
            i += 1
        elif c == "<":
            j = stmt.find(">", i)
            if j < 0:
                raise ValueError(f"unterminated URI in RDF statement: {stmt!r}")
            toks.append(stmt[i:j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n and stmt[j] != '"':
                j += 2 if stmt[j] == "\\" else 1
            if j >= n:
                raise ValueError(f"unterminated literal in RDF statement: {stmt!r}")
            k = j + 1
            if k < n and stmt[k] == "@":
                m = re.match(r"@[A-Za-z0-9-]+", stmt[k:])
                k += m.end()
            elif stmt[k:k + 2] == "^^":
                k += 2
                if k < n and stmt[k] == "<":
                    k = stmt.find(">", k) + 1
                else:
                    m = re.match(r"[^\s;,.]+", stmt[k:])
                    k += m.end() if m else 0
            toks.append(stmt[i:k])
            i = k
        elif c == "#":  # comment runs to end of statement text
            break
        elif c in ";,.":
            toks.append(c)
            i += 1
        else:
            m = re.match(r"[^\s;,]+", stmt[i:])
            tok = m.group(0)
            i += m.end()
            # a statement-final bare token can carry the '.' terminator
            if tok != "." and tok.endswith(".") and stmt[i:].strip() == "":
                toks.extend([tok[:-1], "."])
            else:
                toks.append(tok)
    return toks


def _parse_turtle_statement(stmt: str, prefixes: dict) -> list[tuple]:
    """One (possibly compound) Turtle statement -> triple rows, expanding
    ``;`` predicate lists and ``,`` object lists."""
    def expand(tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            return _turtle_unescape(tok[1:-1])
        for p in sorted(prefixes, key=len, reverse=True):
            if tok.startswith(p + ":"):
                return prefixes[p] + tok[len(p) + 1:]
        return tok

    def classify(subj: str, pred: str, obj: str) -> tuple:
        if obj.startswith('"'):
            m = re.match(
                r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^(\S+))?$', obj
            )
            if m is None:
                raise ValueError(f"unparseable literal {obj!r} in: {stmt!r}")
            dtype = expand(m.group(3)) if m.group(3) else None
            return (subj, pred, _turtle_unescape(m.group(1)), "literal",
                    m.group(2), dtype)
        kind = "blank" if obj.startswith("_:") else "uri"
        return (subj, pred, expand(obj), kind, None, None)

    toks = _tokenize_turtle(stmt)
    if not toks:
        return []
    if toks[-1] != ".":
        raise ValueError(f"unterminated RDF statement (missing '.'): {stmt!r}")
    toks = toks[:-1]
    if not toks:
        return []
    if len(toks) < 3:
        raise ValueError(f"unparseable RDF statement: {stmt!r}")
    subj = expand(toks[0])
    rows, i = [], 1
    while i < len(toks):
        pred = _RDF_TYPE if toks[i] == "a" else expand(toks[i])
        i += 1
        while True:
            if i >= len(toks) or toks[i] in ";,.":
                raise ValueError(f"missing object in RDF statement: {stmt!r}")
            rows.append(classify(subj, pred, toks[i]))
            i += 1
            if i < len(toks) and toks[i] == ",":
                i += 1
                continue
            break
        if i < len(toks):
            if toks[i] != ";":
                raise ValueError(
                    f"unparseable RDF statement near {toks[i]!r}: {stmt!r}"
                )
            i += 1  # `;` — next predicate (a trailing `;` is legal)
    return rows


def _parse_turtle_python(df: DataFrame, prefixes: dict) -> DataFrame:
    """Arrow-batched parser for the statements the JVM regexp path cannot
    express: ``;``/``,`` compound statements and \\uXXXX escapes. By
    construction this sees only that rare subset — the N-Triples bulk never
    leaves the JVM."""
    cols = ["subject", "predicate", "object",
            "object_kind", "object_lang", "object_datatype"]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for stmt in pdf["line"]:
                rows.extend(_parse_turtle_statement(stmt, prefixes))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, _RDF_SCHEMA)


RDF_XML_MAX_BYTES = 512 * 1024 * 1024
_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"


def read_rdf_xml(spark: SparkSession, path: str) -> DataFrame:
    """RDF/XML (``.rdf`` / ``.owl`` — the dominant published-ontology
    serialization, and the reference's primary OWL input via rdflib,
    loader.py:318-421) -> the same flat triple frame as
    :func:`read_rdf_triples`.

    Parsed driver-side with stdlib ElementTree — ontologies are config-sized
    inputs (bounded at ``RDF_XML_MAX_BYTES``, same policy as the pandas
    formats; the reference loads them whole into rdflib driver memory too).
    Supported striped syntax: rdf:Description + typed node elements,
    rdf:about / rdf:ID (resolved against xml:base) / rdf:nodeID / anonymous
    blank nodes, property elements with rdf:resource / nested nodes /
    literal content, rdf:datatype, inherited xml:lang, and
    rdf:parseType="Resource". rdf:parseType Literal/Collection and
    reification fail loudly."""
    import os
    import xml.etree.ElementTree as ET

    size = os.path.getsize(path)
    if size > RDF_XML_MAX_BYTES:
        raise ValueError(
            f"{path} is {size} bytes — over the {RDF_XML_MAX_BYTES}-byte "
            "driver-side bound for RDF/XML; convert to N-Triples for "
            "distributed loading (read_rdf_triples)"
        )
    root = ET.parse(path).getroot()
    if root.tag != f"{{{_RDF_NS}}}RDF":
        # a single typed top-level node document is also legal RDF/XML
        nodes = [root]
    else:
        nodes = list(root)

    triples: list[tuple] = []
    blank_n = 0

    def new_blank() -> str:
        nonlocal blank_n
        blank_n += 1
        return f"_:b{blank_n}"

    def tag_uri(tag: str) -> str:
        if not tag.startswith("{"):
            raise ValueError(f"unnamespaced RDF/XML element {tag!r} in {path}")
        ns, local = tag[1:].split("}", 1)
        return ns + local

    def attr(e, local: str):
        return e.get(f"{{{_RDF_NS}}}{local}")

    def node_subject(e, base: str) -> str:
        about, rid, nid = attr(e, "about"), attr(e, "ID"), attr(e, "nodeID")
        if about is not None:
            return about
        if rid is not None:
            return f"{base}#{rid}"
        if nid is not None:
            return f"_:{nid}"
        return new_blank()

    def walk_node(e, base: str, lang: str | None) -> str:
        base = e.get(_XML_BASE, base)
        lang = e.get(_XML_LANG, lang)
        subj = node_subject(e, base)
        t = tag_uri(e.tag)
        if t != f"{_RDF_NS}Description":
            triples.append((subj, f"{_RDF_NS}type", t, "uri", None, None))
        for p in e:
            walk_property(subj, p, base, lang)
        return subj

    def walk_property(subj: str, p, base: str, lang: str | None) -> None:
        lang = p.get(_XML_LANG, lang)
        pred = tag_uri(p.tag)
        parse_type = attr(p, "parseType")
        res, nid, dtype = attr(p, "resource"), attr(p, "nodeID"), attr(p, "datatype")
        kids = list(p)
        if parse_type == "Resource":
            b = new_blank()
            triples.append((subj, pred, b, "blank", None, None))
            for sub in kids:
                walk_property(b, sub, base, lang)
        elif parse_type is not None:
            raise ValueError(
                f"rdf:parseType={parse_type!r} is not supported — convert "
                f"to N-Triples (e.g. riot --output=ntriples): {path}"
            )
        elif res is not None:
            triples.append((subj, pred, res, "uri", None, None))
        elif nid is not None:
            triples.append((subj, pred, f"_:{nid}", "blank", None, None))
        elif kids:
            for sub in kids:
                obj = walk_node(sub, base, lang)
                kind = "blank" if obj.startswith("_:") else "uri"
                triples.append((subj, pred, obj, kind, None, None))
        else:
            text = p.text or ""
            triples.append(
                (subj, pred, text, "literal", None if dtype else lang, dtype)
            )

    doc_base = root.get(_XML_BASE, "")
    for e in nodes:
        walk_node(e, doc_base, None)

    return spark.createDataFrame(triples, _RDF_SCHEMA)


_XSD = "http://www.w3.org/2001/XMLSchema#"


def read_jsonld(
    spark: SparkSession, path: str, contexts: dict | None = None
) -> DataFrame:
    """JSON-LD (``.jsonld`` — the schema.org-embed serialization the
    reference accepts via rdflib, loader.py:345-360) -> the same flat
    triple frame as :func:`read_rdf_triples`.

    Driver-side ``json.loads`` expansion under the same config-size bound
    as :func:`read_rdf_xml`. Covers the common authored shape: a node
    object or array of node objects (or a top-level ``@graph``), an
    inline ``@context`` with term->IRI mappings, ``@vocab``, prefix
    definitions and ``{"@id"/"@type": ...}`` term definitions; node keys
    ``@id``/``@type``; values as scalars (typed xsd literals), ``@value``
    objects (with ``@language``/``@type``), ``{"@id": ...}`` references,
    nested node objects (expanded recursively, linked by id or blank
    node), and arrays (one triple per element). ``@set`` (value object
    or ``@container`` term) unwraps to its members; ``@list`` expands to
    the standard RDF collection (``rdf:first``/``rdf:rest`` chain ending
    in ``rdf:nil``, empty list -> ``rdf:nil`` directly) — the shape
    rdflib emits for the same document, so downstream closure/automap
    sees identical triples. ``@reverse`` (node-object keyword and
    context term-definition forms) emits the reversed triples per the
    JSON-LD 1.1 expansion algorithm; ``@nest`` objects flatten onto the
    enclosing node (expansion 13.4.8).

    Remote/external ``@context`` URLs: there is no network in a locked-
    down executor, so they resolve ONLY through ``contexts`` — a
    ``{url: context}`` map where each value is an inline context dict, a
    full JSON-LD document dict (its ``@context`` member is taken), or a
    local ``.jsonld``/``.json`` file path holding either — the documented
    air-gapped deployment pattern (vendor the context documents next to
    the job). An unmapped remote URL fails loudly — convert with
    ``riot --output=ntriples``."""
    import json as _json
    import os

    size = os.path.getsize(path)
    if size > RDF_XML_MAX_BYTES:
        raise ValueError(
            f"{path} is {size} bytes — over the {RDF_XML_MAX_BYTES}-byte "
            "driver-side bound for JSON-LD; convert to N-Triples for "
            "distributed loading (read_rdf_triples)"
        )
    with open(path) as f:
        doc = _json.load(f)

    triples: list[tuple] = []
    blank_n = 0

    def new_blank() -> str:
        nonlocal blank_n
        blank_n += 1
        return f"_:j{blank_n}"

    def resolve_remote(url: str):
        """Remote @context -> its mapped local substitute (see docstring)."""
        sub = (contexts or {}).get(url)
        if sub is None:
            raise ValueError(
                f"remote @context {url!r} is not supported (no network) — "
                "map it in `contexts=`, inline it, or convert to N-Triples"
            )
        if isinstance(sub, str):
            with open(sub) as cf:
                sub = _json.load(cf)
        if isinstance(sub, dict) and "@context" in sub:
            sub = sub["@context"]  # a full context DOCUMENT was vendored
        return sub

    def build_context(raw) -> dict:
        if raw is None:
            return {}
        if isinstance(raw, str):
            return build_context(resolve_remote(raw))
        if isinstance(raw, list):
            ctx: dict = {}
            for part in raw:
                ctx.update(build_context(part))
            return ctx
        return dict(raw)

    def expand_iri(term: str, ctx: dict, vocab_ok: bool) -> str:
        """Term -> IRI using context terms, prefixes, and @vocab."""
        if term.startswith(("http://", "https://", "urn:", "_:")):
            return term
        if term in ctx:
            defn = ctx[term]
            if isinstance(defn, dict):
                defn = defn.get("@id", term)
            if defn != term:
                return expand_iri(defn, ctx, vocab_ok)
            return defn
        if ":" in term:
            prefix, suffix = term.split(":", 1)
            if prefix in ctx and isinstance(ctx[prefix], str):
                return ctx[prefix] + suffix
            return term  # an absolute IRI with an unknown scheme
        if vocab_ok and "@vocab" in ctx:
            return ctx["@vocab"] + term
        return term

    def term_def(term: str, ctx: dict) -> dict:
        d = ctx.get(term)
        return d if isinstance(d, dict) else {}

    def node_id(obj: dict, ctx: dict) -> str:
        nid = obj.get("@id")
        return expand_iri(nid, ctx, vocab_ok=False) if nid else new_blank()

    def emit_list(subj: str, pred: str, items, ctx: dict, tdef: dict) -> None:
        """RDF collection expansion: subj pred -> rdf:first/rdf:rest
        blank-node chain ending in rdf:nil (empty list -> rdf:nil)."""
        if not isinstance(items, list):
            items = [items]
        item_tdef = {k: v for k, v in tdef.items() if k != "@container"}
        prev, prev_pred = subj, pred
        for item in items:
            b = new_blank()
            triples.append((prev, prev_pred, b, "blank", None, None))
            emit_value(b, _RDF_FIRST, item, ctx, item_tdef)
            prev, prev_pred = b, _RDF_REST
        triples.append((prev, prev_pred, _RDF_NIL, "uri", None, None))

    def emit_value(subj: str, pred: str, v, ctx: dict, tdef: dict) -> None:
        if isinstance(v, list):
            if tdef.get("@container") == "@list":
                emit_list(subj, pred, v, ctx, tdef)
                return
            for item in v:
                emit_value(subj, pred, item, ctx, tdef)
            return
        if isinstance(v, dict):
            if "@list" in v:
                emit_list(subj, pred, v["@list"], ctx, tdef)
                return
            if "@set" in v:
                emit_value(subj, pred, v["@set"], ctx,
                           {k: x for k, x in tdef.items() if k != "@container"})
                return
            if "@value" in v:
                dt = v.get("@type")
                dt = expand_iri(dt, ctx, vocab_ok=True) if dt else None
                lang = v.get("@language")
                triples.append(
                    (subj, pred, _scalar_str(v["@value"]), "literal",
                     None if dt else lang, dt)
                )
                return
            if set(v) == {"@id"}:
                obj = expand_iri(v["@id"], ctx, vocab_ok=False)
                kind = "blank" if obj.startswith("_:") else "uri"
                triples.append((subj, pred, obj, kind, None, None))
                return
            # nested node object: expand it, link by its id
            obj = walk(v, ctx)
            kind = "blank" if obj.startswith("_:") else "uri"
            triples.append((subj, pred, obj, kind, None, None))
            return
        # scalar: @type: @id coercion, else a typed/plain literal
        if tdef.get("@type") == "@id" and isinstance(v, str):
            obj = expand_iri(v, ctx, vocab_ok=False)
            kind = "blank" if obj.startswith("_:") else "uri"
            triples.append((subj, pred, obj, kind, None, None))
            return
        dt = tdef.get("@type")
        dt = expand_iri(dt, ctx, vocab_ok=True) if dt else _scalar_datatype(v)
        lang = tdef.get("@language") if dt is None else None
        triples.append((subj, pred, _scalar_str(v), "literal", lang, dt))

    def emit_reverse(subj: str, pred: str, item, ctx: dict) -> None:
        """One reversed triple: the VALUE becomes the subject and ``subj``
        the object — JSON-LD 1.1 expansion 13.8 (reverse property values
        must be node objects or IRI references; literals are the spec's
        'invalid reverse property value' error)."""
        if isinstance(item, str):
            src = expand_iri(item, ctx, vocab_ok=False)
        elif isinstance(item, dict) and not ({"@value", "@list", "@set"} & set(item)):
            src = walk(item, ctx)
        else:
            raise ValueError(
                f"invalid reverse property value {item!r} — @reverse values "
                "must be node objects or IRI references"
            )
        kind = "blank" if subj.startswith("_:") else "uri"
        triples.append((src, pred, subj, kind, None, None))

    def walk(obj: dict, ctx: dict) -> str:
        if "@context" in obj:
            ctx = {**ctx, **build_context(obj["@context"])}
        subj = node_id(obj, ctx)
        types = obj.get("@type") or []
        for t in types if isinstance(types, list) else [types]:
            triples.append(
                (subj, _RDF_TYPE, expand_iri(t, ctx, vocab_ok=True),
                 "uri", None, None)
            )
        emit_properties(subj, obj, ctx)
        return subj

    def emit_properties(subj: str, obj: dict, ctx: dict) -> None:
        """The property loop of a node object — shared by ``walk`` and
        ``@nest`` unwrapping (nested properties belong to the ENCLOSING
        node, JSON-LD 1.1 expansion 13.4.8)."""
        for k, v in obj.items():
            if k == "@reverse":
                # node-object keyword form: {"@reverse": {p: nodes...}}
                if not isinstance(v, dict):
                    raise ValueError(f"@reverse must map to an object, got {v!r}")
                for rk, rv in v.items():
                    rpred = expand_iri(rk, ctx, vocab_ok=True)
                    for item in rv if isinstance(rv, list) else [rv]:
                        emit_reverse(subj, rpred, item, ctx)
                continue
            tdef = term_def(k, ctx)
            if k == "@nest" or ctx.get(k) == "@nest" or tdef.get("@id") == "@nest":
                # structural sugar: the nest object's properties attach
                # to subj itself (no intermediate node)
                for nest in v if isinstance(v, list) else [v]:
                    if not isinstance(nest, dict) or "@value" in nest:
                        raise ValueError(
                            f"invalid @nest value {nest!r} — must be a "
                            "node object without @value"
                        )
                    emit_properties(subj, nest, ctx)
                continue
            if k.startswith("@"):
                if k not in ("@context", "@id", "@type"):
                    raise ValueError(
                        f"JSON-LD keyword {k!r} is not supported — convert "
                        "to N-Triples (e.g. riot --output=ntriples)"
                    )
                continue
            if "@reverse" in tdef:
                # context term-definition form: {"children": {"@reverse": p}}
                rpred = expand_iri(tdef["@reverse"], ctx, vocab_ok=True)
                for item in v if isinstance(v, list) else [v]:
                    emit_reverse(subj, rpred, item, ctx)
                continue
            pred = expand_iri(k, ctx, vocab_ok=True)
            emit_value(subj, pred, v, ctx, tdef)

    top_ctx = build_context(doc.get("@context")) if isinstance(doc, dict) else {}
    if isinstance(doc, dict) and "@graph" in doc:
        nodes = doc["@graph"]
    elif isinstance(doc, list):
        nodes = doc
    else:
        nodes = [doc]
    for n in nodes:
        if not isinstance(n, dict):
            raise ValueError(f"top-level JSON-LD node must be an object, got {n!r}")
        walk(n, top_ctx)

    return spark.createDataFrame(triples, _RDF_SCHEMA)


def _scalar_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _scalar_datatype(v):
    """xsd datatype for a bare JSON scalar, per JSON-LD expansion rules."""
    if isinstance(v, bool):
        return f"{_XSD}boolean"
    if isinstance(v, int):
        return f"{_XSD}integer"
    if isinstance(v, float):
        return f"{_XSD}double"
    return None  # plain string literal


# --------------------------------------------------------------------------
# Exotic pandas formats (reference loader.py:198-216): Excel / SAS / SPSS /
# Stata / Feather / Pickle / HDF. These are inherently driver-side,
# config-sized inputs — a documented size bound guards the createDataFrame.
# --------------------------------------------------------------------------

PANDAS_FORMAT_MAX_BYTES = 512 * 1024 * 1024

_PANDAS_READERS = {
    ".xlsx": ("read_excel", "openpyxl"),
    ".xls": ("read_excel", "xlrd"),
    ".sas7bdat": ("read_sas", None),
    ".xpt": ("read_sas", None),
    ".sav": ("read_spss", "pyreadstat"),
    ".dta": ("read_stata", None),
    ".feather": ("read_feather", "pyarrow"),
    ".pickle": ("read_pickle", None),
    ".pkl": ("read_pickle", None),
    ".h5": ("read_hdf", "tables"),
    ".hdf5": ("read_hdf", "tables"),
}


def read_pandas_format(spark: SparkSession, path: str, **reader_kwargs) -> DataFrame:
    """Load one of the reference's pandas-backed file formats
    (loader.py:198-216) through a driver-side pandas read ->
    ``createDataFrame`` with string cells.

    These formats are not splittable and have no Spark datasource — they are
    the reference's config/fixture inputs, bounded here at
    ``PANDAS_FORMAT_MAX_BYTES``. Anything row-shaped at scale belongs in
    parquet. Optional engines (openpyxl, pyreadstat, tables) raise a clear
    ImportError naming the missing package when absent."""
    import os

    import pandas as pd

    ext = next((e for e in _PANDAS_READERS if path.lower().endswith(e)), None)
    if ext is None:
        raise ValueError(
            f"unsupported pandas format for {path!r}; known: {sorted(_PANDAS_READERS)}"
        )
    size = os.path.getsize(path)
    if size > PANDAS_FORMAT_MAX_BYTES:
        raise ValueError(
            f"{path} is {size} bytes — over the {PANDAS_FORMAT_MAX_BYTES}-byte "
            "driver-side bound for pandas formats; convert to parquet for Spark-side loading"
        )
    reader_name, engine_pkg = _PANDAS_READERS[ext]
    try:
        pdf = getattr(pd, reader_name)(path, **reader_kwargs)
    except ImportError as e:
        raise ImportError(
            f"reading {ext} needs the optional package "
            f"{engine_pkg or '(see pandas docs)'}: {e}"
        ) from e
    pdf = pdf.astype(str).where(pdf.notna(), None)
    return as_string_cells(spark.createDataFrame(pdf))
