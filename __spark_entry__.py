"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family of the engine
(SURVEY.md §2) through its public API over the driver testdata; the matching
``oracle_sql()`` string reproduces the semantics in DuckDB SQL. Hashing used
by dedup/minhash/simhash queries is md5-prefix-int in both engines so values
match bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"

# the shared null-skip predicate as SQL (base.is_not_null semantics)
_SQL_VALID = "({c} IS NOT NULL AND {c} <> '' AND lower({c}) <> 'nan' AND {c} <> 'None')"

# md5-prefix-int in both engines
_SQL_MD5INT = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"

def _psl_sql() -> str:
    """Registrable-domain oracle: replays urls.with_registrable_domain's
    PSL longest-match against the SAME vendored suffix list (imported,
    not copied) over the deterministic synthetic hosts."""
    from ontoweaver_spark.urls import DEFAULT_PUBLIC_SUFFIXES

    lits = ", ".join("'" + s + "'" for s in DEFAULT_PUBLIC_SUFFIXES)
    return f"""
    WITH sfx AS (SELECT unnest([{lits}]) AS s),
    hosts AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN 's' || (doc_id % 50)::VARCHAR || '.' || tail
               WHEN 1 THEN 'w' || (doc_id % 7)::VARCHAR || '.s'
                           || (doc_id % 50)::VARCHAR || '.' || tail
               ELSE tail
             END AS host
      FROM (
        SELECT doc_id,
               CASE doc_id % 6 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
                 WHEN 2 THEN 'github.io' WHEN 3 THEN 'com.au'
                 WHEN 4 THEN 'org' ELSE 'unknowntld' END AS tail
        FROM documents
      )
    ), cand AS (
      SELECT h.doc_id, h.host, s.s
      FROM hosts h LEFT JOIN sfx s
        ON h.host = s.s OR h.host LIKE '%.' || s.s
    ), best AS (
      SELECT doc_id, host, arg_max(s, length(s)) AS b
      FROM cand GROUP BY doc_id, host
    )
    SELECT doc_id, host,
           CASE
             WHEN b IS NULL THEN
               CASE WHEN len(string_split(host, '.')) <= 1 THEN host
                    ELSE string_split(host, '.')[-2] || '.'
                         || string_split(host, '.')[-1] END
             WHEN host = b THEN NULL
             ELSE string_split(substr(host, 1, length(host) - length(b) - 1),
                               '.')[-1] || '.' || b
           END AS domain,
           coalesce(b, string_split(host, '.')[-1]) AS public_suffix
    FROM best"""


def _ppr_push_sql(rounds: int = 4, scale: int = 1_000_000, alpha: int = 15) -> str:
    """Unrolled round-synchronous forward push mirroring
    graphstats.ppr_forward_push on the (7,61)x(11,53) hub graph with
    hub%13==0 seeds: absorb alpha*res//100, split the rest //out-degree,
    FULL OUTER merge est/res — '//' floor division equals Spark's div on
    the non-negative masses."""
    parts = [f"""
    WITH raw AS (
      SELECT 'hub' || ((doc_id*7)%61)::VARCHAR AS s,
             'hub' || ((doc_id*11)%53)::VARCHAR AS d
      FROM documents
    ), e AS MATERIALIZED (
      SELECT DISTINCT s, d FROM raw
    ), outd AS MATERIALIZED (
      SELECT s, count(*)::BIGINT AS od FROM e GROUP BY s
    ), s0 AS (
      SELECT DISTINCT 'hub' || ((doc_id*7)%61)::VARCHAR AS node,
             0::BIGINT AS est, {scale}::BIGINT AS res
      FROM documents WHERE ((doc_id*7)%61) % 13 = 0
    )"""]
    for i in range(1, rounds + 1):
        parts.append(f""", a{i} AS MATERIALIZED (
      SELECT node, (est + res * {alpha} // 100)::BIGINT AS est,
             (res - res * {alpha} // 100)::BIGINT AS outp
      FROM s{i - 1}
    ), i{i} AS (
      SELECT e.d AS node, sum(a.outp // o.od)::BIGINT AS res
      FROM a{i} a JOIN outd o ON o.s = a.node JOIN e ON e.s = a.node
      WHERE a.outp > 0 GROUP BY e.d
    ), s{i} AS MATERIALIZED (
      SELECT coalesce(a.node, i.node) AS node,
             coalesce(a.est, 0)::BIGINT AS est,
             coalesce(i.res, 0)::BIGINT AS res
      FROM a{i} a FULL JOIN i{i} i ON a.node = i.node
    )""")
    parts.append(f"""
    SELECT node, est, res FROM s{rounds} WHERE est > 0 OR res > 0""")
    return "".join(parts)


# HLL constants shared by q_hll_count and its oracle: p=10 -> m=1024
# registers, K = 60-10+1 = 51; the full estimator numerator
# alpha_m * m^2 * 2^K folded into ONE double whose shortest repr
# round-trips identically in Spark and DuckDB.
_HLL_NUM = repr(0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 * float(1 << 51))

# validation rule SQL (mirrors ontoweaver_spark.validate.compile_rule for the
# validate_docs query's rules)
_VALID_LANG = (
    "(" + _SQL_VALID.format(c="lang") + " AND lang IN ('en','es','fr','de'))"
)
_VALID_NCHARS = "(n_chars IS NULL OR (n_chars >= 50 AND n_chars <= 520))"
_VALID_TEXT = (
    "(" + _SQL_VALID.format(c="text") + r" AND regexp_matches(text, '\S'))"
)


def _tune(spark: SparkSession) -> SparkSession:
    from ontoweaver_spark import tune_session

    return tune_session(spark)


def _spread(spark, df):
    """Ensure at least defaultParallelism partitions. Spark splits scans by
    BYTES (maxPartitionBytes), so a byte-small but compute-heavy table
    (shingling/hashing/regex per row) lands on ONE core of 32 — measured
    7.4s for the shingle explode alone at sf0.1. At real scale the scan has
    more splits than cores and this is a no-op; the shuffle it adds here
    moves kilobytes."""
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_spread(spark, sf_dir):
    # for the shingle/hash-heavy ops only — the KG extraction path is
    # cheaper without the extra exchange (measured +1.2s at sf0.1)
    return _spread(spark, _docs(spark, sf_dir))


def _emb(spark, sf_dir):
    return _spread(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


# --------------------------------------------------------------------------
# flagship: documents -> knowledge graph (extract + fuse through the engine)
# --------------------------------------------------------------------------
DOCS_KG_MAPPING = {
    "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
    "transformers": [
        {"map": {"column": "lang", "to_object": "language", "via_relation": "in_language"}},
        {"map": {"column": "source", "to_object": "source", "via_relation": "from_source"}},
        {"map": {"column": "n_chars", "to_properties": ["n_chars"]}},
    ],
}


def _kg(spark, sf_dir):
    from ontoweaver_spark import weave

    _tune(spark)
    return weave(_docs(spark, sf_dir), DOCS_KG_MAPPING, affix="suffix", reconciliate_sep=",")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: documents -> fused KG nodes."""
    fnodes, _ = _kg(spark, SF0001)
    return fnodes.select("id", "label").orderBy("id")


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------

def q_kg_nodes(spark, sf_dir):
    fnodes, _ = _kg(spark, sf_dir)
    return fnodes.select("id", "label")


def q_kg_edges(spark, sf_dir):
    _, fedges = _kg(spark, sf_dir)
    return fedges.select("src", "dst", F.col("label").alias("elabel"))


def q_kg_fusion_props(spark, sf_dir):
    # property set-union across duplicate subjects: one node per lang,
    # sources merged as a sorted distinct ','-join
    from ontoweaver_spark import weave
    from ontoweaver_spark.fusion import format_for_export

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "lang", "to_subject": "language"}},
        "transformers": [
            {"map": {"column": "source", "to_properties": ["sources"]}},
        ],
    }
    fnodes, _ = weave(_docs(spark, sf_dir), mapping, affix="none", reconciliate_sep=",")
    out = format_for_export(fnodes, sep=",")
    return out.select(
        F.col("id").alias("lang"), F.col("properties")["sources"].alias("sources")
    )


def q_t_split(spark, sf_dir):
    # split transformer: text tokens -> nodes; count per distinct token
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
        "transformers": [
            {"split": {"column": "text", "separator": " ", "to_object": "token",
                       "via_relation": "has_token"}},
        ],
    }
    nodes, _ = extract(_docs(spark, sf_dir), mapping, affix="none")
    return (
        nodes.where(F.col("label") == "token")
        .groupBy(F.col("id").alias("token"))
        .agg(F.count("*").alias("n"))
    )


def q_t_cat_format(spark, sf_dir):
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "c_custkey", "to_subject": "customer"}},
        "transformers": [
            {"cat_format": {"columns": ["c_name", "c_mktsegment"],
                            "format_string": "{c_name}/{c_mktsegment}",
                            "to_object": "tag", "via_relation": "tagged"}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nodes, _ = extract(df, mapping, affix="none")
    return nodes.where(F.col("label") == "tag").select(F.col("id").alias("tag")).distinct()


def q_t_translate(spark, sf_dir):
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
        "transformers": [
            {"translate": {"column": "lang",
                           "translations": {"en": "English", "es": "Spanish",
                                            "fr": "French", "de": "German"},
                           "to_object": "language", "via_relation": "in_language"}},
        ],
    }
    nodes, _ = extract(_docs(spark, sf_dir), mapping, affix="none")
    return (
        nodes.where(F.col("label") == "language")
        .groupBy(F.col("id").alias("lang_name"))
        .agg(F.count("*").alias("n"))
    )


def q_t_boolean(spark, sf_dir):
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "event_id", "to_subject": "event"}},
        "transformers": [
            {"boolean": {"column": "event_type",
                         "consider_true": ["click", "view"],
                         "consider_false": ["purchase", "signup"],
                         "output_true": "engagement", "output_false": "conversion",
                         "to_object": "flag", "via_relation": "flagged"}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    nodes, _ = extract(df, mapping, affix="none")
    return (
        nodes.where(F.col("label") == "flag")
        .groupBy(F.col("id").alias("flag"))
        .agg(F.count("*").alias("n"))
    )


def q_t_replace(spark, sf_dir):
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "p_partkey", "to_subject": "part"}},
        "transformers": [
            {"replace": {"column": "p_name", "to_object": "clean_name",
                         "via_relation": "named"}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    nodes, _ = extract(df, mapping, affix="none")
    return (
        nodes.where(F.col("label") == "clean_name")
        .groupBy(F.col("id").alias("clean_name"))
        .agg(F.count("*").alias("n"))
    )


def q_t_maths(spark, sf_dir):
    # raw per-row extraction (no fusion: (orderkey, linenumber) is not
    # unique in the synthetic lineitem, so rows compare as a multiset)
    from ontoweaver_spark import extract
    from ontoweaver_spark.textops import round_ieee

    _tune(spark)
    mapping = {
        "row": {"cat_format": {"columns": ["l_orderkey", "l_linenumber"],
                               "format_string": "{l_orderkey}-{l_linenumber}",
                               "to_subject": "line"}},
        "transformers": [
            {"maths": {"columns": ["l_extendedprice", "l_discount"],
                       "operation": "{l_extendedprice} * (1 - {l_discount})",
                       "to_properties": ["revenue"]}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nodes, _ = extract(df, mapping, affix="none")
    return nodes.select(
        F.col("id").alias("line_id"),
        round_ieee(
            F.element_at(F.col("properties")["revenue"], 1).cast("double"), 2
        ).alias("revenue"),
    )


def q_t_case(spark, sf_dir):
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "n_nationkey", "to_subject": "nation"}},
        "transformers": [
            {"lower": {"column": "n_name", "to_object": "lname", "via_relation": "r"}},
            {"capitalize": {"column": "n_name", "to_object": "cname", "via_relation": "r"}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nodes, _ = extract(df, mapping, affix="none")
    return (
        nodes.where(F.col("label") != "nation")
        .select(F.col("label").alias("op"), F.col("id").alias("value"))
        .distinct()
    )


def q_t_regex_extract(spark, sf_dir):
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "p_partkey", "to_subject": "part"}},
        "transformers": [
            {"regex_extract": {"column": "p_brand", "pattern": "Brand#(\\d+)",
                               "group": 1, "to_object": "brand_num",
                               "via_relation": "branded"}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    nodes, _ = extract(df, mapping, affix="none")
    return (
        nodes.where(F.col("label") == "brand_num")
        .groupBy(F.col("id").alias("brand_num"))
        .agg(F.count("*").alias("n"))
    )


def q_events_nested(spark, sf_dir):
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "event_id", "to_subject": "event"}},
        "transformers": [
            {"nested": {"columns": ["props", "k"], "to_object": "kval",
                        "via_relation": "has_k"}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    _, edges = extract(df, mapping, affix="none")
    return edges.select(F.col("src").alias("event_id"), F.col("dst").alias("k_val"))


# ---- hard mapping semantics (match / from_subject / reverse / final_type /
# affix) — the fixture-family features, driver-checkable --------------------

def q_kg_match_branch(spark, sf_dir):
    """Ordered regex `match` branching (make_labels.py:106-136): first hit
    wins, branch picks node type AND edge label."""
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
        "transformers": [
            {"map": {"column": "lang", "match": [
                {"^en$": {"to_object": "english", "via_relation": "lang_en"}},
                {"^(es|fr)$": {"to_object": "romance", "via_relation": "lang_romance"}},
                {".": {"to_object": "other_lang", "via_relation": "lang_other"}},
            ]}},
        ],
    }
    _, edges = extract(_docs(spark, sf_dir), mapping, affix="none")
    return edges.groupBy(
        F.col("label").alias("elabel"), F.col("dst").alias("lang")
    ).agg(F.count("*").alias("n"))


def q_kg_from_subject(spark, sf_dir):
    """`from_subject` edge re-rooting (iterative.py:706-805): the priority
    edge hangs off the customer node, not the order subject."""
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "o_orderkey", "to_subject": "order"}},
        "transformers": [
            {"map": {"column": "o_custkey", "to_object": "customer",
                     "via_relation": "ordered_by"}},
            {"map": {"column": "o_orderpriority", "to_object": "priority",
                     "via_relation": "has_priority", "from_subject": "customer"}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _, edges = extract(df, mapping, affix="none")
    return edges.where(F.col("label") == "has_priority").select(
        F.col("src").alias("custkey"), F.col("dst").alias("priority")
    )


def q_kg_reverse_edge(spark, sf_dir):
    """`reverse_relation` mirrored edges (iterative.py:615-630)."""
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
        "transformers": [
            {"map": {"column": "source", "to_object": "source",
                     "via_relation": "from_source", "reverse_relation": "has_doc"}},
        ],
    }
    _, edges = extract(_docs(spark, sf_dir), mapping, affix="none")
    return edges.select("src", "dst", F.col("label").alias("elabel"))


def q_kg_final_type(spark, sf_dir):
    """`final_type` label override (iterative.py:375-381) under a suffix
    affix: the node ID affixes with the FINAL type."""
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
        "transformers": [
            {"map": {"column": "lang", "to_object": "lang_tmp",
                     "via_relation": "in_language", "final_type": "language"}},
        ],
    }
    nodes, edges = extract(_docs(spark, sf_dir), mapping, affix="suffix")
    n = nodes.where(F.col("label") == "language").select(
        F.col("id"), F.col("label"), F.lit("node").alias("kind")
    ).distinct()
    e = edges.select(
        F.col("dst").alias("id"), F.col("label"), F.lit("edge").alias("kind")
    ).distinct()
    return n.unionByName(e)


def q_kg_affix_prefix(spark, sf_dir):
    """ID affix modes (iterative.py:95-129; fixture F2): prefix with a
    custom separator."""
    from ontoweaver_spark import extract

    _tune(spark)
    nodes, _ = extract(_docs(spark, sf_dir), DOCS_KG_MAPPING,
                       affix="prefix", type_affix_sep="___")
    return nodes.select("id", "label").distinct()


def q_t_cat(spark, sf_dir):
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "n_nationkey", "to_subject": "nation"}},
        "transformers": [
            {"cat": {"columns": ["n_name", "n_regionkey"], "to_object": "tag",
                     "via_relation": "tagged"}},
        ],
    }
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nodes, _ = extract(df, mapping, affix="none")
    return nodes.where(F.col("label") == "tag").select(F.col("id").alias("tag")).distinct()


def q_t_string(spark, sf_dir):
    """`string` constant transformer + metadata properties attachment."""
    from ontoweaver_spark import weave
    from ontoweaver_spark.fusion import format_for_export

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "lang", "to_subject": "language"}},
        "transformers": [
            {"string": {"value": "corpus-v1", "to_properties": ["release"]}},
        ],
        "metadata": [{"pipeline": "ontoweaver-spark"}],
    }
    fnodes, _ = weave(_docs(spark, sf_dir), mapping, affix="none")
    out = format_for_export(fnodes, sep=",")
    return out.select(
        F.col("id").alias("lang"),
        F.col("properties")["release"].alias("release"),
        F.col("properties")["pipeline"].alias("pipeline"),
    )


def q_t_split_translate(spark, sf_dir):
    """split + per-piece dictionary translate with keep-unknown policy."""
    from ontoweaver_spark import extract

    _tune(spark)
    mapping = {
        "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
        "transformers": [
            {"split_translate": {
                "column": "text", "separator": " ",
                "translations": {"spark": "SPARK", "table": "TABLE", "join": "JOIN"},
                "on_unknown_value": "keep",
                "to_object": "token", "via_relation": "has_token"}},
        ],
    }
    nodes, _ = extract(_docs(spark, sf_dir), mapping, affix="none")
    return (
        nodes.where(F.col("label") == "token")
        .groupBy(F.col("id").alias("token"))
        .agg(F.count("*").alias("n"))
    )


def q_kg_two_sources(spark, sf_dir):
    """Multi-source fusion (reference tests/test_2_databases.py family):
    customer nodes extracted from TWO tables union before one global
    reconciliation; properties merge across sources."""
    from ontoweaver_spark import compile_mapping, reconciliate
    from ontoweaver_spark.fusion import format_for_export

    _tune(spark)
    m_cust = {
        "row": {"map": {"id_from_column": "c_custkey", "to_subject": "customer"}},
        "transformers": [
            {"map": {"column": "c_mktsegment", "to_properties": ["segment"]}},
        ],
    }
    m_orders = {
        "row": {"map": {"id_from_column": "o_custkey", "to_subject": "customer"}},
        "transformers": [
            {"map": {"column": "o_orderpriority", "to_properties": ["priorities"]}},
        ],
    }
    r1 = compile_mapping(spark.read.parquet(f"{sf_dir}/customer.parquet"), m_cust)
    r2 = compile_mapping(spark.read.parquet(f"{sf_dir}/orders.parquet"), m_orders)
    fnodes, _ = reconciliate(
        r1.nodes.unionByName(r2.nodes), r1.edges.unionByName(r2.edges),
        reconciliate_sep=",", raise_errors=False,
    )
    out = format_for_export(fnodes, sep=",")
    return out.select(
        F.col("id").alias("custkey"),
        F.col("properties")["segment"].alias("segment"),
        F.col("properties")["priorities"].alias("priorities"),
    )


# ---- entity linking / canonicalization / co-mention ------------------------

ALIAS_ROWS = [(f"SRC{i}", f"origin-{i}") for i in range(10)]


def q_entity_link(spark, sf_dir):
    """Alias-table entity linking: canonicalized mention -> broadcast-join
    against the alias dimension; unknown mentions keep their canonical key."""
    from ontoweaver_spark.linking import link_entities

    _tune(spark)
    aliases = spark.createDataFrame(ALIAS_ROWS, "alias string, canonical string")
    mentions = _docs(spark, sf_dir).select(F.col("source").alias("mention"))
    linked = link_entities(mentions, aliases, on_unknown="keep")
    return linked.groupBy("entity_id", F.col("linked").cast("int").alias("linked")).agg(
        F.count("*").alias("n")
    )


def q_entity_canonical(spark, sf_dir):
    """Entity-name canonicalization (lower+punct-strip+ws-collapse)."""
    from ontoweaver_spark.linking import canonical_entity

    _tune(spark)
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return df.select(
        F.col("c_custkey").alias("custkey"),
        canonical_entity(F.col("c_name")).alias("canon_name"),
    )


COMENTION_ENTITIES = ["spark", "join", "window", "vector", "stream"]


def q_comention(spark, sf_dir):
    """Cross-document co-mention edges keyed on canonical entity ids."""
    from ontoweaver_spark.linking import comention_edges

    _tune(spark)
    ents = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("e"))
        .where(F.col("e").isin(COMENTION_ENTITIES))
        .distinct()
    )
    return comention_edges(ents, doc_col="doc_id", entity_col="e")


def q_validate_docs(spark, sf_dir):
    """Input validation: per-rule violation counts in one aggregation pass."""
    from ontoweaver_spark.validate import compile_rule, validity

    _tune(spark)
    rules = {
        "lang": {"isin": ["en", "es", "fr", "de"], "required": True},
        "n_chars": {"in_range": [50, 520]},
        "text": {"str_matches": r"\S", "required": True},
    }
    df = _docs(spark, sf_dir)
    return df.agg(
        F.count("*").alias("total"),
        F.sum(validity(rules).cast("long")).alias("valid"),
        F.sum((~compile_rule("lang", rules["lang"])).cast("long")).alias("bad_lang"),
        F.sum((~compile_rule("n_chars", rules["n_chars"])).cast("long")).alias("bad_n_chars"),
        F.sum((~compile_rule("text", rules["text"])).cast("long")).alias("bad_text"),
    )


def q_pages_web_kg(spark, sf_dir):
    """North-star pipeline, fully hash-verified: a pages table (url,
    warc_ts, html, text, lang) is derived from the driver's documents
    parquet by ANSI-SQL-expressible expressions, then run through the FULL
    WEB_KG_MAPPING (regex host extraction, language, keyword + outlink
    regexp_extract_all, text/fetched_at/n_tokens properties) and fusion.
    Returns the whole fused graph — nodes with their merged properties plus
    edges — in one frame the DuckDB oracle reproduces bit-for-bit."""
    from ontoweaver_spark.fusion import format_for_export
    from ontoweaver_spark.pages import pages_from_documents, web_kg

    _tune(spark)
    pages = pages_from_documents(_docs(spark, sf_dir))
    fnodes, fedges = web_kg(pages)
    nodes = format_for_export(fnodes, sep=",")
    n = nodes.select(
        F.lit("node").alias("kind"),
        F.col("id"),
        F.col("label"),
        F.lit("").alias("dst"),
        F.coalesce(F.col("properties")["text"], F.lit("")).alias("p_text"),
        F.coalesce(F.col("properties")["n_tokens"], F.lit("")).alias("p_n_tokens"),
        F.coalesce(F.col("properties")["fetched_at"], F.lit("")).alias("p_fetched_at"),
    )
    e = fedges.select(
        F.lit("edge").alias("kind"),
        F.col("src").alias("id"),
        F.col("label"),
        F.col("dst"),
        F.lit("").alias("p_text"),
        F.lit("").alias("p_n_tokens"),
        F.lit("").alias("p_fetched_at"),
    )
    return n.unionByName(e)


# ---- training-data ops -----------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from ontoweaver_spark.dedup import exact_duplicates

    _tune(spark)
    return exact_duplicates(_docs_spread(spark, sf_dir)).select(
        "fingerprint", "n_docs", "canonical_id"
    )


def q_dedup_minhash(spark, sf_dir):
    from ontoweaver_spark.dedup import minhash_candidates

    _tune(spark)
    return minhash_candidates(_docs_spread(spark, sf_dir))


def q_dedup_jaccard(spark, sf_dir):
    from ontoweaver_spark.dedup import jaccard_pairs

    _tune(spark)
    # max_shingle_df: the stop-shingle cap that bounds the inverted-index
    # join at O(df*cap) instead of O(df^2) per hot shingle
    return jaccard_pairs(_docs_spread(spark, sf_dir), threshold=0.8, max_shingle_df=20)


def q_dedup_simhash(spark, sf_dir):
    """Per-doc simhash signatures at the library default (60-bit — the
    DuckDB mirror builds the same 60 signed-sum CASE terms over BIGINT)."""
    from ontoweaver_spark.dedup import simhash

    _tune(spark)
    return _docs_spread(spark, sf_dir).select(
        "doc_id", simhash(F.col("text")).alias("simhash")
    )


def q_dedup_simhash_near(spark, sf_dir):
    """Simhash near-dup pairs at the PRODUCTION defaults (60-bit
    signature, hamming<=3, 4 pigeonhole bands — the Manku shape): banded
    candidates + popcount verify. The oracle is the BRUTE-FORCE all-pairs
    xor over the same 60-bit signatures — the banding is provably lossless
    (bands > max_hamming), so the two must agree exactly. (r3 pinned this
    to bits=16/hamming<=1; at sf0.1 that 65k signature space collides into
    2.7M degenerate pairs — the very trap the 60-bit default removes.)"""
    from ontoweaver_spark.dedup import simhash_near_duplicates

    _tune(spark)
    return simhash_near_duplicates(_docs_spread(spark, sf_dir))


def q_dedup_verified(spark, sf_dir):
    """LSH candidates + exact-Jaccard verification (the scale path that
    duplicate_clusters feeds from), surfaced as its own checked operator."""
    from ontoweaver_spark.dedup import verified_candidates

    _tune(spark)
    return verified_candidates(_docs_spread(spark, sf_dir), threshold=0.5)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters: jaccard>=0.8 pairs -> iterative connected
    components (min-label propagation with lineage checkpoints)."""
    from ontoweaver_spark.dedup import duplicate_clusters

    _tune(spark)
    return duplicate_clusters(_docs_spread(spark, sf_dir), threshold=0.8)


def q_decontam(spark, sf_dir):
    """Train/eval 13-gram decontamination report (the GPT-3/PaLM rule):
    eval set = every 23rd doc; every corpus doc sharing a distinct 13-gram
    with an eval doc surfaces as (doc_id, eval_id, n_shared) — the eval
    docs themselves plus their exact/near duplicate families. The eval
    n-gram set broadcasts; the corpus side never shuffles."""
    from ontoweaver_spark.decontam import contamination_report

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    ev = _docs(spark, sf_dir).where(F.col("doc_id") % 23 == 0)
    return contamination_report(docs, ev, n=13)


def q_web_corpus_prep(spark, sf_dir):
    """FLAGSHIP web-pipeline composition — the end-to-end 'crawl to
    training corpus' run, every stage a library operator chained into one
    declarative plan: synthesize two fetches per page (one later, noisy
    casing/slashes/tracking) -> canonicalize + latest-per-URL dedup
    (urls) -> quality + language filter (textops) -> exact dedup keep-min
    (fingerprint) -> 13-gram decontamination vs an eval set (decontam) ->
    deterministic stratified downsample (sampling). The DuckDB oracle
    composes the same five mirrors."""
    from ontoweaver_spark.decontam import decontaminate
    from ontoweaver_spark.sampling import stratified_sample
    from ontoweaver_spark.textops import fingerprint, quality_score, token_count
    from ontoweaver_spark.urls import latest_per_url

    _tune(spark)
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id").cast("string")
    keep = ["doc_id", "text", "lang"]
    v1 = docs.select(
        F.concat(F.lit("https://crawl."), F.lower("source"), F.lit(".com/p/"), did).alias("url"),
        F.col("doc_id").alias("ts"), *keep,
    )
    v2 = docs.select(
        F.concat(F.lit("HTTPS://CRAWL."), F.upper("source"), F.lit(".COM//p//"), did,
                 F.lit("/?utm_source=x")).alias("url"),
        (F.col("doc_id") + 10_000_000).alias("ts"), *keep,
    )
    crawl = latest_per_url(v1.unionByName(v2), url_col="url", ts_col="ts")
    # explicit repartition (not _spread): AQE coalesces the byte-small
    # post-agg exchange to 1-2 partitions, which would serialize the
    # compute-heavy quality/fingerprint/shingle chain below; a user
    # repartition is exempt from AQE coalescing. No-op at real scale.
    crawl = crawl.repartition(spark.sparkContext.defaultParallelism)

    c = F.col("text")
    feats = crawl.select(
        "doc_id", "lang", "text",
        quality_score(c).alias("quality"),
        token_count(c).alias("n_tokens"),
        fingerprint(c).alias("fp"),
    )
    kept = feats.where(
        (F.col("quality") >= 0.5) & F.col("lang").isin("en", "de", "fr", "es")
    )
    canon = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    # materialize once: decontaminate consumes the corpus TWICE (the
    # contaminated-id set on the broadcast side AND the anti-join left
    # side) — without this the whole url-dedup + quality + fingerprint
    # chain executes twice (measured 11.1 s -> ~6 s at sf0.1)
    uniq = kept.join(canon, ["fp", "doc_id"]).localCheckpoint(eager=False)
    ev = docs.where(F.col("doc_id") % 97 == 0)
    clean = decontaminate(uniq, ev, text_col="text", id_col="doc_id", n=13)
    return stratified_sample(clean, "lang", {"en": 0.5}, "doc_id", seed=11).select(
        "doc_id", "lang", "n_tokens", "quality"
    )


def q_corpus_stats(spark, sf_dir):
    """Per-language corpus profile (doc counts, token budget, exact
    interpolated length percentiles).  exact=True so DuckDB's
    quantile_cont mirrors Spark's percentile bit-for-bit; int_e4=True
    returns the four statistics as exact integer ten-thousandths
    (BIGINT) so the cross-engine hash gate has no float-serialization
    surface at all — the doubles themselves were verified bit-identical
    (struct.pack) at sf0.001/0.01/0.1, the r4 red row was
    serialization-side."""
    from ontoweaver_spark.textops import corpus_stats

    _tune(spark)
    return corpus_stats(_docs(spark, sf_dir), exact=True, int_e4=True)


def q_url_canon(spark, sf_dir):
    """URL canonicalization (the first operator of any crawl pipeline):
    mixed-case scheme/host, default port, duplicate slashes, tracking
    params and fragments all normalize away; non-tracking params survive.
    URLs are synthesized deterministically from documents columns so the
    DuckDB oracle builds the byte-identical input."""
    from ontoweaver_spark.urls import canonical_url

    _tune(spark)
    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("HTTPS://"), F.upper(F.col("source")), F.lit(".Example.COM:443//d//"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=feed&id="), F.col("doc_id").cast("string"),
        F.lit("&utm_campaign=x&ref=rss#frag"),
    )
    return docs.select("doc_id", canonical_url(url).alias("canonical_url"))


def q_url_dedup(spark, sf_dir):
    """Crawl-snapshot dedup: two synthetic fetches per page (one clean,
    one later with case/slash/tracking noise) collapse to one canonical
    row each, keeping the latest fetch — one max_by hash aggregate."""
    from ontoweaver_spark.urls import latest_per_url

    _tune(spark)
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id").cast("string")
    v1 = docs.select(
        F.concat(F.lit("https://crawl."), F.lower("source"), F.lit(".com/p/"), did).alias("url"),
        F.col("doc_id").alias("ts"),
    )
    v2 = docs.select(
        F.concat(F.lit("HTTPS://CRAWL."), F.upper("source"), F.lit(".COM//p//"), did,
                 F.lit("/?utm_source=x")).alias("url"),
        (F.col("doc_id") + 10_000_000).alias("ts"),
    )
    return latest_per_url(v1.unionByName(v2), url_col="url", ts_col="ts")


def q_text_features(spark, sf_dir):
    from ontoweaver_spark.textops import fingerprint, lang_id, quality_score, token_count

    _tune(spark)
    c = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )


def q_ann_topk(spark, sf_dir):
    from ontoweaver_spark.similarity import topk_bruteforce

    _tune(spark)
    emb = _emb(spark, sf_dir)
    probes = emb.where(F.col("vec_id") < 5)
    return topk_bruteforce(emb, probes, k=5)


def q_ann_topk_bucketed(spark, sf_dir):
    from ontoweaver_spark.similarity import topk_bucketed

    _tune(spark)
    emb = _emb(spark, sf_dir)
    probes = emb.where(F.col("vec_id") < 5)
    return topk_bucketed(emb, probes, k=5)


def q_ann_topk_ivf(spark, sf_dir):
    from ontoweaver_spark.similarity import topk_ivf

    _tune(spark)
    emb = _emb(spark, sf_dir)
    probes = emb.where(F.col("vec_id") < 5)
    return topk_ivf(emb, probes, k=5, n_centroids=8, nprobe=2)


def q_emb_near_dup(spark, sf_dir):
    from ontoweaver_spark.dedup import embedding_near_duplicates

    _tune(spark)
    emb = _emb(spark, sf_dir)
    return embedding_near_duplicates(emb, threshold=0.3)


def q_emb_near_dup_amp(spark, sf_dir):
    """OR-amplified near-dup: two 8-bit sign tables (dims 1-8 OR 9-16) —
    the recall path when buckets are sized narrow for corpus scale."""
    from ontoweaver_spark.dedup import embedding_near_duplicates

    _tune(spark)
    emb = _emb(spark, sf_dir)
    return embedding_near_duplicates(emb, threshold=0.3, dims=8, tables=2)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): deterministic-centroid clustering,
    within-cluster cosine pairs, drop any vector with a lower-id
    neighbor at cos >= 0.4 — the paraphrase-level dedup MinHash cannot
    see. Oracle: the identical assignment + per-cluster pair filter in
    plain SQL."""
    from ontoweaver_spark.similarity import semantic_dedup

    _tune(spark)
    return semantic_dedup(_emb(spark, sf_dir), threshold=0.4, n_clusters=8)


def q_sessionize(spark, sf_dir):
    """Per-user gap sessions over the events table via Spark's NATIVE
    session_window; the oracle derives the same sessions independently with
    the lag + cumulative-sum SQL formulation — the two constructions must
    agree exactly (merged-gap-window semantics)."""
    from ontoweaver_spark.sessions import session_stats

    _tune(spark)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(events, gap_minutes=30)


def _part_tree_edges(spark, sf_dir):
    """Deterministic type hierarchy derived from the part table: key k is a
    subclass of k // 2 (a binary tree over the partkeys, ~log2(n) deep) —
    the same derive-from-driver-parquet trick as pages_web_kg so the
    closure is oracle-checkable."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return part.where(F.col("p_partkey") >= 2).select(
        F.col("p_partkey").cast("bigint").alias("child"),
        F.floor(F.col("p_partkey") / 2).cast("bigint").alias("parent"),
    )


def q_onto_closure(spark, sf_dir):
    """Subclass transitive closure via path doubling (ontology.py) —
    the reference's rdfs:subClassOf ancestor walk, distributed."""
    from ontoweaver_spark.ontology import subclass_closure

    _tune(spark)
    return subclass_closure(_part_tree_edges(spark, sf_dir))


def q_onto_automap(spark, sf_dir):
    """Family-automap semantics: each partkey label maps to its nearest
    ancestor among the declared targets (keys 1..15), self at depth 0."""
    from ontoweaver_spark.ontology import automap_to_targets, subclass_closure

    _tune(spark)
    edges = _part_tree_edges(spark, sf_dir)
    closure = subclass_closure(edges)
    labeled = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        F.col("p_partkey").cast("string").alias("label"),
    )
    targets = spark.range(1, 16).select(F.col("id").cast("string").alias("target"))
    return (
        automap_to_targets(labeled, closure, targets)
        .select("p_partkey", "nearest_type", "type_dist")
        # keys with no target ancestor (partkey 0 sits outside the tree) map
        # to NULL; drop them here so the oracle stays an inner join — the
        # NULL contract is pytest-covered (test_automap_nearest_target)
        .where(F.col("nearest_type").isNotNull())
    )


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified downsampling (rebalance the head language);
    pure filter, zero shuffle, reproducible under any partitioning."""
    from ontoweaver_spark.sampling import stratified_sample

    _tune(spark)
    return stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        strata_col="lang",
        fractions={"en": 0.2, "de": 0.5},
        key_col="doc_id",
        seed=7,
    )


def q_hash_split(spark, sf_dir):
    """Deterministic leakage-safe train/eval split by key hash."""
    from ontoweaver_spark.sampling import hash_split

    _tune(spark)
    return hash_split(
        _docs(spark, sf_dir).select("doc_id"), key_col="doc_id",
        eval_fraction=0.1, seed=3,
    )


def q_corpus_prep(spark, sf_dir):
    """Flagship training-data pipeline COMPOSITION: quality filter ->
    exact-dedup (keep the lowest doc_id per fingerprint) -> deterministic
    stratified downsample of the head language. Every stage is the library
    operator (textops / sampling), chained as one declarative plan — the
    'prepare a training corpus' query a 100-TB user runs end to end."""
    from ontoweaver_spark.sampling import stratified_sample
    from ontoweaver_spark.textops import fingerprint, quality_score, token_count

    _tune(spark)
    c = F.col("text")
    feats = _docs(spark, sf_dir).select(
        "doc_id", "lang",
        quality_score(c).alias("quality"),
        token_count(c).alias("n_tokens"),
        fingerprint(c).alias("fp"),
    )
    kept = feats.where(
        (F.col("quality") >= 0.5) & F.col("lang").isin("en", "de", "fr", "es")
    )
    canon = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    uniq = kept.join(canon, ["fp", "doc_id"])
    return stratified_sample(
        uniq, "lang", {"en": 0.5}, "doc_id", seed=11
    ).select("doc_id", "lang", "n_tokens", "quality")


def q_kg_pagerank(spark, sf_dir):
    """Fixed-point PageRank (5 integer power iterations) over the fused
    KG edges — hub scoring beyond raw degree. Integer arithmetic makes the
    result bit-identical across engines/partitionings, so the DuckDB
    oracle (the same 5 iterations unrolled as CTEs) hash-matches exactly —
    a float PageRank could never be oracle-checked this way."""
    from ontoweaver_spark.graphstats import pagerank_fixed_point

    _, fedges = _kg(spark, sf_dir)
    return pagerank_fixed_point(fedges, iterations=5)


def q_kg_khop(spark, sf_dir):
    """2-hop neighborhood of every 50th document node over the fused KG
    (undirected frontier BFS, min hop per node) — the subgraph-extraction
    query every KG consumer runs; oracle = bounded recursive CTE."""
    from ontoweaver_spark.graphstats import k_hop_neighborhood

    _, fedges = _kg(spark, sf_dir)
    seeds = _docs(spark, sf_dir).where(F.col("doc_id") % 50 == 0).select(
        F.concat(F.col("doc_id").cast("string"), F.lit(":document")).alias("node")
    )
    return k_hop_neighborhood(fedges, seeds, k=2)


def q_kg_diff(spark, sf_dir):
    """Build-to-build KG diff — 'what did this crawl batch change': the
    KG without every 3rd document vs the full KG, diffed on per-node
    degree. Removed docs surface as 'added' doc nodes (they exist only in
    the new build) and their language/source hubs as 'changed' (degree
    moved). One full-outer join keyed on node id."""
    from ontoweaver_spark import weave
    from ontoweaver_spark.graphstats import degree_stats, graph_diff

    _tune(spark)
    docs = _docs(spark, sf_dir)
    _, old_edges = weave(
        docs.where(F.col("doc_id") % 3 != 0), DOCS_KG_MAPPING,
        affix="suffix", reconciliate_sep=",",
    )
    _, new_edges = _kg(spark, sf_dir)
    return graph_diff(
        degree_stats(old_edges), degree_stats(new_edges),
        key_cols=["node"], compare_cols=["degree"],
    )


def q_kg_degree(spark, sf_dir):
    """Hub detection over the fused KG: top-20 nodes by total degree
    (the skew profile the salted fusion defends against)."""
    from ontoweaver_spark.graphstats import top_hubs

    _, fedges = _kg(spark, sf_dir)
    return top_hubs(fedges, k=20)


def q_rep_signals(spark, sf_dir):
    """Gopher-style repetition quality signals (top-bigram fraction,
    duplicate-token fraction) per document."""
    from ontoweaver_spark.textops import repetition_signals

    _tune(spark)
    return repetition_signals(_docs_spread(spark, sf_dir))


def q_top_ngrams(spark, sf_dir):
    """Per-language top-k vocabulary head (map-side-combined count + tiny
    top-k window)."""
    from ontoweaver_spark.textops import top_tokens

    _tune(spark)
    return top_tokens(_docs_spread(spark, sf_dir), k=5, min_len=2)


def q_lm_score(spark, sf_dir):
    """Corpus-trained bigram-LM fluency per document (integer MLE
    transition probabilities) — the perplexity-filter stage, made
    engine-exact by rational arithmetic."""
    from ontoweaver_spark.textops import lm_fluency

    _tune(spark)
    return lm_fluency(_docs_spread(spark, sf_dir))


def q_train_order(spark, sf_dir):
    """Deterministic global epoch shuffle: md5-keyed permutation with a
    contiguous 0-based position from the lazy distributed zip-with-index
    (range-partitioned sort; never a single-task global window)."""
    from ontoweaver_spark.sampling import training_order

    _tune(spark)
    return training_order(_docs(spark, sf_dir).select("doc_id"), seed=3)


def q_dsir_weights(spark, sf_dir):
    """DSIR-style hashed-unigram importance weights against the English
    slice as target — the domain-relevance sampling stage, integer-exact."""
    from ontoweaver_spark.textops import importance_weights

    _tune(spark)
    return importance_weights(_docs_spread(spark, sf_dir), F.col("lang") == "en")


def q_corpus_cube(spark, sf_dir):
    """CUBE(lang, source) corpus volume rollup — the curation dashboard
    query, one grouping-set aggregate (a surface the reference lacks
    entirely, SURVEY.md §2.5)."""
    from ontoweaver_spark.textops import corpus_rollup

    _tune(spark)
    return corpus_rollup(_docs(spark, sf_dir))


def q_pq_codes(spark, sf_dir):
    """Product-quantization codes over the embeddings table (4 subspaces,
    16-entry seeded codebook) — the vector-compression stage; engine-exact
    via double-cast diffs + sequential-fold dot and rounded argmin."""
    from ontoweaver_spark.similarity import pq_codes

    _tune(spark)
    return pq_codes(_emb(spark, sf_dir), m=4, k=16, dim=64)


def q_cross_dedup(spark, sf_dir):
    """Cross-corpus MinHash dedup: near-dup pairs between the even-id half
    (the 'new batch') and the odd-id half (the 'existing corpus') — the
    incremental-crawl contamination join, strictly two-sided."""
    from ontoweaver_spark.dedup import cross_corpus_duplicates

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    return cross_corpus_duplicates(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        threshold=0.5,
    )


def q_len_quantiles(spark, sf_dir):
    """Exact interpolated per-language token-length quantiles from a value
    histogram — never buffers a group's values (the percentile-agg scale
    trap); engine-exact vs DuckDB quantile_cont."""
    from ontoweaver_spark.textops import length_quantiles

    _tune(spark)
    return length_quantiles(_docs(spark, sf_dir), group_col="lang")


def q_asof_join(spark, sf_dir):
    """Backward as-of join (point-in-time lookup): every 'view' event
    gains the latest preceding-or-equal 'click' of the same user — the
    operator the brief names that Spark lacks natively, implemented as the
    union + carry-forward sweep (one user-keyed shuffle). The oracle is
    DuckDB's NATIVE ASOF LEFT JOIN — a completely independent physical
    strategy."""
    from ontoweaver_spark.sessions import asof_join

    _tune(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts", "user_id",
        F.col("value").alias("click_value"),
    )
    out = asof_join(views, clicks, right_cols=["click_id", "click_value"])
    # raw timestamps don't value-compare across engines (tz/precision);
    # emit exact microsecond integers like sessionize does
    return out.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id", "value", "click_id_r", "click_value_r",
    )


def q_range_join(spark, sf_dir):
    """Interval (range) join via time bucketing: every event of a user
    inside any [error_ts, error_ts + 10 min] incident window of that user
    — the only shuffle is an equi-join on (user, bin); DuckDB runs the
    same query as a native inequality join (IEJoin), an independent
    physical strategy."""
    from ontoweaver_spark.sessions import range_join

    _tune(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    windows = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"), "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end"),
    )
    points = ev.select("event_id", "ts", "user_id")
    return range_join(points, windows, bin_seconds=600).select(
        "event_id", "user_id", "incident_id"
    )


def q_sample_weighted(spark, sf_dir):
    """Priority weighted sampling (Ohlsson/Duffield): the exactly-k sample
    with inclusion odds proportional to n_chars — executed as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    from ontoweaver_spark.sampling import weighted_sample

    _tune(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return weighted_sample(docs, "n_chars", k=50, seed=7)


def q_sample_poisson(spark, sf_dir):
    """Expected-size-k Poisson weighted sampling: a pure deterministic
    filter (zero data shuffle; one tiny total-weight broadcast)."""
    from ontoweaver_spark.sampling import weighted_sample

    _tune(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return weighted_sample(docs, "n_chars", k=60, seed=3, method="poisson")


def q_vocab_kmv(spark, sf_dir):
    """KMV distinct sketch: per-language vocabulary-size estimate from the
    k smallest token hashes — a deterministic cardinality sketch (HLL's
    registers differ per engine; md5 order statistics do not)."""
    from ontoweaver_spark.textops import kmv_distinct, tokens

    _tune(spark)
    tok = _docs_spread(spark, sf_dir).select(
        "lang", F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )
    return kmv_distinct(tok, "lang", "token", k=16)


def q_bpe(spark, sf_dir):
    """Distributed BPE merge-rule training (6 merges) over the corpus —
    tokenizer vocabulary learning as a lazy k-round Spark plan (word-
    frequency collapse, per-round 1-row top-1 broadcast, literal greedy
    replace). Oracle: the same rounds unrolled as MATERIALIZED CTEs."""
    from ontoweaver_spark.textops import bpe_merges

    _tune(spark)
    return bpe_merges(_docs(spark, sf_dir), k_merges=6)


def q_pmi(spark, sf_dir):
    """Top-20 collocations by rational PMI (word2vec phrase detection) —
    log is monotone so integer ratio ranking IS the PMI ranking."""
    from ontoweaver_spark.textops import pmi_collocations

    _tune(spark)
    return pmi_collocations(_docs_spread(spark, sf_dir), min_count=5, k=20)


def q_kg_triangles(spark, sf_dir):
    """Per-node triangle counts over the hub co-citation graph of the
    flagship pages table: two hubs cited by the same page get an
    undirected edge (derived arithmetically with distinct moduli —
    (doc_id*7)%61 vs (doc_id*11)%53 — so the edge set mixes instead of
    cycling, and the DuckDB oracle rebuilds it identically; 579 triangles
    over 61 hubs at sf0.01). Degree-ordered wedge enumeration; the
    community/clustering signal of the web graph."""
    from ontoweaver_spark.graphstats import triangle_count

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return triangle_count(cocite)


def q_pii_scrub(spark, sf_dir):
    """PII redaction (emails / IPv4 / phone numbers -> typed placeholders
    plus per-category counts) — the release scrub pass. The corpus text is
    deterministically salted with synthetic PII first (ANSI-expressible,
    mirrored in the oracle) so every pattern family actually fires."""
    from ontoweaver_spark.textops import scrub_pii

    _tune(spark)
    i = F.col("doc_id")
    salted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                i % 3 == 0,
                F.concat(F.lit(" contact user"), i.cast("string"),
                         F.lit("@mail.example now")),
            ).otherwise(F.lit("")),
            F.when(
                i % 5 == 0,
                F.concat(F.lit(" from 10."), (i % 200).cast("string"),
                         F.lit(".0.1")),
            ).otherwise(F.lit("")),
            F.when(
                i % 7 == 0,
                F.concat(F.lit(" call 555-867-"),
                         F.lpad((i % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_pii(salted)


def q_tfidf_terms(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (rational integer idf — see
    textops.tfidf_top_terms for why the scores are engine-exact).
    max_df_frac pinned to 1.0: the synthetic corpus has a ~30-token
    vocabulary where 29/30 tokens sit in >50% of docs, so the production
    stopword cut (0.5) would leave a near-empty result; disabling it
    makes the oracle exercise the FULL tf/df/rank arithmetic on every
    doc (1500 rows at sf0.01)."""
    from ontoweaver_spark.textops import tfidf_top_terms

    _tune(spark)
    return tfidf_top_terms(
        _docs_spread(spark, sf_dir), k=3, min_len=3, max_df_frac=1.0
    )


def q_temp_mix(spark, sf_dir):
    """sqrt-temperature language rebalancing of the corpus (alpha=0.5:
    keep rate sqrt(n_min/n_lang) per language — IEEE-exact, so the kept
    row SET hash-matches the oracle)."""
    from ontoweaver_spark.sampling import temperature_mix_sample

    _tune(spark)
    return temperature_mix_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        strata_col="lang", key_col="doc_id", alpha=0.5, seed=42,
    )


def q_chunk_docs(spark, sf_dir):
    """Sliding-window context chunking at width 20 / overlap 5 (small
    enough that every synthetic doc yields several windows)."""
    from ontoweaver_spark.textops import chunk_documents

    _tune(spark)
    return chunk_documents(
        _docs_spread(spark, sf_dir), chunk_tokens=20, overlap=5
    )


def q_pack_seq(spark, sf_dir):
    """Document-level sequence packing at seq_len=256: global token-offset
    cumsum in doc_id order via range partitions + broadcast offsets (never
    a single-partition Window over the corpus)."""
    from ontoweaver_spark.textops import pack_sequences

    _tune(spark)
    return pack_sequences(_docs(spark, sf_dir), seq_len=256)


def q_kg_kcore(spark, sf_dir):
    """k-core backbone of the hub co-citation graph at k=15, pinned to
    EXACTLY 2 peel rounds so the DuckDB oracle can unroll the same two
    rounds as CTEs (at sf0.01 the peel genuinely cascades: 61 -> 53 ->
    37 nodes; fixpoint is 0, so the 2-round pin captures mid-cascade
    state — a stronger check than a converged answer)."""
    from ontoweaver_spark.graphstats import k_core

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return k_core(cocite, k=15, exact_rounds=2)


def q_boilerplate(spark, sf_dir):
    """Frequent-line boilerplate strip over a deterministically salted
    multi-line corpus: every doc gains a shared copyright footer (df =
    n_docs -> stripped) and a per-doc unique ref line (df = 1 -> kept);
    the base text line lives or dies by its exact-duplicate family size,
    exercising the threshold both ways."""
    from ontoweaver_spark.textops import strip_boilerplate_lines

    _tune(spark)
    salted = _docs_spread(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("(c) example corp all rights reserved"),
            F.concat(F.lit("ref "), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return strip_boilerplate_lines(salted, max_line_docs=10)


def q_inverted_index(spark, sf_dir):
    """Corpus inverted index: token -> df, total tf, doc-sorted postings
    rendered as a string (byte-comparable across engines)."""
    from ontoweaver_spark.textops import inverted_index

    _tune(spark)
    return inverted_index(_docs_spread(spark, sf_dir), min_len=3)


def q_kg_bgp(spark, sf_dir):
    """SPARQL-core basic-graph-pattern match over the FUSED KG edges:
    bind (?d in_language ?l) . (?d from_source ?s) and return every
    (d, l, s) solution — the 'query the graph you just built' read path.
    Two filtered edge-table projections joined on the shared variable;
    the oracle derives the same bindings straight from the documents
    table (an independent derivation that never sees the edge list)."""
    from ontoweaver_spark.graphquery import match_pattern

    _, fedges = _kg(spark, sf_dir)
    return match_pattern(
        fedges, [("?d", "in_language", "?l"), ("?d", "from_source", "?s")]
    ).select("d", "l", "s")


def q_kg_communities(spark, sf_dir):
    """Synchronous label-propagation communities (3 rounds) over the hub
    co-citation graph (same arithmetic edge derivation as kg_triangles).
    Deterministic min_by tie-break makes an ITERATIVE community algorithm
    hash-oracle-checkable — the oracle unrolls the same 3 rounds as CTEs
    with a window argmax, an independent engine + formulation."""
    from ontoweaver_spark.graphstats import label_propagation

    _tune(spark)
    docs = _docs(spark, sf_dir)
    edges = docs.select(
        F.concat(F.lit("hub"), ((F.col("doc_id") * 7) % 61).cast("string")).alias("src"),
        F.concat(F.lit("hub"), ((F.col("doc_id") * 11) % 53).cast("string")).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return label_propagation(edges, rounds=3)


# sparse pseudo-random doc graph: 3 out-edges per document into the SAME
# doc-id space (mod n), so average degree stays ~6 at every scale factor —
# unlike the 114-hub co-citation graph whose degree grows linearly with the
# corpus. This is the scale-shaped input for walk / link-prediction queries;
# the oracle re-derives it with the same arithmetic (see _DOC_GRAPH_SQL).
_DOC_GRAPH_PARAMS = ((7919, 13), (104729, 101), (1299709, 977))


def _doc_graph(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = docs.count()  # one tiny driver count; doc_id is contiguous 0..n-1
    i = F.col("doc_id").cast("long")
    parts = [
        docs.select(
            F.concat(F.lit("n"), i.cast("string")).alias("src"),
            F.concat(F.lit("n"), ((i * p + c) % n).cast("string")).alias("dst"),
        )
        for p, c in _DOC_GRAPH_PARAMS
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def _doc_graph_sql() -> str:
    """CTE body (`raw(src, dst)`) mirroring _doc_graph in DuckDB."""
    selects = [
        f"""SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id::BIGINT * {p} + {c}) %
                     (SELECT count(*) FROM documents))::VARCHAR AS dst
      FROM documents"""
        for p, c in _DOC_GRAPH_PARAMS
    ]
    return "\n      UNION ALL\n      ".join(selects)


def q_kg_walks(spark, sf_dir):
    """Deterministic uniform random walks (DeepWalk / node2vec p=q=1 corpus
    generation) over the sparse doc graph: hash-min neighbor selection makes
    a RANDOMIZED algorithm a pure function of (graph, seed), so the walks
    hash-match a DuckDB oracle that unrolls the same arg_min steps as CTEs.
    One row per visited position (walk_id, step, node)."""
    from ontoweaver_spark.graphstats import random_walks

    _tune(spark)
    return random_walks(
        _doc_graph(spark, sf_dir), walk_length=3, walks_per_node=1, seed=0
    )


def q_kg_linkpred(spark, sf_dir):
    """Common-neighbor / Resource-Allocation link prediction over the sparse
    doc graph — KG completion candidates ranked by shared structure. Exact
    integer RA arithmetic (scale DIV deg) keeps scores engine-portable; hub
    neighbors above the degree cap are excluded (the wedge-join bound that
    survives 10^12 edges)."""
    from ontoweaver_spark.graphstats import link_prediction_scores

    _tune(spark)
    return link_prediction_scores(
        _doc_graph(spark, sf_dir), max_degree=16, min_common=2
    )


def q_kg_hits(spark, sf_dir):
    """HITS hubs & authorities (4 max-normalized integer rounds) over the
    sparse doc graph — the link-analysis complement to PageRank. Integer
    fixed-point arithmetic makes an eigenvector-style iteration
    hash-matchable against the oracle's unrolled CTEs."""
    from ontoweaver_spark.graphstats import hits_fixed_point

    _tune(spark)
    return hits_fixed_point(_doc_graph(spark, sf_dir), iterations=4)


def q_kg_sssp(spark, sf_dir):
    """Weighted multi-source shortest paths (6 exact Bellman-Ford rounds,
    zero driver syncs) over the sparse doc graph with md5-derived integer
    edge weights; seeds = every 97th doc node. Exact-rounds mode is what an
    unrolled SQL oracle can mirror; fixpoint mode is tested separately."""
    from ontoweaver_spark.graphstats import shortest_paths
    from ontoweaver_spark.textops import md5_int

    _tune(spark)
    weighted = _doc_graph(spark, sf_dir).select(
        "src", "dst",
        (1 + md5_int(F.concat(F.lit("w:"), F.col("src"), F.lit(">"), F.col("dst"))) % 9)
        .alias("w"),
    )
    seeds = _docs(spark, sf_dir).where(F.col("doc_id") % 97 == 0).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("node")
    )
    return shortest_paths(weighted, seeds, weight_col="w", rounds=6)


def q_host_graph(spark, sf_dir):
    """Weighted host-level link graph from in-text outlinks over the
    derived pages table — the domain-ranking input (host PageRank / spam
    k-core start here). Spark extracts links by regexp and parses hosts;
    the oracle never runs a regex — it re-derives the link hosts
    arithmetically from doc_id, an independent derivation."""
    from ontoweaver_spark.pages import pages_from_documents
    from ontoweaver_spark.urls import host_link_graph

    _tune(spark)
    pages = pages_from_documents(_docs(spark, sf_dir))
    return host_link_graph(pages)


def q_quality_classifier(spark, sf_dir):
    """Model-based quality filter: fastText-shaped linear classifier
    over hashed bag-of-words with the (synthetic, md5-derived) weight
    table broadcast as data. Integer weights keep inference exact, so
    score AND keep decision hash-match the DuckDB oracle."""
    from ontoweaver_spark.textops import hashed_linear_score, hashed_weights

    _tune(spark)
    w = hashed_weights(spark, n_buckets=4096, seed=5)
    return hashed_linear_score(
        _docs(spark, sf_dir), w, n_buckets=4096, min_len=3, threshold=0
    )


def q_rdf_ntriples(spark, sf_dir):
    """N-Triples serialization of the fused KG (rdf_export) — the
    vendor-neutral publish path next to the Neo4j bulk emitter. Returns
    the rendered lines themselves so the oracle (which string-concats the
    same lines straight from documents, percent-encoding ':' by hand)
    hash-checks the SERIALIZER byte-for-byte, not just the triple set."""
    from ontoweaver_spark.rdf_export import graph_to_triples, serialize_ntriples

    fnodes, fedges = _kg(spark, sf_dir)
    return serialize_ntriples(
        graph_to_triples(
            fnodes.select("id", "label"),
            fedges.select("src", "dst", "label"),
        )
    )


def q_community_graph(spark, sf_dir):
    """Coarsen the hub graph by its 3-round LPA communities into the
    weighted super-graph — the multilevel/drill-down step after community
    detection."""
    from ontoweaver_spark.graphstats import community_graph, label_propagation

    _tune(spark)
    docs = _docs(spark, sf_dir)
    edges = docs.select(
        F.concat(F.lit("hub"), ((F.col("doc_id") * 7) % 61).cast("string")).alias("src"),
        F.concat(F.lit("hub"), ((F.col("doc_id") * 11) % 53).cast("string")).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return community_graph(edges, label_propagation(edges, rounds=3))


def q_ppr(spark, sf_dir):
    """Personalized PageRank over the sparse doc graph, seeded at every
    101st document — proximity-to-trusted-seeds ranking; exact-integer
    rounds hash-match the unrolled oracle."""
    from ontoweaver_spark.graphstats import personalized_pagerank

    _tune(spark)
    seeds = _docs(spark, sf_dir).where(F.col("doc_id") % 101 == 0).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("node")
    )
    return personalized_pagerank(_doc_graph(spark, sf_dir), seeds, iterations=5)


def q_modularity(spark, sf_dir):
    """Newman modularity of the 3-round LPA communities over the hub
    co-citation graph — exact-integer numerator/denominator, one FP
    division; scores the community detection instead of just running it."""
    from ontoweaver_spark.graphstats import label_propagation, modularity

    _tune(spark)
    docs = _docs(spark, sf_dir)
    edges = docs.select(
        F.concat(F.lit("hub"), ((F.col("doc_id") * 7) % 61).cast("string")).alias("src"),
        F.concat(F.lit("hub"), ((F.col("doc_id") * 11) % 53).cast("string")).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    comm = label_propagation(edges, rounds=3)
    return modularity(edges, comm)


def q_interleave(spark, sf_dir):
    """Language-balanced interleaved training order: rank r of every
    language precedes rank r+1 of any language, md5 epoch shuffle within
    a language — multilingual mix from step one."""
    from ontoweaver_spark.sampling import interleaved_order

    _tune(spark)
    return interleaved_order(_docs(spark, sf_dir), "lang", seed=3).select(
        "doc_id", "lang", "position"
    )


BM25_QUERY = ["spark", "join", "window"]


def q_bm25(spark, sf_dir):
    """Top-25 BM25 lexical retrieval for a 3-term query — fixed-order
    per-term partial sums keep the FP score bit-identical cross-engine."""
    from ontoweaver_spark.textops import bm25_topk

    _tune(spark)
    return bm25_topk(_docs_spread(spark, sf_dir), BM25_QUERY, k=25)


def q_sliding_windows(spark, sf_dir):
    """SLIDING-window rollup (1h window, 30m slide — each event lands in
    exactly two windows) via the native F.window overlap explode; the
    oracle derives both covering windows arithmetically per event."""
    _tune(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = F.window(F.col("ts").cast("timestamp"), "1 hour", "30 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.min("event_id").alias("first_event"))
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            "event_type", "n", "first_event",
        )
    )


def q_quality_tiles(spark, sf_dir):
    """Per-language length deciles via ntile (deterministic order:
    n_chars DESC, doc_id) — the curriculum-bucketing stage. Partitioned by
    lang so no single-task global sort; the global variant should go
    through the histogram quantiles (len_quantiles) instead."""
    from pyspark.sql import Window

    _tune(spark)
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return _docs(spark, sf_dir).select(
        "doc_id", "lang", F.ntile(10).over(w).alias("tile")
    )


def q_norm_text(spark, sf_dir):
    """Crawl-text normalization over a deterministically-dirtied corpus
    (ZWSP + tabs + a BEL control char + a 4-newline run injected around
    each document's text): byte-noise variants normalize to one string."""
    from ontoweaver_spark.textops import normalize_text

    _tune(spark)
    dirty = F.concat(
        F.lit("\u200b  "), F.col("text"),
        F.lit("\t\tend\u0007here\n\n\n\ntail  "),
    )
    return _docs(spark, sf_dir).select(
        "doc_id", normalize_text(dirty).alias("clean")
    )


def q_dedup_keep(spark, sf_dir):
    """The actionable dedup output: one (doc_id, cluster_id, keep) row per
    document — keep = cluster canonical or unclustered. Downstream
    filtering is a pure WHERE keep."""
    from ontoweaver_spark.dedup import dedup_decisions

    _tune(spark)
    return dedup_decisions(_docs_spread(spark, sf_dir), threshold=0.8)


def q_walk_pairs(spark, sf_dir):
    """Skip-gram (center, context) pair frequencies from the deterministic
    random walks — the node2vec training-pair stage; oracle re-derives the
    walks via unrolled arg_min CTEs and self-joins on step distance."""
    from ontoweaver_spark.graphstats import random_walks, walk_skipgram_pairs

    _tune(spark)
    walks = random_walks(
        _doc_graph(spark, sf_dir), walk_length=3, walks_per_node=1, seed=0
    )
    return walk_skipgram_pairs(walks, window=2)


def q_filter_audit(spark, sf_dir):
    """Attribute-then-filter with an audit bitmask (never drop a doc
    without recording which rule fired): five exact-rational rules in one
    zero-shuffle projection."""
    from ontoweaver_spark.textops import filter_audit

    _tune(spark)
    return filter_audit(_docs(spark, sf_dir), min_tokens=5, max_tokens=5000)


def q_er_pairs(spark, sf_dir):
    """Sorted-neighborhood ER blocking + levenshtein verify over synthetic
    entity mentions (two per doc; every third doc's second mention carries
    a corp->crop typo). Number-adjacent names ('entity 100/101 corp')
    legitimately pair at distance 1 too — the oracle mirrors exactly."""
    from ontoweaver_spark.linking import er_candidates

    _tune(spark)
    docs = _docs(spark, sf_dir)
    base = F.concat(
        F.lit("entity "), (F.col("doc_id") % 500).cast("string"), F.lit(" corp")
    )
    m1 = docs.select(
        (F.col("doc_id") * 2).alias("entity_id"), base.alias("name")
    )
    m2 = docs.select(
        (F.col("doc_id") * 2 + 1).alias("entity_id"),
        F.when(F.col("doc_id") % 3 == 0, F.replace(base, F.lit("corp"), F.lit("crop")))
        .otherwise(base).alias("name"),
    )
    return er_candidates(m1.unionByName(m2), window=3, max_distance=2)


def q_containment(spark, sf_dir):
    """Asymmetric containment near-dup pairs (quote/subset detection):
    |Sa∩Sb|/|Sa| per LSH candidate pair — the short-doc-inside-long-doc
    case symmetric Jaccard misses."""
    from ontoweaver_spark.dedup import containment_duplicates

    _tune(spark)
    return containment_duplicates(_docs_spread(spark, sf_dir), threshold=0.8)


def q_event_windows(spark, sf_dir):
    """Tumbling-window rollup via the NATIVE F.window operator (the batch
    twin of the streaming crawl-rate aggregation): per (hour, event_type)
    exact-integer stats. Epoch-aligned hours make DuckDB's date_trunc the
    same bucketing."""
    _tune(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = F.window(F.col("ts").cast("timestamp"), "1 hour")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias("window_end_us"),
            "event_type", "n", "first_event", "last_event",
        )
    )


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix through Spark's PIVOT surface: declared
    lang x predicted lang counts as one grouping pass (zh has no marker
    table, so its row concentrates in 'und' — the interesting cell)."""
    from ontoweaver_spark.textops import lang_id

    _tune(spark)
    preds = ["de", "en", "es", "fr", "und"]
    return (
        _docs(spark, sf_dir)
        .select("lang", lang_id(F.col("text")).alias("pred"))
        .groupBy("lang")
        .pivot("pred", preds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, preds)
    )


def q_cms_topk(spark, sf_dir):
    """Count-min-sketch token-frequency estimates for the exact top-25
    tokens: the sketch is d*w rows of FIXED state no matter the corpus
    size; estimates (min over d hash rows) upper-bound the exact counts.
    Deterministic md5 hash rows make the sketch itself oracle-exact."""
    from ontoweaver_spark.textops import cms_estimate, cms_sketch, tokens

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    sk = cms_sketch(docs, d=4, w=1024)
    exact = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("token"))
        .limit(25)
    )
    return cms_estimate(sk, exact, d=4, w=1024)


def q_group_sample(spark, sf_dir):
    """Exactly-100-docs-per-language sample (md5-priority winners) — the
    per-stratum budget stage rate-based sampling can't promise."""
    from ontoweaver_spark.sampling import per_group_sample

    _tune(spark)
    return per_group_sample(
        _docs(spark, sf_dir), "lang", k=100, key_col="doc_id", seed=5
    ).select("doc_id", "lang")


def q_kg_negatives(spark, sf_dir):
    """Deterministic corrupted-triple negative sampling over the sparse
    doc graph (KG-embedding training prep): 2 hash-picked candidates per
    true edge, anti-joined against the graph."""
    from ontoweaver_spark.graphstats import negative_triples

    _tune(spark)
    edges = _doc_graph(spark, sf_dir).distinct().withColumn("label", F.lit("rel"))
    return negative_triples(edges, m=2, seed=7)


def q_bpe_apply(spark, sf_dir):
    """Train 6 BPE merge rules on the corpus, then tokenize the corpus
    with them (distinct-word collapse, inline chained replaces) — per-doc
    exact BPE token budget."""
    from ontoweaver_spark.textops import bpe_apply, bpe_merges

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    return bpe_apply(docs, bpe_merges(docs, k_merges=6))


def q_para_dedup(spark, sf_dir):
    """Corpus-wide paragraph-level exact dedup (the CCNet/RefinedWeb pass):
    the corpus is paragraphized deterministically from documents — two
    repeated boilerplate paragraphs interleaved with three 8-token body
    chunks — so the DuckDB oracle rebuilds the byte-identical input; every
    distinct paragraph survives only at its first (doc_id, pos)."""
    from ontoweaver_spark.dedup import paragraph_dedup

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")

    def chunk(i):
        return F.array_join(F.slice(toks, i, 8), " ")

    def boiler(k):
        return F.concat(
            F.lit("subscribe to our newsletter edition "),
            ((F.col("doc_id") + k) % 7).cast("string"),
        )

    synth = docs.select(
        "doc_id",
        F.concat_ws(
            "\n", chunk(1), boiler(0), chunk(9), boiler(1), chunk(17)
        ).alias("text"),
    )
    return paragraph_dedup(synth, "text", "doc_id", sep="\n")


def q_dup_ngrams(spark, sf_dir):
    """Per-document duplicated 5-gram fraction (the Gopher/Dolma repetition
    quality signal) straight over the documents corpus."""
    from ontoweaver_spark.textops import duplicated_ngram_fraction

    _tune(spark)
    return duplicated_ngram_fraction(_docs_spread(spark, sf_dir), n=5)


def q_scd2(spark, sf_dir):
    """Temporal-KG materialization: three deterministic recrawl snapshots
    per url (the page's value flips from 'a' to 'b' at snapshot doc_id%4)
    collapse to SCD2 validity intervals — one shuffle on the url."""
    from ontoweaver_spark.sessions import validity_intervals

    _tune(spark)
    docs = _docs(spark, sf_dir)
    snaps = docs.select(
        "doc_id",
        "source",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
    ).select(
        F.concat(
            F.lit("https://crawl."), F.col("source"), F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("k").cast("long").alias("ts"),
        F.when(F.col("k") < F.col("doc_id") % 4, F.lit("a"))
        .otherwise(F.lit("b")).alias("value"),
    )
    return validity_intervals(snaps, key_col="url", ts_col="ts", value_col="value")


def q_claim_vote(spark, sf_dir):
    """Majority-vote truth finding over conflicting extracted claims:
    ~1000 entities each asserted by ~every 1000th document's (lang, source)
    pair; the winner per (subj, pred) is max-support with deterministic
    lexicographic tie-break."""
    from ontoweaver_spark.linking import resolve_claims

    _tune(spark)
    docs = _docs(spark, sf_dir)
    ent = F.concat(F.lit("e"), (F.col("doc_id") % 1000).cast("string")).alias("subj")
    claims = docs.select(ent, F.lit("lang").alias("pred"), F.col("lang").alias("obj")).unionByName(
        docs.select(ent, F.lit("source").alias("pred"), F.col("source").alias("obj"))
    )
    return resolve_claims(claims)


def q_redirects(spark, sf_dir):
    """Redirect-chain resolution by pointer doubling: chain edges
    u_i -> u_{i-1} (broken every 10th id, so chains run 1..9 hops) plus
    alias trees a_i -> u_i for every 3rd id. The oracle never iterates —
    it derives final target and hop count ARITHMETICALLY from doc_id
    (final = u_{i - i%10}, hops = i%10 [+1 via an alias]), an independent
    closed-form check of the O(log L)-round join loop."""
    from ontoweaver_spark.urls import resolve_redirects

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    s = i.cast("string")
    chain = docs.where(i % 10 != 0).select(
        F.concat(F.lit("u"), s).alias("src"),
        F.concat(F.lit("u"), (i - 1).cast("string")).alias("dst"),
    )
    alias = docs.where(i % 3 == 0).select(
        F.concat(F.lit("a"), s).alias("src"),
        F.concat(F.lit("u"), s).alias("dst"),
    )
    return resolve_redirects(chain.unionByName(alias))


def q_anchor_profile(spark, sf_dir):
    """Per-link-target inlink profile (anchor-text aggregation) over the
    derived pages table: inlink count, exact distinct source hosts, and
    the top context keyword with a (count desc, ctx asc) total-order
    tie-break. Spark extracts the links by regexp from the page TEXT; the
    oracle re-derives them arithmetically from doc_id — an independent
    derivation that never runs a regex."""
    from ontoweaver_spark.pages import pages_from_documents
    from ontoweaver_spark.urls import link_context_profile

    _tune(spark)
    pages = pages_from_documents(_docs(spark, sf_dir))
    return link_context_profile(pages, link_pattern=r"(https?://[^\s.,]+)")


PHRASE = "hash join"


def q_phrase_search(spark, sf_dir):
    """Exact 2-word phrase matching via positional-index anchor joins —
    the retrieval-side counterpart of inv_index. The oracle rebuilds
    positions with generate_subscripts and intersects them in SQL."""
    from ontoweaver_spark.textops import phrase_search

    _tune(spark)
    return phrase_search(_docs_spread(spark, sf_dir), PHRASE)


def q_graph_cycles(spark, sf_dir):
    """Directed-cycle detection (KG DAG hygiene): ring groups of size
    3..9 (group g = doc_id//12, ring size 3+(g%7)) plus tail edges that
    point INTO rings but are not on any cycle. Only complete groups
    participate (cap = floor(n/12)*12, computed as data in both engines).
    The oracle is closed-form: node i is on a cycle iff i%12 < ring size,
    with min_cycle_len = the ring size — it never traverses the graph."""
    from ontoweaver_spark.graphstats import cycle_nodes

    _tune(spark)
    docs = _docs(spark, sf_dir)
    cap = docs.agg((F.floor(F.count("*") / 12) * 12).alias("cap"))
    d = docs.crossJoin(F.broadcast(cap)).where(F.col("doc_id") < F.col("cap"))
    i = F.col("doc_id")
    g = F.floor(i / 12)
    j = i % 12
    size = F.lit(3) + (g % 7)
    node = F.concat(F.lit("n"), i.cast("string"))
    ring_dst = F.concat(F.lit("n"), (g * 12 + (j + 1) % size).cast("string"))
    tail_dst = F.concat(F.lit("n"), (g * 12 + i % size).cast("string"))
    edges = d.select(
        node.alias("src"),
        F.when(j < size, ring_dst).otherwise(tail_dst).alias("dst"),
    )
    return cycle_nodes(edges)


def q_robots(spark, sf_dir):
    """Robots-style URL policy over the derived pages table: per-host
    rules (disallow '/p<digit>', a longer allow '/p<digit>2' carve-out,
    and a disallow-everything '/' for every 7th host) — longest matching
    prefix wins, equal-length ties to allow. The oracle evaluates the
    same rule table independently with a SQL window."""
    from ontoweaver_spark.pages import pages_from_documents
    from ontoweaver_spark.urls import robots_filter

    _tune(spark)
    docs = _docs(spark, sf_dir)
    pages = pages_from_documents(docs)
    srcs = docs.select("source").distinct()
    k = F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("long")
    host = F.concat(F.col("source"), F.lit(".example"))
    dis = srcs.select(
        host.alias("host"),
        F.concat(F.lit("/p"), (k % 10).cast("string")).alias("prefix"),
        F.lit(False).alias("allow"),
    )
    alw = srcs.select(
        host.alias("host"),
        F.concat(F.lit("/p"), (k % 10).cast("string"), F.lit("2")).alias("prefix"),
        F.lit(True).alias("allow"),
    )
    blanket = srcs.where(k % 7 == 0).select(
        host.alias("host"), F.lit("/").alias("prefix"), F.lit(False).alias("allow")
    )
    return robots_filter(pages, dis.unionByName(alw).unionByName(blanket))


def q_crawl_budget(spark, sf_dir):
    """Largest-remainder apportionment of a 997-slot crawl budget across
    sources proportional to page counts — quotas sum to the budget
    EXACTLY (997 is prime, so remainders are almost always nonzero and
    the +1 distribution is exercised)."""
    from ontoweaver_spark.sampling import apportion_budget

    _tune(spark)
    hosts = _docs(spark, sf_dir).groupBy("source").agg(
        F.count("*").alias("n_pages")
    )
    return apportion_budget(hosts, "source", "n_pages", budget=997)


def q_host_sim(spark, sf_dir):
    """Host-profile Jaccard: sources as keys, their distinct word
    BIGRAMS as item sets (single tokens are all corpus-wide stopwords
    here), bigrams present in more than 15 of the ~20 sources dropped
    (the stop-item cap — 428 of 916 bigrams at sf0.01, so the cap does
    real work); exact set counts, one portable division, pairs kept at
    jaccard >= 0.5."""
    from ontoweaver_spark.dedup import shingles
    from ontoweaver_spark.similarity import profile_jaccard

    _tune(spark)
    grams = _docs_spread(spark, sf_dir).select(
        "source", F.explode(shingles(F.lower(F.col("text")), k=2)).alias("bigram")
    )
    return profile_jaccard(
        grams, "source", "bigram", max_item_df=15, min_jaccard=0.5
    )


def q_kg_transe(spark, sf_dir):
    """TransE link-prediction eval with integer hash embeddings: triples
    (e_{i%50}, r_{i%3}, e_{(i*7)%50}) ranked against ALL 50 entity
    corruptions — exact L1 scores and ranks, engine-portable."""
    from ontoweaver_spark.similarity import hash_transe_rank

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    triples = docs.select(
        F.concat(F.lit("e"), (i % 50).cast("string")).alias("head"),
        F.concat(F.lit("r"), (i % 3).cast("string")).alias("rel"),
        F.concat(F.lit("e"), ((i * 7) % 50).cast("string")).alias("tail"),
    )
    cands = docs.where(i < 50).select(
        F.concat(F.lit("e"), i.cast("string")).alias("candidate")
    )
    return hash_transe_rank(triples, cands, dim=4, mod=1000)


def q_kg_transe_filtered(spark, sf_dir):
    """FILTERED-protocol TransE eval (Bordes NIPS'13 / FB15k convention):
    corruptions that are themselves known true triples never count
    against the evaluated tail. The tail expr mixes a `div 150` block
    term so each (head, rel) carries SEVERAL true tails — at sf0.01 the
    filtered rank is strictly below raw for 350/500 triples, so the
    protocol difference is non-vacuous."""
    from ontoweaver_spark.similarity import hash_transe_rank

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    triples = docs.select(
        F.concat(F.lit("e"), (i % 50).cast("string")).alias("head"),
        F.concat(F.lit("r"), (i % 3).cast("string")).alias("rel"),
        F.concat(
            F.lit("e"),
            ((i * 7 + F.expr("doc_id div 150")) % 50).cast("string"),
        ).alias("tail"),
    )
    cands = docs.where(i < 50).select(
        F.concat(F.lit("e"), i.cast("string")).alias("candidate")
    )
    return hash_transe_rank(triples, cands, dim=4, mod=1000, filtered=True)


def q_kg_rank_eval(spark, sf_dir):
    """MRR / Hits@k rollup (exact integer ppm) over the FILTERED TransE
    ranking — the one-row eval summary every link-prediction harness
    reports; double-truncating integer MRR is documented and
    engine-portable."""
    from ontoweaver_spark.similarity import hash_transe_rank, rank_metrics

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    triples = docs.select(
        F.concat(F.lit("e"), (i % 50).cast("string")).alias("head"),
        F.concat(F.lit("r"), (i % 3).cast("string")).alias("rel"),
        F.concat(
            F.lit("e"),
            ((i * 7 + F.expr("doc_id div 150")) % 50).cast("string"),
        ).alias("tail"),
    )
    cands = docs.where(i < 50).select(
        F.concat(F.lit("e"), i.cast("string")).alias("candidate")
    )
    return rank_metrics(
        hash_transe_rank(triples, cands, dim=4, mod=1000, filtered=True)
    )


def q_entity_disambig_ctx(spark, sf_dir):
    """Two-signal entity disambiguation (context overlap + prior): the
    candidate set comes from the commonness prior, the pick from exact
    BIGINT token-profile overlap with the occurrence's own text, prior
    and entity id as deterministic tie-breaks; zero-overlap occurrences
    fall back to the prior argmax."""
    from ontoweaver_spark.linking import disambiguate_by_context, entity_prior
    from ontoweaver_spark.textops import tokens

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    anchors = docs.select(
        F.concat(F.lit("m"), (i % 7).cast("string")).alias("mention"),
        F.concat(F.lit("e"), (i % 3).cast("string")).alias("entity_id"),
    )
    toks = docs.select(
        F.concat(F.lit("e"), (i % 3).cast("string")).alias("entity_id"),
        F.explode(F.array_distinct(tokens(F.lower(F.col("text"))))).alias(
            "token"
        ),
    )
    profiles = (
        toks.groupBy("entity_id", "token")
        .agg(F.count("*").alias("weight"))
        .where((F.col("weight") >= 2) & (F.col("weight") <= 6))
    )
    occ = docs.select(
        i.cast("string").alias("occ_id"),
        F.concat(F.lit("m"), (i % 7).cast("string")).alias("mention"),
        F.array_distinct(tokens(F.lower(F.col("text")))).alias("tokens"),
    )
    return disambiguate_by_context(occ, entity_prior(anchors), profiles)


def q_kg_sweep(spark, sf_dir):
    """Conductance sweep cut (the second half of Andersen-Chung-Lang
    local clustering) over the forward-push PPR vector on the hub
    co-citation graph: nodes order by score div degree, each prefix gets
    exact integer vol / cut / phi_ppm via the open-close edge
    decomposition — argmin(phi_ppm) is the seeds' local community."""
    from ontoweaver_spark.graphstats import ppr_forward_push, ppr_sweep_cut

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    edges = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    seeds = (
        docs.select(((F.col("doc_id") * 7) % 61).alias("h"))
        .where(F.col("h") % 13 == 0)
        .select(F.concat(F.lit("hub"), F.col("h").cast("string")).alias("node"))
        .distinct()
    )
    ppr = ppr_forward_push(edges, seeds, rounds=4)
    return ppr_sweep_cut(edges, ppr)


def q_truth_find(spark, sf_dir):
    """Iterative source-reliability truth finding (Sums fact-finder, 2
    exact integer rounds) over a synthetic conflicting-claims corpus:
    sources src0-5 corroborate a per-subject value, src6-9 each scatter
    their own — trust and confidence reinforce until corroborated
    values dominate regardless of raw vote counts."""
    from ontoweaver_spark.linking import truth_finder

    _tune(spark)
    i = F.col("doc_id")
    claims = _docs(spark, sf_dir).select(
        F.concat(F.lit("src"), (i % 10).cast("string")).alias("source"),
        F.concat(F.lit("s"), (i % 25).cast("string")).alias("subj"),
        F.lit("p").alias("pred"),
        F.when(
            (i % 10) < 6,
            F.concat(F.lit("v"), ((i % 25) % 3).cast("string")),
        )
        .otherwise(F.concat(F.lit("v"), ((i * 3) % 5).cast("string")))
        .alias("obj"),
    )
    return truth_finder(claims, rounds=2)


def q_entity_prior(spark, sf_dir):
    """Commonness prior p(entity | mention) as exact integer ppm over a
    synthetic anchor corpus (mention m_{i%7} -> entity e_{i%3}): the
    Milne-Witten EL prior, counts + truncating BIGINT division."""
    from ontoweaver_spark.linking import entity_prior

    _tune(spark)
    i = F.col("doc_id")
    anchors = _docs(spark, sf_dir).select(
        F.concat(F.lit("m"), (i % 7).cast("string")).alias("mention"),
        F.concat(F.lit("e"), (i % 3).cast("string")).alias("entity_id"),
    )
    return entity_prior(anchors)


def q_entity_disambig(spark, sf_dir):
    """Argmax-prior disambiguation of every mention occurrence: one
    min_by-over-struct aggregate collapses the prior table to its
    per-mention winner (ppm desc, n_links desc, entity_id asc — fully
    deterministic), then a broadcast join resolves the occurrence
    stream without shuffling it."""
    from ontoweaver_spark.linking import disambiguate_by_prior, entity_prior

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    anchors = docs.select(
        F.concat(F.lit("m"), (i % 7).cast("string")).alias("mention"),
        F.concat(F.lit("e"), (i % 3).cast("string")).alias("entity_id"),
    )
    mentions = docs.select(
        "doc_id",
        F.concat(F.lit("m"), (i % 7).cast("string")).alias("mention"),
    )
    return disambiguate_by_prior(mentions, entity_prior(anchors))


def q_kg_retract(spark, sf_dir):
    """Tombstone cascade through the fused KG: retract every 9th document
    and all zh documents — their nodes, their incident edges, and any
    object node orphaned by the cascade (zh:language loses its last edge
    and must disappear; sources keep other docs and must stay). Returns
    the full post-retraction graph state as one frame (nodes + rendered
    edges), so the oracle checks node drop, edge drop, AND the orphan
    rule in a single hash."""
    from ontoweaver_spark.fusion import retract_from_graph

    fnodes, fedges = _kg(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    tomb = docs.where((F.col("doc_id") % 9 == 0) | (F.col("lang") == "zh")).select(
        F.concat(F.col("doc_id").cast("string"), F.lit(":document")).alias("id")
    )
    n2, e2 = retract_from_graph(
        fnodes.select("id", "label"), fedges.select("src", "dst", "label"), tomb
    )
    return n2.select("id", "label", F.lit("node").alias("kind")).unionByName(
        e2.select(
            F.concat(F.col("src"), F.lit(">"), F.col("dst")).alias("id"),
            F.col("label"),
            F.lit("edge").alias("kind"),
        )
    )


def q_span_dataset(spark, sf_dir):
    """Byte-exact span-supervision rows over the derived pages table: the
    keyword answer with 0-based char offsets plus the materialized
    substring re-verification. The oracle is CLOSED-FORM — offsets from
    the n_chars column and the synthesis layout, never from instr."""
    from ontoweaver_spark.pages import pages_from_documents
    from ontoweaver_spark.textops import span_dataset

    _tune(spark)
    pages = pages_from_documents(_docs(spark, sf_dir)).withColumn(
        "doc_id",
        F.regexp_extract(F.col("url"), r"/p(\d+)$", 1).cast("long"),
    )
    return span_dataset(pages, r"keywords: (kw[a-z]+)")


def q_frontier(spark, sf_dir):
    """Politeness-aware frontier plan: a 300-slot global budget
    apportioned across ~20 hosts by candidate count, per-host top-quota
    URLs by md5 priority, 1-based politeness slots. Composes
    apportion_budget with the per-host ranking window."""
    from ontoweaver_spark.pages import pages_from_documents
    from ontoweaver_spark.textops import md5_int
    from ontoweaver_spark.urls import frontier_plan

    _tune(spark)
    pages = pages_from_documents(_docs(spark, sf_dir)).withColumn(
        "priority",
        md5_int(
            F.concat(
                F.lit("prio:"),
                F.regexp_extract(F.col("url"), r"/p(\d+)$", 1),
            )
        ),
    )
    return frontier_plan(pages, budget=300)


def q_kmv_merge(spark, sf_dir):
    """Mergeable-sketch rollup: per-(lang,source) KMV sketches merged up
    to per-lang, then finalized. The ORACLE builds the per-lang estimate
    DIRECTLY from raw tokens (the vocab_kmv derivation) — hash equality
    proves the merge is lossless, the property that makes the sketch
    usable for shard-then-rollup at corpus scale."""
    from ontoweaver_spark.textops import (
        kmv_estimate_from_sketch, kmv_merge, kmv_sketch, tokens,
    )

    _tune(spark)
    tok = _docs_spread(spark, sf_dir).select(
        F.concat_ws("|", F.col("lang"), F.col("source")).alias("ls"),
        F.col("lang"),
        F.explode(tokens(F.lower(F.col("text")))).alias("token"),
    )
    sk = kmv_sketch(tok, "ls", "token", k=16)
    by_lang = sk.select(
        F.split(F.col("ls"), r"\|").getItem(0).alias("lang"), "sketch"
    )
    return kmv_estimate_from_sketch(kmv_merge(by_lang, "lang", k=16), "lang", k=16)


def q_html_extract(spark, sf_dir):
    """HTML -> visible text over deterministically synthesized pages
    (title, style block, headline, entity-encoded body, trailing script).
    The oracle is CLOSED-FORM — it reassembles the expected text from the
    raw columns and never touches a tag or entity."""
    from ontoweaver_spark.webdoc import html_title, html_to_text

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    html = F.concat(
        F.lit("<html><head><title>"), F.upper(F.col("source")),
        F.lit("</title><style>p{margin:0}</style></head><body><h1>"),
        F.col("lang"),
        F.lit("</h1><p>x &amp; "), F.col("text"),
        F.lit("</p><script>var a=1;\nif(a<2){a++;}</script></body></html>"),
    )
    return docs.select(
        "doc_id",
        html_title(html).alias("title"),
        html_to_text(html).alias("clean_text"),
    )


def q_warc_parse(spark, sf_dir):
    """HTTP response-record parsing over synthesized WARC-style payloads:
    three statuses round-robin plus every 4th record an unparseable
    raw-text blob (NULL status, whole payload as body). Closed-form
    oracle from doc_id arithmetic."""
    from ontoweaver_spark.webdoc import parse_http_response

    _tune(spark)
    docs = _docs(spark, sf_dir)
    status = F.element_at(
        F.array(F.lit("200 OK"), F.lit("301 Moved"), F.lit("404 Not Found")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    rec = F.when(
        F.col("doc_id") % 4 == 3, F.col("text")
    ).otherwise(
        F.concat(
            F.lit("HTTP/1.1 "), status,
            F.lit("\r\nServer: t\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"),
            F.col("text"),
        )
    )
    framed = docs.select("doc_id", F.encode(rec, "utf-8").alias("html"))
    return parse_http_response(framed).select(
        "doc_id", "http_status", "content_type", "body"
    )


def q_dag_levels(spark, sf_dir):
    """Topological LONGEST-PATH layering of a DAG: 8-node chains with a
    0->4 shortcut edge per group — the shortcut makes min-depth give 4
    where the generation number is 7, so the oracle (closed-form:
    level = 7 - i%8) rejects any min-based shortcut-following
    implementation."""
    from ontoweaver_spark.ontology import hierarchy_levels

    _tune(spark)
    docs = _docs(spark, sf_dir)
    cap = docs.agg((F.floor(F.count("*") / 8) * 8).alias("cap"))
    d = docs.crossJoin(F.broadcast(cap)).where(F.col("doc_id") < F.col("cap"))
    i = F.col("doc_id")
    node = F.concat(F.lit("n"), i.cast("string"))
    chain = d.where(i % 8 < 7).select(
        node.alias("child"),
        F.concat(F.lit("n"), (i + 1).cast("string")).alias("parent"),
    )
    shortcut = d.where(i % 8 == 0).select(
        node.alias("child"),
        F.concat(F.lit("n"), (i + 4).cast("string")).alias("parent"),
    )
    return hierarchy_levels(chain.unionByName(shortcut))


def q_kg_profile(spark, sf_dir):
    """Schema/health report of the fused KG (label counts, property fill,
    edge fan-out, hub degrees) in long format. The oracle derives every
    metric closed-form from the documents table and the known mapping —
    it never builds the graph."""
    from ontoweaver_spark.graphstats import profile_graph

    fnodes, fedges = _kg(spark, sf_dir)
    return profile_graph(
        fnodes.select("id", "label", "properties"),
        fedges.select("src", "dst", "label"),
    )


def q_kg_rpq(spark, sf_dir):
    """Bounded regular-path queries over a synthesized typed graph:
    the label SEQUENCE cites/about (2 hops) and the Kleene range
    cites{1,3}, union-tagged by mode. The oracle unrolls the same
    semantics as plain SQL joins with per-level DISTINCT."""
    from ontoweaver_spark.graphquery import path_query

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    d = F.concat(F.lit("d"), i.cast("string"))
    cites = docs.select(
        d.alias("src"), F.lit("cites").alias("label"),
        F.concat(F.lit("d"), ((i * 13) % 250).cast("string")).alias("dst"),
    )
    about = docs.select(
        d.alias("src"), F.lit("about").alias("label"),
        F.concat(F.lit("t"), (i % 7).cast("string")).alias("dst"),
    )
    edges = cites.unionByName(about)
    seq = path_query(edges, ["cites", "about"]).withColumn("mode", F.lit("seq"))
    kleene = path_query(edges, [{"cites"}], min_len=1, max_len=3).withColumn(
        "mode", F.lit("kleene")
    )
    return seq.unionByName(kleene)


def q_scd2_snapshot(spark, sf_dir):
    """Point-in-time view of the SCD2 intervals at ts=1 (the middle
    snapshot): exactly one row per url, interval fields intact. The
    oracle is CLOSED-FORM per doc_id%4 case — it never builds runs."""
    from ontoweaver_spark.sessions import snapshot_at, validity_intervals

    _tune(spark)
    docs = _docs(spark, sf_dir)
    snaps = docs.select(
        "doc_id", "source",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
    ).select(
        F.concat(
            F.lit("https://crawl."), F.col("source"), F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("k").cast("long").alias("ts"),
        F.when(F.col("k") < F.col("doc_id") % 4, F.lit("a"))
        .otherwise(F.lit("b")).alias("value"),
    )
    return snapshot_at(validity_intervals(snaps, key_col="url", ts_col="ts"), 1)


def q_onto_validate(spark, sf_dir):
    """Ontology domain/range conformance over a synthesized typed edge
    list: node types cycle through a 5-class hierarchy, edges mix a valid
    label pair with an unknown label and ghost endpoints. The oracle
    re-derives every violation closed-form from doc_id arithmetic with
    the closure unrolled inline."""
    from ontoweaver_spark.ontology import subclass_closure, validate_edge_types

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    types = F.element_at(
        F.array(F.lit("person"), F.lit("scientist"), F.lit("org"),
                F.lit("city"), F.lit("agent")),
        (i % 5 + 1).cast("int"),
    )
    nodes = docs.select(
        F.concat(F.lit("n"), i.cast("string")).alias("id"),
        types.alias("label"),
    )
    edges = docs.select(
        F.concat(F.lit("n"), i.cast("string")).alias("src"),
        F.when(
            i % 17 == 0, F.concat(F.lit("ghost"), i.cast("string"))
        ).otherwise(
            F.concat(F.lit("n"), ((i * 7 + 2) % 250).cast("string"))
        ).alias("dst"),
        F.when(i % 10 == 0, F.lit("likes"))
        .when(i % 2 == 0, F.lit("works_at"))
        .otherwise(F.lit("located_in")).alias("label"),
    )
    hier = spark.createDataFrame(
        [("scientist", "person"), ("person", "agent"), ("org", "agent"),
         ("city", "place")],
        "child string, parent string",
    )
    cons = spark.createDataFrame(
        [("works_at", "person", "org"), ("located_in", "org", "place")],
        "edge_label string, domain string, range string",
    )
    return validate_edge_types(edges, nodes, cons, subclass_closure(hier))


def q_sitemap_parse(spark, sf_dir):
    """Sitemap-protocol parsing over synthesized XML: every 10th doc is a
    sitemapindex (one child sitemap), the rest are urlsets with two
    entries — the first fully attributed, the second loc-only. The
    oracle derives the exploded rows CLOSED-FORM from doc_id arithmetic,
    never parsing XML."""
    from ontoweaver_spark.webdoc import parse_sitemap

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    base = F.concat(F.lit("https://crawl."), F.col("source"), F.lit(".com"))
    day = F.lpad((i % 28 + 1).cast("string"), 2, "0")
    urlset = F.concat(
        F.lit('<?xml version="1.0"?>\n<urlset>\n  <url>\n    <loc> '),
        base, F.lit("/p/"), i.cast("string"),
        F.lit(" </loc>\n    <lastmod>2026-01-"), day,
        F.lit("</lastmod>\n"),
        F.when(i % 3 == 0, F.lit("    <changefreq>daily</changefreq>\n"))
        .otherwise(F.lit("")),
        F.lit("    <priority>0."), (i % 10).cast("string"),
        F.lit("</priority>\n  </url>\n  <url><loc>"),
        base, F.lit("/p/"), i.cast("string"),
        F.lit("x</loc></url>\n</urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>"), base,
        F.lit("/sitemap"), i.cast("string"),
        F.lit(".xml</loc><lastmod>2026-02-01</lastmod></sitemap>"
              "</sitemapindex>"),
    )
    frame = docs.select(
        F.concat(base, F.lit("/sitemap.xml?d="), i.cast("string")).alias("url"),
        F.when(i % 10 == 0, index).otherwise(urlset).alias("xml"),
    )
    return parse_sitemap(frame)


def q_kg_scc(spark, sf_dir):
    """Strongly connected components of a synthesized directed graph:
    the functional map r -> (13r+7) mod 250 (a rho-shaped orbit whose
    cycles are the multi-node SCCs) plus five reverse edges that weld
    extra 2-cycles on. The oracle computes mutual reachability with a
    recursive CTE and takes the same string-min labels."""
    from ontoweaver_spark.graphstats import strongly_connected_components

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 250

    def d(c):
        return F.concat(F.lit("d"), c.cast("string"))

    fwd = docs.select(d(r).alias("src"), d((r * 13 + 7) % 250).alias("dst"))
    back = docs.where(r % 50 == 0).select(
        d((r * 13 + 7) % 250).alias("src"), d(r).alias("dst")
    )
    return strongly_connected_components(fwd.unionByName(back))


def q_dedup_winnow(spark, sf_dir):
    """Winnowing fingerprint clone pairs (Schleimer SIGMOD'03 / MOSS):
    k=5 word-gram md5 hashes, w=4 selection windows (rightmost-min),
    document-frequency cap 64, pairs sharing >= 2 selected fingerprints.
    The oracle replays the identical window min-of-struct selection in
    DuckDB."""
    from ontoweaver_spark.dedup import winnow_pairs

    _tune(spark)
    return winnow_pairs(
        _docs_spread(spark, sf_dir), k=5, w=4, min_shared=2, max_df=64
    )


def q_dup_spans(spark, sf_dir):
    """Cross-doc verbatim 5-gram spans over the documents corpus (the
    substring-dedup masking signal). Oracle replays the identical window
    hash + distinct-doc threshold + gaps-and-islands merge in SQL."""
    from ontoweaver_spark.dedup import duplicated_ngram_spans

    _tune(spark)
    return duplicated_ngram_spans(_docs_spread(spark, sf_dir), n=5, min_docs=2)


def q_bloom_frontier(spark, sf_dir):
    """Bloom-filter frontier dedup: build the filter over the already-
    crawled half of the corpus (even doc_ids), probe a candidate mix of
    seen (/p/) and novel (/q/) URLs. Membership is deterministic given
    the md5 double-hash family, so the oracle reproduces every hit —
    INCLUDING the false positives — bit-for-bit."""
    from ontoweaver_spark.urls import bloom_build, bloom_probe

    _tune(spark)
    docs = _docs(spark, sf_dir)
    base = F.concat(F.lit("https://crawl."), F.col("source"), F.lit(".com"))
    did = F.col("doc_id").cast("string")
    members = docs.where(F.col("doc_id") % 2 == 0).select(
        F.concat(base, F.lit("/p/"), did).alias("url")
    )
    cands = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select(
            F.concat(base, F.lit("/p/"), did).alias("url"),
            (F.col("doc_id") % 2 == 0).alias("is_member"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 3 == 1).select(
                F.concat(base, F.lit("/q/"), did).alias("url"),
                F.lit(False).alias("is_member"),
            )
        )
    )
    bloom = bloom_build(members, m_bits=1 << 17, k=3)
    probed = bloom_probe(bloom, cands, m_bits=1 << 17, k=3)
    return probed.join(cands, "url").select("url", "bloom_hit", "is_member")


def q_kg_typeinfer(spark, sf_dir):
    """Seeded neighbor-vote entity typing over a synthetic residue graph
    (two functional maps per node), seeds on every 4th residue, two
    propagation rounds. Oracle unrolls the identical vote (distinct
    neighbors, majority, min-type tie-break) as MATERIALIZED CTEs."""
    from ontoweaver_spark.linking import infer_types

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 400

    def d(c):
        return F.concat(F.lit("d"), c.cast("string"))

    edges = docs.select(d(r).alias("src"), d((r * 7 + 3) % 400).alias("dst")).unionByName(
        docs.select(d(r).alias("src"), d((r * 11 + 5) % 400).alias("dst"))
    )
    seeds = (
        docs.where(r % 4 == 0)
        .select(d(r).alias("node"), F.concat(F.lit("T"), (r % 5).cast("string")).alias("type"))
        .distinct()
    )
    return infer_types(edges, seeds, rounds=2)


def q_kg_dangling(spark, sf_dir):
    """Dangling-endpoint repair: a residue graph where every 7-residue
    node is absent from the node table and its edges point at synthetic
    missing ids — the placeholders (id, 'unresolved', n_refs) are the
    repair output. Oracle: explode endpoints, count, anti-join."""
    from ontoweaver_spark.validate import repair_dangling_edges

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 500

    def d(c):
        return F.concat(F.lit("d"), c.cast("string"))

    nodes = (
        docs.where(r % 10 != 7)
        .select(d(r).alias("id"), F.lit("entity").alias("label"))
        .distinct()
    )
    edges = docs.select(
        d(r).alias("src"),
        F.when(r % 10 == 7, F.concat(F.lit("m"), (r % 37).cast("string")))
        .otherwise(d((r * 3) % 500))
        .alias("dst"),
    )
    _, placeholders = repair_dangling_edges(nodes, edges)
    return placeholders


def q_edge_partition(spark, sf_dir):
    """Skew-aware edge placement over a deliberately skewed residue graph
    (every 5th residue collapses onto one hub source): hub edges are
    vertex-cut by (h(src)+h(dst)) % P, normal edges grouped by h(src) % P.
    Oracle replays the identical md5 arithmetic and load aggregate."""
    from ontoweaver_spark.graphstats import edge_partition_plan

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 500
    src = F.when(r % 5 == 0, F.lit("hub0")).otherwise(
        F.concat(F.lit("d"), r.cast("string"))
    )
    dst = F.concat(F.lit("d"), ((r * 3 + 1) % 500).cast("string"))
    edges = docs.select(src.alias("src"), dst.alias("dst"))
    return edge_partition_plan(edges, num_partitions=16, hub_threshold=50)


def q_openie_triples(spark, sf_dir):
    """Pattern-based relation extraction from synthesized prose (two
    'works at' mentions + one 'is based in' per doc). Both engines run
    the byte-identical lookaround-free regex; oracle zips the two
    regexp_extract_all group arrays and unnests."""
    from ontoweaver_spark.pages import pattern_triples

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id")
    text = F.concat(
        F.lit("Alice"), (r % 400).cast("string"),
        F.lit(" works at Org"), (r % 7).cast("string"),
        F.lit(". Carol"), (r % 400).cast("string"),
        F.lit(" works at Org"), ((r + 3) % 7).cast("string"),
        F.lit(". Org"), (r % 7).cast("string"),
        F.lit(" is based in City"), (r % 13).cast("string"), F.lit("."),
    )
    d = docs.select(
        F.concat(F.lit("u"), r.cast("string")).alias("url"), text.alias("text")
    )
    return pattern_triples(
        d,
        [
            ("works_at", "([A-Z][a-zA-Z0-9]+) works at ([A-Z][a-zA-Z0-9]+)"),
            ("based_in", "([A-Z][a-zA-Z0-9]+) is based in ([A-Z][a-zA-Z0-9]+)"),
        ],
    )


def q_kg_sameas(spark, sf_dir):
    """owl:sameAs canonicalization: every 20th residue is declared
    equivalent to residue+100, chaining into 20 five-member classes;
    edges are rewritten to class-minimum ids (STRING min, as the
    implementation's min-label CC does) and deduplicated. Oracle:
    recursive-CTE closure + the same string-least labeling + remap."""
    from ontoweaver_spark.fusion import sameas_canonicalize

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 500

    def d(c):
        return F.concat(F.lit("d"), c.cast("string"))

    nodes = docs.select(d(r).alias("id"), F.lit("entity").alias("label")).distinct()
    edges = docs.select(
        d(r).alias("src"), d((r * 3 + 1) % 500).alias("dst"), F.lit("rel").alias("label")
    )
    sameas = (
        docs.where(r % 20 == 0)
        .select(d(r).alias("a"), d((r + 100) % 500).alias("b"))
        .distinct()
    )
    _, edges2, _ = sameas_canonicalize(nodes, edges, sameas)
    return edges2


def q_schema_graph(spark, sf_dir):
    """Observed schema quotient of a typed residue graph (4 node labels x
    3 edge labels): label-level triple counts + distinct endpoint counts.
    Oracle: two joins against the label projection + one aggregate."""
    from ontoweaver_spark.graphstats import schema_graph

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 500

    def d(c):
        return F.concat(F.lit("d"), c.cast("string"))

    nodes = docs.select(
        d(r).alias("id"), F.concat(F.lit("L"), (r % 4).cast("string")).alias("label")
    ).distinct()
    edges = docs.select(
        d(r).alias("src"),
        d((r * 3 + 1) % 500).alias("dst"),
        F.concat(F.lit("rel"), (r % 3).cast("string")).alias("label"),
    )
    return schema_graph(nodes, edges)


def q_kg_closeness(spark, sf_dir):
    """Landmark harmonic centrality over the sparse doc graph: per-landmark
    BFS distances (4 exact rounds, zero driver syncs) rolled up to
    sum(scale DIV dist) per node — the Eppstein-Wang estimator with exact
    BIGINT arithmetic so an iterative centrality hash-matches a DuckDB
    oracle that unrolls the same per-landmark relaxations as CTEs."""
    from ontoweaver_spark.graphstats import harmonic_closeness

    _tune(spark)
    landmarks = _docs(spark, sf_dir).where(F.col("doc_id") % 97 == 0).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("node")
    )
    return harmonic_closeness(
        _doc_graph(spark, sf_dir), landmarks, rounds=4, scale=10**6
    )


def q_er_blocking(spark, sf_dir):
    """Token blocking + CBS meta-blocking over synthetic entity mentions:
    ultra-common tokens ('entity', 'corp') are purged by the block-size
    guard, number tokens and the rarer 'inc' survive as blocks, and pairs
    are CNP-pruned to each endpoint's top-3 by common-block count. The
    word-reordering-robust complement of er_pairs' sorted neighborhood."""
    from ontoweaver_spark.linking import token_blocking_candidates

    _tune(spark)
    docs = _docs(spark, sf_dir)
    num = (F.col("doc_id") % 100).cast("string")
    m1 = docs.select(
        (F.col("doc_id") * 2).alias("id"),
        F.concat(F.lit("entity "), num, F.lit(" corp")).alias("name"),
    )
    m2 = docs.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("entity "), num, F.lit(" inc corp")),
        ).otherwise(F.concat(F.lit("entity "), num, F.lit(" corp"))).alias("name"),
    )
    return token_blocking_candidates(
        m1.unionByName(m2), max_block_size=100, top_k=3
    )


def q_cc_incremental(spark, sf_dir):
    """Incremental connected components: CC labels computed on the
    even-doc pair batch are folded together with the odd-doc batch via
    merge_components (star edges + new pairs — history edges never
    re-read). Oracle: recursive-CTE closure over the FULL pair union with
    the same least labeling — asserting incremental == from-scratch."""
    from ontoweaver_spark.dedup import connected_components, merge_components

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 500

    def v(c):
        return F.concat(F.lit("v"), c.cast("string"))

    hist = docs.where(F.col("doc_id") % 2 == 0).select(
        v(r).alias("a"), v((r * 7 + 3) % 500).alias("b")
    ).distinct()
    new = docs.where(F.col("doc_id") % 2 == 1).select(
        v(r).alias("a"), v((r * 13 + 5) % 500).alias("b")
    ).distinct()
    labels = connected_components(hist)
    return merge_components(labels, new)


def q_kg_louvain(spark, sf_dir):
    """Deterministic Louvain move phase (2 synchronous monotone-descent
    rounds, exact BIGINT gain arithmetic) over the weighted residue graph
    — parallel doc rows aggregate to edge weights, so sf scales weight
    not vertex count. Oracle: the same rounds unrolled as CTEs with a
    row_number argmin (an independent engine running the identical
    integer recurrence)."""
    from ontoweaver_spark.graphstats import louvain_move

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 500

    def d(c):
        return F.concat(F.lit("d"), c.cast("string"))

    edges = docs.select(d(r).alias("src"), d((r * 3 + 1) % 500).alias("dst"))
    return louvain_move(edges, rounds=2)


def q_kg_clustering(spark, sf_dir):
    """Per-node local clustering coefficient over the hub co-citation
    graph (same derived graph as kg_triangles): exact scaled-integer
    2T*scale DIV d(d-1) so the FP-looking metric hash-matches the
    oracle's re-derivation from its own triangle CTE."""
    from ontoweaver_spark.graphstats import clustering_coefficient

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return clustering_coefficient(cocite)


def q_kg_assortativity(spark, sf_dir):
    """Newman degree assortativity of the hub co-citation graph: exact
    BIGINT sums (S1, S2, S3) with ONE final integer division — the web
    graph sanity number (r < 0 = hubs link to leaves)."""
    from ontoweaver_spark.graphstats import degree_assortativity

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return degree_assortativity(cocite)


def q_kg_pagerank_w(spark, sf_dir):
    """WEIGHTED PageRank (anchor-count mass routing) over the sparse doc
    graph with md5-derived integer edge weights; parallel rows collapse
    to summed weight, contribution = rank*w DIV out_weight — all BIGINT,
    so 3 damped power iterations hash-match the unrolled oracle."""
    from ontoweaver_spark.graphstats import pagerank_fixed_point
    from ontoweaver_spark.textops import md5_int

    _tune(spark)
    weighted = _doc_graph(spark, sf_dir).select(
        "src", "dst",
        (1 + md5_int(F.concat(F.lit("w:"), F.col("src"), F.lit(">"), F.col("dst"))) % 9)
        .alias("w"),
    )
    return pagerank_fixed_point(weighted, iterations=3, weight_col="w")


def q_kg_ktruss(spark, sf_dir):
    """k=4 truss, 2 exact peel rounds (zero driver syncs) over the hub
    co-citation graph: every surviving edge certified by >= 2 shared
    neighbors mid-cascade — the dense-backbone signal one notch stricter
    than k-core. Oracle: the same two support/filter rounds unrolled with
    id-ordered triangle enumeration (support counts are enumeration-order
    independent, so the degree-ordered Spark wedges match)."""
    from ontoweaver_spark.graphstats import k_truss

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return k_truss(cocite, k=4, exact_rounds=2)


def q_domain_extract(spark, sf_dir):
    """Registrable-domain (eTLD+1) extraction over deterministic
    synthetic hosts exercising the PSL longest-match algorithm:
    multi-label ccTLD suffixes (co.uk), platform suffixes (github.io),
    host-IS-a-suffix NULLs, and the implicit * fallback. The suffix
    dimension is a config-sized broadcast; matching runs once per
    distinct host. Oracle replays the identical longest-match against
    the same vendored list."""
    from ontoweaver_spark.urls import with_registrable_domain

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    sfx = (
        F.when(i % 6 == 0, "com")
        .when(i % 6 == 1, "co.uk")
        .when(i % 6 == 2, "github.io")
        .when(i % 6 == 3, "com.au")
        .when(i % 6 == 4, "org")
        .otherwise("unknowntld")
    )
    host = (
        F.when(i % 3 == 0, F.concat(F.lit("s"), (i % 50).cast("string"), F.lit("."), sfx))
        .when(
            i % 3 == 1,
            F.concat(
                F.lit("w"), (i % 7).cast("string"), F.lit(".s"),
                (i % 50).cast("string"), F.lit("."), sfx,
            ),
        )
        .otherwise(sfx)
    )
    return with_registrable_domain(
        docs.select("doc_id", host.alias("host")), "host"
    ).select("doc_id", "host", "domain", "public_suffix")


def q_kg_percolation(spark, sf_dir):
    """Bootstrap percolation (threshold 2, 3 exact synchronous rounds)
    from the hub%13 seed set over the undirected hub graph: each round
    activates every node with >= 2 active neighbors — the
    corroboration-cascade robustness audit (how far would a corrupted
    merge spread if k-neighbor corroboration propagated it). Monotone,
    order-free, exact integer counts. Oracle: 3 rounds unrolled."""
    from ontoweaver_spark.graphstats import bootstrap_percolation

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    edges = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    seeds = (
        docs.select(((F.col("doc_id") * 7) % 61).alias("h"))
        .where(F.col("h") % 13 == 0)
        .select(F.concat(F.lit("hub"), F.col("h").cast("string")).alias("node"))
        .distinct()
    )
    return bootstrap_percolation(edges, seeds, threshold=2, rounds=3)


def q_kg_4cliques(spark, sf_dir):
    """Per-node 4-clique participation over the hub co-citation graph:
    canonical a<b<c<d listing (id-ordered triangle CTE extended by the
    c-anchored edge + two semi-join certificates) — the densest small
    motif, closing the census next to triangles/squares/butterflies.
    Oracle enumerates the identical canonical quads."""
    from ontoweaver_spark.graphstats import four_clique_counts

    _tune(spark)
    docs = _docs(spark, sf_dir)
    cocite = docs.select(
        ((F.col("doc_id") * 7) % 61).alias("src"),
        ((F.col("doc_id") * 11) % 53).alias("dst"),
    )
    return four_clique_counts(cocite)


def q_kg_salsa(spark, sf_dir):
    """SALSA authority/hub (2 integer alternating walk rounds) over the
    directed hub co-citation graph — the TKC-robust third link-analysis
    family next to kg_pagerank and kg_hits: every step divides mass by
    an exact integer degree (h DIV outdeg, a DIV indeg), so no
    renormalization and bit-identical hashes. Oracle: the same 2 rounds
    unrolled."""
    from ontoweaver_spark.graphstats import salsa_scores

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    edges = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return salsa_scores(edges, iterations=2)


def q_kg_ppr_push(spark, sf_dir):
    """Forward-push personalized PageRank (Andersen-Chung-Lang), 4
    round-synchronous integer pushes from 5 seed hubs over the directed
    hub co-citation graph: state only where seed mass has reached —
    the LOCAL ppr formulation whose per-round work is frontier-sized,
    not graph-sized. est += alpha*res DIV 100, outflow splits DIV
    out-degree, inflows become next residuals; all BIGINT. Oracle:
    the same 4 rounds unrolled with FULL OUTER merges."""
    from ontoweaver_spark.graphstats import ppr_forward_push

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    edges = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    seeds = (
        docs.select(((F.col("doc_id") * 7) % 61).alias("h"))
        .where(F.col("h") % 13 == 0)
        .select(F.concat(F.lit("hub"), F.col("h").cast("string")).alias("node"))
        .distinct()
    )
    return ppr_forward_push(edges, seeds, rounds=4)


def q_kg_eigen(spark, sf_dir):
    """Eigenvector centrality (3 integer power iterations, overflow-safe
    renormalization iv DIV greatest(mx DIV scale, 1)) over the fused KG
    edges — the undamped influence rank next to kg_pagerank. All BIGINT;
    the per-round max is a 1-row broadcast. Oracle: the same 3 rounds
    unrolled with scalar-subquery maxima."""
    from ontoweaver_spark.graphstats import eigenvector_centrality

    _, fedges = _kg(spark, sf_dir)
    return eigenvector_centrality(fedges, iterations=3)


def q_keyness(spark, sf_dir):
    """Top-10 chi-square keyness terms per language: 2x2 contingency
    per (lang, term) with exact BIGINT cells, one fixed left-to-right
    correctly-rounded double chain + round_ieee (the bm25 discipline),
    overused terms only (ad > bc), rank = (chi2 desc, term asc). The
    corpus-slice contrast of Dunning keyness with chi2 standing in for
    G2 (no ln cross-engine)."""
    from ontoweaver_spark.textops import keyness_terms

    _tune(spark)
    return keyness_terms(_docs_spread(spark, sf_dir), "lang", k=10, min_count=5)


def q_allen_audit(spark, sf_dir):
    """Allen interval-algebra audit over per-user event validity
    intervals (start = event time, duration = 1-7 min from event_id):
    every same-entity interval pair classified into the 7 canonical
    Allen relations (before/meets/overlaps/starts/finished_by/contains/
    equals) by exact epoch-micros integer comparisons — the temporal-KG
    conflict detector (overlapping validity of a functional assertion).
    Pair order is (start, end, id)-lexicographic so the 13 relations
    collapse losslessly to 7."""
    from ontoweaver_spark.sessions import allen_relations

    _tune(spark)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_id") % 20 == 0)
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                + (F.col("event_id") % 7 + 1) * F.lit(60_000_000)
            ).alias("e"),
            "event_id",
        )
    )
    return allen_relations(ev, "user_id", "s", "e", "event_id")


def q_kg_rich_club(spark, sf_dir):
    """Rich-club profile over the hub co-citation graph: for every
    distinct degree k, the edge density among nodes of degree > k as
    exact scaled-integer ppm (2*E_k*1e6 DIV N_k*(N_k-1)) — the
    hubs-interlinking structural audit, no float anywhere. Survivor
    counts fold through degree histograms + tiny suffix-cumulative
    windows (never a window over nodes)."""
    from ontoweaver_spark.graphstats import rich_club

    _tune(spark)
    docs = _docs(spark, sf_dir)
    cocite = docs.select(
        ((F.col("doc_id") * 7) % 61).alias("src"),
        ((F.col("doc_id") * 11) % 53).alias("dst"),
    )
    return rich_club(cocite)


def q_kg_trussness(spark, sf_dir):
    """FULL truss decomposition (2 exact h-index rounds, zero driver
    syncs) over a hub co-citation graph: per-EDGE trussness via the
    Sariyuce WWW'17 local iteration — est starts at triangle support,
    each round re-h-indexes over triangle strengths (min est of the
    other two sides). Oracle: the same two rounds unrolled with
    id-ordered triangle enumeration + window-cumulative h-index."""
    from ontoweaver_spark.graphstats import truss_numbers

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(5, 59).alias("src"), hub(13, 47).alias("dst"))
    return truss_numbers(cocite, exact_rounds=2)


def q_kg_n2v_walks(spark, sf_dir):
    """node2vec-BIASED deterministic walks (w_return=4, w_near=2,
    w_far=1 — BFS-ish) over the sparse doc graph: second-order bias via
    one adjacency probe per step, weighted choice via integer
    hash-priority (h DIV w), still a pure function of (graph, seed) so
    a biased random walk hash-matches the unrolled oracle."""
    from ontoweaver_spark.graphstats import node2vec_walks

    _tune(spark)
    return node2vec_walks(
        _doc_graph(spark, sf_dir), walk_length=3,
        w_return=4, w_near=2, w_far=1, seed=0,
    )


def q_kg_betweenness(spark, sf_dir):
    """Landmark betweenness (bounded Brandes, 3 hops, landmarks = every
    97th doc node): exact integer path counts forward, scaled-integer
    dependency accumulation backward (per-term DIV truncation is
    deterministic), so the broker-score centrality hash-matches the
    unrolled oracle."""
    from ontoweaver_spark.graphstats import betweenness_landmark

    _tune(spark)
    landmarks = _docs(spark, sf_dir).where(F.col("doc_id") % 97 == 0).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("node")
    )
    return betweenness_landmark(
        _doc_graph(spark, sf_dir), landmarks, rounds=3, directed=True
    )


def q_kg_anf(spark, sf_dir):
    """ANF neighborhood-function sketches (2 hops, k=8 KMV) over the
    UNDIRECTED doc graph — effective-diameter machinery whose sketch
    merge is deterministic min-k. Oracle: EXACT reachable sets via
    unrolled union CTEs + the identical (k-1)/x_(k) estimator — the
    approximation is checked against exact reachability, the strongest
    independent-derivation form."""
    from ontoweaver_spark.graphstats import neighborhood_function

    _tune(spark)
    return neighborhood_function(
        _doc_graph(spark, sf_dir), rounds=2, k=8, directed=False
    )


def q_kg_densest(spark, sf_dir):
    """Densest-subgraph peel (Bahmani et al. (2+2eps)-approx), 2 exact
    rounds over a 3-tier citation graph: 997 leaf hosts each cite a few
    of 40 mid hosts, mid hosts all cite 7 core hosts, and the core is a
    K7 clique.  Round 1 peels the leaves, round 2 peels the mid tier,
    and the core clique (21 canonical edges, degree 46 >> 1.1x avg)
    SURVIVES at every shipped sf — the r4 hub graph was degree-uniform
    and peeled to empty at sf0.1, making the oracle equality vacuous
    (VERDICT r4 #3).  A declarative assert_true guard makes emptiness a
    query-time error, not a silent 0==0 pass.  Oracle: the same two
    peel rounds unrolled with 1-row stats CTEs."""
    from ontoweaver_spark.graphstats import densest_subgraph

    _tune(spark)
    docs = _docs(spark, sf_dir)
    leaf = F.concat(F.lit("c"), (F.col("doc_id") % 997).cast("string"))
    mid = F.concat(F.lit("b"), (F.col("doc_id") % 40).cast("string"))
    core = F.concat(F.lit("a"), (F.col("doc_id") % 7).cast("string"))
    core2 = F.concat(F.lit("a"), (F.expr("doc_id div 7") % 7).cast("string"))
    cites = (
        docs.select(leaf.alias("src"), mid.alias("dst"))
        .unionAll(docs.select(mid.alias("src"), core.alias("dst")))
        .unionAll(docs.select(core.alias("src"), core2.alias("dst")))
    )
    out = densest_subgraph(cites, epsilon_pct=10, exact_rounds=2)
    guard = out.agg(
        F.assert_true(
            F.count("*") > 0, F.lit("kg_densest: peel emptied the graph — vacuous oracle")
        ).alias("_ok")
    )
    return out.crossJoin(F.broadcast(guard)).drop("_ok")


def q_er_resolve(spark, sf_dir):
    """END-TO-END entity resolution: sorted-neighborhood blocking ->
    levenshtein verify (distance <= 1) -> connected components over the
    match graph -> every mention mapped to its component-canonical id.
    The north-rule linking+canonicalization stages composed as one
    declarative plan; numerically-adjacent names chain into components
    exactly as the oracle's recursive closure derives them."""
    from ontoweaver_spark.dedup import connected_components
    from ontoweaver_spark.linking import er_candidates

    _tune(spark)
    docs = _docs(spark, sf_dir)
    base = F.concat(
        F.lit("entity "), (F.col("doc_id") % 500).cast("string"), F.lit(" corp")
    )
    m1 = docs.select((F.col("doc_id") * 2).alias("entity_id"), base.alias("name"))
    m2 = docs.select(
        (F.col("doc_id") * 2 + 1).alias("entity_id"),
        F.when(F.col("doc_id") % 3 == 0,
               F.replace(base, F.lit("corp"), F.lit("crop")))
        .otherwise(base).alias("name"),
    )
    mentions = m1.unionByName(m2)
    matches = er_candidates(mentions, window=3, max_distance=2).where(
        F.col("distance") <= 1
    ).select("a", "b")
    comp = connected_components(matches, a_col="a", b_col="b")
    return (
        mentions.join(
            comp.withColumnRenamed("vertex", "entity_id"), "entity_id", "left"
        )
        .select(
            "entity_id",
            F.coalesce(F.col("component"), F.col("entity_id")).alias("canonical"),
        )
    )


def q_dedup_jaccard_prefix(spark, sf_dir):
    """PPJoin-style prefix-filtered exact Jaccard at t=0.8: rarest-first
    global shingle order, only each set's (n - ceil(t*n) + 1)-prefix is
    indexed, candidates verified on full sets. The ORACLE computes plain
    all-shared-pairs Jaccard with NO prefix machinery — the filter's
    losslessness is the checked property."""
    from ontoweaver_spark.dedup import jaccard_pairs_prefix

    _tune(spark)
    return jaccard_pairs_prefix(_docs_spread(spark, sf_dir), threshold=0.8)


def q_dedup_containment_asym(spark, sf_dir):
    """LOSSLESS asymmetric containment at t=0.9: prefix filter on the
    SHORTER set only (the containment form of the PPJoin theorem), full
    inverted index on the container side — the quote/subset pairs the
    banded dedup_containment screen can miss (band collision follows
    jaccard, not containment). The ORACLE computes plain all-pairs
    containment with NO prefix machinery, so the filter's losslessness
    is itself the checked property."""
    from ontoweaver_spark.dedup import containment_pairs_prefix

    _tune(spark)
    return containment_pairs_prefix(_docs_spread(spark, sf_dir), threshold=0.9)


def q_dedup_cosine_l2ap(spark, sf_dir):
    """Exact-threshold cosine pairs over sparse integer 3-gram-count
    vectors at t=0.9 via the L2AP l2-norm prefix filter (Anastasiu &
    Karypis ICDE'14): rarest-first global term order, only positions
    whose squared suffix mass still clears (t-1e-4)^2 * |v|^2 are
    indexed (exact BIGINT compare), plus the pairwise product bound
    sfx_a*sfx_b >= t^2*nsq_a*nsq_b at candidate time (lossless),
    full-vector integer dot-product verify. 3-gram units (the jaccard
    ops' shingle size) because the template-heavy unigram vocabulary
    put hot tokens into prefixes — measured 12M candidates for 1.8k
    true pairs at sf0.1 with unigrams, 55s; 3-grams: 10s. The ORACLE
    computes plain all-shared-gram-pairs cosine with NO prefix
    machinery — the filter's losslessness is the checked property."""
    from ontoweaver_spark.dedup import cosine_pairs_l2ap

    _tune(spark)
    return cosine_pairs_l2ap(_docs_spread(spark, sf_dir), threshold=0.9, shingle_k=3)


def q_hll_count(spark, sf_dir):
    """Per-language distinct-token cardinality via MERGED HyperLogLog
    register sketches (p=10): two shard sketches (doc_id % 2) built
    independently, hll_merge'd, then finalized with the raw harmonic
    estimator. Registers are exact integer bit arithmetic; the single
    fp step is one divide of two exactly-representable doubles + floor,
    so the BIGINT estimate is engine-identical. The ORACLE builds the
    registers in one pass — merge losslessness (max of shard maxima ==
    max over the union) is part of what the equality checks."""
    from ontoweaver_spark.textops import hll_estimate, hll_merge, hll_registers, tokens

    _tune(spark)
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "lang", (F.col("doc_id") % 2).alias("_shard"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    shard_a = hll_registers(toks.where(F.col("_shard") == 0), "lang", "tok", p=10)
    shard_b = hll_registers(toks.where(F.col("_shard") == 1), "lang", "tok", p=10)
    merged = hll_merge(shard_a.unionByName(shard_b), "lang")
    return hll_estimate(merged, "lang", p=10)


def q_kg_metapath(spark, sf_dir):
    """Typed 2-hop metapath census over the labeled residue graph (4
    node labels x 3 edge labels): instance counts + distinct endpoints
    per (A)-[r1]->(B)-[r2]->(C) shape — the metapath2vec / KG-audit
    schema signal one level deeper than schema_graph."""
    from ontoweaver_spark.graphstats import metapath_counts

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 500

    def d(c):
        return F.concat(F.lit("d"), c.cast("string"))

    nodes = docs.select(
        d(r).alias("id"), F.concat(F.lit("L"), (r % 4).cast("string")).alias("label")
    ).distinct()
    edges = docs.select(
        d(r).alias("src"),
        d((r * 3 + 1) % 500).alias("dst"),
        F.concat(F.lit("rel"), (r % 3).cast("string")).alias("label"),
    ).distinct()
    return metapath_counts(nodes, edges)


def q_temporal_reach(spark, sf_dir):
    """Time-respecting reachability over the sparse doc graph with
    md5-free arithmetic edge timestamps (each edge usable only at its
    crawl tick, waiting allowed): earliest discovery time per node from
    the every-97th seeds, exactly 6 relaxation rounds — the unrolled
    mode the oracle mirrors with per-round min-agg CTEs."""
    from ontoweaver_spark.graphstats import temporal_reachability

    _tune(spark)
    docs = _docs(spark, sf_dir)
    n = docs.count()
    i = F.col("doc_id").cast("long")

    def node(c):
        return F.concat(F.lit("n"), c.cast("string"))

    parts = [
        docs.select(
            node(i).alias("src"),
            node((i * p + c) % n).alias("dst"),
            ((i * (17 + j) + 7 * j) % 240).alias("t"),
        )
        for j, (p, c) in enumerate(_DOC_GRAPH_PARAMS)
    ]
    edges = parts[0].unionByName(parts[1]).unionByName(parts[2])
    seeds = docs.where(i % 97 == 0).select(
        node(i).alias("node"), F.lit(0).alias("start")
    )
    return temporal_reachability(edges, seeds, rounds=6)


def q_cover_sources(spark, sf_dir):
    """Greedy set cover: which 5 sources' word-BIGRAM vocabularies cover
    the most of the corpus (single tokens are corpus-wide stopwords here
    — one source covers everything, so bigrams are what discriminate).
    Deterministic (gain DESC, source ASC) picks; the oracle replays the
    same 5 rounds with ORDER BY ... LIMIT 1 argmax CTEs and NOT EXISTS
    uncovered filters."""
    from ontoweaver_spark.dedup import shingles
    from ontoweaver_spark.sampling import greedy_cover

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    pairs = docs.select(
        F.col("source").alias("set_id"),
        F.explode(shingles(F.lower(F.col("text")), k=2)).alias("item"),
    )
    return greedy_cover(pairs, k=5)


def q_kg_mis(spark, sf_dir):
    """Luby maximal independent set over the sparse doc graph — the
    parallel symmetry-breaker (which entity merges may apply
    simultaneously). Deterministic md5 priorities make the randomized
    algorithm a pure function of (graph, seed); the oracle replays the
    same rounds as materialized CTEs with NOT EXISTS eliminations
    instead of Spark's anti-joins."""
    from ontoweaver_spark.graphstats import maximal_independent_set

    _tune(spark)
    return maximal_independent_set(_doc_graph(spark, sf_dir), rounds=14, seed=0)


def q_kg_coloring(spark, sf_dir):
    """Jones–Plassmann greedy coloring over the sparse doc graph — color
    classes are conflict-free entity-merge batches (no two merges in a
    class touch the same node); the color count is the schedule length.
    The readiness rule is Luby's winner rule with the same deterministic
    md5 priorities as kg_mis, so the oracle replays the identical rounds
    as materialized CTEs with a list_reduce mex fold for the color
    choice (converges in 13 rounds at sf0.01 / 18 at sf0.1; 24 gives
    margin — surplus rounds are empty on both sides)."""
    from ontoweaver_spark.graphstats import greedy_coloring

    _tune(spark)
    return greedy_coloring(_doc_graph(spark, sf_dir), rounds=24, seed=0)


# block-local graph for the MSF query: 16-node blocks with two affine
# intra-block edges per node, so Borůvka provably converges in <= 4
# rounds (components at most halve from 16) and the selection
# pseudo-forest flattens in <= 4 pointer jumps — the bound the unrolled
# oracle mirrors. Weights are md5 of the canonical edge key.
def _block_graph(spark, sf_dir):
    from ontoweaver_spark.textops import md5_int

    docs = _docs(spark, sf_dir)
    n = docs.count()
    nb = (n // 16) * 16
    i = F.col("doc_id").cast("long")
    blk, j = i - (i % 16), i % 16

    def node(c):
        return F.concat(F.lit("n"), c.cast("string"))

    base = docs.where(i < nb)
    edges = base.select(
        node(i).alias("src"), node(blk + (j * 3 + 1) % 16).alias("dst")
    ).unionByName(
        base.select(node(i).alias("src"), node(blk + (j * 7 + 2) % 16).alias("dst"))
    ).where(F.col("src") != F.col("dst"))
    w = md5_int(
        F.concat_ws(
            "|", F.lit("w"), F.least("src", "dst"), F.greatest("src", "dst")
        )
    )
    return edges.withColumn("weight", w)


def q_kg_msf(spark, sf_dir):
    """Borůvka minimum spanning forest over the block-local graph:
    unique forest under the (weight, src, dst) total order. The oracle
    unrolls the same rounds — per-component arg_min on a padded
    composite key, mutual-choice 2-cycle break, fixed pointer-doubling
    — an independent formulation of each step."""
    from ontoweaver_spark.graphstats import min_spanning_forest

    _tune(spark)
    return min_spanning_forest(_block_graph(spark, sf_dir), rounds=6, jump_rounds=8)


def q_kg_bridges(spark, sf_dir):
    """Bridge (cut-edge) detection over a cycle+pendant block graph:
    within each 16-node block, nodes 0-7 form an 8-cycle (no bridges)
    and nodes 8-15 hang off them as pendants (every pendant edge IS a
    bridge — a merge decision with no corroborating second path). The
    bounded-component Tarjan kernel runs one applyInPandas pass per
    block; the oracle is a genuinely INDEPENDENT formulation — recursive
    reachability over the per-edge-deleted graph ((u,v) is a bridge iff
    v is unreachable from u without that edge), not a rule replay."""
    from ontoweaver_spark.graphstats import bridges_local

    _tune(spark)
    docs = _docs(spark, sf_dir)
    n = docs.count()
    nb = (n // 16) * 16
    i = F.col("doc_id").cast("long")
    blk, j = i - (i % 16), i % 16

    def node(c):
        return F.concat(F.lit("n"), c.cast("string"))

    base = docs.where(i < nb)
    cyc = base.where(j < 8).select(
        blk.alias("blk"), node(blk + (j + 1) % 8).alias("dst"), node(i).alias("src")
    )
    pend = base.where(j >= 8).select(
        blk.alias("blk"), node(i - 8).alias("dst"), node(i).alias("src")
    )
    g = cyc.unionByName(pend)
    return bridges_local(g, "blk")


def q_kg_cutpoints(spark, sf_dir):
    """Articulation-point (cut-vertex) detection over the same
    cycle+pendant block graph as kg_bridges: every cycle node holds a
    pendant, so all 8 cycle nodes per block are cut vertices — the hub
    entities whose removal disconnects their cluster. Independent
    oracle: n is a cut vertex iff some neighbor is unreachable from the
    canonical (min) neighbor in the graph minus n — recursive
    reachability over (excluded_node, node) states, not a rule replay."""
    from ontoweaver_spark.graphstats import articulation_points_local

    _tune(spark)
    docs = _docs(spark, sf_dir)
    n = docs.count()
    nb = (n // 16) * 16
    i = F.col("doc_id").cast("long")
    blk, j = i - (i % 16), i % 16

    def node(c):
        return F.concat(F.lit("n"), c.cast("string"))

    base = docs.where(i < nb)
    cyc = base.where(j < 8).select(
        blk.alias("blk"), node(blk + (j + 1) % 8).alias("dst"), node(i).alias("src")
    )
    pend = base.where(j >= 8).select(
        blk.alias("blk"), node(i - 8).alias("dst"), node(i).alias("src")
    )
    return articulation_points_local(cyc.unionByName(pend), "blk")


def q_kg_2ecc(spark, sf_dir):
    """2-edge-connected components over the same cycle+pendant block
    graph as kg_bridges: each block's 8-cycle is one corroborated core
    (every merge link has a second path) and each pendant is its own
    singleton class. The oracle composes the independent per-edge-
    deleted-reachability bridge characterization with a recursive
    min-label closure over the surviving edges."""
    from ontoweaver_spark.graphstats import two_edge_components_local

    _tune(spark)
    docs = _docs(spark, sf_dir)
    n = docs.count()
    nb = (n // 16) * 16
    i = F.col("doc_id").cast("long")
    blk, j = i - (i % 16), i % 16

    def node(c):
        return F.concat(F.lit("n"), c.cast("string"))

    base = docs.where(i < nb)
    cyc = base.where(j < 8).select(
        blk.alias("blk"), node(blk + (j + 1) % 8).alias("dst"), node(i).alias("src")
    )
    pend = base.where(j >= 8).select(
        blk.alias("blk"), node(i - 8).alias("dst"), node(i).alias("src")
    )
    return two_edge_components_local(cyc.unionByName(pend), "blk")


def q_kg_coloring_blocked(spark, sf_dir):
    """Jones–Plassmann coloring of the 16-node ER-block conflict graph via
    the bounded-component fast path: ONE applyInPandas pass grouped by
    block instead of one distributed join round per priority level (the
    blocks are independent, so global JP == per-block JP). Same pure
    function of (graph, seed) as greedy_coloring; the oracle replays the
    global unrolled rounds (depth 9 measured at every sf; 12 gives
    margin)."""
    from ontoweaver_spark.graphstats import greedy_coloring_local

    _tune(spark)
    g = _block_graph(spark, sf_dir).withColumn(
        "blk", F.expr("cast(substring(src, 2, 100) as bigint) div 16")
    )
    return greedy_coloring_local(g, "blk")


def q_funnel(spark, sf_dir):
    """Ordered view->click->purchase funnel per user with a 24h horizon
    from the first view; earliest-completion semantics (greedy-earliest
    is exact). Exact unix-microsecond stage timestamps; the oracle
    derives each stage as a correlated min-aggregation CTE."""
    from ontoweaver_spark.sessions import funnel

    _tune(spark)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel(
        events, ["view", "click", "purchase"], horizon_minutes=1440
    )


_ENTAIL_SP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
_ENTAIL_DOM = "http://www.w3.org/2000/01/rdf-schema#domain"
_ENTAIL_RNG = "http://www.w3.org/2000/01/rdf-schema#range"
_ENTAIL_INV = "http://www.w3.org/2002/07/owl#inverseOf"
_ENTAIL_SC = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
_ENTAIL_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# exercises every ρdf rule plus the sp∘inverse∘sp interaction chain:
# cites -> references -> relatedTo, cites -> citedBy (inv) -> referencedBy,
# hasPart -> partOf (inv) -> containedIn -> range Composite.
_ENTAIL_SCHEMA = [
    ("cites", _ENTAIL_SP, "references"),
    ("references", _ENTAIL_SP, "relatedTo"),
    ("mentions", _ENTAIL_SP, "relatedTo"),
    ("cites", _ENTAIL_INV, "citedBy"),
    ("citedBy", _ENTAIL_SP, "referencedBy"),
    ("hasPart", _ENTAIL_INV, "partOf"),
    ("partOf", _ENTAIL_SP, "containedIn"),
    ("cites", _ENTAIL_DOM, "Document"),
    ("cites", _ENTAIL_RNG, "Work"),
    ("containedIn", _ENTAIL_RNG, "Composite"),
    ("relatedTo", _ENTAIL_DOM, "Entity"),
    ("Document", _ENTAIL_SC, "Work"),
    ("Work", _ENTAIL_SC, "Thing"),
    ("Composite", _ENTAIL_SC, "Thing"),
    ("Entity", _ENTAIL_SC, "Thing"),
]


def q_kg_entail(spark, sf_dir):
    """ρdf + owl:inverseOf entailment materialization: close a synthetic
    instance graph (5 predicates cycling over the docs, seeded types on
    every 5th doc) under the 15-triple schema and emit ALL derivable
    triples — entailed edges plus type assertions as rdf:type rows. The
    oracle recomputes the property rewrite set with a RECURSIVE CTE over
    the same signed property graph."""
    from ontoweaver_spark.ontology import rdfs_entailment

    _tune(spark)
    docs = _docs(spark, sf_dir)
    n = docs.count()
    i = F.col("doc_id").cast("long")

    def ent(c):
        return F.concat(F.lit("e"), c.cast("string"))

    pred = (
        F.when(i % 5 == 0, "cites")
        .when(i % 5 == 1, "mentions")
        .when(i % 5 == 2, "hasPart")
        .when(i % 5 == 3, "derivedFrom")
        .otherwise("partOf")
    )
    edges = docs.select(
        ent(i).alias("subject"),
        pred.alias("predicate"),
        ent((i * 7 + 3) % n).alias("object"),
    )
    cls = (
        F.when((i / 5).cast("long") % 3 == 0, "Document")
        .when((i / 5).cast("long") % 3 == 1, "Entity")
        .otherwise("Composite")
    )
    types = docs.where(i % 5 == 0).select(ent(i).alias("node"), cls.alias("cls"))
    schema = spark.createDataFrame(
        _ENTAIL_SCHEMA, "subject string, predicate string, object string"
    )
    ec, tc = rdfs_entailment(schema, edges, types)
    return ec.unionByName(
        tc.select(
            F.col("node").alias("subject"),
            F.lit(_ENTAIL_TYPE).alias("predicate"),
            F.col("cls").alias("object"),
        )
    )


def q_kg_butterflies(spark, sf_dir):
    """Exact butterfly (2x2 biclique) count of a doc-token-style
    bipartite incidence graph (left = doc_id % 73, right =
    (doc_id*13) % 97 — coprime asymmetric sides so the pivot-side
    choice is exercised). One row (n_edges, butterflies);
    the bipartite density signal of doc-feature co-occurrence."""
    from ontoweaver_spark.graphstats import butterfly_count

    _tune(spark)
    docs = _docs(spark, sf_dir)
    bip = docs.select(
        F.concat(F.lit("d"), (F.col("doc_id") % 73).cast("string")).alias("l"),
        F.concat(F.lit("t"), ((F.col("doc_id") * 13) % 97).cast("string")).alias("r"),
    )
    return butterfly_count(bip)


def q_kg_njaccard(spark, sf_dir):
    """Neighborhood-Jaccard node similarity over a synthetic sparse
    co-occurrence graph (u = doc_id % 41, v = (doc_id*7+1) % 43 -- coprime moduli so the incidence mixes):
    pairs sharing >= 3 undirected neighbors, Jaccard as exact integer
    ppm. The structural-equivalence 'probably the same entity'
    signal."""
    from ontoweaver_spark.graphstats import neighbor_jaccard

    _tune(spark)
    docs = _docs(spark, sf_dir)
    e = docs.select(
        F.concat(F.lit("n"), (F.col("doc_id") % 41).cast("string")).alias("src"),
        F.concat(F.lit("m"), ((F.col("doc_id") * 7 + 1) % 43).cast("string")).alias("dst"),
    )
    return neighbor_jaccard(e, min_common=3)


def q_dag_reduce(spark, sf_dir):
    """Transitive reduction of the chain+shortcut DAG (8-node chains
    with a 0->4 shortcut per group, same family as dag_levels): the
    shortcut edges are exactly the implied ones, so the reduction must
    return the chains alone. Oracle derives it the long way — recursive
    closure, compose, anti-join."""
    from ontoweaver_spark.graphstats import transitive_reduction

    _tune(spark)
    docs = _docs(spark, sf_dir)
    cap = docs.agg((F.floor(F.count("*") / 8) * 8).alias("cap"))
    d = docs.crossJoin(F.broadcast(cap)).where(F.col("doc_id") < F.col("cap"))
    i = F.col("doc_id")
    node = F.concat(F.lit("n"), i.cast("string"))
    chain = d.where(i % 8 < 7).select(
        node.alias("src"),
        F.concat(F.lit("n"), (i + 1).cast("string")).alias("dst"),
    )
    shortcut = d.where(i % 8 == 0).select(
        node.alias("src"),
        F.concat(F.lit("n"), (i + 4).cast("string")).alias("dst"),
    )
    return transitive_reduction(chain.unionByName(shortcut))


def q_skyline_docs(spark, sf_dir):
    """Pareto frontier of documents maximizing (n_chars, an
    md5-derived score): 'longest AND best — no arbitrary weights'
    corpus selection. Restricted to every 3rd doc so the DuckDB
    NOT-EXISTS oracle stays quadratic-small; the Spark side is the
    two-phase partition/merge skyline."""
    from ontoweaver_spark.sampling import skyline
    from ontoweaver_spark.textops import md5_int

    _tune(spark)
    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") % 3 == 0)
        .withColumn("score", md5_int(F.col("text")) % 100000)
    )
    return skyline(docs, ["n_chars", "score"]).select("doc_id", "n_chars", "score")


def q_kg_wl(spark, sf_dir):
    """1-WL color refinement (2 rounds) over the hub co-citation graph:
    structural node fingerprints — equal colors = indistinguishable
    radius-2 neighborhoods. The multiset fold is the commutative
    sum/count hash (skew-safe on hubs), mirrored exactly by the
    unrolled-CTE oracle."""
    from ontoweaver_spark.graphstats import wl_colors

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return wl_colors(cocite, rounds=2)


def q_kg_coreness(spark, sf_dir):
    """Full core decomposition of the hub co-citation graph via 3
    h-index rounds (fixpoint measured at <= 2 rounds on both test
    scales; histogram-folded h-index, no per-neighbor windows) —
    the per-entity density rank of the web KG."""
    from ontoweaver_spark.graphstats import core_numbers

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return core_numbers(cocite, exact_rounds=3)


def _coreness_sql(rounds: int) -> str:
    """Unrolled h-index core-decomposition rounds over the hub graph."""
    parts = ["""
        WITH e0 AS (
          SELECT 'hub'||((doc_id*7)%61)::VARCHAR AS a,
                 'hub'||((doc_id*11)%53)::VARCHAR AS b
          FROM documents
        ), eu AS (
          SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v FROM e0 WHERE a <> b
        ), und AS (
          SELECT u, v FROM eu UNION ALL SELECT v, u FROM eu
        ), est0 AS (
          SELECT u AS node, count(*)::BIGINT AS est FROM und GROUP BY 1
        )"""]
    for r in range(rounds):
        parts.append(f""", hist{r} AS (
          SELECT und.u AS node, e.est AS e, count(*) AS c
          FROM und JOIN est{r} e ON e.node = und.v GROUP BY 1, 2
        ), hidx{r} AS (
          SELECT node, max(least(e, cum)) AS h FROM (
            SELECT node, e, sum(c) OVER (
              PARTITION BY node ORDER BY e DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM hist{r}
          ) GROUP BY node
        ), est{r + 1} AS (
          SELECT e.node, least(e.est, coalesce(h.h, 0))::BIGINT AS est
          FROM est{r} e LEFT JOIN hidx{r} h USING (node)
        )""")
    parts.append(f"\nSELECT node, est AS coreness FROM est{rounds}")
    return "".join(parts)


def q_kg_matching(spark, sf_dir):
    """Greedy maximal matching over the hub co-citation graph (7
    local-min rounds; stability measured at 5-6 on both test scales):
    the one-to-one conflict-free merge set of entity alignment."""
    from ontoweaver_spark.graphstats import maximal_matching

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return maximal_matching(cocite, exact_rounds=7)


def _matching_sql(rounds: int) -> str:
    """Unrolled Luby local-min matching rounds over the hub graph."""
    parts = ["""
        WITH e_raw AS (
          SELECT 'hub'||((doc_id*7)%61)::VARCHAR AS a,
                 'hub'||((doc_id*11)%53)::VARCHAR AS b
          FROM documents
        ), e0 AS MATERIALIZED (
          SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v,
                 ('0x'||substr(md5(least(a,b) || '->' || greatest(a,b)),1,15))::BIGINT AS p
          FROM e_raw WHERE a <> b
        )"""]
    sels = []
    for r in range(rounds):
        parts.append(f""", vmin{r} AS MATERIALIZED (
          SELECT node, min(p) AS pm FROM (
            SELECT u AS node, p FROM e{r} UNION ALL SELECT v, p FROM e{r}
          ) GROUP BY node
        ), sel{r} AS MATERIALIZED (
          SELECT e.u, e.v FROM e{r} e
          JOIN vmin{r} x ON x.node = e.u AND x.pm = e.p
          JOIN vmin{r} y ON y.node = e.v AND y.pm = e.p
        ), t{r} AS MATERIALIZED (
          SELECT u AS node FROM sel{r} UNION SELECT v FROM sel{r}
        ), e{r + 1} AS MATERIALIZED (
          SELECT e.u, e.v, e.p FROM e{r} e
          WHERE NOT EXISTS (SELECT 1 FROM t{r} WHERE t{r}.node = e.u)
            AND NOT EXISTS (SELECT 1 FROM t{r} WHERE t{r}.node = e.v)
        )""")
        sels.append(f"SELECT u, v FROM sel{r}")
    parts.append("\n" + "\nUNION ALL\n".join(sels))
    return "".join(parts)


def q_er_align(spark, sf_dir):
    """End-to-end one-to-one entity alignment: sorted-neighborhood ER
    candidates (the er_pairs stage) fed through WEIGHTED greedy maximal
    matching — each entity merges with AT MOST one partner, contested
    entities resolved by edit distance FIRST (an exact-name duplicate
    beats a typo pair), hash only breaking ties (7 rounds; stability
    measured at 4-5 on both test scales). The composite the alignment story needs:
    blocking proposes, matching disposes."""
    from ontoweaver_spark.graphstats import maximal_matching
    from ontoweaver_spark.linking import er_candidates

    _tune(spark)
    docs = _docs(spark, sf_dir)
    base = F.concat(
        F.lit("entity "), (F.col("doc_id") % 500).cast("string"), F.lit(" corp")
    )
    m1 = docs.select((F.col("doc_id") * 2).alias("entity_id"), base.alias("name"))
    m2 = docs.select(
        (F.col("doc_id") * 2 + 1).alias("entity_id"),
        F.when(F.col("doc_id") % 3 == 0, F.replace(base, F.lit("corp"), F.lit("crop")))
        .otherwise(base).alias("name"),
    )
    pairs = er_candidates(m1.unionByName(m2), window=3, max_distance=2)
    edges = pairs.select(
        F.col("a").cast("string").alias("src"),
        F.col("b").cast("string").alias("dst"),
        F.col("distance"),
    )
    return maximal_matching(edges, exact_rounds=7, cost_col="distance")


def _er_align_sql(rounds: int) -> str:
    """er_pairs candidate SQL -> unrolled local-min matching rounds."""
    parts = ["""
        WITH ents AS MATERIALIZED (
          SELECT doc_id * 2 AS entity_id,
                 'entity ' || (doc_id % 500)::VARCHAR || ' corp' AS cn
          FROM documents
          UNION ALL
          SELECT doc_id * 2 + 1,
                 CASE WHEN doc_id % 3 = 0
                      THEN replace('entity ' || (doc_id % 500)::VARCHAR
                                   || ' corp', 'corp', 'crop')
                      ELSE 'entity ' || (doc_id % 500)::VARCHAR || ' corp'
                 END
          FROM documents
        ), ranked AS MATERIALIZED (
          SELECT entity_id, cn,
                 row_number() OVER (ORDER BY cn, entity_id) - 1 AS rk
          FROM ents
        ), cand AS MATERIALIZED (
          SELECT l.entity_id::VARCHAR AS a, r.entity_id::VARCHAR AS b,
                 levenshtein(l.cn, r.cn) AS dist
          FROM ranked l JOIN ranked r
            ON r.rk > l.rk AND r.rk - l.rk <= 3
          WHERE levenshtein(l.cn, r.cn) <= 2
        ), e0 AS MATERIALIZED (
          SELECT least(a,b) AS u, greatest(a,b) AS v,
                 min(dist)::BIGINT * 1152921504606846976::BIGINT +
                 ('0x'||substr(md5(least(a,b) || '->' || greatest(a,b)),1,15))::BIGINT AS p
          FROM cand WHERE a <> b GROUP BY 1, 2
        )"""]
    sels = []
    for r in range(rounds):
        parts.append(f""", vmin{r} AS MATERIALIZED (
          SELECT node, min(p) AS pm FROM (
            SELECT u AS node, p FROM e{r} UNION ALL SELECT v, p FROM e{r}
          ) GROUP BY node
        ), sel{r} AS MATERIALIZED (
          SELECT e.u, e.v FROM e{r} e
          JOIN vmin{r} x ON x.node = e.u AND x.pm = e.p
          JOIN vmin{r} y ON y.node = e.v AND y.pm = e.p
        ), t{r} AS MATERIALIZED (
          SELECT u AS node FROM sel{r} UNION SELECT v FROM sel{r}
        ), e{r + 1} AS MATERIALIZED (
          SELECT e.u, e.v, e.p FROM e{r} e
          WHERE NOT EXISTS (SELECT 1 FROM t{r} WHERE t{r}.node = e.u)
            AND NOT EXISTS (SELECT 1 FROM t{r} WHERE t{r}.node = e.v)
        )""")
        sels.append(f"SELECT u, v FROM sel{r}")
    parts.append("\n" + "\nUNION ALL\n".join(sels))
    return "".join(parts)


def q_kg_diameter(spark, sf_dir):
    """Double-sweep diameter lower bound of the hub co-citation graph
    (seed hub0, 6 BFS rounds per sweep — covers the measured
    eccentricities at both scales): the 'how wide is this web graph'
    number that an exact all-pairs sweep cannot afford."""
    from ontoweaver_spark.graphstats import diameter_double_sweep

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    cocite = docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst"))
    return diameter_double_sweep(cocite, seed="hub0", rounds=6)


def _diameter_sql(rounds: int) -> str:
    """Two unrolled BFS sweeps + argmax handoff over the hub graph."""
    def bfs(tag: str, seed_cte: str) -> str:
        out = [f""", {tag}0 AS MATERIALIZED (
          SELECT node, 0::BIGINT AS dist FROM {seed_cte}
        )"""]
        for r in range(rounds):
            out.append(f""", {tag}{r + 1} AS MATERIALIZED (
          SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM {tag}{r}
            UNION ALL
            SELECT und.v AS node, d.dist + 1
            FROM {tag}{r} d JOIN und ON und.u = d.node
          ) GROUP BY node
        )""")
        return "".join(out)

    return ("""
        WITH e0 AS MATERIALIZED (
          SELECT 'hub'||((doc_id*7)%61)::VARCHAR AS a,
                 'hub'||((doc_id*11)%53)::VARCHAR AS b
          FROM documents
        ), und AS MATERIALIZED (
          SELECT DISTINCT u, v FROM (
            SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0
          ) WHERE u <> v
        ), s1 AS (SELECT 'hub0' AS node)"""
        + bfs("d", "s1")
        + f""", far1 AS MATERIALIZED (
          SELECT node AS far_node, dist AS far_dist FROM d{rounds}
          ORDER BY dist DESC, node LIMIT 1
        ), s2 AS (SELECT far_node AS node FROM far1)"""
        + bfs("g", "s2")
        + f"""
        SELECT 'hub0' AS seed, f.far_node, f.far_dist,
               (SELECT max(dist) FROM g{rounds}) AS diameter_lb
        FROM far1 f
        """)


def q_kg_entail_owl(spark, sf_dir):
    """owl:TransitiveProperty + owl:SymmetricProperty + subPropertyOf
    entailment over chain-structured instance edges: partOf chains close
    transitively (and every derived chain re-enters the relatedTo
    super-property), follows edges mirror. Oracle = recursive-CTE chain
    closure, an independent derivation."""
    from ontoweaver_spark.ontology import (
        OWL_SYMMETRIC, OWL_TRANSITIVE, RDF_TYPE, RDFS_SUBPROPERTYOF,
        rdfs_entailment,
    )

    _tune(spark)
    docs = _docs(spark, sf_dir)
    cap = docs.agg((F.floor(F.count("*") / 8) * 8).alias("cap"))
    d = docs.crossJoin(F.broadcast(cap)).where(F.col("doc_id") < F.col("cap"))
    i = F.col("doc_id")
    node = F.concat(F.lit("n"), i.cast("string"))
    chain = d.where(i % 8 < 7).select(
        node.alias("subject"), F.lit("partOf").alias("predicate"),
        F.concat(F.lit("n"), (i + 1).cast("string")).alias("object"),
    )
    follows = d.where(i % 8 == 0).select(
        node.alias("subject"), F.lit("follows").alias("predicate"),
        F.concat(F.lit("n"), (i + 3).cast("string")).alias("object"),
    )
    schema = spark.createDataFrame(
        [
            ("partOf", RDF_TYPE, OWL_TRANSITIVE),
            ("partOf", RDFS_SUBPROPERTYOF, "relatedTo"),
            ("follows", RDF_TYPE, OWL_SYMMETRIC),
        ],
        "subject string, predicate string, object string",
    )
    types = spark.createDataFrame([], "node string, cls string")
    ec, _ = rdfs_entailment(schema, chain.unionByName(follows), types)
    return ec


def q_kg_reciprocity(spark, sf_dir):
    """Edge reciprocity of the directed hub co-citation graph: the
    mutual-link fraction (exact integer ppm) — link-farm signal."""
    from ontoweaver_spark.graphstats import reciprocity

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    return reciprocity(docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst")))


def q_burst_hosts(spark, sf_dir):
    """Per-type crawl-rate bursts over the events table: day buckets
    whose count exceeds 3x that type's own average active-day rate
    (exact integer test — no float mean); the uniform synthetic stream
    is deterministically thinned outside every 24th hour so real bursts
    exist to detect."""
    from ontoweaver_spark.sessions import burst_windows

    _tune(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the synthetic stream is time-uniform, so thin every day except
    # each 7th to ~1/6 rate — deterministic planted bursts (keyed by
    # event_type: user-day counts are too sparse to carry a rate signal)
    b = (F.unix_micros(F.col("ts").cast("timestamp")) / (86400 * 1_000_000)).cast("long")
    skewed = ev.where((b % 7 == 0) | (F.col("event_id") % 6 == 0))
    return burst_windows(skewed, key_col="event_type", ts_col="ts",
                         bucket_seconds=86400, factor=3)


def q_kg_katz(spark, sf_dir):
    """Truncated Katz centrality (4 rounds, alpha=1/16, BIGINT-exact)
    over the directed hub co-citation graph — indirect-influence rank."""
    from ontoweaver_spark.graphstats import katz_fixed_point

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    return katz_fixed_point(
        docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst")),
        iterations=4, alpha_inv=16,
    )


def q_kg_squares(spark, sf_dir):
    """Exact 4-cycle census of the hub co-citation graph (one row:
    edges, wedges, squares) — the template/link-farm motif that is
    square-rich even when triangle-poor."""
    from ontoweaver_spark.graphstats import square_count

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    return square_count(docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst")))


def q_ld_extract(spark, sf_dir):
    """Embedded schema.org JSON-LD harvest: synthesize pages whose HTML
    carries an ld+json block derived from each document, extract
    (subject, predicate, object) triples with one JVM regexp + from_json
    map parse — the in-HTML twin of the .jsonld file loader."""
    from ontoweaver_spark.webdoc import extract_embedded_jsonld

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    ld = F.concat(
        F.lit('{"@id":"doc'), i.cast("string"),
        F.lit('","@type":"Article","name":"entity '), (i % 500).cast("string"),
        F.lit('","inLanguage":"'), F.col("lang"), F.lit('"}'),
    )
    pages = docs.select(
        F.concat(F.lit("https://x.test/"), i.cast("string")).alias("url"),
        F.concat(
            F.lit('<html><head><script type="application/ld+json">'), ld,
            F.lit("</script></head><body>"), F.col("text"), F.lit("</body></html>"),
        ).alias("html"),
    )
    return extract_embedded_jsonld(pages)


def q_meta_og(spark, sf_dir):
    """OpenGraph / <meta>-tag harvest over synthesized pages: og:title,
    a name=/content= description with an HTML entity (decode checked),
    an attribute-order-swapped og:len, and a charset tag that must drop
    (no name/property). Closed-form oracle from the raw columns."""
    from ontoweaver_spark.webdoc import extract_meta_tags

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    html = F.concat(
        F.lit('<html><head><meta property="og:title" content="'),
        F.upper(F.col("source")),
        F.lit('" /><meta name="description" content="x &amp; '), F.col("lang"),
        F.lit('"><meta content="'), F.col("n_chars").cast("string"),
        F.lit('" property=\'og:len\' ><meta charset="utf-8"></head><body>'),
        F.col("text"), F.lit("</body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://x.test/"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return extract_meta_tags(pages)


def q_microdata(spark, sf_dir):
    """Schema.org MICRODATA harvest (attribute-based sibling of ld_extract):
    itemscope/itemtype -> `a` triple, span itemprop text value, meta
    itemprop content value, single-quoted itemprop with an entity in the
    text run. Closed-form oracle."""
    from ontoweaver_spark.webdoc import extract_microdata

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body itemscope itemtype="https://schema.org/'),
        F.col("source"),
        F.lit('"><span itemprop="inLanguage">'), F.col("lang"),
        F.lit('</span><meta itemprop="numChars" content="'),
        F.col("n_chars").cast("string"),
        F.lit("\"><b itemprop = 'via'>s &amp; "), F.col("source"),
        F.lit("</b></body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://x.test/"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return extract_microdata(pages)


def q_web_tables(spark, sf_dir):
    """WebTables-style relational harvest: first <table> per page, header
    row joined onto body cells as (url, row_idx, col_idx, header, cell);
    inner tags stripped, entities decoded, whitespace collapsed, a second
    table ignored. Closed-form oracle (4 cells per page)."""
    from ontoweaver_spark.webdoc import extract_html_tables

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body><p>no</p><table id="t1">'
              "<tr><th> source </th><th>chars</th></tr><tr><td>"),
        F.col("source"), F.lit("</td><td>"), F.col("n_chars").cast("string"),
        F.lit("</td></tr><tr><td>l &amp; "), F.col("lang"),
        F.lit("</td><td><i>"), (i % 7).cast("string"),
        F.lit("</i></td></tr></table>"
              "<table><tr><td>ignored</td></tr></table></body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://x.test/"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return extract_html_tables(pages)


def q_kg_lcc(spark, sf_dir):
    """Giant-component extraction: star-topology membership graph where
    half the docs share one anchor (the giant component) and the rest
    split across 5 small anchors; largest_component must return exactly
    the giant one with a deterministic tie-break."""
    from ontoweaver_spark.graphstats import largest_component

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    anchor = F.when(i % 10 < 5, F.lit("gA")).otherwise(
        F.concat(F.lit("g"), (i % 10).cast("string"))
    )
    e = docs.select(
        F.concat(F.lit("d"), i.cast("string")).alias("src"), anchor.alias("dst")
    )
    return largest_component(e)


def q_ld_export(spark, sf_dir):
    """Newline-delimited JSON-LD export of the documents KG triples:
    byte-deterministic node objects (sorted predicates and objects,
    hand-built JSON — never engine-ordered to_json), the write mirror
    of the .jsonld loader."""
    from ontoweaver_spark.rdf_export import serialize_jsonld_lines

    _tune(spark)
    docs = _docs(spark, sf_dir).where(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    i = F.col("doc_id")
    subj = F.concat(F.lit("doc"), i.cast("string"))
    triples = docs.select(
        subj.alias("subject"), F.lit("in_language").alias("predicate"),
        F.col("lang").alias("object"),
    ).unionByName(docs.select(
        subj.alias("subject"), F.lit("from_source").alias("predicate"),
        F.col("source").alias("object"),
    ))
    return serialize_jsonld_lines(triples)


def q_kg_graph_hash(spark, sf_dir):
    """Whole-graph WL fingerprint of the hub co-citation graph (2
    rounds): the build-drift check — one row (n_nodes, graph_hash)."""
    from ontoweaver_spark.graphstats import wl_graph_hash

    _tune(spark)
    docs = _docs(spark, sf_dir)

    def hub(m, p):
        return F.concat(F.lit("hub"), ((F.col("doc_id") * m) % p).cast("string"))

    return wl_graph_hash(
        docs.select(hub(7, 61).alias("src"), hub(11, 53).alias("dst")), rounds=2
    )


def q_media_image(spark, sf_dir):
    """Image feature extraction over the deterministic synthetic media
    table (Arrow-batched mapInPandas; payloads are non-image bytes, so
    EVERY environment takes the marked deterministic stub — Pillow, if
    present, raises on the junk payload and falls through — making the
    md5-derived features oracle-checkable)."""
    from ontoweaver_spark.multimodal import image_features, synthetic_media

    _tune(spark)
    return image_features(synthetic_media(spark, 2000, seed=42))


def q_media_audio(spark, sf_dir):
    """Audio feature extraction over the synthetic media table: payloads
    are not RIFF/WAVE, so the deterministic stub path fires everywhere
    (2 bytes/sample at the metadata sample rate, hash loudness); the
    mapInPandas batch plumbing is the production shape."""
    from ontoweaver_spark.multimodal import audio_features, synthetic_media

    _tune(spark)
    return audio_features(synthetic_media(spark, 2000, seed=42))


def q_kg_simrank(spark, sf_dir):
    """Truncated SimRank (2 exact-integer rounds, C=0.8) over the sparse
    directed doc graph: 'similar if referenced by similar sources' — the
    structural merge-candidate signal for ER. Oracle unrolls the same
    BIGINT recurrence as MATERIALIZED CTEs."""
    from ontoweaver_spark.graphstats import simrank_scores

    _tune(spark)
    return simrank_scores(_doc_graph(spark, sf_dir), rounds=2)


def _simrank_sql(rounds: int = 2, c_num: int = 8, c_den: int = 10,
                 cap: int = 64, scale: int = 1_000_000) -> str:
    body = f"""
    WITH raw AS MATERIALIZED (
      {_doc_graph_sql()}
    ), e AS MATERIALIZED (
      SELECT DISTINCT src AS u, dst AS v FROM raw WHERE src <> dst
    ), ind AS MATERIALIZED (
      SELECT v AS node, count(*)::BIGINT AS ind FROM e GROUP BY 1
    ), outd AS (
      SELECT u AS node, count(*)::BIGINT AS outd FROM e GROUP BY 1
    ), prop AS MATERIALIZED (
      SELECT e.u AS i, e.v AS a FROM e
      JOIN outd o ON o.node = e.u AND o.outd <= {cap}
    ), nodes AS (
      SELECT u AS node FROM e UNION SELECT v FROM e
    ), s0 AS MATERIALIZED (
      SELECT node AS pi, node AS pj, {scale}::BIGINT AS s FROM nodes
    )"""
    prev = "s0"
    for r in range(1, rounds + 1):
        body += f""", sum{r} AS MATERIALIZED (
      SELECT p1.a AS a, p2.a AS b, sum({prev}.s)::BIGINT AS su
      FROM {prev}
      JOIN prop p1 ON p1.i = {prev}.pi
      JOIN prop p2 ON p2.i = {prev}.pj
      WHERE p1.a <> p2.a
      GROUP BY 1, 2
    ), s{r} AS MATERIALIZED (
      SELECT pi, pj, s FROM s0
      UNION ALL
      SELECT pi, pj, s FROM (
        SELECT m.a AS pi, m.b AS pj,
               (({c_num} * m.su) // ({c_den} * ia.ind * ib.ind))::BIGINT AS s
        FROM sum{r} m
        JOIN ind ia ON ia.node = m.a
        JOIN ind ib ON ib.node = m.b
      ) WHERE s >= 1
    )"""
        prev = f"s{r}"
    return body + f"""
    SELECT pi AS a, pj AS b, s AS simrank FROM {prev} WHERE pi < pj
    """


def q_kg_twins(spark, sf_dir):
    """Structural-equivalence twin classes over a planted two-relation
    graph (v_k -> h_{k%6}, r_{k%10} -> v_k): v_k and v_j are twins iff
    k = j mod 30, so 60 v-nodes collapse into 30 pairs; h/r nodes stay
    singletons. The supernode-collapse / interchangeable-entity signal."""
    from ontoweaver_spark.graphstats import structural_twins

    _tune(spark)
    docs = _docs(spark, sf_dir)
    k = (F.col("doc_id") % 60).cast("long")
    e = docs.select(
        F.concat(F.lit("v"), k.cast("string")).alias("src"),
        F.concat(F.lit("h"), (k % 6).cast("string")).alias("dst"),
    ).unionByName(
        docs.select(
            F.concat(F.lit("r"), (k % 10).cast("string")).alias("src"),
            F.concat(F.lit("v"), k.cast("string")).alias("dst"),
        )
    )
    return structural_twins(e)


def q_retrieval_eval(spark, sf_dir):
    """Per-query IR evaluation (NDCG@10 / AP@10 / P@10, exact integer ppm
    with a literal trunc(scale/log2(r+1)) gain table shared with the
    oracle) over a synthesized judged ranking: 20 queries, ranks from
    doc_id div 20, relevance from (doc_id*13)%7."""
    from ontoweaver_spark.similarity import retrieval_metrics

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    res = docs.select(
        F.concat(F.lit("q"), (i % 20).cast("string")).alias("query_id"),
        (F.expr("doc_id div 20") + 1).cast("long").alias("rank"),
        F.when((i * 13) % 7 < 2, F.lit(1)).otherwise(F.lit(0)).alias("rel"),
    )
    return retrieval_metrics(res, k=10)


def _retrieval_sql(k: int = 10, scale: int = 1_000_000) -> str:
    import math

    gains = {r: int(scale / math.log2(r + 1)) for r in range(1, k + 1)}
    ideal = {r: sum(gains[i] for i in range(1, r + 1)) for r in range(1, k + 1)}
    gain_case = "CASE " + " ".join(
        f"WHEN rank = {r} THEN {g}" for r, g in gains.items()
    ) + " ELSE 0 END"
    idcg_case = "CASE " + " ".join(
        f"WHEN least(p.n_rel, {k}) = {r} THEN {g}" for r, g in ideal.items()
    ) + " ELSE 0 END"
    return f"""
    WITH res AS MATERIALIZED (
      SELECT 'q' || (doc_id % 20)::VARCHAR AS query_id,
             (doc_id // 20 + 1)::BIGINT AS rank,
             CASE WHEN (doc_id * 13) % 7 < 2 THEN 1 ELSE 0 END AS rel
      FROM documents
    ), perq AS (
      SELECT query_id, sum(rel)::BIGINT AS n_rel FROM res GROUP BY 1
    ), topk AS (
      SELECT query_id, rank, rel, {gain_case} AS gain,
             sum(rel) OVER (PARTITION BY query_id ORDER BY rank)
               AS hits_so_far
      FROM res WHERE rank <= {k}
    ), scored AS (
      SELECT query_id,
             sum(rel * gain)::BIGINT AS dcg,
             sum(CASE WHEN rel = 1
                 THEN hits_so_far * {scale} // rank ELSE 0 END)::BIGINT
               AS ap_num,
             sum(rel)::BIGINT AS hits_at_k
      FROM topk GROUP BY 1
    )
    SELECT p.query_id, p.n_rel,
           (CASE WHEN p.n_rel > 0
            THEN (coalesce(s.dcg, 0) * {scale}) // ({idcg_case})
            ELSE 0 END)::BIGINT AS ndcg_ppm,
           (CASE WHEN p.n_rel > 0
            THEN coalesce(s.ap_num, 0) // least(p.n_rel, {k})
            ELSE 0 END)::BIGINT AS ap_ppm,
           (coalesce(s.hits_at_k, 0) * {scale} // {k})::BIGINT AS p_at_k_ppm
    FROM perq p LEFT JOIN scored s USING (query_id)
    """


def q_rake(spark, sf_dir):
    """RAKE keyphrase extraction per document: stopword/punctuation-
    bounded candidate runs, exact-integer deg/freq word scores summed
    per phrase. Oracle replicates the regexp chain + BIGINT arithmetic."""
    from ontoweaver_spark.textops import rake_keyphrases

    _tune(spark)
    return rake_keyphrases(_docs(spark, sf_dir), max_phrase_len=6)


def _hearst_sql() -> str:
    """DuckDB mirror of q_hearst: the SAME planted sentences (word
    rotation over _HEARST_WORDS) and the byte-identical Java∩RE2 regex
    chain — patterns/groups/separator/stoplist single-sourced from
    ontoweaver_spark.webdoc so the two sides cannot drift."""
    from ontoweaver_spark.webdoc import (
        HEARST_PATTERNS, _HEARST_DROP, _HEARST_SEP,
    )

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"'fruits such as ' || {pick(0)} || ', ' || {pick(1)} || "
        f"' and ' || {pick(2)} || "
        f"'. such tools as ' || {pick(3)} || ' or ' || {pick(4)} || "
        f"'. ' || {pick(5)} || ', ' || {pick(6)} || ' and other metals' || "
        f"'. cities, including ' || {pick(7)} || ' and ' || {pick(8)} || "
        f"'. drinks, especially ' || {pick(9)} || '. ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS pattern,
                     regexp_extract_all(tx, '{p}', {hg}) AS gh,
                     regexp_extract_all(tx, '{p}', {lg}) AS gl
              FROM t"""
        for name, (p, hg, lg) in HEARST_PATTERNS.items()
    )
    drop = ", ".join(f"'{d}'" for d in _HEARST_DROP)
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
{branches}
            ), z AS (
              SELECT doc_id, pattern, gh[g.i] AS hypernym, gl[g.i] AS lst
              FROM m, LATERAL unnest(generate_series(1, len(gh))) AS g(i)
            ), e AS (
              SELECT doc_id, pattern, hypernym,
                     unnest(string_split_regex(lst, '{_HEARST_SEP}'))
                       AS hyponym
              FROM z
            )
            SELECT DISTINCT doc_id, hyponym, hypernym, pattern FROM e
            WHERE length(hyponym) >= 3 AND length(hypernym) >= 3
              AND hyponym <> hypernym
              AND hyponym NOT IN ({drop}) AND hypernym NOT IN ({drop})
    """


def _meronym_sql() -> str:
    """DuckDB mirror of q_meronym: the SAME planted sentences (word
    rotation over _HEARST_WORDS) and the byte-identical Java∩RE2 regex
    chain — patterns/groups/separator/stoplists single-sourced from
    ontoweaver_spark.webdoc so the two sides cannot drift."""
    from ontoweaver_spark.webdoc import (
        MERONYM_PATTERNS, _HEARST_SEP, _MERONYM_DROP,
    )

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"'engine consists of ' || {pick(0)} || ', ' || {pick(1)} || "
        f"' and ' || {pick(2)} || "
        f"'. water is composed of ' || {pick(3)} || ' and ' || {pick(4)} || "
        f"'. basket contains ' || {pick(5)} || ', ' || {pick(6)} || "
        f"'. ' || {pick(7)} || ', ' || {pick(8)} || "
        f"' are parts of wagon. ' || {pick(9)} || "
        f"' is a member of club. ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS pattern,
                     regexp_extract_all(tx, '{p}', {wg}) AS gw,
                     regexp_extract_all(tx, '{p}', {lg}) AS gl
              FROM t"""
        for name, (p, wg, lg) in MERONYM_PATTERNS.items()
    )
    drop = ", ".join(f"'{d}'" for d in _MERONYM_DROP)
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
{branches}
            ), z AS (
              SELECT doc_id, pattern, gw[g.i] AS whole, gl[g.i] AS lst
              FROM m, LATERAL unnest(generate_series(1, len(gw))) AS g(i)
            ), e AS (
              SELECT doc_id, pattern, whole,
                     unnest(string_split_regex(lst, '{_HEARST_SEP}'))
                       AS part
              FROM z
            )
            SELECT DISTINCT doc_id, part, whole, pattern FROM e
            WHERE length(part) >= 3 AND length(whole) >= 3
              AND part <> whole
              AND part NOT IN ({drop}) AND whole NOT IN ({drop})
    """


def _rake_sql(max_phrase_len: int = 6, scale: int = 1_000_000) -> str:
    from ontoweaver_spark.textops import STOPWORDS

    sw_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return rf"""
    WITH cand AS MATERIALIZED (
      SELECT doc_id, phrase, len(string_split(phrase, ' ')) AS plen
      FROM (
        SELECT doc_id,
               trim(regexp_replace(t.p, '\s+', ' ', 'g')) AS phrase
        FROM documents,
             UNNEST(string_split(
               regexp_replace(
                 regexp_replace(lower(trim(text)), '[^a-z0-9\s]+', '|', 'g'),
                 '{sw_pat}', '|', 'g'),
               '|')) AS t(p)
      ) WHERE phrase <> ''
    ), capped AS MATERIALIZED (
      SELECT * FROM cand WHERE plen <= {max_phrase_len}
    ), words_all AS MATERIALIZED (
      SELECT doc_id, plen, t.w
      FROM capped, UNNEST(string_split(phrase, ' ')) AS t(w)
    ), wscore AS MATERIALIZED (
      SELECT doc_id, w,
             (sum(plen)::BIGINT * {scale} // count(*))::BIGINT AS ws
      FROM words_all GROUP BY 1, 2
    ), dph AS MATERIALIZED (
      SELECT doc_id, phrase, count(*)::BIGINT AS n_occ,
             min(plen)::BIGINT AS n_words
      FROM capped GROUP BY 1, 2
    ), phw AS (
      SELECT doc_id, phrase, t.w
      FROM dph, UNNEST(string_split(phrase, ' ')) AS t(w)
    ), scored AS (
      SELECT p.doc_id, p.phrase, sum(s.ws)::BIGINT AS score_ppm
      FROM phw p JOIN wscore s ON s.doc_id = p.doc_id AND s.w = p.w
      GROUP BY 1, 2
    )
    SELECT d.doc_id, d.phrase, d.n_words, d.n_occ, s.score_ppm
    FROM dph d JOIN scored s ON s.doc_id = d.doc_id AND s.phrase = d.phrase
    """


def q_tables_kg(spark, sf_dir):
    """THE WebTables-to-KG composition: synthesized crawl HTML -> first-
    table cell harvest -> declared-header pivot -> declarative mapping ->
    fused typed edges. Exercises extract_html_tables, table_rows_to_frame
    and the weave engine end to end; closed-form edge oracle."""
    from ontoweaver_spark import weave
    from ontoweaver_spark.webdoc import extract_html_tables, table_rows_to_frame

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body><table><tr><th>source</th><th>chars</th></tr><tr><td>'),
        F.col("source"), F.lit("</td><td>"), F.col("n_chars").cast("string"),
        F.lit("</td></tr><tr><td>l &amp; "), F.col("lang"),
        F.lit("</td><td><i>"), (i % 7).cast("string"),
        F.lit("</i></td></tr></table></body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://x.test/"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    frame = table_rows_to_frame(
        extract_html_tables(pages), ["source", "chars"]
    ).withColumn(
        "rid", F.concat("url", F.lit("#"), F.col("row_idx").cast("string"))
    )
    mapping = {
        "row": {"map": {"id_from_column": "rid", "to_subject": "table_row"}},
        "transformers": [
            {"map": {"column": "source", "to_object": "source",
                     "via_relation": "from_source"}},
            {"map": {"column": "chars", "to_properties": ["chars"]}},
        ],
    }
    _, fedges = weave(frame, mapping, affix="suffix")
    return fedges.select("src", "dst", F.col("label").alias("elabel"))


def q_kg_refex(spark, sf_dir):
    """ReFeX recursive role features (2 rounds, 14 exact-BIGINT columns)
    over the sparse doc graph — the RolX feature stage; equal vectors =
    same structural role. Oracle unrolls the same neighbor-sum rounds."""
    from ontoweaver_spark.graphstats import refex_features

    _tune(spark)
    return refex_features(_doc_graph(spark, sf_dir), rounds=2)


def _refex_sql(rounds: int = 2) -> str:
    body = f"""
    WITH raw AS MATERIALIZED (
      {_doc_graph_sql()}
    ), e AS MATERIALIZED (
      SELECT DISTINCT src AS u, dst AS v FROM raw WHERE src <> dst
    ), nodes AS (
      SELECT u AS node FROM e UNION SELECT v FROM e
    ), f0 AS MATERIALIZED (
      SELECT n.node,
             coalesce(o.od, 0)::BIGINT AS od,
             coalesce(i.ind, 0)::BIGINT AS ind
      FROM nodes n
      LEFT JOIN (SELECT u AS node, count(*) AS od FROM e GROUP BY 1) o
        ON o.node = n.node
      LEFT JOIN (SELECT v AS node, count(*) AS ind FROM e GROUP BY 1) i
        ON i.node = n.node
    )"""
    all_cols = ["od", "ind"]
    new_cols = ["od", "ind"]
    for r in range(1, rounds + 1):
        os_aggs = ", ".join(
            f"sum(p.{c})::BIGINT AS os_{c}" for c in new_cols
        )
        is_aggs = ", ".join(
            f"sum(p.{c})::BIGINT AS is_{c}" for c in new_cols
        )
        minted = [f"os_{c}" for c in new_cols] + [f"is_{c}" for c in new_cols]
        keep = ", ".join(f"f.{c}" for c in all_cols)
        fill = ", ".join(
            f"coalesce({'o' if m.startswith('os_') else 'i'}.{m}, 0)::BIGINT"
            f" AS {m}"
            for m in minted
        )
        body += f""", o{r} AS MATERIALIZED (
      SELECT e.u AS node, {os_aggs} FROM e
      JOIN f{r - 1} p ON p.node = e.v GROUP BY 1
    ), i{r} AS MATERIALIZED (
      SELECT e.v AS node, {is_aggs} FROM e
      JOIN f{r - 1} p ON p.node = e.u GROUP BY 1
    ), f{r} AS MATERIALIZED (
      SELECT f.node, {keep}, {fill}
      FROM f{r - 1} f
      LEFT JOIN o{r} o ON o.node = f.node
      LEFT JOIN i{r} i ON i.node = f.node
    )"""
        all_cols += minted
        new_cols = minted
    return body + f"""
    SELECT * FROM f{rounds}
    """


def q_kg_label_prop(spark, sf_dir):
    """Seeded label propagation (3 monotone rounds, exact-integer
    majority votes, deterministic tie-breaks) over the doc graph: 20
    seed nodes typed T0/T1/T2 spread through the link structure — the
    semi-supervised KG type-completion op."""
    from ontoweaver_spark.graphstats import propagate_labels

    _tune(spark)
    docs = _docs(spark, sf_dir)
    seeds = docs.where(F.col("doc_id") % 25 == 0).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("node"),
        F.concat(F.lit("T"), (F.col("doc_id") % 3).cast("string")).alias("label"),
    )
    return propagate_labels(_doc_graph(spark, sf_dir), seeds, rounds=3)


def _label_prop_sql(rounds: int = 3) -> str:
    body = f"""
    WITH raw AS MATERIALIZED (
      {_doc_graph_sql()}
    ), und AS MATERIALIZED (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM raw
        UNION ALL SELECT dst, src FROM raw
      ) WHERE a <> b
    ), lab0 AS MATERIALIZED (
      SELECT 'n' || doc_id::VARCHAR AS node,
             'T' || (doc_id % 3)::VARCHAR AS label,
             0 AS round_assigned
      FROM documents WHERE doc_id % 25 = 0
    )"""
    for r in range(1, rounds + 1):
        body += f""", v{r} AS MATERIALIZED (
      SELECT e.b AS node, l.label, count(*)::BIGINT AS cnt
      FROM und e
      JOIN lab{r - 1} l ON l.node = e.a
      WHERE e.b NOT IN (SELECT node FROM lab{r - 1})
      GROUP BY 1, 2
    ), n{r} AS MATERIALIZED (
      SELECT node, label, {r} AS round_assigned FROM (
        SELECT node, label,
               row_number() OVER (
                 PARTITION BY node ORDER BY cnt DESC, label ASC
               ) AS rk
        FROM v{r}
      ) WHERE rk = 1
    ), lab{r} AS MATERIALIZED (
      SELECT * FROM lab{r - 1} UNION ALL SELECT * FROM n{r}
    )"""
    return body + f"""
    SELECT node, label, round_assigned FROM lab{rounds}
    """


def q_zorder(spark, sf_dir):
    """Morton/Z-order layout keys over (n_chars, doc_id mod 512) — the
    multi-dimensional data-skipping sort key for lakehouse writes; pure
    BIGINT shift/mask arithmetic, oracle-identical in any engine."""
    from ontoweaver_spark.layout import zorder_key

    _tune(spark)
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        zorder_key(
            [F.col("n_chars"), (F.col("doc_id") % 512)], bits=16
        ).alias("zkey"),
    )


def _zorder_sql(bits: int = 16) -> str:
    top = (1 << bits) - 1
    exprs = {"n_chars": 0, "(doc_id % 512)": 1}
    terms = []
    for col, j in exprs.items():
        clamped = f"least(greatest({col}::BIGINT, 0), {top})"
        for i in range(bits):
            terms.append(f"((({clamped} >> {i}) & 1) << {i * 2 + j})")
    return f"""
    SELECT doc_id, ({' + '.join(terms)})::BIGINT AS zkey FROM documents
    """


def q_judge_agreement(spark, sf_dir):
    """Cohen's kappa between two synthetic annotators (B flips A's label
    on every 5th doc): chance-corrected agreement as exact rational ppm
    — the labeling-pipeline QA rollup (LLM-judge vs gold)."""
    from ontoweaver_spark.textops import annotator_agreement

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    a = F.concat(F.lit("L"), (i % 4).cast("string"))
    b = F.when(i % 5 == 0, F.concat(F.lit("L"), ((i + 1) % 4).cast("string"))).otherwise(a)
    return annotator_agreement(
        docs.select(a.alias("label_a"), b.alias("label_b"))
    )


_SPOT_GAZ = [
    ("table value", "E1"),
    ("value", "E2"),
    ("row fast merge", "E3"),
    ("hash", "E4"),
    ("fast merge", "E5"),
]


def q_spot_mentions(spark, sf_dir):
    """Gazetteer mention spotting over raw document text: multi-word
    surface forms found as token n-grams (n<=3), broadcast dictionary
    join, maximal-match overlap policy ('fast merge' never fires inside
    'row fast merge'). The extraction step before entity linking."""
    from ontoweaver_spark.linking import spot_mentions

    _tune(spark)
    gaz = spark.createDataFrame(_SPOT_GAZ, ["surface", "entity_id"])
    return spot_mentions(_docs(spark, sf_dir), gaz, max_len=3)


def _spot_sql(max_len: int = 3) -> str:
    gaz_rows = ", ".join(f"('{s}', '{e}')" for s, e in _SPOT_GAZ)
    gram_selects = []
    for n in range(1, max_len + 1):
        gram_selects.append(f"""
      SELECT doc_id, t.i AS pos, {n} AS n_tokens,
             array_to_string(list_slice(l, t.i, t.i + {n - 1}), ' ') AS surface
      FROM toks, UNNEST(range(1, greatest(len(l) - {n - 1}, 0) + 1)) AS t(i)""")
    grams = "\n      UNION ALL".join(gram_selects)
    return rf"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             regexp_split_to_array(
               trim(regexp_replace(lower(text), '[^a-z0-9\s]+', ' ', 'g')),
               '\s+') AS l
      FROM documents
    ), gaz(surface, entity_id) AS (
      VALUES {gaz_rows}
    ), grams AS MATERIALIZED ({grams}
    ), hits AS MATERIALIZED (
      SELECT g.doc_id, g.pos, g.n_tokens, g.surface, z.entity_id
      FROM grams g JOIN gaz z USING (surface)
    )
    SELECT h.doc_id, h.pos, h.n_tokens, h.surface, h.entity_id
    FROM hits h
    WHERE NOT EXISTS (
      SELECT 1 FROM hits o
      WHERE o.doc_id = h.doc_id AND o.pos <= h.pos
        AND o.pos + o.n_tokens >= h.pos + h.n_tokens
        AND o.n_tokens > h.n_tokens
    )
    """


def q_readability(spark, sf_dir):
    """Flesch-Kincaid readability per document, exact-integer ppm grade
    (vowel-group syllable proxy, truncating BIGINT divisions) — the
    corpus-curation quality gate."""
    from ontoweaver_spark.textops import readability

    _tune(spark)
    return readability(_docs(spark, sf_dir))


def q_kg_onion(spark, sf_dir):
    """Onion decomposition (k-core peeling order) of the doc graph: 20
    branch-free rounds thread the (k, layer) state as a broadcast 1-row
    frame, so the run unrolls verbatim into the SQL oracle. Layer
    separates fringe from center within a core."""
    from ontoweaver_spark.graphstats import onion_layers

    _tune(spark)
    return onion_layers(_doc_graph(spark, sf_dir), rounds=20)


def _onion_sql(rounds: int = 20) -> str:
    body = f"""
    WITH raw AS MATERIALIZED (
      {_doc_graph_sql()}
    ), und AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    ), both_e AS MATERIALIZED (
      SELECT a, b FROM und UNION ALL SELECT b, a FROM und
    ), rem0 AS MATERIALIZED (
      SELECT a AS node FROM und UNION SELECT b FROM und
    ), st0 AS (SELECT 1 AS k, 0 AS layer)"""
    for r in range(1, rounds + 1):
        p = r - 1
        body += f""", live{r} AS (
      SELECT e.a, e.b FROM both_e e
      JOIN rem{p} r1 ON r1.node = e.a
      JOIN rem{p} r2 ON r2.node = e.b
    ), dg{r} AS MATERIALIZED (
      SELECT r.node, coalesce(d.deg, 0) AS deg
      FROM rem{p} r
      LEFT JOIN (SELECT a AS node, count(*) AS deg FROM live{r} GROUP BY 1) d
        ON d.node = r.node
    ), s{r} AS MATERIALIZED (
      SELECT node FROM dg{r}, st{p} WHERE deg <= k
    ), out{r} AS MATERIALIZED (
      SELECT node, k::BIGINT AS core, (layer + 1)::BIGINT AS layer
      FROM s{r}, st{p}
    ), ns{r} AS (SELECT count(*) AS ns FROM s{r}
    ), st{r} AS MATERIALIZED (
      SELECT CASE WHEN ns = 0 THEN k + 1 ELSE k END AS k,
             CASE WHEN ns = 0 THEN layer ELSE layer + 1 END AS layer
      FROM st{p}, ns{r}
    ), rem{r} AS MATERIALIZED (
      SELECT node FROM rem{p}
      WHERE node NOT IN (SELECT node FROM s{r})
    )"""
    unions = "\n      UNION ALL ".join(
        f"SELECT * FROM out{r}" for r in range(1, rounds + 1)
    )
    return body + f"""
    {unions}
    """


def q_textrank(spark, sf_dir):
    """TextRank keyword salience: every document's co-occurrence graph
    ranked in ONE corpus-wide exact-BIGINT PageRank over doc#word nodes
    (window 2, 3 iterations). RAKE's single-word sibling."""
    from ontoweaver_spark.textops import textrank_keywords

    _tune(spark)
    return textrank_keywords(_docs(spark, sf_dir), window=2, iterations=3)


def _textrank_sql(window: int = 2, iterations: int = 3,
                  scale: int = 1_000_000, damping: int = 85) -> str:
    from ontoweaver_spark.textops import STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    teleport = (100 - damping) * scale // 100
    pair_selects = []
    for o in range(1, window + 1):
        pair_selects.append(f"""
      SELECT doc || '#' || l[t.i] AS src, doc || '#' || l[t.i + {o}] AS dst
      FROM toks, UNNEST(range(1, greatest(len(l) - {o}, 0) + 1)) AS t(i)""")
    pairs = "\n      UNION ALL".join(pair_selects)
    body = rf"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id::VARCHAR AS doc,
             list_filter(
               regexp_split_to_array(
                 trim(regexp_replace(lower(text), '[^a-z0-9\s]+', ' ', 'g')),
                 '\s+'),
               w -> w <> '' AND w NOT IN ({stoplist})) AS l
      FROM documents
    ), p0 AS ({pairs}
    ), e0 AS (SELECT src, dst FROM p0 WHERE src <> dst
    ), e AS MATERIALIZED (
      SELECT DISTINCT s, d FROM (
        SELECT src AS s, dst AS d FROM e0
        UNION ALL SELECT dst, src FROM e0
      )
    ), outd AS MATERIALIZED (
      SELECT s, count(*) AS od FROM e GROUP BY s
    ), nodes AS MATERIALIZED (
      SELECT s AS node FROM e UNION SELECT d FROM e
    ), r0 AS MATERIALIZED (
      SELECT node, {scale}::BIGINT AS "rank" FROM nodes
    )"""
    for i in range(1, iterations + 1):
        body += f""", r{i} AS MATERIALIZED (
      SELECT n.node,
             ({teleport} + ({damping} * coalesce(t.inb, 0)) // 100)::BIGINT
               AS "rank"
      FROM nodes n LEFT JOIN (
        SELECT e.d AS node, sum(r."rank" // o.od) AS inb
        FROM e JOIN outd o ON e.s = o.s JOIN r{i - 1} r ON r.node = e.s
        GROUP BY e.d
      ) t ON t.node = n.node
    )"""
    return body + f"""
    SELECT split_part(node, '#', 1) AS doc_id,
           split_part(node, '#', 2) AS word, "rank"
    FROM r{iterations}
    """


def q_k_anonymity(spark, sf_dir):
    """k-anonymity governance rollup over quasi-identifiers
    (lang, source, doc_id mod 40): equivalence classes below k=5 and the
    rows they expose — the post-PII-scrub structural re-identification
    check."""
    from ontoweaver_spark.validate import k_anonymity_report

    _tune(spark)
    docs = _docs(spark, sf_dir).withColumn("bucket", F.col("doc_id") % 40)
    return k_anonymity_report(docs, ["lang", "source", "bucket"], k=5)


def q_url_features(spark, sf_dir):
    """Structural URL features over synthesized crawl URLs (scheme,
    host, path depth/length, query params, fragment) — frontier
    prioritization signals; closed-form oracle from the construction."""
    from ontoweaver_spark.urls import url_features

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://h"), (i % 7).cast("string"), F.lit(".example"),
        F.when(i % 3 == 0, F.lit(""))
        .when(i % 3 == 1, F.concat(F.lit("/p"), i.cast("string")))
        .otherwise(F.concat(F.lit("/p/"), i.cast("string"))),
        F.when(i % 4 == 0, F.concat(F.lit("?x=1&y="), F.col("lang")))
        .otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return url_features(docs.select("doc_id", url.alias("url")))


def q_triples_graph(spark, sf_dir):
    """Harvest-to-graph bridge: embedded JSON-LD triples from synthesized
    pages -> typed nodes + declared-relation edges + property rows, all
    unioned into one auditable frame (kind column). Closes the loop from
    the HTML harvesters into the engine's graph shape."""
    from ontoweaver_spark.ontology import graph_from_triples
    from ontoweaver_spark.webdoc import extract_embedded_jsonld

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    ld = F.concat(
        F.lit('{"@id":"doc'), i.cast("string"),
        F.lit('","@type":"Article","about":"ent'), (i % 40).cast("string"),
        F.lit('","name":"n '), (i % 9).cast("string"), F.lit('"}'),
    )
    pages = docs.select(
        F.concat(F.lit("https://x.test/"), i.cast("string")).alias("url"),
        F.concat(
            F.lit('<html><head><script type="application/ld+json">'), ld,
            F.lit("</script></head><body></body></html>"),
        ).alias("html"),
    )
    nodes, edges, props = graph_from_triples(
        extract_embedded_jsonld(pages), relation_predicates=["about"]
    )
    return (
        nodes.select(F.lit("node").alias("kind"), F.col("id").alias("a"),
                     F.col("label").alias("b"), F.lit("").alias("c"))
        .unionByName(
            edges.select(F.lit("edge").alias("kind"), F.col("src").alias("a"),
                         F.col("dst").alias("b"), F.col("label").alias("c")))
        .unionByName(
            props.select(F.lit("prop").alias("kind"), F.col("id").alias("a"),
                         F.col("key").alias("b"), F.col("value").alias("c")))
    )


def q_kg_bowtie(spark, sf_dir):
    """Bow-tie decomposition (Broder WWW'00) of a planted web graph:
    8-cycle CORE, IN/OUT chains, a core-bypassing TUBE, TENDRILs off
    both sides, a DISCONNECTED pair. The oracle is fully closed-form —
    an independent derivation of every region from the construction."""
    from ontoweaver_spark.graphstats import bowtie_decomposition

    _tune(spark)
    docs = _docs(spark, sf_dir)
    m = (F.col("doc_id") % 50).cast("long")

    def lbl(p, mod):
        return F.concat(F.lit(p), (m % mod).cast("string"))

    pairs = [
        (lbl("c", 8), F.concat(F.lit("c"), ((m + 1) % 8).cast("string"))),
        (lbl("a", 12), lbl("c", 8)),
        (lbl("b", 12), lbl("a", 12)),
        (lbl("c", 8), lbl("x", 10)),
        (lbl("x", 10), lbl("y", 10)),
        (lbl("a", 12), lbl("t", 6)),
        (lbl("t", 6), lbl("x", 10)),
        (lbl("a", 12), lbl("n", 5)),
        (lbl("w", 5), lbl("y", 10)),
        (lbl("d", 4), lbl("e", 4)),
    ]
    e = None
    for s, d in pairs:
        part = docs.select(s.alias("src"), d.alias("dst"))
        e = part if e is None else e.unionByName(part)
    # planted diameters are <= 3 and two trim rounds peel everything
    # acyclic, so the budgets are sized to the construction (the oracle
    # is closed-form; budgets only need to COVER, timing showed 6.5 s ->
    # ~halved with right-sized rounds)
    return bowtie_decomposition(e, rounds=4, scc_trim_rounds=4)


def q_script_profile(spark, sf_dir):
    """Unicode-script routing profile over synthesized multilingual text
    (Latin / Cyrillic / CJK / mixed by doc_id mod 4): exact ppm ratios
    per script block + deterministic dominant-script argmax."""
    from ontoweaver_spark.textops import script_profile

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    text = (
        F.when(i % 4 == 0, F.col("text"))
        .when(i % 4 == 1, F.concat(F.lit("текст ряд "), (i % 9).cast("string")))
        .when(i % 4 == 2, F.lit("漢字テキスト"))
        .otherwise(F.concat(F.lit("abc οπτ "), (i % 7).cast("string")))
    )
    return script_profile(docs.select("doc_id", text.alias("text")))


def _script_profile_sql(scale: int = 1_000_000) -> str:
    from ontoweaver_spark.textops import _SCRIPT_RANGES

    synth = """
      SELECT doc_id,
             CASE
               WHEN doc_id % 4 = 0 THEN text
               WHEN doc_id % 4 = 1 THEN 'текст ряд ' || (doc_id % 9)::VARCHAR
               WHEN doc_id % 4 = 2 THEN '漢字テキスト'
               ELSE 'abc οπτ ' || (doc_id % 7)::VARCHAR
             END AS t
      FROM documents"""
    ppm_cols = []
    for name, pat in _SCRIPT_RANGES:
        ppm_cols.append(
            f"CASE WHEN length(t) > 0 THEN"
            f" len(regexp_extract_all(t, '{pat}')) * {scale} // length(t)"
            f" ELSE 0 END::BIGINT AS {name}_ppm"
        )
    dom = "CASE "
    # argmax with table order as tie-break: later entries win only on
    # STRICT improvement, so evaluate in reverse with greatest-chain...
    # simplest faithful mirror: nested CASE over running best
    cond = []
    for idx, (name, _) in enumerate(_SCRIPT_RANGES):
        earlier = [f"{n2}_ppm" for n2, _ in _SCRIPT_RANGES[:idx]]
        later = [f"{n2}_ppm" for n2, _ in _SCRIPT_RANGES[idx + 1:]]
        conds = [f"{name}_ppm > 0"]
        conds += [f"{name}_ppm > {e}" for e in earlier]
        conds += [f"{name}_ppm >= {l}" for l in later]
        cond.append(f"WHEN {' AND '.join(conds)} THEN '{name}'")
    dom += " ".join(cond) + " ELSE 'none' END AS dominant_script"
    return f"""
    WITH synth AS MATERIALIZED ({synth}
    ), p AS MATERIALIZED (
      SELECT doc_id, length(t)::BIGINT AS n_chars,
             {', '.join(ppm_cols)}
      FROM synth
    )
    SELECT doc_id, n_chars,
           {', '.join(f'{name}_ppm' for name, _ in _SCRIPT_RANGES)},
           {dom}
    FROM p
    """


def q_table_types(spark, sf_dir):
    """WebTables column-type inference over synthesized 2-row tables:
    integer column, mixed int+decimal column -> decimal, a date column
    polluted to 50% (below the 60% threshold) -> string, and a text
    column. Closed-form oracle."""
    from ontoweaver_spark.webdoc import extract_html_tables, infer_table_column_types

    _tune(spark)
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    html = F.concat(
        F.lit("<html><body><table>"
              "<tr><th>n</th><th>d</th><th>t</th><th>s</th></tr><tr><td>"),
        F.col("n_chars").cast("string"), F.lit("</td><td>"),
        (i % 90).cast("string"), F.lit(".5</td><td>2024-01-0"),
        (1 + i % 9).cast("string"), F.lit("</td><td>"),
        F.col("source"), F.lit("</td></tr><tr><td>"),
        i.cast("string"), F.lit("</td><td>"),
        (i % 7).cast("string"), F.lit(".25</td><td>n/a</td><td>"),
        F.col("lang"),
        F.lit("</td></tr></table></body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://x.test/"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return infer_table_column_types(extract_html_tables(pages))


def q_kg_shacl(spark, sf_dir):
    """SHACL-lite node-shape validation over a typed doc graph with
    PLANTED violations: every 7th doc has no in_language edge
    (min_count), every 11th (and not 7th) carries a second edge aimed at
    its source node (max_count + object_class), every 13th doc's n_chars
    property is letter-prefixed (pattern), and es/zh docs violate the
    lang allowed-set. Oracle: the same plantings as CTEs + UNION ALL of
    per-kind group-bys/filters."""
    from ontoweaver_spark.validate import shacl_validate

    _tune(spark)
    docs = _docs(spark, sf_dir)
    did = F.concat(F.lit("d"), F.col("doc_id").cast("string"))
    nodes = (
        docs.select(did.alias("id"), F.lit("document").alias("label"))
        .unionAll(docs.select(F.col("lang").alias("id"),
                              F.lit("language").alias("label")))
        .unionAll(docs.select(F.col("source").alias("id"),
                              F.lit("source").alias("label")))
        .distinct()
    )
    edges = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select(did.alias("src"), F.col("lang").alias("dst"),
                F.lit("in_language").alias("label"))
        .unionAll(
            docs.where((F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 7 != 0))
            .select(did.alias("src"), F.col("source").alias("dst"),
                    F.lit("in_language").alias("label"))
        )
    )
    props = (
        docs.select(
            did.alias("id"), F.lit("n_chars").alias("key"),
            F.when(F.col("doc_id") % 13 == 0,
                   F.concat(F.lit("c"), F.col("n_chars").cast("string")))
            .otherwise(F.col("n_chars").cast("string")).alias("value"))
        .unionAll(docs.select(did.alias("id"), F.lit("lang").alias("key"),
                              F.col("lang").alias("value")))
    )
    shapes = [
        {"shape": "DocShape", "target_class": "document",
         "path": "in_language", "min_count": 1, "max_count": 1,
         "object_class": "language"},
        {"shape": "DocShape", "target_class": "document",
         "key": "n_chars", "pattern": "^[0-9]+$"},
        {"shape": "DocShape", "target_class": "document",
         "key": "lang", "values": ["en", "de", "fr"]},
    ]
    return shacl_validate(nodes, edges, shapes, props=props)


def q_kg_functional(spark, sf_dir):
    """owl:FunctionalProperty audit: 100 entities each asserting the
    langs/sources of their docs as birth_date / canonical_url claims —
    subjects with >1 distinct object per functional predicate are the
    conflict measure resolve_claims later votes away. Oracle: filtered
    distinct-count group-by."""
    from ontoweaver_spark.ontology import functional_violations

    _tune(spark)
    docs = _docs(spark, sf_dir)
    ent = F.concat(F.lit("e"), (F.col("doc_id") % 100).cast("string"))
    edges = (
        docs.select(ent.alias("src"), F.col("lang").alias("dst"),
                    F.lit("birth_date").alias("label"))
        .unionAll(docs.select(ent.alias("src"), F.col("source").alias("dst"),
                              F.lit("canonical_url").alias("label")))
        .unionAll(docs.select(ent.alias("src"), F.col("source").alias("dst"),
                              F.lit("mentions").alias("label")))
    )
    return functional_violations(edges, ["birth_date", "canonical_url"])


def q_kg_ifp(spark, sf_dir):
    """owl:InverseFunctionalProperty sameAs candidates: docs sharing an
    ISBN residue (doc_id % 250) pair up; every 50th doc also asserts the
    placeholder 'isbn:unknown', whose group blows past max_group=20 at
    sf0.1 and is dropped by the skew guard (kept at smaller sf — the
    guard itself is part of the checked semantics). Oracle: group-size-
    filtered self-join."""
    from ontoweaver_spark.ontology import ifp_sameas_candidates

    _tune(spark)
    docs = _docs(spark, sf_dir)
    sub = F.concat(F.lit("a"), F.col("doc_id").cast("string"))
    edges = (
        docs.select(
            sub.alias("src"),
            F.concat(F.lit("isbn:"),
                     (F.col("doc_id") % 250).cast("string")).alias("dst"),
            F.lit("has_isbn").alias("label"))
        .unionAll(
            docs.where(F.col("doc_id") % 50 == 0)
            .select(sub.alias("src"), F.lit("isbn:unknown").alias("dst"),
                    F.lit("has_isbn").alias("label")))
        .unionAll(
            docs.select(sub.alias("src"), F.col("source").alias("dst"),
                        F.lit("from_source").alias("label")))
    )
    return ifp_sameas_candidates(edges, ["has_isbn"], max_group=20)


def q_er_blocking_eval(spark, sf_dir):
    """Blocking-quality rollup: records blocked on doc_id DIV 4 (all
    within-block pairs become candidates), gold = consecutive-id pairs —
    the 1-in-4 gold pair that straddles a block boundary is the planted
    recall loss, so pair_completeness lands near 750000 ppm, not 10^6.
    Oracle: the same block self-join + scalar-subquery arithmetic."""
    from ontoweaver_spark.linking import blocking_metrics

    _tune(spark)
    docs = _docs(spark, sf_dir)
    n = docs.count()
    rec = docs.select(
        F.concat(F.lit("p"), F.col("doc_id").cast("string")).alias("rid"),
        F.expr("doc_id div 4").alias("blk"),
        F.col("doc_id").alias("i"),
    )
    a = rec.select(F.col("rid").alias("a"), "blk", F.col("i").alias("ia"))
    b = rec.select(F.col("rid").alias("b"), "blk", F.col("i").alias("ib"))
    cand = a.join(b, "blk").where(F.col("ia") < F.col("ib")).select("a", "b")
    gold = rec.where(F.col("i") < n - 1).select(
        F.col("rid").alias("a"),
        F.concat(F.lit("p"), (F.col("i") + 1).cast("string")).alias("b"),
    )
    return blocking_metrics(cand, gold, n_records=n)


def q_er_fold_keys(spark, sf_dir):
    """Accent-folded ER blocking keys: five accented surname templates
    crossed with the 20 sources, folded via the vendored translate map
    and counted per folded key — the group sizes ARE the blocking-key
    histogram. Oracle: DuckDB strip_accents on the identical
    construction (the fold table is generated from strip_accents, so
    agreement is by construction and the hash proves it)."""
    from ontoweaver_spark.linking import fold_diacritics

    _tune(spark)
    docs = _docs(spark, sf_dir)
    names = F.array(*[F.lit(s) for s in
                      ["Renée", "Černý", "François", "Müller", "Ibáñez"]])
    name = F.concat(
        F.element_at(names, (F.col("doc_id") % 5 + 1).cast("int")),
        F.lit(" "), F.col("source"),
    )
    return (
        docs.select(fold_diacritics(name).alias("folded_key"))
        .groupBy("folded_key")
        .agg(F.count("*").alias("n"))
    )


def q_kg_spam_mass(spark, sf_dir):
    """Spam-mass demotion over a 500-node residue link graph (every node
    links 3r+1, even nodes also 7r+3; trusted seeds = the 20 nodes with
    r%25==0): rank minus seed-personalized rank, exact-integer ppm.
    Oracle: BOTH 4-round recurrences unrolled as MATERIALIZED CTEs plus
    the same scalar-subquery mass rescale."""
    from ontoweaver_spark.graphstats import spam_mass

    _tune(spark)
    docs = _docs(spark, sf_dir)
    r = F.col("doc_id") % 500

    def d(c):
        return F.concat(F.lit("d"), c.cast("string"))

    edges = (
        docs.select(d(r).alias("src"), d((r * 3 + 1) % 500).alias("dst"))
        .unionAll(
            docs.where(r % 2 == 0)
            .select(d(r).alias("src"), d((r * 7 + 3) % 500).alias("dst")))
    )
    seeds = docs.where(r % 25 == 0).select(d(r).alias("node")).distinct()
    return spam_mass(edges, seeds, iterations=4)


def q_kg_partition_quality(spark, sf_dir):
    """Hybrid vertex-cut placement scored: a planted crawl hub ('H' links
    every doc) plus a 500-node tail graph, assigned by
    assign_edge_partitions (hash(src) for normal srcs, hash(src)+hash(dst)
    spread for hubs) and rolled into balance/replication ppm. Oracle: the
    same md5-hex hashing + CASE placement + two rollups in SQL."""
    from ontoweaver_spark.graphstats import (
        assign_edge_partitions,
        partition_quality,
    )

    _tune(spark)
    docs = _docs(spark, sf_dir)
    did = F.concat(F.lit("d"), F.col("doc_id").cast("string"))
    tail_src = F.concat(F.lit("d"), (F.col("doc_id") % 500).cast("string"))
    tail_dst = F.concat(
        F.lit("d"), ((F.col("doc_id") * 3 + 1) % 500).cast("string")
    )
    edges = (
        docs.select(F.lit("H").alias("src"), did.alias("dst"))
        .unionAll(docs.select(tail_src.alias("src"), tail_dst.alias("dst")))
    )
    assigned = assign_edge_partitions(edges, num_partitions=16, hub_threshold=50)
    return partition_quality(assigned, num_partitions=16)


def q_kg_profile(spark, sf_dir):
    """Completeness profile of the planted doc graph (same plantings as
    kg_shacl: language edge missing for every 7th doc, a second
    in_language edge for every 11th): per-class per-path fill rates,
    occurrence totals and distinct-value counts — the numbers that tell
    you WHICH shapes to declare. Oracle: closed-form group-bys over the
    same plantings."""
    from ontoweaver_spark.ontology import class_property_profile

    _tune(spark)
    docs = _docs(spark, sf_dir)
    did = F.concat(F.lit("d"), F.col("doc_id").cast("string"))
    nodes = (
        docs.select(did.alias("id"), F.lit("document").alias("label"))
        .unionAll(docs.select(F.col("lang").alias("id"),
                              F.lit("language").alias("label")))
        .distinct()
    )
    edges = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select(did.alias("src"), F.col("lang").alias("dst"),
                F.lit("in_language").alias("label"))
        .unionAll(
            docs.where((F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 7 != 0))
            .select(did.alias("src"), F.col("source").alias("dst"),
                    F.lit("in_language").alias("label")))
        .unionAll(docs.select(did.alias("src"), F.col("source").alias("dst"),
                              F.lit("from_source").alias("label")))
    )
    props = docs.select(did.alias("id"), F.lit("n_chars").alias("key"),
                        F.col("n_chars").cast("string").alias("value"))
    return class_property_profile(nodes, edges=edges, props=props)


def q_kg_charsets(spark, sf_dir):
    """Characteristic sets of a harvested triple pile: every doc asserts
    name, every 2nd adds isbn, every 3rd adds url -> four emergent
    subject classes with exact member counts. Oracle: DISTINCT + ordered
    string_agg + group-by."""
    from ontoweaver_spark.ontology import characteristic_sets

    _tune(spark)
    docs = _docs(spark, sf_dir)
    did = F.concat(F.lit("d"), F.col("doc_id").cast("string"))
    triples = (
        docs.select(did.alias("subject"), F.lit("name").alias("predicate"))
        .unionAll(docs.where(F.col("doc_id") % 2 == 0)
                  .select(did.alias("subject"), F.lit("isbn").alias("predicate")))
        .unionAll(docs.where(F.col("doc_id") % 3 == 0)
                  .select(did.alias("subject"), F.lit("url").alias("predicate")))
    )
    return characteristic_sets(triples)


def q_er_bcubed(spark, sf_dir):
    """B-cubed scoring of a deliberately mis-granular clustering:
    predicted clusters = doc_id div 4 blocks vs gold = div 5 blocks —
    the 4/5 lattice yields every overlap size 1..4, exercising both
    truncated averages. Oracle: the same three group-bys + per-record
    ppm arithmetic in SQL."""
    from ontoweaver_spark.linking import bcubed_metrics

    _tune(spark)
    docs = _docs(spark, sf_dir)
    rid = F.concat(F.lit("p"), F.col("doc_id").cast("string"))
    pred = docs.select(rid.alias("id"), F.concat(
        F.lit("b"), F.expr("doc_id div 4").cast("string")).alias("cluster"))
    gold = docs.select(rid.alias("id"), F.concat(
        F.lit("g"), F.expr("doc_id div 5").cast("string")).alias("cluster"))
    return bcubed_metrics(pred, gold)


def q_change_rate(spark, sf_dir):
    """Recrawl change-rate estimation (Cho & Garcia-Molina freshness
    model): five deterministic snapshots per url (value flips at
    snapshot doc_id%4, then flips back at snapshot 4 for doc_id%3==0)
    yield every (n_changes in 0..2) case; staleness_ppm ranks the
    refetch plan at as_of=9. Exact-integer ratios only."""
    from ontoweaver_spark.sessions import change_rate

    _tune(spark)
    docs = _docs(spark, sf_dir)
    snaps = docs.select(
        "doc_id",
        "source",
        F.explode(F.array(*[F.lit(k) for k in range(5)])).alias("k"),
    ).select(
        F.concat(
            F.lit("https://crawl."), F.col("source"), F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("k").cast("long").alias("ts"),
        F.when(
            (F.col("k") == 4) & (F.col("doc_id") % 3 == 0), F.lit("a")
        )
        .when(F.col("k") < F.col("doc_id") % 4, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("value"),
    )
    return change_rate(snaps, as_of=9)


_HEARST_WORDS = [
    "apple", "pear", "plum", "kiwi", "mango", "grape",
    "melon", "fig", "lime", "peach", "cherry", "lemon",
]


def q_hearst(spark, sf_dir):
    """Hearst-pattern hypernym harvest (is-a triples from raw sentence
    text — the COLING'92 KG bootstrap): five planted sentences per doc
    exercise every pattern (such_as / such_x_as / and_other / including
    / especially) over a deterministic word rotation, with the real
    ``text`` column appended so both engines also process realistic
    residue identically. Oracle: the byte-identical Java∩RE2 regex chain
    in DuckDB (regexp_extract_all groups + string_split_regex)."""
    from ontoweaver_spark.webdoc import hearst_hypernyms

    _tune(spark)
    docs = _docs(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(10)]
    planted = F.concat(
        F.lit("fruits such as "), w[0], F.lit(", "), w[1],
        F.lit(" and "), w[2],
        F.lit(". such tools as "), w[3], F.lit(" or "), w[4],
        F.lit(". "), w[5], F.lit(", "), w[6], F.lit(" and other metals"),
        F.lit(". cities, including "), w[7], F.lit(" and "), w[8],
        F.lit(". drinks, especially "), w[9],
        F.lit(". "), F.col("text"),
    )
    return hearst_hypernyms(
        docs.select("doc_id", planted.alias("text"))
    )


def q_meronym(spark, sf_dir):
    """Meronym-pattern part-whole harvest (part-of triples from raw
    sentence text — the Berland & Charniak ACL'99 complement of the
    Hearst is-a bootstrap): five planted sentences per doc exercise
    every frame (consists_of / composed_of / contains / part_of /
    member_of) over the same deterministic word rotation as q_hearst,
    with the real ``text`` column appended so both engines also process
    realistic residue identically. Oracle: the byte-identical Java∩RE2
    regex chain in DuckDB (patterns single-sourced via _meronym_sql)."""
    from ontoweaver_spark.webdoc import meronym_parts

    _tune(spark)
    docs = _docs(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(10)]
    planted = F.concat(
        F.lit("engine consists of "), w[0], F.lit(", "), w[1],
        F.lit(" and "), w[2],
        F.lit(". water is composed of "), w[3], F.lit(" and "), w[4],
        F.lit(". basket contains "), w[5], F.lit(", "), w[6],
        F.lit(". "), w[7], F.lit(", "), w[8],
        F.lit(" are parts of wagon. "),
        w[9], F.lit(" is a member of club. "),
        F.col("text"),
    )
    return meronym_parts(
        docs.select("doc_id", planted.alias("text"))
    )


def q_dates(spark, sf_dir):
    """Date-mention extraction + exact-integer epoch-day normalization
    (temporal qualifiers for harvested facts): four planted mentions per
    doc exercise every format (iso / us_text / eu_text / slash) over
    deterministic doc_id rotations that INCLUDE calendar-invalid dates
    (day 31 in 30-day months, month 13/14, a constant feb-30), so the
    exact days-in-month + leap validity filter is part of what the
    oracle checks; the real ``text`` column is appended so both engines
    also process realistic residue identically. Oracle: byte-identical
    regexes + the single-sourced Hinnant days-from-civil BIGINT
    arithmetic (textops._epoch_day_expr) in DuckDB."""
    from ontoweaver_spark.textops import _DATE_MONTHS, extract_dates

    _tune(spark)
    docs = _docs(spark, sf_dir)
    months = F.array(*[F.lit(s) for s in _DATE_MONTHS])
    did = F.col("doc_id")

    def mon(off: int) -> Column:
        return F.element_at(months, ((did + off) % 12 + 1).cast("int"))

    def pad2(c: Column) -> Column:
        return F.lpad(c.cast("string"), 2, "0")

    planted = F.concat(
        F.lit("logged "), (1990 + did % 40).cast("string"),
        F.lit("-"), pad2(1 + did % 12), F.lit("-"), pad2(1 + did % 28),
        F.lit(". posted "), mon(3), F.lit(" "),
        (1 + did % 31).cast("string"), F.lit(", "),
        (2000 + did % 25).cast("string"),
        F.lit(". seen "), (1 + (did * 7) % 31).cast("string"),
        F.lit(" "), mon(7), F.lit(" "), (1995 + did % 20).cast("string"),
        F.lit(". filed "), (1 + did % 14).cast("string"), F.lit("/"),
        (1 + (did * 3) % 31).cast("string"), F.lit("/"),
        (2010 + did % 10).cast("string"),
        F.lit(". bogus 2023-02-30. "), F.col("text"),
    )
    return extract_dates(docs.select("doc_id", planted.alias("text")))


def _dates_sql() -> str:
    """DuckDB mirror of q_dates: the SAME planted mentions and the
    byte-identical regex chain — patterns/groups, month table, validity
    filter and the Hinnant epoch-day arithmetic all single-sourced from
    ontoweaver_spark.textops so the two sides cannot drift."""
    from ontoweaver_spark.textops import (
        _DATE_MONTHS, _days_in_month_sql, _epoch_day_expr, DATE_PATTERNS,
    )

    months = ", ".join(f"'{m}'" for m in _DATE_MONTHS)

    def mon(off: int) -> str:
        return f"l[1 + (doc_id + {off}) % 12]"

    planted = (
        f"'logged ' || (1990 + doc_id % 40)::VARCHAR || '-' || "
        f"lpad((1 + doc_id % 12)::VARCHAR, 2, '0') || '-' || "
        f"lpad((1 + doc_id % 28)::VARCHAR, 2, '0') || "
        f"'. posted ' || {mon(3)} || ' ' || (1 + doc_id % 31)::VARCHAR || "
        f"', ' || (2000 + doc_id % 25)::VARCHAR || "
        f"'. seen ' || (1 + (doc_id * 7) % 31)::VARCHAR || ' ' || {mon(7)} || "
        f"' ' || (1995 + doc_id % 20)::VARCHAR || "
        f"'. filed ' || (1 + doc_id % 14)::VARCHAR || '/' || "
        f"(1 + (doc_id * 3) % 31)::VARCHAR || '/' || "
        f"(2010 + doc_id % 10)::VARCHAR || "
        f"'. bogus 2023-02-30. ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS fmt,
                     regexp_extract_all(tx, '{p}', {yg}) AS gy,
                     regexp_extract_all(tx, '{p}', {mg}) AS gm,
                     regexp_extract_all(tx, '{p}', {dg}) AS gd
              FROM t"""
        for name, (p, yg, mg, dg) in DATE_PATTERNS.items()
    )
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{months}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
{branches}
            ), z AS (
              SELECT doc_id, fmt, gy[g.i] AS ys, gm[g.i] AS ms, gd[g.i] AS ds
              FROM m, LATERAL unnest(generate_series(1, len(gy))) AS g(i)
            ), p AS (
              SELECT doc_id, fmt, ys::BIGINT AS y,
                     CASE WHEN regexp_matches(ms, '^\\d+$') THEN ms::BIGINT
                          ELSE list_position([{months}], ms)::BIGINT END AS m,
                     ds::BIGINT AS d
              FROM z
            ), v AS (
              SELECT * FROM p
              WHERE y >= 1 AND y <= 9999 AND m >= 1 AND m <= 12
                AND d >= 1 AND d <= {_days_in_month_sql("y", "m")}
            )
            SELECT DISTINCT doc_id, fmt, y, m, d,
                   {_epoch_day_expr("y", "m", "d", div="//")}::BIGINT
                     AS epoch_day
            FROM v
    """


def q_temporal_facts(spark, sf_dir):
    """Temporal fact composition — the harvested part-whole triples
    (q_meronym) qualified with their document's earliest normalized
    date (q_dates): the (subj, pred, obj, first_seen_day) slice a
    temporal KG ingests. Oracle: the two single-sourced SQL chains
    composed with the same doc-level min + inner join."""
    from ontoweaver_spark.webdoc import qualify_with_first_date

    return qualify_with_first_date(
        q_meronym(spark, sf_dir), q_dates(spark, sf_dir)
    )


def q_quantities(spark, sf_dir):
    """Quantity-mention extraction + exact-integer canonicalization
    (numeric property values for harvested facts): planted mentions per
    doc exercise both kinds (closed unit table + scale words), fraction
    handling, and the int64 overflow guard (a constant
    999999999999 gb plant must yield canonical_e6 NULL on both
    engines); the real ``text`` column is appended so both engines also
    process realistic residue identically. Oracle: byte-identical
    regexes + the single-sourced unit/scale tables in DuckDB, with the
    engines' non-participating-group difference (Spark '' vs DuckDB
    NULL) normalized by the shared no-fraction CASE."""
    from ontoweaver_spark.textops import extract_quantities

    _tune(spark)
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    planted = F.concat(
        F.lit("clock "), (1 + did % 8).cast("string"), F.lit("."),
        (did % 10).cast("string"), F.lit(" ghz. range "),
        (did % 2000).cast("string"), F.lit(" km. users "),
        (1 + did % 999).cast("string"), F.lit("."),
        (did % 100).cast("string"), F.lit(" million. mass "),
        (1 + did % 50).cast("string"), F.lit(" kg. cap 999999999999 gb. "),
        F.col("text"),
    )
    return extract_quantities(docs.select("doc_id", planted.alias("text")))


def _quantities_sql() -> str:
    """DuckDB mirror of q_quantities: the SAME planted mentions and the
    byte-identical regex chain — patterns, the unit/scale tables, the
    no-fraction normalization and the overflow guard all single-sourced
    from ontoweaver_spark.textops so the two sides cannot drift."""
    from ontoweaver_spark.textops import (
        _I64_MAX, _QUANTITY_SCALES, QUANTITY_PATTERNS, QUANTITY_UNITS,
    )

    planted = (
        "'clock ' || (1 + doc_id % 8)::VARCHAR || '.' || "
        "(doc_id % 10)::VARCHAR || ' ghz. range ' || "
        "(doc_id % 2000)::VARCHAR || ' km. users ' || "
        "(1 + doc_id % 999)::VARCHAR || '.' || "
        "(doc_id % 100)::VARCHAR || ' million. mass ' || "
        "(1 + doc_id % 50)::VARCHAR || ' kg. cap 999999999999 gb. ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS kind,
                     regexp_extract_all(tx, '{p}', {ig}) AS gi,
                     regexp_extract_all(tx, '{p}', {fg}) AS gf,
                     regexp_extract_all(tx, '{p}', {wg}) AS gw
              FROM t"""
        for name, (p, ig, fg, wg) in QUANTITY_PATTERNS.items()
    )
    unit_rows = ", ".join(
        f"('{u}', {f}::BIGINT, '{b}')"
        for u, (f, b) in {
            **QUANTITY_UNITS,
            **{w: (s, "count") for w, s in _QUANTITY_SCALES.items()},
        }.items()
    )
    return f"""
            WITH t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM documents
            ), m AS (
{branches}
            ), z AS (
              SELECT doc_id, kind, gi[g.i] AS ip, gf[g.i] AS fp,
                     gw[g.i] AS wd
              FROM m, LATERAL unnest(generate_series(1, len(gi))) AS g(i)
            ), u(unit, mult, base_unit) AS (
              VALUES {unit_rows}
            ), p AS (
              SELECT doc_id, kind,
                     ip::BIGINT * 1000000 +
                       (CASE WHEN fp IS NULL OR fp = '' THEN '000000'
                             ELSE rpad(fp, 6, '0') END)::BIGINT AS num_e6,
                     wd AS unit
              FROM z
            )
            SELECT DISTINCT p.doc_id, p.kind, p.num_e6, p.unit, u.base_unit,
                   CASE WHEN p.num_e6 <= {_I64_MAX} // u.mult
                        THEN p.num_e6 * u.mult END AS canonical_e6
            FROM p JOIN u USING (unit)
    """


def q_geo(spark, sf_dir):
    """Coordinate-mention extraction in exact integer microdegrees (the
    schema.org geo qualifier): one planted pair per doc over rotations
    that INCLUDE out-of-range latitudes (doc_id%100 > 90) and
    longitudes (doc_id%200 > 180) so the exact range filter is part of
    what the oracle checks; hemisphere letters alternate so both sign
    branches run. Real ``text`` appended for identical residue
    processing. Oracle: the byte-identical regex + the same
    digit-string microdegree arithmetic in DuckDB."""
    from ontoweaver_spark.textops import extract_geo

    _tune(spark)
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    planted = F.concat(
        F.lit("at "), (did % 100).cast("string"), F.lit("."),
        (did % 10).cast("string"),
        F.when(did % 2 == 0, F.lit(" n")).otherwise(F.lit(" s")),
        F.lit(", "), (did % 200).cast("string"), F.lit("."),
        ((did * 3) % 10).cast("string"),
        F.when(did % 3 == 0, F.lit(" e")).otherwise(F.lit(" w")),
        F.lit(". "), F.col("text"),
    )
    return extract_geo(docs.select("doc_id", planted.alias("text")))


def _geo_sql() -> str:
    """DuckDB mirror of q_geo: the SAME planted pair and the
    byte-identical regex — pattern and microdegree arithmetic
    single-sourced from ontoweaver_spark.textops."""
    from ontoweaver_spark.textops import GEO_PATTERN

    planted = (
        "'at ' || (doc_id % 100)::VARCHAR || '.' || "
        "(doc_id % 10)::VARCHAR || "
        "(CASE WHEN doc_id % 2 = 0 THEN ' n' ELSE ' s' END) || "
        "', ' || (doc_id % 200)::VARCHAR || '.' || "
        "((doc_id * 3) % 10)::VARCHAR || "
        "(CASE WHEN doc_id % 3 = 0 THEN ' e' ELSE ' w' END) || "
        "'. ' || text"
    )

    def udeg(ig: int, fg: int, neg: str, sg: int) -> str:
        frac6 = (
            f"(CASE WHEN g{fg} IS NULL OR g{fg} = '' THEN '000000'"
            f" ELSE rpad(g{fg}, 6, '0') END)::BIGINT"
        )
        mag = f"(g{ig}::BIGINT * 1000000 + {frac6})"
        return f"(CASE WHEN g{sg} = '{neg}' THEN -{mag} ELSE {mag} END)"

    groups = ",\n                     ".join(
        f"regexp_extract_all(tx, '{GEO_PATTERN}', {g}) AS a{g}"
        for g in range(1, 7)
    )
    cols = ", ".join(f"a{g}[u.i] AS g{g}" for g in range(1, 7))
    return f"""
            WITH t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM documents
            ), m AS (
              SELECT doc_id,
                     {groups}
              FROM t
            ), z AS (
              SELECT doc_id, {cols}
              FROM m, LATERAL unnest(generate_series(1, len(a1))) AS u(i)
            ), p AS (
              SELECT doc_id,
                     {udeg(1, 2, 's', 3)} AS lat_udeg,
                     {udeg(4, 5, 'w', 6)} AS lon_udeg
              FROM z
            )
            SELECT DISTINCT doc_id, lat_udeg, lon_udeg FROM p
            WHERE abs(lat_udeg) <= 90000000 AND abs(lon_udeg) <= 180000000
    """


def q_text_kg(spark, sf_dir):
    """Raw sentence text -> typed knowledge graph, end to end: the
    Hearst is-a harvest (q_hearst) and the meronym part-of harvest
    (q_meronym) union into one (subject, predicate, object) frame,
    bridge through ontology.graph_from_triples (both predicates
    declared as relations), and come out as the engine's auditable
    node/edge union — the complete text-side bootstrap the north rule
    describes, composed purely from oracle-gated parts. Oracle: the two
    single-sourced SQL chains unioned and the same distinct-node /
    distinct-edge bridge in DuckDB."""
    from ontoweaver_spark.ontology import graph_from_triples

    isa = q_hearst(spark, sf_dir).select(
        F.col("hyponym").alias("subject"),
        F.lit("is_a").alias("predicate"),
        F.col("hypernym").alias("object"),
    )
    pof = q_meronym(spark, sf_dir).select(
        F.col("part").alias("subject"),
        F.lit("part_of").alias("predicate"),
        F.col("whole").alias("object"),
    )
    nodes, edges, _props = graph_from_triples(
        isa.unionByName(pof), relation_predicates=["is_a", "part_of"]
    )
    return nodes.select(
        F.lit("node").alias("kind"), F.col("id").alias("a"),
        F.col("label").alias("b"), F.lit("").alias("c"),
    ).unionByName(
        edges.select(
            F.lit("edge").alias("kind"), F.col("src").alias("a"),
            F.col("dst").alias("b"), F.col("label").alias("c"),
        )
    )


def q_acronyms(spark, sf_dir):
    """Schwartz–Hearst acronym harvest (the ER alias-table bootstrap):
    one matching three-word definition per doc (rotation words, the
    parenthesized token built from their REAL initials) plus one
    deliberately wrong pair (``(qqq)``) that the in-plan initials test
    must reject; the real ``text`` column is appended so both engines
    also process realistic residue identically. Oracle: the
    byte-identical regex + the same slice/initials list arithmetic in
    DuckDB."""
    from ontoweaver_spark.webdoc import acronym_pairs

    _tune(spark)
    docs = _docs(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(3)]
    acro = F.concat(*[F.substring(x, 1, 1) for x in w])
    planted = F.concat(
        F.lit("the "), w[0], F.lit(" "), w[1], F.lit(" "), w[2],
        F.lit(" ("), acro, F.lit(") works. a wrong pair here (qqq). "),
        F.col("text"),
    )
    return acronym_pairs(docs.select("doc_id", planted.alias("text")))


def _acronyms_sql() -> str:
    """DuckDB mirror of q_acronyms: the SAME planted definition and the
    byte-identical regex — pattern single-sourced from
    ontoweaver_spark.webdoc, initials test as list arithmetic."""
    from ontoweaver_spark.webdoc import ACRONYM_PATTERN

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    acro = " || ".join(f"substr({pick(j)}, 1, 1)" for j in range(3))
    planted = (
        f"'the ' || {pick(0)} || ' ' || {pick(1)} || ' ' || {pick(2)} || "
        f"' (' || {acro} || ') works. a wrong pair here (qqq). ' || text"
    )
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
              SELECT doc_id,
                     regexp_extract_all(tx, '{ACRONYM_PATTERN}', 1) AS g1,
                     regexp_extract_all(tx, '{ACRONYM_PATTERN}', 2) AS g2
              FROM t
            ), z AS (
              SELECT doc_id,
                     string_split(trim(g1[u.i]), ' ') AS ws,
                     g2[u.i] AS short_form
              FROM m, LATERAL unnest(generate_series(1, len(g1))) AS u(i)
            ), c AS (
              SELECT doc_id, short_form, ws, length(short_form) AS n
              FROM z WHERE len(ws) >= length(short_form)
            )
            SELECT DISTINCT doc_id, short_form,
                   array_to_string(ws[len(ws)-n+1:], ' ') AS long_form
            FROM c
            WHERE array_to_string(
                    list_transform(ws[len(ws)-n+1:], x -> x[1]), ''
                  ) = short_form
    """


def q_breadcrumbs(spark, sf_dir):
    """Breadcrumb-navigation taxonomy harvest (site-declared broader-than
    edges): each doc gets a planted page whose FIRST breadcrumb container
    holds a three-crumb trail (Home > 'W0 & W1' > W2, entity-encoded amp,
    padded anchor text) plus a DECOY second breadcrumb container that
    must be ignored, with the real ``text`` column appended inside the
    body so both engines also process realistic residue identically.
    Oracle: the byte-identical Java∩RE2 container/anchor regex chain +
    the same entity-decode order in DuckDB."""
    from ontoweaver_spark.webdoc import breadcrumb_trails

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(3)]
    planted = F.concat(
        F.lit('<html><ol class="crumb breadcrumb"><li><a href="/">Home'
              '</a></li><li><a> '),
        w[0], F.lit(" &amp; "), w[1],
        F.lit(' </a></li><li><a>'), w[2],
        F.lit('</a></li></ol><div class="breadcrumb"><a>decoy</a>'
              "<a>pages</a></div><p>"),
        F.col("text"), F.lit("</p></html>"),
    )
    return breadcrumb_trails(
        docs.select("doc_id", planted.alias("html")), id_col="doc_id"
    )


def _breadcrumbs_sql() -> str:
    """DuckDB mirror of q_breadcrumbs: the SAME planted page and the
    byte-identical regex chain — container/anchor patterns and the
    entity-decode order single-sourced from ontoweaver_spark.webdoc."""
    from ontoweaver_spark.webdoc import (
        BREADCRUMB_ANCHOR, BREADCRUMB_CONTAINER, _ENTITIES,
    )

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        "'<html><ol class=\"crumb breadcrumb\"><li><a href=\"/\">Home"
        f"</a></li><li><a> ' || {pick(0)} || ' &amp; ' || {pick(1)} || "
        f"' </a></li><li><a>' || {pick(2)} || "
        "'</a></li></ol><div class=\"breadcrumb\"><a>decoy</a>"
        "<a>pages</a></div><p>' || text || '</p></html>'"
    )
    container = BREADCRUMB_CONTAINER.replace("'", "''")
    anchor = BREADCRUMB_ANCHOR.replace("'", "''")
    clean = "x"
    for ent, rep in _ENTITIES:
        e, r = ent.replace("'", "''"), rep.replace("'", "''")
        clean = f"regexp_replace({clean}, '{e}', '{r}', 'g')"
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), h AS (
              SELECT doc_id AS id, {planted} AS html FROM w
            ), c AS (
              SELECT id, regexp_extract(html, '{container}', 1) AS inner_h
              FROM h
            ), a AS (
              SELECT id, regexp_extract_all(inner_h, '{anchor}', 1) AS raw
              FROM c
            ), t AS (
              SELECT id, list_transform(raw, x -> trim({clean})) AS crumbs
              FROM a
            )
            SELECT DISTINCT id, crumbs[g.i] AS child,
                   crumbs[g.i - 1] AS parent, g.i::BIGINT AS child_pos
            FROM t, LATERAL unnest(generate_series(2, len(crumbs))) AS g(i)
            WHERE crumbs[g.i] <> '' AND crumbs[g.i - 1] <> ''
    """


def q_copula(spark, sf_dir):
    """Copula is-a harvest (the recall arm of the is-a bootstrap: "X is
    a Y" / "X is a kind of Y"): two planted frames per doc over the word
    rotation — the second deliberately also fires the bare is_a frame as
    "… is a kind", which the copula stoplist must reject — with the real
    ``text`` column appended so both engines also process realistic
    residue identically. Oracle: the byte-identical Java∩RE2 regex chain
    + the same stoplist in DuckDB."""
    from ontoweaver_spark.webdoc import copula_isa

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(4)]
    planted = F.concat(
        w[0], F.lit(" is a "), w[1], F.lit(". "),
        w[2], F.lit(" is a kind of "), w[3], F.lit(". "),
        F.col("text"),
    )
    return copula_isa(docs.select("doc_id", planted.alias("text")))


def _copula_sql() -> str:
    """DuckDB mirror of q_copula: the SAME planted frames and the
    byte-identical regex chain — patterns/separator/stoplist
    single-sourced from ontoweaver_spark.webdoc so the two sides cannot
    drift."""
    from ontoweaver_spark.webdoc import (
        COPULA_PATTERNS, _COPULA_DROP, _HEARST_SEP,
    )

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"{pick(0)} || ' is a ' || {pick(1)} || '. ' || "
        f"{pick(2)} || ' is a kind of ' || {pick(3)} || '. ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS pattern,
                     regexp_extract_all(tx, '{p}', {hg}) AS gh,
                     regexp_extract_all(tx, '{p}', {lg}) AS gl
              FROM t"""
        for name, (p, hg, lg) in COPULA_PATTERNS.items()
    )
    drop = ", ".join(f"'{d}'" for d in _COPULA_DROP)
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
{branches}
            ), z AS (
              SELECT doc_id, pattern, gh[g.i] AS hypernym, gl[g.i] AS lst
              FROM m, LATERAL unnest(generate_series(1, len(gh))) AS g(i)
            ), e AS (
              SELECT doc_id, pattern, hypernym,
                     unnest(string_split_regex(lst, '{_HEARST_SEP}'))
                       AS hyponym
              FROM z
            )
            SELECT DISTINCT doc_id, hyponym, hypernym, pattern FROM e
            WHERE length(hyponym) >= 3 AND length(hypernym) >= 3
              AND hyponym <> hypernym
              AND hyponym NOT IN ({drop}) AND hypernym NOT IN ({drop})
    """


def q_triple_support(spark, sf_dir):
    """Independent-document support gate over the Hearst harvest: the
    exact distinct-doc count per (subject, predicate, object) with
    ``min_support=2`` — the precision filter every pattern harvester in
    this engine defers to. Planted rotation pairs recur across docs
    (support ≈ n/12); singleton residue pairs from the real ``text``
    column are exactly what the gate must drop. Oracle: plain
    count-distinct + HAVING over the same Hearst SQL chain."""
    from ontoweaver_spark.ontology import triple_support

    h = q_hearst(spark, sf_dir)
    return triple_support(
        h.select(
            F.col("hyponym").alias("subject"),
            F.col("pattern").alias("predicate"),
            F.col("hypernym").alias("object"),
            "doc_id",
        ),
        min_support=2,
    )


def _entity_clean_sql(x: str) -> str:
    """DuckDB expression applying webdoc._ENTITIES decode order to x."""
    from ontoweaver_spark.webdoc import _ENTITIES

    for ent, rep in _ENTITIES:
        e, r = ent.replace("'", "''"), rep.replace("'", "''")
        x = f"regexp_replace({x}, '{e}', '{r}', 'g')"
    return x


def q_rdfa(spark, sf_dir):
    """RDFa-lite harvest (the attribute-based third of the embedded
    structured-data trio): each doc gets a planted page with one
    ``typeof`` and two ``property`` tags — one taking its value from
    ``content=``, one from the immediate text run with an entity to
    decode — plus the real ``text`` column in the body so both engines
    process realistic residue identically. Oracle: the byte-identical
    Java∩RE2 tag/attribute regex chain in DuckDB."""
    from ontoweaver_spark.webdoc import extract_rdfa

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(2)]
    planted = F.concat(
        F.lit('<html><body vocab="https://schema.org/" typeof="Product">'
              '<h1 property="name"> '),
        w[0], F.lit(" &amp; "), w[1],
        F.lit(' </h1><meta property="sku" content="SKU-'),
        F.col("doc_id").cast("string"),
        F.lit('"><p>'), F.col("text"), F.lit("</p></body></html>"),
    )
    return extract_rdfa(
        docs.select("doc_id", planted.alias("html")), url_col="doc_id"
    )


def _rdfa_sql() -> str:
    """DuckDB mirror of q_rdfa: the SAME planted page and the
    byte-identical regex chain + entity-decode order, single-sourced
    from ontoweaver_spark.webdoc."""
    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        "'<html><body vocab=\"https://schema.org/\" typeof=\"Product\">"
        f"<h1 property=\"name\"> ' || {pick(0)} || ' &amp; ' || {pick(1)} "
        "|| ' </h1><meta property=\"sku\" content=\"SKU-' || "
        "doc_id::VARCHAR || '\"><p>' || text || '</p></body></html>'"
    )
    val = (
        "CASE WHEN regexp_extract(tag, "
        "'(?is)\\bcontent\\s*=\\s*[\"'']([^\"'']*)[\"'']', 1) <> '' "
        "THEN regexp_extract(tag, "
        "'(?is)\\bcontent\\s*=\\s*[\"'']([^\"'']*)[\"'']', 1) "
        "ELSE trim(regexp_extract(tag, '>([^<]*)$', 1)) END"
    )
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), h AS (
              SELECT doc_id AS subject, {planted} AS html FROM w
            ), typed AS (
              SELECT subject, 'a' AS predicate,
                     regexp_extract(html,
                       '(?is)\\btypeof\\s*=\\s*["'']([^"'']+)["'']', 1)
                       AS object
              FROM h
            ), tags AS (
              SELECT subject, unnest(regexp_extract_all(html,
                       '(?is)<[a-z][^>]*\\bproperty\\s*=[^>]*>[^<]*', 0))
                       AS tag
              FROM h
            ), props AS (
              SELECT subject,
                     regexp_extract(tag,
                       '(?is)\\bproperty\\s*=\\s*["'']([^"'']+)["'']', 1)
                       AS predicate,
                     {_entity_clean_sql(val)} AS object
              FROM tags
            )
            SELECT * FROM typed WHERE object <> ''
            UNION ALL
            SELECT * FROM props WHERE predicate <> '' AND object <> ''
    """


def q_link_rel(spark, sf_dir):
    """``<link rel>`` page-relation harvest (canonical / hreflang
    alternates / pagination): each doc gets a planted head with a
    canonical link carrying an entity-encoded query string, a
    language-alternate keyed on the doc's real ``lang`` column, and a
    mixed-case multi-valued ``rel="Alternate AMPHTML"`` that must
    lowercase and emit one row per token; the real ``text`` column rides
    in the body. Oracle: the byte-identical regex chain + split in
    DuckDB."""
    from ontoweaver_spark.webdoc import link_rel_edges

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    planted = F.concat(
        F.lit('<html><head><link rel="canonical" href="https://ex.com/p/'),
        F.col("doc_id").cast("string"),
        F.lit('?a=1&amp;b=2"><link rel="alternate" hreflang="'),
        F.upper(F.col("lang")),
        F.lit('" href="https://ex.com/'), F.col("lang"),
        F.lit('/p/'), F.col("doc_id").cast("string"),
        F.lit('"><link rel="Alternate AMPHTML" href="https://amp.ex.com/'),
        F.col("doc_id").cast("string"),
        F.lit('"></head><body>'), F.col("text"), F.lit("</body></html>"),
    )
    return link_rel_edges(
        docs.select("doc_id", planted.alias("html")), url_col="doc_id"
    )


def _link_rel_sql() -> str:
    """DuckDB mirror of q_link_rel: the SAME planted head and the
    byte-identical tag/attribute regex chain, rel tokenized with the
    same whitespace split."""
    planted = (
        "'<html><head><link rel=\"canonical\" href=\"https://ex.com/p/' || "
        "doc_id::VARCHAR || '?a=1&amp;b=2\"><link rel=\"alternate\" "
        "hreflang=\"' || upper(lang) || '\" href=\"https://ex.com/' || lang "
        "|| '/p/' || doc_id::VARCHAR || '\"><link rel=\"Alternate AMPHTML\" "
        "href=\"https://amp.ex.com/' || doc_id::VARCHAR || "
        "'\"></head><body>' || text || '</body></html>'"
    )
    href = (
        "regexp_extract(tag, "
        "'(?is)\\bhref\\s*=\\s*[\"'']([^\"'']+)[\"'']', 1)"
    )
    return f"""
            WITH h AS (
              SELECT doc_id AS url, {planted} AS html FROM documents
            ), tags AS (
              SELECT url, unnest(regexp_extract_all(html,
                       '(?is)<link\\s[^>]*>', 0)) AS tag
              FROM h
            ), parsed AS (
              SELECT url,
                     lower(regexp_extract(tag,
                       '(?is)\\brel\\s*=\\s*["'']([^"'']+)["'']', 1))
                       AS rel_raw,
                     trim({_entity_clean_sql(href)}) AS href,
                     lower(regexp_extract(tag,
                       '(?is)\\bhreflang\\s*=\\s*["'']([^"'']+)["'']', 1))
                       AS hreflang
              FROM tags
            )
            SELECT url, unnest(string_split_regex(rel_raw, '\\s+')) AS rel,
                   href, hreflang
            FROM parsed
            WHERE href <> ''
    """


def q_aliases(spark, sf_dir):
    """Alias-frame harvest ("X, also known as Y" / "X (aka Y)" / "X, or
    simply Y"): three planted frames per doc over the word rotation —
    the first with a two-member alias list — with the real ``text``
    column appended so both engines process realistic residue
    identically. Oracle: the byte-identical Java∩RE2 regex chain in
    DuckDB with the same frames, separator and stoplist."""
    from ontoweaver_spark.webdoc import aka_aliases

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(5)]
    planted = F.concat(
        w[0], F.lit(", also known as "), w[1], F.lit(" or "), w[2],
        F.lit(". "), w[3], F.lit(" (aka "), w[4], F.lit("). "),
        F.col("text"),
    )
    return aka_aliases(docs.select("doc_id", planted.alias("text")))


def _aliases_sql() -> str:
    """DuckDB mirror of q_aliases: the SAME planted frames and the
    byte-identical regex chain — patterns/separator/stoplist
    single-sourced from ontoweaver_spark.webdoc."""
    from ontoweaver_spark.webdoc import (
        ALIAS_PATTERNS, _HEARST_DROP, _HEARST_SEP,
    )

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"{pick(0)} || ', also known as ' || {pick(1)} || ' or ' || "
        f"{pick(2)} || '. ' || {pick(3)} || ' (aka ' || {pick(4)} || "
        f"'). ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS pattern,
                     regexp_extract_all(tx, '{p.replace("'", "''")}', {hg}) AS gh,
                     regexp_extract_all(tx, '{p.replace("'", "''")}', {lg}) AS gl
              FROM t"""
        for name, (p, hg, lg) in ALIAS_PATTERNS.items()
    )
    drop = ", ".join(f"'{d}'" for d in _HEARST_DROP)
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
{branches}
            ), z AS (
              SELECT doc_id, pattern, gh[g.i] AS name, gl[g.i] AS lst
              FROM m, LATERAL unnest(generate_series(1, len(gh))) AS g(i)
            ), e AS (
              SELECT doc_id, pattern, name,
                     unnest(string_split_regex(lst, '{_HEARST_SEP}'))
                       AS alias
              FROM z
            )
            SELECT DISTINCT doc_id, name, alias, pattern FROM e
            WHERE length(alias) >= 3 AND length(name) >= 3
              AND alias <> name
              AND alias NOT IN ({drop}) AND name NOT IN ({drop})
    """


def q_definitions(spark, sf_dir):
    """Definition-list spec-sheet harvest: each doc gets a planted
    ``<dl>`` with two adjacent dt/dd pairs — the first value carrying an
    entity and padding to decode/trim, the pairs split by whitespace the
    regex must tolerate — plus the real ``text`` column in the body so
    both engines process realistic residue identically. Oracle: the
    byte-identical dt/dd regex chain + index pairing in DuckDB."""
    from ontoweaver_spark.webdoc import definition_pairs

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(3)]
    planted = F.concat(
        F.lit("<dl><dt>Brand</dt><dd> "), w[0], F.lit(" &amp; "), w[1],
        F.lit(" </dd><dt>Origin</dt>\n<dd>"), w[2],
        F.lit("</dd></dl><p>"), F.col("text"), F.lit("</p>"),
    )
    return definition_pairs(
        docs.select("doc_id", planted.alias("html")), url_col="doc_id"
    )


def _definitions_sql() -> str:
    """DuckDB mirror of q_definitions: the SAME planted list and the
    byte-identical dt/dd pattern, paired by match index, entity-decode
    order single-sourced from ontoweaver_spark.webdoc."""
    from ontoweaver_spark.webdoc import DT_DD_PATTERN

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"'<dl><dt>Brand</dt><dd> ' || {pick(0)} || ' &amp; ' || {pick(1)}"
        f" || ' </dd><dt>Origin</dt>' || chr(10) || '<dd>' || {pick(2)} || "
        "'</dd></dl><p>' || text || '</p>'"
    )
    pat = DT_DD_PATTERN.replace("'", "''")
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), h AS (
              SELECT doc_id AS url, {planted} AS html FROM w
            ), m AS (
              SELECT url,
                     regexp_extract_all(html, '{pat}', 1) AS ks,
                     regexp_extract_all(html, '{pat}', 2) AS vs
              FROM h
            )
            SELECT DISTINCT url,
                   trim({_entity_clean_sql("ks[g.i]")}) AS key,
                   trim({_entity_clean_sql("vs[g.i]")}) AS value,
                   g.i::BIGINT AS pair_pos
            FROM m, LATERAL unnest(generate_series(1, len(ks))) AS g(i)
            WHERE trim({_entity_clean_sql("ks[g.i]")}) <> ''
              AND trim({_entity_clean_sql("vs[g.i]")}) <> ''
    """


def q_contrast(spark, sf_dir):
    """Contrast-frame harvest (the negative-evidence arm of entity
    resolution: "X, unlike Y" asserts NOT-same): three planted frames
    per doc over the word rotation — the first with a two-member
    contrast list — plus the real ``text`` column so both engines
    process realistic residue identically. Oracle: the byte-identical
    Java∩RE2 regex chain in DuckDB."""
    from ontoweaver_spark.webdoc import contrast_pairs

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(5)]
    planted = F.concat(
        w[0], F.lit(", unlike "), w[1], F.lit(" or "), w[2],
        F.lit(". "), w[3], F.lit(" rather than "), w[4], F.lit(". "),
        F.col("text"),
    )
    return contrast_pairs(docs.select("doc_id", planted.alias("text")))


def _contrast_sql() -> str:
    """DuckDB mirror of q_contrast — patterns/separator/stoplist
    single-sourced from ontoweaver_spark.webdoc."""
    from ontoweaver_spark.webdoc import (
        CONTRAST_PATTERNS, _HEARST_DROP, _HEARST_SEP,
    )

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"{pick(0)} || ', unlike ' || {pick(1)} || ' or ' || {pick(2)} || "
        f"'. ' || {pick(3)} || ' rather than ' || {pick(4)} || '. ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS pattern,
                     regexp_extract_all(tx, '{p.replace("'", "''")}', {hg}) AS gh,
                     regexp_extract_all(tx, '{p.replace("'", "''")}', {lg}) AS gl
              FROM t"""
        for name, (p, hg, lg) in CONTRAST_PATTERNS.items()
    )
    drop = ", ".join(f"'{d}'" for d in _HEARST_DROP)
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
{branches}
            ), z AS (
              SELECT doc_id, pattern, gh[g.i] AS term, gl[g.i] AS lst
              FROM m, LATERAL unnest(generate_series(1, len(gh))) AS g(i)
            ), e AS (
              SELECT doc_id, pattern, term,
                     unnest(string_split_regex(lst, '{_HEARST_SEP}'))
                       AS contrast
              FROM z
            )
            SELECT DISTINCT doc_id, term, contrast, pattern FROM e
            WHERE length(contrast) >= 3 AND length(term) >= 3
              AND contrast <> term
              AND contrast NOT IN ({drop}) AND term NOT IN ({drop})
    """


def q_cohyponyms(spark, sf_dir):
    """Co-hyponym sibling pairs from the Hearst harvest: members of the
    same enumeration become lateral taxonomy edges under the shared
    hypernym. The planted such_as list has three members per doc, so
    every doc contributes C(3,2) sibling pairs plus whatever the real
    ``text`` residue adds identically on both engines. Oracle: the same
    self-join over the single-sourced Hearst SQL chain."""
    from ontoweaver_spark.webdoc import cohyponym_pairs

    return cohyponym_pairs(q_hearst(spark, sf_dir))


def q_hreflang_clusters(spark, sf_dir):
    """Cross-language translation clusters DISCOVERED from crawl markup:
    each planted page at url p(r) declares an hreflang alternate to
    p((r+100) mod 500), chaining the 500 residue urls into 100
    five-member translation clusters; a rel=canonical link on the same
    page is the negative control the hreflang filter must exclude. The
    harvested (url, href) pairs run through the same large-star /
    small-star connected-components engine as owl:sameAs
    canonicalization -> ``(vertex, component)`` with component = string
    min of the cluster. Oracle: the byte-identical link-rel regex chain
    + recursive-CTE closure with the same least-labeling."""
    from ontoweaver_spark.dedup import connected_components
    from ontoweaver_spark.webdoc import link_rel_edges

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    r = F.col("doc_id") % 500
    url = F.concat(F.lit("https://ex.com/p"), r.cast("string"))
    alt = F.concat(
        F.lit("https://ex.com/p"), ((r + 100) % 500).cast("string")
    )
    planted = F.concat(
        F.lit('<html><head><link rel="canonical" href="'), url,
        F.lit('"><link rel="alternate" hreflang="fr" href="'), alt,
        F.lit('"></head><body>'), F.col("text"), F.lit("</body></html>"),
    )
    pages = docs.select(url.alias("url"), planted.alias("html"))
    edges = (
        link_rel_edges(pages)
        .where((F.col("rel") == "alternate") & (F.col("hreflang") != ""))
        .select(F.col("url").alias("a"), F.col("href").alias("b"))
    )
    return connected_components(edges)


def _hreflang_clusters_sql() -> str:
    """DuckDB mirror of q_hreflang_clusters: the SAME planted head, the
    byte-identical link-rel chain, and a recursive-CTE reachability
    closure with the same string-least component labeling."""
    href = (
        "regexp_extract(tag, "
        "'(?is)\\bhref\\s*=\\s*[\"'']([^\"'']+)[\"'']', 1)"
    )
    planted = (
        "'<html><head><link rel=\"canonical\" href=\"https://ex.com/p' || "
        "(doc_id % 500)::VARCHAR || '\"><link rel=\"alternate\" "
        "hreflang=\"fr\" href=\"https://ex.com/p' || "
        "((doc_id % 500 + 100) % 500)::VARCHAR || '\"></head><body>' || "
        "text || '</body></html>'"
    )
    return f"""
            WITH RECURSIVE h AS MATERIALIZED (
              SELECT 'https://ex.com/p' || (doc_id % 500)::VARCHAR AS url,
                     {planted} AS html
              FROM documents
            ), tags AS (
              SELECT url, unnest(regexp_extract_all(html,
                       '(?is)<link\\s[^>]*>', 0)) AS tag
              FROM h
            ), parsed AS (
              SELECT url,
                     lower(regexp_extract(tag,
                       '(?is)\\brel\\s*=\\s*["'']([^"'']+)["'']', 1))
                       AS rel_raw,
                     trim({_entity_clean_sql(href)}) AS href,
                     lower(regexp_extract(tag,
                       '(?is)\\bhreflang\\s*=\\s*["'']([^"'']+)["'']', 1))
                       AS hreflang
              FROM tags
            ), rels AS (
              SELECT url, unnest(string_split_regex(rel_raw, '\\s+')) AS rel,
                     href, hreflang
              FROM parsed WHERE href <> ''
            ), sa AS MATERIALIZED (
              SELECT DISTINCT url AS a, href AS b FROM rels
              WHERE rel = 'alternate' AND hreflang <> '' AND rel <> ''
            ), und AS MATERIALIZED (
              SELECT a AS v, b AS w FROM sa UNION SELECT b, a FROM sa
            ), reach(v, w) AS (
              SELECT v, w FROM und
              UNION
              SELECT r.v, u.w FROM reach r JOIN und u ON r.w = u.v
            )
            SELECT v AS vertex, least(v, min(w)) AS component
            FROM reach GROUP BY v
    """


def q_appositive(spark, sf_dir):
    """Appositive relational-noun harvest ("X, the Y of Z" -> typed
    triple): one planted frame per doc over the word rotation plus the
    real ``text`` column so both engines process realistic residue
    identically. Oracle: the byte-identical Java∩RE2 three-group chain
    in DuckDB."""
    from ontoweaver_spark.webdoc import appositive_relations

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(3)]
    planted = F.concat(
        w[0], F.lit(", the "), w[1], F.lit(" of "), w[2], F.lit(". "),
        F.col("text"),
    )
    return appositive_relations(docs.select("doc_id", planted.alias("text")))


def _appositive_sql() -> str:
    """DuckDB mirror of q_appositive — pattern and stoplist
    single-sourced from ontoweaver_spark.webdoc."""
    from ontoweaver_spark.webdoc import APPOSITIVE_PATTERN, _HEARST_DROP

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"{pick(0)} || ', the ' || {pick(1)} || ' of ' || {pick(2)} || "
        "'. ' || text"
    )
    drop = ", ".join(f"'{d}'" for d in _HEARST_DROP)
    p = APPOSITIVE_PATTERN.replace("'", "''")
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
              SELECT doc_id,
                     regexp_extract_all(tx, '{p}', 1) AS gs,
                     regexp_extract_all(tx, '{p}', 2) AS gr,
                     regexp_extract_all(tx, '{p}', 3) AS go
              FROM t
            )
            SELECT DISTINCT doc_id, gs[g.i] AS subject, gr[g.i] AS relation,
                   go[g.i] AS object
            FROM m, LATERAL unnest(generate_series(1, len(gs))) AS g(i)
            WHERE length(gs[g.i]) >= 3 AND length(gr[g.i]) >= 3
              AND length(go[g.i]) >= 3 AND gs[g.i] <> go[g.i]
              AND gs[g.i] NOT IN ({drop}) AND gr[g.i] NOT IN ({drop})
              AND go[g.i] NOT IN ({drop})
    """


def q_quotes(spark, sf_dir):
    """Quotation-attribution harvest (claim provenance: who said what):
    both planted frame orders per doc — quote-then-speaker and
    speaker-then-quote — over the word rotation, case preserved, plus
    the real ``text`` column so both engines process realistic residue
    identically. Oracle: the byte-identical two-pattern chain in
    DuckDB."""
    from ontoweaver_spark.webdoc import quote_attributions

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(4)]
    planted = F.concat(
        F.lit('"we will ship '), w[0], F.lit('," said '), w[1],
        F.lit(". "), w[2], F.lit(' says, "'), w[3],
        F.lit(' is ready." '), F.col("text"),
    )
    return quote_attributions(docs.select("doc_id", planted.alias("text")))


def _quotes_sql() -> str:
    """DuckDB mirror of q_quotes — patterns single-sourced from
    ontoweaver_spark.webdoc, case-preserving whitespace collapse."""
    from ontoweaver_spark.webdoc import QUOTE_PATTERNS

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"'\"we will ship ' || {pick(0)} || ',\" said ' || {pick(1)} || "
        f"'. ' || {pick(2)} || ' says, \"' || {pick(3)} || "
        "' is ready.\" ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS pattern,
                     regexp_extract_all(tx, '{p.replace("'", "''")}', {sg}) AS gsp,
                     regexp_extract_all(tx, '{p.replace("'", "''")}', {qg}) AS gq
              FROM t"""
        for name, (p, sg, qg) in QUOTE_PATTERNS.items()
    )
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     regexp_replace({planted}, '\\s+', ' ', 'g') AS tx
              FROM w
            ), m AS (
{branches}
            )
            SELECT DISTINCT doc_id, gsp[g.i] AS speaker, gq[g.i] AS quote,
                   pattern
            FROM m, LATERAL unnest(generate_series(1, len(gsp))) AS g(i)
    """


def q_numeric_facts(spark, sf_dir):
    """Numeric-property harvest ("X has a Y of N" -> exact-BIGINT
    literal triple): one planted frame per doc whose value carries a
    comma thousands separator the parse must strip (39,VVV ->
    39000 + doc-residue), plus the real ``text`` column so both engines
    process realistic residue identically. Oracle: the byte-identical
    three-group chain + the same comma-strip BIGINT cast in DuckDB."""
    from ontoweaver_spark.webdoc import numeric_facts

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)  # regex-heavy: spread the byte-small scan
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(2)]
    planted = F.concat(
        w[0], F.lit(" has a "), w[1], F.lit(" of 39,"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit(" units. "), F.col("text"),
    )
    return numeric_facts(docs.select("doc_id", planted.alias("text")))


def _numeric_facts_sql() -> str:
    """DuckDB mirror of q_numeric_facts — pattern/stoplist
    single-sourced from ontoweaver_spark.webdoc."""
    from ontoweaver_spark.webdoc import HAS_OF_PATTERN, _HEARST_DROP

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"{pick(0)} || ' has a ' || {pick(1)} || ' of 39,' || "
        "lpad((doc_id % 1000)::VARCHAR, 3, '0') || ' units. ' || text"
    )
    drop = ", ".join(f"'{d}'" for d in _HEARST_DROP)
    p = HAS_OF_PATTERN.replace("'", "''")
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
              SELECT doc_id,
                     regexp_extract_all(tx, '{p}', 1) AS gs,
                     regexp_extract_all(tx, '{p}', 2) AS gr,
                     regexp_extract_all(tx, '{p}', 3) AS gv
              FROM t
            )
            SELECT DISTINCT doc_id, gs[g.i] AS subject, gr[g.i] AS relation,
                   regexp_replace(gv[g.i], ',', '', 'g')::BIGINT AS value
            FROM m, LATERAL unnest(generate_series(1, len(gs))) AS g(i)
            WHERE length(gs[g.i]) >= 3 AND length(gr[g.i]) >= 3
              AND gs[g.i] NOT IN ({drop}) AND gr[g.i] NOT IN ({drop})
    """


def q_page_kg(spark, sf_dir):
    """THE north-rule composition, end to end: every harvester this
    engine ships — markup carriers (RDFa, definition lists, breadcrumb
    taxonomy) and sentence frames (Hearst is-a, copula is-a, meronym
    part-of, appositive relations, numeric has-of facts) — unioned into
    one (subject, predicate, object) stream and rolled through the
    :func:`ontoweaver_spark.ontology.triple_support` precision gate at
    ``min_support=2``. Every input leg is itself an oracle-gated query;
    this composition is gated too (the union of the single-sourced SQL
    chains + the same count-distinct HAVING), so the flagship flow
    "crawl pages -> gated KG triples" is hash-checked as one unit.

    Scale shape: each leg is a zero-shuffle projection plus its
    contract ``distinct`` (a keyed hash aggregate that pre-shrinks the
    stream — effectively the support gate's map-side dedup
    materialized); the union is plan-level (no exchange of its own) and
    the gate is ONE two-phase count-distinct aggregation. Verified
    join-free end to end (plan-shape asserted at build time): at 10^12
    pages nothing joins before the HAVING prune."""
    from ontoweaver_spark.ontology import triple_support

    def spo(df, s, p, o):
        # p: a Column picks the per-row predicate, a str is a literal
        pred = F.lit(p) if isinstance(p, str) else p
        return df.select(
            F.col("doc_id"),
            F.col(s).cast("string").alias("subject"),
            pred.alias("predicate"),
            F.col(o).cast("string").alias("object"),
        )

    legs = [
        spo(q_hearst(spark, sf_dir), "hyponym", "is_a", "hypernym"),
        spo(q_copula(spark, sf_dir), "hyponym", "is_a", "hypernym"),
        spo(q_meronym(spark, sf_dir), "part", "part_of", "whole"),
        spo(
            q_appositive(spark, sf_dir).withColumnRenamed("subject", "s_"),
            "s_", F.col("relation"), "object",
        ),
        spo(
            q_numeric_facts(spark, sf_dir).withColumnRenamed("subject", "s_"),
            "s_", F.col("relation"), "value",
        ),
        spo(
            q_rdfa(spark, sf_dir).withColumnRenamed("subject", "doc_id"),
            "doc_id", F.col("predicate"), "object",
        ),
        spo(
            q_definitions(spark, sf_dir).withColumnRenamed("url", "doc_id"),
            "doc_id", F.col("key"), "value",
        ),
        spo(
            q_breadcrumbs(spark, sf_dir).withColumnRenamed("id", "doc_id"),
            "child", "subclass_of", "parent",
        ),
    ]
    allt = legs[0]
    for leg in legs[1:]:
        allt = allt.unionByName(leg)
    return triple_support(allt, min_support=2)


def _page_kg_sql() -> str:
    """DuckDB mirror of q_page_kg: the union of the single-sourced
    harvest SQL chains projected to (doc_id, s, p, o), then the same
    count-distinct + HAVING gate."""
    return f"""
            WITH hearst AS ({_hearst_sql()}),
            copula AS ({_copula_sql()}),
            mer AS ({_meronym_sql()}),
            app AS ({_appositive_sql()}),
            numf AS ({_numeric_facts_sql()}),
            rdfa AS ({_rdfa_sql()}),
            defs AS ({_definitions_sql()}),
            bc AS ({_breadcrumbs_sql()}),
            allt AS (
              SELECT doc_id, hyponym AS s, 'is_a' AS p, hypernym AS o
              FROM hearst
              UNION ALL
              SELECT doc_id, hyponym, 'is_a', hypernym FROM copula
              UNION ALL
              SELECT doc_id, part, 'part_of', whole FROM mer
              UNION ALL
              SELECT doc_id, subject, relation, object FROM app
              UNION ALL
              SELECT doc_id, subject, relation, value::VARCHAR FROM numf
              UNION ALL
              SELECT subject AS doc_id, subject::VARCHAR, predicate, object
              FROM rdfa
              UNION ALL
              SELECT url AS doc_id, url::VARCHAR, key, value FROM defs
              UNION ALL
              SELECT id AS doc_id, child, 'subclass_of', parent FROM bc
            )
            SELECT s AS subject, p AS predicate, o AS object,
                   count(DISTINCT doc_id)::BIGINT AS support
            FROM allt
            GROUP BY 1, 2, 3
            HAVING count(DISTINCT doc_id) >= 2
    """


def q_breadcrumb_closure(spark, sf_dir):
    """Mined taxonomy -> transitive closure, end to end: each planted
    page's breadcrumb declares one (child c_r, parent c_{r div 2}) edge
    of a 500-node binary-tree category hierarchy; the harvested pairs
    run through the path-doubling ``subclass_closure`` ->
    ``(descendant, ancestor, depth)`` with min-path depth. This is the
    markup-side twin of onto_closure's file-loaded ontology: the
    hierarchy is DISCOVERED from crawl navigation, then closed. Oracle:
    INDEPENDENT derivation — the edge set rebuilt arithmetically (not
    through the regex chain, which breadcrumb_taxonomy already gates)
    and closed by a recursive CTE, so the harvest+closure composition
    is checked against a different formulation."""
    from ontoweaver_spark.ontology import subclass_closure
    from ontoweaver_spark.webdoc import breadcrumb_trails

    _tune(spark)
    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 500 >= 2)
    r = F.col("doc_id") % 500
    half = F.expr("(doc_id % 500) div 2")
    planted = F.concat(
        F.lit('<nav class="breadcrumb"><a>c'), half.cast("string"),
        F.lit("</a> &gt; <a>c"), r.cast("string"),
        F.lit("</a></nav><p>"), F.col("text"), F.lit("</p>"),
    )
    trails = breadcrumb_trails(
        docs.select("doc_id", planted.alias("html")), id_col="doc_id"
    )
    edges = trails.select("child", "parent").distinct()
    return subclass_closure(edges)


def q_fact_consensus(spark, sf_dir):
    """Numeric-claim reconciliation over the has-of harvest: conflicting
    values per (subject, relation) collapse to exact-BIGINT low-median
    consensus plus claim/value counts and range — the literal-side twin
    of categorical claim voting. Oracle: INDEPENDENT derivation —
    per-row ranking (row_number) instead of the value-histogram cumsum,
    so the no-buffering scale shape is checked against a different
    formulation."""
    from ontoweaver_spark.ontology import numeric_consensus

    return numeric_consensus(q_numeric_facts(spark, sf_dir))


def q_kv_types(spark, sf_dir):
    """Spec-sheet schema discovery: a planted ``<dl>`` with one string,
    one integer, one decimal and one date key per doc runs through the
    dt/dd harvest and the per-key type profile — the majority-type
    report a mapping author reads before declaring literal types.
    Oracle: the byte-identical dt/dd chain + the same anchored literal
    regexes and precedence CASE in DuckDB."""
    from ontoweaver_spark.webdoc import definition_pairs, kv_type_profile

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w0 = F.element_at(words, (F.col("doc_id") % 12 + 1).cast("int"))
    planted = F.concat(
        F.lit("<dl><dt>Brand</dt><dd>"), w0,
        F.lit("</dd><dt>Stock</dt><dd>"),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("</dd><dt>Weight</dt><dd>"),
        (F.col("doc_id") % 9).cast("string"), F.lit(".5"),
        F.lit("</dd><dt>Since</dt><dd>2021-0"),
        (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit("-15</dd></dl><p>"), F.col("text"), F.lit("</p>"),
    )
    pairs = definition_pairs(
        docs.select("doc_id", planted.alias("html")), url_col="doc_id"
    )
    return kv_type_profile(pairs)


def _kv_types_sql() -> str:
    """DuckDB mirror of q_kv_types — dt/dd pattern, literal regexes and
    the precedence CASE single-sourced from ontoweaver_spark.webdoc."""
    from ontoweaver_spark.webdoc import (
        DT_DD_PATTERN, _KV_DATE_RE, _KV_DEC_RE, _KV_INT_RE,
    )

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)
    planted = (
        "'<dl><dt>Brand</dt><dd>' || l[1 + doc_id % 12] || "
        "'</dd><dt>Stock</dt><dd>' || (doc_id % 100)::VARCHAR || "
        "'</dd><dt>Weight</dt><dd>' || (doc_id % 9)::VARCHAR || '.5' || "
        "'</dd><dt>Since</dt><dd>2021-0' || (doc_id % 9 + 1)::VARCHAR || "
        "'-15</dd></dl><p>' || text || '</p>'"
    )
    pat = DT_DD_PATTERN.replace("'", "''")
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), h AS (
              SELECT doc_id AS url, {planted} AS html FROM w
            ), m AS (
              SELECT url,
                     regexp_extract_all(html, '{pat}', 1) AS ks,
                     regexp_extract_all(html, '{pat}', 2) AS vs
              FROM h
            ), pairs AS (
              SELECT DISTINCT url,
                     trim({_entity_clean_sql("ks[g.i]")}) AS key,
                     trim({_entity_clean_sql("vs[g.i]")}) AS value,
                     g.i::BIGINT AS pair_pos
              FROM m, LATERAL unnest(generate_series(1, len(ks))) AS g(i)
              WHERE trim({_entity_clean_sql("ks[g.i]")}) <> ''
                AND trim({_entity_clean_sql("vs[g.i]")}) <> ''
            ), cls AS (
              SELECT key,
                CASE WHEN regexp_matches(trim(value), '{_KV_INT_RE}')
                     THEN 1 ELSE 0 END AS i,
                CASE WHEN regexp_matches(trim(value), '{_KV_DEC_RE}')
                     THEN 1 ELSE 0 END AS d,
                CASE WHEN regexp_matches(trim(value), '{_KV_DATE_RE}')
                     THEN 1 ELSE 0 END AS t
              FROM pairs
            ), agg AS (
              SELECT key, count(*)::BIGINT AS n_values,
                     sum(i)::BIGINT AS n_int,
                     sum(d)::BIGINT AS n_decimal,
                     sum(t)::BIGINT AS n_date
              FROM cls GROUP BY key
            )
            SELECT key, n_values, n_int, n_decimal, n_date,
                   (n_values - n_int - n_decimal - n_date)::BIGINT
                     AS n_other,
                   CASE
                     WHEN n_int >= n_decimal AND n_int >= n_date
                          AND n_int >= n_values - n_int - n_decimal - n_date
                     THEN 'integer'
                     WHEN n_decimal >= n_date
                          AND n_decimal >= n_values - n_int - n_decimal - n_date
                     THEN 'decimal'
                     WHEN n_date >= n_values - n_int - n_decimal - n_date
                     THEN 'date'
                     ELSE 'string'
                   END AS inferred_type
            FROM agg
    """


def q_harvest_yield(spark, sf_dir):
    """Per-source harvest-yield report over the Hearst harvest: which
    crawl sources produce is-a triples, at what exact-BIGINT
    per-doc rate — the crawl-budget reallocation signal. Oracle: the
    single-sourced Hearst chain + the same per-doc-then-join-then-rollup
    arithmetic."""
    from ontoweaver_spark.webdoc import harvest_yield

    h = q_hearst(spark, sf_dir)
    return harvest_yield(h, _docs(spark, sf_dir))


def q_citations(spark, sf_dir):
    """Author-year citation harvest: both planted frames per doc — a
    plain "(Name, 20XX)" and an "(Name et al., 19XX)" — with
    capitalized rotation names and the real ``text`` column appended so
    both engines process realistic residue identically. Oracle: the
    byte-identical case-preserving chain + the same capitalization
    arithmetic in DuckDB."""
    from ontoweaver_spark.webdoc import citation_mentions

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(2)]

    def cap(c):
        return F.concat(
            F.upper(c.substr(1, 1)), c.substr(F.lit(2), F.length(c))
        )

    yy = F.lpad((F.col("doc_id") % 30).cast("string"), 2, "0")
    planted = F.concat(
        F.lit("as shown ("), cap(w[0]), F.lit(", 20"), yy,
        F.lit(") and ("), cap(w[1]), F.lit(" et al., 19"), yy,
        F.lit("). "), F.col("text"),
    )
    return citation_mentions(docs.select("doc_id", planted.alias("text")))


def _citations_sql() -> str:
    """DuckDB mirror of q_citations — patterns single-sourced from
    ontoweaver_spark.webdoc, same capitalization arithmetic."""
    from ontoweaver_spark.webdoc import CITATION_PATTERNS

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    def cap(x: str) -> str:
        return f"upper({x}[1]) || {x}[2:]"

    planted = (
        f"'as shown (' || {cap(pick(0))} || ', 20' || "
        "lpad((doc_id % 30)::VARCHAR, 2, '0') || ') and (' || "
        f"{cap(pick(1))} || ' et al., 19' || "
        "lpad((doc_id % 30)::VARCHAR, 2, '0') || '). ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS pattern,
                     regexp_extract_all(tx, '{p.replace("'", "''")}', {ag}) AS ga,
                     regexp_extract_all(tx, '{p.replace("'", "''")}', {yg}) AS gy
              FROM t"""
        for name, (p, ag, yg) in CITATION_PATTERNS.items()
    )
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     regexp_replace({planted}, '\\s+', ' ', 'g') AS tx
              FROM w
            ), m AS (
{branches}
            )
            SELECT DISTINCT doc_id, ga[g.i] AS author,
                   gy[g.i]::BIGINT AS year, pattern
            FROM m, LATERAL unnest(generate_series(1, len(ga))) AS g(i)
    """


def q_identifiers(spark, sf_dir):
    """External-identifier harvest: a planted DOI (4-digit registrant,
    word+digit suffix, trailing sentence period that must NOT stick)
    and a planted digit-form ISBN-13 per doc, plus the real ``text``
    column so both engines process realistic residue identically.
    Oracle: the byte-identical lowercased chain in DuckDB."""
    from ontoweaver_spark.webdoc import identifier_mentions

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w0 = F.element_at(words, (F.col("doc_id") % 12 + 1).cast("int"))
    planted = F.concat(
        F.lit("see 10."), (F.col("doc_id") % 9000 + 1000).cast("string"),
        F.lit("/j."), w0, F.lit("-"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit(". isbn 978"),
        F.lpad((F.col("doc_id") * 7 % 10000000000).cast("string"), 10, "0"),
        F.lit(". "), F.col("text"),
    )
    return identifier_mentions(docs.select("doc_id", planted.alias("text")))


def _identifiers_sql() -> str:
    """DuckDB mirror of q_identifiers — patterns single-sourced from
    ontoweaver_spark.webdoc."""
    from ontoweaver_spark.webdoc import IDENTIFIER_PATTERNS

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)
    planted = (
        "'see 10.' || (doc_id % 9000 + 1000)::VARCHAR || '/j.' || "
        "l[1 + doc_id % 12] || '-' || (doc_id % 97)::VARCHAR || "
        "'. isbn 978' || "
        "lpad((doc_id * 7 % 10000000000)::VARCHAR, 10, '0') || '. ' || text"
    )
    branches = "\n              UNION ALL\n".join(
        f"""              SELECT doc_id, '{name}' AS kind,
                     unnest(regexp_extract_all(tx,
                       '{p.replace("'", "''")}', 0)) AS identifier
              FROM t"""
        for name, p in IDENTIFIER_PATTERNS.items()
    )
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id,
                     lower(regexp_replace({planted}, '\\s+', ' ', 'g')) AS tx
              FROM w
            ), m AS (
{branches}
            )
            SELECT DISTINCT doc_id, kind, identifier FROM m
    """


def q_md_sections(spark, sf_dir):
    """Markdown heading-hierarchy harvest: four planted ATX headings per
    doc (H1 > H2 > H3, then a sibling H2 that must re-attach to the H1)
    with the real ``text`` column as the body so both engines process
    realistic residue identically. The parent link is computed
    JOIN-FREE (per-doc window carrying each level's running last
    position). Oracle: INDEPENDENT derivation — a LEFT self-join
    max(pos) over preceding strictly-shallower headings, a different
    formulation than the window."""
    from ontoweaver_spark.webdoc import markdown_sections

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(4)]
    nl = F.lit("\n")
    planted = F.concat(
        F.lit("# "), w[0], nl, F.lit("## "), w[1], nl,
        F.lit("### "), w[2], nl, F.lit("## "), w[3], nl, F.col("text"),
    )
    return markdown_sections(docs.select("doc_id", planted.alias("text")))


def _md_sections_sql() -> str:
    """DuckDB mirror of q_md_sections — heading regex single-sourced;
    the parent computed by a self-join instead of the window."""
    from ontoweaver_spark.webdoc import _MD_HEADING_RE

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"'# ' || {pick(0)} || chr(10) || '## ' || {pick(1)} || chr(10) || "
        f"'### ' || {pick(2)} || chr(10) || '## ' || {pick(3)} || chr(10) "
        "|| text"
    )
    p = _MD_HEADING_RE.replace("'", "''")
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id, string_split({planted}, chr(10)) AS parts
              FROM w
            ), ln AS (
              SELECT doc_id, parts[g.i] AS line, g.i AS lno
              FROM t, LATERAL unnest(generate_series(1, len(parts)))
                AS g(i)
            ), heads AS (
              SELECT doc_id, lno,
                     length(regexp_extract(line, '{p}', 1)) AS level,
                     trim(regexp_extract(line, '{p}', 2)) AS title,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY lno
                     ) AS pos
              FROM ln
              WHERE length(regexp_extract(line, '{p}', 1)) > 0
                AND trim(regexp_extract(line, '{p}', 2)) <> ''
            )
            SELECT h.doc_id, h.pos::BIGINT AS pos,
                   h.level::BIGINT AS level, h.title,
                   max(par.pos)::BIGINT AS parent_pos
            FROM heads h
            LEFT JOIN heads par
              ON par.doc_id = h.doc_id AND par.lno < h.lno
             AND par.level < h.level
            GROUP BY h.doc_id, h.pos, h.level, h.title
    """


def q_section_paths(spark, sf_dir):
    """Heading-breadcrumb paths over the same planted markdown as
    q_md_sections (H1 > H2 > H3 plus a sibling H2): the window-cascade
    chain assembly vs an INDEPENDENT recursive-CTE oracle that walks
    the self-join parent links from the root — two different
    formulations of the ancestor chain must agree on every path."""
    from ontoweaver_spark.webdoc import markdown_section_paths

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(4)]
    nl = F.lit("\n")
    planted = F.concat(
        F.lit("# "), w[0], nl, F.lit("## "), w[1], nl,
        F.lit("### "), w[2], nl, F.lit("## "), w[3], nl, F.col("text"),
    )
    return markdown_section_paths(
        docs.select("doc_id", planted.alias("text"))
    )


def q_section_text(spark, sf_dir):
    """Section-grouped body text over planted markdown: a preamble-free
    doc with bodies under the H1 and the first H2, two body-less
    headings, and the real ``text`` column as the last section's body —
    both engines must attribute every line to the same governing
    heading and join bodies in the same order. Oracle: the running
    heading count + ordered string_agg in DuckDB."""
    from ontoweaver_spark.webdoc import markdown_section_text

    _tune(spark)
    docs = _docs_spread(spark, sf_dir)
    words = F.array(*[F.lit(s) for s in _HEARST_WORDS])
    w = [F.element_at(words, ((F.col("doc_id") + j) % 12 + 1).cast("int"))
         for j in range(4)]
    nl = F.lit("\n")
    planted = F.concat(
        F.lit("# "), w[0], nl,
        F.lit("intro "), F.col("doc_id").cast("string"), nl,
        F.lit("## "), w[1], nl, F.lit("mid"), nl,
        F.lit("### "), w[2], nl, F.lit("## "), w[3], nl, F.col("text"),
    )
    return markdown_section_text(docs.select("doc_id", planted.alias("text")))


def _section_text_sql() -> str:
    """DuckDB mirror of q_section_text — heading regex single-sourced,
    governing section via the same running heading count, bodies via
    ordered string_agg."""
    from ontoweaver_spark.webdoc import _MD_HEADING_RE

    words = ", ".join(f"'{w}'" for w in _HEARST_WORDS)

    def pick(j: int) -> str:
        return f"l[1 + (doc_id + {j}) % 12]"

    planted = (
        f"'# ' || {pick(0)} || chr(10) || 'intro ' || doc_id::VARCHAR || "
        f"chr(10) || '## ' || {pick(1)} || chr(10) || 'mid' || chr(10) || "
        f"'### ' || {pick(2)} || chr(10) || '## ' || {pick(3)} || chr(10) "
        "|| text"
    )
    p = _MD_HEADING_RE.replace("'", "''")
    return f"""
            WITH w AS (
              SELECT doc_id, text, [{words}] AS l FROM documents
            ), t AS (
              SELECT doc_id, string_split({planted}, chr(10)) AS parts
              FROM w
            ), ln AS (
              SELECT doc_id, parts[g.i] AS line, g.i AS lno
              FROM t, LATERAL unnest(generate_series(1, len(parts)))
                AS g(i)
            ), tagged AS (
              SELECT doc_id, lno, line,
                     CASE WHEN length(regexp_extract(line, '{p}', 1)) > 0
                           AND trim(regexp_extract(line, '{p}', 2)) <> ''
                          THEN 1 ELSE 0 END AS h,
                     sum(CASE WHEN length(regexp_extract(line, '{p}', 1)) > 0
                               AND trim(regexp_extract(line, '{p}', 2)) <> ''
                              THEN 1 ELSE 0 END) OVER (
                       PARTITION BY doc_id ORDER BY lno
                       ROWS UNBOUNDED PRECEDING
                     ) AS hpos
              FROM ln
            )
            SELECT doc_id, hpos::BIGINT AS sect_pos,
                   string_agg(line, chr(10) ORDER BY lno) AS body
            FROM tagged
            WHERE h = 0 AND trim(line) <> ''
            GROUP BY doc_id, hpos
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_nodes": q_kg_nodes,
        "kg_edges": q_kg_edges,
        "kg_fusion_props": q_kg_fusion_props,
        "t_split": q_t_split,
        "t_cat_format": q_t_cat_format,
        "t_translate": q_t_translate,
        "t_boolean": q_t_boolean,
        "t_replace": q_t_replace,
        "t_maths": q_t_maths,
        "t_case": q_t_case,
        "t_regex_extract": q_t_regex_extract,
        "events_nested": q_events_nested,
        "kg_match_branch": q_kg_match_branch,
        "kg_from_subject": q_kg_from_subject,
        "kg_reverse_edge": q_kg_reverse_edge,
        "kg_final_type": q_kg_final_type,
        "kg_affix_prefix": q_kg_affix_prefix,
        "kg_two_sources": q_kg_two_sources,
        "t_cat": q_t_cat,
        "t_string": q_t_string,
        "t_split_translate": q_t_split_translate,
        "entity_link": q_entity_link,
        "entity_canonical": q_entity_canonical,
        "comention": q_comention,
        "validate_docs": q_validate_docs,
        "pages_web_kg": q_pages_web_kg,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_near": q_dedup_simhash_near,
        "sessionize": q_sessionize,
        "dedup_verified": q_dedup_verified,
        "dedup_clusters": q_dedup_clusters,
        "decontam": q_decontam,
        "url_canon": q_url_canon,
        "url_dedup": q_url_dedup,
        "corpus_stats": q_corpus_stats,
        "web_corpus_prep": q_web_corpus_prep,
        "text_features": q_text_features,
        "ann_topk": q_ann_topk,
        "ann_topk_bucketed": q_ann_topk_bucketed,
        "ann_topk_ivf": q_ann_topk_ivf,
        "emb_near_dup": q_emb_near_dup,
        "emb_near_dup_amp": q_emb_near_dup_amp,
        "semantic_dedup": q_semantic_dedup,
        "onto_closure": q_onto_closure,
        "onto_automap": q_onto_automap,
        "sample_stratified": q_sample_stratified,
        "hash_split": q_hash_split,
        "top_ngrams": q_top_ngrams,
        "rep_signals": q_rep_signals,
        "kg_degree": q_kg_degree,
        "kg_pagerank": q_kg_pagerank,
        "kg_khop": q_kg_khop,
        "kg_diff": q_kg_diff,
        "kg_triangles": q_kg_triangles,
        "kg_bgp": q_kg_bgp,
        "rdf_nt": q_rdf_ntriples,
        "kg_communities": q_kg_communities,
        "kg_walks": q_kg_walks,
        "kg_linkpred": q_kg_linkpred,
        "kg_hits": q_kg_hits,
        "kg_sssp": q_kg_sssp,
        "lm_score": q_lm_score,
        "train_order": q_train_order,
        "dsir_weights": q_dsir_weights,
        "corpus_cube": q_corpus_cube,
        "pq_codes": q_pq_codes,
        "cross_dedup": q_cross_dedup,
        "asof_join": q_asof_join,
        "sample_weighted": q_sample_weighted,
        "sample_poisson": q_sample_poisson,
        "vocab_kmv": q_vocab_kmv,
        "bpe_vocab": q_bpe,
        "pmi_top": q_pmi,
        "range_join": q_range_join,
        "len_quantiles": q_len_quantiles,
        "host_graph": q_host_graph,
        "quality_classifier": q_quality_classifier,
        "pii_scrub": q_pii_scrub,
        "tfidf_terms": q_tfidf_terms,
        "temp_mix": q_temp_mix,
        "boilerplate": q_boilerplate,
        "inv_index": q_inverted_index,
        "kg_kcore": q_kg_kcore,
        "chunk_docs": q_chunk_docs,
        "pack_seq": q_pack_seq,
        "para_dedup": q_para_dedup,
        "dup_ngrams": q_dup_ngrams,
        "scd2_intervals": q_scd2,
        "claim_vote": q_claim_vote,
        "kg_community_graph": q_community_graph,
        "kg_ppr": q_ppr,
        "kg_modularity": q_modularity,
        "interleave_order": q_interleave,
        "bm25_topk": q_bm25,
        "sliding_windows": q_sliding_windows,
        "quality_tiles": q_quality_tiles,
        "norm_text": q_norm_text,
        "dedup_keep": q_dedup_keep,
        "walk_pairs": q_walk_pairs,
        "filter_audit": q_filter_audit,
        "er_pairs": q_er_pairs,
        "dedup_containment": q_containment,
        "event_windows": q_event_windows,
        "lang_confusion": q_lang_confusion,
        "cms_topk": q_cms_topk,
        "sample_group_k": q_group_sample,
        "kg_negatives": q_kg_negatives,
        "bpe_tokenize": q_bpe_apply,
        "corpus_prep": q_corpus_prep,
        "redirect_chains": q_redirects,
        "anchor_profile": q_anchor_profile,
        "phrase_search": q_phrase_search,
        "graph_cycles": q_graph_cycles,
        "robots_filter": q_robots,
        "crawl_budget": q_crawl_budget,
        "host_sim": q_host_sim,
        "kg_transe": q_kg_transe,
        "kg_retract": q_kg_retract,
        "span_dataset": q_span_dataset,
        "frontier_plan": q_frontier,
        "kmv_merge": q_kmv_merge,
        "html_extract": q_html_extract,
        "warc_parse": q_warc_parse,
        "dag_levels": q_dag_levels,
        "kg_profile": q_kg_profile,
        "kg_rpq": q_kg_rpq,
        "scd2_snapshot": q_scd2_snapshot,
        "onto_validate": q_onto_validate,
        "sitemap_parse": q_sitemap_parse,
        "kg_scc": q_kg_scc,
        "bloom_frontier": q_bloom_frontier,
        "kg_typeinfer": q_kg_typeinfer,
        "kg_dangling": q_kg_dangling,
        "edge_partition": q_edge_partition,
        "openie_triples": q_openie_triples,
        "kg_sameas": q_kg_sameas,
        "schema_graph": q_schema_graph,
        "kg_closeness": q_kg_closeness,
        "er_blocking": q_er_blocking,
        "cc_incremental": q_cc_incremental,
        "kg_louvain": q_kg_louvain,
        "kg_clustering": q_kg_clustering,
        "kg_assortativity": q_kg_assortativity,
        "kg_pagerank_w": q_kg_pagerank_w,
        "kg_ktruss": q_kg_ktruss,
        "kg_trussness": q_kg_trussness,
        "kg_rich_club": q_kg_rich_club,
        "allen_audit": q_allen_audit,
        "keyness": q_keyness,
        "kg_eigen": q_kg_eigen,
        "kg_ppr_push": q_kg_ppr_push,
        "kg_salsa": q_kg_salsa,
        "kg_percolation": q_kg_percolation,
        "domain_extract": q_domain_extract,
        "kg_4cliques": q_kg_4cliques,
        "kg_n2v_walks": q_kg_n2v_walks,
        "kg_betweenness": q_kg_betweenness,
        "kg_anf": q_kg_anf,
        "kg_densest": q_kg_densest,
        "er_resolve": q_er_resolve,
        "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
        "dedup_containment_asym": q_dedup_containment_asym,
        "dedup_cosine_l2ap": q_dedup_cosine_l2ap,
        "hll_count": q_hll_count,
        "kg_metapath": q_kg_metapath,
        "dedup_winnow": q_dedup_winnow,
        "dup_spans": q_dup_spans,
        "kg_mis": q_kg_mis,
        "kg_coloring": q_kg_coloring,
        "kg_coloring_blocked": q_kg_coloring_blocked,
        "kg_bridges": q_kg_bridges,
        "kg_2ecc": q_kg_2ecc,
        "kg_cutpoints": q_kg_cutpoints,
        "kg_msf": q_kg_msf,
        "funnel_users": q_funnel,
        "kg_entail": q_kg_entail,
        "temporal_reach": q_temporal_reach,
        "cover_sources": q_cover_sources,
        "kg_butterflies": q_kg_butterflies,
        "kg_njaccard": q_kg_njaccard,
        "dag_reduce": q_dag_reduce,
        "skyline_docs": q_skyline_docs,
        "kg_wl": q_kg_wl,
        "media_image": q_media_image,
        "media_audio": q_media_audio,
        "kg_coreness": q_kg_coreness,
        "kg_matching": q_kg_matching,
        "er_align": q_er_align,
        "kg_diameter": q_kg_diameter,
        "kg_entail_owl": q_kg_entail_owl,
        "kg_reciprocity": q_kg_reciprocity,
        "burst_hosts": q_burst_hosts,
        "kg_katz": q_kg_katz,
        "kg_squares": q_kg_squares,
        "ld_extract": q_ld_extract,
        "kg_lcc": q_kg_lcc,
        "ld_export": q_ld_export,
        "kg_graph_hash": q_kg_graph_hash,
        "kg_transe_filtered": q_kg_transe_filtered,
        "entity_prior": q_entity_prior,
        "entity_disambig": q_entity_disambig,
        "truth_find": q_truth_find,
        "kg_sweep_cut": q_kg_sweep,
        "kg_rank_eval": q_kg_rank_eval,
        "entity_disambig_ctx": q_entity_disambig_ctx,
        "meta_og": q_meta_og,
        "microdata": q_microdata,
        "web_tables": q_web_tables,
        "kg_simrank": q_kg_simrank,
        "kg_twins": q_kg_twins,
        "retrieval_eval": q_retrieval_eval,
        "rake_phrases": q_rake,
        "tables_kg": q_tables_kg,
        "kg_refex": q_kg_refex,
        "kg_label_prop": q_kg_label_prop,
        "zorder_docs": q_zorder,
        "judge_agreement": q_judge_agreement,
        "spot_mentions": q_spot_mentions,
        "readability": q_readability,
        "kg_onion": q_kg_onion,
        "textrank": q_textrank,
        "k_anonymity": q_k_anonymity,
        "url_features": q_url_features,
        "triples_graph": q_triples_graph,
        "kg_bowtie": q_kg_bowtie,
        "script_profile": q_script_profile,
        "table_types": q_table_types,
        "kg_shacl": q_kg_shacl,
        "kg_functional": q_kg_functional,
        "kg_ifp": q_kg_ifp,
        "er_blocking_eval": q_er_blocking_eval,
        "er_fold_keys": q_er_fold_keys,
        "kg_spam_mass": q_kg_spam_mass,
        "kg_partition_quality": q_kg_partition_quality,
        "kg_profile": q_kg_profile,
        "kg_charsets": q_kg_charsets,
        "er_bcubed": q_er_bcubed,
        "hearst_isa": q_hearst,
        "meronym_partof": q_meronym,
        "date_norm": q_dates,
        "temporal_facts": q_temporal_facts,
        "quantity_norm": q_quantities,
        "geo_norm": q_geo,
        "text_kg": q_text_kg,
        "acronym_alias": q_acronyms,
        "change_rate": q_change_rate,
        "breadcrumb_taxonomy": q_breadcrumbs,
        "copula_isa": q_copula,
        "triple_support": q_triple_support,
        "rdfa_triples": q_rdfa,
        "link_rel": q_link_rel,
        "alias_frames": q_aliases,
        "definition_pairs": q_definitions,
        "contrast_frames": q_contrast,
        "cohyponym_pairs": q_cohyponyms,
        "hreflang_clusters": q_hreflang_clusters,
        "appositive_facts": q_appositive,
        "quote_attrib": q_quotes,
        "numeric_facts": q_numeric_facts,
        "page_kg": q_page_kg,
        "breadcrumb_closure": q_breadcrumb_closure,
        "fact_consensus": q_fact_consensus,
        "kv_type_profile": q_kv_types,
        "harvest_yield": q_harvest_yield,
        "citation_mentions": q_citations,
        "identifier_mentions": q_identifiers,
        "md_sections": q_md_sections,
        "section_paths": q_section_paths,
        "section_text": q_section_text,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

# case-PRESERVING fingerprint — the exact-family collapse key (shingle /
# minhash signatures are case-sensitive, so the collapse must not lowercase;
# mirrors textops.fingerprint_cs). The lowercased exact-dup fingerprint is
# built locally in oracle_sql() for the operators that define exact-dup as
# case-insensitive (dedup_exact, text_features, corpus_prep).
_NORM_TEXT_CS_SQL = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
_FINGERPRINT_CS_SQL = _SQL_MD5INT.format(x=_NORM_TEXT_CS_SQL)


def _minhash_sql_parts(
    num_hashes: int = 16, bands: int = 4, k: int = 3, collapse: bool = False
) -> str:
    """CTE SQL reproducing dedup.minhash_bands in DuckDB.

    ``collapse=True`` mirrors dedup's exact-family collapse (the default
    Spark path): only each exact-duplicate family's canonical doc (min id)
    is shingled/banded, and a ``star`` CTE carries the (canonical, member)
    re-expansion edges."""
    hash_exprs = ",\n      ".join(
        _SQL_MD5INT.format(x=f"'{i}' || chr(31) || s") + f" AS h{i}"
        for i in range(num_hashes)
    )
    min_exprs = ", ".join(f"min(h{i}) AS h{i}" for i in range(num_hashes))
    rows_per_band = num_hashes // bands
    band_selects = []
    for b in range(bands):
        cols = [f"h{b * rows_per_band + j}" for j in range(rows_per_band)]
        concat = " || ',' || ".join(f"{c}::VARCHAR" for c in cols)
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS band_key FROM sigs"
        )
    bands_sql = "\n      UNION ALL\n      ".join(band_selects)
    if collapse:
        prefix = f"""
    WITH fam AS (
      SELECT doc_id, {_FINGERPRINT_CS_SQL} AS fp FROM documents
    ), canon AS (
      SELECT fp, min(doc_id) AS canonical FROM fam GROUP BY fp
    ), star AS (
      SELECT c.canonical AS a, f.doc_id AS b
      FROM fam f JOIN canon c ON f.fp = c.fp
      WHERE f.doc_id <> c.canonical
    ), canon_docs AS (
      SELECT d.* FROM documents d JOIN canon c ON d.doc_id = c.canonical
    ), toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
      FROM canon_docs
    ), sh AS ("""
    else:
        prefix = """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
      FROM documents
    ), sh AS ("""
    return prefix + f"""
      SELECT DISTINCT doc_id, s
      FROM toks, UNNEST(list_transform(
        range(1, greatest(len(l) - {k - 1}, 1) + 1),
        i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]
      )) AS t(s)
    ), hashes AS (
      SELECT doc_id,
      {hash_exprs}
      FROM sh
    ), sigs AS (
      SELECT doc_id, {min_exprs} FROM hashes GROUP BY doc_id
    ), banded AS (
      {bands_sql}
    )"""


def _shingle_sql(k: int = 3, max_df: int | None = None) -> str:
    """Shared shingle CTEs; with ``max_df`` the stop-shingle filter drops
    shingles in more than max_df docs BEFORE the per-doc counts (matching
    dedup.jaccard_pairs(max_shingle_df=...))."""
    base = f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
      FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id, s
      FROM toks, UNNEST(list_transform(
        range(1, greatest(len(l) - {k - 1}, 1) + 1),
        i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]
      )) AS t(s)
    )"""
    if max_df is None:
        return base + """, sh AS (
      SELECT * FROM sh0
    ), counts AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    )"""
    return base + f""", hot AS (
      SELECT s FROM sh0 GROUP BY s HAVING count(*) > {max_df}
    ), sh AS (
      SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)
    ), counts AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    )"""


def _simhash_sql(bits: int = 16) -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << b}::BIGINT ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, t
      FROM (SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t
            FROM documents)
    ), hashed AS (
      SELECT doc_id, {_SQL_MD5INT.format(x='t')} AS h FROM toks
    )
    SELECT doc_id, ({bit_terms}) AS simhash
    FROM hashed GROUP BY doc_id"""


_LANG_MARKERS_SQL = {
    "de": "der|die|und|ist|mit",
    "en": "the|and|of|is|with",
    "es": "el|la|de|que|con",
    "fr": "le|la|et|est|dans",
}


def _lang_id_sql(col: str = "text") -> str:
    counts = {
        lang: f"len(regexp_extract_all(lower({col}), '\\b({words})\\b', 1))"
        for lang, words in _LANG_MARKERS_SQL.items()
    }
    # fixed key order, strict > beats earlier candidates (matches textops.lang_id)
    expr = "'und'"
    score = "0"
    for lang in sorted(counts):
        expr = f"(CASE WHEN {counts[lang]} > {score} THEN '{lang}' ELSE {expr} END)"
        score = f"greatest({counts[lang]}, {score})"
    return expr


def _quality_sql(col: str = "text") -> str:
    stop = "the|a|an|and|or|of|to|in|is|it"
    n_chars = f"length({col})::DOUBLE"
    n_toks = f"len(regexp_split_to_array(trim({col}), '\\s+'))::DOUBLE"
    stop_hits = f"len(regexp_extract_all(lower({col}), '\\b({stop})\\b', 1))::DOUBLE"
    punct = f"({n_chars} - length(regexp_replace({col}, '[.,;:!?]', '', 'g')))::DOUBLE"
    length_factor = f"least({n_chars} / 500.0, 1.0)"
    punct_ratio = f"({punct} / greatest({n_chars}, 1.0))"
    punct_factor = f"(CASE WHEN {punct_ratio} < 0.1 THEN 1.0 ELSE 1.0 - {punct_ratio} END)"
    stop_factor = f"least({stop_hits} / greatest({n_toks}, 1.0) * 5.0, 1.0)"
    return (f"(floor(({length_factor} * 0.4 + {punct_factor} * 0.3 + {stop_factor} * 0.3)"
            " * 10000 + 0.5) / 10000)")


_COS_SQL = (
    "(floor((list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))) "
    "* 10000 + 0.5) / 10000)"
)

def _cos_raw_sql(x: str, y: str) -> str:
    """Unrounded cosine between two FLOAT[] expressions (double promotion
    and summation order match similarity.cosine bit-for-bit)."""
    return (
        f"(list_dot_product({x}::DOUBLE[], {y}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({x}::DOUBLE[], {x}::DOUBLE[])) * "
        f"sqrt(list_dot_product({y}::DOUBLE[], {y}::DOUBLE[]))))"
    )


def _ivf_sql(n_centroids: int = 8, nprobe: int = 2, k: int = 5) -> str:
    """CTE SQL reproducing similarity.topk_ivf: deterministic centroids =
    lowest-id vectors; assignment AND probe-list ties -> lowest cid (the
    shared _centroid_scores sort key is (cos, -cid))."""
    cos_ac = _cos_raw_sql("a.embedding", "c.cvec")
    cos_bc = _cos_raw_sql("b.embedding", "c.cvec")
    cos_pa = (
        "(floor((" + _cos_raw_sql("a.cv", "p.pv") + ") * 10000 + 0.5) / 10000)"
    )
    return f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      ORDER BY vec_id LIMIT {n_centroids}
    ), assign AS (
      SELECT neighbor_id, cv, cid AS list_id FROM (
        SELECT a.vec_id AS neighbor_id, a.embedding AS cv, c.cid,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {cos_ac} DESC, c.cid ASC) AS rn
        FROM embeddings a CROSS JOIN cents c
      ) WHERE rn = 1
    ), plists AS (
      SELECT probe_id, pv, cid AS list_id FROM (
        SELECT b.vec_id AS probe_id, b.embedding AS pv, c.cid,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {cos_bc} DESC, c.cid ASC) AS rn
        FROM embeddings b CROSS JOIN cents c WHERE b.vec_id < 5
      ) WHERE rn <= {nprobe}
    ), scored AS (
      SELECT p.probe_id, a.neighbor_id, {cos_pa} AS cos
      FROM assign a JOIN plists p USING (list_id)
      WHERE p.probe_id <> a.neighbor_id
    )
    SELECT probe_id, neighbor_id, cos, rank FROM (
      SELECT *, row_number() OVER
        (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}"""


_BUCKET_SQL = "".join(
    f"(CASE WHEN {{t}}.embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END) || "
    for i in range(8)
)[:-4]  # drop trailing " || "


def _bucket_sql_at(t: str, dims: int = 8, offset: int = 0) -> str:
    """Sign-bucket SQL over dims starting at 0-based ``offset`` (the
    dedup.sign_bucket_at per-table slice; testdata vectors are 64-dim so no
    wrap is needed at these offsets)."""
    return "".join(
        f"(CASE WHEN {t}.embedding[{offset + i + 1}] >= 0 THEN '1' ELSE '0' END) || "
        for i in range(dims)
    )[:-4]


def _pagerank_sql(iterations: int = 5, scale: int = 1_000_000, damping: int = 85) -> str:
    """Unrolled integer power iteration mirroring graphstats.
    pagerank_fixed_point — one CTE per iteration, '//' integer division
    (same truncation as Spark's DIV on positives), exact BIGINT sums."""
    teleport = (100 - damping) * scale // 100
    parts = [f"""
    WITH edges AS (
      SELECT doc_id::VARCHAR || ':document' AS src, lang || ':language' AS dst
      FROM documents
      UNION ALL
      SELECT doc_id::VARCHAR || ':document', source || ':source' FROM documents
    ), e AS (
      SELECT DISTINCT src AS s, dst AS d FROM edges
    ), outd AS (
      SELECT s, count(*) AS od FROM e GROUP BY s
    ), nodes AS (
      SELECT s AS node FROM e UNION SELECT d FROM e
    ), r0 AS (
      SELECT node, {scale}::BIGINT AS "rank" FROM nodes
    )"""]
    for i in range(1, iterations + 1):
        parts.append(f""", r{i} AS (
      SELECT n.node,
             ({teleport} + ({damping} * coalesce(t.inb, 0)) // 100)::BIGINT AS "rank"
      FROM nodes n LEFT JOIN (
        SELECT e.d AS node, sum(r."rank" // o.od) AS inb
        FROM e JOIN outd o ON e.s = o.s JOIN r{i - 1} r ON r.node = e.s
        GROUP BY e.d
      ) t ON t.node = n.node
    )""")
    parts.append(f'\n    SELECT node, "rank" FROM r{iterations}')
    return "".join(parts)


def _pagerank_w_sql(iterations: int = 3, scale: int = 1_000_000, damping: int = 85) -> str:
    """Unrolled WEIGHTED integer power iteration mirroring
    pagerank_fixed_point(weight_col=...) over the md5-weighted doc graph:
    parallel rows sum into the edge weight, contribution rank*w//out_w."""
    teleport = (100 - damping) * scale // 100
    w_expr = "1 + " + _SQL_MD5INT.format(x="'w:' || src || '>' || dst") + " % 9"
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS MATERIALIZED (
      SELECT s, d, sum(w)::BIGINT AS w FROM (
        SELECT src AS s, dst AS d, {w_expr} AS w FROM raw
      ) GROUP BY s, d
    ), outd AS (
      SELECT s, sum(w)::BIGINT AS od FROM e GROUP BY s
    ), nodes AS (
      SELECT s AS node FROM e UNION SELECT d FROM e
    ), r0 AS (
      SELECT node, {scale}::BIGINT AS "rank" FROM nodes
    )"""]
    for i in range(1, iterations + 1):
        parts.append(f""", r{i} AS MATERIALIZED (
      SELECT n.node,
             ({teleport} + ({damping} * coalesce(t.inb, 0)) // 100)::BIGINT AS "rank"
      FROM nodes n LEFT JOIN (
        SELECT e.d AS node, sum(r."rank" * e.w // o.od) AS inb
        FROM e JOIN outd o ON e.s = o.s JOIN r{i - 1} r ON r.node = e.s
        GROUP BY e.d
      ) t ON t.node = n.node
    )""")
    parts.append(f'\n    SELECT node, "rank" FROM r{iterations}')
    return "".join(parts)


def _ppr_sql(iterations: int = 5, scale: int = 1_000_000, damping: int = 85) -> str:
    """Unrolled integer PERSONALIZED power iteration mirroring graphstats.
    personalized_pagerank over the sparse doc graph, seeds = every 101st
    document node."""
    teleport = (100 - damping) * scale // 100
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS (
      SELECT DISTINCT src AS s, dst AS d FROM raw
    ), outd AS (
      SELECT s, count(*) AS od FROM e GROUP BY s
    ), nodes AS (
      SELECT s AS node FROM e UNION SELECT d FROM e
    ), seeds AS (
      SELECT DISTINCT 'n' || doc_id::VARCHAR AS node FROM documents
      WHERE doc_id % 101 = 0
    ), ns AS (
      SELECT n.node, CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS is_seed
      FROM nodes n LEFT JOIN seeds sd ON sd.node = n.node
    ), r0 AS (
      SELECT node, (is_seed * {scale})::BIGINT AS "rank" FROM ns
    )"""]
    for i in range(1, iterations + 1):
        parts.append(f""", r{i} AS (
      SELECT n.node,
             (n.is_seed * {teleport}
              + ({damping} * coalesce(t.inb, 0)) // 100)::BIGINT AS "rank"
      FROM ns n LEFT JOIN (
        SELECT e.d AS node, sum(r."rank" // o.od) AS inb
        FROM e JOIN outd o ON e.s = o.s JOIN r{i - 1} r ON r.node = e.s
        GROUP BY e.d
      ) t ON t.node = n.node
    )""")
    parts.append(f'\n    SELECT node, "rank" FROM r{iterations}')
    return "".join(parts)


def _lpa_sql(rounds: int = 3) -> str:
    """Unrolled synchronous label propagation mirroring graphstats.
    label_propagation over the hub co-citation graph — one CTE per round,
    window argmax (count DESC, label ASC) instead of Spark's min_by
    struct: same semantics, independent formulation."""
    parts = ["""
    WITH raw AS (
      SELECT 'hub' || ((doc_id*7)%61)::VARCHAR AS a,
             'hub' || ((doc_id*11)%53)::VARCHAR AS b
      FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
    ), sym AS (
      SELECT DISTINCT a, b FROM (
        SELECT a, b FROM raw UNION ALL SELECT b AS a, a AS b FROM raw
      ) WHERE a <> b
    ), lab0 AS (
      SELECT DISTINCT a AS node, a AS community FROM sym
    )"""]
    for i in range(1, rounds + 1):
        parts.append(f""", lab{i} AS (
      SELECT node, community FROM (
        SELECT s.a AS node, l.community AS community,
               row_number() OVER (
                 PARTITION BY s.a
                 ORDER BY count(*) DESC, l.community ASC) AS rn
        FROM sym s JOIN lab{i - 1} l ON l.node = s.b
        GROUP BY s.a, l.community
      ) WHERE rn = 1
    )""")
    parts.append(f"\n    SELECT node, community FROM lab{rounds}")
    return "".join(parts)


def _walks_sql(walk_length: int = 3, seed: int = 0) -> str:
    """Unrolled hash-min random walks mirroring graphstats.random_walks
    over the sparse doc graph — one arg_min CTE per step, an independent
    engine + formulation of the same deterministic walk."""
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS (
      SELECT DISTINCT s, d FROM (
        SELECT src AS s, dst AS d FROM raw
        UNION ALL SELECT dst AS s, src AS d FROM raw
      ) WHERE s <> d
    ), w0 AS (
      SELECT DISTINCT s || '#0' AS walk_id, s AS node FROM e
    )"""]
    for i in range(1, walk_length + 1):
        hi = _SQL_MD5INT.format(x=f"w.walk_id || ':{seed}:{i}:' || e.d")
        parts.append(f""", w{i} AS (
      SELECT walk_id, arg_min(d, lpad(h::VARCHAR, 20, '0') || d) AS node
      FROM (SELECT w.walk_id, e.d, {hi} AS h
            FROM w{i - 1} w JOIN e ON w.node = e.s)
      GROUP BY walk_id
    )""")
    selects = [
        f"SELECT walk_id, {i} AS step, node FROM w{i}"
        for i in range(walk_length + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


def _n2v_sql(walk_length: int = 3, wr: int = 4, wn: int = 2,
             wf: int = 1, seed: int = 0) -> str:
    """Unrolled node2vec-biased walks mirroring graphstats.node2vec_walks:
    per step the same adjacency probe, weight CASE (return/near/far) and
    integer-DIV hash priority, arg_min on the padded composite key."""
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS MATERIALIZED (
      SELECT DISTINCT s, d FROM (
        SELECT src AS s, dst AS d FROM raw
        UNION ALL SELECT dst AS s, src AS d FROM raw
      ) WHERE s <> d
    ), w0 AS (
      SELECT DISTINCT s || '#0' AS walk_id, s AS node,
             CAST(NULL AS VARCHAR) AS prev
      FROM e
    )"""]
    for i in range(1, walk_length + 1):
        hi = _SQL_MD5INT.format(x=f"w.walk_id || ':{seed}:{i}:' || e.d")
        parts.append(f""", c{i} AS (
      SELECT w.walk_id, e.d,
             ({hi}) // (CASE WHEN e.d = w.prev THEN {wr}
                             WHEN adj.s IS NOT NULL THEN {wn}
                             ELSE {wf} END) AS pr
      FROM w{i - 1} w
      JOIN e ON w.node = e.s
      LEFT JOIN e adj ON adj.s = w.prev AND adj.d = e.d
    ), w{i} AS MATERIALIZED (
      SELECT c.walk_id,
             arg_min(c.d, lpad(c.pr::VARCHAR, 20, '0') || c.d) AS node,
             any_value(p.node) AS prev
      FROM c{i} c JOIN w{i - 1} p ON c.walk_id = p.walk_id
      GROUP BY c.walk_id
    )""")
    selects = [
        f"SELECT walk_id, {i} AS step, node FROM w{i}"
        for i in range(walk_length + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


def _linkpred_sql(max_degree: int = 16, min_common: int = 2,
                  scale: int = 1_000_000) -> str:
    """Common-neighbor + integer Resource-Allocation link prediction
    mirroring graphstats.link_prediction_scores over the sparse doc graph
    (degree CTE -> capped wedge join -> anti-join against existing edges)."""
    return f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM raw WHERE src <> dst
    ), deg AS (
      SELECT z, count(*) AS dz FROM (
        SELECT u AS z FROM e UNION ALL SELECT v FROM e
      ) GROUP BY z
    ), adj AS (
      SELECT t.z, t.n, deg.dz FROM (
        SELECT u AS z, v AS n FROM e UNION ALL SELECT v AS z, u AS n FROM e
      ) t JOIN deg ON t.z = deg.z WHERE deg.dz <= {max_degree}
    ), scored AS (
      SELECT l.n AS a, r.n AS b, count(*) AS common,
             CAST(sum(CAST({scale} AS BIGINT) // l.dz) AS BIGINT) AS ra_score
      FROM adj l JOIN adj r ON l.z = r.z AND l.n < r.n
      GROUP BY l.n, r.n
    )
    SELECT a, b, common, ra_score FROM scored s
    WHERE common >= {min_common}
      AND NOT EXISTS (SELECT 1 FROM e WHERE e.u = s.a AND e.v = s.b)
    """


def _hits_sql(iterations: int = 4, scale: int = 1_000_000) -> str:
    """Unrolled max-normalized integer HITS mirroring graphstats.
    hits_fixed_point over the sparse doc graph — two CTEs (raw sum,
    scalar-subquery max rescale) per half-round."""
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS (
      SELECT DISTINCT src AS s, dst AS d FROM raw WHERE src <> dst
    ), nodes AS (
      SELECT s AS node FROM e UNION SELECT d FROM e
    ), h0 AS (
      SELECT node, CAST({scale} AS BIGINT) AS hub FROM nodes
    )"""]
    for i in range(1, iterations + 1):
        parts.append(f""", ar{i} AS MATERIALIZED (
      SELECT n.node, CAST(coalesce(t.x, 0) AS BIGINT) AS auth
      FROM nodes n LEFT JOIN (
        SELECT e.d AS node, sum(h.hub) AS x
        FROM e JOIN h{i - 1} h ON h.node = e.s GROUP BY e.d
      ) t ON t.node = n.node
    ), a{i} AS MATERIALIZED (
      SELECT node, CAST(auth * CAST({scale} AS BIGINT) //
                        greatest((SELECT max(auth) FROM ar{i}), 1) AS BIGINT) AS auth
      FROM ar{i}
    ), hr{i} AS MATERIALIZED (
      SELECT n.node, CAST(coalesce(t.x, 0) AS BIGINT) AS hub
      FROM nodes n LEFT JOIN (
        SELECT e.s AS node, sum(a.auth) AS x
        FROM e JOIN a{i} a ON a.node = e.d GROUP BY e.s
      ) t ON t.node = n.node
    ), h{i} AS MATERIALIZED (
      SELECT node, CAST(hub * CAST({scale} AS BIGINT) //
                        greatest((SELECT max(hub) FROM hr{i}), 1) AS BIGINT) AS hub
      FROM hr{i}
    )""")
    parts.append(f"""
    SELECT h.node, h.hub, a.auth
    FROM h{iterations} h JOIN a{iterations} a ON h.node = a.node""")
    return "".join(parts)


def _sssp_sql(rounds: int = 6) -> str:
    """Unrolled exact-rounds Bellman-Ford mirroring graphstats.
    shortest_paths over the md5-weighted sparse doc graph."""
    w_expr = "1 + " + _SQL_MD5INT.format(x="'w:' || src || '>' || dst") + " % 9"
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS (
      SELECT s, d, min(w) AS w FROM (
        SELECT src AS s, dst AS d, {w_expr} AS w FROM raw
      ) GROUP BY s, d
    ), d0 AS (
      SELECT DISTINCT 'n' || doc_id::VARCHAR AS node, CAST(0 AS BIGINT) AS dist
      FROM documents WHERE doc_id % 97 = 0
    )"""]
    for i in range(1, rounds + 1):
        parts.append(f""", d{i} AS MATERIALIZED (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.d AS node, p.dist + e.w AS dist
        FROM d{i - 1} p JOIN e ON p.node = e.s
      ) GROUP BY node
    )""")
    parts.append(f"\n    SELECT node, dist FROM d{rounds}")
    return "".join(parts)


def _closeness_sql(rounds: int = 4, scale: int = 10**6) -> str:
    """Unrolled per-landmark BFS (hop weights) mirroring graphstats.
    landmark_distances + the harmonic_closeness rollup. Unlike _sssp_sql
    the landmark id rides in the relaxation key."""
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS MATERIALIZED (
      SELECT DISTINCT src AS s, dst AS d FROM raw
    ), d0 AS (
      SELECT DISTINCT 'n' || doc_id::VARCHAR AS landmark,
             'n' || doc_id::VARCHAR AS node, CAST(0 AS BIGINT) AS dist
      FROM documents WHERE doc_id % 97 = 0
    )"""]
    for i in range(1, rounds + 1):
        parts.append(f""", d{i} AS MATERIALIZED (
      SELECT landmark, node, min(dist) AS dist FROM (
        SELECT landmark, node, dist FROM d{i - 1}
        UNION ALL
        SELECT p.landmark, e.d AS node, p.dist + 1 AS dist
        FROM d{i - 1} p JOIN e ON p.node = e.s
      ) GROUP BY landmark, node
    )""")
    parts.append(f"""
    SELECT node, count(*) AS n_landmarks,
           sum({scale} // dist)::BIGINT AS harmonic
    FROM d{rounds} WHERE dist > 0 GROUP BY node""")
    return "".join(parts)


def _louvain_sql(rounds: int = 2) -> str:
    """Unrolled monotone-descent Louvain move rounds mirroring
    graphstats.louvain_move over the weighted residue graph: per round the
    same k_ac / community-total / candidate / score CTEs, argmin via
    row_number (score DESC, stay-first, community ASC)."""
    parts = ["""
    WITH raw AS (
      SELECT 'd' || (doc_id % 500) AS a, 'd' || ((doc_id % 500 * 3 + 1) % 500) AS b
      FROM documents
    ), sym AS MATERIALIZED (
      SELECT a, b, sum(w)::BIGINT AS w FROM (
        SELECT a, b, 1 AS w FROM raw WHERE a <> b
        UNION ALL
        SELECT b AS a, a AS b, 1 AS w FROM raw WHERE a <> b
      ) GROUP BY a, b
    ), deg AS MATERIALIZED (
      SELECT a, sum(w)::BIGINT AS k FROM sym GROUP BY a
    ), m2t AS MATERIALIZED (
      SELECT sum(k)::BIGINT AS m2 FROM deg
    ), lab0 AS (
      SELECT a AS node, a AS community FROM deg
    )"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f""", kac{i} AS MATERIALIZED (
      SELECT s.a AS node, l.community, sum(s.w)::BIGINT AS k_ac
      FROM sym s JOIN lab{p} l ON s.b = l.node GROUP BY s.a, l.community
    ), tot{i} AS MATERIALIZED (
      SELECT l.community, sum(d.k)::BIGINT AS tot
      FROM lab{p} l JOIN deg d ON l.node = d.a GROUP BY l.community
    ), cand{i} AS (
      SELECT node, community, max(k_ac)::BIGINT AS k_ac FROM (
        SELECT node, community, k_ac FROM kac{i}
        UNION ALL
        SELECT node, community, 0 AS k_ac FROM lab{p}
      ) GROUP BY node, community
    ), scored{i} AS MATERIALIZED (
      SELECT c.node, c.community,
             (m.m2 * c.k_ac
              - (t.tot - CASE WHEN c.community = o.community THEN d.k ELSE 0 END)
                * d.k) AS score,
             CASE WHEN c.community = o.community THEN 0 ELSE 1 END AS mv
      FROM cand{i} c
      JOIN tot{i} t ON c.community = t.community
      JOIN lab{p} o ON c.node = o.node
      JOIN deg d ON c.node = d.a
      CROSS JOIN m2t m
      WHERE c.community <= o.community
    ), lab{i} AS MATERIALIZED (
      SELECT node, community FROM (
        SELECT node, community,
               row_number() OVER (PARTITION BY node
                 ORDER BY score DESC, mv, community) AS rk
        FROM scored{i}
      ) WHERE rk = 1
    )""")
    parts.append(f"\n    SELECT node, community FROM lab{rounds}")
    return "".join(parts)


def _betweenness_sql(rounds: int = 3, scale: int = 10**6) -> str:
    """Unrolled bounded-Brandes betweenness mirroring graphstats.
    betweenness_landmark: per-landmark BFS dist CTEs, exact sigma path
    counts per level, scaled-integer delta accumulation backward."""
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS MATERIALIZED (
      SELECT DISTINCT src AS s, dst AS d FROM raw WHERE src <> dst
    ), d0 AS (
      SELECT DISTINCT 'n' || doc_id::VARCHAR AS landmark,
             'n' || doc_id::VARCHAR AS node, CAST(0 AS BIGINT) AS dist
      FROM documents WHERE doc_id % 97 = 0
    )"""]
    for i in range(1, rounds + 1):
        parts.append(f""", d{i} AS MATERIALIZED (
      SELECT landmark, node, min(dist) AS dist FROM (
        SELECT landmark, node, dist FROM d{i - 1}
        UNION ALL
        SELECT p.landmark, e.d AS node, p.dist + 1 AS dist
        FROM d{i - 1} p JOIN e ON p.node = e.s
      ) GROUP BY landmark, node
    )""")
    parts.append(f""", s0 AS (
      SELECT landmark, node, CAST(1 AS BIGINT) AS sigma
      FROM d{rounds} WHERE dist = 0
    )""")
    for t in range(1, rounds + 1):
        parts.append(f""", s{t} AS MATERIALIZED (
      SELECT p.landmark, e.d AS node, sum(p.sigma)::BIGINT AS sigma
      FROM s{t - 1} p
      JOIN e ON p.node = e.s
      JOIN d{rounds} dd ON dd.landmark = p.landmark AND dd.node = e.d
                        AND dd.dist = {t}
      GROUP BY p.landmark, e.d
    )""")
    sig_union = "\n        UNION ALL ".join(
        f"SELECT landmark, node, {t} AS dist, sigma FROM s{t}"
        for t in range(rounds + 1)
    )
    parts.append(f""", sall AS MATERIALIZED (
        {sig_union}
    )""")
    prev_delta = None
    for t in range(rounds - 1, 0, -1):
        dw = (
            f"coalesce(dl.delta, 0)" if prev_delta else "0"
        )
        dj = (
            f"LEFT JOIN {prev_delta} dl ON dl.landmark = w.landmark"
            f" AND dl.node = w.node" if prev_delta else ""
        )
        parts.append(f""", del{t} AS MATERIALIZED (
      SELECT v.landmark, v.node,
             sum(v.sigma * ({scale} + {dw}) // w.sigma)::BIGINT AS delta
      FROM sall v
      JOIN e ON v.node = e.s
      JOIN sall w ON w.landmark = v.landmark AND w.node = e.d
                  AND w.dist = {t + 1}
      {dj}
      WHERE v.dist = {t}
      GROUP BY v.landmark, v.node
    )""")
        prev_delta = f"del{t}"
    del_union = "\n        UNION ALL ".join(
        f"SELECT node, delta FROM del{t}" for t in range(1, rounds)
    )
    parts.append(f"""
    SELECT node, sum(delta)::BIGINT AS betweenness FROM (
        {del_union}
    ) GROUP BY node""")
    return "".join(parts)


def _bm25_sql(terms: list[str], k: int = 25) -> str:
    """Okapi BM25 mirroring textops.bm25_topk: identical expression tree
    (association order matters — the score is an FP sum in written term
    order) with k1=1.2, b=0.75."""
    tf_cols = ",\n                     ".join(
        f"sum(CASE WHEN t = '{t}' THEN 1 ELSE 0 END)::BIGINT AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n                     ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{i}"
        for i in range(len(terms))
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    score = "\n                     + ".join(
        f"ln(1.0 + (n_docs::DOUBLE - df{i}::DOUBLE + 0.5) / (df{i}::DOUBLE + 0.5))"
        f" * (tf{i}::DOUBLE * 2.2000000000000002)"
        f" / (tf{i}::DOUBLE + 1.2 * (0.25 + 0.75 * (dl::DOUBLE"
        f" / (total_toks::DOUBLE / n_docs::DOUBLE))))"
        for i in range(len(terms))
    )
    return f"""
            WITH dl AS (
              SELECT doc_id,
                     len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS dl
              FROM documents
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_toks
              FROM dl
            ), tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
              FROM documents
            ), per_doc AS (
              SELECT doc_id,
                     {tf_cols}
              FROM tok WHERE t IN ({in_list}) GROUP BY doc_id
            ), dfs AS (
              SELECT {df_cols}
              FROM per_doc
            ), scored AS (
              SELECT p.doc_id,
                     ({score}) AS s
              FROM per_doc p JOIN dl USING (doc_id)
              CROSS JOIN stats CROSS JOIN dfs
            )
            SELECT doc_id, floor(s * 10000 + 0.5) / 10000 AS score
            FROM scored ORDER BY s DESC, doc_id LIMIT {k}
    """


def _bpe_apply_sql(k: int = 6) -> str:
    """Unrolled train-then-apply BPE mirroring textops.bpe_merges +
    bpe_apply: the same v-chain as the bpe_vocab oracle but carrying the
    word through every merge round, then the per-doc token rollup."""
    parts = [
        """
    WITH dw AS MATERIALIZED (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents
      ) WHERE w <> ''
    ), words AS MATERIALIZED (
      SELECT w, count(*) AS freq FROM dw GROUP BY w
    ), a0 AS MATERIALIZED (
      SELECT w, '  ' || list_aggregate(regexp_split_to_array(w, ''),
                                       'string_agg', '  ')
             || '  </w>  ' AS s, freq
      FROM words
    )"""
    ]
    for r in range(1, k + 1):
        parts.append(f""", p{r} AS MATERIALIZED (
      SELECT x.l[i] AS a, x.l[i + 1] AS b, CAST(sum(x.freq) AS BIGINT) AS cnt
      FROM (SELECT regexp_split_to_array(trim(s), '  ') AS l, freq
            FROM a{r - 1}) x,
           UNNEST(range(1, len(x.l))) AS t(i)
      GROUP BY 1, 2
    ), t{r} AS MATERIALIZED (
      SELECT a, b FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
    ), a{r} AS MATERIALIZED (
      SELECT v.w, replace(v.s, ' ' || t.a || '  ' || t.b || ' ',
                          ' ' || t.a || t.b || ' ') AS s, v.freq
      FROM a{r - 1} v CROSS JOIN t{r} t
    )""")
    parts.append(f""", tokc AS (
      SELECT w, len(regexp_split_to_array(trim(s), '  ')) - 1 AS n
      FROM a{k}
    )
    SELECT dw.doc_id, count(*)::BIGINT AS n_words,
           sum(tokc.n)::BIGINT AS n_bpe_tokens
    FROM dw JOIN tokc USING (w)
    GROUP BY dw.doc_id""")
    return "".join(parts)


def _url_canon_sql(col: str) -> str:
    from ontoweaver_spark.urls import canonical_url_sql

    return canonical_url_sql(col)


def _transe_sql(
    dim: int = 4,
    mod: int = 1000,
    tail_expr: str = "(doc_id * 7) % 50",
    filtered: bool = False,
) -> str:
    """Mirror of similarity.hash_transe_rank: md5-derived integer
    embeddings, L1 score, rank against all candidates. ``filtered``
    mirrors the FB15k protocol via an anti-join condition: a corruption
    that is a KNOWN true (head, rel, candidate) triple never counts."""

    def emb(prefix: str, name: str, d: int) -> str:
        x = f"'{prefix}:' || {name} || ':{d}'"
        return f"(({_SQL_MD5INT.format(x=x)}) % {mod})"

    def l1(tail_name: str, qual: str = "") -> str:
        return " + ".join(
            f"abs({emb('e', qual + 'head', d)} + {emb('r', qual + 'rel', d)}"
            f" - {emb('e', tail_name, d)})"
            for d in range(dim)
        )

    if filtered:
        join_known = (
            "LEFT JOIN t k ON k.head = s.head AND k.rel = s.rel"
            " AND k.tail = cand.candidate"
        )
        better = "cscore < score AND known IS NULL"
        known_col = ", k.tail AS known"
    else:
        join_known = ""
        better = "cscore < score"
        known_col = ""
    return f"""
        WITH t AS MATERIALIZED (
          SELECT DISTINCT 'e' || (doc_id % 50) AS head,
                 'r' || (doc_id % 3) AS rel,
                 'e' || ({tail_expr}) AS tail
          FROM documents
        ), cand AS (
          SELECT 'e' || doc_id AS candidate FROM documents WHERE doc_id < 50
        ), scored AS (
          SELECT head, rel, tail, ({l1('tail')})::BIGINT AS score FROM t
        ), x AS (
          SELECT s.head, s.rel, s.tail, s.score,
                 ({l1('candidate', 's.')})::BIGINT AS cscore{known_col}
          FROM scored s CROSS JOIN cand {join_known}
        )
        SELECT head, rel, tail, score,
               (1 + sum(CASE WHEN {better} THEN 1 ELSE 0 END))::INT
                 AS rank
        FROM x GROUP BY head, rel, tail, score
    """


def _sweep_sql(rounds: int = 4) -> str:
    """Mirror of graphstats.ppr_sweep_cut over the forward-push PPR
    vector: rank by score*1e6//deg (desc, score desc, node asc), per-rank
    cumulative volume and open-close cut counts, conductance ppm."""
    big = 1 << 62
    return f"""
    WITH ppr AS MATERIALIZED (
      {_ppr_push_sql(rounds=rounds)}
    ), raw2 AS (
      SELECT 'hub' || ((doc_id*7)%61)::VARCHAR AS s,
             'hub' || ((doc_id*11)%53)::VARCHAR AS d
      FROM documents
    ), und AS MATERIALIZED (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
      FROM raw2 WHERE s <> d
    ), deg AS MATERIALIZED (
      SELECT node, count(*)::BIGINT AS deg FROM (
        SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
      ) GROUP BY node
    ), cand AS (
      SELECT p.node, p.est::BIGINT AS score, deg.deg,
             ((p.est * 1000000) // deg.deg)::BIGINT AS k
      FROM ppr p JOIN deg ON deg.node = p.node
      WHERE p.est > 0
    ), ranked AS MATERIALIZED (
      SELECT node, score, deg,
             row_number() OVER (ORDER BY k DESC, score DESC, node ASC)::BIGINT
               AS rank
      FROM cand
    ), e2 AS MATERIALIZED (
      SELECT least(coalesce(ra.rank, {big}), coalesce(rb.rank, {big})) AS rmin,
             greatest(coalesce(ra.rank, {big}), coalesce(rb.rank, {big})) AS rmax
      FROM und
      LEFT JOIN ranked ra ON ra.node = und.a
      LEFT JOIN ranked rb ON rb.node = und.b
    ), opened AS (
      SELECT rmin AS rank, count(*)::BIGINT AS o FROM e2
      WHERE rmin < {big} GROUP BY rmin
    ), closed AS (
      SELECT rmax AS rank, count(*)::BIGINT AS c FROM e2
      WHERE rmax < {big} GROUP BY rmax
    ), tv AS (
      SELECT (2 * count(*))::BIGINT AS tv FROM und
    ), curve AS (
      SELECT r.rank, r.node, r.score, r.deg,
             sum(r.deg) OVER w::BIGINT AS vol,
             (sum(coalesce(o.o, 0)) OVER w
              - sum(coalesce(c.c, 0)) OVER w)::BIGINT AS cut,
             tv.tv
      FROM ranked r
      LEFT JOIN opened o ON o.rank = r.rank
      LEFT JOIN closed c ON c.rank = r.rank
      CROSS JOIN tv
      WINDOW w AS (ORDER BY r.rank ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT rank, node, score, deg, vol, cut,
           CASE WHEN least(vol, tv - vol) > 0
                THEN ((cut * 1000000) // least(vol, tv - vol))::BIGINT
                ELSE NULL END AS phi_ppm
    FROM curve
    """


def _truth_sql(rounds: int = 2) -> str:
    """Unrolled mirror of linking.truth_finder over the synthetic
    conflicting-claims corpus: per round a belief agg, a per-(subj,pred)
    total, a ppm-normalized confidence, and a per-source mean-trust
    update — all exact BIGINT with truncating `//`, every per-round CTE
    MATERIALIZED (DuckDB inlines plain CTEs and re-expands the base
    scan exponentially otherwise)."""
    parts = ["""
    WITH a AS MATERIALIZED (
      SELECT DISTINCT 'src' || (doc_id % 10) AS source,
             's' || (doc_id % 25) AS subj, 'p' AS pred,
             CASE WHEN (doc_id % 10) < 6
                  THEN 'v' || ((doc_id % 25) % 3)
                  ELSE 'v' || ((doc_id * 3) % 5) END AS obj
      FROM documents
    ), t0 AS MATERIALIZED (
      SELECT DISTINCT source, 1000000::BIGINT AS trust FROM a
    )"""]
    for r in range(1, rounds + 1):
        parts.append(f""", b{r} AS MATERIALIZED (
      SELECT subj, pred, obj, sum(t.trust)::BIGINT AS belief,
             count(*)::BIGINT AS n_sources
      FROM a JOIN t{r - 1} t USING (source)
      GROUP BY subj, pred, obj
    ), tot{r} AS MATERIALIZED (
      SELECT subj, pred, sum(belief)::BIGINT AS total
      FROM b{r} GROUP BY subj, pred
    ), c{r} AS MATERIALIZED (
      SELECT b.subj, b.pred, b.obj, b.n_sources, b.belief,
             ((b.belief * 1000000) // t.total)::BIGINT AS conf_ppm
      FROM b{r} b JOIN tot{r} t ON t.subj = b.subj AND t.pred = b.pred
    ), t{r} AS MATERIALIZED (
      SELECT a.source, (sum(c.conf_ppm) // count(*))::BIGINT AS trust
      FROM a JOIN c{r} c
        ON c.subj = a.subj AND c.pred = a.pred AND c.obj = a.obj
      GROUP BY a.source
    )""")
    parts.append(
        f"\n    SELECT subj, pred, obj, n_sources, belief, conf_ppm FROM c{rounds}"
    )
    return "".join(parts)


def _mis_sql(rounds: int = 14, seed: int = 0) -> str:
    """Unrolled Luby MIS mirroring graphstats.maximal_independent_set
    over the sparse doc graph: per round a min-over-active-neighbors
    CTE, a winners CTE, and a NOT EXISTS survivor CTE (vs Spark's
    anti-joins) — independent formulation, same deterministic rule."""
    key = _SQL_MD5INT.format(x=f"'{seed}:' || node")
    parts = [f"""
    WITH raw AS (
      {_doc_graph_sql()}
    ), e AS MATERIALIZED (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM raw
        UNION ALL SELECT dst AS a, src AS b FROM raw
      ) WHERE a <> b
    ), n0 AS MATERIALIZED (
      SELECT node, lpad(({key})::VARCHAR, 20, '0') || node AS k
      FROM (SELECT DISTINCT a AS node FROM e)
    )"""]
    for i in range(1, rounds + 1):
        parts.append(f""", nm{i} AS MATERIALIZED (
      SELECT e.a AS node, min(b.k) AS mk
      FROM e JOIN n{i - 1} b ON b.node = e.b
      GROUP BY e.a
    ), m{i} AS MATERIALIZED (
      SELECT a.node, a.k FROM n{i - 1} a
      LEFT JOIN nm{i} nm ON nm.node = a.node
      WHERE nm.mk IS NULL OR a.k < nm.mk
    ), n{i} AS MATERIALIZED (
      SELECT a.node, a.k FROM n{i - 1} a
      WHERE NOT EXISTS (SELECT 1 FROM m{i} w WHERE w.node = a.node)
        AND NOT EXISTS (SELECT 1 FROM e JOIN m{i} w ON w.node = e.a
                        WHERE e.b = a.node)
    )""")
    selects = [
        f"SELECT node, {i} AS sel_round FROM m{i}" for i in range(1, rounds + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


def _coloring_sql(
    rounds: int = 24, seed: int = 0, raw_body: str | None = None, pre: str = ""
) -> str:
    """Unrolled Jones–Plassmann coloring mirroring
    graphstats.greedy_coloring (and the bounded-component
    greedy_coloring_local — same pure function): per round a
    min-over-uncolored-neighbors CTE (readiness = Luby winners), a mex
    color choice via a list_reduce fold over the sorted colors of
    already-colored neighbors, and a NOT EXISTS survivor CTE —
    independent formulation, same deterministic rule. ``raw_body``
    selects the graph (default: the sparse doc graph); ``pre`` prepends
    helper CTEs."""
    key = _SQL_MD5INT.format(x=f"'{seed}:' || node")
    mex = (
        "coalesce(list_reduce(list_prepend(1, list_sort(u.used)), "
        "(acc, x) -> CASE WHEN x = acc THEN acc + 1 ELSE acc END), 1)::INT"
    )
    parts = [f"""
    WITH {pre}raw AS (
      {raw_body or _doc_graph_sql()}
    ), e AS MATERIALIZED (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM raw
        UNION ALL SELECT dst AS a, src AS b FROM raw
      ) WHERE a <> b
    ), n0 AS MATERIALIZED (
      SELECT node, lpad(({key})::VARCHAR, 20, '0') || node AS k
      FROM (SELECT DISTINCT a AS node FROM e)
    ), c0 AS (
      SELECT node, 0::INT AS color FROM n0 WHERE false
    )"""]
    for i in range(1, rounds + 1):
        parts.append(f""", nm{i} AS MATERIALIZED (
      SELECT e.a AS node, min(b.k) AS mk
      FROM e JOIN n{i - 1} b ON b.node = e.b
      GROUP BY e.a
    ), r{i} AS MATERIALIZED (
      SELECT a.node FROM n{i - 1} a
      LEFT JOIN nm{i} nm ON nm.node = a.node
      WHERE nm.mk IS NULL OR a.k < nm.mk
    ), m{i} AS MATERIALIZED (
      SELECT r.node, {mex} AS color
      FROM r{i} r LEFT JOIN (
        SELECT e.a AS node, list(DISTINCT c.color) AS used
        FROM e JOIN c{i - 1} c ON c.node = e.b
        JOIN r{i} rr ON rr.node = e.a
        GROUP BY e.a
      ) u ON u.node = r.node
    ), c{i} AS MATERIALIZED (
      SELECT node, color FROM c{i - 1}
      UNION ALL SELECT node, color FROM m{i}
    ), n{i} AS MATERIALIZED (
      SELECT a.node, a.k FROM n{i - 1} a
      WHERE NOT EXISTS (SELECT 1 FROM m{i} w WHERE w.node = a.node)
    )""")
    selects = [
        f"SELECT node, color, {i} AS col_round FROM m{i}"
        for i in range(1, rounds + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


def _msf_sql(rounds: int = 4, jumps: int = 4) -> str:
    """Unrolled Borůvka MSF mirroring graphstats.min_spanning_forest
    over the 16-node block graph: per round an inter-component edge CTE,
    an arg_min choice on the padded (weight,u,v) key, an EXISTS-based
    mutual-2-cycle break (vs Spark's join + min-agg), and fixed
    pointer-doubling. Block size 16 bounds rounds at 4 and pseudo-tree
    depth at 16 (= 4 jumps)."""
    w_key = _SQL_MD5INT.format(
        x="'w|' || least(src, dst) || '|' || greatest(src, dst)"
    )
    parts = [f"""
    WITH nn AS (SELECT (count(*) // 16) * 16 AS nb FROM documents),
    raw AS (
      SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id - doc_id % 16) + ((doc_id % 16) * 3 + 1) % 16)::VARCHAR AS dst
      FROM documents, nn WHERE doc_id < nn.nb
      UNION ALL
      SELECT 'n' || doc_id::VARCHAR,
             'n' || ((doc_id - doc_id % 16) + ((doc_id % 16) * 7 + 2) % 16)::VARCHAR
      FROM documents, nn WHERE doc_id < nn.nb
    ), e AS MATERIALIZED (
      SELECT u, v, min(w) AS w FROM (
        SELECT least(src, dst) AS u, greatest(src, dst) AS v, {w_key} AS w
        FROM raw WHERE src <> dst)
      GROUP BY u, v
    ), c0 AS MATERIALIZED (
      SELECT node, node AS comp FROM (
        SELECT u AS node FROM e UNION SELECT v FROM e)
    )"""]
    for r in range(1, rounds + 1):
        parts.append(f""", ec{r} AS MATERIALIZED (
      SELECT e.u, e.v, e.w, cu.comp AS cu, cv.comp AS cv
      FROM e JOIN c{r - 1} cu ON cu.node = e.u
             JOIN c{r - 1} cv ON cv.node = e.v
      WHERE cu.comp <> cv.comp
    ), ch{r} AS MATERIALIZED (
      SELECT c, arg_min(oc, kk) AS oc, arg_min(u, kk) AS u,
             arg_min(v, kk) AS v, arg_min(w, kk) AS w
      FROM (SELECT *, lpad(w::VARCHAR, 20, '0') || u || '|' || v AS kk FROM (
              SELECT cu AS c, cv AS oc, u, v, w FROM ec{r}
              UNION ALL SELECT cv, cu, u, v, w FROM ec{r}))
      GROUP BY c
    ), par{r}_0 AS MATERIALIZED (
      SELECT ac.c, coalesce(
        CASE WHEN EXISTS (SELECT 1 FROM ch{r} x
                          WHERE x.c = ch.oc AND x.oc = ch.c)
                  AND ch.c < ch.oc
             THEN ch.c ELSE ch.oc END, ac.c) AS p
      FROM (SELECT DISTINCT comp AS c FROM c{r - 1}) ac
      LEFT JOIN ch{r} ch ON ch.c = ac.c
    )""")
        for k in range(1, jumps + 1):
            parts.append(f""", par{r}_{k} AS MATERIALIZED (
      SELECT a.c, b.p FROM par{r}_{k - 1} a
      JOIN par{r}_{k - 1} b ON b.c = a.p
    )""")
        parts.append(f""", c{r} AS MATERIALIZED (
      SELECT n.node, pr.p AS comp FROM c{r - 1} n
      JOIN par{r}_{jumps} pr ON pr.c = n.comp
    )""")
    selects = [
        f"""SELECT u AS src, v AS dst, w AS weight, {r} AS msf_round
    FROM (SELECT DISTINCT u, v, w FROM ch{r})"""
        for r in range(1, rounds + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


def _funnel_sql(horizon_minutes: int = 1440) -> str:
    """Stage-by-stage correlated min CTEs mirroring sessions.funnel."""
    h = horizon_minutes * 60 * 1_000_000
    return f"""
    WITH ev AS (
      SELECT user_id AS u, event_type AS s, epoch_us(ts) AS t FROM events
    ), s1 AS (
      SELECT u, min(t) AS t_1 FROM ev WHERE s = 'view' GROUP BY u
    ), s2 AS (
      SELECT e.u, min(e.t) AS t_2 FROM ev e JOIN s1 ON s1.u = e.u
      WHERE e.s = 'click' AND e.t > s1.t_1 AND e.t <= s1.t_1 + {h}
      GROUP BY e.u
    ), s3 AS (
      SELECT e.u, min(e.t) AS t_3 FROM ev e
      JOIN s1 ON s1.u = e.u JOIN s2 ON s2.u = e.u
      WHERE e.s = 'purchase' AND e.t > s2.t_2 AND e.t <= s1.t_1 + {h}
      GROUP BY e.u
    )
    SELECT s1.u AS "user",
           1 + (s2.u IS NOT NULL)::INT + (s3.u IS NOT NULL)::INT
             AS stages_completed,
           s1.t_1, s2.t_2, s3.t_3
    FROM s1 LEFT JOIN s2 ON s2.u = s1.u LEFT JOIN s3 ON s3.u = s1.u
    """


def _entail_sql() -> str:
    """ρdf + inverseOf closure mirroring ontology.rdfs_entailment: the
    property rewrite set as a RECURSIVE CTE over the signed property
    graph ('~' = flipped orientation), then single joins for the
    instance-side expansions — independent engine and formulation
    (recursion vs path doubling)."""
    values = ",\n      ".join(f"('{s}', '{p}', '{o}')" for s, p, o in _ENTAIL_SCHEMA)
    return f"""
    WITH RECURSIVE sch(s, p, o) AS (
      SELECT * FROM (VALUES {values})
    ), sp AS (SELECT s AS x, o AS y FROM sch WHERE p = '{_ENTAIL_SP}'),
    inv AS (SELECT s AS x, o AS y FROM sch WHERE p = '{_ENTAIL_INV}'),
    dm AS (SELECT s AS x, o AS y FROM sch WHERE p = '{_ENTAIL_DOM}'),
    rg AS (SELECT s AS x, o AS y FROM sch WHERE p = '{_ENTAIL_RNG}'),
    sc AS (SELECT s AS x, o AS y FROM sch WHERE p = '{_ENTAIL_SC}'),
    signed AS (
      SELECT x AS c, y AS pr FROM sp
      UNION ALL SELECT '~' || x, '~' || y FROM sp
      UNION ALL SELECT x, '~' || y FROM inv
      UNION ALL SELECT '~' || x, y FROM inv
      UNION ALL SELECT y, '~' || x FROM inv
      UNION ALL SELECT '~' || y, x FROM inv
    ),
    reach(a, b) AS (
      SELECT c, pr FROM signed
      UNION
      SELECT r.a, s2.pr FROM reach r JOIN signed s2 ON s2.c = r.b
    ),
    inst AS (
      SELECT 'e' || doc_id::VARCHAR AS s,
             CASE doc_id % 5 WHEN 0 THEN 'cites' WHEN 1 THEN 'mentions'
                  WHEN 2 THEN 'hasPart' WHEN 3 THEN 'derivedFrom'
                  ELSE 'partOf' END AS p,
             'e' || ((doc_id * 7 + 3) %
                     (SELECT count(*) FROM documents))::VARCHAR AS o
      FROM documents
    ),
    props AS (
      SELECT DISTINCT p FROM inst
      UNION SELECT x FROM sp UNION SELECT y FROM sp
      UNION SELECT x FROM inv UNION SELECT y FROM inv
    ),
    rew AS (
      SELECT p, p AS q, 0 AS flip FROM props
      UNION
      SELECT regexp_replace(a, '^~', ''), regexp_replace(b, '^~', ''),
             CASE WHEN (a LIKE '~%') <> (b LIKE '~%') THEN 1 ELSE 0 END
      FROM reach
    ),
    ec AS MATERIALIZED (
      SELECT DISTINCT
        CASE WHEN r.flip = 0 THEN i.s ELSE i.o END AS subject,
        r.q AS predicate,
        CASE WHEN r.flip = 0 THEN i.o ELSE i.s END AS object
      FROM inst i JOIN rew r ON r.p = i.p
    ),
    basety AS (
      SELECT 'e' || doc_id::VARCHAR AS node,
             CASE (doc_id // 5) % 3 WHEN 0 THEN 'Document'
                  WHEN 1 THEN 'Entity' ELSE 'Composite' END AS cls
      FROM documents WHERE doc_id % 5 = 0
    ),
    rawty AS (
      SELECT node, cls FROM basety
      UNION ALL SELECT ec.subject, d.y FROM ec JOIN dm d ON d.x = ec.predicate
      UNION ALL SELECT ec.object, r2.y FROM ec JOIN rg r2 ON r2.x = ec.predicate
    ),
    screach(c, a) AS (
      SELECT x, y FROM sc
      UNION
      SELECT r.c, s3.y FROM screach r JOIN sc s3 ON s3.x = r.a
    ),
    allcls AS (
      SELECT DISTINCT cls AS c FROM rawty
      UNION SELECT x FROM sc UNION SELECT y FROM sc
    ),
    scref AS (
      SELECT c AS cls, c AS anc FROM allcls
      UNION SELECT c, a FROM screach
    ),
    tyc AS (
      SELECT DISTINCT t.node, s4.anc AS cls
      FROM rawty t JOIN scref s4 ON s4.cls = t.cls
    )
    SELECT subject, predicate, object FROM ec
    UNION ALL
    SELECT node, '{_ENTAIL_TYPE}', cls FROM tyc
    """


def _temporal_sql(rounds: int = 6) -> str:
    """Unrolled time-respecting relaxation mirroring
    graphstats.temporal_reachability over the timestamped doc graph."""
    edge_selects = []
    for j, (p, c) in enumerate(_DOC_GRAPH_PARAMS):
        edge_selects.append(f"""SELECT 'n' || doc_id::VARCHAR AS u,
             'n' || ((doc_id::BIGINT * {p} + {c}) %
                     (SELECT count(*) FROM documents))::VARCHAR AS v,
             (doc_id::BIGINT * {17 + j} + {7 * j}) % 240 AS t
      FROM documents""")
    parts = [f"""
    WITH e AS MATERIALIZED (
      {'''
      UNION ALL
      '''.join(edge_selects)}
    ), a0 AS MATERIALIZED (
      SELECT 'n' || doc_id::VARCHAR AS node, 0::BIGINT AS arrival
      FROM documents WHERE doc_id % 97 = 0
    )"""]
    for r in range(1, rounds + 1):
        parts.append(f""", a{r} AS MATERIALIZED (
      SELECT node, min(arrival) AS arrival FROM (
        SELECT node, arrival FROM a{r - 1}
        UNION ALL
        SELECT e.v AS node, e.t AS arrival
        FROM e JOIN a{r - 1} a ON a.node = e.u
        WHERE e.t >= a.arrival
      ) GROUP BY node
    )""")
    parts.append(f"\n    SELECT node, arrival FROM a{rounds}")
    return "".join(parts)


def _cover_sql(k: int = 5) -> str:
    """Unrolled greedy set cover mirroring sampling.greedy_cover:
    per round an ORDER BY gain DESC, set ASC LIMIT 1 argmax (vs Spark's
    min_by struct) and a NOT EXISTS uncovered filter (vs anti-join)."""
    parts = ["""
    WITH toks AS (
      SELECT source, doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token,
             generate_subscripts(
               regexp_split_to_array(trim(lower(text)), '\\s+'), 1) AS pos
      FROM documents
    ), p AS MATERIALIZED (
      SELECT DISTINCT a.source AS s, a.token || ' ' || b.token AS i
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ), g1 AS (
      SELECT s, count(*) AS g FROM p GROUP BY s
    ), b1 AS MATERIALIZED (
      SELECT s, g FROM g1 WHERE g > 0 ORDER BY g DESC, s ASC LIMIT 1
    ), cov1 AS MATERIALIZED (
      SELECT DISTINCT p.i FROM p JOIN b1 ON p.s = b1.s
    )"""]
    for r in range(2, k + 1):
        parts.append(f""", g{r} AS (
      SELECT s, count(*) AS g FROM p
      WHERE NOT EXISTS (SELECT 1 FROM cov{r - 1} c WHERE c.i = p.i)
      GROUP BY s
    ), b{r} AS MATERIALIZED (
      SELECT s, g FROM g{r} WHERE g > 0 ORDER BY g DESC, s ASC LIMIT 1
    ), cov{r} AS MATERIALIZED (
      SELECT i FROM cov{r - 1}
      UNION SELECT p.i FROM p JOIN b{r} ON p.s = b{r}.s
    )""")
    selects = [
        f"SELECT {r} AS pick_round, s AS set_id, g AS gain FROM b{r}"
        for r in range(1, k + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


def _spam_mass_sql(iterations: int = 4, scale: int = 1_000_000,
                   damping: int = 85) -> str:
    """Unrolled spam-mass oracle: BOTH exact-integer recurrences
    (global PageRank r0..rN, seed-personalized t0..tN) as MATERIALIZED
    CTEs over the residue link graph, then the same |V| DIV |seeds|
    mass rescale and greatest(0, ...) ppm — mirrors graphstats.spam_mass
    by construction, independent by formulation (scalar subqueries vs
    broadcast count frames)."""
    teleport = (100 - damping) * scale // 100
    parts = [f"""
    WITH docs AS (
      SELECT DISTINCT doc_id % 500 AS r FROM documents
    ), e AS MATERIALIZED (
      SELECT 'd' || r::VARCHAR AS s, 'd' || ((r * 3 + 1) % 500)::VARCHAR AS d
      FROM docs
      UNION
      SELECT 'd' || r::VARCHAR, 'd' || ((r * 7 + 3) % 500)::VARCHAR
      FROM docs WHERE r % 2 = 0
    ), outd AS (
      SELECT s, count(*) AS od FROM e GROUP BY s
    ), nodes AS (
      SELECT s AS node FROM e UNION SELECT d FROM e
    ), seeds AS (
      SELECT DISTINCT 'd' || r::VARCHAR AS node FROM docs WHERE r % 25 = 0
    ), flag AS MATERIALIZED (
      SELECT n.node, CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS sf
      FROM nodes n LEFT JOIN seeds s ON s.node = n.node
    ), r0 AS (
      SELECT node, {scale}::BIGINT AS "rank" FROM nodes
    ), t0 AS (
      SELECT node, (sf * {scale})::BIGINT AS "rank" FROM flag
    )"""]
    for i in range(1, iterations + 1):
        parts.append(f""", r{i} AS MATERIALIZED (
      SELECT n.node,
             ({teleport} + ({damping} * coalesce(t.inb, 0)) // 100)::BIGINT
               AS "rank"
      FROM nodes n LEFT JOIN (
        SELECT e.d AS node, sum(r."rank" // o.od) AS inb
        FROM e JOIN outd o ON e.s = o.s JOIN r{i - 1} r ON r.node = e.s
        GROUP BY e.d
      ) t ON t.node = n.node
    ), t{i} AS MATERIALIZED (
      SELECT f.node,
             (f.sf * {teleport}
              + ({damping} * coalesce(t.inb, 0)) // 100)::BIGINT AS "rank"
      FROM flag f LEFT JOIN (
        SELECT e.d AS node, sum(r."rank" // o.od) AS inb
        FROM e JOIN outd o ON e.s = o.s JOIN t{i - 1} r ON r.node = e.s
        GROUP BY e.d
      ) t ON t.node = f.node
    )""")
    parts.append(f""", cnt AS (
      SELECT (SELECT count(*) FROM nodes) AS nv,
             (SELECT count(*) FROM seeds) AS ns
    )
    SELECT p.node, p."rank" AS "rank",
           (coalesce(t."rank", 0) * cnt.nv) // cnt.ns AS trusted_rank,
           (greatest(0, p."rank" - (coalesce(t."rank", 0) * cnt.nv) // cnt.ns)
            * 1000000) // p."rank" AS spam_mass_ppm
    FROM r{iterations} p
    LEFT JOIN t{iterations} t ON t.node = p.node, cnt""")
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    tok_valid = _SQL_VALID.format(c="t")
    norm_text = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    fingerprint_sql = _SQL_MD5INT.format(x=norm_text)
    n_tokens_sql = "len(regexp_split_to_array(trim(text), '\\s+'))"
    clusters_sql = _minhash_sql_parts().replace("WITH toks", "WITH RECURSIVE toks") + """
          , counts AS (
            SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
          ), cand AS (
            -- LSH candidate pairs (same as the dedup_minhash oracle)
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.band_key = r.band_key
             AND l.doc_id < r.doc_id
          ), jp AS (
            -- exact-Jaccard verification restricted to LSH candidates
            SELECT c.a, c.b
            FROM cand c
            JOIN sh la ON la.doc_id = c.a
            JOIN sh lb ON lb.doc_id = c.b AND lb.s = la.s
            JOIN counts ca ON ca.doc_id = c.a
            JOIN counts cb ON cb.doc_id = c.b
            GROUP BY c.a, c.b
            HAVING floor(count(*)::DOUBLE /
                         (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                         * 10000 + 0.5) / 10000 >= 0.8
          ), und AS (
            SELECT a, b FROM jp UNION SELECT b, a FROM jp
          ), reach(x, y) AS (
            SELECT a, b FROM und
            UNION
            SELECT r.x, u.b FROM reach r JOIN und u ON r.y = u.a
          )
          SELECT x AS doc_id, least(x, min(y)) AS cluster_id
          FROM reach GROUP BY x
        """
    return {
        "kg_nodes": """
            SELECT doc_id::VARCHAR || ':document' AS id, 'document' AS label FROM documents
            UNION ALL
            SELECT DISTINCT lang || ':language', 'language' FROM documents
            UNION ALL
            SELECT DISTINCT source || ':source', 'source' FROM documents
        """,
        "kg_edges": """
            SELECT doc_id::VARCHAR || ':document' AS src, lang || ':language' AS dst,
                   'in_language' AS elabel FROM documents
            UNION ALL
            SELECT doc_id::VARCHAR || ':document', source || ':source', 'from_source'
            FROM documents
        """,
        "kg_fusion_props": """
            SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources
            FROM documents GROUP BY lang
        """,
        "t_split": f"""
            SELECT t AS token, count(*) AS n
            FROM (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
            WHERE {tok_valid} AND trim(t) <> ''
            GROUP BY t
        """,
        "t_cat_format": """
            SELECT DISTINCT c_name || '/' || c_mktsegment AS tag FROM customer
        """,
        "t_translate": """
            SELECT CASE lang WHEN 'en' THEN 'English' WHEN 'es' THEN 'Spanish'
                             WHEN 'fr' THEN 'French' WHEN 'de' THEN 'German' END AS lang_name,
                   count(*) AS n
            FROM documents WHERE lang IN ('en','es','fr','de')
            GROUP BY 1
        """,
        "t_boolean": """
            SELECT CASE WHEN event_type IN ('click','view') THEN 'engagement'
                        WHEN event_type IN ('purchase','signup') THEN 'conversion' END AS flag,
                   count(*) AS n
            FROM events WHERE event_type IN ('click','view','purchase','signup')
            GROUP BY 1
        """,
        "t_replace": """
            SELECT regexp_replace(p_name, '[^a-zA-Z0-9_`.()]', '', 'g') AS clean_name,
                   count(*) AS n
            FROM part GROUP BY 1
        """,
        "t_maths": """
            SELECT l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR AS line_id,
                   floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue
            FROM lineitem
        """,
        "t_case": """
            SELECT DISTINCT 'lname' AS op, lower(n_name) AS value FROM nation
            UNION
            SELECT DISTINCT 'cname', upper(substr(n_name,1,1)) || lower(substr(n_name,2))
            FROM nation
        """,
        "t_regex_extract": """
            SELECT regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num, count(*) AS n
            FROM part WHERE regexp_matches(p_brand, 'Brand#(\\d+)')
            GROUP BY 1
        """,
        "events_nested": """
            SELECT event_id::VARCHAR AS event_id, json_extract_string(props, '$.k') AS k_val
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
              AND json_extract_string(props, '$.k') <> ''
        """,
        "kg_match_branch": """
            SELECT CASE WHEN lang = 'en' THEN 'lang_en'
                        WHEN lang IN ('es','fr') THEN 'lang_romance'
                        ELSE 'lang_other' END AS elabel,
                   lang, count(*) AS n
            FROM documents GROUP BY 1, 2
        """,
        "kg_from_subject": """
            SELECT o_custkey::VARCHAR AS custkey, o_orderpriority AS priority FROM orders
        """,
        "kg_reverse_edge": """
            SELECT doc_id::VARCHAR AS src, source AS dst, 'from_source' AS elabel
            FROM documents
            UNION ALL
            SELECT source, doc_id::VARCHAR, 'has_doc' FROM documents
        """,
        "kg_final_type": """
            SELECT DISTINCT lang || ':language' AS id, 'language' AS label,
                   'node' AS kind FROM documents
            UNION ALL
            SELECT DISTINCT lang || ':language', 'in_language', 'edge' FROM documents
        """,
        "kg_affix_prefix": """
            SELECT DISTINCT 'document___' || doc_id::VARCHAR AS id, 'document' AS label
            FROM documents
            UNION ALL SELECT DISTINCT 'language___' || lang, 'language' FROM documents
            UNION ALL SELECT DISTINCT 'source___' || source, 'source' FROM documents
        """,
        "kg_two_sources": """
            SELECT c.c_custkey::VARCHAR AS custkey,
                   any_value(c.c_mktsegment) AS segment,
                   string_agg(DISTINCT o.o_orderpriority, ','
                              ORDER BY o.o_orderpriority) AS priorities
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "t_cat": """
            SELECT DISTINCT n_name || n_regionkey::VARCHAR AS tag FROM nation
        """,
        "t_string": """
            SELECT DISTINCT lang, 'corpus-v1' AS release,
                   'ontoweaver-spark' AS pipeline
            FROM documents
        """,
        "t_split_translate": f"""
            SELECT CASE t WHEN 'spark' THEN 'SPARK' WHEN 'table' THEN 'TABLE'
                          WHEN 'join' THEN 'JOIN' ELSE t END AS token,
                   count(*) AS n
            FROM (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
            WHERE {tok_valid} AND trim(t) <> ''
            GROUP BY 1
        """,
        "entity_link": """
            SELECT CASE WHEN source SIMILAR TO 'src[0-9]'
                        THEN 'origin-' || substr(source, 4) ELSE source END AS entity_id,
                   CASE WHEN source SIMILAR TO 'src[0-9]' THEN 1 ELSE 0 END AS linked,
                   count(*) AS n
            FROM documents GROUP BY 1, 2
        """,
        "entity_canonical": r"""
            SELECT c_custkey AS custkey,
                   trim(regexp_replace(regexp_replace(lower(c_name),
                        '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS canon_name
            FROM customer
        """,
        "comention": """
            WITH ents AS (
              SELECT DISTINCT doc_id, t AS e
              FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents)
              WHERE t IN ('spark','join','window','vector','stream')
            )
            SELECT l.e AS a, r.e AS b, count(*) AS n_docs
            FROM ents l JOIN ents r ON l.doc_id = r.doc_id AND l.e < r.e
            GROUP BY 1, 2
        """,
        "pages_web_kg": r"""
            WITH pages AS (
              SELECT
                'https://' || source || '.example/p' || doc_id::VARCHAR AS url,
                CAST(make_timestamp((1704067200 + doc_id) * 1000000) AS VARCHAR)
                  AS fetched_at,
                text || '. keywords: kw' || lang || ', ' || split_part(text, ' ', 1)
                     || '. links: https://hub' || ((doc_id*7)%97)::VARCHAR
                     || '/p' || ((doc_id*13)%997)::VARCHAR
                     || ' https://hub' || ((doc_id*11)%97)::VARCHAR
                     || '/p' || ((doc_id*17)%997)::VARCHAR || '.' AS text,
                lang
              FROM documents
            ), links AS (
              SELECT DISTINCT url, l AS dst FROM (
                SELECT url, unnest(regexp_extract_all(
                  text, '(https?://[^\s.,]+[^\s.,])', 1)) AS l FROM pages)
            ), kw1 AS (
              SELECT url, regexp_extract(text,
                'keywords: ([a-z]+), ([a-z]+)\.', 1) AS kw FROM pages
            ), kw2 AS (
              SELECT url, regexp_extract(text,
                'keywords: ([a-z]+), ([a-z]+)\.', 2) AS kw FROM pages
            ), contrib AS (
              -- engine semantics: to_properties targets the subject TYPE
              -- ('page'), so every page node a row emits — the subject AND
              -- its links_to targets — carries that row's properties;
              -- fusion then set-unions them (sorted distinct, ','-joined)
              SELECT url AS page_id, text, fetched_at,
                     len(regexp_split_to_array(trim(text), '\s+'))::VARCHAR
                       AS n_toks
              FROM pages
              UNION ALL
              SELECT l.dst, p.text, p.fetched_at,
                     len(regexp_split_to_array(trim(p.text), '\s+'))::VARCHAR
              FROM links l JOIN pages p ON p.url = l.url
            ), page_nodes AS (
              SELECT page_id AS id,
                     array_to_string(list_sort(list_distinct(list(text))), ',')
                       AS p_text,
                     array_to_string(list_sort(list_distinct(list(n_toks))), ',')
                       AS p_n_tokens,
                     array_to_string(list_sort(list_distinct(list(fetched_at))), ',')
                       AS p_fetched_at
              FROM contrib GROUP BY 1
            ), nodes AS (
              SELECT id, 'page' AS label, p_text, p_n_tokens, p_fetched_at
              FROM page_nodes
              UNION ALL
              SELECT DISTINCT regexp_extract(url, '^https?://([^/]+)/', 1),
                     'site', '', '', '' FROM pages
              UNION ALL
              SELECT DISTINCT lang, 'language', '', '', '' FROM pages
              UNION ALL
              SELECT DISTINCT kw, 'keyword', '', '', ''
              FROM (SELECT kw FROM kw1 UNION ALL SELECT kw FROM kw2)
              WHERE kw <> ''
            ), edges AS (
              SELECT url AS id, 'hosted_on' AS label,
                     regexp_extract(url, '^https?://([^/]+)/', 1) AS dst
              FROM pages
              UNION
              SELECT url, 'in_language', lang FROM pages
              UNION
              SELECT url, 'has_keyword', kw FROM kw1 WHERE kw <> ''
              UNION
              SELECT url, 'has_keyword', kw FROM kw2 WHERE kw <> ''
              UNION
              SELECT url, 'links_to', dst FROM links
            )
            SELECT 'node' AS kind, id, label, '' AS dst,
                   p_text, p_n_tokens, p_fetched_at FROM nodes
            UNION ALL
            SELECT 'edge', id, label, dst, '', '', '' FROM edges
        """,
        "validate_docs": f"""
            SELECT count(*) AS total,
                   count(*) FILTER (WHERE {_VALID_LANG} AND {_VALID_NCHARS}
                                      AND {_VALID_TEXT}) AS valid,
                   count(*) FILTER (WHERE NOT ({_VALID_LANG})) AS bad_lang,
                   count(*) FILTER (WHERE NOT ({_VALID_NCHARS})) AS bad_n_chars,
                   count(*) FILTER (WHERE NOT ({_VALID_TEXT})) AS bad_text
            FROM documents
        """,
        "dedup_exact": f"""
            SELECT {fingerprint_sql} AS fingerprint,
                   count(*) AS n_docs, min(doc_id) AS canonical_id
            FROM documents GROUP BY 1
        """,
        "dedup_minhash": _minhash_sql_parts(collapse=True) + """
            -- canonical-canonical band pairs + exact-family star edges
            -- (disjoint by construction: star's b is never a canonical)
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
            UNION ALL
            SELECT a, b FROM star
        """,
        "dedup_jaccard": _shingle_sql(max_df=20) + """
            SELECT l.doc_id AS a, r.doc_id AS b,
                   floor(count(*)::DOUBLE /
                         (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                         * 10000 + 0.5) / 10000 AS jaccard
            FROM sh l
            JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
            JOIN counts ca ON ca.doc_id = l.doc_id
            JOIN counts cb ON cb.doc_id = r.doc_id
            GROUP BY l.doc_id, r.doc_id
            HAVING floor(count(*)::DOUBLE /
                         (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                         * 10000 + 0.5) / 10000 >= 0.8
        """,
        # NO prefix logic here on purpose: plain all-shared-pairs
        # jaccard >= 0.8 — checks the prefix filter drops nothing
        "dedup_jaccard_prefix": _shingle_sql() + """
            SELECT l.doc_id AS a, r.doc_id AS b,
                   floor(count(*)::DOUBLE /
                         (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                         * 10000 + 0.5) / 10000 AS jaccard
            FROM sh l
            JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
            JOIN counts ca ON ca.doc_id = l.doc_id
            JOIN counts cb ON cb.doc_id = r.doc_id
            GROUP BY l.doc_id, r.doc_id
            HAVING floor(count(*)::DOUBLE /
                         (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                         * 10000 + 0.5) / 10000 >= 0.8
        """,
        # plain all-pairs containment, no prefix machinery: the prefix
        # filter's LOSSLESSNESS is the checked property
        "dedup_containment_asym": _shingle_sql() + """
            SELECT l.doc_id AS a, r.doc_id AS b,
                   floor(count(*)::DOUBLE / any_value(ca.n_sh)
                         * 10000 + 0.5) / 10000 AS containment_a,
                   floor(count(*)::DOUBLE / any_value(cb.n_sh)
                         * 10000 + 0.5) / 10000 AS containment_b,
                   floor(count(*)::DOUBLE /
                         (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                         * 10000 + 0.5) / 10000 AS jaccard
            FROM sh l
            JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
            JOIN counts ca ON ca.doc_id = l.doc_id
            JOIN counts cb ON cb.doc_id = r.doc_id
            GROUP BY l.doc_id, r.doc_id
            HAVING floor(count(*)::DOUBLE / any_value(ca.n_sh)
                         * 10000 + 0.5) / 10000 >= 0.9
                OR floor(count(*)::DOUBLE / any_value(cb.n_sh)
                         * 10000 + 0.5) / 10000 >= 0.9
        """,
        "dedup_cosine_l2ap": r"""
            WITH tarr AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
              FROM documents
            ), toks AS (
              SELECT doc_id, g AS tok
              FROM tarr, UNNEST(list_transform(
                range(1, greatest(len(l) - 2, 1) + 1),
                i -> array_to_string(l[i:i+2], ' ')
              )) AS t(g)
            ), tf AS (
              SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, tok
            ), norms AS (
              SELECT doc_id, sum(tf*tf)::BIGINT AS nsq FROM tf GROUP BY doc_id
            ), dots AS (
              SELECT x.doc_id AS a, y.doc_id AS b, sum(x.tf*y.tf)::BIGINT AS dot
              FROM tf x JOIN tf y ON x.tok = y.tok AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT d.a, d.b,
                   floor(d.dot / sqrt((na.nsq * nb.nsq)::DOUBLE) * 10000.0 + 0.5)
                     / 10000.0 AS cosine
            FROM dots d
            JOIN norms na ON na.doc_id = d.a
            JOIN norms nb ON nb.doc_id = d.b
            WHERE floor(d.dot / sqrt((na.nsq * nb.nsq)::DOUBLE) * 10000.0 + 0.5)
                    / 10000.0 >= 0.9
        """,
        "hll_count": rf"""
            WITH toks AS (
              SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
              FROM documents
            ), h AS (
              SELECT lang, (('0x' || substr(md5(tok), 1, 15))::BIGINT) AS h FROM toks
            ), reg AS (
              SELECT lang, h & 1023 AS j,
                     max(CASE WHEN (h >> 10) = 0 THEN 51
                         ELSE 51 - length(bin(h >> 10)) END)::INT AS r
              FROM h GROUP BY lang, h & 1023
            ), agg AS (
              SELECT lang, count(*)::BIGINT AS n_set,
                     sum(1::BIGINT << (51 - r))::BIGINT AS sp
              FROM reg GROUP BY lang
            )
            SELECT lang, n_set,
                   floor({_HLL_NUM} /
                         (sp + (1024::BIGINT - n_set) * (1::BIGINT << 51))::DOUBLE
                   )::BIGINT AS estimate
            FROM agg
        """,
        "dedup_simhash": _simhash_sql(bits=60),
        "dedup_simhash_near": f"""
            WITH sims AS ({_simhash_sql(bits=60)})
            SELECT l.doc_id AS a, r.doc_id AS b,
                   bit_count(xor(l.simhash, r.simhash))::BIGINT AS hamming
            FROM sims l JOIN sims r ON l.doc_id < r.doc_id
            WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
        """,
        "dedup_verified": _minhash_sql_parts(collapse=True) + """
          , counts AS (
            SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
          ), cand AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.band_key = r.band_key
             AND l.doc_id < r.doc_id
          )
          SELECT c.a, c.b,
                 floor(count(*)::DOUBLE /
                       (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                       * 10000 + 0.5) / 10000 AS jaccard
          FROM cand c
          JOIN sh la ON la.doc_id = c.a
          JOIN sh lb ON lb.doc_id = c.b AND lb.s = la.s
          JOIN counts ca ON ca.doc_id = c.a
          JOIN counts cb ON cb.doc_id = c.b
          GROUP BY c.a, c.b
          HAVING floor(count(*)::DOUBLE /
                       (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                       * 10000 + 0.5) / 10000 >= 0.5
          UNION ALL
          -- exact-family members: jaccard 1.0 by construction (identical
          -- fingerprint => identical shingle set), no verification work
          SELECT a, b, 1.0::DOUBLE AS jaccard FROM star
        """,
        # dedup_clusters stays on the UNCOLLAPSED all-pairs oracle on
        # purpose: the collapsed Spark path must produce identical clusters
        # (star edges preserve connectivity exactly), so this is an
        # independent-derivation check, not a mirrored one.
        "dedup_clusters": clusters_sql,
        "decontam": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
              FROM documents
            ), sh AS (
              -- distinct word 13-grams; concat_ws skips out-of-range
              -- positions exactly like Spark's element_at+concat_ws
              SELECT DISTINCT doc_id, s
              FROM toks, UNNEST(list_transform(
                range(1, greatest(len(l) - 12, 1) + 1),
                i -> concat_ws(' ', {", ".join(f"l[i+{j}]" for j in range(13))})
              )) AS t(s)
            ), ev AS (
              SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 23 = 0
            )
            SELECT c.doc_id, e.eval_id, count(*) AS n_shared
            FROM sh c JOIN ev e USING (s)
            GROUP BY c.doc_id, e.eval_id
        """,
        "web_corpus_prep": f"""
            WITH u AS (
              SELECT 'https://crawl.' || lower(source) || '.com/p/' || doc_id AS url,
                     doc_id AS ts, doc_id, text, lang FROM documents
              UNION ALL
              SELECT 'HTTPS://CRAWL.' || upper(source) || '.COM//p//' || doc_id
                     || '/?utm_source=x', doc_id + 10000000, doc_id, text, lang
              FROM documents
            ), cn AS (
              SELECT {_url_canon_sql("url")} AS curl, url, ts, doc_id, text, lang FROM u
            ), latest AS (
              SELECT doc_id, text, lang FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY curl ORDER BY ts DESC, url DESC) AS rn
                FROM cn
              ) WHERE rn = 1
            ), feats AS (
              SELECT doc_id, lang, text,
                     {_quality_sql()} AS quality,
                     {n_tokens_sql} AS n_tokens,
                     {fingerprint_sql} AS fp
              FROM latest
            ), kept AS (
              SELECT * FROM feats
              WHERE quality >= 0.5 AND lang IN ('en','de','fr','es')
            ), canon AS (
              SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp
            ), uniq AS (
              SELECT k.* FROM kept k
              JOIN canon c ON c.fp = k.fp AND c.doc_id = k.doc_id
            ), toks_u AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l FROM uniq
            ), sh_u AS (
              SELECT DISTINCT doc_id, s
              FROM toks_u, UNNEST(list_transform(
                range(1, greatest(len(l) - 12, 1) + 1),
                i -> concat_ws(' ', {", ".join(f"l[i+{j}]" for j in range(13))})
              )) AS t(s)
            ), toks_e AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
              FROM documents WHERE doc_id % 97 = 0
            ), sh_e AS (
              SELECT DISTINCT doc_id, s
              FROM toks_e, UNNEST(list_transform(
                range(1, greatest(len(l) - 12, 1) + 1),
                i -> concat_ws(' ', {", ".join(f"l[i+{j}]" for j in range(13))})
              )) AS t(s)
            ), bad AS (
              SELECT DISTINCT su.doc_id FROM sh_u su JOIN sh_e se ON su.s = se.s
            ), clean AS (
              SELECT * FROM uniq WHERE doc_id NOT IN (SELECT doc_id FROM bad)
            )
            SELECT doc_id, lang, n_tokens, quality FROM clean
            WHERE {_SQL_MD5INT.format(x="'11:' || doc_id::VARCHAR")} % 1000000
                  < (CASE lang WHEN 'en' THEN 0.5 ELSE 1.0 END) * 1000000
        """,
        "corpus_stats": f"""
            WITH t AS (
              SELECT lang AS stratum, {n_tokens_sql} AS n FROM documents
            )
            SELECT stratum, count(*) AS n_docs, sum(n) AS total_tokens,
                   CAST(floor(avg(n) * 10000 + 0.5) AS BIGINT) AS mean_tokens_e4,
                   CAST(floor(quantile_cont(n, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_tokens_e4,
                   CAST(floor(quantile_cont(n, 0.9) * 10000 + 0.5) AS BIGINT) AS p90_tokens_e4,
                   CAST(floor(quantile_cont(n, 0.99) * 10000 + 0.5) AS BIGINT) AS p99_tokens_e4
            FROM t GROUP BY stratum
        """,
        "url_canon": f"""
            WITH u AS (
              SELECT doc_id,
                     'HTTPS://' || upper(source) || '.Example.COM:443//d//' ||
                     doc_id || '/?utm_source=feed&id=' || doc_id ||
                     '&utm_campaign=x&ref=rss#frag' AS url
              FROM documents
            )
            SELECT doc_id, {_url_canon_sql("url")} AS canonical_url FROM u
        """,
        "url_dedup": f"""
            WITH u AS (
              SELECT 'https://crawl.' || lower(source) || '.com/p/' || doc_id AS url,
                     doc_id AS ts FROM documents
              UNION ALL
              SELECT 'HTTPS://CRAWL.' || upper(source) || '.COM//p//' || doc_id
                     || '/?utm_source=x', doc_id + 10000000 FROM documents
            ), c AS (
              SELECT {_url_canon_sql("url")} AS canonical_url, url, ts FROM u
            ), r AS (
              SELECT *, row_number() OVER (
                PARTITION BY canonical_url ORDER BY ts DESC, url DESC) AS rn
              FROM c
            )
            SELECT canonical_url, url, ts FROM r WHERE rn = 1
        """,
        "text_features": f"""
            SELECT doc_id,
                   {n_tokens_sql} AS n_tokens,
                   {_lang_id_sql()} AS lang_pred,
                   {_quality_sql()} AS quality,
                   {fingerprint_sql} AS fingerprint
            FROM documents
        """,
        "ann_topk": f"""
            WITH scored AS (
              SELECT b.vec_id AS probe_id, a.vec_id AS neighbor_id, {_COS_SQL} AS cos
              FROM embeddings a, embeddings b
              WHERE b.vec_id < 5 AND a.vec_id <> b.vec_id
            )
            SELECT probe_id, neighbor_id, cos, rank FROM (
              SELECT *, row_number() OVER
                (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "ann_topk_bucketed": f"""
            WITH scored AS (
              SELECT b.vec_id AS probe_id, a.vec_id AS neighbor_id, {_COS_SQL} AS cos
              FROM embeddings a, embeddings b
              WHERE b.vec_id < 5 AND a.vec_id <> b.vec_id
                AND ({_BUCKET_SQL.format(t='a')}) = ({_BUCKET_SQL.format(t='b')})
            )
            SELECT probe_id, neighbor_id, cos, rank FROM (
              SELECT *, row_number() OVER
                (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "ann_topk_ivf": _ivf_sql(),
        "onto_closure": """
            WITH RECURSIVE e AS (
              SELECT p_partkey::BIGINT AS child, (p_partkey // 2)::BIGINT AS parent
              FROM part WHERE p_partkey >= 2
            ), c(descendant, ancestor, depth) AS (
              SELECT child, parent, 1 FROM e
              UNION
              SELECT c.descendant, e.parent, c.depth + 1
              FROM c JOIN e ON c.ancestor = e.child
            )
            SELECT descendant::VARCHAR AS descendant,
                   ancestor::VARCHAR AS ancestor,
                   min(depth)::INTEGER AS depth
            FROM c GROUP BY 1, 2
        """,
        "onto_automap": """
            WITH RECURSIVE e AS (
              SELECT p_partkey::BIGINT AS child, (p_partkey // 2)::BIGINT AS parent
              FROM part WHERE p_partkey >= 2
            ), c(descendant, ancestor, depth) AS (
              SELECT child, parent, 1 FROM e
              UNION
              SELECT c.descendant, e.parent, c.depth + 1
              FROM c JOIN e ON c.ancestor = e.child
            ), hits AS (
              SELECT p_partkey::BIGINT AS descendant,
                     p_partkey::BIGINT AS ancestor, 0 AS depth FROM part
              UNION ALL
              SELECT descendant, ancestor, min(depth) FROM c GROUP BY 1, 2
            ), ranked AS (
              SELECT descendant, ancestor, depth,
                     row_number() OVER (
                       PARTITION BY descendant
                       ORDER BY depth, ancestor::VARCHAR
                     ) AS rn
              FROM hits WHERE ancestor BETWEEN 1 AND 15
            )
            SELECT p.p_partkey::BIGINT AS p_partkey,
                   r.ancestor::VARCHAR AS nearest_type,
                   r.depth::INTEGER AS type_dist
            FROM part p JOIN ranked r ON r.descendant = p.p_partkey AND r.rn = 1
        """,
        "sample_stratified": f"""
            SELECT doc_id, lang FROM documents
            WHERE {_SQL_MD5INT.format(x="'7:' || doc_id::VARCHAR")} % 1000000
                  < (CASE lang WHEN 'en' THEN 0.2 WHEN 'de' THEN 0.5
                     ELSE 1.0 END) * 1000000
        """,
        "hash_split": f"""
            SELECT doc_id,
                   CASE WHEN {_SQL_MD5INT.format(x="'3:' || doc_id::VARCHAR")}
                        % 1000000 < 0.1 * 1000000
                        THEN 'eval' ELSE 'train' END AS split
            FROM documents
        """,
        "corpus_prep": f"""
            WITH feats AS (
              SELECT doc_id, lang,
                     {_quality_sql()} AS quality,
                     {n_tokens_sql} AS n_tokens,
                     {fingerprint_sql} AS fp
              FROM documents
            ), kept AS (
              SELECT * FROM feats
              WHERE quality >= 0.5 AND lang IN ('en','de','fr','es')
            ), canon AS (
              SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp
            ), uniq AS (
              SELECT k.* FROM kept k
              JOIN canon c ON c.fp = k.fp AND c.doc_id = k.doc_id
            )
            SELECT doc_id, lang, n_tokens, quality FROM uniq
            WHERE {_SQL_MD5INT.format(x="'11:' || doc_id::VARCHAR")} % 1000000
                  < (CASE lang WHEN 'en' THEN 0.5 ELSE 1.0 END) * 1000000
        """,
        "kg_pagerank": _pagerank_sql(iterations=5),
        "kg_khop": """
            WITH RECURSIVE edges AS (
              SELECT doc_id::VARCHAR || ':document' AS src,
                     lang || ':language' AS dst FROM documents
              UNION ALL
              SELECT doc_id::VARCHAR || ':document', source || ':source'
              FROM documents
            ), und AS (
              SELECT DISTINCT src AS s, dst AS d FROM edges
              UNION
              SELECT dst, src FROM edges
            ), seeds AS (
              SELECT doc_id::VARCHAR || ':document' AS node
              FROM documents WHERE doc_id % 50 = 0
            ), reach(node, hop) AS (
              SELECT node, 0 FROM seeds
              UNION ALL
              SELECT u.d, r.hop + 1
              FROM reach r JOIN und u ON u.s = r.node WHERE r.hop < 2
            )
            SELECT node, min(hop)::INTEGER AS hop FROM reach GROUP BY node
        """,
        "kg_diff": """
            WITH old_edges AS (
              SELECT doc_id::VARCHAR || ':document' AS src,
                     lang || ':language' AS dst
              FROM documents WHERE doc_id % 3 <> 0
              UNION ALL
              SELECT doc_id::VARCHAR || ':document', source || ':source'
              FROM documents WHERE doc_id % 3 <> 0
            ), new_edges AS (
              SELECT doc_id::VARCHAR || ':document' AS src,
                     lang || ':language' AS dst FROM documents
              UNION ALL
              SELECT doc_id::VARCHAR || ':document', source || ':source'
              FROM documents
            ), old_deg AS (
              SELECT node, count(*) AS degree FROM (
                SELECT src AS node FROM old_edges
                UNION ALL SELECT dst FROM old_edges
              ) GROUP BY node
            ), new_deg AS (
              SELECT node, count(*) AS degree FROM (
                SELECT src AS node FROM new_edges
                UNION ALL SELECT dst FROM new_edges
              ) GROUP BY node
            )
            SELECT coalesce(o.node, n.node) AS node,
                   CASE WHEN o.node IS NULL THEN 'added'
                        WHEN n.node IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM old_deg o FULL OUTER JOIN new_deg n ON o.node = n.node
            WHERE o.node IS NULL OR n.node IS NULL OR o.degree <> n.degree
        """,
        "kg_degree": """
            WITH edges AS (
              SELECT doc_id::VARCHAR || ':document' AS src,
                     lang || ':language' AS dst FROM documents
              UNION ALL
              SELECT doc_id::VARCHAR || ':document', source || ':source'
              FROM documents
            ), ends AS (
              SELECT src AS node, 1 AS o, 0 AS i FROM edges
              UNION ALL
              SELECT dst, 0, 1 FROM edges
            ), deg AS (
              SELECT node, sum(o)::BIGINT AS out_deg, sum(i)::BIGINT AS in_deg,
                     count(*) AS degree
              FROM ends GROUP BY node
            ), ranked AS (
              SELECT node, out_deg, in_deg, degree,
                     CAST(row_number() OVER (
                       ORDER BY degree DESC, node ASC
                     ) AS INTEGER) AS "rank"
              FROM deg
            )
            SELECT node, out_deg, in_deg, degree, "rank"
            FROM ranked WHERE "rank" <= 20
        """,
        "rep_signals": """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
              FROM documents
            ), base AS (
              SELECT doc_id, l FROM toks WHERE len(l) >= 2
            ), bg AS (
              SELECT doc_id, l[i] || ' ' || l[i + 1] AS b
              FROM base, UNNEST(range(1, len(l))) AS t(i)
            ), cnt AS (
              SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
            ), agg AS (
              SELECT doc_id, max(c) AS mx, sum(c)::BIGINT AS tot
              FROM cnt GROUP BY 1
            ), tok AS (
              SELECT doc_id, len(l) AS n, len(list_distinct(l)) AS nd FROM base
            )
            SELECT a.doc_id,
                   a.tot AS n_bigrams,
                   floor(a.mx::DOUBLE / a.tot * 10000 + 0.5) / 10000
                     AS top_bigram_frac,
                   floor((t.n - t.nd)::DOUBLE / t.n * 10000 + 0.5) / 10000
                     AS dup_token_frac
            FROM agg a JOIN tok t ON t.doc_id = a.doc_id
        """,
        "top_ngrams": """
            WITH toks AS (
              SELECT lang AS stratum, t.token
              FROM documents,
                   UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(token)
            ), counts AS (
              SELECT stratum, token, count(*) AS cnt
              FROM toks WHERE length(token) >= 2
              GROUP BY stratum, token
            ), ranked AS (
              SELECT stratum, token, cnt,
                     CAST(row_number() OVER (
                       PARTITION BY stratum ORDER BY cnt DESC, token ASC
                     ) AS INTEGER) AS "rank"
              FROM counts
            )
            SELECT stratum, token, cnt, "rank" FROM ranked WHERE "rank" <= 5
        """,
        "emb_near_dup": f"""
            SELECT a.vec_id AS a, b.vec_id AS b, {_COS_SQL} AS cos
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < b.vec_id
             AND ({_BUCKET_SQL.format(t='a')}) = ({_BUCKET_SQL.format(t='b')})
            WHERE {_COS_SQL} >= 0.3
        """,
        "sessionize": """
            WITH ordered AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus,
                     lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            ), flagged AS (
              SELECT *, CASE WHEN prev IS NULL
                              OR tus - prev > 30 * 60 * 1000000
                         THEN 1 ELSE 0 END AS new_s
              FROM ordered
            ), sess AS (
              SELECT *, sum(new_s) OVER
                (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_no
              FROM flagged
            )
            SELECT user_id,
                   min(tus) AS session_start_us,
                   max(tus) + 30 * 60 * 1000000 AS session_end_us,
                   count(*) AS n_events,
                   min(event_id) AS first_event,
                   max(event_id) AS last_event
            FROM sess GROUP BY user_id, session_no
        """,
        # SemDeDup: identical deterministic-centroid assignment as the IVF
        # oracle, within-cluster pairs, drop = lower-id neighbor at
        # rounded cos >= 0.4
        "semantic_dedup": f"""
            WITH cents AS (
              SELECT vec_id AS cid, embedding AS cvec FROM embeddings
              ORDER BY vec_id LIMIT 8
            ), assign AS (
              SELECT vec_id, v, cid AS cluster_id FROM (
                SELECT a.vec_id, a.embedding AS v, c.cid,
                       row_number() OVER (PARTITION BY a.vec_id
                         ORDER BY {_cos_raw_sql("a.embedding", "c.cvec")} DESC,
                                  c.cid ASC) AS rn
                FROM embeddings a CROSS JOIN cents c
              ) WHERE rn = 1
            ), dropped AS (
              SELECT DISTINCT b.vec_id
              FROM assign a JOIN assign b
                ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
              WHERE floor({_cos_raw_sql("a.v", "b.v")} * 10000 + 0.5) / 10000
                    >= 0.4
            )
            SELECT s.vec_id, s.cluster_id,
                   (d.vec_id IS NULL) AS keep
            FROM assign s LEFT JOIN dropped d ON d.vec_id = s.vec_id
        """,
        "emb_near_dup_amp": f"""
            SELECT a.vec_id AS a, b.vec_id AS b, {_COS_SQL} AS cos
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < b.vec_id
             AND (({_bucket_sql_at('a', 8, 0)}) = ({_bucket_sql_at('b', 8, 0)})
               OR ({_bucket_sql_at('a', 8, 8)}) = ({_bucket_sql_at('b', 8, 8)}))
            WHERE {_COS_SQL} >= 0.3
        """,
        # id-ordered (a<b<c) triangle enumeration — a different strategy
        # than Spark's degree-ordered wedges, but the same triangle SET,
        # so the per-node counts are an independent-derivation check
        "kg_triangles": """
            WITH e AS (
              SELECT DISTINCT least((doc_id*7)%61, (doc_id*11)%53) AS u,
                              greatest((doc_id*7)%61, (doc_id*11)%53) AS v
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1
              JOIN e e2 ON e2.u = e1.v
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            ), corners AS (
              SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri
            )
            SELECT 'hub' || node::VARCHAR AS node, count(*) AS triangles
            FROM corners GROUP BY 1
        """,
        "kg_bgp": """
            SELECT doc_id::VARCHAR || ':document' AS d,
                   lang || ':language' AS l,
                   source || ':source' AS s
            FROM documents
        """,
        "kg_communities": _lpa_sql(3),
        "kg_walks": _walks_sql(3, 0),
        "kg_linkpred": _linkpred_sql(16, 2),

        "cross_dedup": _minhash_sql_parts(16, 4, 3, collapse=False) + """
    , bn AS (SELECT doc_id AS a, band, band_key FROM banded WHERE doc_id % 2 = 0
    ), br AS (SELECT doc_id AS b, band, band_key FROM banded WHERE doc_id % 2 = 1
    ), cand AS (
      SELECT DISTINCT a, b FROM bn JOIN br USING (band, band_key)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT c.a, c.b, count(*) AS i
      FROM cand c
      JOIN sh x ON x.doc_id = c.a
      JOIN sh y ON y.doc_id = c.b AND y.s = x.s
      GROUP BY c.a, c.b
    ), jac AS (
      SELECT t.a, t.b,
             floor(t.i::DOUBLE / (na.n + nb.n - t.i) * 10000 + 0.5) / 10000
               AS jaccard
      FROM inter t
      JOIN sizes na ON na.doc_id = t.a
      JOIN sizes nb ON nb.doc_id = t.b
    )
    SELECT a, b, jaccard FROM jac WHERE jaccard >= 0.5
        """,
        "len_quantiles": """
            WITH t AS (
              SELECT lang, len(regexp_split_to_array(trim(text), '\\s+')) AS n
              FROM documents
            )
            SELECT lang, count(*) AS n_docs,
                   floor(quantile_cont(n, 0.25) * 10000 + 0.5) / 10000 AS p25,
                   floor(quantile_cont(n, 0.5)  * 10000 + 0.5) / 10000 AS p50,
                   floor(quantile_cont(n, 0.9)  * 10000 + 0.5) / 10000 AS p90,
                   floor(quantile_cont(n, 0.99) * 10000 + 0.5) / 10000 AS p99
            FROM t GROUP BY lang
        """,

        "asof_join": """
            WITH views AS (
              SELECT event_id, ts, user_id, value FROM events
              WHERE event_type = 'view'
            ), clicks AS (
              SELECT event_id AS click_id, ts, user_id, value AS click_value
              FROM events WHERE event_type = 'click'
            )
            SELECT v.user_id, epoch_us(v.ts) AS ts_us, v.event_id, v.value,
                   c.click_id AS click_id_r, c.click_value AS click_value_r
            FROM views v ASOF LEFT JOIN clicks c
              ON v.user_id = c.user_id AND v.ts >= c.ts
        """,
        "range_join": """
            WITH windows AS (
              SELECT event_id AS incident_id, user_id, ts AS s,
                     ts + INTERVAL 10 MINUTE AS e
              FROM events WHERE event_type = 'error'
            )
            SELECT p.event_id, p.user_id, w.incident_id
            FROM events p JOIN windows w
              ON p.user_id = w.user_id AND p.ts >= w.s AND p.ts <= w.e
        """,

        "sample_weighted": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars::DOUBLE /
                     (('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 15))::BIGINT)::DOUBLE
                     DESC, doc_id
            LIMIT 50
        """,
        "sample_poisson": """
            SELECT doc_id, n_chars FROM documents
            WHERE (('0x' || substr(md5('3:' || doc_id::VARCHAR), 1, 15))::BIGINT)::DOUBLE
                    / 1152921504606846976.0
                  < 60 * n_chars::DOUBLE /
                    (SELECT sum(n_chars)::DOUBLE FROM documents)
        """,
        "vocab_kmv": """
            WITH tok AS (
              SELECT lang, UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
              FROM documents
            ), hashed AS (
              SELECT DISTINCT lang,
                     (('0x' || substr(md5(token), 1, 15))::BIGINT) AS h
              FROM tok
            ), ranked AS (
              SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS r
              FROM hashed
            )
            SELECT lang, count(*) AS n_kept,
                   CASE WHEN count(*) < 16 THEN count(*)
                        ELSE CAST(floor(15 * 1152921504606846976.0 / max(h)::DOUBLE + 0.5) AS BIGINT)
                   END AS estimate
            FROM ranked WHERE r <= 16 GROUP BY lang
        """,
        "bpe_vocab": """
    WITH words AS MATERIALIZED (
      SELECT w, count(*) AS freq FROM (
        SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    ), v0 AS MATERIALIZED (
      SELECT '  ' || list_aggregate(regexp_split_to_array(w, ''), 'string_agg', '  ')
             || '  </w>  ' AS s, freq
      FROM words
    ), p1 AS MATERIALIZED (
      SELECT x.l[i] AS a, x.l[i + 1] AS b, CAST(sum(x.freq) AS BIGINT) AS cnt
      FROM (SELECT regexp_split_to_array(trim(s), '  ') AS l, freq FROM v0) x,
           UNNEST(range(1, len(x.l))) AS t(i)
      GROUP BY 1, 2
    ), t1 AS MATERIALIZED (
      SELECT 1 AS step, a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1
    ), v1 AS MATERIALIZED (
      SELECT replace(v.s, ' ' || t.a || '  ' || t.b || ' ',
                     ' ' || t.a || t.b || ' ') AS s, v.freq
      FROM v0 v CROSS JOIN t1 t
    ), p2 AS MATERIALIZED (
      SELECT x.l[i] AS a, x.l[i + 1] AS b, CAST(sum(x.freq) AS BIGINT) AS cnt
      FROM (SELECT regexp_split_to_array(trim(s), '  ') AS l, freq FROM v1) x,
           UNNEST(range(1, len(x.l))) AS t(i)
      GROUP BY 1, 2
    ), t2 AS MATERIALIZED (
      SELECT 2 AS step, a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1
    ), v2 AS MATERIALIZED (
      SELECT replace(v.s, ' ' || t.a || '  ' || t.b || ' ',
                     ' ' || t.a || t.b || ' ') AS s, v.freq
      FROM v1 v CROSS JOIN t2 t
    ), p3 AS MATERIALIZED (
      SELECT x.l[i] AS a, x.l[i + 1] AS b, CAST(sum(x.freq) AS BIGINT) AS cnt
      FROM (SELECT regexp_split_to_array(trim(s), '  ') AS l, freq FROM v2) x,
           UNNEST(range(1, len(x.l))) AS t(i)
      GROUP BY 1, 2
    ), t3 AS MATERIALIZED (
      SELECT 3 AS step, a, b, cnt FROM p3 ORDER BY cnt DESC, a, b LIMIT 1
    ), v3 AS MATERIALIZED (
      SELECT replace(v.s, ' ' || t.a || '  ' || t.b || ' ',
                     ' ' || t.a || t.b || ' ') AS s, v.freq
      FROM v2 v CROSS JOIN t3 t
    ), p4 AS MATERIALIZED (
      SELECT x.l[i] AS a, x.l[i + 1] AS b, CAST(sum(x.freq) AS BIGINT) AS cnt
      FROM (SELECT regexp_split_to_array(trim(s), '  ') AS l, freq FROM v3) x,
           UNNEST(range(1, len(x.l))) AS t(i)
      GROUP BY 1, 2
    ), t4 AS MATERIALIZED (
      SELECT 4 AS step, a, b, cnt FROM p4 ORDER BY cnt DESC, a, b LIMIT 1
    ), v4 AS MATERIALIZED (
      SELECT replace(v.s, ' ' || t.a || '  ' || t.b || ' ',
                     ' ' || t.a || t.b || ' ') AS s, v.freq
      FROM v3 v CROSS JOIN t4 t
    ), p5 AS MATERIALIZED (
      SELECT x.l[i] AS a, x.l[i + 1] AS b, CAST(sum(x.freq) AS BIGINT) AS cnt
      FROM (SELECT regexp_split_to_array(trim(s), '  ') AS l, freq FROM v4) x,
           UNNEST(range(1, len(x.l))) AS t(i)
      GROUP BY 1, 2
    ), t5 AS MATERIALIZED (
      SELECT 5 AS step, a, b, cnt FROM p5 ORDER BY cnt DESC, a, b LIMIT 1
    ), v5 AS MATERIALIZED (
      SELECT replace(v.s, ' ' || t.a || '  ' || t.b || ' ',
                     ' ' || t.a || t.b || ' ') AS s, v.freq
      FROM v4 v CROSS JOIN t5 t
    ), p6 AS MATERIALIZED (
      SELECT x.l[i] AS a, x.l[i + 1] AS b, CAST(sum(x.freq) AS BIGINT) AS cnt
      FROM (SELECT regexp_split_to_array(trim(s), '  ') AS l, freq FROM v5) x,
           UNNEST(range(1, len(x.l))) AS t(i)
      GROUP BY 1, 2
    ), t6 AS MATERIALIZED (
      SELECT 6 AS step, a, b, cnt FROM p6 ORDER BY cnt DESC, a, b LIMIT 1
    ), v6 AS MATERIALIZED (
      SELECT replace(v.s, ' ' || t.a || '  ' || t.b || ' ',
                     ' ' || t.a || t.b || ' ') AS s, v.freq
      FROM v5 v CROSS JOIN t6 t
    )
    SELECT step, a, b, cnt FROM t1 UNION ALL SELECT step, a, b, cnt FROM t2 UNION ALL SELECT step, a, b, cnt FROM t3 UNION ALL SELECT step, a, b, cnt FROM t4 UNION ALL SELECT step, a, b, cnt FROM t5 UNION ALL SELECT step, a, b, cnt FROM t6""",

        "pmi_top": """
            WITH toks AS (
              SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS l
              FROM documents
            ), uni AS (
              SELECT t, count(*) AS c1
              FROM (SELECT UNNEST(l) AS t FROM toks) GROUP BY t
            ), bigr AS (
              SELECT x.l[i] AS x, x.l[i + 1] AS y, count(*) AS cxy
              FROM (SELECT l FROM toks WHERE len(l) >= 2) x,
                   UNNEST(range(1, len(x.l))) AS t(i)
              GROUP BY 1, 2 HAVING count(*) >= 5
            )
            SELECT b.x, b.y, b.cxy,
                   (CAST(1000000 AS BIGINT) * b.cxy // (ux.c1 * uy.c1)) AS score
            FROM bigr b JOIN uni ux ON b.x = ux.t JOIN uni uy ON b.y = uy.t
            ORDER BY score DESC, b.x, b.y LIMIT 20
        """,
        "kg_hits": _hits_sql(4),
        "kg_sssp": _sssp_sql(6),
        "pq_codes": """
            WITH cb AS (
              SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
              FROM embeddings WHERE vec_id < 16
            ), assigned AS (
              SELECT e.vec_id,
                     arg_min(c.cid, CAST(floor(list_dot_product(list_transform(generate_series(1, 16), i -> e.embedding[i]::DOUBLE - c.cv[i]), list_transform(generate_series(1, 16), i -> e.embedding[i]::DOUBLE - c.cv[i])) * 10000 + 0.5) AS BIGINT) * 65536 + c.cid) AS c0,
                     arg_min(c.cid, CAST(floor(list_dot_product(list_transform(generate_series(17, 32), i -> e.embedding[i]::DOUBLE - c.cv[i]), list_transform(generate_series(17, 32), i -> e.embedding[i]::DOUBLE - c.cv[i])) * 10000 + 0.5) AS BIGINT) * 65536 + c.cid) AS c1,
                     arg_min(c.cid, CAST(floor(list_dot_product(list_transform(generate_series(33, 48), i -> e.embedding[i]::DOUBLE - c.cv[i]), list_transform(generate_series(33, 48), i -> e.embedding[i]::DOUBLE - c.cv[i])) * 10000 + 0.5) AS BIGINT) * 65536 + c.cid) AS c2,
                     arg_min(c.cid, CAST(floor(list_dot_product(list_transform(generate_series(49, 64), i -> e.embedding[i]::DOUBLE - c.cv[i]), list_transform(generate_series(49, 64), i -> e.embedding[i]::DOUBLE - c.cv[i])) * 10000 + 0.5) AS BIGINT) * 65536 + c.cid) AS c3
              FROM embeddings e CROSS JOIN cb c
              GROUP BY e.vec_id
            )
            SELECT vec_id, [c0, c1, c2, c3] AS codes FROM assigned
        """,
        "train_order": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                     ORDER BY (('0x' || substr(md5('3:' || doc_id::VARCHAR), 1, 15))::BIGINT), doc_id) - 1 AS BIGINT) AS position
            FROM documents
        """,
        "dsir_weights": """
            WITH base AS (
              SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
                     regexp_split_to_array(trim(text), '\\s+') AS l
              FROM documents
            ), tok AS (
              SELECT doc_id, t, UNNEST(l) AS tk FROM base WHERE len(l) >= 1
            ), docb AS (
              SELECT doc_id, t,
                     (('0x' || substr(md5(tk), 1, 15))::BIGINT) % 4096 AS b,
                     count(*) AS k
              FROM tok GROUP BY 1, 2, 3
            ), hist AS (
              SELECT b, sum(k)::BIGINT AS cb, sum(k * t)::BIGINT AS tb
              FROM docb GROUP BY b
            ), sc AS (
              SELECT d.doc_id, d.k,
                     (CAST(1000000 AS BIGINT) * h.tb // h.cb) AS r
              FROM docb d JOIN hist h ON d.b = h.b
            )
            SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
                   CAST(sum(k * r) // sum(k) AS BIGINT) AS weight
            FROM sc GROUP BY doc_id
        """,
        "corpus_cube": """
            SELECT lang, source, count(*) AS n_docs,
                   CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                        AS BIGINT) AS n_tokens
            FROM documents GROUP BY CUBE (lang, source)
        """,
        "lm_score": """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
              FROM documents
            ), base AS (
              SELECT doc_id, l FROM toks WHERE len(l) >= 2
            ), bg AS (
              SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
              FROM base, UNNEST(range(1, len(l))) AS t(i)
            ), docbg AS (
              SELECT doc_id, w1, w2, count(*) AS k FROM bg GROUP BY 1, 2, 3
            ), m2 AS (
              SELECT w1, w2, sum(k)::BIGINT AS c2 FROM docbg GROUP BY 1, 2
            ), m1 AS (
              SELECT w1, sum(c2)::BIGINT AS c1 FROM m2 GROUP BY 1
            ), sc AS (
              SELECT d.doc_id, d.k,
                     (CAST(1000000 AS BIGINT) * m2.c2 // m1.c1) AS p
              FROM docbg d JOIN m2 ON d.w1 = m2.w1 AND d.w2 = m2.w2
                           JOIN m1 ON d.w1 = m1.w1
            )
            SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
                   CAST(sum(k * p) // sum(k) AS BIGINT) AS fluency
            FROM sc GROUP BY doc_id
        """,
        "host_graph": """
            WITH l AS (
              SELECT source || '.example' AS src_host,
                     'hub' || ((doc_id*7)%97)::VARCHAR AS dst_host
              FROM documents
              UNION ALL
              SELECT source || '.example',
                     'hub' || ((doc_id*11)%97)::VARCHAR
              FROM documents
            )
            SELECT src_host, dst_host, count(*) AS n_links
            FROM l GROUP BY 1, 2
        """,
        "quality_classifier": f"""
            WITH w AS (
              SELECT i AS bucket,
                     {_SQL_MD5INT.format(x="'w:5:' || i::VARCHAR")} % 2001 - 1000
                       AS weight
              FROM range(4096) t(i)
            ), toks AS (
              SELECT doc_id,
                     {_SQL_MD5INT.format(x="t.token")} % 4096 AS bucket
              FROM documents,
                   UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+'))
                     AS t(token)
              WHERE length(t.token) >= 3
            )
            SELECT toks.doc_id AS id,
                   sum(coalesce(w.weight, 0))::BIGINT AS score,
                   sum(coalesce(w.weight, 0)) >= 0 AS keep
            FROM toks LEFT JOIN w USING (bucket)
            GROUP BY 1
        """,
        "rdf_nt": """
            WITH n AS (
              SELECT doc_id::VARCHAR || '%3Adocument' AS id, 'document' AS label
              FROM documents
              UNION ALL
              SELECT DISTINCT lang || '%3Alanguage', 'language' FROM documents
              UNION ALL
              SELECT DISTINCT source || '%3Asource', 'source' FROM documents
            ), e AS (
              SELECT doc_id::VARCHAR || '%3Adocument' AS src,
                     lang || '%3Alanguage' AS dst, 'in_language' AS rel
              FROM documents
              UNION ALL
              SELECT doc_id::VARCHAR || '%3Adocument',
                     source || '%3Asource', 'from_source'
              FROM documents
            )
            SELECT '<urn:ow:node/' || id
                   || '> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
                   || '<urn:ow:class/' || label || '> .' AS line
            FROM n
            UNION ALL
            SELECT '<urn:ow:node/' || src || '> <urn:ow:rel/' || rel
                   || '> <urn:ow:node/' || dst || '> .'
            FROM e
        """,
        "pii_scrub": """
            WITH salted AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                          || doc_id::VARCHAR || '@mail.example now'
                        ELSE '' END
                     || CASE WHEN doc_id % 5 = 0 THEN ' from 10.'
                          || (doc_id % 200)::VARCHAR || '.0.1'
                        ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN ' call 555-867-'
                          || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                        ELSE '' END AS text
              FROM documents
            )
            SELECT doc_id, text,
                   len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
                     AS n_email,
                   len(regexp_extract_all(text,
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT
                     AS n_ipv4,
                   len(regexp_extract_all(text,
                     '(?:\\+?\\d{1,2}[-. ]?)?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b'))::BIGINT
                     AS n_phone,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                     '<IP>', 'g'),
                     '(?:\\+?\\d{1,2}[-. ]?)?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b',
                     '<PHONE>', 'g') AS clean_text
            FROM salted
        """,
        # integer-rational idf ((1e6*N) DIV df) — bit-exact in both engines
        "tfidf_terms": """
            WITH toks AS (
              SELECT doc_id AS doc, t.token
              FROM documents,
                   UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(token)
              WHERE length(t.token) >= 3
            ), tf AS (
              SELECT doc, token, count(*) AS tf FROM toks GROUP BY doc, token
            ), dft AS (
              SELECT token, count(*) AS df_t FROM tf GROUP BY token
            ), n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc, tf.token, tf.tf, dft.df_t,
                     tf.tf * ((1000000::BIGINT * n.n_docs) // dft.df_t) AS score
              FROM tf JOIN dft USING (token) CROSS JOIN n
              WHERE dft.df_t <= 1.0 * n.n_docs
            ), ranked AS (
              SELECT *, CAST(row_number() OVER (
                       PARTITION BY doc ORDER BY score DESC, token ASC
                     ) AS INTEGER) AS "rank"
              FROM scored
            )
            SELECT doc, token, tf, df_t, score, "rank"
            FROM ranked WHERE "rank" <= 3
        """,
        # sqrt(n_min/n_s): IEEE sqrt + / are correctly rounded -> the keep
        # SET is bit-identical across engines
        "temp_mix": f"""
            WITH c AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
            m AS (SELECT min(n_s) AS n_min FROM c),
            r AS (SELECT lang, sqrt(m.n_min::DOUBLE / c.n_s::DOUBLE) AS mix_rate
                  FROM c CROSS JOIN m)
            SELECT d.lang, d.doc_id, r.mix_rate
            FROM documents d JOIN r USING (lang)
            WHERE {_SQL_MD5INT.format(x="'42:' || d.doc_id::VARCHAR")} % 1000000
                  < r.mix_rate * 1000000
        """,
        # groups by the raw line (Spark keys on its md5 — independent
        # derivation of the same frequent-line set)
        "boilerplate": """
            WITH salted AS (
              SELECT doc_id,
                     text || chr(10) || '(c) example corp all rights reserved'
                          || chr(10) || 'ref ' || doc_id::VARCHAR AS text
              FROM documents
            ), lines AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS pos
              FROM salted
            ), ldf AS (
              SELECT line, count(DISTINCT doc_id) AS line_df
              FROM lines GROUP BY line
            ), kept AS (
              SELECT l.doc_id, l.pos, l.line
              FROM lines l JOIN ldf USING (line)
              WHERE ldf.line_df <= 10
            ), agg AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id
            )
            SELECT s.doc_id,
                   coalesce(a.clean_text, '') AS clean_text,
                   coalesce(a.n_kept, 0)::BIGINT AS n_kept,
                   (len(string_split(s.text, chr(10)))
                    - coalesce(a.n_kept, 0))::BIGINT AS n_removed
            FROM salted s LEFT JOIN agg a USING (doc_id)
        """,
        "inv_index": """
            WITH toks AS (
              SELECT doc_id AS doc, t.token
              FROM documents,
                   UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(token)
              WHERE length(t.token) >= 3
            ), tf AS (
              SELECT token, doc, count(*) AS tf FROM toks GROUP BY token, doc
            )
            SELECT token, count(*)::BIGINT AS df_t, sum(tf)::BIGINT AS total_tf,
                   string_agg(doc::VARCHAR || ':' || tf::VARCHAR, ' '
                              ORDER BY doc) AS postings
            FROM tf GROUP BY token
        """,
        # two unrolled peel rounds — mirrors k_core(exact_rounds=2)
        "kg_kcore": """
            WITH e0 AS (
              SELECT DISTINCT least((doc_id*7)%61, (doc_id*11)%53) AS u,
                              greatest((doc_id*7)%61, (doc_id*11)%53) AS v
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), d0 AS (
              SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
              ) GROUP BY node
            ), bad0 AS (SELECT node FROM d0 WHERE deg < 15),
            e1 AS (
              SELECT u, v FROM e0
              WHERE u NOT IN (SELECT node FROM bad0)
                AND v NOT IN (SELECT node FROM bad0)
            ), d1 AS (
              SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1
              ) GROUP BY node
            ), bad1 AS (SELECT node FROM d1 WHERE deg < 15),
            e2 AS (
              SELECT u, v FROM e1
              WHERE u NOT IN (SELECT node FROM bad1)
                AND v NOT IN (SELECT node FROM bad1)
            )
            SELECT 'hub' || node::VARCHAR AS node, count(*) AS deg
            FROM (SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
            GROUP BY 1
        """,
        # DuckDB list slice l[a:b] is 1-based INCLUSIVE == Spark
        # slice(l, a, len) with b = a+len-1; both clamp at the end
        "chunk_docs": """
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id, toks,
                     unnest(generate_series(0, len(toks) - 1, 15)) AS start
              FROM t
            )
            SELECT doc_id,
                   (start // 15)::INTEGER AS chunk_id,
                   array_to_string(toks[start + 1 : start + 20], ' ') AS chunk,
                   len(toks[start + 1 : start + 20])::INTEGER AS n_chunk_toks
            FROM s
        """,
        "kg_community_graph": f"""
            WITH comm AS (
              {_lpa_sql(3)}
            ), raw AS (
              SELECT 'hub' || ((doc_id*7)%61)::VARCHAR AS a,
                     'hub' || ((doc_id*11)%53)::VARCHAR AS b
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), und AS (
              SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM raw WHERE a <> b
            )
            SELECT least(cu.community, cv.community) AS src_community,
                   greatest(cu.community, cv.community) AS dst_community,
                   count(*)::BIGINT AS weight
            FROM und
            JOIN comm cu ON cu.node = und.u
            JOIN comm cv ON cv.node = und.v
            GROUP BY 1, 2
        """,
        "kg_ppr": _ppr_sql(iterations=5),
        "kg_modularity": f"""
            WITH comm AS (
              {_lpa_sql(3)}
            ), raw AS (
              SELECT 'hub' || ((doc_id*7)%61)::VARCHAR AS a,
                     'hub' || ((doc_id*11)%53)::VARCHAR AS b
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), und AS (
              SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM raw WHERE a <> b
            ), mm AS (
              SELECT count(*)::BIGINT AS m FROM und
            ), deg AS (
              SELECT node, count(*)::BIGINT AS d FROM (
                SELECT u AS node FROM und UNION ALL SELECT v FROM und
              ) GROUP BY node
            ), intra AS (
              SELECT count(*)::BIGINT AS intra_edges
              FROM und
              JOIN comm cu ON cu.node = und.u
              JOIN comm cv ON cv.node = und.v
              WHERE cu.community = cv.community
            ), dsq AS (
              SELECT sum(dc * dc)::BIGINT AS degree_sq_sum FROM (
                SELECT sum(d)::BIGINT AS dc
                FROM deg JOIN comm USING (node) GROUP BY community
              )
            )
            SELECT mm.m, intra.intra_edges, dsq.degree_sq_sum,
                   floor((4 * mm.m * intra.intra_edges
                          - dsq.degree_sq_sum)::DOUBLE
                         / (4 * mm.m * mm.m)::DOUBLE * 10000 + 0.5) / 10000
                     AS modularity
            FROM mm, intra, dsq
        """,
        "interleave_order": f"""
            WITH r AS (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY {_SQL_MD5INT.format(x="'3:' || doc_id::VARCHAR")}
                         ASC, doc_id ASC) AS rnk
              FROM documents
            )
            SELECT doc_id, lang,
                   row_number() OVER (ORDER BY rnk, lang) - 1 AS position
            FROM r
        """,
        "bm25_topk": _bm25_sql(BM25_QUERY, 25),
        "sliding_windows": """
            WITH ev AS (
              SELECT event_id, event_type,
                     (epoch_us(ts) // 1800000000) * 1800000000 AS g
              FROM events
            ), x AS (
              SELECT event_id, event_type,
                     g - u.k * 1800000000 AS ws
              FROM ev, LATERAL unnest([0, 1]) AS u(k)
            )
            SELECT ws AS window_start_us, event_type, count(*)::BIGINT AS n,
                   min(event_id) AS first_event
            FROM x GROUP BY ws, event_type
        """,
        "quality_tiles": """
            SELECT doc_id, lang,
                   ntile(10) OVER (PARTITION BY lang
                     ORDER BY n_chars DESC, doc_id ASC) AS tile
            FROM documents
        """,
        "norm_text": """
            WITH dirty AS (
              SELECT doc_id,
                     chr(8203) || '  ' || text || chr(9) || chr(9) || 'end'
                       || chr(7) || 'here' || repeat(chr(10), 4) || 'tail  '
                       AS t
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(t,
                               '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
                             '[\\x00-\\x08\\x0B-\\x1F\\x7F\\t]', ' ', 'g'),
                           ' {2,}', ' ', 'g'),
                         ' *\\n *', chr(10), 'g'),
                       '\\n{3,}', chr(10) || chr(10), 'g'),
                     '^[\\s]+|[\\s]+$', '', 'g') AS clean
            FROM dirty
        """,
        "dedup_keep": f"""
            SELECT d.doc_id,
                   coalesce(c.cluster_id, d.doc_id) AS cluster_id,
                   (c.cluster_id IS NULL OR c.cluster_id = d.doc_id) AS keep
            FROM documents d LEFT JOIN ({clusters_sql}) c USING (doc_id)
        """,
        "walk_pairs": f"""
            WITH walks AS (
              {_walks_sql(3, 0)}
            ), fwd AS (
              SELECT l.node AS center, r.node AS context
              FROM walks l JOIN walks r
                ON l.walk_id = r.walk_id
               AND r.step > l.step AND r.step - l.step <= 2
            )
            SELECT center, context, count(*)::BIGINT AS n_pairs FROM (
              SELECT center, context FROM fwd
              UNION ALL
              SELECT context AS center, center AS context FROM fwd
            ) GROUP BY center, context
        """,
        "filter_audit": """
            WITH t AS (
              SELECT doc_id,
                     len(regexp_split_to_array(trim(text), '\\s+')) AS n,
                     len(list_distinct(
                       regexp_split_to_array(trim(text), '\\s+'))) AS nd,
                     length(regexp_replace(text, '\\s+', '', 'g')) AS chars,
                     len(regexp_extract_all(lower(text),
                       '\\b(the|a|an|and|or|of|to|in|is|it)\\b', 1)) AS stop_hits
              FROM documents
            ), r AS (
              SELECT doc_id, n,
                     (CASE WHEN n < 5 THEN 1 ELSE 0 END
                      + CASE WHEN n > 5000 THEN 2 ELSE 0 END
                      + CASE WHEN chars < 3 * n OR chars > 10 * n
                             THEN 4 ELSE 0 END
                      + CASE WHEN stop_hits = 0 THEN 8 ELSE 0 END
                      + CASE WHEN n > 2 * nd THEN 16 ELSE 0 END) AS reasons
              FROM t
            )
            SELECT doc_id, n::BIGINT AS n_tokens, reasons::INTEGER AS reasons,
                   (reasons = 0) AS keep
            FROM r
        """,
        "er_pairs": """
            WITH ents AS (
              SELECT doc_id * 2 AS entity_id,
                     'entity ' || (doc_id % 500)::VARCHAR || ' corp' AS cn
              FROM documents
              UNION ALL
              SELECT doc_id * 2 + 1,
                     CASE WHEN doc_id % 3 = 0
                          THEN replace('entity ' || (doc_id % 500)::VARCHAR
                                       || ' corp', 'corp', 'crop')
                          ELSE 'entity ' || (doc_id % 500)::VARCHAR || ' corp'
                     END
              FROM documents
            ), ranked AS (
              SELECT entity_id, cn,
                     row_number() OVER (ORDER BY cn, entity_id) - 1 AS rk
              FROM ents
            )
            SELECT l.entity_id AS a, r.entity_id AS b,
                   l.cn AS name_a, r.cn AS name_b,
                   levenshtein(l.cn, r.cn) AS distance
            FROM ranked l JOIN ranked r
              ON r.rk > l.rk AND r.rk - l.rk <= 3
            WHERE levenshtein(l.cn, r.cn) <= 2
        """,
        "dedup_containment": _minhash_sql_parts(collapse=True) + """
          , counts AS (
            SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
          ), cand AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.band_key = r.band_key
             AND l.doc_id < r.doc_id
          ), scored AS (
            SELECT c.a, c.b,
                   floor(count(*)::DOUBLE / any_value(ca.n_sh)
                         * 10000 + 0.5) / 10000 AS containment_a,
                   floor(count(*)::DOUBLE / any_value(cb.n_sh)
                         * 10000 + 0.5) / 10000 AS containment_b,
                   floor(count(*)::DOUBLE /
                         (any_value(ca.n_sh) + any_value(cb.n_sh) - count(*))
                         * 10000 + 0.5) / 10000 AS jaccard
            FROM cand c
            JOIN sh la ON la.doc_id = c.a
            JOIN sh lb ON lb.doc_id = c.b AND lb.s = la.s
            JOIN counts ca ON ca.doc_id = c.a
            JOIN counts cb ON cb.doc_id = c.b
            GROUP BY c.a, c.b
          )
          SELECT a, b, containment_a, containment_b, jaccard FROM scored
          WHERE containment_a >= 0.8 OR containment_b >= 0.8
          UNION ALL
          SELECT a, b, 1.0::DOUBLE AS containment_a, 1.0::DOUBLE AS containment_b,
                 1.0::DOUBLE AS jaccard
          FROM star
        """,
        "event_windows": """
            SELECT epoch_us(date_trunc('hour', ts))::BIGINT AS window_start_us,
                   (epoch_us(date_trunc('hour', ts)) + 3600000000)::BIGINT
                     AS window_end_us,
                   event_type, count(*)::BIGINT AS n,
                   min(event_id) AS first_event, max(event_id) AS last_event
            FROM events
            GROUP BY date_trunc('hour', ts), event_type
        """,
        "lang_confusion": f"""
            WITH p AS (
              SELECT lang, {_lang_id_sql()} AS pred FROM documents
            )
            SELECT lang,
                   sum(CASE WHEN pred = 'de' THEN 1 ELSE 0 END)::BIGINT AS de,
                   sum(CASE WHEN pred = 'en' THEN 1 ELSE 0 END)::BIGINT AS en,
                   sum(CASE WHEN pred = 'es' THEN 1 ELSE 0 END)::BIGINT AS es,
                   sum(CASE WHEN pred = 'fr' THEN 1 ELSE 0 END)::BIGINT AS fr,
                   sum(CASE WHEN pred = 'und' THEN 1 ELSE 0 END)::BIGINT AS und
            FROM p GROUP BY lang
        """,
        "cms_topk": f"""
            WITH toks AS (
              SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS tok
              FROM documents
            ), cells AS (
              SELECT u.i AS row,
                     {_SQL_MD5INT.format(x="'cms' || u.i::VARCHAR || ':' || tok")}
                       % 1024 AS bucket
              FROM toks, LATERAL unnest([0, 1, 2, 3]) AS u(i)
            ), sk AS (
              SELECT row, bucket, count(*)::BIGINT AS c
              FROM cells GROUP BY row, bucket
            ), exact AS (
              SELECT tok AS token, count(*)::BIGINT AS exact_n
              FROM toks GROUP BY tok
              ORDER BY exact_n DESC, token ASC LIMIT 25
            ), keys AS (
              SELECT token, exact_n, u.i AS row,
                     {_SQL_MD5INT.format(x="'cms' || u.i::VARCHAR || ':' || token")}
                       % 1024 AS bucket
              FROM exact, LATERAL unnest([0, 1, 2, 3]) AS u(i)
            )
            SELECT k.token, any_value(k.exact_n) AS exact_n,
                   min(coalesce(sk.c, 0))::BIGINT AS cms_n
            FROM keys k LEFT JOIN sk USING (row, bucket)
            GROUP BY k.token
        """,
        "sample_group_k": f"""
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY {_SQL_MD5INT.format(x="'5:' || doc_id::VARCHAR")}
                         ASC, doc_id ASC) AS rn
              FROM documents
            ) WHERE rn <= 100
        """,
        "kg_negatives": f"""
            WITH raw AS (
              {_doc_graph_sql()}
            ), e AS (
              SELECT DISTINCT src, 'rel' AS label, dst FROM raw
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM e UNION ALL SELECT dst FROM e
              )
            ), idx AS (
              SELECT node, row_number() OVER (ORDER BY node) - 1 AS i
              FROM nodes
            ), cand AS (
              SELECT e.src, e.label, e.dst, u.j,
                     {_SQL_MD5INT.format(
                         x="'neg7:' || u.j::VARCHAR || ':' || e.src || '>' "
                           "|| e.label || '>' || e.dst")}
                       % (SELECT count(*) FROM nodes) AS i
              FROM e, LATERAL unnest([0, 1]) AS u(j)
            )
            SELECT c.src, c.label, x.node AS neg_dst, c.j
            FROM cand c JOIN idx x USING (i)
            WHERE x.node <> c.dst
              AND NOT EXISTS (
                SELECT 1 FROM e t
                WHERE t.src = c.src AND t.label = c.label AND t.dst = x.node
              )
        """,
        "bpe_tokenize": _bpe_apply_sql(6),
        # groups by the raw paragraph string (Spark keys on its md5 —
        # independent derivation of the same first-occurrence winner set)
        "para_dedup": """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
              FROM documents
            ), synth AS (
              -- coalesce: DuckDB's array_to_string([]) is NULL where
              -- Spark's array_join([]) is '' (short docs)
              SELECT doc_id,
                     coalesce(array_to_string(tk[1:8], ' '), '') || chr(10) ||
                     'subscribe to our newsletter edition ' ||
                       ((doc_id + 0) % 7)::VARCHAR || chr(10) ||
                     coalesce(array_to_string(tk[9:16], ' '), '') || chr(10) ||
                     'subscribe to our newsletter edition ' ||
                       ((doc_id + 1) % 7)::VARCHAR || chr(10) ||
                     coalesce(array_to_string(tk[17:24], ' '), '') AS text
              FROM toks
            ), paras AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS para,
                     generate_subscripts(string_split(text, chr(10)), 1) AS pos
              FROM synth
            ), kept AS (
              SELECT doc_id, pos, para FROM (
                SELECT doc_id, pos, para,
                       row_number() OVER (PARTITION BY para
                                          ORDER BY doc_id, pos) AS rn
                FROM paras
              ) WHERE rn = 1
            )
            SELECT k.doc_id,
                   string_agg(k.para, chr(10) ORDER BY k.pos) AS text,
                   any_value(len(string_split(s.text, chr(10)))) AS n_paras,
                   count(*)::BIGINT AS n_kept
            FROM kept k JOIN synth s USING (doc_id)
            GROUP BY k.doc_id
        """,
        # counts duplicated 5-gram windows by the raw gram string (Spark
        # keys on its md5)
        "dup_ngrams": """
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents
            ), grams AS (
              SELECT doc_id, array_to_string(toks[i : i + 4], ' ') AS gram
              FROM t, LATERAL unnest(
                generate_series(1, greatest(len(toks) - 4, 1))) AS u(i)
            ), c AS (
              SELECT gram, count(*) AS cnt FROM grams GROUP BY gram
            )
            SELECT doc_id,
                   count(*)::BIGINT AS n_windows,
                   sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)::BIGINT
                     AS n_dup_windows,
                   floor(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)::DOUBLE
                         / count(*) * 10000 + 0.5) / 10000 AS dup_frac
            FROM grams g JOIN c USING (gram)
            GROUP BY doc_id
        """,
        "scd2_intervals": """
            WITH snaps AS (
              SELECT 'https://crawl.' || source || '.com/p/'
                       || doc_id::VARCHAR AS url,
                     u.k::BIGINT AS ts,
                     CASE WHEN u.k < doc_id % 4 THEN 'a' ELSE 'b' END AS value
              FROM documents, LATERAL unnest([0, 1, 2]) AS u(k)
            ), chg AS (
              SELECT url, ts, value,
                     CASE WHEN lag(value) OVER w IS NULL
                            OR lag(value) OVER w <> value
                          THEN 1 ELSE 0 END AS is_new
              FROM snaps WINDOW w AS (PARTITION BY url ORDER BY ts, value)
            ), runs AS (
              SELECT url, ts, value,
                     sum(is_new) OVER (PARTITION BY url ORDER BY ts, value
                       ROWS UNBOUNDED PRECEDING) AS run
              FROM chg
            ), per_run AS (
              SELECT url, run, min(ts) AS valid_from,
                     any_value(value) AS value,
                     count(*)::BIGINT AS n_snapshots
              FROM runs GROUP BY url, run
            )
            SELECT url, value, valid_from,
                   lead(valid_from) OVER w2 AS valid_to,
                   n_snapshots,
                   (lead(valid_from) OVER w2 IS NULL) AS is_current
            FROM per_run WINDOW w2 AS (PARTITION BY url ORDER BY run)
        """,
        "claim_vote": """
            WITH claims AS (
              SELECT 'e' || (doc_id % 1000)::VARCHAR AS subj,
                     'lang' AS pred, lang AS obj FROM documents
              UNION ALL
              SELECT 'e' || (doc_id % 1000)::VARCHAR, 'source', source
              FROM documents
            ), per_obj AS (
              SELECT subj, pred, obj, count(*)::BIGINT AS support
              FROM claims GROUP BY subj, pred, obj
            ), ranked AS (
              SELECT subj, pred, obj, support,
                     row_number() OVER (PARTITION BY subj, pred
                       ORDER BY support DESC, obj ASC) AS rn,
                     sum(support) OVER (PARTITION BY subj, pred)
                       AS total_support,
                     count(*) OVER (PARTITION BY subj, pred) AS n_objects
              FROM per_obj
            )
            SELECT subj, pred, obj, support,
                   total_support::BIGINT AS total_support,
                   n_objects::BIGINT AS n_objects,
                   floor(support::DOUBLE / total_support * 10000 + 0.5)
                     / 10000 AS confidence
            FROM ranked WHERE rn = 1
        """,
        "pack_seq": """
            WITH d AS (
              SELECT doc_id,
                     len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT
                       AS n_toks
              FROM documents
            )
            SELECT doc_id, n_toks,
                   (sum(n_toks) OVER (ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n_toks)::BIGINT AS start_tok,
                   ((sum(n_toks) OVER (ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n_toks) // 256)::BIGINT
                     AS seq_id
            FROM d
        """,
        # closed-form: the chain structure is u_i -> u_{i-1} broken at
        # multiples of 10, so the terminal and hop count are pure doc_id
        # arithmetic — no recursion, an independent derivation of the
        # pointer-doubling loop.
        "redirect_chains": """
            SELECT 'u' || doc_id AS src,
                   'u' || (doc_id - (doc_id % 10)) AS final_url,
                   (doc_id % 10)::INT AS hops
            FROM documents WHERE doc_id % 10 <> 0
            UNION ALL
            SELECT 'a' || doc_id,
                   'u' || (doc_id - (doc_id % 10)),
                   (1 + doc_id % 10)::INT
            FROM documents WHERE doc_id % 3 = 0
        """,
        # links re-derived arithmetically from doc_id (never parsed from
        # text): target_k = hub (i*{7,11})%97 / p (i*{13,17})%997, context =
        # 'kw'||lang, source host = source||'.example'.
        "anchor_profile": """
            WITH links AS (
              SELECT 'https://hub' || ((doc_id*7) % 97)
                       || '/p' || ((doc_id*13) % 997) AS target,
                     source || '.example' AS src_host,
                     'kw' || lang AS ctx
              FROM documents
              UNION ALL
              SELECT 'https://hub' || ((doc_id*11) % 97)
                       || '/p' || ((doc_id*17) % 997),
                     source || '.example', 'kw' || lang
              FROM documents
            ), totals AS (
              SELECT target, count(*) AS n_inlinks,
                     count(DISTINCT src_host) AS n_src_hosts
              FROM links GROUP BY target
            ), ctxn AS (
              SELECT target, ctx, count(*) AS n FROM links GROUP BY target, ctx
            ), top AS (
              SELECT target, ctx AS top_context FROM (
                SELECT target, ctx,
                       row_number() OVER (PARTITION BY target
                         ORDER BY n DESC, ctx ASC) AS rn
                FROM ctxn
              ) WHERE rn = 1
            )
            SELECT t.target, t.n_inlinks, t.n_src_hosts, top.top_context
            FROM totals t JOIN top USING (target)
        """,
        "phrase_search": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                       AS token,
                     generate_subscripts(
                       regexp_split_to_array(trim(lower(text)), '\\s+'), 1)
                       AS pos
              FROM documents
            ), a AS (SELECT doc_id, pos FROM toks WHERE token = 'hash'),
               b AS (SELECT doc_id, pos FROM toks WHERE token = 'join'),
               m AS (
              SELECT a.doc_id, a.pos FROM a
              JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            )
            SELECT doc_id, count(*) AS n_matches,
                   (min(pos) - 1)::INT AS first_pos
            FROM m GROUP BY doc_id
        """,
        # closed-form: node i (in a complete group of 12) is on a cycle iff
        # its in-group position is inside the ring, and the shortest cycle
        # through it is exactly the ring size 3+((i//12)%7) — the oracle
        # never walks an edge.
        "graph_cycles": """
            SELECT 'n' || doc_id AS node,
                   (3 + ((doc_id // 12) % 7))::INT AS min_cycle_len
            FROM documents
            WHERE doc_id % 12 < 3 + ((doc_id // 12) % 7)
              AND doc_id < (SELECT (count(*) // 12) * 12 FROM documents)
        """,
        # same rule table, independently evaluated: path derived from
        # doc_id (never parsed from the url), winner picked by a SQL
        # window ordered (prefix length desc, allow desc).
        "robots_filter": """
            WITH urls AS (
              SELECT 'https://' || source || '.example/p' || doc_id AS url,
                     source, '/p' || doc_id AS path
              FROM documents
            ), ks AS (
              SELECT DISTINCT source,
                     regexp_extract(source, '(\\d+)', 1)::BIGINT AS k
              FROM documents
            ), rules AS (
              SELECT source, '/p' || (k % 10) AS prefix, FALSE AS allow FROM ks
              UNION ALL
              SELECT source, '/p' || (k % 10) || '2', TRUE FROM ks
              UNION ALL
              SELECT source, '/', FALSE FROM ks WHERE k % 7 = 0
            ), m AS (
              SELECT u.url, r.prefix, r.allow,
                     row_number() OVER (PARTITION BY u.url
                       ORDER BY len(r.prefix) DESC, r.allow DESC) AS rn
              FROM urls u
              JOIN rules r ON u.source = r.source
                          AND starts_with(u.path, r.prefix)
            )
            SELECT u.url, coalesce(m.allow, TRUE) AS allowed,
                   m.prefix AS rule_prefix
            FROM urls u
            LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (url)
        """,
        "crawl_budget": """
            WITH wgt AS (
              SELECT source, count(*)::BIGINT AS n_pages
              FROM documents GROUP BY source
            ), tot AS (SELECT sum(n_pages) AS S FROM wgt),
            parts AS (
              SELECT source, n_pages,
                     (997 * n_pages) // S AS base,
                     (997 * n_pages) % S AS rem
              FROM wgt, tot
            ), kk AS (SELECT 997 - sum(base) AS K FROM parts),
            r AS (
              SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rn
              FROM parts
            )
            SELECT source, n_pages,
                   (base + CASE WHEN rn <= K THEN 1 ELSE 0 END)::BIGINT AS quota
            FROM r, kk
        """,
        "host_sim": """
            WITH toks AS (
              SELECT source, doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                       AS token,
                     generate_subscripts(
                       regexp_split_to_array(trim(lower(text)), '\\s+'), 1)
                       AS pos
              FROM documents
            ), raw AS (
              SELECT a.source AS key, a.token || ' ' || b.token AS item
              FROM toks a JOIN toks b
                ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            ), posts0 AS (SELECT DISTINCT key, item FROM raw),
            posts AS (
              SELECT * FROM posts0 WHERE item NOT IN (
                SELECT item FROM posts0 GROUP BY item HAVING count(*) > 15
              )
            ), sizes AS (SELECT key, count(*) AS size FROM posts GROUP BY key),
            shared AS (
              SELECT a.key AS key_a, b.key AS key_b, count(*) AS shared
              FROM posts a JOIN posts b
                ON a.item = b.item AND a.key < b.key
              GROUP BY 1, 2
            ), j AS (
              SELECT key_a, key_b, shared,
                     sa.size AS size_a, sb.size AS size_b,
                     floor(shared::DOUBLE
                           / (sa.size + sb.size - shared) * 10000 + 0.5)
                       / 10000 AS jaccard
              FROM shared
              JOIN sizes sa ON sa.key = key_a
              JOIN sizes sb ON sb.key = key_b
            )
            SELECT * FROM j WHERE jaccard >= 0.5
        """,
        "kg_transe": _transe_sql(dim=4, mod=1000),
        "kg_transe_filtered": _transe_sql(
            dim=4,
            mod=1000,
            tail_expr="(doc_id * 7 + (doc_id // 150)) % 50",
            filtered=True,
        ),
        "entity_prior": """
            WITH a AS (
              SELECT 'm' || (doc_id % 7) AS mention,
                     'e' || (doc_id % 3) AS entity_id
              FROM documents
            ), c AS (
              SELECT mention, entity_id, count(*)::BIGINT AS n_links
              FROM a GROUP BY mention, entity_id
            )
            SELECT mention, entity_id, n_links,
                   ((n_links * 1000000)
                    // sum(n_links) OVER (PARTITION BY mention))::BIGINT
                     AS prior_ppm
            FROM c
        """,
        "truth_find": _truth_sql(rounds=2),
        "kg_sweep_cut": _sweep_sql(rounds=4),
        "kg_rank_eval": f"""
            WITH ranked AS (
              {_transe_sql(dim=4, mod=1000,
                           tail_expr="(doc_id * 7 + (doc_id // 150)) % 50",
                           filtered=True)}
            )
            SELECT count(*)::BIGINT AS n,
                   (sum(1000000 // rank) // count(*))::BIGINT AS mrr_ppm,
                   (sum(CASE WHEN rank <= 1 THEN 1 ELSE 0 END) * 1000000
                    // count(*))::BIGINT AS hits1_ppm,
                   (sum(CASE WHEN rank <= 3 THEN 1 ELSE 0 END) * 1000000
                    // count(*))::BIGINT AS hits3_ppm,
                   (sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) * 1000000
                    // count(*))::BIGINT AS hits10_ppm
            FROM ranked
        """,
        "entity_disambig_ctx": r"""
            WITH toks AS MATERIALIZED (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS l
              FROM documents
            ), dtok AS MATERIALIZED (
              SELECT DISTINCT doc_id, t.token
              FROM toks, UNNEST(l) AS t(token)
            ), c AS (
              SELECT 'm' || (doc_id % 7) AS mention,
                     'e' || (doc_id % 3) AS entity_id,
                     count(*)::BIGINT AS n_links
              FROM documents GROUP BY 1, 2
            ), prior AS MATERIALIZED (
              SELECT mention, entity_id, n_links,
                     ((n_links * 1000000)
                      // sum(n_links) OVER (PARTITION BY mention))::BIGINT
                       AS prior_ppm
              FROM c
            ), prof AS MATERIALIZED (
              SELECT 'e' || (d.doc_id % 3) AS entity_id, dt.token,
                     count(*)::BIGINT AS weight
              FROM documents d JOIN dtok dt ON dt.doc_id = d.doc_id
              GROUP BY 1, 2
              HAVING count(*) BETWEEN 2 AND 6
            ), cand AS MATERIALIZED (
              SELECT p.mention, p.entity_id, p.prior_ppm, f.token, f.weight
              FROM prior p JOIN prof f USING (entity_id)
            ), occ_tok AS (
              SELECT d.doc_id::VARCHAR AS occ_id,
                     'm' || (d.doc_id % 7) AS mention, dt.token
              FROM documents d JOIN dtok dt ON dt.doc_id = d.doc_id
            ), scored AS MATERIALIZED (
              SELECT o.occ_id, o.mention, ca.entity_id, ca.prior_ppm,
                     sum(ca.weight)::BIGINT AS ctx_score
              FROM occ_tok o
              JOIN cand ca ON ca.mention = o.mention AND ca.token = o.token
              GROUP BY 1, 2, 3, 4
            ), picked AS (
              SELECT occ_id, entity_id, ctx_score, prior_ppm,
                     row_number() OVER (
                       PARTITION BY occ_id
                       ORDER BY ctx_score DESC, prior_ppm DESC, entity_id ASC
                     ) AS rk
              FROM scored
            ), fb AS (
              SELECT mention, entity_id, prior_ppm,
                     row_number() OVER (
                       PARTITION BY mention
                       ORDER BY prior_ppm DESC, n_links DESC, entity_id ASC
                     ) AS rk
              FROM prior
            )
            SELECT d.doc_id::VARCHAR AS occ_id,
                   'm' || (d.doc_id % 7) AS mention,
                   coalesce(p.entity_id, f.entity_id) AS entity_id,
                   coalesce(p.ctx_score, 0)::BIGINT AS ctx_score,
                   coalesce(p.prior_ppm, f.prior_ppm) AS prior_ppm
            FROM documents d
            LEFT JOIN picked p ON p.occ_id = d.doc_id::VARCHAR AND p.rk = 1
            LEFT JOIN fb f ON f.mention = 'm' || (d.doc_id % 7) AND f.rk = 1
        """,
        "entity_disambig": """
            WITH a AS (
              SELECT 'm' || (doc_id % 7) AS mention,
                     'e' || (doc_id % 3) AS entity_id
              FROM documents
            ), c AS (
              SELECT mention, entity_id, count(*)::BIGINT AS n_links
              FROM a GROUP BY mention, entity_id
            ), prior AS (
              SELECT mention, entity_id, n_links,
                     ((n_links * 1000000)
                      // sum(n_links) OVER (PARTITION BY mention))::BIGINT
                       AS prior_ppm
              FROM c
            ), top1 AS (
              SELECT mention, entity_id, prior_ppm,
                     row_number() OVER (
                       PARTITION BY mention
                       ORDER BY prior_ppm DESC, n_links DESC, entity_id ASC
                     ) AS rk
              FROM prior
            )
            SELECT d.doc_id, 'm' || (d.doc_id % 7) AS mention,
                   t.entity_id, t.prior_ppm
            FROM documents d
            LEFT JOIN top1 t
              ON t.mention = 'm' || (d.doc_id % 7) AND t.rk = 1
        """,
        # every node in the pre-retraction graph has >=1 edge, so the
        # orphan rule reduces to: kept nodes that still appear as an
        # endpoint of a kept edge.
        "kg_retract": """
            WITH keptdocs AS (
              SELECT * FROM documents
              WHERE NOT (doc_id % 9 = 0 OR lang = 'zh')
            ), kept_nodes AS (
              SELECT doc_id::VARCHAR || ':document' AS id,
                     'document' AS label
              FROM keptdocs
              UNION ALL
              SELECT DISTINCT lang || ':language', 'language' FROM documents
              WHERE lang <> 'zh'
              UNION ALL
              SELECT DISTINCT source || ':source', 'source' FROM documents
            ), kept_edges AS (
              SELECT doc_id::VARCHAR || ':document' AS src,
                     lang || ':language' AS dst,
                     'in_language' AS elabel
              FROM keptdocs
              UNION ALL
              SELECT doc_id::VARCHAR || ':document', source || ':source',
                     'from_source'
              FROM keptdocs
            )
            SELECT id, label, 'node' AS kind FROM kept_nodes
            WHERE id IN (SELECT src FROM kept_edges
                         UNION SELECT dst FROM kept_edges)
            UNION ALL
            SELECT src || '>' || dst, elabel, 'edge' FROM kept_edges
        """,
        # closed-form offsets: the synthesized page text is
        # docs.text || '. keywords: kw<lang>, ...', so the answer starts
        # at n_chars + 12 (". keywords: " is 12 chars) — never instr.
        "span_dataset": """
            SELECT doc_id, 'kw' || lang AS answer,
                   (n_chars + 12)::INT AS char_start,
                   (n_chars + 14 + len(lang))::INT AS char_end,
                   TRUE AS verified
            FROM documents
        """,
        "frontier_plan": f"""
            WITH cand AS (
              SELECT 'https://' || source || '.example/p' || doc_id AS url,
                     source || '.example' AS host,
                     {_SQL_MD5INT.format(x="'prio:' || doc_id")} AS prio
              FROM documents
            ), counts AS (SELECT host, count(*)::BIGINT AS n FROM cand GROUP BY host),
            tot AS (SELECT sum(n) AS S FROM counts),
            parts AS (
              SELECT host, n, (300 * n) // S AS base, (300 * n) % S AS rem
              FROM counts, tot
            ), kk AS (SELECT 300 - sum(base) AS K FROM parts),
            q AS (
              SELECT host,
                     base + CASE WHEN row_number() OVER
                       (ORDER BY rem DESC, host ASC) <= K THEN 1 ELSE 0 END
                       AS quota
              FROM parts, kk
            ), r AS (
              SELECT url, host,
                     row_number() OVER (PARTITION BY host
                       ORDER BY prio DESC, url ASC) AS fetch_slot
              FROM cand
            )
            SELECT r.url, r.host, fetch_slot::INT AS fetch_slot
            FROM r JOIN q USING (host) WHERE fetch_slot <= quota
        """,
        # the DIRECT per-lang KMV derivation (same as vocab_kmv): equality
        # with the merged per-(lang,source) rollup proves merge losslessness
        "kmv_merge": """
            WITH tok AS (
              SELECT lang, UNNEST(regexp_split_to_array(trim(lower(text)),
                     '\\s+')) AS token
              FROM documents
            ), hashed AS (
              SELECT DISTINCT lang,
                     (('0x' || substr(md5(token), 1, 15))::BIGINT) AS h
              FROM tok
            ), ranked AS (
              SELECT lang, h,
                     row_number() OVER (PARTITION BY lang ORDER BY h) AS r
              FROM hashed
            )
            SELECT lang, count(*) AS n_kept,
                   CASE WHEN count(*) < 16 THEN count(*)
                        ELSE CAST(floor(15 * 1152921504606846976.0
                               / max(h)::DOUBLE + 0.5) AS BIGINT)
                   END AS estimate
            FROM ranked WHERE r <= 16 GROUP BY lang
        """,
        # closed-form: expected visible text reassembled from raw columns
        # (title, h1 lang, decoded '&', body) — no tag or entity handling
        # anywhere in the oracle.
        "html_extract": """
            SELECT doc_id, upper(source) AS title,
                   upper(source) || ' ' || lang || ' x & ' || trim(text)
                     AS clean_text
            FROM documents
        """,
        "warc_parse": """
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 3 THEN NULL
                        WHEN doc_id % 3 = 0 THEN 200
                        WHEN doc_id % 3 = 1 THEN 301
                        ELSE 404 END AS http_status,
                   CASE WHEN doc_id % 4 = 3 THEN NULL
                        ELSE 'text/html; charset=utf-8' END AS content_type,
                   text AS body
            FROM documents
        """,
        # closed-form: generation number in an 8-chain is 7 - position;
        # the 0->4 shortcut must NOT shorten it (longest path, not min)
        "dag_levels": """
            SELECT 'n' || doc_id AS node, (7 - doc_id % 8)::INT AS level
            FROM documents
            WHERE doc_id < (SELECT (count(*) // 8) * 8 FROM documents)
        """,
        # every metric closed-form from documents + the known mapping:
        # one doc node per row, one in_language/from_source edge per doc,
        # n_chars always filled, per-doc out-degree exactly 1.
        "kg_profile": """
            SELECT 'node_label' AS section, 'document' AS name,
                   'count' AS metric, count(*)::BIGINT AS value FROM documents
            UNION ALL SELECT 'node_label', 'language', 'count',
                   count(DISTINCT lang) FROM documents
            UNION ALL SELECT 'node_label', 'source', 'count',
                   count(DISTINCT source) FROM documents
            UNION ALL SELECT 'prop_fill', 'document.n_chars', 'count',
                   count(*) FROM documents WHERE n_chars IS NOT NULL
            UNION ALL SELECT 'edge_label', 'in_language', 'count',
                   count(*) FROM documents
            UNION ALL SELECT 'edge_label', 'in_language', 'distinct_src',
                   count(*) FROM documents
            UNION ALL SELECT 'edge_label', 'in_language', 'distinct_dst',
                   count(DISTINCT lang) FROM documents
            UNION ALL SELECT 'edge_label', 'from_source', 'count',
                   count(*) FROM documents
            UNION ALL SELECT 'edge_label', 'from_source', 'distinct_src',
                   count(*) FROM documents
            UNION ALL SELECT 'edge_label', 'from_source', 'distinct_dst',
                   count(DISTINCT source) FROM documents
            UNION ALL SELECT 'degree', 'in_language', 'max_out', 1
            UNION ALL SELECT 'degree', 'from_source', 'max_out', 1
            UNION ALL SELECT 'degree', 'in_language', 'max_in',
                   (SELECT max(c) FROM (SELECT count(*) AS c FROM documents
                                        GROUP BY lang))
            UNION ALL SELECT 'degree', 'from_source', 'max_in',
                   (SELECT max(c) FROM (SELECT count(*) AS c FROM documents
                                        GROUP BY source))
        """,
        # the same path semantics unrolled as SQL joins with per-level
        # DISTINCT (pair semantics, like the implementation)
        "kg_rpq": """
            WITH c AS (
              SELECT DISTINCT 'd' || doc_id AS src,
                     'd' || ((doc_id * 13) % 250) AS dst
              FROM documents
            ), a AS (
              SELECT DISTINCT 'd' || doc_id AS src,
                     't' || (doc_id % 7) AS dst
              FROM documents
            ), c2 AS (
              SELECT DISTINCT x.src, y.dst FROM c x JOIN c y ON x.dst = y.src
            ), c3 AS (
              SELECT DISTINCT x.src, y.dst FROM c2 x JOIN c y ON x.dst = y.src
            )
            SELECT DISTINCT x.src, y.dst, 2 AS path_len, 'seq' AS mode
            FROM c x JOIN a y ON x.dst = y.src
            UNION ALL SELECT src, dst, 1, 'kleene' FROM c
            UNION ALL SELECT src, dst, 2, 'kleene' FROM c2
            UNION ALL SELECT src, dst, 3, 'kleene' FROM c3
        """,
        # closed-form per doc_id%4: which run covers ts=1 and its bounds
        "scd2_snapshot": """
            SELECT 'https://crawl.' || source || '.com/p/' || doc_id AS url,
                   CASE WHEN doc_id % 4 >= 2 THEN 'a' ELSE 'b' END AS value,
                   CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END::BIGINT
                     AS valid_from,
                   CASE WHEN doc_id % 4 = 2 THEN 2 ELSE NULL END::BIGINT
                     AS valid_to,
                   CASE WHEN doc_id % 4 IN (0, 3) THEN 3 ELSE 2 END::BIGINT
                     AS n_snapshots,
                   (doc_id % 4 <> 2) AS is_current
            FROM documents
        """,
        # every violation closed-form from doc_id arithmetic; the closure
        # is unrolled inline (scientist<=person<=agent, org<=agent,
        # city<=place). Range check skipped for ghost (untyped) dsts,
        # domain/range both vacuous for the unknown 'likes' label.
        "onto_validate": """
            WITH e AS (
              SELECT 'n' || doc_id AS src,
                     CASE WHEN doc_id % 17 = 0 THEN 'ghost' || doc_id
                          ELSE 'n' || ((doc_id * 7 + 2) % 250) END AS dst,
                     CASE WHEN doc_id % 10 = 0 THEN 'likes'
                          WHEN doc_id % 2 = 0 THEN 'works_at'
                          ELSE 'located_in' END AS label,
                     ['person','scientist','org','city','agent']
                       [doc_id % 5 + 1] AS src_type,
                     CASE WHEN doc_id % 17 = 0 THEN NULL
                          ELSE ['person','scientist','org','city','agent']
                               [((doc_id * 7 + 2) % 250) % 5 + 1]
                     END AS dst_type
              FROM documents
            )
            SELECT src, dst, label, src_type, dst_type,
                   'unknown_edge_label' AS violation
            FROM e WHERE label = 'likes'
            UNION ALL
            SELECT src, dst, label, src_type, dst_type, 'missing_dst_type'
            FROM e WHERE dst_type IS NULL
            UNION ALL
            SELECT src, dst, label, src_type, dst_type, 'domain'
            FROM e WHERE (label = 'works_at'
                          AND src_type NOT IN ('person', 'scientist'))
                      OR (label = 'located_in' AND src_type <> 'org')
            UNION ALL
            SELECT src, dst, label, src_type, dst_type, 'range'
            FROM e WHERE dst_type IS NOT NULL
                     AND ((label = 'works_at' AND dst_type <> 'org')
                       OR (label = 'located_in' AND dst_type <> 'city'))
        """,
        # exploded rows closed-form from doc_id arithmetic: index docs
        # (doc_id%10==0) yield one sitemapindex child, the rest two urlset
        # entries (full first entry, loc-only second)
        "sitemap_parse": """
            WITH d AS (
              SELECT doc_id,
                     'https://crawl.' || source || '.com' AS base,
                     lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') AS day
              FROM documents
            )
            SELECT base || '/sitemap.xml?d=' || doc_id AS url,
                   'sitemapindex' AS kind,
                   base || '/sitemap' || doc_id || '.xml' AS loc,
                   '2026-02-01' AS lastmod,
                   NULL::VARCHAR AS changefreq, NULL::VARCHAR AS priority
            FROM d WHERE doc_id % 10 = 0
            UNION ALL
            SELECT base || '/sitemap.xml?d=' || doc_id, 'urlset',
                   base || '/p/' || doc_id, '2026-01-' || day,
                   CASE WHEN doc_id % 3 = 0 THEN 'daily' END,
                   '0.' || (doc_id % 10)
            FROM d WHERE doc_id % 10 <> 0
            UNION ALL
            SELECT base || '/sitemap.xml?d=' || doc_id, 'urlset',
                   base || '/p/' || doc_id || 'x', NULL, NULL, NULL
            FROM d WHERE doc_id % 10 <> 0
        """,
        # independent derivation: recursive-CTE transitive closure over
        # the integer residue graph, mutual pairs, then the SAME
        # string-min labeling the implementation uses ('d'||v ordering)
        "kg_scc": """
            WITH RECURSIVE e AS MATERIALIZED (
              SELECT DISTINCT s, d FROM (
                SELECT doc_id % 250 AS s, (doc_id % 250 * 13 + 7) % 250 AS d
                FROM documents
                UNION ALL
                SELECT (doc_id % 250 * 13 + 7) % 250, doc_id % 250
                FROM documents WHERE doc_id % 250 % 50 = 0
              )
            ), reach(s, d) AS (
              SELECT s, d FROM e
              UNION
              SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s
            ), nodes AS (
              SELECT DISTINCT n FROM (
                SELECT s AS n FROM e UNION ALL SELECT d FROM e
              )
            ), mutual AS (
              SELECT a.s AS u, a.d AS v FROM reach a
              JOIN reach b ON a.s = b.d AND a.d = b.s
            )
            SELECT 'd' || n AS node,
                   coalesce(
                     least('d' || n,
                           (SELECT min('d' || v) FROM mutual WHERE u = n)),
                     'd' || n) AS scc_id
            FROM nodes
        """,
        # identical window hashing (md5-prefix 60-bit over the joined
        # 5-token slice, clamped prefix for short docs), >=2 distinct
        # docs per gram, lag-based island merge with gap > n
        # winnowing (MOSS): identical gram hash, min-of-struct window
        # selection with rightmost-tie (np = -pos), short-doc fallback
        # (pos = n), df cap, >= 2 shared fingerprints
        "dedup_winnow": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents
            ), grams AS (
              SELECT doc_id, i::INT AS pos,
                     ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')),
                                     1, 15))::BIGINT AS g
              FROM toks,
                   UNNEST(range(1, greatest(len(t) - 4, 1) + 1)) AS u(i)
            ), win AS (
              SELECT doc_id, pos,
                     min({'g': g, 'np': -pos}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel,
                     count(*) OVER (PARTITION BY doc_id) AS n
              FROM grams
            ), fps AS (
              SELECT DISTINCT doc_id, sel.g AS fp
              FROM win WHERE pos >= 4 OR pos = n
            ), cold AS (
              SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 64
            ), keep AS (
              SELECT f.doc_id, f.fp FROM fps f JOIN cold USING (fp)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   count(*) AS n_shared
            FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "dup_spans": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents
            ), wins AS (
              SELECT doc_id, i::INT AS pos,
                     ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')),
                                     1, 15))::BIGINT AS g
              FROM toks,
                   UNNEST(range(1, greatest(len(t) - 4, 1) + 1)) AS u(i)
            ), cross_g AS (
              SELECT g FROM wins GROUP BY g
              HAVING count(DISTINCT doc_id) >= 2
            ), hits AS (
              SELECT w.doc_id, w.pos FROM wins w JOIN cross_g USING (g)
            ), lagged AS (
              SELECT doc_id, pos,
                     lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              FROM hits
            ), isl AS (
              SELECT doc_id, pos,
                     sum(CASE WHEN prev IS NULL OR pos > prev + 5
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS island
              FROM lagged
            )
            SELECT doc_id, min(pos) AS span_start,
                   max(pos) + 4 AS span_end, count(*) AS n_hits
            FROM isl GROUP BY doc_id, island
        """,
        # byte-identical Kirsch-Mitzenmacher double hashing: the oracle
        # rebuilds the SAME m=131072-bit filter (md5-prefix h1, odd step
        # from h2, 32-bit words via bit_or) so even the deterministic
        # false positives match bit-for-bit
        "bloom_frontier": """
            WITH members AS (
              SELECT 'https://crawl.' || source || '.com/p/' || doc_id AS url
              FROM documents WHERE doc_id % 2 = 0
            ), cands AS (
              SELECT 'https://crawl.' || source || '.com/p/' || doc_id AS url,
                     (doc_id % 2 = 0) AS is_member
              FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT 'https://crawl.' || source || '.com/q/' || doc_id, FALSE
              FROM documents WHERE doc_id % 3 = 1
            ), mh AS (
              SELECT ('0x' || substr(md5(url), 1, 15))::BIGINT AS h1,
                     (('0x' || substr(md5('b:' || url), 1, 15))::BIGINT
                      % 131072) * 2 + 1 AS step
              FROM members
            ), mpos AS (
              SELECT (h1 + i * step) % 131072 AS pos
              FROM mh, UNNEST(range(0, 3)) AS u(i)
            ), bloom AS (
              SELECT (pos // 32)::INT AS word_idx,
                     bit_or(1::BIGINT << (pos % 32)::INT) AS word
              FROM mpos GROUP BY 1
            ), ch AS (
              SELECT url, is_member,
                     ('0x' || substr(md5(url), 1, 15))::BIGINT AS h1,
                     (('0x' || substr(md5('b:' || url), 1, 15))::BIGINT
                      % 131072) * 2 + 1 AS step
              FROM cands
            ), cpos AS (
              SELECT url, is_member, (h1 + i * step) % 131072 AS pos
              FROM ch, UNNEST(range(0, 3)) AS u(i)
            ), probed AS (
              SELECT c.url, c.is_member,
                     CASE WHEN b.word IS NOT NULL
                           AND (b.word & (1::BIGINT << (c.pos % 32)::INT)) <> 0
                          THEN 1 ELSE 0 END AS hit
              FROM cpos c
              LEFT JOIN bloom b ON (c.pos // 32)::INT = b.word_idx
            )
            SELECT url, sum(hit) = 3 AS bloom_hit, is_member
            FROM probed GROUP BY url, is_member
        """,
        # unrolled two-round propagation: per round, still-untyped nodes
        # take the majority type among DISTINCT typed neighbors, ties to
        # the smallest type string; seeds frozen at round 0
        "kg_typeinfer": """
            WITH e0 AS MATERIALIZED (
              SELECT DISTINCT 'd' || s AS a, 'd' || d AS b FROM (
                SELECT doc_id % 400 AS s, (doc_id % 400 * 7 + 3) % 400 AS d
                FROM documents
                UNION ALL
                SELECT doc_id % 400, (doc_id % 400 * 11 + 5) % 400
                FROM documents
              ) WHERE s <> d
            ), adj AS MATERIALIZED (
              SELECT a, b FROM e0 UNION SELECT b, a FROM e0
            ), t0 AS MATERIALIZED (
              SELECT DISTINCT 'd' || (doc_id % 400) AS node,
                     'T' || (doc_id % 400 % 5) AS type, 0 AS "round"
              FROM documents WHERE doc_id % 400 % 4 = 0
            ), v1 AS MATERIALIZED (
              SELECT adj.a AS node, t.type, count(*) AS c
              FROM adj JOIN t0 t ON adj.b = t.node
              WHERE adj.a NOT IN (SELECT node FROM t0)
              GROUP BY 1, 2
            ), n1 AS MATERIALIZED (
              SELECT node, type, 1 AS "round" FROM (
                SELECT node, type,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY c DESC, type) AS rn
                FROM v1) WHERE rn = 1
            ), t1 AS MATERIALIZED (
              SELECT * FROM t0 UNION ALL SELECT * FROM n1
            ), v2 AS MATERIALIZED (
              SELECT adj.a AS node, t.type, count(*) AS c
              FROM adj JOIN t1 t ON adj.b = t.node
              WHERE adj.a NOT IN (SELECT node FROM t1)
              GROUP BY 1, 2
            ), n2 AS MATERIALIZED (
              SELECT node, type, 2 AS "round" FROM (
                SELECT node, type,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY c DESC, type) AS rn
                FROM v2) WHERE rn = 1
            )
            SELECT node, type, "round" FROM t1
            UNION ALL SELECT node, type, "round" FROM n2
        """,
        # anti-join repair: endpoints exploded, reference-counted, and
        # checked against the (distinct) node-id projection
        "kg_dangling": """
            WITH nodes AS (
              SELECT DISTINCT 'd' || (doc_id % 500) AS id
              FROM documents WHERE doc_id % 500 % 10 <> 7
            ), edges AS (
              SELECT 'd' || (doc_id % 500) AS src,
                     CASE WHEN doc_id % 500 % 10 = 7
                          THEN 'm' || (doc_id % 500 % 37)
                          ELSE 'd' || (doc_id % 500 * 3 % 500) END AS dst
              FROM documents
            ), refs AS (
              SELECT id, count(*) AS n_refs FROM (
                SELECT src AS id FROM edges
                UNION ALL SELECT dst FROM edges)
              GROUP BY id
            )
            SELECT r.id, 'unresolved' AS label, r.n_refs
            FROM refs r LEFT JOIN nodes n ON r.id = n.id
            WHERE n.id IS NULL
        """,
        # identical placement arithmetic: out-degree > 50 marks hubs,
        # hub edges take (h(src)+h(dst)) % 16, the rest h(src) % 16;
        # HUGEINT sums cast back to BIGINT for dtype parity
        "edge_partition": """
            WITH e AS (
              SELECT CASE WHEN doc_id % 500 % 5 = 0 THEN 'hub0'
                          ELSE 'd' || (doc_id % 500) END AS src,
                     'd' || (((doc_id % 500) * 3 + 1) % 500) AS dst
              FROM documents
            ), deg AS (
              SELECT src, count(*) AS outdeg FROM e GROUP BY src
            ), h AS (
              SELECT e.src, e.dst, (d.outdeg > 50) AS is_hub,
                     ('0x' || substr(md5(e.src), 1, 15))::BIGINT AS hs,
                     ('0x' || substr(md5(e.dst), 1, 15))::BIGINT AS hd
              FROM e JOIN deg d USING (src)
            )
            SELECT (CASE WHEN is_hub THEN (hs + hd) % 16
                         ELSE hs % 16 END)::INT AS "partition",
                   count(*) AS n_edges,
                   (sum(CASE WHEN is_hub THEN 1 ELSE 0 END))::BIGINT AS n_hub_edges,
                   count(DISTINCT src) AS n_srcs
            FROM h GROUP BY 1
        """,
        # byte-identical regex on both engines (no lookarounds, RE2-safe);
        # group arrays zipped positionally and unnested
        "openie_triples": """
            WITH d AS (
              SELECT 'u' || doc_id AS url,
                     'Alice' || (doc_id % 400) || ' works at Org' ||
                     (doc_id % 7) || '. Carol' || (doc_id % 400) ||
                     ' works at Org' || ((doc_id + 3) % 7) || '. Org' ||
                     (doc_id % 7) || ' is based in City' ||
                     (doc_id % 13) || '.' AS text
              FROM documents
            ), pats AS (
              SELECT 'works_at' AS pred,
                     '([A-Z][a-zA-Z0-9]+) works at ([A-Z][a-zA-Z0-9]+)' AS rx
              UNION ALL
              SELECT 'based_in',
                     '([A-Z][a-zA-Z0-9]+) is based in ([A-Z][a-zA-Z0-9]+)'
            ), m AS (
              SELECT d.url, p.pred,
                     regexp_extract_all(d.text, p.rx, 1) AS s,
                     regexp_extract_all(d.text, p.rx, 2) AS o
              FROM d, pats p
            )
            SELECT url AS doc, s[i] AS subj, pred, o[i] AS obj
            FROM m, UNNEST(range(1, len(s) + 1)) AS u(i)
        """,
        # recursive closure over the undirected sameAs pairs, class =
        # string-min of {self} U reachable, then broadcast-remap + dedup
        "kg_sameas": """
            WITH RECURSIVE sa AS MATERIALIZED (
              SELECT DISTINCT 'd' || (doc_id % 500) AS a,
                     'd' || ((doc_id % 500 + 100) % 500) AS b
              FROM documents WHERE doc_id % 500 % 20 = 0
            ), und AS MATERIALIZED (
              SELECT a AS v, b AS w FROM sa UNION SELECT b, a FROM sa
            ), reach(v, w) AS (
              SELECT v, w FROM und
              UNION
              SELECT r.v, u.w FROM reach r JOIN und u ON r.w = u.v
            ), comp AS MATERIALIZED (
              SELECT v, least(v, min(w)) AS component FROM reach GROUP BY v
            ), mapping AS MATERIALIZED (
              SELECT v AS old_id, component AS new_id
              FROM comp WHERE v <> component
            ), e AS (
              SELECT 'd' || (doc_id % 500) AS src,
                     'd' || ((doc_id % 500 * 3 + 1) % 500) AS dst,
                     'rel' AS label
              FROM documents
            )
            SELECT DISTINCT coalesce(m1.new_id, e.src) AS src,
                            coalesce(m2.new_id, e.dst) AS dst, e.label
            FROM e LEFT JOIN mapping m1 ON e.src = m1.old_id
                   LEFT JOIN mapping m2 ON e.dst = m2.old_id
        """,
        # label-quotient rollup; HUGEINT-free (count/count-distinct are
        # BIGINT in both engines)
        "schema_graph": """
            WITH nodes AS (
              SELECT DISTINCT 'd' || (doc_id % 500) AS id,
                     'L' || (doc_id % 500 % 4) AS label
              FROM documents
            ), e AS (
              SELECT 'd' || (doc_id % 500) AS src,
                     'd' || ((doc_id % 500 * 3 + 1) % 500) AS dst,
                     'rel' || (doc_id % 500 % 3) AS label
              FROM documents
            )
            SELECT ns.label AS src_label, e.label AS edge_label,
                   nd.label AS dst_label,
                   count(*) AS n_edges,
                   count(DISTINCT e.src) AS n_srcs,
                   count(DISTINCT e.dst) AS n_dsts
            FROM e JOIN nodes ns ON e.src = ns.id
                   JOIN nodes nd ON e.dst = nd.id
            GROUP BY 1, 2, 3
        """,
        "kg_closeness": _closeness_sql(4),
        # token blocking mirror: same canonicalization, block purge at
        # df<=100, CBS pair weights, symmetric CNP top-3 with (count DESC,
        # id_a, id_b) tie-break
        "er_blocking": """
            WITH m AS (
              SELECT doc_id * 2 AS id, 'entity ' || (doc_id % 100) || ' corp' AS name
              FROM documents
              UNION ALL
              SELECT doc_id * 2 + 1 AS id,
                     CASE WHEN doc_id % 7 = 0
                          THEN 'entity ' || (doc_id % 100) || ' inc corp'
                          ELSE 'entity ' || (doc_id % 100) || ' corp' END
              FROM documents
            ), tok AS MATERIALIZED (
              SELECT DISTINCT id, t AS tok FROM (
                SELECT id, unnest(regexp_split_to_array(trim(regexp_replace(
                         regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g'),
                         '\\s+', ' ', 'g')), ' ')) AS t
                FROM m
              ) WHERE t <> ''
            ), small AS (
              SELECT tok FROM tok GROUP BY tok HAVING count(*) <= 100
            ), kept AS MATERIALIZED (
              SELECT tok.id, tok.tok FROM tok JOIN small USING (tok)
            ), pairs AS MATERIALIZED (
              SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS common_blocks
              FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
              GROUP BY a.id, b.id
            ), sym AS (
              SELECT id_a AS ep, id_a, id_b, common_blocks FROM pairs
              UNION ALL
              SELECT id_b AS ep, id_a, id_b, common_blocks FROM pairs
            ), ranked AS (
              SELECT id_a, id_b, common_blocks,
                     row_number() OVER (PARTITION BY ep
                       ORDER BY common_blocks DESC, id_a, id_b) AS rk
              FROM sym
            )
            SELECT DISTINCT id_a, id_b, common_blocks FROM ranked WHERE rk <= 3
        """,
        # from-scratch recursive closure over the FULL pair union with the
        # same least labeling merge_components produces incrementally
        "cc_incremental": """
            WITH RECURSIVE p AS MATERIALIZED (
              SELECT DISTINCT 'v' || (doc_id % 500) AS a,
                     'v' || ((doc_id % 500 * 7 + 3) % 500) AS b
              FROM documents WHERE doc_id % 2 = 0
              UNION
              SELECT DISTINCT 'v' || (doc_id % 500) AS a,
                     'v' || ((doc_id % 500 * 13 + 5) % 500) AS b
              FROM documents WHERE doc_id % 2 = 1
            ), und AS MATERIALIZED (
              SELECT a AS v, b AS w FROM p UNION SELECT b, a FROM p
            ), reach(v, w) AS (
              SELECT v, w FROM und
              UNION
              SELECT r.v, u.w FROM reach r JOIN und u ON r.w = u.v
            )
            SELECT v AS vertex, least(v, min(w)) AS component
            FROM reach GROUP BY v
        """,
        "kg_louvain": _louvain_sql(2),
        "kg_metapath": """
            WITH nodes AS MATERIALIZED (
              SELECT DISTINCT 'd' || (doc_id % 500) AS id,
                     'L' || (doc_id % 500 % 4) AS label
              FROM documents
            ), e AS MATERIALIZED (
              SELECT DISTINCT 'd' || (doc_id % 500) AS src,
                     'd' || ((doc_id % 500 * 3 + 1) % 500) AS dst,
                     'rel' || (doc_id % 500 % 3) AS label
              FROM documents
            ), two AS (
              SELECT e1.src AS s, e1.label AS edge1, e1.dst AS m,
                     e2.label AS edge2, e2.dst AS t
              FROM e e1 JOIN e e2 ON e1.dst = e2.src
            )
            SELECT ns.label AS src_label, two.edge1, nm.label AS mid_label,
                   two.edge2, nd.label AS dst_label,
                   count(*) AS n_paths,
                   count(DISTINCT two.s) AS n_src,
                   count(DISTINCT two.t) AS n_dst
            FROM two JOIN nodes ns ON two.s = ns.id
                     JOIN nodes nm ON two.m = nm.id
                     JOIN nodes nd ON two.t = nd.id
            GROUP BY 1, 2, 3, 4, 5
        """,
        "kg_pagerank_w": _pagerank_w_sql(3),
        "kg_n2v_walks": _n2v_sql(3, 4, 2, 1, 0),
        "kg_betweenness": _betweenness_sql(3),
        # the er_pairs formulation filtered to distance<=1, closed
        # transitively (recursive CTE), least-labeled, mapped back over
        # every mention
        "er_resolve": """
            WITH RECURSIVE ents AS MATERIALIZED (
              SELECT doc_id * 2 AS entity_id,
                     'entity ' || (doc_id % 500)::VARCHAR || ' corp' AS cn
              FROM documents
              UNION ALL
              SELECT doc_id * 2 + 1,
                     CASE WHEN doc_id % 3 = 0
                          THEN replace('entity ' || (doc_id % 500)::VARCHAR
                                       || ' corp', 'corp', 'crop')
                          ELSE 'entity ' || (doc_id % 500)::VARCHAR || ' corp'
                     END
              FROM documents
            ), ranked AS (
              SELECT entity_id, cn,
                     row_number() OVER (ORDER BY cn, entity_id) - 1 AS rk
              FROM ents
            ), matches AS MATERIALIZED (
              SELECT l.entity_id AS a, r.entity_id AS b
              FROM ranked l JOIN ranked r
                ON r.rk > l.rk AND r.rk - l.rk <= 3
              WHERE levenshtein(l.cn, r.cn) <= 1
            ), und AS MATERIALIZED (
              SELECT a AS v, b AS w FROM matches
              UNION SELECT b, a FROM matches
            ), reach(v, w) AS (
              SELECT v, w FROM und
              UNION
              SELECT r.v, u.w FROM reach r JOIN und u ON r.w = u.v
            ), comp AS MATERIALIZED (
              SELECT v, least(v, min(w)) AS component FROM reach GROUP BY v
            )
            SELECT e.entity_id,
                   coalesce(c.component, e.entity_id) AS canonical
            FROM ents e LEFT JOIN comp c ON e.entity_id = c.v
        """,
        "kg_densest": """
            WITH raw AS (
              SELECT 'c' || (doc_id % 997)::VARCHAR AS x,
                     'b' || (doc_id % 40)::VARCHAR AS y FROM documents
              UNION ALL
              SELECT 'b' || (doc_id % 40)::VARCHAR,
                     'a' || (doc_id % 7)::VARCHAR FROM documents
              UNION ALL
              SELECT 'a' || (doc_id % 7)::VARCHAR,
                     'a' || ((doc_id // 7) % 7)::VARCHAR FROM documents
            ), e0 AS MATERIALIZED (
              SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
              FROM raw WHERE x <> y
            ), deg0 AS MATERIALIZED (
              SELECT node, count(*)::BIGINT AS deg FROM (
                SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
              ) GROUP BY node
            ), st0 AS (
              SELECT count(*)::BIGINT AS nv, (sum(deg) // 2)::BIGINT AS ne
              FROM deg0
            ), bad0 AS MATERIALIZED (
              SELECT node FROM deg0, st0
              WHERE deg * nv * 100 <= 2 * ne * 110
            ), e1 AS MATERIALIZED (
              SELECT u, v FROM e0
              WHERE u NOT IN (SELECT node FROM bad0)
                AND v NOT IN (SELECT node FROM bad0)
            ), deg1 AS MATERIALIZED (
              SELECT node, count(*)::BIGINT AS deg FROM (
                SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1
              ) GROUP BY node
            ), st1 AS (
              SELECT count(*)::BIGINT AS nv, (sum(deg) // 2)::BIGINT AS ne
              FROM deg1
            ), bad1 AS MATERIALIZED (
              SELECT node FROM deg1, st1
              WHERE deg * nv * 100 <= 2 * ne * 110
            )
            SELECT u, v FROM e1
            WHERE u NOT IN (SELECT node FROM bad1)
              AND v NOT IN (SELECT node FROM bad1)
        """,
        # exact 2-hop reachability + the same KMV estimator; Spark's
        # iterated sketch merge must equal min-k over the exact set
        "kg_anf": """
            WITH raw AS (
      SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id::BIGINT * 7919 + 13) %
                     (SELECT count(*) FROM documents))::VARCHAR AS dst
      FROM documents
      UNION ALL
      SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id::BIGINT * 104729 + 101) %
                     (SELECT count(*) FROM documents))::VARCHAR AS dst
      FROM documents
      UNION ALL
      SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id::BIGINT * 1299709 + 977) %
                     (SELECT count(*) FROM documents))::VARCHAR AS dst
      FROM documents
            ), e AS MATERIALIZED (
              SELECT DISTINCT s, d FROM (
                SELECT src AS s, dst AS d FROM raw
                UNION ALL SELECT dst, src FROM raw
              ) WHERE s <> d
            ), r0 AS (
              SELECT node, node AS reached FROM (
                SELECT s AS node FROM e UNION SELECT d FROM e
              )
            ), r1 AS MATERIALIZED (
              SELECT DISTINCT node, reached FROM (
                SELECT node, reached FROM r0
                UNION ALL
                SELECT r.node, e.d AS reached
                FROM r0 r JOIN e ON r.reached = e.s
              )
            ), r2 AS MATERIALIZED (
              SELECT DISTINCT node, reached FROM (
                SELECT node, reached FROM r1
                UNION ALL
                SELECT r.node, e.d AS reached
                FROM r1 r JOIN e ON r.reached = e.s
              )
            ), hashed AS (
              SELECT node, (('0x' || substr(md5(reached), 1, 15))::BIGINT) AS h FROM r2
            ), ranked AS (
              SELECT node, h,
                     row_number() OVER (PARTITION BY node ORDER BY h) AS rk
              FROM hashed
            ), topk AS (
              SELECT node, count(*)::BIGINT AS n_kept, max(h) AS kth
              FROM ranked WHERE rk <= 8 GROUP BY node
            )
            SELECT node, n_kept,
                   CASE WHEN n_kept < 8 THEN n_kept
                        ELSE floor(7.0 * 1152921504606846976.0
                                   / kth::DOUBLE + 0.5)::BIGINT
                   END AS estimate
            FROM topk
        """,
        # two unrolled k=4 truss peel rounds over the hub graph:
        # support_i = per-edge triangle count over e_{i-1}, filter >= 2
        "kg_ktruss": """
            WITH e0 AS MATERIALIZED (
              -- canonicalize on the STRING ids (Spark's least/greatest
              -- compares the prefixed strings: 'hub10' < 'hub9')
              SELECT DISTINCT least('hub' || ((doc_id*7)%61)::VARCHAR,
                                    'hub' || ((doc_id*11)%53)::VARCHAR) AS u,
                              greatest('hub' || ((doc_id*7)%61)::VARCHAR,
                                       'hub' || ((doc_id*11)%53)::VARCHAR) AS v
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), tri1 AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e0 e1
              JOIN e0 e2 ON e2.u = e1.v
              JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
            ), sup1 AS MATERIALIZED (
              SELECT u, v, count(*)::BIGINT AS support FROM (
                SELECT a AS u, b AS v FROM tri1
                UNION ALL SELECT a, c FROM tri1
                UNION ALL SELECT b, c FROM tri1
              ) GROUP BY u, v
            ), e1 AS MATERIALIZED (
              SELECT u, v FROM sup1 WHERE support >= 2
            ), tri2 AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e1
              JOIN e1 e2 ON e2.u = e1.v
              JOIN e1 e3 ON e3.u = e1.u AND e3.v = e2.v
            ), sup2 AS (
              SELECT u, v, count(*)::BIGINT AS support FROM (
                SELECT a AS u, b AS v FROM tri2
                UNION ALL SELECT a, c FROM tri2
                UNION ALL SELECT b, c FROM tri2
              ) GROUP BY u, v
            )
            SELECT u, v, support FROM sup2 WHERE support >= 2
        """,
        # 4-clique census: canonical a<b<c<d quads on the int hub graph
        "kg_4cliques": """
            WITH e AS MATERIALIZED (
              SELECT DISTINCT least((doc_id*7)%61, (doc_id*11)%53) AS u,
                              greatest((doc_id*7)%61, (doc_id*11)%53) AS v
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1
              JOIN e e2 ON e2.u = e1.v
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            ), k4 AS MATERIALIZED (
              SELECT t.a, t.b, t.c, x.v AS d
              FROM tri t
              JOIN e x ON x.u = t.c
              WHERE EXISTS (SELECT 1 FROM e ad WHERE ad.u = t.a AND ad.v = x.v)
                AND EXISTS (SELECT 1 FROM e bd WHERE bd.u = t.b AND bd.v = x.v)
            )
            SELECT node, count(*)::BIGINT AS cliques4
            FROM (
              SELECT a AS node FROM k4
              UNION ALL SELECT b FROM k4
              UNION ALL SELECT c FROM k4
              UNION ALL SELECT d FROM k4
            ) GROUP BY node
        """,
        # registrable domain: PSL longest-match vs the same vendored list
        "domain_extract": _psl_sql(),
        # bootstrap percolation: 3 unrolled synchronous threshold-2
        # rounds over the symmetric hub graph, hub%13 seeds at round 0
        "kg_percolation": """
            WITH raw AS (
              SELECT 'hub' || ((doc_id*7)%61)::VARCHAR AS a,
                     'hub' || ((doc_id*11)%53)::VARCHAR AS b
              FROM documents
            ), und AS (
              SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM raw WHERE a <> b
            ), e AS MATERIALIZED (
              SELECT u, v FROM und UNION ALL SELECT v, u FROM und
            ), a0 AS MATERIALIZED (
              SELECT DISTINCT 'hub' || ((doc_id*7)%61)::VARCHAR AS node,
                     0::BIGINT AS round
              FROM documents WHERE ((doc_id*7)%61) % 13 = 0
            ), n1 AS MATERIALIZED (
              SELECT v AS node, 1::BIGINT AS round FROM (
                SELECT e.v, count(*) AS c
                FROM e JOIN a0 a ON a.node = e.u GROUP BY e.v
              ) WHERE c >= 2 AND v NOT IN (SELECT node FROM a0)
            ), a1 AS MATERIALIZED (
              SELECT * FROM a0 UNION ALL SELECT * FROM n1
            ), n2 AS MATERIALIZED (
              SELECT v AS node, 2::BIGINT AS round FROM (
                SELECT e.v, count(*) AS c
                FROM e JOIN a1 a ON a.node = e.u GROUP BY e.v
              ) WHERE c >= 2 AND v NOT IN (SELECT node FROM a1)
            ), a2 AS MATERIALIZED (
              SELECT * FROM a1 UNION ALL SELECT * FROM n2
            ), n3 AS MATERIALIZED (
              SELECT v AS node, 3::BIGINT AS round FROM (
                SELECT e.v, count(*) AS c
                FROM e JOIN a2 a ON a.node = e.u GROUP BY e.v
              ) WHERE c >= 2 AND v NOT IN (SELECT node FROM a2)
            )
            SELECT * FROM a2 UNION ALL SELECT * FROM n3
        """,
        # SALSA: 2 unrolled alternating degree-normalized walk rounds,
        # exact integer DIVs, zero-degree nodes pinned to 0
        "kg_salsa": """
            WITH raw AS (
              SELECT 'hub' || ((doc_id*7)%61)::VARCHAR AS s,
                     'hub' || ((doc_id*11)%53)::VARCHAR AS d
              FROM documents
            ), e AS MATERIALIZED (
              SELECT DISTINCT s, d FROM raw
            ), outd AS MATERIALIZED (
              SELECT s, count(*)::BIGINT AS od FROM e GROUP BY s
            ), ind AS MATERIALIZED (
              SELECT d, count(*)::BIGINT AS indeg FROM e GROUP BY d
            ), nodes AS MATERIALIZED (
              SELECT s AS node FROM e UNION SELECT d FROM e
            ), h0 AS (
              SELECT node, 1000000::BIGINT AS h FROM nodes
            ), a1 AS MATERIALIZED (
              SELECT n.node, coalesce(t.a, 0)::BIGINT AS a
              FROM nodes n LEFT JOIN (
                SELECT e.d AS node, sum(h.h // o.od)::BIGINT AS a
                FROM e JOIN outd o ON o.s = e.s JOIN h0 h ON h.node = e.s
                GROUP BY e.d
              ) t USING (node)
            ), h1 AS MATERIALIZED (
              SELECT n.node, coalesce(t.h, 0)::BIGINT AS h
              FROM nodes n LEFT JOIN (
                SELECT e.s AS node, sum(a.a // i.indeg)::BIGINT AS h
                FROM e JOIN ind i ON i.d = e.d JOIN a1 a ON a.node = e.d
                GROUP BY e.s
              ) t USING (node)
            ), a2 AS MATERIALIZED (
              SELECT n.node, coalesce(t.a, 0)::BIGINT AS a
              FROM nodes n LEFT JOIN (
                SELECT e.d AS node, sum(h.h // o.od)::BIGINT AS a
                FROM e JOIN outd o ON o.s = e.s JOIN h1 h ON h.node = e.s
                GROUP BY e.d
              ) t USING (node)
            ), h2 AS (
              SELECT n.node, coalesce(t.h, 0)::BIGINT AS h
              FROM nodes n LEFT JOIN (
                SELECT e.s AS node, sum(a.a // i.indeg)::BIGINT AS h
                FROM e JOIN ind i ON i.d = e.d JOIN a2 a ON a.node = e.d
                GROUP BY e.s
              ) t USING (node)
            )
            SELECT a2.node, a2.a AS authority, h2.h AS hub
            FROM a2 JOIN h2 USING (node)
        """,
        # forward-push PPR: 4 unrolled synchronous push rounds, exact
        # integer absorb/split, FULL OUTER est/res merges
        "kg_ppr_push": _ppr_push_sql(rounds=4),
        # eigenvector centrality: 3 unrolled integer power rounds with
        # overflow-safe renormalization (iv // greatest(mx // scale, 1))
        "kg_eigen": """
            WITH edges AS (
              SELECT doc_id::VARCHAR || ':document' AS src,
                     lang || ':language' AS dst
              FROM documents
              UNION ALL
              SELECT doc_id::VARCHAR || ':document', source || ':source'
              FROM documents
            ), e AS MATERIALIZED (
              SELECT DISTINCT src AS s, dst AS d FROM edges
            ), nodes AS MATERIALIZED (
              SELECT s AS node FROM e UNION SELECT d FROM e
            ), v0 AS (
              SELECT node, 1000000::BIGINT AS v FROM nodes
            ), iv1 AS (
              SELECT e.d AS node, sum(v.v)::BIGINT AS iv
              FROM e JOIN v0 v ON v.node = e.s GROUP BY e.d
            ), nv1 AS MATERIALIZED (
              SELECT n.node, coalesce(i.iv, 0)::BIGINT AS iv
              FROM nodes n LEFT JOIN iv1 i USING (node)
            ), v1 AS MATERIALIZED (
              SELECT node, (iv // greatest((SELECT max(iv) FROM nv1) // 1000000,
                                           1))::BIGINT AS v
              FROM nv1
            ), iv2 AS (
              SELECT e.d AS node, sum(v.v)::BIGINT AS iv
              FROM e JOIN v1 v ON v.node = e.s GROUP BY e.d
            ), nv2 AS MATERIALIZED (
              SELECT n.node, coalesce(i.iv, 0)::BIGINT AS iv
              FROM nodes n LEFT JOIN iv2 i USING (node)
            ), v2 AS MATERIALIZED (
              SELECT node, (iv // greatest((SELECT max(iv) FROM nv2) // 1000000,
                                           1))::BIGINT AS v
              FROM nv2
            ), iv3 AS (
              SELECT e.d AS node, sum(v.v)::BIGINT AS iv
              FROM e JOIN v2 v ON v.node = e.s GROUP BY e.d
            ), nv3 AS MATERIALIZED (
              SELECT n.node, coalesce(i.iv, 0)::BIGINT AS iv
              FROM nodes n LEFT JOIN iv3 i USING (node)
            )
            SELECT node, (iv // greatest((SELECT max(iv) FROM nv3) // 1000000,
                                         1))::BIGINT AS score
            FROM nv3
        """,
        # chi2 keyness: identical contingency + fixed-order double chain
        "keyness": r"""
            WITH toks AS (
              SELECT g, t AS term FROM (
                SELECT lang AS g,
                       unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
                FROM documents
              ) WHERE length(t) >= 3
            ), gt AS MATERIALIZED (
              SELECT g, term, count(*)::BIGINT AS a FROM toks GROUP BY g, term
            ), tt AS (
              SELECT term, sum(a)::BIGINT AS t_tot FROM gt GROUP BY term
            ), gtot AS (
              SELECT g, sum(a)::BIGINT AS g_tot FROM gt GROUP BY g
            ), ntot AS (
              SELECT sum(a)::BIGINT AS n FROM gt
            ), cells AS (
              SELECT gt.g, gt.term, gt.a,
                     tt.t_tot - gt.a AS b,
                     gtot.g_tot - gt.a AS c,
                     ntot.n - tt.t_tot - gtot.g_tot + gt.a AS d,
                     ntot.n AS n
              FROM gt JOIN tt USING (term) JOIN gtot USING (g) CROSS JOIN ntot
              WHERE gt.a >= 5
            ), sc AS (
              SELECT g, term, a AS cnt_in, b AS cnt_out,
                     floor(n::DOUBLE * (a*d - b*c)::DOUBLE * (a*d - b*c)::DOUBLE
                           / (a+b)::DOUBLE / (c+d)::DOUBLE
                           / (a+c)::DOUBLE / (b+d)::DOUBLE
                           * 10000.0 + 0.5) / 10000.0 AS chi2
              FROM cells WHERE a*d - b*c > 0
            )
            SELECT g AS lang, term, cnt_in, cnt_out, chi2,
                   (row_number() OVER (
                      PARTITION BY g ORDER BY chi2 DESC, term ASC
                   ))::BIGINT AS rank
            FROM sc QUALIFY rank <= 10
        """,
        # Allen classification: same (s,e,id)-lexicographic pair canon +
        # exact epoch-micros CASE ladder as sessions.allen_relations
        "allen_audit": """
            WITH iv AS MATERIALIZED (
              SELECT user_id AS entity, epoch_us(ts) AS s,
                     epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e,
                     event_id AS rid
              FROM events WHERE event_id % 20 = 0
            )
            SELECT a.entity, a.rid AS a, b.rid AS b,
                   CASE
                     WHEN a.s = b.s AND a.e = b.e THEN 'equals'
                     WHEN a.s = b.s THEN 'starts'
                     WHEN a.e < b.s THEN 'before'
                     WHEN a.e = b.s THEN 'meets'
                     WHEN a.e < b.e THEN 'overlaps'
                     WHEN a.e = b.e THEN 'finished_by'
                     ELSE 'contains'
                   END AS relation
            FROM iv a JOIN iv b
              ON a.entity = b.entity
             AND (a.s < b.s OR (a.s = b.s AND a.e < b.e)
                  OR (a.s = b.s AND a.e = b.e AND a.rid < b.rid))
        """,
        # rich-club profile: degree histogram grid, suffix-cumulative
        # node/edge survivor counts, exact ppm DIV — mirrors
        # graphstats.rich_club on the (7,61)x(11,53) hub graph
        "kg_rich_club": """
            WITH e AS MATERIALIZED (
              SELECT DISTINCT least((doc_id*7)%61, (doc_id*11)%53) AS u,
                              greatest((doc_id*7)%61, (doc_id*11)%53) AS v
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), deg AS MATERIALIZED (
              SELECT node, count(*)::BIGINT AS d FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e
              ) GROUP BY node
            ), grid AS (
              SELECT d AS k, count(*)::BIGINT AS n_at FROM deg GROUP BY d
            ), nk AS (
              SELECT k, coalesce(sum(n_at) OVER (
                ORDER BY k DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), 0)::BIGINT AS n_nodes FROM grid
            ), emin AS (
              SELECT least(du.d, dv.d) AS md, count(*)::BIGINT AS e_at
              FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
              GROUP BY 1
            ), eg AS (
              SELECT g.k, coalesce(m.e_at, 0)::BIGINT AS e_at
              FROM grid g LEFT JOIN emin m ON m.md = g.k
            ), ec AS (
              SELECT k, coalesce(sum(e_at) OVER (
                ORDER BY k DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), 0)::BIGINT AS n_edges FROM eg
            )
            SELECT n.k, n.n_nodes, c.n_edges,
                   (2 * c.n_edges * 1000000 // (n.n_nodes * (n.n_nodes - 1)))::BIGINT AS phi
            FROM nk n JOIN ec c USING (k)
            WHERE n.n_nodes >= 2
        """,
        # full truss decomposition: est0 = support, two h-index rounds
        # (strength = least est of the other two triangle sides, h via a
        # per-edge desc-cumulative window) — mirrors truss_numbers
        # exact_rounds=2 on the (5,59)x(13,47) hub graph
        "kg_trussness": """
            WITH e0 AS MATERIALIZED (
              SELECT DISTINCT least('hub' || ((doc_id*5)%59)::VARCHAR,
                                    'hub' || ((doc_id*13)%47)::VARCHAR) AS u,
                              greatest('hub' || ((doc_id*5)%59)::VARCHAR,
                                       'hub' || ((doc_id*13)%47)::VARCHAR) AS v
              FROM documents WHERE (doc_id*5)%59 <> (doc_id*13)%47
            ), tri AS MATERIALIZED (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e0 e1
              JOIN e0 e2 ON e2.u = e1.v
              JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
            ), inc AS MATERIALIZED (
              SELECT a AS eu, b AS ev, a AS f1u, c AS f1v, b AS f2u, c AS f2v FROM tri
              UNION ALL
              SELECT a, c, a, b, b, c FROM tri
              UNION ALL
              SELECT b, c, a, b, a, c FROM tri
            ), est0 AS MATERIALIZED (
              SELECT e0.u, e0.v, coalesce(s.c, 0)::BIGINT AS est
              FROM e0 LEFT JOIN (
                SELECT eu AS u, ev AS v, count(*) AS c FROM inc GROUP BY eu, ev
              ) s USING (u, v)
            ), str1 AS (
              SELECT i.eu, i.ev, least(x.est, y.est) AS m
              FROM inc i
              JOIN est0 x ON x.u = i.f1u AND x.v = i.f1v
              JOIN est0 y ON y.u = i.f2u AND y.v = i.f2v
            ), h1 AS (
              SELECT eu, ev, max(least(m, cum)) AS h FROM (
                SELECT eu, ev, m,
                       sum(c) OVER (PARTITION BY eu, ev ORDER BY m DESC
                                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM (SELECT eu, ev, m, count(*) AS c FROM str1 GROUP BY eu, ev, m)
              ) GROUP BY eu, ev
            ), est1 AS MATERIALIZED (
              SELECT e.u, e.v, least(e.est, coalesce(h.h, 0)) AS est
              FROM est0 e LEFT JOIN h1 h ON h.eu = e.u AND h.ev = e.v
            ), str2 AS (
              SELECT i.eu, i.ev, least(x.est, y.est) AS m
              FROM inc i
              JOIN est1 x ON x.u = i.f1u AND x.v = i.f1v
              JOIN est1 y ON y.u = i.f2u AND y.v = i.f2v
            ), h2 AS (
              SELECT eu, ev, max(least(m, cum)) AS h FROM (
                SELECT eu, ev, m,
                       sum(c) OVER (PARTITION BY eu, ev ORDER BY m DESC
                                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM (SELECT eu, ev, m, count(*) AS c FROM str2 GROUP BY eu, ev, m)
              ) GROUP BY eu, ev
            ), est2 AS (
              SELECT e.u, e.v, least(e.est, coalesce(h.h, 0)) AS est
              FROM est1 e LEFT JOIN h2 h ON h.eu = e.u AND h.ev = e.v
            )
            SELECT u, v, (est + 2)::BIGINT AS trussness FROM est2
        """,
        # same hub graph + triangle CTE as kg_triangles; clustering =
        # scaled-integer 2T*1e6 // d(d-1), degree-1 nodes -> 0
        "kg_clustering": """
            WITH e AS MATERIALIZED (
              SELECT DISTINCT least((doc_id*7)%61, (doc_id*11)%53) AS u,
                              greatest((doc_id*7)%61, (doc_id*11)%53) AS v
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), deg AS (
              SELECT node, count(*)::BIGINT AS degree FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e
              ) GROUP BY node
            ), tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1
              JOIN e e2 ON e2.u = e1.v
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            ), tcnt AS (
              SELECT node, count(*)::BIGINT AS triangles FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
              ) GROUP BY node
            )
            SELECT 'hub' || d.node::VARCHAR AS node, d.degree,
                   coalesce(t.triangles, 0)::BIGINT AS triangles,
                   CASE WHEN d.degree > 1
                        THEN 2 * coalesce(t.triangles, 0) * 1000000
                             // (d.degree * (d.degree - 1))
                        ELSE 0 END::BIGINT AS clustering
            FROM deg d LEFT JOIN tcnt t ON d.node = t.node
        """,
        # Newman r over the same graph: exact integer S1/S2/S3, one FP
        # division, floor(x*1e4+0.5)/1e4 rounding (round_ieee parity)
        "kg_assortativity": """
            WITH e AS MATERIALIZED (
              SELECT DISTINCT least((doc_id*7)%61, (doc_id*11)%53) AS u,
                              greatest((doc_id*7)%61, (doc_id*11)%53) AS v
              FROM documents WHERE (doc_id*7)%61 <> (doc_id*11)%53
            ), deg AS (
              SELECT node, count(*)::BIGINT AS d FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e
              ) GROUP BY node
            ), ann AS (
              SELECT du.d AS ju, dv.d AS jv
              FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
            ), s AS (
              SELECT count(*)::BIGINT AS m,
                     sum(ju * jv)::BIGINT AS sum_prod,
                     sum(ju + jv)::BIGINT AS sum_sum,
                     sum(ju * ju + jv * jv)::BIGINT AS sum_sq
              FROM ann
            )
            SELECT m, sum_prod, sum_sum, sum_sq,
                   CASE WHEN (2*m*sum_sq - sum_sum*sum_sum) <> 0 THEN
                     floor((4*m*sum_prod - sum_sum*sum_sum)::DOUBLE
                           / (2*m*sum_sq - sum_sum*sum_sum)::DOUBLE
                           * 10000 + 0.5) / 10000
                   ELSE 0.0 END AS assortativity
            FROM s
        """,
        "kg_mis": _mis_sql(14, 0),
        "kg_coloring": _coloring_sql(24, 0),
        "kg_coloring_blocked": _coloring_sql(
            12,
            0,
            raw_body="""SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id - doc_id % 16) + ((doc_id % 16) * 3 + 1) % 16)::VARCHAR AS dst
      FROM documents, nn WHERE doc_id < nn.nb
      UNION ALL
      SELECT 'n' || doc_id::VARCHAR,
             'n' || ((doc_id - doc_id % 16) + ((doc_id % 16) * 7 + 2) % 16)::VARCHAR
      FROM documents, nn WHERE doc_id < nn.nb""",
            pre="nn AS (SELECT (count(*) // 16) * 16 AS nb FROM documents),\n    ",
        ),
        "kg_msf": _msf_sql(4, 4),
        # independent formulation: (u,v) is a bridge iff v is unreachable
        # from u in the graph minus that one edge — recursive reachability
        # over (excluded_edge, node) states, block-bounded so the state
        # space stays |E_blk| x |V_blk| per block
        # non-bridge edges (EXISTS the bridge-test reachability) + a
        # recursive min-label closure = 2-edge-connected components
        "kg_2ecc": """
    WITH RECURSIVE nn AS (SELECT (count(*) // 16) * 16 AS nb FROM documents),
    raw AS (
      SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id - doc_id % 16) + ((doc_id % 16) + 1) % 8)::VARCHAR AS dst
      FROM documents, nn WHERE doc_id < nn.nb AND doc_id % 16 < 8
      UNION ALL
      SELECT 'n' || doc_id::VARCHAR, 'n' || (doc_id - 8)::VARCHAR
      FROM documents, nn WHERE doc_id < nn.nb AND doc_id % 16 >= 8
    ), ed AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM raw WHERE src <> dst
    ), sym AS MATERIALIZED (
      SELECT u AS a, v AS b FROM ed UNION ALL SELECT v AS a, u AS b FROM ed
    ), reach AS (
      SELECT u AS ex_u, v AS ex_v, u AS node FROM ed
      UNION
      SELECT r.ex_u, r.ex_v, s.b
      FROM reach r JOIN sym s ON s.a = r.node
      WHERE NOT (least(s.a, s.b) = r.ex_u AND greatest(s.a, s.b) = r.ex_v)
    ), nonb AS MATERIALIZED (
      SELECT e.u, e.v FROM ed e
      WHERE EXISTS (SELECT 1 FROM reach r
                    WHERE r.ex_u = e.u AND r.ex_v = e.v AND r.node = e.v)
    ), nodes AS MATERIALIZED (
      SELECT u AS node FROM ed UNION SELECT v FROM ed
    ), symnb AS MATERIALIZED (
      SELECT u AS a, v AS b FROM nonb UNION ALL SELECT v AS a, u AS b FROM nonb
    ), cl AS (
      SELECT node, node AS r FROM nodes
      UNION
      SELECT c.node, s.b FROM cl c JOIN symnb s ON s.a = c.r
    )
    SELECT node, min(r) AS tecc FROM cl GROUP BY node""",
        "kg_bridges": """
    WITH RECURSIVE nn AS (SELECT (count(*) // 16) * 16 AS nb FROM documents),
    raw AS (
      SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id - doc_id % 16) + ((doc_id % 16) + 1) % 8)::VARCHAR AS dst
      FROM documents, nn WHERE doc_id < nn.nb AND doc_id % 16 < 8
      UNION ALL
      SELECT 'n' || doc_id::VARCHAR, 'n' || (doc_id - 8)::VARCHAR
      FROM documents, nn WHERE doc_id < nn.nb AND doc_id % 16 >= 8
    ), ed AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM raw WHERE src <> dst
    ), sym AS MATERIALIZED (
      SELECT u AS a, v AS b FROM ed UNION ALL SELECT v AS a, u AS b FROM ed
    ), reach AS (
      SELECT u AS ex_u, v AS ex_v, u AS node FROM ed
      UNION
      SELECT r.ex_u, r.ex_v, s.b
      FROM reach r JOIN sym s ON s.a = r.node
      WHERE NOT (least(s.a, s.b) = r.ex_u AND greatest(s.a, s.b) = r.ex_v)
    )
    SELECT e.u AS src, e.v AS dst FROM ed e
    WHERE NOT EXISTS (SELECT 1 FROM reach r
                      WHERE r.ex_u = e.u AND r.ex_v = e.v AND r.node = e.v)""",
        # n is a cut vertex iff some neighbor is unreachable from the
        # canonical (min) neighbor in the graph minus n
        "kg_cutpoints": """
    WITH RECURSIVE nn AS (SELECT (count(*) // 16) * 16 AS nb FROM documents),
    raw AS (
      SELECT 'n' || doc_id::VARCHAR AS src,
             'n' || ((doc_id - doc_id % 16) + ((doc_id % 16) + 1) % 8)::VARCHAR AS dst
      FROM documents, nn WHERE doc_id < nn.nb AND doc_id % 16 < 8
      UNION ALL
      SELECT 'n' || doc_id::VARCHAR, 'n' || (doc_id - 8)::VARCHAR
      FROM documents, nn WHERE doc_id < nn.nb AND doc_id % 16 >= 8
    ), ed AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM raw WHERE src <> dst
    ), sym AS MATERIALIZED (
      SELECT u AS a, v AS b FROM ed UNION ALL SELECT v AS a, u AS b FROM ed
    ), nbr0 AS MATERIALIZED (
      SELECT a AS ex, min(b) AS start FROM sym GROUP BY a
    ), reach AS (
      SELECT ex, start AS node FROM nbr0
      UNION
      SELECT r.ex, s.b FROM reach r JOIN sym s ON s.a = r.node
      WHERE s.b <> r.ex
    )
    SELECT DISTINCT s.a AS node FROM sym s
    WHERE NOT EXISTS (SELECT 1 FROM reach r
                      WHERE r.ex = s.a AND r.node = s.b)""",
        "funnel_users": _funnel_sql(1440),
        "kg_entail": _entail_sql(),
        "temporal_reach": _temporal_sql(6),
        "cover_sources": _cover_sql(5),

        "kg_butterflies": """
            WITH e AS (
              SELECT DISTINCT 'd' || (doc_id % 73)::VARCHAR AS l,
                              't' || ((doc_id*13) % 97)::VARCHAR AS r
              FROM documents
            ), w AS (
              SELECT a.l AS la, b.l AS lb, count(*) AS c
              FROM e a JOIN e b ON a.r = b.r AND a.l < b.l
              GROUP BY 1, 2
            )
            SELECT (SELECT count(*) FROM e) AS n_edges,
                   coalesce((SELECT sum(c*(c-1)//2) FROM w), 0)::BIGINT AS butterflies
        """,
        "kg_njaccard": """
            WITH e0 AS (
              SELECT 'n' || (doc_id % 41)::VARCHAR AS src,
                     'm' || ((doc_id*7+1) % 43)::VARCHAR AS dst
              FROM documents
            ), und AS (
              SELECT DISTINCT x, y FROM (
                SELECT src AS x, dst AS y FROM e0
                UNION ALL SELECT dst, src FROM e0
              ) WHERE x <> y
            ), deg AS (
              SELECT x, count(*) AS deg FROM und GROUP BY x
            ), pairs AS (
              SELECT a.x AS node_a, b.x AS node_b, count(*) AS common
              FROM und a JOIN und b ON a.y = b.y AND a.x < b.x
              GROUP BY 1, 2 HAVING count(*) >= 3
            )
            SELECT p.node_a, p.node_b, p.common,
                   da.deg AS degree_a, db.deg AS degree_b,
                   (p.common * 1000000) // (da.deg + db.deg - p.common) AS jaccard_ppm
            FROM pairs p
            JOIN deg da ON da.x = p.node_a
            JOIN deg db ON db.x = p.node_b
        """,
        "dag_reduce": """
            WITH RECURSIVE
            cap AS (SELECT (count(*)//8)*8 AS c FROM documents),
            d AS (SELECT doc_id FROM documents, cap WHERE doc_id < c),
            e AS (
              SELECT DISTINCT src, dst FROM (
                SELECT 'n'||doc_id::VARCHAR AS src,
                       'n'||(doc_id+1)::VARCHAR AS dst
                FROM d WHERE doc_id % 8 < 7
                UNION ALL
                SELECT 'n'||doc_id::VARCHAR, 'n'||(doc_id+4)::VARCHAR
                FROM d WHERE doc_id % 8 = 0
              )
            ),
            r AS (
              SELECT src, dst FROM e
              UNION
              SELECT r.src, e2.dst FROM r JOIN e e2 ON e2.src = r.dst
            ),
            via2 AS (
              SELECT DISTINCT c1.src, c2.dst
              FROM r c1 JOIN r c2 ON c1.dst = c2.src
            )
            SELECT e.src, e.dst FROM e
            WHERE NOT EXISTS (
              SELECT 1 FROM via2 v WHERE v.src = e.src AND v.dst = e.dst
            )
        """,
        "skyline_docs": """
            WITH d AS (
              SELECT doc_id, n_chars,
                     (('0x' || substr(md5(text), 1, 15))::BIGINT) % 100000 AS score
              FROM documents
              WHERE doc_id % 3 = 0 AND text IS NOT NULL AND n_chars IS NOT NULL
            )
            SELECT d.doc_id, d.n_chars, d.score FROM d
            WHERE NOT EXISTS (
              SELECT 1 FROM d o
              WHERE o.n_chars >= d.n_chars AND o.score >= d.score
                AND (o.n_chars > d.n_chars OR o.score > d.score)
            )
        """,
        "kg_wl": """
            WITH e0 AS (
              SELECT 'hub'||((doc_id*7)%61)::VARCHAR AS u,
                     'hub'||((doc_id*11)%53)::VARCHAR AS v
              FROM documents
            ), und AS (
              SELECT DISTINCT u, v FROM (
                SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
              ) WHERE u <> v
            ), c0 AS (
              SELECT DISTINCT u AS node,
                     ('0x'||substr(md5('wl0'),1,15))::BIGINT AS color
              FROM und
            ), f1 AS (
              SELECT und.u AS node,
                     sum(c.color % 2147483647)::BIGINT AS msum,
                     count(*) AS mcnt
              FROM und JOIN c0 c ON c.node = und.v GROUP BY 1
            ), c1 AS (
              SELECT c0.node,
                     ('0x'||substr(md5(c0.color::VARCHAR || '|' ||
                         coalesce(f1.msum, 0)::VARCHAR || '|' ||
                         coalesce(f1.mcnt, 0)::VARCHAR), 1, 15))::BIGINT AS color
              FROM c0 LEFT JOIN f1 ON f1.node = c0.node
            ), f2 AS (
              SELECT und.u AS node,
                     sum(c.color % 2147483647)::BIGINT AS msum,
                     count(*) AS mcnt
              FROM und JOIN c1 c ON c.node = und.v GROUP BY 1
            ), c2 AS (
              SELECT c1.node,
                     ('0x'||substr(md5(c1.color::VARCHAR || '|' ||
                         coalesce(f2.msum, 0)::VARCHAR || '|' ||
                         coalesce(f2.mcnt, 0)::VARCHAR), 1, 15))::BIGINT AS color
              FROM c1 LEFT JOIN f2 ON f2.node = c1.node
            )
            SELECT node, color FROM c2
        """,
        "media_image": """
            WITH m AS (
              SELECT id AS media_id, 'payload-' || md5(id::VARCHAR || '42') AS s
              FROM range(2000) t(id) WHERE id % 3 = 0
            ), h AS (
              SELECT media_id, md5(s) AS hx, length(s) AS n_bytes FROM m
            ), u AS (
              SELECT *, ('0x'||substr(hx,9,8))::BIGINT::HUGEINT * 4294967296 +
                        ('0x'||substr(hx,17,8))::BIGINT AS uv
              FROM h
            )
            SELECT media_id,
                   16 + ('0x'||substr(hx,1,2))::INT AS width,
                   16 + ('0x'||substr(hx,3,2))::INT AS height,
                   n_bytes::INT AS n_bytes,
                   (CASE WHEN uv >= 9223372036854775808::HUGEINT
                         THEN uv - 18446744073709551616::HUGEINT
                         ELSE uv END)::BIGINT AS phash,
                   round(('0x'||substr(hx,5,2))::INT / 255.0, 4) AS brightness
            FROM u
        """,
        "media_audio": """
            WITH m AS (
              SELECT id AS media_id, 'payload-' || md5(id::VARCHAR || '42') AS s
              FROM range(2000) t(id) WHERE id % 3 = 1
            ), h AS (
              SELECT media_id, md5(s) AS hx, length(s) AS n_bytes FROM m
            )
            SELECT media_id,
                   16000 AS sample_rate,
                   n_bytes::INT AS n_bytes,
                   round(n_bytes / 32000.0, 4) AS duration_s,
                   round(('0x'||substr(hx,7,2))::INT / 255.0, 4) AS loudness
            FROM h
        """,
        "kg_coreness": _coreness_sql(3),
        "kg_matching": _matching_sql(7),
        "er_align": _er_align_sql(7),
        "kg_diameter": _diameter_sql(6),
        "kg_entail_owl": """
            WITH RECURSIVE
            cap AS (SELECT (count(*)//8)*8 AS c FROM documents),
            d AS (SELECT doc_id FROM documents, cap WHERE doc_id < c),
            chain AS (
              SELECT 'n'||doc_id::VARCHAR AS s, 'n'||(doc_id+1)::VARCHAR AS o
              FROM d WHERE doc_id % 8 < 7
            ),
            fol AS (
              SELECT 'n'||doc_id::VARCHAR AS s, 'n'||(doc_id+3)::VARCHAR AS o
              FROM d WHERE doc_id % 8 = 0
            ),
            r AS (
              SELECT s, o FROM chain
              UNION
              SELECT r.s, c.o FROM r JOIN chain c ON c.s = r.o
            )
            SELECT s AS subject, 'partOf' AS predicate, o AS object FROM r
            UNION
            SELECT s, 'relatedTo', o FROM r
            UNION
            SELECT s, 'follows', o FROM fol
            UNION
            SELECT o, 'follows', s FROM fol
        """,
        "kg_reciprocity": """
            WITH e AS (
              SELECT DISTINCT 'hub'||((doc_id*7)%61)::VARCHAR AS u,
                              'hub'||((doc_id*11)%53)::VARCHAR AS v
              FROM documents
              WHERE 'hub'||((doc_id*7)%61)::VARCHAR <> 'hub'||((doc_id*11)%53)::VARCHAR
            ), rec AS (
              SELECT e.u, e.v FROM e
              WHERE EXISTS (SELECT 1 FROM e r WHERE r.u = e.v AND r.v = e.u)
            )
            SELECT (SELECT count(*) FROM e) AS n_edges,
                   (SELECT count(*) FROM rec) AS n_reciprocal,
                   CASE WHEN (SELECT count(*) FROM e) = 0 THEN 0
                        ELSE (SELECT count(*) FROM rec) * 1000000
                             // (SELECT count(*) FROM e) END AS reciprocity_ppm
        """,
        "burst_hosts": """
            WITH sk AS (
              SELECT event_type, epoch_us(ts) // (86400 * 1000000::BIGINT) AS bucket
              FROM events
              WHERE (epoch_us(ts) // (86400 * 1000000::BIGINT)) % 7 = 0
                 OR event_id % 6 = 0
            ), pb AS (
              SELECT event_type AS key, bucket, count(*) AS n_events
              FROM sk GROUP BY 1, 2
            ), pk AS (
              SELECT key, count(*) AS n_buckets, sum(n_events) AS total_events
              FROM pb GROUP BY key
            )
            SELECT pb.key, pb.bucket * 86400 * 1000000::BIGINT AS bucket_start_us,
                   pb.n_events, pk.n_buckets, pk.total_events
            FROM pb JOIN pk USING (key)
            WHERE pb.n_events * pk.n_buckets > 3 * pk.total_events
        """,
        "kg_katz": """
            WITH e AS MATERIALIZED (
              SELECT DISTINCT 'hub'||((doc_id*7)%61)::VARCHAR AS u,
                              'hub'||((doc_id*11)%53)::VARCHAR AS v
              FROM documents
              WHERE 'hub'||((doc_id*7)%61)::VARCHAR <> 'hub'||((doc_id*11)%53)::VARCHAR
            ), nodes AS MATERIALIZED (
              SELECT DISTINCT u AS node FROM e UNION SELECT DISTINCT v FROM e
            ), k0 AS MATERIALIZED (
              SELECT node, 1000000::BIGINT AS katz FROM nodes
            ), k1 AS MATERIALIZED (
              SELECT n.node,
                     1000000::BIGINT + coalesce((
                       SELECT sum(k.katz // 16) FROM e
                       JOIN k0 k ON k.node = e.u
                       WHERE e.v = n.node), 0)::BIGINT AS katz
              FROM nodes n
            ), k2 AS MATERIALIZED (
              SELECT n.node,
                     1000000::BIGINT + coalesce((
                       SELECT sum(k.katz // 16) FROM e
                       JOIN k1 k ON k.node = e.u
                       WHERE e.v = n.node), 0)::BIGINT AS katz
              FROM nodes n
            ), k3 AS MATERIALIZED (
              SELECT n.node,
                     1000000::BIGINT + coalesce((
                       SELECT sum(k.katz // 16) FROM e
                       JOIN k2 k ON k.node = e.u
                       WHERE e.v = n.node), 0)::BIGINT AS katz
              FROM nodes n
            ), k4 AS MATERIALIZED (
              SELECT n.node,
                     1000000::BIGINT + coalesce((
                       SELECT sum(k.katz // 16) FROM e
                       JOIN k3 k ON k.node = e.u
                       WHERE e.v = n.node), 0)::BIGINT AS katz
              FROM nodes n
            )
            SELECT node, katz FROM k4
        """,
        "kg_squares": """
            WITH e0 AS (
              SELECT 'hub'||((doc_id*7)%61)::VARCHAR AS a,
                     'hub'||((doc_id*11)%53)::VARCHAR AS b
              FROM documents
            ), und AS MATERIALIZED (
              SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
              FROM e0 WHERE a <> b
            ), both_dir AS MATERIALIZED (
              SELECT u, v FROM und UNION ALL SELECT v, u FROM und
            ), wp AS MATERIALIZED (
              SELECT x.u AS a, y.u AS c, count(*) AS w
              FROM both_dir x JOIN both_dir y ON x.v = y.v AND x.u < y.u
              GROUP BY 1, 2
            )
            SELECT (SELECT count(*) FROM und) AS n_edges,
                   coalesce((SELECT sum(w) FROM wp), 0)::BIGINT AS wedges,
                   (coalesce((SELECT sum(w * (w-1) // 2) FROM wp), 0) // 2)::BIGINT AS squares
        """,
        "kg_simrank": _simrank_sql(rounds=2),
        "retrieval_eval": _retrieval_sql(k=10),
        "rake_phrases": _rake_sql(max_phrase_len=6),
        "kg_refex": _refex_sql(rounds=2),
        "kg_label_prop": _label_prop_sql(rounds=3),
        "zorder_docs": _zorder_sql(bits=16),
        "spot_mentions": _spot_sql(max_len=3),
        "kg_onion": _onion_sql(rounds=20),
        "textrank": _textrank_sql(window=2, iterations=3),
        "script_profile": _script_profile_sql(),
        "table_types": """
            SELECT 'https://x.test/' || doc_id::VARCHAR AS url,
                   0 AS col_idx, 'n' AS header, 2::BIGINT AS n_cells,
                   2::BIGINT AS n_int, 0::BIGINT AS n_dec,
                   0::BIGINT AS n_date, 0::BIGINT AS n_empty,
                   'integer' AS inferred_type
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 1, 'd', 2,
                   0, 2, 0, 0, 'decimal'
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 2, 't', 2,
                   0, 0, 1, 0, 'string'
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 3, 's', 2,
                   0, 0, 0, 0, 'string'
            FROM documents
        """,
        "kg_shacl": """
            WITH docs AS (
              SELECT doc_id, lang, source, n_chars FROM documents
            )
            SELECT 'd' || doc_id::VARCHAR AS id, 'DocShape' AS shape,
                   'in_language' AS path, 'min_count' AS violation,
                   '0' AS observed
            FROM docs WHERE doc_id % 7 = 0
            UNION ALL
            SELECT 'd' || doc_id::VARCHAR, 'DocShape', 'in_language',
                   'max_count', '2'
            FROM docs WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0
            UNION ALL
            SELECT 'd' || doc_id::VARCHAR, 'DocShape', 'in_language',
                   'object_class', 'source'
            FROM docs WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0
            UNION ALL
            SELECT 'd' || doc_id::VARCHAR, 'DocShape', 'n_chars',
                   'pattern', 'c' || n_chars::VARCHAR
            FROM docs WHERE doc_id % 13 = 0
            UNION ALL
            SELECT 'd' || doc_id::VARCHAR, 'DocShape', 'lang',
                   'values', lang
            FROM docs WHERE lang NOT IN ('en', 'de', 'fr')
        """,
        "kg_functional": """
            WITH e AS (
              SELECT DISTINCT 'e' || (doc_id % 100)::VARCHAR AS src,
                     lang AS dst, 'birth_date' AS label
              FROM documents
              UNION
              SELECT DISTINCT 'e' || (doc_id % 100)::VARCHAR, source,
                     'canonical_url'
              FROM documents
            )
            SELECT src, label, count(*) AS n_objects
            FROM e GROUP BY src, label HAVING count(*) > 1
        """,
        "kg_ifp": """
            WITH e AS (
              SELECT DISTINCT 'a' || doc_id::VARCHAR AS src,
                     'isbn:' || (doc_id % 250)::VARCHAR AS obj
              FROM documents
              UNION
              SELECT DISTINCT 'a' || doc_id::VARCHAR, 'isbn:unknown'
              FROM documents WHERE doc_id % 50 = 0
            ), g AS (
              SELECT obj FROM e GROUP BY obj
              HAVING count(*) >= 2 AND count(*) <= 20
            )
            SELECT a.src AS a, b.src AS b, 'has_isbn' AS label, a.obj AS obj
            FROM e a JOIN e b ON a.obj = b.obj AND a.src < b.src
            JOIN g ON g.obj = a.obj
        """,
        "er_blocking_eval": """
            WITH nn AS (
              SELECT count(*) AS n FROM documents
            ), rec AS (
              SELECT 'p' || doc_id::VARCHAR AS rid, doc_id // 4 AS blk,
                     doc_id AS i
              FROM documents
            ), cand AS (
              SELECT DISTINCT least(a.rid, b.rid) AS a,
                     greatest(a.rid, b.rid) AS b
              FROM rec a JOIN rec b ON a.blk = b.blk AND a.i < b.i
            ), gold AS (
              SELECT DISTINCT least(rid, 'p' || (i + 1)::VARCHAR) AS a,
                     greatest(rid, 'p' || (i + 1)::VARCHAR) AS b
              FROM rec WHERE i < (SELECT n FROM nn) - 1
            ), c AS (
              SELECT count(*) AS n_candidates FROM cand
            ), g AS (
              SELECT count(*) AS n_gold FROM gold
            ), m AS (
              SELECT count(*) AS n_matched
              FROM cand JOIN gold ON cand.a = gold.a AND cand.b = gold.b
            )
            SELECT c.n_candidates, g.n_gold, m.n_matched,
                   (nn.n * (nn.n - 1) // 2)::BIGINT AS total_pairs,
                   ((nn.n * (nn.n - 1) // 2 - c.n_candidates) * 1000000)
                     // (nn.n * (nn.n - 1) // 2) AS reduction_ratio_ppm,
                   (m.n_matched * 1000000) // g.n_gold
                     AS pair_completeness_ppm,
                   (m.n_matched * 1000000) // c.n_candidates
                     AS pair_quality_ppm
            FROM c, g, m, nn
        """,
        "er_fold_keys": """
            SELECT strip_accents(
                     CASE doc_id % 5
                       WHEN 0 THEN 'Renée' WHEN 1 THEN 'Černý'
                       WHEN 2 THEN 'François' WHEN 3 THEN 'Müller'
                       ELSE 'Ibáñez' END || ' ' || source
                   ) AS folded_key,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "kg_spam_mass": _spam_mass_sql(iterations=4),
        "er_bcubed": """
            WITH rec AS (
              SELECT 'p' || doc_id::VARCHAR AS id,
                     'b' || (doc_id // 4)::VARCHAR AS pc,
                     'g' || (doc_id // 5)::VARCHAR AS gc
              FROM documents
            ), ps AS (
              SELECT pc, count(*) AS s FROM rec GROUP BY pc
            ), gs AS (
              SELECT gc, count(*) AS s FROM rec GROUP BY gc
            ), isz AS (
              SELECT pc, gc, count(*) AS s FROM rec GROUP BY pc, gc
            ), scored AS (
              SELECT (isz.s * 1000000) // ps.s AS p,
                     (isz.s * 1000000) // gs.s AS r
              FROM rec
              JOIN isz ON isz.pc = rec.pc AND isz.gc = rec.gc
              JOIN ps ON ps.pc = rec.pc
              JOIN gs ON gs.gc = rec.gc
            ), agg AS (
              SELECT count(*) AS n_records,
                     sum(p)::BIGINT // count(*) AS bcubed_precision_ppm,
                     sum(r)::BIGINT // count(*) AS bcubed_recall_ppm
              FROM scored
            )
            SELECT n_records, bcubed_precision_ppm, bcubed_recall_ppm,
                   CASE WHEN bcubed_precision_ppm + bcubed_recall_ppm > 0
                        THEN (2 * bcubed_precision_ppm * bcubed_recall_ppm)
                             // (bcubed_precision_ppm + bcubed_recall_ppm)
                   END AS bcubed_f1_ppm
            FROM agg
        """,
        "kg_profile": """
            WITH docs AS (
              SELECT doc_id, lang, source, n_chars FROM documents
            ), nd AS (
              SELECT count(*) AS n FROM docs
            ), lang_edges AS (
              SELECT 'd' || doc_id::VARCHAR AS id, lang AS v
              FROM docs WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT 'd' || doc_id::VARCHAR, source
              FROM docs WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0
            )
            SELECT 'document' AS label, 'edge' AS kind,
                   'in_language' AS path, nd.n AS n_nodes,
                   count(DISTINCT id) AS n_present,
                   count(*)::BIGINT AS n_total,
                   count(DISTINCT v) AS n_distinct,
                   (count(DISTINCT id) * 1000000) // nd.n AS fill_ppm
            FROM lang_edges, nd GROUP BY nd.n
            UNION ALL
            SELECT 'document', 'edge', 'from_source', nd.n,
                   count(*), count(*)::BIGINT,
                   count(DISTINCT source),
                   (count(*) * 1000000) // nd.n
            FROM docs, nd GROUP BY nd.n
            UNION ALL
            SELECT 'document', 'prop', 'n_chars', nd.n,
                   count(*), count(*)::BIGINT,
                   count(DISTINCT n_chars::VARCHAR),
                   (count(*) * 1000000) // nd.n
            FROM docs, nd GROUP BY nd.n
        """,
        "kg_charsets": """
            WITH t AS (
              SELECT 'd' || doc_id::VARCHAR AS s, 'name' AS p FROM documents
              UNION
              SELECT 'd' || doc_id::VARCHAR, 'isbn'
              FROM documents WHERE doc_id % 2 = 0
              UNION
              SELECT 'd' || doc_id::VARCHAR, 'url'
              FROM documents WHERE doc_id % 3 = 0
            ), per AS (
              SELECT s, string_agg(p, '|' ORDER BY p) AS cs,
                     count(*) AS np
              FROM t GROUP BY s
            )
            SELECT cs, count(*) AS n_subjects, np AS n_preds
            FROM per GROUP BY cs, np
        """,
        "kg_partition_quality": """
            WITH e0 AS (
              SELECT 'H' AS src, 'd' || doc_id::VARCHAR AS dst FROM documents
              UNION ALL
              SELECT 'd' || (doc_id % 500)::VARCHAR,
                     'd' || ((doc_id * 3 + 1) % 500)::VARCHAR
              FROM documents
            ), deg AS (
              SELECT src, count(*) AS c FROM e0 GROUP BY src
            ), a AS MATERIALIZED (
              SELECT e0.src, e0.dst,
                     CASE WHEN d.c > 50
                          THEN ((('0x' || substr(md5(e0.src), 1, 15))::BIGINT)
                                + (('0x' || substr(md5(e0.dst), 1, 15))::BIGINT)) % 16
                          ELSE (('0x' || substr(md5(e0.src), 1, 15))::BIGINT) % 16 END AS part
              FROM e0 JOIN deg d ON d.src = e0.src
            ), loads AS (
              SELECT part, count(*) AS n FROM a GROUP BY part
            ), tot AS (
              SELECT sum(n)::BIGINT AS n_edges, count(*) AS parts_used,
                     max(n) AS max_load
              FROM loads
            ), touch AS (
              SELECT DISTINCT v, part FROM (
                SELECT src AS v, part FROM a
                UNION ALL SELECT dst, part FROM a
              )
            ), rep AS (
              SELECT count(DISTINCT v) AS n_vertices,
                     count(*) AS replicas
              FROM touch
            )
            SELECT tot.n_edges, rep.n_vertices, tot.parts_used, tot.max_load,
                   (tot.max_load * 16 * 1000000) // tot.n_edges
                     AS balance_ppm,
                   (rep.replicas * 1000000) // rep.n_vertices
                     AS replication_ppm
            FROM tot, rep
        """,
        "kg_bowtie": """
            SELECT 'c' || i::VARCHAR AS node, 'CORE' AS region FROM range(8) t(i)
            UNION ALL
            SELECT 'a' || i::VARCHAR, 'IN' FROM range(12) t(i)
            UNION ALL
            SELECT 'b' || i::VARCHAR, 'IN' FROM range(12) t(i)
            UNION ALL
            SELECT 'x' || i::VARCHAR, 'OUT' FROM range(10) t(i)
            UNION ALL
            SELECT 'y' || i::VARCHAR, 'OUT' FROM range(10) t(i)
            UNION ALL
            SELECT 't' || i::VARCHAR, 'TUBE' FROM range(6) t(i)
            UNION ALL
            SELECT 'n' || i::VARCHAR, 'TENDRIL' FROM range(5) t(i)
            UNION ALL
            SELECT 'w' || i::VARCHAR, 'TENDRIL' FROM range(5) t(i)
            UNION ALL
            SELECT 'd' || i::VARCHAR, 'DISCONNECTED' FROM range(4) t(i)
            UNION ALL
            SELECT 'e' || i::VARCHAR, 'DISCONNECTED' FROM range(4) t(i)
        """,
        "triples_graph": """
            SELECT 'node' AS kind, 'doc' || doc_id::VARCHAR AS a,
                   'Article' AS b, '' AS c
            FROM documents
            UNION ALL
            SELECT 'node', 'ent' || g::VARCHAR, 'entity', ''
            FROM (SELECT DISTINCT doc_id % 40 AS g FROM documents)
            UNION ALL
            SELECT 'edge', 'doc' || doc_id::VARCHAR,
                   'ent' || (doc_id % 40)::VARCHAR, 'about'
            FROM documents
            UNION ALL
            SELECT 'prop', 'doc' || doc_id::VARCHAR, 'name',
                   'n ' || (doc_id % 9)::VARCHAR
            FROM documents
        """,
        "k_anonymity": """
            WITH g AS (
              SELECT lang, source, doc_id % 40 AS b, count(*) AS gn
              FROM documents GROUP BY 1, 2, 3
            )
            SELECT sum(gn)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_groups,
                   sum(CASE WHEN gn < 5 THEN 1 ELSE 0 END)::BIGINT
                     AS violating_groups,
                   sum(CASE WHEN gn < 5 THEN gn ELSE 0 END)::BIGINT
                     AS rows_at_risk,
                   min(gn)::BIGINT AS min_group_size,
                   5::BIGINT AS k
            FROM g
        """,
        "url_features": """
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
                   || '://h' || (doc_id % 7)::VARCHAR || '.example'
                   || (CASE WHEN doc_id % 3 = 0 THEN ''
                       WHEN doc_id % 3 = 1 THEN '/p' || doc_id::VARCHAR
                       ELSE '/p/' || doc_id::VARCHAR END)
                   || (CASE WHEN doc_id % 4 = 0 THEN '?x=1&y=' || lang
                       ELSE '' END)
                   || (CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END)
                     AS url,
                   (doc_id % 2 = 0) AS is_https,
                   'h' || (doc_id % 7)::VARCHAR || '.example' AS host,
                   (CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1
                    ELSE 2 END)::BIGINT AS path_depth,
                   (CASE doc_id % 3 WHEN 0 THEN 0
                    WHEN 1 THEN 2 + len(doc_id::VARCHAR)
                    ELSE 3 + len(doc_id::VARCHAR) END)::BIGINT AS path_len,
                   (CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 0 END)::BIGINT
                     AS n_params,
                   (doc_id % 5 = 0) AS has_fragment
            FROM documents
        """,
        "readability": r"""
            WITH base AS (
              SELECT doc_id,
                     greatest(CASE WHEN trim(text) = '' THEN 0
                              ELSE len(regexp_split_to_array(trim(text), '\s+'))
                              END, 1)::BIGINT AS n_words,
                     greatest(len(regexp_extract_all(trim(text),
                                                     '[.!?]+(\s|$)')),
                              1)::BIGINT AS n_sentences,
                     greatest(len(regexp_extract_all(lower(text),
                                                     '[aeiouy]+')),
                              1)::BIGINT AS n_syllables
              FROM documents
            )
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   ((390000 * n_words // n_sentences)
                    + (11800000 * n_syllables // n_words)
                    - 15590000)::BIGINT AS fk_grade_ppm
            FROM base
        """,
        "judge_agreement": """
            WITH pairs AS MATERIALIZED (
              SELECT 'L' || (doc_id % 4)::VARCHAR AS a,
                     CASE WHEN doc_id % 5 = 0
                          THEN 'L' || ((doc_id + 1) % 4)::VARCHAR
                          ELSE 'L' || (doc_id % 4)::VARCHAR END AS b
              FROM documents
            ), base AS (
              SELECT count(*)::BIGINT AS n,
                     sum(CASE WHEN a = b THEN 1 ELSE 0 END)::BIGINT AS agree
              FROM pairs
            ), sab AS (
              SELECT coalesce(sum(na * nb), 0)::BIGINT AS sab FROM
                (SELECT a AS label, count(*)::BIGINT AS na FROM pairs GROUP BY 1) ca
              JOIN
                (SELECT b AS label, count(*)::BIGINT AS nb FROM pairs GROUP BY 1) cb
              USING (label)
            )
            SELECT n, (agree * 1000000 // n)::BIGINT AS agree_ppm,
                   (CASE WHEN n * n = sab THEN NULL
                    ELSE (agree * n - sab) * 1000000 // (n * n - sab)
                    END)::BIGINT AS kappa_ppm
            FROM base, sab
        """,
        "tables_kg": """
            SELECT 'https://x.test/' || doc_id::VARCHAR || '#1:table_row'
                     AS src,
                   source || ':source' AS dst,
                   'from_source' AS elabel
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR || '#2:table_row',
                   'l & ' || lang || ':source', 'from_source'
            FROM documents
        """,
        "kg_twins": """
            WITH e AS MATERIALIZED (
              SELECT DISTINCT u, v FROM (
                SELECT 'v' || (doc_id % 60)::VARCHAR AS u,
                       'h' || ((doc_id % 60) % 6)::VARCHAR AS v
                FROM documents
                UNION ALL
                SELECT 'r' || ((doc_id % 60) % 10)::VARCHAR,
                       'v' || (doc_id % 60)::VARCHAR
                FROM documents
              ) WHERE u <> v
            ), op AS MATERIALIZED (
              SELECT u AS node,
                     sum(('0x'||substr(md5('t1:'||v),1,15))::BIGINT
                         % 2147483647)::BIGINT AS os1,
                     sum(('0x'||substr(md5('t2:'||v),1,15))::BIGINT
                         % 2147483647)::BIGINT AS os2,
                     count(*)::BIGINT AS onn
              FROM e GROUP BY 1
            ), ip AS MATERIALIZED (
              SELECT v AS node,
                     sum(('0x'||substr(md5('t1:'||u),1,15))::BIGINT
                         % 2147483647)::BIGINT AS is1,
                     sum(('0x'||substr(md5('t2:'||u),1,15))::BIGINT
                         % 2147483647)::BIGINT AS is2,
                     count(*)::BIGINT AS inn
              FROM e GROUP BY 1
            ), prof AS MATERIALIZED (
              SELECT coalesce(op.node, ip.node) AS node,
                     coalesce(os1, 0) AS os1, coalesce(os2, 0) AS os2,
                     coalesce(onn, 0) AS onn,
                     coalesce(is1, 0) AS is1, coalesce(is2, 0) AS is2,
                     coalesce(inn, 0) AS inn
              FROM op FULL OUTER JOIN ip ON op.node = ip.node
            ), cls AS (
              SELECT os1, os2, onn, is1, is2, inn,
                     min(node) AS class_id, count(*)::BIGINT AS class_size
              FROM prof GROUP BY 1, 2, 3, 4, 5, 6
            )
            SELECT p.node, c.class_id, c.class_size
            FROM prof p
            JOIN cls c USING (os1, os2, onn, is1, is2, inn)
            WHERE c.class_size >= 2
        """,
        "meta_og": """
            SELECT 'https://x.test/' || doc_id::VARCHAR AS subject,
                   'og:title' AS predicate, upper(source) AS object
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 'description',
                   'x & ' || lang
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 'og:len',
                   n_chars::VARCHAR
            FROM documents
        """,
        "microdata": """
            SELECT 'https://x.test/' || doc_id::VARCHAR AS subject,
                   'a' AS predicate,
                   'https://schema.org/' || source AS object
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 'inLanguage', lang
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 'numChars',
                   n_chars::VARCHAR
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 'via',
                   's & ' || source
            FROM documents
        """,
        "web_tables": """
            SELECT 'https://x.test/' || doc_id::VARCHAR AS url,
                   1 AS row_idx, 0 AS col_idx,
                   'source' AS header, source AS cell
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 1, 1, 'chars',
                   n_chars::VARCHAR
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 2, 0, 'source',
                   'l & ' || lang
            FROM documents
            UNION ALL
            SELECT 'https://x.test/' || doc_id::VARCHAR, 2, 1, 'chars',
                   (doc_id % 7)::VARCHAR
            FROM documents
        """,
        "ld_extract": """
            SELECT 'doc' || doc_id::VARCHAR AS subject, 'a' AS predicate,
                   'Article' AS object
            FROM documents
            UNION ALL
            SELECT 'doc' || doc_id::VARCHAR, 'name',
                   'entity ' || (doc_id % 500)::VARCHAR
            FROM documents
            UNION ALL
            SELECT 'doc' || doc_id::VARCHAR, 'inLanguage', lang
            FROM documents
        """,
        "kg_lcc": """
            WITH mem AS (
              SELECT 'd' || doc_id::VARCHAR AS vertex FROM documents
              WHERE doc_id % 10 < 5
              UNION ALL SELECT 'gA'
            ), lbl AS (
              SELECT min(vertex) AS component, count(*) AS size FROM mem
            )
            SELECT m.vertex, l.component, l.size FROM mem m, lbl l
        """,
        "ld_export": """
            SELECT 'doc' || doc_id::VARCHAR AS subject,
                   '{"@id":"doc' || doc_id::VARCHAR ||
                   '","from_source":["' || source ||
                   '"],"in_language":["' || lang || '"]}' AS line
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
        """,
        "kg_graph_hash": """
            WITH wl AS (
                WITH e0 AS (
                  SELECT 'hub'||((doc_id*7)%61)::VARCHAR AS u,
                         'hub'||((doc_id*11)%53)::VARCHAR AS v
                  FROM documents
                ), und AS (
                  SELECT DISTINCT u, v FROM (
                    SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
                  ) WHERE u <> v
                ), c0 AS (
                  SELECT DISTINCT u AS node,
                         ('0x'||substr(md5('wl0'),1,15))::BIGINT AS color
                  FROM und
                ), f1 AS (
                  SELECT und.u AS node,
                         sum(c.color % 2147483647)::BIGINT AS msum,
                         count(*) AS mcnt
                  FROM und JOIN c0 c ON c.node = und.v GROUP BY 1
                ), c1 AS (
                  SELECT c0.node,
                         ('0x'||substr(md5(c0.color::VARCHAR || '|' ||
                             coalesce(f1.msum, 0)::VARCHAR || '|' ||
                             coalesce(f1.mcnt, 0)::VARCHAR), 1, 15))::BIGINT AS color
                  FROM c0 LEFT JOIN f1 ON f1.node = c0.node
                ), f2 AS (
                  SELECT und.u AS node,
                         sum(c.color % 2147483647)::BIGINT AS msum,
                         count(*) AS mcnt
                  FROM und JOIN c1 c ON c.node = und.v GROUP BY 1
                ), c2 AS (
                  SELECT c1.node,
                         ('0x'||substr(md5(c1.color::VARCHAR || '|' ||
                             coalesce(f2.msum, 0)::VARCHAR || '|' ||
                             coalesce(f2.mcnt, 0)::VARCHAR), 1, 15))::BIGINT AS color
                  FROM c1 LEFT JOIN f2 ON f2.node = c1.node
                )
                SELECT node, color FROM c2
            ),
            hist AS (
              SELECT color, count(*) AS c FROM wl GROUP BY color
            )
            SELECT coalesce(sum(c), 0)::BIGINT AS n_nodes,
                   ('0x' || substr(md5(string_agg(color::VARCHAR || ':' || c::VARCHAR,
                                                  ',' ORDER BY color::VARCHAR || ':' || c::VARCHAR)),
                                   1, 15))::BIGINT AS graph_hash
            FROM hist
        """,
        "hearst_isa": _hearst_sql(),
        "meronym_partof": _meronym_sql(),
        "date_norm": _dates_sql(),
        "quantity_norm": _quantities_sql(),
        "geo_norm": _geo_sql(),
        "acronym_alias": _acronyms_sql(),
        "breadcrumb_taxonomy": _breadcrumbs_sql(),
        "copula_isa": _copula_sql(),
        "rdfa_triples": _rdfa_sql(),
        "link_rel": _link_rel_sql(),
        "alias_frames": _aliases_sql(),
        "definition_pairs": _definitions_sql(),
        "contrast_frames": _contrast_sql(),
        "cohyponym_pairs": f"""
            WITH h AS ({_hearst_sql()})
            SELECT DISTINCT a.doc_id, a.hyponym AS a, b.hyponym AS b,
                   a.hypernym, a.pattern
            FROM h a JOIN h b
              ON a.doc_id = b.doc_id AND a.hypernym = b.hypernym
             AND a.pattern = b.pattern
            WHERE a.hyponym < b.hyponym
        """,
        "hreflang_clusters": _hreflang_clusters_sql(),
        "appositive_facts": _appositive_sql(),
        "quote_attrib": _quotes_sql(),
        "numeric_facts": _numeric_facts_sql(),
        "kv_type_profile": _kv_types_sql(),
        "citation_mentions": _citations_sql(),
        "identifier_mentions": _identifiers_sql(),
        "md_sections": _md_sections_sql(),
        "section_text": _section_text_sql(),
        "section_paths": f"""
            WITH RECURSIVE ms AS (
              {_md_sections_sql()}
            ), paths(doc_id, pos, path) AS (
              SELECT doc_id, pos, title FROM ms WHERE parent_pos IS NULL
              UNION ALL
              SELECT h.doc_id, h.pos, p.path || ' > ' || h.title
              FROM ms h JOIN paths p
                ON h.doc_id = p.doc_id AND h.parent_pos = p.pos
            )
            SELECT doc_id, pos, path FROM paths
        """,
        "harvest_yield": f"""
            WITH h AS ({_hearst_sql()}),
            per AS (
              SELECT doc_id, count(*)::BIGINT AS n_t FROM h GROUP BY doc_id
            ), base AS (
              SELECT d.doc_id, d.source AS grp, per.n_t
              FROM documents d LEFT JOIN per USING (doc_id)
            )
            SELECT grp AS "group", count(*)::BIGINT AS n_docs,
                   count(n_t)::BIGINT AS n_docs_with,
                   coalesce(sum(n_t), 0)::BIGINT AS n_triples,
                   (coalesce(sum(n_t), 0) * 10000 // count(*))::BIGINT
                     AS triples_per_doc_e4
            FROM base GROUP BY 1
        """,
        "fact_consensus": f"""
            WITH nf AS ({_numeric_facts_sql()}),
            ranked AS (
              SELECT subject, relation, value,
                     row_number() OVER (
                       PARTITION BY subject, relation ORDER BY value
                     ) AS rn,
                     count(*) OVER (
                       PARTITION BY subject, relation
                     ) AS m
              FROM nf
            )
            SELECT subject, relation,
                   max(m)::BIGINT AS n_claims,
                   count(DISTINCT value)::BIGINT AS n_values,
                   min(value) AS vmin, max(value) AS vmax,
                   max(CASE WHEN rn = (m - 1) // 2 + 1 THEN value END)
                     AS median
            FROM ranked GROUP BY 1, 2
        """,
        "page_kg": _page_kg_sql(),
        "breadcrumb_closure": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT 'c' || (doc_id % 500)::VARCHAR AS child,
                     'c' || ((doc_id % 500) // 2)::VARCHAR AS parent
              FROM documents WHERE doc_id % 500 >= 2
            ), c(descendant, ancestor, depth) AS (
              SELECT child, parent, 1 FROM e
              UNION
              SELECT c.descendant, e.parent, c.depth + 1
              FROM c JOIN e ON c.ancestor = e.child
            )
            SELECT descendant, ancestor, min(depth)::INTEGER AS depth
            FROM c GROUP BY 1, 2
        """,
        "triple_support": f"""
            WITH h AS ({_hearst_sql()})
            SELECT hyponym AS subject, pattern AS predicate,
                   hypernym AS object,
                   count(DISTINCT doc_id)::BIGINT AS support
            FROM h
            GROUP BY 1, 2, 3
            HAVING count(DISTINCT doc_id) >= 2
        """,
        "text_kg": f"""
            WITH h AS ({_hearst_sql()}),
            mer AS ({_meronym_sql()}),
            tri AS (
              SELECT hyponym AS s, 'is_a' AS p, hypernym AS o FROM h
              UNION ALL
              SELECT part AS s, 'part_of' AS p, whole AS o FROM mer
            ), nd AS (
              SELECT DISTINCT s FROM (
                SELECT s FROM tri UNION ALL SELECT o AS s FROM tri
              )
            )
            SELECT 'node' AS kind, s AS a, 'entity' AS b, '' AS c FROM nd
            UNION ALL
            SELECT DISTINCT 'edge' AS kind, s AS a, o AS b, p AS c FROM tri
        """,
        "temporal_facts": f"""
            WITH mer AS ({_meronym_sql()}),
            dat AS ({_dates_sql()}),
            fst AS (
              SELECT doc_id, min(epoch_day) AS first_seen_day
              FROM dat GROUP BY doc_id
            )
            SELECT m.doc_id, m.part, m.whole, m.pattern, f.first_seen_day
            FROM mer m JOIN fst f USING (doc_id)
        """,
        "change_rate": """
            WITH snaps AS (
              SELECT 'https://crawl.' || source || '.com/p/'
                       || doc_id::VARCHAR AS url,
                     u.k::BIGINT AS ts,
                     CASE WHEN u.k = 4 AND doc_id % 3 = 0 THEN 'a'
                          WHEN u.k < doc_id % 4 THEN 'a'
                          ELSE 'b' END AS value
              FROM documents, LATERAL unnest([0, 1, 2, 3, 4]) AS u(k)
            ), chg AS (
              SELECT url, ts,
                     CASE WHEN lag(value) OVER w IS NULL THEN 0
                          WHEN lag(value) OVER w <> value THEN 1
                          ELSE 0 END AS c
              FROM snaps WINDOW w AS (PARTITION BY url ORDER BY ts, value)
            ), agg AS (
              SELECT url, count(*)::BIGINT AS n_fetches,
                     sum(c)::BIGINT AS n_changes,
                     min(ts) AS first_ts, max(ts) AS last_ts
              FROM chg GROUP BY url
            )
            SELECT url, n_fetches, n_changes, first_ts, last_ts,
                   CASE WHEN n_fetches > 1
                        THEN n_changes * 1000000 // (n_fetches - 1)
                   END AS change_ppm,
                   CASE WHEN n_changes > 0
                        THEN (last_ts - first_ts) // n_changes
                   END AS est_change_interval,
                   CASE WHEN n_changes > 0
                         AND (last_ts - first_ts) // n_changes > 0
                        THEN (9 - last_ts) * 1000000
                               // ((last_ts - first_ts) // n_changes)
                   END AS staleness_ppm
            FROM agg
        """,
    }
