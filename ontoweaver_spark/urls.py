"""URL canonicalization + latest-per-URL page dedup — the first two
operators of every Common-Crawl-style ingestion pipeline (the same crawl
URL arrives as http/https, with/without default port, with tracking
params, fragments, duplicate slashes, and in every case mixture).

Everything is pure JVM string expressions (regexp_extract/replace chains,
no Python), and every regex avoids lookarounds so the DuckDB oracle can
run the byte-identical pattern (both engines are RE2-compatible on this
subset). At 100 TB the canonicalization is a zero-shuffle projection; the
latest-per-URL dedup is one max_by hash aggregate on the canonical key.

Relation to ``linking.canonical_url``: that one is the AGGRESSIVE entity
identity key (drops the entire query string + ``www.``) used when a URL
names an entity; this module's :func:`canonical_url` preserves
content-bearing query params (only tracking params stripped) because for
crawl snapshots ``?page=2`` is a different document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters every crawler strips (Google/Facebook/Microsoft
# click ids + utm campaign tags)
TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid)=[^&#]*"

# optional scheme://host group: a schemeless URL still matches, with the
# whole string landing in group 2 (regexp_extract returns '' on a
# non-match, which would otherwise swallow the URL entirely)
_SPLIT_RE = r"^((?:[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)?)(.*)$"


def canonical_url(c: Column) -> Column:
    """Canonical form of an absolute URL:

    - scheme and host lowercased (the case-insensitive parts; path/query
      case is significant and preserved),
    - default ports stripped (``:80`` for http, ``:443`` for https),
    - fragment dropped,
    - tracking params removed (``TRACKING_PARAM_RE``) with separator
      cleanup, empty query dropped,
    - duplicate slashes in the path collapsed, trailing slash stripped
      (so ``https://host/`` == ``https://host``).

    URLs without a ``scheme://`` prefix pass through with only the
    fragment/tracking/slash rules applied (host can't be told apart)."""
    no_frag = F.regexp_replace(c, r"#.*$", "")
    # scheme://host[:port]; '' for a schemeless URL (then concat('',
    # tail) below degrades to the tail rules alone — no branch needed).
    # Default ports strip via anchored backreference replaces so the head
    # expression appears ONCE in the tree (a when-cascade would embed it
    # per branch — the expression-blowup shape lang_id avoids too).
    head = F.lower(F.regexp_extract(no_frag, _SPLIT_RE, 1))
    head = F.regexp_replace(head, r"^(http://[^:/]*):80$", "$1")
    head = F.regexp_replace(head, r"^(https://[^:/]*):443$", "$1")

    # tracking params, then separator cleanup (orphan & / ? leftovers)
    tail = F.regexp_extract(no_frag, _SPLIT_RE, 2)  # /path?query
    tail = F.regexp_replace(tail, TRACKING_PARAM_RE, "")
    tail = F.regexp_replace(tail, r"&&+", "&")
    tail = F.regexp_replace(tail, r"\?&", "?")
    tail = F.regexp_replace(tail, r"[?&]+$", "")
    # collapse duplicate slashes in the path (query untouched: split at
    # '?'); the trailing strip takes the whole [/?&] run — stripping only
    # '/' could EXPOSE a trailing '&' that the tail-level cleanup above
    # already ran past, breaking idempotence (hypothesis found '&/')
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"//+", "/")
    path = F.regexp_replace(path, r"[/?&]+$", "")
    query = F.regexp_replace(tail, r"^[^?]*", "")
    return F.concat(head, path, query)


def canonical_url_sql(col: str) -> str:
    """The DuckDB mirror of :func:`canonical_url` (same regexes, same
    order) — used by the driver oracle; kept next to the implementation so
    the two can't drift silently. Every regexp_replace carries the ``'g'``
    flag: Spark replaces all matches by default, DuckDB only the first."""
    no_frag = f"regexp_replace({col}, '#.*$', '', 'g')"
    head = f"lower(regexp_extract({no_frag}, '{_SPLIT_RE}', 1))"
    head = f"regexp_replace({head}, '^(http://[^:/]*):80$', '\\1', 'g')"
    head = f"regexp_replace({head}, '^(https://[^:/]*):443$', '\\1', 'g')"
    tail = f"regexp_extract({no_frag}, '{_SPLIT_RE}', 2)"
    tail = f"regexp_replace({tail}, '{TRACKING_PARAM_RE}', '', 'g')"
    tail = f"regexp_replace({tail}, '&&+', '&', 'g')"
    tail = f"regexp_replace({tail}, '\\?&', '?', 'g')"
    tail = f"regexp_replace({tail}, '[?&]+$', '', 'g')"
    path = (
        f"regexp_replace(regexp_replace(regexp_extract({tail}, '^([^?]*)', 1), "
        f"'//+', '/', 'g'), '[/?&]+$', '', 'g')"
    )
    query = f"regexp_replace({tail}, '^[^?]*', '')"
    return f"({head} || {path} || {query})"


def latest_per_url(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    canon_col: str = "canonical_url",
) -> DataFrame:
    """Crawl-snapshot dedup: one row per CANONICAL url — the latest fetch
    (max ``ts_col``; ties broken by the raw url string so the result is
    deterministic). One hash aggregate keyed on the canonical url: at
    100 TB this is a single shuffle with map-side partial max_by, no
    window sort over the corpus."""
    canon = pages.withColumn(canon_col, canonical_url(F.col(url_col)))
    others = [f for f in canon.columns if f != canon_col]
    pick = F.max_by(
        F.struct(*others), F.struct(F.col(ts_col), F.col(url_col))
    ).alias("_row")
    return (
        canon.groupBy(canon_col)
        .agg(pick)
        .select(canon_col, *[F.col(f"_row.{f}").alias(f) for f in others])
    )


def host_of(c: Column) -> Column:
    """Lowercased host (authority minus userinfo/port stays intact here —
    crawl link graphs key on the registrable host string as crawled) of
    an absolute URL; ``''`` for schemeless/relative input."""
    return F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))


def host_link_graph(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    link_pattern: str = r"(https?://[^\s\"'<>]+)",
    include_self: bool = False,
) -> DataFrame:
    """Weighted host-level link graph from in-text outlinks ->
    ``(src_host, dst_host, n_links)`` — the domain-ranking input every
    web pipeline derives (host PageRank, spam-farm k-cores, crawl
    frontier scoring all start here; compose with
    ``graphstats.pagerank_fixed_point`` / ``k_core`` directly).

    Intra-host links are dropped by default: navigation self-links
    dominate raw link counts and carry no cross-domain signal
    (``include_self=True`` keeps them). Trailing sentence punctuation can
    ride along in a matched link's PATH, but the host (everything before
    the first ``/``) is unaffected, which is all this graph keys on.

    Scale shape (10^12 pages): extract + explode + host projection are
    all JVM-side in one pass over the corpus; the only shuffle is the
    (src_host, dst_host) count, whose map-side partials absorb the raw
    link volume — hub hosts arrive at the reducer as one partial per
    task, never as row floods. No Python, no window, no join.
    """
    links = pages.select(
        host_of(F.col(url_col)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(link_pattern), 1)
        ).alias("link"),
    )
    pairs = links.select(
        "src_host", host_of(F.col("link")).alias("dst_host")
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not include_self:
        pairs = pairs.where(F.col("src_host") != F.col("dst_host"))
    return pairs.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )
