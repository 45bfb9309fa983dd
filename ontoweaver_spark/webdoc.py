"""Raw web-document surgery: HTML -> text extraction and HTTP/WARC
response-record parsing — the two steps between "bytes fetched" and the
``text`` column every downstream operator (dedup, quality, KG extraction)
assumes. The reference consumes pre-extracted tabular text
(src/ontoweaver/loader.py reads CSVs); a Common-Crawl-scale pipeline has
to produce that column itself, so these are first-class here.

Everything is a chain of JVM ``regexp_replace``/``regexp_extract``
expressions — zero-shuffle projections with no Python in the row path,
and every regex is RE2-safe (no lookarounds, no backrefs) so an ANSI
oracle can run the byte-identical chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (entity, replacement) in DECODE ORDER: &amp; must decode LAST or it
# would re-activate other entities ("&amp;lt;" means the literal "&lt;")
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_to_text(c: Column) -> Column:
    """Visible text of an HTML string: ``<script>``/``<style>`` blocks
    dropped wholesale (their content is code, not text), every remaining
    tag replaced by a space (so ``a<br>b`` stays two words), the common
    HTML entities decoded AFTER tag-stripping (an entity-encoded ``&lt;``
    is literal text and must never be re-parsed as a tag), and
    whitespace collapsed/trimmed. Lowercase and uppercase tag names both
    match; exotic entities pass through untouched rather than guessed.

    This is the deliberately deterministic subset of extraction —
    identical input bytes give identical text on every engine, which is
    what the north rule's byte-identical-text-per-url invariant needs.
    DOM-aware readability extraction is a different (model-shaped)
    problem and belongs behind a Pandas-UDF boundary if ever added.
    """
    # [sS]cript covers the case-mix without (?i), which DuckDB's RE2
    # supports but ANSI mirrors translate inconsistently
    # (?s): script/style/comment bodies legitimately span lines; Java and
    # RE2 both accept the inline dotall flag
    t = F.regexp_replace(c, r"(?s)<[sS][cC][rR][iI][pP][tT][^>]*>.*?</[sS][cC][rR][iI][pP][tT]>", " ")
    t = F.regexp_replace(t, r"(?s)<[sS][tT][yY][lL][eE][^>]*>.*?</[sS][tT][yY][lL][eE]>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_title(c: Column) -> Column:
    """Contents of the first ``<title>`` element ('' if none), entities
    decoded, whitespace collapsed — the page-name candidate for KG node
    labels next to the anchor-text profile."""
    t = F.regexp_extract(c, r"<[tT][iI][tT][lL][eE][^>]*>(.*?)</[tT][iI][tT][lL][eE]>", 1)
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def parse_http_response(
    df: DataFrame,
    bytes_col: str = "html",
    charset: str = "utf-8",
) -> DataFrame:
    """Split raw HTTP response records (the WARC response payload shape:
    status line, CRLF headers, blank line, body) into typed columns ->
    input columns + ``(http_status int, content_type string, body
    string)``. Unparseable records get NULL status and the whole decoded
    payload as body (crawls contain garbage; dropping it silently would
    skew corpus stats).

    One decode + three regexp projections per row; headers are matched
    case-insensitively via the same class-expansion trick as
    :func:`html_to_text`. Multi-charset handling belongs upstream
    (per-record charset is a WARC-metadata concern); this decodes one
    declared charset and leaves undecodable bytes replaced.
    """
    raw = F.decode(F.col(bytes_col), charset)
    status = F.regexp_extract(raw, r"^HTTP/[0-9.]+ (\d{3})", 1)
    ctype = F.regexp_extract(
        raw, r"(?:^|\r\n)[cC][oO][nN][tT][eE][nN][tT]-[tT][yY][pP][eE]: *([^\r\n]*)", 1
    )
    # body = everything after the first blank line; '' if no header break
    body = F.regexp_replace(raw, r"(?s)^.*?\r\n\r\n", "")
    parsed = status != ""
    return df.select(
        "*",
        F.when(parsed, status.cast("int")).alias("http_status"),
        F.when(parsed & (ctype != ""), ctype).alias("content_type"),
        F.when(parsed, body).otherwise(raw).alias("body"),
    )


def parse_sitemap(
    df: DataFrame,
    xml_col: str = "xml",
    url_col: str = "url",
) -> DataFrame:
    """Exploded sitemap entries from a column of sitemap-protocol XML ->
    ``(url, kind, loc, lastmod, changefreq, priority)`` — the
    crawl-frontier feed stage between robots.txt discovery
    (:func:`ontoweaver_spark.urls.robots_filter`) and
    :func:`ontoweaver_spark.urls.frontier_plan`: a ``urlset`` document
    yields one row per ``<url>`` entry, a ``sitemapindex`` one row per
    child ``<sitemap>`` (kind tells the caller which rows to enqueue as
    pages vs fetch as further sitemaps). Missing optional fields
    (``lastmod``/``changefreq``/``priority``) are NULL; ``priority``
    stays a string (the protocol allows junk; cast at use site).

    Tags match lowercase only — the sitemaps.org schema defines
    lowercase element names, and real generators comply (unlike HTML).

    Shape: one ``regexp_extract_all`` + explode + three per-entry
    ``regexp_extract`` projections, all JVM-side RE2-safe regexes —
    zero shuffle, no Python in the row path, oracle-reproducible.
    """
    xml = F.col(xml_col)
    kind = F.when(
        xml.contains("<sitemapindex"), F.lit("sitemapindex")
    ).otherwise(F.lit("urlset"))
    entry_re = F.when(
        F.col("kind") == "sitemapindex", F.lit(r"(?s)<sitemap>(.*?)</sitemap>")
    ).otherwise(F.lit(r"(?s)<url>(.*?)</url>"))

    def field(name: str) -> Column:
        got = F.regexp_extract(F.col("_entry"), rf"(?s)<{name}>(.*?)</{name}>", 1)
        return F.nullif(F.trim(got), F.lit("")).alias(name)

    return (
        df.select(F.col(url_col).alias("url"), kind.alias("kind"), xml.alias("_x"))
        .select(
            "url", "kind",
            F.explode(F.regexp_extract_all(F.col("_x"), entry_re, F.lit(1))).alias("_entry"),
        )
        .select(
            "url", "kind", field("loc"), field("lastmod"),
            field("changefreq"), field("priority"),
        )
    )


def extract_embedded_jsonld(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Schema.org microdata harvest: pull the first
    ``<script type="application/ld+json">`` block out of each page's
    HTML and project the flat-object common case into
    ``(subject, predicate, object)`` triples — ``@id`` (falling back to
    the page url) as subject, ``@type`` as an ``a`` triple, every other
    scalar key as a property triple. THE web-KG bootstrap: schema.org
    embeds are the single richest structured-triple source on the open
    web (loaders.read_jsonld handles standalone .jsonld FILES; this is
    the in-HTML variant that runs distributed over the crawl).

    One JVM regexp + one ``from_json`` into ``map<string,string>`` —
    whole-stage-codegen end to end, no Python in the loop. Nested
    objects/arrays don't fit map<string,string> and yield null entries,
    dropped here; route those pages through a real JSON-LD expansion if
    they matter (loud by absence, not silently mangled).
    """
    html_s = F.decode(F.col(html_col), "utf-8") if dict(df.dtypes)[html_col] == "binary" \
        else F.col(html_col)
    # tolerate extra attributes (async, id=...), attribute order, single or
    # double quotes, and whitespace around '=' — real crawl HTML rarely
    # carries the exact canonical tag (first matching block only)
    block = F.regexp_extract(
        html_s,
        r'(?is)<script[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>(.*?)</script>',
        1,
    )
    parsed = df.select(
        F.col(url_col).alias("_url"),
        F.from_json(block, "map<string,string>").alias("_m"),
    ).where(F.col("_m").isNotNull())
    subj = F.coalesce(F.col("_m")["@id"], F.col("_url"))
    typed = parsed.where(F.col("_m")["@type"].isNotNull()).select(
        subj.alias("subject"), F.lit("a").alias("predicate"),
        F.col("_m")["@type"].alias("object"),
    )
    props = (
        parsed.select(subj.alias("subject"), F.explode("_m").alias("predicate", "object"))
        .where(~F.col("predicate").startswith("@") & F.col("object").isNotNull())
    )
    return typed.unionByName(props)
