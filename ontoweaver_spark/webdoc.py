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

from .textops import regex_match_structs

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


def extract_meta_tags(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """``<meta>``-tag harvest -> ``(subject, predicate, object)`` triples:
    OpenGraph (``property="og:..."``), Twitter cards and classic
    ``name=``/``content=`` metadata, subject = page url. After embedded
    JSON-LD (`extract_embedded_jsonld`) this is the second-richest
    structured-triple source in crawl HTML — most CMSes emit og:title /
    og:type / og:url on every page.

    One ``regexp_extract_all`` for the tags, one explode, two
    per-tag ``regexp_extract`` projections — whole-stage codegen, no
    Python, no shuffle. Attribute order is tolerated (``content``
    before or after ``property``/``name``); tags missing either half
    drop out (loud by absence). Multi-valued properties (repeated
    ``og:image``) each emit their own triple, order-preserving via the
    explode position.
    """
    html_expr = (
        f'decode({html_col}, "utf-8")'
        if dict(df.dtypes)[html_col] == "binary" else html_col
    )
    tags = F.expr(
        f"regexp_extract_all({html_expr}, "
        r"'(?is)<meta\\s[^>]*>', 0)"
    )
    exploded = df.select(
        F.col(url_col).alias("subject"), F.explode(tags).alias("_tag")
    )
    key = F.regexp_extract(
        F.col("_tag"),
        r'(?is)\s(?:property|name)\s*=\s*["\']([^"\']+)["\']',
        1,
    )
    val = F.regexp_extract(
        F.col("_tag"), r'(?is)\scontent\s*=\s*["\']([^"\']*)["\']', 1
    )
    for ent, rep in _ENTITIES:  # same decode order as html_to_text
        val = F.regexp_replace(val, ent, rep)
    return (
        exploded.select(
            "subject", key.alias("predicate"), val.alias("object")
        )
        .where((F.col("predicate") != "") & (F.col("object") != ""))
    )


def extract_microdata(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Schema.org MICRODATA harvest (the attribute-based sibling of the
    JSON-LD script block) -> ``(subject, predicate, object)`` triples:
    the page's first ``itemscope itemtype="..."`` becomes an ``a``
    triple, and every ``itemprop="k"`` tag becomes a property triple —
    value from ``content=`` when present (meta/link style), else the
    tag's immediate text (``<span itemprop=...>text<``). Subject is the
    page url.

    Flat subset by design: NESTED itemscopes are not scoped (their
    itemprops attach to the page subject) — the documented residue,
    mirroring `extract_embedded_jsonld`'s flat-object bound; route
    pages needing full microdata nesting through a DOM parser offline.
    Chain is regexp_extract_all + explode + three regexp_extracts —
    JVM-only, zero shuffle.
    """
    html_expr = (
        f'decode({html_col}, "utf-8")'
        if dict(df.dtypes)[html_col] == "binary" else html_col
    )
    html_s = F.expr(html_expr)
    itemtype = F.regexp_extract(
        html_s,
        r'(?is)\bitemscope\b[^>]*\bitemtype\s*=\s*["\']([^"\']+)["\']',
        1,
    )
    typed = df.select(
        F.col(url_col).alias("subject"),
        F.lit("a").alias("predicate"),
        itemtype.alias("object"),
    ).where(F.col("object") != "")
    # one tag (+ optional immediate text run) per itemprop occurrence
    tags = F.expr(
        f"regexp_extract_all({html_expr}, "
        r"'(?is)<[a-z][^>]*\\bitemprop\\s*=[^>]*>[^<]*', 0)"
    )
    exploded = df.select(
        F.col(url_col).alias("subject"), F.explode(tags).alias("_tag")
    )
    prop = F.regexp_extract(
        F.col("_tag"), r'(?is)\bitemprop\s*=\s*["\']([^"\']+)["\']', 1
    )
    content_attr = F.regexp_extract(
        F.col("_tag"), r'(?is)\bcontent\s*=\s*["\']([^"\']*)["\']', 1
    )
    text_run = F.trim(F.regexp_extract(F.col("_tag"), r">([^<]*)$", 1))
    value = F.when(content_attr != "", content_attr).otherwise(text_run)
    for ent, rep in _ENTITIES:  # same decode order as html_to_text
        value = F.regexp_replace(value, ent, rep)
    props = exploded.select(
        "subject",
        prop.alias("predicate"),
        value.alias("object"),
    ).where((F.col("predicate") != "") & (F.col("object") != ""))
    return typed.unionByName(props)


def extract_html_tables(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """WebTables-style relational harvest (Cafarella et al., VLDB'08):
    pull each page's FIRST ``<table>`` and emit one row per body cell,
    ``(url, row_idx, col_idx, header, cell)`` — header joined in from
    the table's first row, so each cell arrives as the
    (attribute, value) pair a KG mapping consumes directly (feed the
    result to `weave` with header->predicate mapping for instant
    table-to-triples).

    Plan: regexp for the table block, ``regexp_extract_all`` rows
    (``<tr``), posexplode, ``regexp_extract_all`` cells (``<td``/
    ``<th``), posexplode, then one BROADCAST join of the header row
    back onto body cells by col_idx — the header frame is one row per
    (page, column), dictionary-sized relative to the cells. Tags inside
    cells are stripped, entities decoded with the shared table. Pages
    with no table vanish (loud by absence).
    """
    html_expr = (
        f'decode({html_col}, "utf-8")'
        if dict(df.dtypes)[html_col] == "binary" else html_col
    )
    block = F.regexp_extract(
        F.expr(html_expr), r"(?is)<table[^>]*>(.*?)</table>", 1
    )
    rows = df.select(
        F.col(url_col).alias("url"),
        F.expr(
            # row bodies: content of each <tr>...</tr>
            f"regexp_extract_all(regexp_extract({html_expr}, "
            r"'(?is)<table[^>]*>(.*?)</table>', 1), "
            r"'(?is)<tr[^>]*>(.*?)</tr>', 1)"
        ).alias("_rows"),
    ).select("url", F.posexplode("_rows").alias("row_idx", "_row"))
    cells = rows.select(
        "url",
        "row_idx",
        F.expr(
            r"regexp_extract_all(_row, '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1)"
        ).alias("_cells"),
    ).select(
        "url", "row_idx", F.posexplode("_cells").alias("col_idx", "_cell")
    )
    clean = F.trim(F.regexp_replace(F.col("_cell"), r"(?is)<[^>]+>", " "))
    for ent, rep in _ENTITIES:
        clean = F.regexp_replace(clean, ent, rep)
    cells = cells.select(
        "url", "row_idx", "col_idx", F.regexp_replace(clean, r"\s+", " ").alias("cell")
    )
    header = (
        cells.where(F.col("row_idx") == 0)
        .select("url", "col_idx", F.col("cell").alias("header"))
    )
    return (
        cells.where(F.col("row_idx") > 0)
        .join(F.broadcast(header), ["url", "col_idx"], "left")
        .select("url", "row_idx", "col_idx", "header", "cell")
    )


def table_rows_to_frame(
    cells: DataFrame,
    headers: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Pivot :func:`extract_html_tables` cell rows back into a columnar
    frame -> ``(url, row_idx, <one column per requested header>)`` — the
    bridge from relational web harvest to the declarative mapping
    engine: feed the result straight to ``weave`` and a page's table
    rows become typed KG nodes/edges (the WebTables-to-KG path).

    ``headers`` is DECLARED, not discovered: schema-on-read like every
    loader here, so the plan is fixed at build time and the pivot is one
    groupBy(url, row_idx) with one max(when(header=h)) aggregate per
    column — map-side combinable, no second discovery scan, no driver
    collect. Headers a page lacks come back null (mapping validation
    decides whether that's an error); extra harvested columns drop.
    """
    aggs = [
        F.max(F.when(F.col("header") == h, F.col("cell"))).alias(h)
        for h in headers
    ]
    return cells.groupBy(F.col(url_col).alias("url"), "row_idx").agg(*aggs)


def infer_table_column_types(
    cells: DataFrame,
    min_ratio_ppm: int = 600_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Column-type inference over :func:`extract_html_tables` cells ->
    one row per ``(url, col_idx)``: ``(url, col_idx, header, n_cells,
    n_int, n_dec, n_date, n_empty, inferred_type)`` — the WebTables
    schema-detection step (Cafarella VLDB'08 §4) between raw harvest
    and a typed mapping: a column is numeric/date only when the harvest
    agrees often enough, junk rows vote it back to string.

    Cell classes (anchored RE2 regexes, both-engine safe):
    integer ``^-?[0-9]+$``, decimal ``^-?[0-9]+[.,][0-9]+$``, date
    ``^[0-9]{4}-[0-9]{2}-[0-9]{2}$``; empty cells are counted but vote
    for nothing. Decision on NON-empty counts, exact ppm thresholds,
    fixed precedence: ``decimal`` when ints+decimals clear the
    threshold and at least one true decimal exists, else ``integer``,
    else ``date``, else ``string``. One groupBy(url, col_idx) with
    map-side partials — column-count-bounded output, no windows.
    """
    c = F.col("cell")
    is_int = c.rlike(r"^-?[0-9]+$")
    is_dec = c.rlike(r"^-?[0-9]+[.,][0-9]+$")
    is_date = c.rlike(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
    agg = cells.groupBy("url", "col_idx").agg(
        F.min("header").alias("header"),
        F.count("*").alias("n_cells"),
        F.sum(is_int.cast("long")).alias("n_int"),
        F.sum(is_dec.cast("long")).alias("n_dec"),
        F.sum(is_date.cast("long")).alias("n_date"),
        F.sum((c == "").cast("long")).alias("n_empty"),
    )
    nn = F.col("n_cells") - F.col("n_empty")
    ratio = lambda col: F.when(nn > 0, col * scale / nn).otherwise(F.lit(0))
    num_ok = F.when(
        nn > 0, (F.col("n_int") + F.col("n_dec")) * F.lit(scale) >= F.lit(min_ratio_ppm) * nn
    ).otherwise(F.lit(False))
    date_ok = F.when(
        nn > 0, F.col("n_date") * F.lit(scale) >= F.lit(min_ratio_ppm) * nn
    ).otherwise(F.lit(False))
    inferred = (
        F.when(num_ok & (F.col("n_dec") > 0), F.lit("decimal"))
        .when(num_ok, F.lit("integer"))
        .when(date_ok, F.lit("date"))
        .otherwise(F.lit("string"))
    )
    return agg.select(
        "url", "col_idx", "header", "n_cells", "n_int", "n_dec",
        "n_date", "n_empty", inferred.alias("inferred_type")
    )

# --------------------------------------------------------------------------
# Hearst-pattern hypernym extraction: is-a triples from raw sentence text
# --------------------------------------------------------------------------

# The shared comma-list shape: "a, b, c and d" / "a or b" / a bare word.
# Strictly inside the Java-regex ∩ RE2 intersection (no lookaround, no
# backrefs) so the DuckDB oracle runs the byte-identical pattern.
_HEARST_LIST = r"[a-z]+(?:, [a-z]+)*(?:,? (?:and|or) [a-z]+)?"

# name -> (pattern, hypernym_group, list_group). The five classic Hearst
# (COLING 1992) lexico-syntactic patterns over single-word noun proxies.
HEARST_PATTERNS: dict[str, tuple[str, int, int]] = {
    "such_as": (rf"\b([a-z]+) such as ({_HEARST_LIST})", 1, 2),
    "such_x_as": (rf"\bsuch ([a-z]+) as ({_HEARST_LIST})", 1, 2),
    "and_other": (rf"\b({_HEARST_LIST}),? (?:and|or) other ([a-z]+)", 2, 1),
    "including": (rf"\b([a-z]+),? including ({_HEARST_LIST})", 1, 2),
    "especially": (rf"\b([a-z]+),? especially ({_HEARST_LIST})", 1, 2),
}

_HEARST_SEP = r", |,? (?:and|or) "

# list members that are grammar, not nouns, in these frames
_HEARST_DROP = ["other", "others", "more", "such"]


def hearst_hypernyms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
    patterns: dict[str, tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Hearst-pattern hypernym extraction -> ``(id, hyponym, hypernym,
    pattern)`` distinct rows: the classic lexico-syntactic is-a bootstrap
    (Hearst, COLING 1992) that turns raw crawl sentences into
    ``subclass_of`` candidate triples — the text-side complement of the
    markup harvesters (:func:`extract_embedded_jsonld` /
    :func:`extract_microdata`), feeding the same
    ``ontology.graph_from_triples`` bridge and ``onto_closure``. The
    reference consumes ontologies as given (src/ontoweaver/ontology
    handling); bootstrapping one FROM the corpus is the 10^12-page
    problem this engine exists for.

    Five patterns over a deliberately deterministic noun proxy
    (single lowercase words): ``X such as A, B and C`` / ``such X as A
    or B`` / ``A, B and other X`` / ``X, including A, B`` / ``X,
    especially A``. Known residue, documented not guessed: a clause
    after a comma can be absorbed into a greedy list ("browsers,
    especially chrome, dominate" -> hyponym "dominate"), and multi-word
    noun phrases are out of scope — precision filtering is downstream's
    job (claim voting / SHACL gates), recall per pattern is exact.

    Scale shape: ONE zero-shuffle projection per row builds ALL
    patterns' matches (``zip_with`` of two group-extractions per
    pattern, concatenated, ONE explode), then a member-level explode and
    the closing ``distinct`` — the only shuffle. Regex engines never
    leave the JVM; every construct used is in the Java∩RE2 intersection
    (the scrub_pii discipline), so the oracle is byte-identical.
    """
    pats = patterns or HEARST_PATTERNS
    t = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")

    per_pattern = [
        regex_match_structs(
            t, p, [("head", hg), ("lst", lg)], consts=(("pattern", name),)
        )
        for name, (p, hg, lg) in pats.items()
    ]
    matches = df.select(
        F.col(id_col), F.explode(F.concat(*per_pattern)).alias("m")
    )
    out = matches.select(
        id_col,
        F.explode(F.split("m.lst", _HEARST_SEP)).alias("hyponym"),
        F.col("m.head").alias("hypernym"),
        F.col("m.pattern").alias("pattern"),
    ).where(
        (F.length("hyponym") >= min_len)
        & (F.length("hypernym") >= min_len)
        & (F.col("hyponym") != F.col("hypernym"))
        & ~F.col("hyponym").isin(_HEARST_DROP)
        & ~F.col("hypernym").isin(_HEARST_DROP)
    )
    return out.distinct()


# --------------------------------------------------------------------------
# Meronym (part-whole) pattern extraction: part-of triples from sentence text
# --------------------------------------------------------------------------

# name -> (pattern, whole_group, parts_list_group). Conservative part-whole
# frames (Berland & Charniak ACL'99 / Girju et al. ACL'03) over the same
# single-word proxies and Java∩RE2 comma-list shape as HEARST_PATTERNS, so
# the DuckDB oracle runs the byte-identical regexes.
MERONYM_PATTERNS: dict[str, tuple[str, int, int]] = {
    "consists_of": (rf"\b([a-z]+) consists of ({_HEARST_LIST})", 1, 2),
    "composed_of": (rf"\b([a-z]+) (?:is|are) composed of ({_HEARST_LIST})", 1, 2),
    "contains": (rf"\b([a-z]+) contains ({_HEARST_LIST})", 1, 2),
    "part_of": (rf"\b({_HEARST_LIST}) (?:is|are) parts? of (?:the |a |an )?([a-z]+)", 2, 1),
    "member_of": (rf"\b({_HEARST_LIST}) (?:is|are) (?:a |an )?members? of (?:the |a |an )?([a-z]+)", 2, 1),
}

# frame grammar words that would otherwise leak in as arguments
_MERONYM_DROP = _HEARST_DROP + ["part", "parts", "member", "members"]


def meronym_parts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Meronym-pattern part-whole extraction -> ``(id, part, whole,
    pattern)`` distinct rows: the part-of complement of
    :func:`hearst_hypernyms` (is-a), bootstrapping ``part_of`` candidate
    triples from raw crawl sentences for the same
    ``ontology.graph_from_triples`` bridge. The reference consumes
    ontologies as given (src/ontoweaver/ontology handling); harvesting
    the mereology FROM the corpus is engine-side superset surface.

    Five frames: ``Y consists of A, B and C`` / ``Y is composed of A and
    B`` / ``Y contains A, B`` / ``A, B are parts of Y`` / ``A is a
    member of Y``. Same documented residue as the Hearst extractor
    (greedy comma-lists can absorb a preceding clause; multi-word noun
    phrases out of scope — precision filtering is downstream's job),
    and the same scale shape: the whole extraction is the generic
    zero-shuffle Hearst projection (ONE concat of zip_with matches, ONE
    explode) with the closing ``distinct`` as the only shuffle.
    """
    out = hearst_hypernyms(
        df, text_col=text_col, id_col=id_col, min_len=min_len,
        patterns=MERONYM_PATTERNS,
    )
    return (
        out.withColumnRenamed("hyponym", "part")
        .withColumnRenamed("hypernym", "whole")
        .where(
            ~F.col("part").isin(_MERONYM_DROP)
            & ~F.col("whole").isin(_MERONYM_DROP)
        )
    )


def qualify_with_first_date(
    facts: DataFrame,
    dates: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temporal qualification of harvested facts -> the fact frame plus
    ``first_seen_day``: joins each fact row to the EARLIEST normalized
    epoch day mentioned in its source document (from
    :func:`~ontoweaver_spark.textops.extract_dates`), the standard
    provenance qualifier of a web-harvested triple (first-seen drives
    freshness scoring and claim-voting tie-breaks). Facts from docs with
    no parseable date are dropped — an un-datable fact has no place in a
    temporal KG slice; keep the unqualified frame for the rest.

    Scale shape: the date frame aggregates to one row per document
    BEFORE the join (map-side partial min), so the join is
    doc-cardinality on both sides and co-partitions on the same key the
    fact extraction already grouped by. Nothing collects.
    """
    first = dates.groupBy(id_col).agg(
        F.min("epoch_day").alias("first_seen_day")
    )
    return facts.join(first, id_col)


# --------------------------------------------------------------------------
# Acronym / long-form pair extraction (Schwartz & Hearst, PSB 2003)
# --------------------------------------------------------------------------

# "world health organization (who)" — 2-6 single-space words followed by a
# parenthesized 2-6-letter token. Java∩RE2∩DuckDB-safe; the initials test
# happens in-plan, not in the regex.
ACRONYM_PATTERN = r"\b((?:[a-z]+ ){2,6})\(([a-z]{2,6})\)"


def acronym_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Acronym definition harvest -> distinct ``(doc_id, short_form,
    long_form)``: the Schwartz–Hearst (PSB 2003) "long form (SF)"
    convention, simplified to its exact-match core — a parenthesized
    2-6-letter token whose letters are the initials of the immediately
    preceding words. The emitted pairs are the alias table entity
    resolution runs on (``who`` ≡ ``world health organization``), the
    same role as ``owl:sameAs`` but bootstrapped from raw text.

    Deliberately deterministic subset, documented not guessed: the full
    Schwartz–Hearst inner-letter backtracking (``SF`` letters matching
    non-initial characters) is out of scope; case is folded first so
    the signal is the parenthesization, not capitalization. Precision
    filtering is downstream's job (claim voting / blocking metrics).

    Scale shape: ONE zero-shuffle projection (two group extractions
    zipped, one explode), then per-row array ops (slice/transform/join
    — all in-codegen); the closing ``distinct`` is the only shuffle.
    """
    t = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    zipped = regex_match_structs(
        t, ACRONYM_PATTERN, [("lf", 1), ("sf", 2)]
    )
    m = df.select(
        F.col(id_col).alias("doc_id"), F.explode(zipped).alias("x")
    ).select(
        "doc_id",
        F.split(F.trim(F.col("x.lf")), " ").alias("ws"),
        F.col("x.sf").alias("short_form"),
    )
    n = F.length("short_form")
    tail = F.slice(F.col("ws"), F.size("ws") - n + 1, n)
    initials = F.array_join(
        F.transform(tail, lambda w: F.substring(w, 1, 1)), ""
    )
    return (
        m.where(F.size("ws") >= n)
        .where(initials == F.col("short_form"))
        .select(
            "doc_id", "short_form",
            F.array_join(tail, " ").alias("long_form"),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# Breadcrumb-trail taxonomy harvest: broader-than edges from site navigation
# --------------------------------------------------------------------------

# the first breadcrumb-classed container; non-greedy to ANY closing tag of
# the container kinds (no backreference — the pattern must sit in the
# Java∩RE2 intersection so the DuckDB oracle is byte-identical, and RE2 has
# no backrefs). Residue, documented not guessed: a NESTED <div> inside the
# container truncates the trail at that close — real breadcrumb markup is
# flat <li><a> lists, and truncation only ever drops tail crumbs, never
# invents pairs.
BREADCRUMB_CONTAINER = (
    r'(?is)<(?:nav|ol|ul|div)[^>]*class\s*=\s*["\'][^"\']*breadcrumb'
    r'[^"\']*["\'][^>]*>(.*?)</(?:nav|ol|ul|div)>'
)
BREADCRUMB_ANCHOR = r"(?is)<a[^>]*>([^<]+)</a>"


def breadcrumb_trails(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
) -> DataFrame:
    """Breadcrumb-navigation harvest -> distinct ``(id, child, parent,
    child_pos)`` broader-than edges: the site-taxonomy complement of the
    sentence-level :func:`hearst_hypernyms` — `Home > Electronics >
    Phones` markup is how 10^12 crawled pages declare their OWN category
    hierarchy, and consecutive trail items are (narrower, broader)
    candidate pairs feeding the same ``ontology.graph_from_triples`` /
    ``onto_closure`` machinery. The reference consumes ontologies as
    given (src/ontoweaver/ontology handling); mining one from crawl
    navigation is the web-scale bootstrap.

    Semantics: the FIRST breadcrumb-classed container (nav/ol/ul/div
    whose ``class`` contains ``breadcrumb``) is taken; its anchor texts
    in document order form the trail; each consecutive pair emits one
    row with ``child_pos`` = 1-based trail index of the narrower item.
    Anchor text is entity-decoded (same ``_ENTITIES`` order as
    :func:`html_to_text`) and trimmed; whitespace-only crumbs drop the
    pair. Separator-text breadcrumbs without anchors (`A › B` as plain
    text) are out of scope — markup-free trails have no deterministic
    boundary.

    Scale shape: ONE zero-shuffle projection per page (container
    extract, anchor regexp_extract_all, per-row slice/zip — all
    in-codegen JVM); the closing ``distinct`` is the only shuffle.
    Every regex construct is in the Java∩RE2 intersection.
    """
    html_expr = (
        f'decode({html_col}, "utf-8")'
        if dict(df.dtypes)[html_col] == "binary" else html_col
    )
    inner = F.regexp_extract(F.expr(html_expr), BREADCRUMB_CONTAINER, 1)

    def _clean(c: Column) -> Column:
        for ent, rep in _ENTITIES:
            c = F.regexp_replace(c, ent, rep)
        return F.trim(c)

    crumbs = F.transform(
        F.regexp_extract_all(inner, F.lit(BREADCRUMB_ANCHOR), 1), _clean
    )
    # pages with 0 or 1 crumbs must slice length 0, never -1
    n = F.greatest(F.size(crumbs) - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice(crumbs, F.lit(2), n),
        F.slice(crumbs, F.lit(1), n),
        lambda c, p: F.struct(c.alias("child"), p.alias("parent")),
    )
    out = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(pairs).alias("_pos", "x"),
    ).select(
        "id",
        F.col("x.child").alias("child"),
        F.col("x.parent").alias("parent"),
        (F.col("_pos") + F.lit(2)).cast("bigint").alias("child_pos"),
    ).where((F.col("child") != "") & (F.col("parent") != ""))
    return out.distinct()


# Copula is-a frames: the highest-volume (and noisiest) is-a signal on the
# web — "X is a Y" / "X is a kind/type/sort of Y". Same (pattern,
# hypernym_group, list_group) contract as HEARST_PATTERNS so
# hearst_hypernyms runs them unchanged; the single-member "list" is a
# degenerate _HEARST_LIST. Precision is deliberately downstream's job
# (triple_support / claim voting) — the frame fires on auxiliary uses too
# ("X is a member of ...") and that residue is identical on both engines.
COPULA_PATTERNS: dict[str, tuple[str, int, int]] = {
    "is_a": (r"\b([a-z]+) is (?:a|an) ([a-z]+)", 2, 1),
    "kind_of": (
        r"\b([a-z]+) is (?:a |an )?(?:kind|type|sort) of ([a-z]+)", 2, 1
    ),
}

# auxiliary/grammar words the copula frames must never emit as nouns
_COPULA_DROP = _HEARST_DROP + [
    "kind", "type", "sort", "one", "not", "also", "very", "just",
]


def copula_isa(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Copula is-a harvest -> distinct ``(doc_id, hyponym, hypernym,
    pattern)``: "X is a Y" is an order of magnitude more frequent than
    any classic Hearst frame on real crawl text — the recall arm of the
    is-a bootstrap, with :func:`triple_support` as the precision gate.
    Runs on the exact :func:`hearst_hypernyms` machinery (one
    zero-shuffle projection, one explode, closing distinct) with the
    copula frames and a copula-specific stoplist."""
    out = hearst_hypernyms(
        df, text_col=text_col, id_col=id_col, min_len=min_len,
        patterns=COPULA_PATTERNS,
    )
    return out.where(
        ~F.col("hyponym").isin(_COPULA_DROP)
        & ~F.col("hypernym").isin(_COPULA_DROP)
    )


# --------------------------------------------------------------------------
# RDFa-lite harvest: the attribute-vocabulary third of the embedded-data trio
# --------------------------------------------------------------------------


def extract_rdfa(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """RDFa-lite harvest -> ``(subject, predicate, object)`` triples:
    the W3C attribute-based sibling of microdata and JSON-LD — the page's
    first ``typeof="..."`` becomes an ``a`` triple and every
    ``property="k"`` tag a property triple, value from ``content=`` when
    present else the tag's immediate text run. Completes the embedded
    structured-data trio (:func:`extract_embedded_jsonld` /
    :func:`extract_microdata` / this), so a crawl harvester covers all
    three schema.org carriers with the same flat-triple output feeding
    ``ontology.graph_from_triples``. Reference analog: none (the
    reference maps tabular inputs, src/ontoweaver/tabular.py).

    Flat subset by design, mirroring the microdata bound: ``about=`` /
    ``resource=`` scoping and ``vocab=``/``prefix=`` CURIE expansion are
    not resolved — predicates stay verbatim (``schema:name`` or full
    IRI), nested subjects attach to the page url. OpenGraph ``<meta
    property=...>`` tags ARE RDFa and intentionally surface here too.
    Chain is regexp_extract_all + explode + per-tag extracts — JVM-only
    whole-stage codegen, zero shuffle.
    """
    html_expr = (
        f'decode({html_col}, "utf-8")'
        if dict(df.dtypes)[html_col] == "binary" else html_col
    )
    html_s = F.expr(html_expr)
    typeof = F.regexp_extract(
        html_s, r'(?is)\btypeof\s*=\s*["\']([^"\']+)["\']', 1
    )
    typed = df.select(
        F.col(url_col).alias("subject"),
        F.lit("a").alias("predicate"),
        typeof.alias("object"),
    ).where(F.col("object") != "")
    tags = F.expr(
        f"regexp_extract_all({html_expr}, "
        r"'(?is)<[a-z][^>]*\\bproperty\\s*=[^>]*>[^<]*', 0)"
    )
    exploded = df.select(
        F.col(url_col).alias("subject"), F.explode(tags).alias("_tag")
    )
    prop = F.regexp_extract(
        F.col("_tag"), r'(?is)\bproperty\s*=\s*["\']([^"\']+)["\']', 1
    )
    content_attr = F.regexp_extract(
        F.col("_tag"), r'(?is)\bcontent\s*=\s*["\']([^"\']*)["\']', 1
    )
    text_run = F.trim(F.regexp_extract(F.col("_tag"), r">([^<]*)$", 1))
    value = F.when(content_attr != "", content_attr).otherwise(text_run)
    for ent, rep in _ENTITIES:  # same decode order as html_to_text
        value = F.regexp_replace(value, ent, rep)
    props = exploded.select(
        "subject",
        prop.alias("predicate"),
        value.alias("object"),
    ).where((F.col("predicate") != "") & (F.col("object") != ""))
    return typed.unionByName(props)


# --------------------------------------------------------------------------
# <link rel=...> page-relation edges: canonical / hreflang alternates / pagination
# --------------------------------------------------------------------------


def link_rel_edges(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """``<link rel=...>`` harvest -> ``(url, rel, href, hreflang)`` page
    relations: ``rel=canonical`` is the site's own duplicate-cluster
    declaration (feeds :func:`urls.canonical_url` dedup and the
    ``owl:sameAs`` canonicalizer as high-precision same-entity edges),
    ``rel=alternate hreflang=..`` links the page's translations (the
    cross-language sameAs bootstrap), ``prev``/``next`` stitch paginated
    listings. Reference analog: none — this is crawl-native signal.

    Semantics: every ``<link ...>`` tag in the page; multi-valued
    ``rel="alternate amphtml"`` emits one row per whitespace-separated
    token, rel lowercased (attribute values are case-insensitive per
    spec); ``href`` entity-decoded (query strings carry ``&amp;``) and
    trimmed; ``hreflang`` empty string when absent. Tags missing rel or
    href drop out (loud by absence).

    Scale shape: one regexp_extract_all + explode for the tags, one more
    explode for rel tokens, per-tag extracts — zero shuffle, JVM-only.
    """
    html_expr = (
        f'decode({html_col}, "utf-8")'
        if dict(df.dtypes)[html_col] == "binary" else html_col
    )
    tags = F.expr(
        f"regexp_extract_all({html_expr}, "
        r"'(?is)<link\\s[^>]*>', 0)"
    )
    exploded = df.select(
        F.col(url_col).alias("url"), F.explode(tags).alias("_tag")
    )
    rel = F.lower(F.regexp_extract(
        F.col("_tag"), r'(?is)\brel\s*=\s*["\']([^"\']+)["\']', 1
    ))
    href = F.regexp_extract(
        F.col("_tag"), r'(?is)\bhref\s*=\s*["\']([^"\']+)["\']', 1
    )
    for ent, rep in _ENTITIES:  # same decode order as html_to_text
        href = F.regexp_replace(href, ent, rep)
    hreflang = F.lower(F.regexp_extract(
        F.col("_tag"), r'(?is)\bhreflang\s*=\s*["\']([^"\']+)["\']', 1
    ))
    return (
        exploded.select(
            "url",
            F.explode(F.split(rel, r"\s+")).alias("rel"),
            F.trim(href).alias("href"),
            hreflang.alias("hreflang"),
        )
        .where((F.col("rel") != "") & (F.col("href") != ""))
    )


# --------------------------------------------------------------------------
# "also known as" alias frames: the free-text synonym feed for ER
# --------------------------------------------------------------------------

# name -> (pattern, name_group, alias_list_group): same contract as
# HEARST_PATTERNS so hearst_hypernyms runs them unchanged. The alias list
# reuses the comma-list shape ("x, also known as y, z or w").
ALIAS_PATTERNS: dict[str, tuple[str, int, int]] = {
    "aka": (
        rf"\b([a-z]+), (?:also|better|formerly) known as ({_HEARST_LIST})",
        1, 2,
    ),
    "aka_paren": (r"\b([a-z]+) \(aka ([a-z]+)\)", 1, 2),
    "or_simply": (rf"\b([a-z]+), or simply ({_HEARST_LIST})", 1, 2),
}


def aka_aliases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Alias-frame harvest -> distinct ``(doc_id, name, alias, pattern)``:
    "X, also known as Y" / "X (aka Y)" / "X, or simply Y" — the free-text
    synonym signal that feeds the same ER alias table as the
    Schwartz–Hearst :func:`acronym_pairs`, giving entity resolution its
    surface-form variants without any curated gazetteer. Runs on the
    exact :func:`hearst_hypernyms` machinery (one zero-shuffle
    projection, one explode, closing distinct) with the alias frames;
    output columns renamed to the alias-table vocabulary."""
    out = hearst_hypernyms(
        df, text_col=text_col, id_col=id_col, min_len=min_len,
        patterns=ALIAS_PATTERNS,
    )
    return out.select(
        id_col,
        F.col("hypernym").alias("name"),
        F.col("hyponym").alias("alias"),
        "pattern",
    )


# --------------------------------------------------------------------------
# Definition-list harvest: <dl><dt>key</dt><dd>value</dd> spec sheets
# --------------------------------------------------------------------------

# adjacent dt/dd pairs with plain-text contents; inline markup inside
# either tag is the documented residue (the pair drops — [^<]+ refuses it)
DT_DD_PATTERN = r"(?is)<dt[^>]*>([^<]+)</dt>\s*<dd[^>]*>([^<]+)</dd>"


def definition_pairs(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Definition-list harvest -> distinct ``(url, key, value,
    pair_pos)``: ``<dl><dt>Brand</dt><dd>Acme</dd>...`` is how product
    pages, package registries and wikis publish their spec sheets — the
    page-declared property table that complements the prose harvesters,
    feeding the same (subject=url, predicate=key, object=value) triple
    bridge as :func:`extract_meta_tags`. Reference analog: none.

    Semantics: every ADJACENT ``<dt>k</dt><dd>v</dd>`` pair in the page
    (whitespace between them tolerated), in document order
    (``pair_pos`` 1-based); keys/values entity-decoded (same
    ``_ENTITIES`` order as :func:`html_to_text`) and trimmed; pairs
    where either side has inline child markup drop out — the documented
    plain-text bound shared with :func:`extract_html_tables`.

    Scale shape: two group-extractions zipped per row (the
    hearst_hypernyms gh/gl idiom), ONE posexplode, closing distinct —
    the only shuffle. Java∩RE2-safe regex throughout.
    """
    html_expr = (
        f'decode({html_col}, "utf-8")'
        if dict(df.dtypes)[html_col] == "binary" else html_col
    )
    html_s = F.expr(html_expr)

    def _clean(c: Column) -> Column:
        for ent, rep in _ENTITIES:
            c = F.regexp_replace(c, ent, rep)
        return F.trim(c)

    pairs = F.transform(
        regex_match_structs(html_s, DT_DD_PATTERN, [("k", 1), ("v", 2)]),
        lambda x: F.struct(
            _clean(x["k"]).alias("key"), _clean(x["v"]).alias("value")
        ),
    )
    out = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(pairs).alias("_pos", "x"),
    ).select(
        "url",
        F.col("x.key").alias("key"),
        F.col("x.value").alias("value"),
        (F.col("_pos") + F.lit(1)).cast("bigint").alias("pair_pos"),
    ).where((F.col("key") != "") & (F.col("value") != ""))
    return out.distinct()


# --------------------------------------------------------------------------
# Contrast frames and co-hyponym siblings: taxonomy-cleanup signals
# --------------------------------------------------------------------------

# name -> (pattern, term_group, contrast_list_group): the discriminative
# complement of the is-a frames — "X, unlike Y" asserts the two are
# DIFFERENT things, the signal that prunes wrong sameAs/alias merges.
CONTRAST_PATTERNS: dict[str, tuple[str, int, int]] = {
    "unlike": (rf"\b([a-z]+), unlike ({_HEARST_LIST})", 1, 2),
    "rather_than": (r"\b([a-z]+) rather than ([a-z]+)", 1, 2),
    "as_opposed": (rf"\b([a-z]+),? as opposed to ({_HEARST_LIST})", 1, 2),
}


def contrast_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Contrast-frame harvest -> distinct ``(doc_id, term, contrast,
    pattern)``: "X, unlike Y" / "X rather than Y" / "X as opposed to Y"
    assert that two surface forms are NOT the same thing — the negative
    evidence that vetoes bad ``owl:sameAs`` / alias merges the positive
    harvesters (:func:`aka_aliases`, :func:`acronym_pairs`) propose.
    Runs on the exact :func:`hearst_hypernyms` machinery (one
    zero-shuffle projection, one explode, closing distinct); columns
    renamed to the contrast vocabulary."""
    out = hearst_hypernyms(
        df, text_col=text_col, id_col=id_col, min_len=min_len,
        patterns=CONTRAST_PATTERNS,
    )
    return out.select(
        id_col,
        F.col("hypernym").alias("term"),
        F.col("hyponym").alias("contrast"),
        "pattern",
    )


def cohyponym_pairs(
    harvest: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Co-hyponym sibling pairs from a Hearst-style harvest frame ->
    distinct ``(doc_id, a, b, hypernym, pattern)`` with ``a < b``:
    members of the same enumeration ("fruits such as apples, pears and
    quinces") are SIBLINGS under the shared hypernym — the lateral
    taxonomy edges that let cluster-based taxonomy induction (and ER
    blocking) see "apples ~ pears" even where no direct frame relates
    them. Input is :func:`hearst_hypernyms` output (or any frame with
    ``(id, hyponym, hypernym, pattern)``).

    Scale shape: ONE self-join keyed on ``(doc, hypernym, pattern)`` —
    per-key cardinality is the sentence's list length (single digits by
    construction of the frames), so the join output is O(m · k²) with
    tiny k and no hub keys; the ``a < b`` canonical order halves it and
    the closing distinct is the only extra shuffle."""
    left = harvest.select(
        id_col, "hypernym", "pattern", F.col("hyponym").alias("a")
    )
    right = harvest.select(
        id_col, "hypernym", "pattern", F.col("hyponym").alias("b")
    )
    return (
        left.join(right, [id_col, "hypernym", "pattern"])
        .where(F.col("a") < F.col("b"))
        .select(id_col, "a", "b", "hypernym", "pattern")
        .distinct()
    )


# --------------------------------------------------------------------------
# Appositive relations, quote attribution, numeric has-of facts
# --------------------------------------------------------------------------

# relational-noun apposition: "paris, the capital of france" — subject,
# relation noun, object in one frame; the richest single-sentence typed-
# relation signal after the copula.
APPOSITIVE_PATTERN = r"\b([a-z]+), the ([a-z]+) of ([a-z]+)"


def appositive_relations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Appositive relational-noun harvest -> distinct ``(doc_id,
    subject, relation, object)``: "X, the Y of Z" yields the typed
    triple (X, Y, Z) — "paris, the capital of france" -> (paris,
    capital, france). Unlike the is-a/part-of frames this one carries an
    OPEN relation vocabulary (whatever relational noun the page used),
    which is exactly what populates the predicate space of a bootstrapped
    web KG; :func:`ontoweaver_spark.ontology.triple_support` is the
    documented precision gate downstream.

    Scale shape: the standard harvest projection — three
    group-extractions zipped per row, ONE explode, closing ``distinct``
    as the only shuffle; Java∩RE2-safe regex."""
    t = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    zipped = regex_match_structs(
        t, APPOSITIVE_PATTERN, [("s", 1), ("r", 2), ("o", 3)]
    )
    out = df.select(
        F.col(id_col), F.explode(zipped).alias("x")
    ).select(
        id_col,
        F.col("x.s").alias("subject"),
        F.col("x.r").alias("relation"),
        F.col("x.o").alias("object"),
    ).where(
        (F.length("subject") >= min_len)
        & (F.length("relation") >= min_len)
        & (F.length("object") >= min_len)
        & (F.col("subject") != F.col("object"))
        & ~F.col("subject").isin(_HEARST_DROP)
        & ~F.col("relation").isin(_HEARST_DROP)
        & ~F.col("object").isin(_HEARST_DROP)
    )
    return out.distinct()


# quote-then-speaker and speaker-then-quote; quotes bounded to 400 chars
# (runaway unbalanced quotes must not absorb the document). Case is
# PRESERVED — speaker surface forms are ER input, lowercasing loses them.
QUOTE_PATTERNS: dict[str, tuple[str, int, int]] = {
    "quote_said": (r'"([^"]{2,400})," (?:said|says) ([A-Za-z]+)', 2, 1),
    "said_quote": (r'\b([A-Za-z]+) (?:said|says), "([^"]{2,400})"', 1, 2),
}


def quote_attributions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quotation-attribution harvest -> distinct ``(doc_id, speaker,
    quote, pattern)``: '"...," said X' / 'X said, "..."' — the claim
    PROVENANCE signal: who asserted what, feeding the same claim-voting
    / truth-finding operators that reconcile conflicting harvested
    facts. Case-preserving (speaker surface forms are ER input);
    whitespace inside quotes collapsed with the corpus-wide rule so the
    oracle is byte-identical.

    Scale shape: two group-extractions zipped per pattern, concatenated,
    ONE explode; closing ``distinct`` is the only shuffle."""
    t = F.regexp_replace(F.col(text_col), r"\s+", " ")

    per_pattern = [
        regex_match_structs(
            t, p, [("speaker", sg), ("quote", qg)],
            consts=(("pattern", name),),
        )
        for name, (p, sg, qg) in QUOTE_PATTERNS.items()
    ]
    out = df.select(
        F.col(id_col), F.explode(F.concat(*per_pattern)).alias("x")
    ).select(
        id_col,
        F.col("x.speaker").alias("speaker"),
        F.col("x.quote").alias("quote"),
        F.col("x.pattern").alias("pattern"),
    )
    return out.distinct()


# "X has a Y of N": numeric property assertions with an exact-integer
# value. Digits+commas capped at 18 chars so the BIGINT cast cannot wrap.
HAS_OF_PATTERN = r"\b([a-z]+) has an? ([a-z]+) of (\d[\d,]{0,17})\b"


def numeric_facts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Numeric-property harvest -> distinct ``(doc_id, subject,
    relation, value)``: "tokyo has a population of 39,000,000" ->
    (tokyo, population, 39000000 BIGINT). The free-text complement of
    :func:`ontoweaver_spark.textops.extract_quantities` — that one
    finds bare measurements, this one binds the number to a subject and
    a relational noun, producing a ready (s, p, o-literal) KG triple
    with an exact integer object (comma thousands separators stripped;
    the 18-char digit bound makes the BIGINT cast overflow-free by
    construction).

    Scale shape: three group-extractions zipped, ONE explode, closing
    ``distinct`` — the standard harvest projection."""
    t = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    zipped = regex_match_structs(
        t, HAS_OF_PATTERN, [("s", 1), ("r", 2), ("v", 3)]
    )
    out = df.select(
        F.col(id_col), F.explode(zipped).alias("x")
    ).select(
        id_col,
        F.col("x.s").alias("subject"),
        F.col("x.r").alias("relation"),
        F.regexp_replace(F.col("x.v"), ",", "").cast("long").alias("value"),
    ).where(
        (F.length("subject") >= min_len)
        & (F.length("relation") >= min_len)
        & ~F.col("subject").isin(_HEARST_DROP)
        & ~F.col("relation").isin(_HEARST_DROP)
    )
    return out.distinct()


# --------------------------------------------------------------------------
# Harvested key/value schema discovery and per-source harvest yield
# --------------------------------------------------------------------------

# anchored, Java∩RE2-safe literal shapes; 18-digit bound keeps any
# downstream BIGINT cast overflow-free
_KV_INT_RE = r"^-?\d{1,18}$"
_KV_DEC_RE = r"^-?\d{1,18}\.\d{1,9}$"
_KV_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"


def kv_type_profile(
    df: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Schema discovery over a harvested key/value stream
    (:func:`definition_pairs`, microdata/RDFa property triples) ->
    ``(key, n_values, n_int, n_decimal, n_date, n_other,
    inferred_type)``: the spec-sheet analog of
    :func:`infer_table_column_types` — per key, how its values parse,
    and the majority type under a DETERMINISTIC precedence (integer >
    decimal > date > string on ties), which tells the KG bridge whether
    ``weight`` is a literal number or free text before any mapping is
    written.

    Scale shape: per-row anchored-regex classification (in-codegen),
    ONE map-side-combinable aggregation keyed by the harvested key —
    hub keys ("brand" on every product page) absorb into partials."""
    v = F.trim(F.col(value_col))
    is_int = v.rlike(_KV_INT_RE).cast("long")
    is_dec = v.rlike(_KV_DEC_RE).cast("long")
    is_date = v.rlike(_KV_DATE_RE).cast("long")
    agg = (
        df.select(
            F.col(key_col).alias("key"),
            is_int.alias("i"), is_dec.alias("d"), is_date.alias("t"),
        )
        .groupBy("key")
        .agg(
            F.count("*").alias("n_values"),
            F.sum("i").alias("n_int"),
            F.sum("d").alias("n_decimal"),
            F.sum("t").alias("n_date"),
        )
        .withColumn(
            "n_other",
            F.col("n_values") - F.col("n_int") - F.col("n_decimal")
            - F.col("n_date"),
        )
    )
    inferred = (
        F.when(
            (F.col("n_int") >= F.col("n_decimal"))
            & (F.col("n_int") >= F.col("n_date"))
            & (F.col("n_int") >= F.col("n_other")),
            F.lit("integer"),
        )
        .when(
            (F.col("n_decimal") >= F.col("n_date"))
            & (F.col("n_decimal") >= F.col("n_other")),
            F.lit("decimal"),
        )
        .when(F.col("n_date") >= F.col("n_other"), F.lit("date"))
        .otherwise(F.lit("string"))
    )
    return agg.select(
        "key", "n_values", "n_int", "n_decimal", "n_date", "n_other",
        inferred.alias("inferred_type"),
    )


def harvest_yield(
    harvest: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-group harvest-yield report -> ``(group, n_docs, n_docs_with,
    n_triples, triples_per_doc_e4)``: which crawl sources/hosts actually
    produce KG triples — the signal a 10^12-page crawl budget reallocates
    on (re-fetch the high-yield hosts, deprioritize the barren ones;
    the KG-side complement of ``urls.frontier_plan``). Exact integers
    throughout: the per-doc rate is BIGINT ten-thousandths
    (``n_triples * 10000 div n_docs``), never a float.

    Scale shape: the harvest aggregates to per-doc counts FIRST
    (map-side combinable, doc-cardinality output), then ONE
    doc-cardinality join to the docs table's group column, then the
    tiny per-group rollup — the triple stream itself never joins."""
    per_doc = harvest.groupBy(F.col(id_col)).agg(
        F.count("*").alias("n_t")
    )
    base = docs.select(
        F.col(id_col), F.col(group_col).alias("group")
    ).join(per_doc, id_col, "left")
    return (
        base.groupBy("group")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("n_t").alias("n_docs_with"),
            F.coalesce(F.sum("n_t"), F.lit(0)).alias("n_triples"),
        )
        .select(
            "group", "n_docs", "n_docs_with", "n_triples",
            F.expr("n_triples * 10000 div n_docs")
            .alias("triples_per_doc_e4"),
        )
    )


# --------------------------------------------------------------------------
# Citation mentions and external-identifier anchors
# --------------------------------------------------------------------------

# author-year citations, case-preserving (names need caps); the "et al."
# frame FIRST so the plain frame's residue is the two-author tail only
CITATION_PATTERNS: dict[str, tuple[str, int, int]] = {
    "etal": (r"\(([A-Z][a-z]+) et al\., (\d{4})\)", 1, 2),
    "author_year": (r"\(([A-Z][a-z]+), (\d{4})\)", 1, 2),
}


def citation_mentions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Author-year citation harvest -> distinct ``(doc_id, author,
    year, pattern)`` with ``year`` exact BIGINT: "(Smith, 2020)" /
    "(Smith et al., 2020)" — citation density is a strong
    document-quality prior for training-data curation, and the
    (author, year) keys anchor documents to a bibliographic registry
    the same way DOIs do. Case-preserving (names need their capital).

    Scale shape: two 2-group extractions zipped + concatenated, ONE
    explode, closing ``distinct`` — the standard harvest projection."""
    t = F.regexp_replace(F.col(text_col), r"\s+", " ")

    per_pattern = [
        regex_match_structs(
            t, p, [("author", ag), ("year", yg)],
            consts=(("pattern", name),),
        )
        for name, (p, ag, yg) in CITATION_PATTERNS.items()
    ]
    out = df.select(
        F.col(id_col), F.explode(F.concat(*per_pattern)).alias("x")
    ).select(
        id_col,
        F.col("x.author").alias("author"),
        F.col("x.year").cast("long").alias("year"),
        F.col("x.pattern").alias("pattern"),
    )
    return out.distinct()


# DOI (lowercased subset, final char alphanumeric, bounded suffix) and
# digit-form ISBN-13; both in the Java∩RE2 intersection
IDENTIFIER_PATTERNS: dict[str, str] = {
    "doi": r"\b10\.\d{4,9}/[a-z0-9._/-]{1,39}[a-z0-9]",
    "isbn13": r"\b97[89]\d{10}\b",
}


def identifier_mentions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """External-identifier harvest -> distinct ``(doc_id, kind,
    identifier)``: DOIs and digit-form ISBN-13s are REGISTRY anchors —
    two pages citing the same DOI talk about the same work with
    certainty no string similarity gives, so these become the
    highest-precision ``owl:sameAs`` / entity-linking edges in the
    harvested KG. Text is lowercased (DOIs are case-insensitive by
    spec; the digit ISBN is unaffected); the DOI suffix subset is the
    deterministic ``[a-z0-9._/-]`` core with a bounded length and an
    alphanumeric final char so trailing sentence punctuation never
    sticks to the identifier.

    Scale shape: one extraction per pattern, concatenated, ONE explode,
    closing ``distinct`` — the standard harvest projection."""
    t = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")

    def _tagger(name: str):
        # factory, not a default arg: pyspark reads the HOF lambda arity
        return lambda v: F.struct(
            F.lit(name).alias("kind"), v.alias("identifier")
        )

    per_pattern = [
        F.transform(
            F.regexp_extract_all(t, F.lit(p), 0), _tagger(name)
        )
        for name, p in IDENTIFIER_PATTERNS.items()
    ]
    out = df.select(
        F.col(id_col), F.explode(F.concat(*per_pattern)).alias("x")
    ).select(
        id_col,
        F.col("x.kind").alias("kind"),
        F.col("x.identifier").alias("identifier"),
    )
    return out.distinct()


# --------------------------------------------------------------------------
# Markdown heading hierarchy: document structure for section-aware chunking
# --------------------------------------------------------------------------

_MD_HEADING_RE = r"^(#{1,6}) +(.+?) *#* *$"


def markdown_sections(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Markdown heading-hierarchy harvest -> ``(doc_id, pos, level,
    title, parent_pos)``: ATX headings (``#`` .. ``######``, optional
    closing hashes) in line order, each linked to its nearest preceding
    STRICTLY-SHALLOWER heading — the document's own section taxonomy.
    Crawl-derived training corpora are full of markdown (converted docs,
    READMEs, forum posts); section structure is what section-aware
    chunking and "heading breadcrumb" context prompts need, the in-doc
    analog of :func:`breadcrumb_trails`. ``parent_pos`` is NULL for
    top-of-tree headings; ``pos`` is the 1-based heading index within
    the doc (stable tie-free order).

    Scale shape: lines via one ``split``+``posexplode`` (row-local);
    the parent link is JOIN-FREE — one window per doc carries the
    running last position of each heading level (six ``last(...,
    ignorenulls=True)`` columns over a single window spec) and the
    parent is the greatest of the shallower levels' positions. One
    shuffle total (the per-doc window sort), no self-join, no
    quadratic anything."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_ln", "_line"),
    )
    level = F.length(F.regexp_extract(F.col("_line"), _MD_HEADING_RE, 1))
    title = F.trim(F.regexp_extract(F.col("_line"), _MD_HEADING_RE, 2))
    heads = (
        lines.select(
            id_col, "_ln", level.alias("level"), title.alias("title")
        )
        .where((F.col("level") > 0) & (F.col("title") != ""))
    )
    w_pos = Window.partitionBy(id_col).orderBy("_ln")
    heads = heads.withColumn("pos", F.row_number().over(w_pos))
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("_ln")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_at = [
        F.last(
            F.when(F.col("level") == lvl, F.col("pos")), ignorenulls=True
        ).over(w_run)
        for lvl in range(1, 7)
    ]
    parent = F.greatest(*[
        F.when(F.col("level") > lvl, last_at[lvl - 1]) for lvl in range(1, 6)
    ] + [F.lit(None).cast("int")])
    return heads.select(
        id_col,
        F.col("pos").cast("bigint").alias("pos"),
        F.col("level").cast("bigint").alias("level"),
        "title",
        parent.cast("bigint").alias("parent_pos"),
    )


def markdown_section_paths(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " > ",
) -> DataFrame:
    """Heading-breadcrumb paths -> ``(doc_id, pos, path)``: each ATX
    heading with its full ancestor chain rendered root-first ("alpha >
    beta > gamma") — the context string section-aware chunkers prepend
    to every chunk so a model sees where in the document a passage
    lives. Ancestors follow :func:`markdown_sections` semantics
    (nearest preceding strictly-shallower heading, transitively).

    JOIN-FREE chain assembly: the same per-doc window carries each
    level's running last (position, title); a level-ascending cascade
    keeps a shallower level's entry only when its position is LATER
    than every already-accepted ancestor (a stale H2 from a previous
    H1 section is thereby excluded — the positional-validity guard),
    and the path is one ``array_join``. One shuffle (the per-doc window
    sort), no self-join, no recursion."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_ln", "_line"),
    )
    level = F.length(F.regexp_extract(F.col("_line"), _MD_HEADING_RE, 1))
    title = F.trim(F.regexp_extract(F.col("_line"), _MD_HEADING_RE, 2))
    heads = (
        lines.select(
            id_col, "_ln", level.alias("level"), title.alias("title")
        )
        .where((F.col("level") > 0) & (F.col("title") != ""))
    )
    w_pos = Window.partitionBy(id_col).orderBy("_ln")
    heads = heads.withColumn("pos", F.row_number().over(w_pos))
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("_ln")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastp = {
        lvl: F.last(
            F.when(F.col("level") == lvl, F.col("pos")), ignorenulls=True
        ).over(w_run)
        for lvl in range(1, 7)
    }
    lastt = {
        lvl: F.last(
            F.when(F.col("level") == lvl, F.col("title")), ignorenulls=True
        ).over(w_run)
        for lvl in range(1, 7)
    }
    parts = F.array().cast("array<string>")
    chain_pos = F.lit(None).cast("int")
    for lvl in range(1, 6):
        ok = (
            (F.col("level") > lvl)
            & lastp[lvl].isNotNull()
            & (chain_pos.isNull() | (lastp[lvl] > chain_pos))
        )
        parts = F.when(ok, F.concat(parts, F.array(lastt[lvl]))).otherwise(parts)
        chain_pos = F.when(ok, lastp[lvl]).otherwise(chain_pos)
    path = F.array_join(F.concat(parts, F.array(F.col("title"))), sep)
    return heads.select(
        id_col, F.col("pos").cast("bigint").alias("pos"),
        path.alias("path"),
    )


def markdown_section_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Section-grouped body text -> ``(doc_id, sect_pos, body)``: every
    non-heading line attributed to its governing heading (the nearest
    preceding one; ``sect_pos`` is that heading's
    :func:`markdown_sections` position, 0 for preamble text before the
    first heading), bodies newline-joined in line order, empty lines
    dropped. Joined with :func:`markdown_section_paths` on (doc_id,
    sect_pos) this IS the section-aware chunker: passage + its heading
    breadcrumb.

    Scale shape: one per-doc window (the governing heading position is
    a running ``max`` — heading positions increase with line number, so
    max == last), ONE keyed aggregation whose per-key buffer is one
    section's lines (document-bounded by construction — a document fits
    in a row to begin with)."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_ln", "_line"),
    )
    level = F.length(F.regexp_extract(F.col("_line"), _MD_HEADING_RE, 1))
    title = F.trim(F.regexp_extract(F.col("_line"), _MD_HEADING_RE, 2))
    is_head = (level > 0) & (title != "")
    w_pos = Window.partitionBy(id_col).orderBy("_ln")
    tagged = lines.select(
        id_col, "_ln", "_line", is_head.alias("_h")
    ).withColumn(
        "_hpos",
        F.sum(F.col("_h").cast("int")).over(
            w_pos.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    body = (
        tagged.where(~F.col("_h") & (F.trim("_line") != ""))
        .groupBy(id_col, F.col("_hpos").alias("sect_pos"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_ln", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("body")
        )
    )
    return body.select(
        id_col, F.col("sect_pos").cast("bigint").alias("sect_pos"), "body"
    )
