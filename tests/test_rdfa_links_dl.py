"""Goldens for the round-out web-harvest quartet: RDFa-lite attribute
triples (the third embedded-data carrier next to microdata/JSON-LD),
``<link rel>`` page relations (canonical / hreflang alternates /
pagination), "also known as" alias frames, and ``<dl>`` definition-pair
spec sheets. Reference analog: none — the reference maps tabular inputs
(src/ontoweaver/tabular.py); harvesting structure from crawl markup is
the web-scale bootstrap."""

import pyspark.sql.functions as F

from ontoweaver_spark.webdoc import (
    aka_aliases,
    definition_pairs,
    extract_rdfa,
    link_rel_edges,
)


def test_rdfa_typeof_and_properties(spark):
    html = (
        '<div vocab="https://schema.org/" typeof="Product">'
        '<span property="name">Widget &amp; Co</span>'
        '<meta property="sku" content="W-1">'
        '<span property="">empty prop dropped</span>'
        "</div>"
    )
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    got = {(r.subject, r.predicate, r.object)
           for r in extract_rdfa(df).collect()}
    assert got == {
        ("u1", "a", "Product"),
        ("u1", "name", "Widget & Co"),
        ("u1", "sku", "W-1"),
    }


def test_rdfa_binary_html_and_content_priority(spark):
    # content= wins over the immediate text run; binary html decodes
    html = b'<p typeof="T"><b property="k" content="c">text</b></p>'
    df = spark.createDataFrame(
        [("u1", bytearray(html))], "url string, html binary"
    )
    got = {(r.predicate, r.object) for r in extract_rdfa(df).collect()}
    assert got == {("a", "T"), ("k", "c")}


def test_link_rel_canonical_hreflang_multivalue(spark):
    html = (
        '<link rel="canonical" href="https://ex.com/a?x=1&amp;y=2">'
        '<link rel="alternate" hreflang="FR" href="https://ex.com/fr/a">'
        '<link rel="alternate amphtml" href="https://ex.com/amp/a">'
        '<link rel="stylesheet">'  # no href -> dropped
        '<a rel="nofollow" href="/x">not a link tag</a>'
    )
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    got = {(r.rel, r.href, r.hreflang)
           for r in link_rel_edges(df).collect()}
    assert got == {
        ("canonical", "https://ex.com/a?x=1&y=2", ""),
        ("alternate", "https://ex.com/fr/a", "fr"),
        ("alternate", "https://ex.com/amp/a", ""),
        ("amphtml", "https://ex.com/amp/a", ""),
    }


def test_aka_alias_frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "Bucky, also known as barnes and soldier, fought."),
            (2, "The city of bombay, formerly known as heptanesia."),
            (3, "acetaminophen (aka paracetamol) reduces fever."),
            (4, "television, or simply tele."),
            (5, "nothing here."),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.name, r.alias, r.pattern)
           for r in aka_aliases(docs).collect()}
    assert got == {
        (1, "bucky", "barnes", "aka"),
        (1, "bucky", "soldier", "aka"),
        (2, "bombay", "heptanesia", "aka"),
        (3, "acetaminophen", "paracetamol", "aka_paren"),
        (4, "television", "tele", "or_simply"),
    }


def test_definition_pairs_order_entities_and_markup_bound(spark):
    html = (
        "<dl><dt>Brand</dt><dd>Acme &amp; Sons</dd>"
        "<dt> Weight </dt>\n<dd> 2 kg </dd>"
        "<dt>Linked</dt><dd><a>markup refuses</a></dd></dl>"
    )
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    got = {(r.url, r.key, r.value, r.pair_pos)
           for r in definition_pairs(df).collect()}
    assert got == {
        ("u1", "Brand", "Acme & Sons", 1),
        ("u1", "Weight", "2 kg", 2),
    }


def test_definition_pairs_binary_and_empty(spark):
    df = spark.createDataFrame(
        [
            ("u1", bytearray(b"<dl><dt>k</dt><dd>v</dd></dl>")),
            ("u2", bytearray(b"<p>none</p>")),
        ],
        "url string, html binary",
    )
    got = {(r.url, r.key, r.value, r.pair_pos)
           for r in definition_pairs(df).collect()}
    assert got == {("u1", "k", "v", 1)}


def test_plan_shapes_zero_exchange_before_distinct(spark):
    # every harvester here is a zero-shuffle projection (+ the closing
    # distinct where present) — pin it so a refactor can't sneak a join in
    df = spark.createDataFrame([("u", "<p></p>")], "url string, html string")
    for fn in (extract_rdfa, link_rel_edges):
        plan = fn(df)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "CartesianProduct" not in plan
    plan = definition_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_contrast_frames(spark):
    from ontoweaver_spark.webdoc import contrast_pairs

    docs = spark.createDataFrame(
        [
            (1, "Rust, unlike python or ruby, compiles."),
            (2, "She walked rather than drove."),
            (3, "tea, as opposed to coffee, calms."),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.term, r.contrast, r.pattern)
           for r in contrast_pairs(docs).collect()}
    assert got == {
        (1, "rust", "python", "unlike"),
        (1, "rust", "ruby", "unlike"),
        (2, "walked", "drove", "rather_than"),
        (3, "tea", "coffee", "as_opposed"),
        # the documented greedy comma-list residue shared with the Hearst
        # frames: the clause after "coffee," is absorbed into the list
        (3, "tea", "calms", "as_opposed"),
    }


def test_cohyponym_pairs_from_hearst(spark):
    from ontoweaver_spark.webdoc import cohyponym_pairs, hearst_hypernyms

    docs = spark.createDataFrame(
        [(1, "fruits such as apples, pears and quinces. metals such as iron.")],
        "doc_id long, text string",
    )
    h = hearst_hypernyms(docs)
    got = {(r.a, r.b, r.hypernym) for r in cohyponym_pairs(h).collect()}
    # C(3,2) canonical-order pairs within one list; the singleton list
    # contributes none; no cross-hypernym pairs
    assert got == {
        ("apples", "pears", "fruits"),
        ("apples", "quinces", "fruits"),
        ("pears", "quinces", "fruits"),
    }


def test_hreflang_cluster_composition(spark):
    from ontoweaver_spark.dedup import connected_components
    from ontoweaver_spark.webdoc import link_rel_edges

    # a 3-page translation ring discovered purely from markup
    rows = [
        ("https://ex.com/en",
         '<link rel="alternate" hreflang="fr" href="https://ex.com/fr">'),
        ("https://ex.com/fr",
         '<link rel="alternate" hreflang="de" href="https://ex.com/de">'),
        ("https://ex.com/solo",
         '<link rel="canonical" href="https://ex.com/solo2">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    edges = (
        link_rel_edges(df)
        .where((F.col("rel") == "alternate") & (F.col("hreflang") != ""))
        .select(F.col("url").alias("a"), F.col("href").alias("b"))
    )
    comp = {(r.vertex, r.component)
            for r in connected_components(edges).collect()}
    assert comp == {
        ("https://ex.com/en", "https://ex.com/de"),
        ("https://ex.com/fr", "https://ex.com/de"),
        ("https://ex.com/de", "https://ex.com/de"),
    }


def test_appositive_relations(spark):
    from ontoweaver_spark.webdoc import appositive_relations

    docs = spark.createDataFrame(
        [
            (1, "Paris, the capital of France, hosted it."),
            (2, "He met Ada, the author of notes."),
            (3, "x, the y of z."),  # min_len drops 1-char terms
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.subject, r.relation, r.object)
           for r in appositive_relations(docs).collect()}
    assert got == {
        (1, "paris", "capital", "france"),
        (2, "ada", "author", "notes"),
    }


def test_quote_attributions_both_orders_case_preserved(spark):
    from ontoweaver_spark.webdoc import quote_attributions

    docs = spark.createDataFrame(
        [
            (1, '"We will ship it," said Grace.'),
            (2, 'Linus says, "talk is cheap."'),
            (3, 'no quotes here, said nobody'),  # unquoted -> no match
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.speaker, r.quote, r.pattern)
           for r in quote_attributions(docs).collect()}
    assert got == {
        (1, "Grace", "We will ship it", "quote_said"),
        (2, "Linus", "talk is cheap.", "said_quote"),
    }


def test_numeric_facts_exact_bigint(spark):
    from ontoweaver_spark.webdoc import numeric_facts

    docs = spark.createDataFrame(
        [
            (1, "Tokyo has a population of 39,000,000 people."),
            (2, "the engine has an output of 120 kw."),
            (3, "it has a x of 5."),  # min_len drops the relation
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.subject, r.relation, r.value)
           for r in numeric_facts(docs).collect()}
    assert got == {
        (1, "tokyo", "population", 39000000),
        (2, "engine", "output", 120),
    }


def test_kv_type_profile_majority_and_tiebreak(spark):
    from ontoweaver_spark.webdoc import kv_type_profile

    rows = [
        ("stock", "5"), ("stock", "12"), ("stock", "n/a"),
        ("weight", "1.5"), ("weight", "2.25"),
        ("since", "2021-03-15"),
        ("name", "Acme"), ("name", "7"),  # tie 1-1 -> integer precedence
    ]
    df = spark.createDataFrame(rows, "key string, value string")
    got = {
        (r.key, r.n_values, r.n_int, r.n_decimal, r.n_date, r.n_other,
         r.inferred_type)
        for r in kv_type_profile(df).collect()
    }
    assert got == {
        ("stock", 3, 2, 0, 0, 1, "integer"),
        ("weight", 2, 0, 2, 0, 0, "decimal"),
        ("since", 1, 0, 0, 1, 0, "date"),
        ("name", 2, 1, 0, 0, 1, "integer"),
    }


def test_harvest_yield_exact_rates(spark):
    from ontoweaver_spark.webdoc import harvest_yield

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")],
        "doc_id long, source string",
    )
    harvest = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")],  # doc 3 and 4 barren
        "doc_id long, t string",
    )
    got = {
        (r.group, r.n_docs, r.n_docs_with, r.n_triples,
         r.triples_per_doc_e4)
        for r in harvest_yield(harvest, docs).collect()
    }
    assert got == {
        ("a", 2, 2, 3, 15000),  # 1.5 triples/doc
        ("b", 2, 0, 0, 0),
    }


def test_harvesters_partition_invariant(spark):
    """Distributed-correctness property: every harvester is a row-local
    projection (+ keyed distinct), so its result set must not depend on
    how the input is partitioned."""
    from ontoweaver_spark.webdoc import (
        aka_aliases, appositive_relations, contrast_pairs,
        definition_pairs, extract_rdfa, link_rel_edges, numeric_facts,
        quote_attributions,
    )

    rows = [
        (
            i,
            f"u{i}",
            '<div typeof="T"><span property="p">v</span></div>'
            '<link rel="canonical" href="https://e/c">'
            "<dl><dt>k</dt><dd>v</dd></dl>",
            'wombat, also known as vombatus or diprotodon. '
            'anna, the boss of acme. '
            f'cats rather than dogs. town has a size of {i},100. '
            f'"quote number {i}," said grace.',
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, html string, text string"
    )
    html_fns = [extract_rdfa, link_rel_edges, definition_pairs]
    text_fns = [aka_aliases, appositive_relations, contrast_pairs,
                numeric_facts, quote_attributions]
    for fn in html_fns + text_fns:
        a = {tuple(r) for r in fn(df.repartition(1)).collect()}
        b = {tuple(r) for r in fn(df.repartition(7, "url")).collect()}
        assert a == b and a, fn.__name__


def test_citation_mentions(spark):
    from ontoweaver_spark.webdoc import citation_mentions

    docs = spark.createDataFrame(
        [
            (1, "As shown (Smith, 2020) and (Jones et al., 1999)."),
            (2, "No citations (lowercase, 2020) or (Smith 2020) here."),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.author, r.year, r.pattern)
           for r in citation_mentions(docs).collect()}
    assert got == {
        (1, "Smith", 2020, "author_year"),
        (1, "Jones", 1999, "etal"),
    }


def test_identifier_mentions_doi_isbn(spark):
    from ontoweaver_spark.webdoc import identifier_mentions

    docs = spark.createDataFrame(
        [
            (1, "See DOI 10.1038/s41586-020-2649-2. for details"),
            (2, "ISBN 9780262046305 and junk 9770262046305."),
            (3, "not a doi: 10.12/x (registrant too short)"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.kind, r.identifier)
           for r in identifier_mentions(docs).collect()}
    # trailing sentence period NOT part of the DOI; 977 prefix rejected
    assert got == {
        (1, "doi", "10.1038/s41586-020-2649-2"),
        (2, "isbn13", "9780262046305"),
    }


def test_markdown_sections_hierarchy(spark):
    from ontoweaver_spark.webdoc import markdown_sections

    md = "\n".join([
        "# alpha",
        "intro text",
        "## beta",
        "### gamma",
        "body",
        "## delta ##",       # closing hashes stripped
        "#nospace",          # not a heading (no space)
        "####### seven",     # not a heading (>6 hashes)
        "# omega",
        "### eps",           # level jump: parent is the H1, not an H2
    ])
    df = spark.createDataFrame([(1, md)], "doc_id long, text string")
    got = {
        (r.pos, r.level, r.title, r.parent_pos)
        for r in markdown_sections(df).collect()
    }
    assert got == {
        (1, 1, "alpha", None),
        (2, 2, "beta", 1),
        (3, 3, "gamma", 2),
        (4, 2, "delta", 1),
        (5, 1, "omega", None),
        (6, 3, "eps", 5),
    }


def test_markdown_section_paths_with_stale_guard(spark):
    from ontoweaver_spark.webdoc import markdown_section_paths

    md = "\n".join([
        "## orphan",          # H2 with no H1 -> path is itself
        "# alpha",
        "## beta",
        "### gamma",
        "# omega",
        "### eps",            # stale '## beta' must NOT appear in path
    ])
    df = spark.createDataFrame([(1, md)], "doc_id long, text string")
    got = {(r.pos, r.path)
           for r in markdown_section_paths(df).collect()}
    assert got == {
        (1, "orphan"),
        (2, "alpha"),
        (3, "alpha > beta"),
        (4, "alpha > beta > gamma"),
        (5, "omega"),
        (6, "omega > eps"),
    }


def test_markdown_section_text_grouping(spark):
    from ontoweaver_spark.webdoc import markdown_section_text

    md = "\n".join([
        "preamble line",
        "# alpha",
        "alpha body one",
        "",
        "alpha body two",
        "## beta",
        "beta body",
        "# omega",
    ])
    df = spark.createDataFrame([(1, md)], "doc_id long, text string")
    got = {(r.sect_pos, r.body)
           for r in markdown_section_text(df).collect()}
    # omega has no body -> no row; empty line dropped
    assert got == {
        (0, "preamble line"),
        (1, "alpha body one\nalpha body two"),
        (2, "beta body"),
    }
