"""F3 (oncokb wide real-world table) structural parity + loader coverage.

The reference's oncokb golden (test_parallel_mapping.py) is stale against
its own data.csv, so this test asserts structural invariants derived from
the 2-row fixture directly: label counts, split fan-out, from_subject edge
re-rooting, and per-type property attachment.
"""

import os

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark import weave
from ontoweaver_spark.fusion import format_for_export
from ontoweaver_spark.loaders import read_json_queries, read_table, sub_sample

REF = "/root/reference/tests"


@pytest.mark.skipif(not os.path.exists(f"{REF}/oncokb/data.csv"), reason="fixture absent")
def test_oncokb_structural(spark):
    # the fixture CSV is malformed (41 header columns, 39 data fields — the
    # reference's own test for it is DISABLED); repair by re-inserting the
    # two missing empty middle fields so columns align as intended
    import csv as _csv

    with open(f"{REF}/oncokb/data.csv") as f:
        r = _csv.reader(f)
        header = next(r)
        rows = []
        for row in r:
            while len(row) < len(header):
                row.insert(34, "")
            rows.append(tuple(row))
    schema = ", ".join(f"`{c}` string" for c in header)
    df = spark.createDataFrame(rows, schema)
    assert all(t == "string" for t in dict(df.dtypes).values())
    fnodes, fedges = weave(
        df, f"{REF}/oncokb/mapping.yaml", affix="suffix", reconciliate_sep=","
    )
    nodes = {(r["id"], r["label"]) for r in fnodes.collect()}

    by_label = {}
    for _, label in nodes:
        by_label[label] = by_label.get(label, 0) + 1

    # 2 rows -> 2 variants (rowIndex subjects)
    assert by_label["variant"] == 2
    # split(citationPMids, ","): row1 has 9 pmids, row2's 2 are a subset -> 9
    assert by_label["publication"] == 9
    # split(treatments, ";") -> 4 drugs row1, 3 row2 (subset) -> 4 distinct
    assert by_label["drug"] == 4
    assert ("Telisotuzumab Vedotin:drug", "drug") in nodes
    assert ("Crizotinib:drug", "drug") in nodes

    # from_subject: sample -> edge sample_to_patient re-rooted at the sample
    stp = {(r["src"], r["dst"]) for r in
           fedges.where(F.col("label") == "sample_to_patient").collect()}
    assert stp == {("91:sample", "33:patient"), ("92:sample", "34:patient")}

    # properties attach per type: entrez_gene_id on gene_hugo
    gene = format_for_export(fnodes, ",").where(F.col("id") == "MET:gene_hugo").collect()[0]
    assert gene["properties"]["entrez_gene_id"] == "4233"
    # variant carries version property
    variant = format_for_export(fnodes, ",").where(F.col("id") == "0:variant").collect()[0]
    assert variant["properties"]["version"] == "v3.14"


def test_json_queries_loader(spark):
    text = '{"data": [{"variant": 0, "patient": "A", "age": 12}, {"variant": 1, "patient": "B", "age": 13}]}'
    df = read_json_queries(
        spark, text,
        {"variant_id": "data[*].variant", "patient": "data[*].patient", "age": "data[*].age"},
    )
    rows = sorted((r["variant_id"], r["patient"], r["age"]) for r in df.collect())
    assert rows == [("0", "A", "12"), ("1", "B", "13")]

    fnodes, fedges = weave(df, {
        "row": {"map": {"id_from_column": "variant_id", "to_subject": "variant"}},
        "transformers": [
            {"map": {"column": "patient", "to_object": "patient", "via_relation": "has"}},
        ],
    })
    assert fnodes.count() == 4 and fedges.count() == 2


def test_sub_sample(spark):
    df = spark.range(1000)
    n = sub_sample(df, 10.0).count()
    assert 40 < n < 200  # ~10%
    assert sub_sample(df, 10.0).count() == n  # seeded -> stable


def test_rdf_nt_loader(spark, tmp_path):
    """N-Triples parse distributed into a flat (s, p, o, ...) table
    (reference loader.py:318-421 rdflib surface; OWL reasoning out of scope)."""
    from ontoweaver_spark.loaders import read_rdf_triples

    nt = tmp_path / "g.nt"
    nt.write_text(
        '<http://x/a> <http://x/name> "Alice" .\n'
        "# a comment\n"
        '<http://x/a> <http://x/knows> <http://x/b> .\n'
        '_:b1 <http://x/name> "B\\"ob"@en .\n'
        '<http://x/a> <http://x/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    )
    rows = {
        (r["subject"], r["predicate"], r["object"], r["object_kind"],
         r["object_lang"], r["object_datatype"])
        for r in read_rdf_triples(spark, str(nt)).collect()
    }
    assert ("http://x/a", "http://x/name", "Alice", "literal", None, None) in rows
    assert ("http://x/a", "http://x/knows", "http://x/b", "uri", None, None) in rows
    assert ("_:b1", "http://x/name", 'B"ob', "literal", "en", None) in rows
    assert (
        "http://x/a", "http://x/age", "42", "literal", None,
        "http://www.w3.org/2001/XMLSchema#integer",
    ) in rows


def test_rdf_ttl_prefixes_and_a(spark, tmp_path):
    from ontoweaver_spark.loaders import read_rdf_triples

    ttl = tmp_path / "g.ttl"
    ttl.write_text(
        "@prefix ex: <http://example.org/> .\n"
        "@prefix foaf: <http://xmlns.com/foaf/0.1/> .\n"
        "ex:alice a foaf:Person .\n"
        'ex:alice foaf:name "Alice" .\n'
    )
    rows = {
        (r["subject"], r["predicate"], r["object"])
        for r in read_rdf_triples(spark, str(ttl)).collect()
    }
    assert (
        "http://example.org/alice",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://xmlns.com/foaf/0.1/Person",
    ) in rows
    assert (
        "http://example.org/alice", "http://xmlns.com/foaf/0.1/name", "Alice"
    ) in rows

    # a truncated (never-terminated) statement still fails loudly
    import pytest

    bad = tmp_path / "bad.ttl"
    bad.write_text("@prefix ex: <http://example.org/> .\nex:a ex:p ex:b ;\n")
    with pytest.raises(Exception, match="unterminated RDF statement"):
        read_rdf_triples(spark, str(bad)).collect()

    # triple-quoted literals stay out of scope, rejected with guidance
    tq = tmp_path / "tq.ttl"
    tq.write_text('<http://x/s> <http://x/p> """multi\nline""" .\n')
    with pytest.raises(ValueError, match="triple-quoted"):
        read_rdf_triples(spark, str(tq))


def test_rdf_multiline_turtle_and_unicode_escapes(spark, tmp_path):
    """Real-world Turtle: ;/, continuations across lines, object lists,
    \\uXXXX escapes — folded + parsed via the vectorized fallback, and the
    resulting hierarchy feeds subclass_closure (reference surface:
    loader.py:318-421, multi-line fixtures in its test_owladapter.py)."""
    from ontoweaver_spark.loaders import read_rdf_triples
    from ontoweaver_spark.ontology import subclass_closure, subclass_edges_from_triples

    ttl = tmp_path / "onto.ttl"
    ttl.write_text(
        "@prefix ex: <http://example.org/> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "ex:dog rdfs:subClassOf ex:mammal ;\n"
        '    rdfs:label "dog"@en ,\n'
        '        "chien\\u00e9"@fr .\n'
        "ex:mammal rdfs:subClassOf ex:animal .\n"
        "ex:cat\n"
        "    rdfs:subClassOf ex:mammal .\n"
        'ex:note ex:text "u: \\u0041\\U0001F600 done" .\n'
    )
    df = read_rdf_triples(spark, str(ttl))
    rows = {
        (r["subject"], r["predicate"], r["object"], r["object_kind"], r["object_lang"])
        for r in df.collect()
    }
    ex = "http://example.org/"
    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    assert (f"{ex}dog", f"{rdfs}subClassOf", f"{ex}mammal", "uri", None) in rows
    assert (f"{ex}cat", f"{rdfs}subClassOf", f"{ex}mammal", "uri", None) in rows
    # object list expanded: two labels off ONE predicate
    assert (f"{ex}dog", f"{rdfs}label", "dog", "literal", "en") in rows
    assert (f"{ex}dog", f"{rdfs}label", "chiené", "literal", "fr") in rows
    # \uXXXX and \UXXXXXXXX decode
    assert (f"{ex}note", f"{ex}text", "u: A\U0001F600 done", "literal", None) in rows

    closure = {
        (r["descendant"], r["ancestor"], r["depth"])
        for r in subclass_closure(
            subclass_edges_from_triples(df, predicate=f"{rdfs}subClassOf")
        ).collect()
    }
    assert (f"{ex}dog", f"{ex}animal", 2) in closure
    assert (f"{ex}cat", f"{ex}mammal", 1) in closure


def test_pandas_format_loaders(spark, tmp_path):
    """Exotic pandas formats (reference loader.py:198-216) through the
    driver-side shim; formats whose engines exist in this container."""
    import pandas as pd

    from ontoweaver_spark.loaders import read_pandas_format

    pdf = pd.DataFrame({"id": [1, 2], "name": ["x", "y"]})

    fth = tmp_path / "t.feather"
    pdf.to_feather(fth)
    got = read_pandas_format(spark, str(fth))
    assert {tuple(r) for r in got.collect()} == {("1", "x"), ("2", "y")}

    pkl = tmp_path / "t.pkl"
    pdf.to_pickle(pkl)
    got = read_pandas_format(spark, str(pkl))
    assert {tuple(r) for r in got.collect()} == {("1", "x"), ("2", "y")}

    dta = tmp_path / "t.dta"
    pdf.to_stata(dta, write_index=False)
    got = read_pandas_format(spark, str(dta))
    assert {tuple(r) for r in got.collect()} == {("1", "x"), ("2", "y")}

    import pytest

    with pytest.raises(ValueError, match="unsupported pandas format"):
        read_pandas_format(spark, "x.unknownext")


def test_rdf_literal_escape_order(spark, tmp_path):
    """'\\\\n' in an N-Triples literal is an escaped backslash followed by a
    real n — NOT a newline. Escape resolution must handle \\\\ first."""
    from ontoweaver_spark.loaders import read_rdf_triples

    nt = tmp_path / "esc.nt"
    nt.write_text(
        '<http://x/s> <http://x/p> "a\\\\nb" .\n'
        '<http://x/s> <http://x/q> "tab:\\there" .\n'
        '<http://x/s> <http://x/r> "nl:\\nhere" .\n'
        '<http://x/s> <http://x/w> "C:\\\\new\\\\table" .\n'
    )
    got = {
        r["predicate"].rsplit("/", 1)[1]: r["object"]
        for r in read_rdf_triples(spark, str(nt)).collect()
    }
    assert got["p"] == "a\\nb"            # backslash + n, no newline
    assert got["q"] == "tab:\there"
    assert got["r"] == "nl:\nhere"
    assert got["w"] == "C:\\new\\table"   # Windows path survives intact


def test_rdf_xml_owl_loader(spark, tmp_path):
    """RDF/XML (.owl) — the dominant published-ontology serialization the
    reference loads through rdflib (loader.py:318-421) — parses into the
    same flat triple frame and feeds subclass_closure."""
    from ontoweaver_spark.loaders import read_rdf_triples
    from ontoweaver_spark.ontology import subclass_closure, subclass_edges_from_triples

    owl = tmp_path / "onto.owl"
    owl.write_text(
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
        '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"\n'
        '         xmlns:owl="http://www.w3.org/2002/07/owl#"\n'
        '         xml:base="http://example.org/onto">\n'
        '  <owl:Class rdf:about="http://example.org/Dog">\n'
        '    <rdfs:subClassOf rdf:resource="http://example.org/Mammal"/>\n'
        '    <rdfs:label xml:lang="en">Dog</rdfs:label>\n'
        '  </owl:Class>\n'
        '  <owl:Class rdf:about="http://example.org/Mammal">\n'
        '    <rdfs:subClassOf>\n'
        '      <owl:Class rdf:about="http://example.org/Animal"/>\n'
        '    </rdfs:subClassOf>\n'
        '    <rdfs:comment rdf:datatype="http://www.w3.org/2001/XMLSchema#string">warm</rdfs:comment>\n'
        '  </owl:Class>\n'
        '  <rdf:Description rdf:ID="Cat">\n'
        '    <rdfs:subClassOf rdf:resource="http://example.org/Mammal"/>\n'
        '  </rdf:Description>\n'
        '</rdf:RDF>\n'
    )
    df = read_rdf_triples(spark, str(owl))
    rows = {
        (r["subject"], r["predicate"], r["object"], r["object_kind"],
         r["object_lang"], r["object_datatype"])
        for r in df.collect()
    }
    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    rdft = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    owlc = "http://www.w3.org/2002/07/owl#Class"
    ex = "http://example.org/"
    assert (f"{ex}Dog", rdft, owlc, "uri", None, None) in rows
    assert (f"{ex}Dog", f"{rdfs}subClassOf", f"{ex}Mammal", "uri", None, None) in rows
    # nested node element
    assert (f"{ex}Mammal", f"{rdfs}subClassOf", f"{ex}Animal", "uri", None, None) in rows
    assert (f"{ex}Animal", rdft, owlc, "uri", None, None) in rows
    # xml:lang literal + datatyped literal
    assert (f"{ex}Dog", f"{rdfs}label", "Dog", "literal", "en", None) in rows
    assert (f"{ex}Mammal", f"{rdfs}comment", "warm", "literal", None,
            "http://www.w3.org/2001/XMLSchema#string") in rows
    # rdf:ID resolves against xml:base
    assert ("http://example.org/onto#Cat", f"{rdfs}subClassOf", f"{ex}Mammal",
            "uri", None, None) in rows

    closure = {
        (r["descendant"], r["ancestor"])
        for r in subclass_closure(
            subclass_edges_from_triples(df, predicate=f"{rdfs}subClassOf")
        ).collect()
    }
    assert (f"{ex}Dog", f"{ex}Animal") in closure

    # unsupported parseType fails loudly
    import pytest

    bad = tmp_path / "bad.owl"
    bad.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://x/">'
        '<rdf:Description rdf:about="http://x/s">'
        '<ex:p rdf:parseType="Collection"/></rdf:Description></rdf:RDF>'
    )
    with pytest.raises(ValueError, match="parseType"):
        read_rdf_triples(spark, str(bad))


def test_rdf_trailing_comments(spark, tmp_path):
    """Trailing # comments — ubiquitous in real ontology files — must not
    corrupt single-line statements, multi-line folding, or literals/URIs
    that contain a # character."""
    from ontoweaver_spark.loaders import read_rdf_triples

    ttl = tmp_path / "c.ttl"
    ttl.write_text(
        "@prefix ex: <http://example.org/> .\n"
        '<http://x/a> <http://x/p> <http://x/b#frag> . # uri keeps its frag\n'
        "ex:s ex:q ex:o1 ; # continuation comment\n"
        "     ex:r ex:o2 . # terminator comment\n"
        'ex:s ex:lbl "has # inside" . # but this one goes\n'
    )
    rows = {
        (r["subject"], r["predicate"], r["object"])
        for r in read_rdf_triples(spark, str(ttl)).collect()
    }
    ex = "http://example.org/"
    assert ("http://x/a", "http://x/p", "http://x/b#frag") in rows
    assert (f"{ex}s", f"{ex}q", f"{ex}o1") in rows
    assert (f"{ex}s", f"{ex}r", f"{ex}o2") in rows  # survives the ; fold
    assert (f"{ex}s", f"{ex}lbl", "has # inside") in rows
    assert len(rows) == 4


def test_jsonld_loader(spark, tmp_path):
    """VERDICT r3 #4: JSON-LD (the schema.org-embed serialization the
    reference accepts via rdflib, loader.py:345-360) parses into the same
    flat triple frame and feeds subclass_closure; trig/trix/n3 stay loud
    rejects."""
    import json

    from ontoweaver_spark.loaders import read_rdf_triples
    from ontoweaver_spark.ontology import subclass_closure, subclass_edges_from_triples

    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    rdft = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    doc = {
        "@context": {
            "rdfs": rdfs,
            "ex": "http://example.org/",
            "name": "http://schema.org/name",
            "parent": {"@id": f"{rdfs}subClassOf", "@type": "@id"},
            "@vocab": "http://schema.org/",
        },
        "@graph": [
            {"@id": "ex:Dog", "@type": "ex:Class", "parent": "ex:Mammal",
             "name": {"@value": "Dog", "@language": "en"},
             "legs": 4, "extinct": False},
            {"@id": "ex:Mammal", "parent": "ex:Animal",
             "knownFor": [{"@id": "ex:Fur"}, "warm blood"]},
            {"@id": "ex:Cat", "parent": {"@id": "ex:Mammal"},
             "owner": {"name": "Ada"}},
        ],
    }
    f = tmp_path / "onto.jsonld"
    f.write_text(json.dumps(doc))
    df = read_rdf_triples(spark, str(f))
    rows = {
        (r["subject"], r["predicate"], r["object"], r["object_kind"],
         r["object_lang"], r["object_datatype"])
        for r in df.collect()
    }
    ex = "http://example.org/"
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert (f"{ex}Dog", rdft, f"{ex}Class", "uri", None, None) in rows
    # @type:@id coercion expands the string object to a URI
    assert (f"{ex}Dog", f"{rdfs}subClassOf", f"{ex}Mammal", "uri", None, None) in rows
    # language-tagged @value and typed bare scalars
    assert (f"{ex}Dog", "http://schema.org/name", "Dog", "literal", "en", None) in rows
    assert (f"{ex}Dog", "http://schema.org/legs", "4", "literal", None,
            f"{xsd}integer") in rows
    assert (f"{ex}Dog", "http://schema.org/extinct", "false", "literal", None,
            f"{xsd}boolean") in rows
    # arrays: one triple per element, mixed @id + literal
    assert (f"{ex}Mammal", "http://schema.org/knownFor", f"{ex}Fur",
            "uri", None, None) in rows
    assert (f"{ex}Mammal", "http://schema.org/knownFor", "warm blood",
            "literal", None, None) in rows
    # explicit {"@id"} object and nested node -> blank subject
    assert (f"{ex}Cat", f"{rdfs}subClassOf", f"{ex}Mammal", "uri", None, None) in rows
    blank_objs = [o for s, p, o, k, _, _ in rows
                  if s == f"{ex}Cat" and p == "http://schema.org/owner" and k == "blank"]
    assert len(blank_objs) == 1
    assert (blank_objs[0], "http://schema.org/name", "Ada", "literal", None, None) in rows

    # feeds the closure exactly like .nt/.ttl/.owl inputs
    closure = {
        (r["descendant"], r["ancestor"], r["depth"])
        for r in subclass_closure(subclass_edges_from_triples(df)).collect()
    }
    assert (f"{ex}Dog", f"{ex}Animal", 2) in closure
    assert (f"{ex}Cat", f"{ex}Animal", 2) in closure

    # remote contexts cannot be fetched -> loud
    bad2 = tmp_path / "remote.jsonld"
    bad2.write_text(json.dumps({"@context": "https://schema.org", "@id": "http://x/a"}))
    with pytest.raises(ValueError, match="remote @context"):
        read_rdf_triples(spark, str(bad2))


def test_jsonld_list_and_set(spark, tmp_path):
    """VERDICT r4 #7: @list expands to the standard rdf:first/rdf:rest
    collection (empty list -> rdf:nil), @set unwraps to its members, and
    @container term definitions apply to plain arrays; the loaded frame
    still feeds subclass_closure. @reverse/@nest stay loud rejects."""
    import json

    from ontoweaver_spark.loaders import read_rdf_triples
    from ontoweaver_spark.ontology import subclass_closure, subclass_edges_from_triples

    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    rdfns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    doc = {
        "@context": {
            "ex": "http://example.org/",
            "parent": {"@id": f"{rdfs}subClassOf", "@type": "@id"},
            "steps": {"@id": "http://schema.org/steps", "@container": "@list"},
            "@vocab": "http://schema.org/",
        },
        "@graph": [
            {"@id": "ex:Recipe", "parent": "ex:CreativeWork",
             "ingredients": {"@list": ["flour", {"@id": "ex:Egg"}]},
             "steps": ["mix", "bake"],
             "tags": {"@set": ["quick", "easy"]},
             "empty": {"@list": []}},
            {"@id": "ex:CreativeWork", "parent": "ex:Thing"},
        ],
    }
    f = tmp_path / "lists.jsonld"
    f.write_text(json.dumps(doc))
    df = read_rdf_triples(spark, str(f))
    rows = {
        (r["subject"], r["predicate"], r["object"], r["object_kind"])
        for r in df.collect()
    }
    by_sp = {}
    for s, p, o, k in rows:
        by_sp.setdefault((s, p), []).append((o, k))
    ex = "http://example.org/"

    def chase(start):
        """Walk an rdf:first/rdf:rest chain, returning the firsts in order."""
        out, node = [], start
        while node != f"{rdfns}nil":
            (first, _), = by_sp[(node, f"{rdfns}first")]
            (node, _), = by_sp[(node, f"{rdfns}rest")]
            out.append(first)
        return out

    # @list value object: ordered chain with mixed literal + @id members
    (head, head_kind), = by_sp[(f"{ex}Recipe", "http://schema.org/ingredients")]
    assert head_kind == "blank"
    assert chase(head) == ["flour", f"{ex}Egg"]
    # @container:@list term: a PLAIN array becomes an ordered collection
    (shead, _), = by_sp[(f"{ex}Recipe", "http://schema.org/steps")]
    assert chase(shead) == ["mix", "bake"]
    # @set unwraps to plain member triples (unordered)
    assert {o for o, _ in by_sp[(f"{ex}Recipe", "http://schema.org/tags")]} == \
        {"quick", "easy"}
    # empty @list -> rdf:nil directly
    assert by_sp[(f"{ex}Recipe", "http://schema.org/empty")] == \
        [(f"{rdfns}nil", "uri")]

    # the frame still feeds the ontology closure
    closure = {
        (r["descendant"], r["ancestor"], r["depth"])
        for r in subclass_closure(subclass_edges_from_triples(df)).collect()
    }
    assert (f"{ex}Recipe", f"{ex}Thing", 2) in closure

    # unknown keywords remain loud rejects
    bad = tmp_path / "unknown.jsonld"
    bad.write_text(json.dumps({"@id": "http://x/a", "@included": []}))
    with pytest.raises(ValueError, match="@included"):
        read_rdf_triples(spark, str(bad))


def test_jsonld_vendored_remote_context(spark, tmp_path):
    """Remote @context URLs resolve through the `contexts=` map (r5 — the
    air-gapped deployment pattern: vendor the context document next to
    the job): inline dict, full vendored document ({\"@context\": ...}),
    and local-file substitutes all work; an unmapped URL stays loud."""
    import json

    from ontoweaver_spark.loaders import read_jsonld, read_rdf_triples

    ex = "http://example.org/"
    doc = {
        "@context": ["https://schema.org", {"ex": ex}],
        "@id": "ex:a",
        "name": "vendored",
    }
    f = tmp_path / "remote_ctx.jsonld"
    f.write_text(json.dumps(doc))

    schema_ctx = {"@vocab": "http://schema.org/"}
    expected = (f"{ex}a", "http://schema.org/name", "vendored")

    # inline dict substitute
    rows = {
        (r["subject"], r["predicate"], r["object"])
        for r in read_jsonld(
            spark, str(f), contexts={"https://schema.org": schema_ctx}
        ).collect()
    }
    assert expected in rows

    # full vendored context DOCUMENT (the shape a saved schema.org
    # context file actually has)
    vendored = tmp_path / "schemaorg.jsonld"
    vendored.write_text(json.dumps({"@context": schema_ctx}))
    rows = {
        (r["subject"], r["predicate"], r["object"])
        for r in read_rdf_triples(
            spark, str(f), jsonld_contexts={"https://schema.org": str(vendored)}
        ).collect()
    }
    assert expected in rows

    # unmapped URL -> still loud
    with pytest.raises(ValueError, match="remote @context"):
        read_jsonld(spark, str(f), contexts={"https://other.org": {}})


def test_jsonld_nest(spark, tmp_path):
    """@nest (r5): nested properties flatten onto the ENCLOSING node —
    both the literal @nest key and a context term aliased to @nest
    (JSON-LD 1.1 expansion 13.4.8); a @value under @nest is the spec's
    invalid-@nest-value error."""
    import json

    from ontoweaver_spark.loaders import read_rdf_triples

    ex = "http://example.org/"
    doc = {
        "@context": {
            "ex": ex,
            "@vocab": "http://schema.org/",
            "labels": "@nest",  # term aliased to @nest
        },
        "@graph": [
            {"@id": "ex:a",
             "@nest": {"name": "direct", "rating": 5},
             "labels": {"alt": "aliased"}},
        ],
    }
    f = tmp_path / "nest.jsonld"
    f.write_text(json.dumps(doc))
    rows = {
        (r["subject"], r["predicate"], r["object"])
        for r in read_rdf_triples(spark, str(f)).collect()
    }
    # all nested properties attach to ex:a itself, no intermediate node
    assert (f"{ex}a", "http://schema.org/name", "direct") in rows
    assert (f"{ex}a", "http://schema.org/rating", "5") in rows
    assert (f"{ex}a", "http://schema.org/alt", "aliased") in rows
    assert len(rows) == 3

    bad = tmp_path / "badnest.jsonld"
    bad.write_text(json.dumps(
        {"@id": "http://x/a", "@nest": {"@value": 3}}
    ))
    with pytest.raises(ValueError, match="invalid @nest value"):
        read_rdf_triples(spark, str(bad))


def test_jsonld_reverse(spark, tmp_path):
    """@reverse (r5 — the last common JSON-LD keyword residue): both the
    node-object keyword and the context term-definition forms emit the
    reversed triple (value as subject, node as object), node-object
    values are expanded in place, and literal reverse values raise the
    spec's invalid-reverse-property-value error."""
    import json

    from ontoweaver_spark.loaders import read_rdf_triples
    from ontoweaver_spark.ontology import subclass_closure, subclass_edges_from_triples

    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    ex = "http://example.org/"
    doc = {
        "@context": {
            "ex": ex,
            "parent": {"@id": f"{rdfs}subClassOf", "@type": "@id"},
            # term-definition form: using `subtypes: X` means X subClassOf subj
            "subtypes": {"@reverse": f"{rdfs}subClassOf"},
        },
        "@graph": [
            # keyword form: Mammal has reverse subClassOf from Dog (IRI
            # reference) and an expanded-in-place node object for Cat
            {"@id": "ex:Mammal", "parent": "ex:Animal",
             "@reverse": {
                 "parent": [
                     "ex:Dog",
                     {"@id": "ex:Cat", "http://schema.org/name": "cat"},
                 ],
             }},
            # term-definition form, singleton value
            {"@id": "ex:Animal", "subtypes": "ex:Bird"},
        ],
    }
    f = tmp_path / "reverse.jsonld"
    f.write_text(json.dumps(doc))
    df = read_rdf_triples(spark, str(f))
    rows = {
        (r["subject"], r["predicate"], r["object"], r["object_kind"])
        for r in df.collect()
    }
    sub = f"{rdfs}subClassOf"
    # keyword form: value -> subject, node -> object
    assert (f"{ex}Dog", sub, f"{ex}Mammal", "uri") in rows
    assert (f"{ex}Cat", sub, f"{ex}Mammal", "uri") in rows
    # the node-object value was expanded in place
    assert (f"{ex}Cat", "http://schema.org/name", "cat", "literal") in rows
    # term-definition form
    assert (f"{ex}Bird", sub, f"{ex}Animal", "uri") in rows
    # forward triple untouched
    assert (f"{ex}Mammal", sub, f"{ex}Animal", "uri") in rows
    # reversed triples feed the closure like any others
    closure = {
        (r["descendant"], r["ancestor"], r["depth"])
        for r in subclass_closure(subclass_edges_from_triples(df)).collect()
    }
    assert (f"{ex}Dog", f"{ex}Animal", 2) in closure
    assert (f"{ex}Cat", f"{ex}Animal", 2) in closure
    assert (f"{ex}Bird", f"{ex}Animal", 1) in closure

    # literal reverse value -> the spec's error, loud
    bad = tmp_path / "badrev.jsonld"
    bad.write_text(json.dumps(
        {"@id": "http://x/a", "@reverse": {"http://x/p": "not a node"}}
    ))
    # a bare string IS an IRI reference; a @value object is the error
    bad.write_text(json.dumps(
        {"@id": "http://x/a", "@reverse": {"http://x/p": {"@value": 3}}}
    ))
    with pytest.raises(ValueError, match="invalid reverse property value"):
        read_rdf_triples(spark, str(bad))
