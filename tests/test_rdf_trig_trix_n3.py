"""TriG / TriX / N3 loaders — the last serializations from the reference's
rdflib format table (/root/reference/src/ontoweaver/loader.py:345-360).
All three land in the same flat triple frame as .nt/.ttl/.owl/.jsonld."""

import pytest

from ontoweaver_spark.loaders import (
    _unwrap_trig,
    read_rdf_triples,
    read_trig,
    read_trix,
)


def _rows(df):
    return {
        (r["subject"], r["predicate"], r["object"], r["object_kind"],
         r["object_lang"], r["object_datatype"])
        for r in df.collect()
    }


EX = "http://example.org/"


def test_trig_named_graphs_flatten(spark, tmp_path):
    """GRAPH-keyword, bare-label and anonymous blocks, default-graph
    top-level triples, SPARQL-style PREFIX, a block-final statement with
    no '.', and a ';' continuation inside a block all unwrap into one
    triple table."""
    f = tmp_path / "g.trig"
    f.write_text(
        f"""@prefix ex: <{EX}> .
PREFIX sc: <http://schema.org/>
# default graph triples are legal TriG
ex:top sc:name "toplevel" .
GRAPH ex:g1 {{
  ex:a ex:p ex:b .
  ex:a sc:name "Aay"@en ;
       sc:rank 3 .
}}
ex:g2 {{ ex:c ex:p ex:d }}
{{ ex:e ex:p "anon graph" . }}
"""
    )
    rows = _rows(read_rdf_triples(spark, str(f)))
    assert (f"{EX}top", "http://schema.org/name", "toplevel",
            "literal", None, None) in rows
    assert (f"{EX}a", f"{EX}p", f"{EX}b", "uri", None, None) in rows
    assert (f"{EX}a", "http://schema.org/name", "Aay", "literal", "en", None) in rows
    assert any(s == f"{EX}a" and p == "http://schema.org/rank" and o == "3"
               for s, p, o, *_ in rows)
    # bare-label block whose final statement omits the '.'
    assert (f"{EX}c", f"{EX}p", f"{EX}d", "uri", None, None) in rows
    # anonymous (default-graph) block
    assert (f"{EX}e", f"{EX}p", "anon graph", "literal", None, None) in rows
    assert len(rows) == 6


def test_trig_unwrap_edge_cases(tmp_path):
    # pname-internal dots and decimals are not statement terminators
    stmts = _unwrap_trig(
        "ex:g { ex:foo.bar ex:p 1.5 . }", "t.trig"
    )
    assert stmts == ["ex:foo.bar ex:p 1.5 ."]
    # '#' inside a literal or URI is content; outside it's a comment
    stmts = _unwrap_trig(
        '<http://x/a#f> <http://x/p> "ha # ha" . # trailing\n', "t.trig"
    )
    assert stmts == ['<http://x/a#f> <http://x/p> "ha # ha" .']
    # nested brace = N3 formula, not TriG
    with pytest.raises(ValueError, match="formulas"):
        _unwrap_trig("ex:g { { ex:a ex:p ex:b } ex:q ex:c }", "t.trig")
    with pytest.raises(ValueError, match="dangling"):
        _unwrap_trig("ex:a ex:p ex:b", "t.trig")
    with pytest.raises(ValueError, match="unbalanced"):
        _unwrap_trig("}", "t.trig")
    with pytest.raises(ValueError, match="unclosed"):
        _unwrap_trig("ex:g {", "t.trig")
    with pytest.raises(ValueError, match="before '{'"):
        _unwrap_trig("ex:a ex:p { ex:c ex:p ex:d }", "t.trig")


def test_trix_loader(spark, tmp_path):
    ns = "http://www.w3.org/2004/03/trix/trix-1/"
    f = tmp_path / "g.trix"
    f.write_text(
        f"""<?xml version="1.0"?>
<TriX xmlns="{ns}" xmlns:xml="http://www.w3.org/XML/1998/namespace">
  <graph>
    <uri>{EX}g1</uri>
    <triple>
      <uri>{EX}a</uri><uri>{EX}p</uri><uri>{EX}b</uri>
    </triple>
    <triple>
      <id>n1</id><uri>{EX}name</uri>
      <plainLiteral xml:lang="fr">Ah</plainLiteral>
    </triple>
  </graph>
  <graph>
    <triple>
      <uri>{EX}c</uri><uri>{EX}rank</uri>
      <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">7</typedLiteral>
    </triple>
  </graph>
</TriX>
"""
    )
    rows = _rows(read_rdf_triples(spark, str(f)))
    assert rows == {
        (f"{EX}a", f"{EX}p", f"{EX}b", "uri", None, None),
        ("_:n1", f"{EX}name", "Ah", "literal", "fr", None),
        (f"{EX}c", f"{EX}rank", "7", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
    }

    bad = tmp_path / "bad.trix"
    bad.write_text(f'<TriX xmlns="{ns}"><graph><triple><uri>a</uri>'
                   f"<uri>b</uri></triple></graph></TriX>")
    with pytest.raises(ValueError, match="2 terms"):
        read_trix(spark, str(bad))


def test_n3_turtle_subset_and_logic_reject(spark, tmp_path):
    """.n3 parses via the Turtle path (what published .n3 files are);
    genuine N3 logic fails loudly instead of silently dropping rules."""
    ok = tmp_path / "onto.n3"
    ok.write_text(
        f"@prefix ex: <{EX}> .\n"
        f'ex:a ex:p ex:b .\nex:a ex:name "A # not a comment" .\n'
    )
    rows = _rows(read_rdf_triples(spark, str(ok)))
    assert (f"{EX}a", f"{EX}p", f"{EX}b", "uri", None, None) in rows
    assert (f"{EX}a", f"{EX}name", "A # not a comment", "literal", None, None) in rows

    for logic in (
        "{ ?x ex:p ex:b } => { ?x ex:q ex:c } .",
        "@forAll :x .",
        "ex:a = ex:b .",
        "?who ex:p ex:b .",
    ):
        bad = tmp_path / "logic.n3"
        bad.write_text(f"@prefix ex: <{EX}> .\n{logic}\n")
        with pytest.raises(ValueError, match="Turtle-compatible subset"):
            read_rdf_triples(spark, str(bad))

    # a URI containing '=' (query string) must NOT trip the sameAs guard
    ok2 = tmp_path / "q.n3"
    ok2.write_text(f"<{EX}s?k=v> <{EX}p> <{EX}o> .\n")
    assert (f"{EX}s?k=v", f"{EX}p", f"{EX}o", "uri", None, None) in _rows(
        read_rdf_triples(spark, str(ok2))
    )
