"""Whole-pipeline invariant: fused KG -> N-Triples -> loader -> graph
bridge is lossless, including ids that need escaping (unicode, spaces,
quotes, newlines in property values)."""

from urllib.parse import unquote

from ontoweaver_spark.loaders import read_rdf_triples
from ontoweaver_spark.ontology import graph_from_triples
from ontoweaver_spark.rdf_export import RDF_TYPE, graph_to_triples, serialize_ntriples

BASE = "urn:ow:"


def test_kg_ntriples_kg_roundtrip(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("d 1", "document", {"n_chars": ["12"], "tag": ["a", "b"]}),
         ("renéé", "person", {"quote": ['say "hi"\nok']}),
         ("plain", "entity", {})],
        "id string, label string, properties map<string, array<string>>",
    )
    edges = spark.createDataFrame(
        [("d 1", "renéé", "wrote"), ("plain", "d 1", "cites")],
        "src string, dst string, label string",
    )
    triples = graph_to_triples(nodes, edges, base=BASE)
    nt = "\n".join(
        r.line for r in serialize_ntriples(triples).select("line").collect()
    ) + "\n"
    p = tmp_path / "g.nt"
    p.write_text(nt, encoding="utf-8")

    loaded = read_rdf_triples(spark, str(p))
    rels = [f"{BASE}rel/wrote", f"{BASE}rel/cites"]
    n2, e2, p2 = graph_from_triples(
        loaded, relation_predicates=rels, type_predicate=RDF_TYPE
    )

    def dec(kind, v):
        pre = BASE + kind + "/"
        assert v.startswith(pre), v
        return unquote(v[len(pre):])

    got_nodes = {(dec("node", r.id), dec("class", r.label))
                 for r in n2.collect()}
    assert got_nodes == {("d 1", "document"), ("renéé", "person"),
                         ("plain", "entity")}
    got_edges = {(dec("node", r.src), dec("node", r.dst),
                  dec("rel", r.label)) for r in e2.collect()}
    assert got_edges == {("d 1", "renéé", "wrote"),
                         ("plain", "d 1", "cites")}
    got_props = {(dec("node", r.id), dec("prop", r.key), r.value)
                 for r in p2.collect()}
    assert got_props == {
        ("d 1", "n_chars", "12"), ("d 1", "tag", "a"), ("d 1", "tag", "b"),
        ("renéé", "quote", 'say "hi"\nok'),
    }
