"""Golden tests for fusion with custom per-property mergers (F9), null-skip
semantics (F10), and split+match+final_type (F11).

References: /root/reference/tests/test_fusion.py:17-120,
/root/reference/tests/test_transformer_empty_values.py:15-43,
/root/reference/tests/test_transformer_split.py:9-41.
"""

import yaml
from pyspark.sql import functions as F

from ontoweaver_spark import extract, mergers, reconciliate, weave
from ontoweaver_spark.mergers import render_properties

from .golden import assert_graph

FUSION_MAPPING = yaml.safe_load("""
row:
    map:
        id_from_column: alteration
        match_type_from_column: alt_type
        match:
            - SNP:
                to_subject: SNP
            - CNV:
                to_subject: CNV
transformers:
    - map:
        column: drug
        to_object: drug
        via_relation: biomarker
    - map:
        column: ref
        to_property: ref
        for_object: drug
    - map:
        column: escat
        to_property: escat
        for_object: drug
""")


def test_fusion_custom_mergers(spark):
    rows = [("gA1", "SNP", "D", "Ma", "1"), ("gA2", "CNV", "D", "Yu", "3")]
    df = spark.createDataFrame(
        rows, "alteration string, alt_type string, drug string, ref string, escat string"
    )
    nodes, edges = extract(df, FUSION_MAPPING, affix="none")
    fnodes, fedges = reconciliate(nodes, edges)
    # EP3 analog: per-property mergers — escat: max(int), ref: OrderedSet(";")
    rendered = render_properties(
        fnodes, sep=";",
        prop_mergers={"escat": mergers.NumericMax(), "ref": mergers.OrderedSet(";")},
    )
    got = {(r["id"], r["label"], tuple(sorted((r["properties"] or {}).items())))
           for r in rendered.collect()}
    assert ("D", "drug", (("escat", "3"), ("ref", "Ma;Yu"))) in got
    assert ("gA1", "SNP", ()) in got
    assert ("gA2", "CNV", ()) in got
    # both rows produced an edge to the same drug -> fused to one
    assert fedges.where((F.col("label") == "biomarker")).count() == 2


EMPTY_VALUES_MAPPING = yaml.safe_load("""
row:
    map:
        id_from_column: name
        match_type_from_column: genre
        match:
            - Male:
                to_subject: Male
            - Female:
                to_subject: Female
transformers:
    - map:
        column: is_child_of
        to_object: Male
        via_relation: is_child_of
""")


def test_transformer_empty_values(spark):
    rows = [
        ("0", "father_1", "Male", None),
        ("1", "child _nb_1_of_0", "Female", "father_1"),
        ("2", "child _nb_2_of_0", "Female", "father_1"),
        ("3", "child _nb_3_of_0", "Male", "father_1"),
        ("4", "father_2", "Male", None),
        ("5", "father_3", "Male", None),
        ("6", "child _nb_1_of_2", "Male", "father_3"),
        ("7", "child _nb_2_of_2", "Male", "father_3"),
    ]
    df = spark.createDataFrame(
        rows, "idx string, name string, genre string, is_child_of string"
    )
    nodes, edges = extract(df, EMPTY_VALUES_MAPPING, affix="none")
    # empty is_child_of cells produce no node/edge (base.is_not_null semantics)
    assert nodes.count() == 13
    assert edges.count() == 5


SPLIT_MATCH_MAPPING = yaml.safe_load("""
row:
    rowIndex:
        to_subject: Variant
transformers:
    - split:
        separator: "; "
        id_from_column: target_genesymbol
        match_type_from_column: entity_type_target
        match:
          - protein:
                to_object: target_gene
                final_type: gene
                via_relation: transcript_to_gene_relationship
""")


def test_split_match_final_type(spark):
    # row 0 has a null match column (no branch hit -> dropped);
    # row 1 splits into two gene nodes
    rows = [("PCNA", None), ("Cyp3a41a; Cyp3a41b", "protein")]
    df = spark.createDataFrame(rows, "target_genesymbol string, entity_type_target string")
    fnodes, fedges = weave(df, SPLIT_MATCH_MAPPING, affix="suffix")
    got = {(r["id"], r["label"]) for r in fnodes.collect()}
    assert got == {
        ("0:Variant", "Variant"), ("1:Variant", "Variant"),
        ("Cyp3a41a:gene", "gene"), ("Cyp3a41b:gene", "gene"),
    }
    got_e = {(r["src"], r["dst"], r["label"]) for r in fedges.collect()}
    assert got_e == {
        ("1:Variant", "Cyp3a41a:gene", "transcript_to_gene_relationship"),
        ("1:Variant", "Cyp3a41b:gene", "transcript_to_gene_relationship"),
    }


def test_split_match_simple(spark):
    # /root/reference/tests/test_transformer_split.py::test_transformer_split_match
    rows = [("P1;P2", "T1"), ("P3;P4", "T2"), ("P5;P6", "T1"), ("P7", "T2"), ("P0", "T0")]
    df = spark.createDataFrame(rows, "Patient string, Type string")
    mapping = yaml.safe_load("""
row:
    rowIndex:
        to_subject: Row
transformers:
    - split:
        separator: ";"
        column: Patient
        match_type_from_column: Type
        match:
            - T1:
                to_object: type1_patient
                via_relation: has_type1
            - T2:
                to_object: type2_patient
                via_relation: has_type2
""")
    fnodes, fedges = weave(df, mapping, affix="none")
    by_label = {
        r["label"]: r["n"]
        for r in fnodes.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    # T0 row yields only its subject; P0 matches no branch
    assert by_label == {"Row": 5, "type1_patient": 4, "type2_patient": 3}
