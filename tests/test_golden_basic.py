"""Golden-parity tests for the basic fixture families (F1, F2, F4).

Expected tuples are hardcoded from the reference's own tests —
/root/reference/tests/test_simplest.py:10-23,
/root/reference/tests/test_affix_separator.py:10-27,
/root/reference/tests/test_multi_type_transformer.py:12-35 — so the
reference never needs to run here.
"""

import yaml

from ontoweaver_spark import weave

from .golden import assert_graph

SIMPLEST_MAPPING = yaml.safe_load("""
row:
   rowIndex:
      to_subject: variant
transformers:
    - map:
        columns:
            - patient
        to_object: patient
        via_relation: patient_has_variant
""")


def _simplest_df(spark, extra_publication=False):
    if extra_publication:
        rows = [("0", "A", "publicationA"), ("1", "B", "publicationB"), ("2", "C", "publicationC")]
        return spark.createDataFrame(rows, "variant_id string, patient string, publication string")
    rows = [("0", "A"), ("1", "B"), ("2", "C")]
    return spark.createDataFrame(rows, "variant_id string, patient string")


def test_simplest(spark):
    df = _simplest_df(spark)
    fnodes, fedges = weave(df, SIMPLEST_MAPPING, affix="none", reconciliate_sep=",")
    expected_nodes = [
        ("0", "variant", {}), ("1", "variant", {}), ("2", "variant", {}),
        ("A", "patient", {}), ("B", "patient", {}), ("C", "patient", {}),
    ]
    expected_edges = [
        ("", "0", "A", "patient_has_variant", {}),
        ("", "1", "B", "patient_has_variant", {}),
        ("", "2", "C", "patient_has_variant", {}),
    ]
    assert_graph(fnodes, fedges, expected_nodes, expected_edges)


AFFIX_MAPPING = yaml.safe_load("""
row:
   rowIndex:
      to_subject: variant
transformers:
    - map:
        columns:
            - patient
        to_object: patient
        via_relation: patient_has_variant
    - map:
        columns:
            - publication
        to_object: publication
        via_relation: publication_to_variant
""")


def test_affix_separator(spark):
    df = _simplest_df(spark, extra_publication=True)
    fnodes, fedges = weave(df, AFFIX_MAPPING, affix="prefix", type_affix_sep="___")
    expected_nodes = [
        ("patient___A", "patient", {}), ("patient___B", "patient", {}),
        ("patient___C", "patient", {}),
        ("publication___publicationA", "publication", {}),
        ("publication___publicationB", "publication", {}),
        ("publication___publicationC", "publication", {}),
        ("variant___0", "variant", {}), ("variant___1", "variant", {}),
        ("variant___2", "variant", {}),
    ]
    expected_edges = [
        ("", "variant___0", "patient___A", "patient_has_variant", {}),
        ("", "variant___0", "publication___publicationA", "publication_to_variant", {}),
        ("", "variant___1", "patient___B", "patient_has_variant", {}),
        ("", "variant___1", "publication___publicationB", "publication_to_variant", {}),
        ("", "variant___2", "patient___C", "patient_has_variant", {}),
        ("", "variant___2", "publication___publicationC", "publication_to_variant", {}),
    ]
    assert_graph(fnodes, fedges, expected_nodes, expected_edges)


MULTI_TYPE_MAPPING = yaml.safe_load("""
row:
   rowIndex:
      to_subject: variant
transformers:
    - map:
        column: patient
        match:
            - B:
                to_object: patient
                via_relation: patient_has_variant
            - A:
                to_object: disease
                via_relation: variant_to_disease
            - C:
                to_object: oncogenicity
                via_relation: variant_to_oncogenicity
    - cat:
        columns:
          - patient
          - variant_id
        to_properties:
          - whatever
        for_objects:
          - disease
          - variant_to_oncogenicity
          - variant
    - string:
        value: "Whatever it is"
        to_properties:
          - something
        for_objects:
          - patient
          - disease
          - variant_to_disease
""")


def test_multi_type_transformer(spark):
    df = _simplest_df(spark)
    fnodes, fedges = weave(df, MULTI_TYPE_MAPPING, affix="suffix", reconciliate_sep=",")
    expected_nodes = [
        ("A:disease", "disease", {"whatever": "A0", "something": "Whatever it is"}),
        ("1:variant", "variant", {"whatever": "B1"}),
        ("0:variant", "variant", {"whatever": "A0"}),
        ("C:oncogenicity", "oncogenicity", {}),
        ("2:variant", "variant", {"whatever": "C2"}),
        ("B:patient", "patient", {"something": "Whatever it is"}),
    ]
    expected_edges = [
        ("", "1:variant", "B:patient", "patient_has_variant", {}),
        ("", "0:variant", "A:disease", "variant_to_disease", {"something": "Whatever it is"}),
        ("", "2:variant", "C:oncogenicity", "variant_to_oncogenicity", {"whatever": "C2"}),
    ]
    assert_graph(fnodes, fedges, expected_nodes, expected_edges)
