"""Golden-parity tests for branching / final_type / reverse-edge /
from_subject fixture families (F5-F8).

Expected tuples hardcoded from the reference's own tests:
/root/reference/tests/test_type_branch_from_column.py,
/root/reference/tests/test_final_type.py,
/root/reference/tests/test_reverse_edge.py,
/root/reference/tests/test_edges_between_columns.py.
"""

import yaml

from ontoweaver_spark import extract, weave

from .golden import assert_graph

FURNITURE_ROWS = [
    ("chair", "kitchen", "n", "Peter"),
    ("sofa", "bathroom", "y", "Paul"),
    ("fridge", "kitchen", "n", "Mary"),
]
FURNITURE_SCHEMA = "furniture string, localisation string, `will_sit?` string, name string"

MATCH_FROM_COLUMN_MAPPING = yaml.safe_load("""
row:
   map:
      id_from_column: furniture
      match_type_from_column: localisation
      match:
        - kitchen:
            to_subject: kitchen_furniture
        - ^(?!kitchen$).*:
            to_subject: rest_of_house_furniture
transformers:
    - map:
        id_from_column: name
        match_type_from_column: will_sit?
        match:
            - y:
                to_object: person
                via_relation: will_sit
            - n:
                to_object: person
                via_relation: will_not_sit
    - cat:
        columns:
            - name
            - localisation
        to_property: localisation
metadata:
  - blabla: blabla
  - add_source_column_names_as: source_columns
""")


def test_match_type_from_column(spark):
    df = spark.createDataFrame(FURNITURE_ROWS, FURNITURE_SCHEMA)
    fnodes, fedges = weave(df, MATCH_FROM_COLUMN_MAPPING, affix="suffix", reconciliate_sep=",")
    expected_nodes = [
        ("fridge:kitchen_furniture", "kitchen_furniture",
         {"localisation": "Marykitchen", "blabla": "blabla", "source_columns": "furniture"}),
        ("Peter:person", "person", {"blabla": "blabla", "source_columns": "name"}),
        ("sofa:rest_of_house_furniture", "rest_of_house_furniture",
         {"localisation": "Paulbathroom", "blabla": "blabla", "source_columns": "furniture"}),
        ("chair:kitchen_furniture", "kitchen_furniture",
         {"localisation": "Peterkitchen", "blabla": "blabla", "source_columns": "furniture"}),
        ("Paul:person", "person", {"blabla": "blabla", "source_columns": "name"}),
        ("Mary:person", "person", {"blabla": "blabla", "source_columns": "name"}),
    ]
    expected_edges = [
        ("", "sofa:rest_of_house_furniture", "Paul:person", "will_sit", {"blabla": "blabla"}),
        ("", "chair:kitchen_furniture", "Peter:person", "will_not_sit", {"blabla": "blabla"}),
        ("", "fridge:kitchen_furniture", "Mary:person", "will_not_sit", {"blabla": "blabla"}),
    ]
    assert_graph(fnodes, fedges, expected_nodes, expected_edges)


FINAL_TYPE_MAPPING = yaml.safe_load("""
row:
   map:
      id_from_column: furniture
      match_type_from_column: localisation
      final_type: aaaaaa
      match:
        - kitchen:
            to_subject: kitchen_furniture
            final_type: bbbbbb
        - ^(?!kitchen$).*:
            to_subject: rest_of_house_furniture
transformers:
    - map:
        id_from_column: name
        match_type_from_column: will_sit?
        match:
            - y:
                to_object: person
                via_relation: will_sit
                final_type: cccccc
            - n:
                to_object: person
                via_relation: will_not_sit
                final_type: dddddd
    - map:
        column: localisation
        to_object: localisation
        final_type: eeeeee
        via_relation: has_localisation
    - cat:
        columns:
            - name
            - localisation
        to_property: localisation
metadata:
  - blabla: blabla
  - add_source_column_names_as: source_columns
""")


def test_final_type(spark):
    df = spark.createDataFrame(FURNITURE_ROWS, FURNITURE_SCHEMA)
    fnodes, fedges = weave(df, FINAL_TYPE_MAPPING, affix="suffix", reconciliate_sep=",")
    expected_nodes = [
        ("chair:aaaaaa", "aaaaaa",
         {"localisation": "Peterkitchen", "blabla": "blabla", "source_columns": "furniture"}),
        ("kitchen:eeeeee", "eeeeee", {"blabla": "blabla", "source_columns": "localisation"}),
        ("Paul:cccccc", "cccccc", {"blabla": "blabla", "source_columns": "name"}),
        ("bathroom:eeeeee", "eeeeee", {"blabla": "blabla", "source_columns": "localisation"}),
        ("Mary:dddddd", "dddddd", {"blabla": "blabla", "source_columns": "name"}),
        ("sofa:aaaaaa", "aaaaaa",
         {"localisation": "Paulbathroom", "blabla": "blabla", "source_columns": "furniture"}),
        ("fridge:aaaaaa", "aaaaaa",
         {"localisation": "Marykitchen", "blabla": "blabla", "source_columns": "furniture"}),
        ("Peter:dddddd", "dddddd", {"blabla": "blabla", "source_columns": "name"}),
    ]
    expected_edges = [
        ("", "chair:aaaaaa", "kitchen:eeeeee", "has_localisation", {"blabla": "blabla"}),
        ("", "chair:aaaaaa", "Peter:dddddd", "will_not_sit", {"blabla": "blabla"}),
        ("", "fridge:aaaaaa", "Mary:dddddd", "will_not_sit", {"blabla": "blabla"}),
        ("", "sofa:aaaaaa", "Paul:cccccc", "will_sit", {"blabla": "blabla"}),
        ("", "sofa:aaaaaa", "bathroom:eeeeee", "has_localisation", {"blabla": "blabla"}),
        ("", "fridge:aaaaaa", "kitchen:eeeeee", "has_localisation", {"blabla": "blabla"}),
    ]
    assert_graph(fnodes, fedges, expected_nodes, expected_edges)


REVERSE_EDGE_MAPPING = yaml.safe_load("""
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
                reverse_relation: variant_of_patient
            - A:
                to_object: disease
                via_relation: variant_to_disease
            - C:
                to_object: oncogenicity
                via_relation: variant_to_oncogenicity
                reverse_relation: oncogenicity_of_variant
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
          - variant_of_patient
    - string:
        value: "Whatever it is"
        to_properties:
          - something
        for_objects:
          - patient
          - disease
          - variant_to_disease
          - oncogenicity_of_variant
metadata:
    - database_name: my_database
""")


def test_reverse_edge(spark):
    rows = [("0", "A"), ("1", "B"), ("2", "C")]
    df = spark.createDataFrame(rows, "variant_id string, patient string")
    fnodes, fedges = weave(df, REVERSE_EDGE_MAPPING, affix="suffix", reconciliate_sep=",")
    expected_nodes = [
        ("0:variant", "variant", {"whatever": "A0", "database_name": "my_database"}),
        ("A:disease", "disease",
         {"whatever": "A0", "something": "Whatever it is", "database_name": "my_database"}),
        ("1:variant", "variant", {"whatever": "B1", "database_name": "my_database"}),
        ("B:patient", "patient", {"something": "Whatever it is", "database_name": "my_database"}),
        ("2:variant", "variant", {"whatever": "C2", "database_name": "my_database"}),
        ("C:oncogenicity", "oncogenicity", {"database_name": "my_database"}),
    ]
    expected_edges = [
        ("", "0:variant", "A:disease", "variant_to_disease",
         {"something": "Whatever it is", "database_name": "my_database"}),
        ("", "1:variant", "B:patient", "patient_has_variant", {"database_name": "my_database"}),
        ("", "B:patient", "1:variant", "variant_of_patient",
         {"whatever": "B1", "database_name": "my_database"}),
        ("", "2:variant", "C:oncogenicity", "variant_to_oncogenicity",
         {"whatever": "C2", "database_name": "my_database"}),
        ("", "C:oncogenicity", "2:variant", "oncogenicity_of_variant",
         {"something": "Whatever it is", "database_name": "my_database"}),
    ]
    assert_graph(fnodes, fedges, expected_nodes, expected_edges)


def test_reverse_edges_from_subject(spark):
    # /root/reference/tests/test_reverse_edge.py::test_reverse_edges_from_subject
    df = spark.createDataFrame(
        [("sA", "x1", "y1"), ("sB", "x2", "y2")], "s string, x string, y string"
    )
    mapping = yaml.safe_load("""
row:
    map:
        column: s
        to_subject: s
transformers:
    - map:
        columns: x
        to_object: x
        via_relation: s_x
        reverse_relation: x_s
    - map:
        column: y
        from_subject: x
        to_object: y
        via_relation: x_y
        reverse_relation: y_x
""")
    nodes, edges = extract(df, mapping, affix="none")
    assert nodes.count() == 2 * 3
    assert edges.count() == 2 * 2 * 2
    got = {(r["src"], r["dst"], r["label"]) for r in edges.collect()}
    assert got == {
        ("sA", "x1", "s_x"), ("x1", "sA", "x_s"), ("x1", "y1", "x_y"), ("y1", "x1", "y_x"),
        ("sB", "x2", "s_x"), ("x2", "sB", "x_s"), ("x2", "y2", "x_y"), ("y2", "x2", "y_x"),
    }


EDGES_BETWEEN_COLUMNS_MAPPING = yaml.safe_load("""
row:
    map:
        columns:
            - id
        to_subject: variant
transformers:
    - map:
          columns:
              - patient
          to_object: patient
          via_relation: patient_has_variant
    - map:
          columns:
              - sample
          to_object: sample
          via_relation: variant_in_sample
    - map:
        columns:
          - patient
        from_subject: sample
        to_object: patient
        via_relation: sample_to_patient
""")


def test_edges_between_columns(spark):
    rows = [(str(i), f"patient{i+1}", f"sample{i+1}") for i in range(4)]
    df = spark.createDataFrame(rows, "id string, patient string, sample string")
    fnodes, fedges = weave(df, EDGES_BETWEEN_COLUMNS_MAPPING, affix="suffix", reconciliate_sep=",")
    expected_nodes = (
        [(f"{i}:variant", "variant", {}) for i in range(4)]
        + [(f"patient{i}:patient", "patient", {}) for i in range(1, 5)]
        + [(f"sample{i}:sample", "sample", {}) for i in range(1, 5)]
    )
    expected_edges = (
        [("", f"{i}:variant", f"patient{i+1}:patient", "patient_has_variant", {}) for i in range(4)]
        + [("", f"{i}:variant", f"sample{i+1}:sample", "variant_in_sample", {}) for i in range(4)]
        + [("", f"sample{i}:sample", f"patient{i}:patient", "sample_to_patient", {}) for i in range(1, 5)]
    )
    assert_graph(fnodes, fedges, expected_nodes, expected_edges)
