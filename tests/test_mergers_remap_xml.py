"""Ontology label mergers, edge remapping, XML loader, submit packaging."""

from pyspark.sql import functions as F

from ontoweaver_spark.fusion import reconciliate_nodes, remap_edges
from ontoweaver_spark.loaders import read_xml_queries
from ontoweaver_spark.mergers import GenericType, SpecificType

# a small type tree:      thing
#                        /     \
#                   vehicle    animal
#                   /    \
#                 car   truck
PARENTS = {"car": "vehicle", "truck": "vehicle", "vehicle": "thing", "animal": "thing"}


def _merge_labels(spark, merger, labels):
    df = spark.createDataFrame([(labels,)], "vals array<string>")
    return df.select(merger(F.col("vals")).alias("m")).collect()[0]["m"]


def test_specific_type_lca(spark):
    m = SpecificType(PARENTS)
    assert _merge_labels(spark, m, ["car", "truck"]) == "vehicle"
    assert _merge_labels(spark, m, ["car", "animal"]) == "thing"
    assert _merge_labels(spark, m, ["car", "car"]) == "car"
    assert _merge_labels(spark, m, ["car", "vehicle"]) == "vehicle"
    assert _merge_labels(spark, m, ["car", "truck", "animal"]) == "thing"
    assert _merge_labels(spark, m, ["car", "unrelated"]) is None


def test_generic_type_common_descendant(spark):
    m = GenericType(PARENTS)
    assert _merge_labels(spark, m, ["car", "vehicle"]) == "car"
    assert _merge_labels(spark, m, ["thing", "truck"]) == "truck"
    assert _merge_labels(spark, m, ["car", "car"]) == "car"
    assert _merge_labels(spark, m, ["car", "animal"]) is None


def test_reconciliate_nodes_with_label_merger(spark):
    nodes = spark.createDataFrame(
        [("x", "car", {}), ("x", "truck", {}), ("y", "animal", {})],
        "id string, label string, properties map<string,array<string>>",
    )
    fused = reconciliate_nodes(nodes, raise_errors=True,
                               label_merger=SpecificType(PARENTS))
    got = {(r["id"], r["label"]) for r in fused.collect()}
    assert got == {("x", "vehicle"), ("y", "animal")}


def test_remap_edges(spark):
    edges = spark.createDataFrame(
        [("e1", "a", "b", "r", {}), ("e2", "b", "c", "r", {})],
        "id string, src string, dst string, label string, properties map<string,array<string>>",
    )
    mapping = spark.createDataFrame([("b", "B!")], "old_id string, new_id string")
    got = {(r["src"], r["dst"]) for r in remap_edges(edges, mapping).collect()}
    assert got == {("a", "B!"), ("B!", "c")}


def test_read_xml_queries(spark):
    xml = """
    <db>
      <item><name> n1 </name><val>1</val></item>
      <item><name>n2</name><val>2</val></item>
    </db>
    """
    df = read_xml_queries(spark, xml, {"name": "./item/name", "val": "./item/val"})
    got = sorted((r["name"], r["val"]) for r in df.collect())
    assert got == [("n1", "1"), ("n2", "2")]


def test_make_submit_zip_imports(tmp_path):
    import subprocess
    import sys
    import zipfile

    out = subprocess.run(
        [sys.executable, "scripts/make_submit.py"], capture_output=True, text=True,
        cwd="/root/repo",
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("ontoweaver_spark.zip")
    names = zipfile.ZipFile(zip_path).namelist()
    assert "ontoweaver_spark/__init__.py" in names
    assert "ontoweaver_spark/compiler.py" in names
    # the zip alone must satisfy the import (py-files semantics)
    check = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "import ontoweaver_spark.spec as s; "
         "m = s.parse_mapping({'row': {'map': {'id_from_column': 'a', 'to_subject': 't'}}}); "
         "print(m.subject.node_type)",
         zip_path],
        capture_output=True, text=True,
    )
    assert check.stdout.strip() == "t", check.stderr
