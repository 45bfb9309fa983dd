"""autoschema derivation + heavy-hitter salt suggestion."""

from pyspark.sql import functions as F

from ontoweaver_spark.fusion import suggest_salt
from ontoweaver_spark.spec import load_mapping


def test_autoschema_shapes():
    mapping = {
        "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
        "transformers": [
            {"map": {"column": "lang", "to_object": "lang_tmp",
                     "via_relation": "in_language", "final_type": "language"}},
            {"map": {"column": "source", "to_object": "source",
                     "via_relation": "from_source", "reverse_relation": "has_doc"}},
            {"map": {"column": "owner", "to_object": "person",
                     "via_relation": "owned_by", "from_subject": "source"}},
            {"map": {"column": "n_chars", "to_properties": ["n_chars"]}},
        ],
        "metadata": [{"pipeline": "x"}],
    }
    schema = load_mapping(mapping).autoschema()

    assert schema["document"]["represented_as"] == "node"
    assert "n_chars" in schema["document"]["properties"]
    assert "pipeline" in schema["document"]["properties"]
    # final_type wins over the temporary label
    assert "language" in schema and "lang_tmp" not in schema
    assert schema["in_language"] == {
        "represented_as": "edge", "source": ["document"],
        "target": ["language"], "properties": ["pipeline"],
    }
    # reverse edge flips source/target
    assert schema["has_doc"]["source"] == ["source"]
    assert schema["has_doc"]["target"] == ["document"]
    # from_subject re-roots the edge source
    assert schema["owned_by"]["source"] == ["source"]
    assert schema["owned_by"]["target"] == ["person"]


def test_autoschema_cli(tmp_path):
    import json
    import subprocess
    import sys

    import yaml

    mpath = tmp_path / "m.yaml"
    mpath.write_text(
        "row:\n  map:\n    id_from_column: a\n    to_subject: thing\n"
        "transformers:\n  - map:\n      column: b\n      to_object: other\n"
        "      via_relation: rel\n"
    )
    out = tmp_path / "schema.yaml"
    r = subprocess.run(
        [sys.executable, "-m", "ontoweaver_spark", f"data.parquet:{mpath}",
         "--out", str(tmp_path), "--auto-schema", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["types"] == 3
    schema = yaml.safe_load(out.read_text())
    assert schema["rel"]["source"] == ["thing"]


def test_suggest_salt(spark):
    # one hub key with ~90% of rows, tiny tail
    df = spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hub")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("id")
    )
    salt = suggest_salt(df, ["id"], sample_fraction=0.05, rows_per_task=10_000)
    assert salt >= 2  # hub ~90k rows -> split into ~9+ partial groups
    assert salt <= 256

    uniform = spark.range(0, 10_000).select(F.col("id").cast("string").alias("id"))
    assert suggest_salt(uniform, ["id"], sample_fraction=0.2, rows_per_task=10_000) == 0
