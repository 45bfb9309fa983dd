"""Unit tests for the transformer operator algebra — one tiny mapping per
operator, exercising the compiled Column expressions end-to-end through
``extract`` (mirrors the reference's per-transformer unit tests,
SURVEY.md §5 pattern 2)."""

import yaml

from ontoweaver_spark import extract

BASE_ROW = {"row": {"map": {"id_from_column": "k", "to_subject": "subj"}}}


def _run(spark, rows, schema, transformer_yaml, affix="none"):
    df = spark.createDataFrame(rows, schema)
    mapping = dict(BASE_ROW)
    mapping["transformers"] = yaml.safe_load(transformer_yaml)
    nodes, edges = extract(df, mapping, affix=affix)
    return nodes, edges


def _object_ids(nodes, label="obj"):
    return sorted(r["id"] for r in nodes.collect() if r["label"] == label)


def test_map_multi_column(spark):
    nodes, _ = _run(
        spark, [("k1", "a", "b")], "k string, c1 string, c2 string",
        "- map: {columns: [c1, c2], to_object: obj, via_relation: rel}",
    )
    assert _object_ids(nodes) == ["a", "b"]


def test_split_separator_and_trim(spark):
    nodes, _ = _run(
        spark, [("k1", "x ; y;z ")], "k string, c string",
        '- split: {column: c, separator: ";", to_object: obj, via_relation: rel}',
    )
    assert _object_ids(nodes) == ["x", "y", "z"]


def test_cat(spark):
    nodes, _ = _run(
        spark, [("k1", "foo", "bar")], "k string, c1 string, c2 string",
        "- cat: {columns: [c1, c2], to_object: obj, via_relation: rel}",
    )
    assert _object_ids(nodes) == ["foobar"]


def test_cat_format(spark):
    nodes, _ = _run(
        spark, [("k1", "foo", "bar")], "k string, c1 string, c2 string",
        '- cat_format: {columns: [c1, c2], format_string: "{c1}-X-{c2}", to_object: obj, via_relation: rel}',
    )
    assert _object_ids(nodes) == ["foo-X-bar"]


def test_string_constant(spark):
    nodes, _ = _run(
        spark, [("k1", "v")], "k string, c string",
        '- string: {value: "const", to_object: obj, via_relation: rel}',
    )
    assert _object_ids(nodes) == ["const"]


def test_case_operators(spark):
    nodes, _ = _run(
        spark, [("k1", "hELLo wOrLD")], "k string, c string",
        """
- lower: {column: c, to_object: lo, via_relation: rel}
- upper: {column: c, to_object: up, via_relation: rel}
- capitalize: {column: c, to_object: cap, via_relation: rel}
- lower_capitalize: {column: c, to_object: lc, via_relation: rel}
""",
    )
    assert _object_ids(nodes, "lo") == ["hello world"]
    # documented uppercase semantics (the reference's own `upper` has a
    # lowercase bug, transformer.py:671)
    assert _object_ids(nodes, "up") == ["HELLO WORLD"]
    # Python str.capitalize, not initcap
    assert _object_ids(nodes, "cap") == ["Hello world"]
    assert _object_ids(nodes, "lc") == ["Hello world"]


def test_translate_policies(spark):
    rows = [("k1", "AA"), ("k2", "BB"), ("k3", "ZZ")]
    # skip (default): unknown ZZ dropped
    nodes, _ = _run(
        spark, rows, "k string, c string",
        "- translate: {column: c, translations: {AA: alpha, BB: beta}, to_object: obj, via_relation: rel}",
    )
    assert _object_ids(nodes) == ["alpha", "beta"]
    # keep: unknown passes through
    nodes, _ = _run(
        spark, rows, "k string, c string",
        "- translate: {column: c, translations: {AA: alpha, BB: beta}, on_unknown_value: keep, to_object: obj, via_relation: rel}",
    )
    assert _object_ids(nodes) == ["ZZ", "alpha", "beta"]


def test_translate_file_spark_path(spark, tmp_path, monkeypatch):
    """Above TRANSLATE_FILE_SPARK_MIN_BYTES the alias table is read by
    Spark and broadcast-joined — the driver-side pandas loader must never
    run, and results must match the small-file dict path (including
    last-occurrence-wins on duplicate keys and the keep policy)."""
    import pandas as pd

    from ontoweaver_spark import transformers as tmod

    f = tmp_path / "aliases.csv"
    f.write_text("frm,to\nAA,old_alpha\nBB,beta\nAA,alpha\n,\nnan,nan\n")
    yaml_t = (
        f'- translate: {{column: c, translations_file: "{f}", translate_from: frm, '
        f'translate_to: to, on_unknown_value: keep, to_object: obj, via_relation: rel}}'
    )
    rows = [("k1", "AA"), ("k2", "BB"), ("k3", "ZZ")]

    # small-file (driver dict) result as the baseline
    baseline, _ = _run(spark, rows, "k string, c string", yaml_t)
    assert _object_ids(baseline) == ["ZZ", "alpha", "beta"]

    # force the Spark-read path and forbid pandas entirely
    monkeypatch.setattr(tmod, "TRANSLATE_FILE_SPARK_MIN_BYTES", 0)

    def _boom(*a, **k):  # the alias table must not materialize driver-side
        raise AssertionError("pandas loader called on the Spark path")

    monkeypatch.setattr(pd, "read_csv", _boom)
    monkeypatch.setattr(pd, "read_parquet", _boom)

    nodes, _ = _run(spark, rows, "k string, c string", yaml_t)
    assert _object_ids(nodes) == ["ZZ", "alpha", "beta"]


def test_split_translate(spark):
    nodes, _ = _run(
        spark, [("k1", "a;b;q")], "k string, c string",
        '- split_translate: {column: c, separator: ";", translations: {a: "1", b: "2"}, to_object: obj, via_relation: rel}',
    )
    assert _object_ids(nodes) == ["1", "2"]


def test_replace_default_and_custom(spark):
    # default forbidden [^a-zA-Z0-9_`.()] removes specials
    nodes, _ = _run(
        spark, [("k1", "he!!o w@rld")], "k string, c string",
        "- replace: {column: c, to_object: obj, via_relation: rel}",
    )
    assert _object_ids(nodes) == ["heowrld"]
    # custom substitute + strip(substitute) semantics
    nodes, _ = _run(
        spark, [("k1", "!!ab!cd!!")], "k string, c string",
        '- replace: {column: c, forbidden: "[!]", substitute: "_", to_object: obj, via_relation: rel}',
    )
    assert _object_ids(nodes) == ["ab_cd"]


def test_split_replace(spark):
    nodes, _ = _run(
        spark, [("k1", "a@x;b#y")], "k string, c string",
        '- split_replace: {column: c, separator: ";", to_object: obj, via_relation: rel}',
    )
    assert _object_ids(nodes) == ["ax", "by"]


def test_boolean(spark):
    rows = [("k1", "y"), ("k2", "n"), ("k3", "?")]
    nodes, _ = _run(
        spark, rows, "k string, c string",
        '- boolean: {column: c, consider_true: [y, yes], consider_false: [n, no], output_true: "T", output_false: "F", to_object: obj, via_relation: rel}',
    )
    # unknown "?" bypassed (reference logs and skips)
    assert _object_ids(nodes) == ["F", "T"]


def test_nested_json(spark):
    nodes, _ = _run(
        spark, [("k1", '{"a": {"b": "deep"}}')], "k string, c string",
        "- nested: {columns: [c, a, b], to_object: obj, via_relation: rel}",
    )
    assert _object_ids(nodes) == ["deep"]


def test_split_nested(spark):
    nodes, _ = _run(
        spark, [("k1", '{"v": "one"}|{"v": "two"}')], "k string, c string",
        '- split_nested: {columns: [c, v], separator: "\\\\|", to_object: obj, via_relation: rel}',
    )
    assert _object_ids(nodes) == ["one", "two"]


def test_maths(spark):
    nodes, _ = _run(
        spark, [("k1", "3", "4")], "k string, a string, b string",
        '- maths: {columns: [a, b], operation: "{a}^2 + {b} * 2 - abs(0-1)", to_object: obj, via_relation: rel}',
    )
    assert _object_ids(nodes) == ["16.0"]


def test_null_skip_semantics(spark):
    # "", "nan", "NaN", "None", NULL all skip; "0" does not
    rows = [("k1", ""), ("k2", "nan"), ("k3", "NaN"), ("k4", "None"),
            ("k5", None), ("k6", "0")]
    nodes, _ = _run(
        spark, rows, "k string, c string",
        "- map: {column: c, to_object: obj, via_relation: rel}",
    )
    assert _object_ids(nodes) == ["0"]


def test_user_registered_transformer(spark):
    # UDF surface: compile hook returning an array<string> Column
    from pyspark.sql import functions as F

    from ontoweaver_spark import register
    from ontoweaver_spark.registry import unregister

    def repeat_twice(spec):
        c = F.col(spec.columns[0])
        return F.array(c, F.concat(c, c))

    register("repeat_twice", repeat_twice)
    try:
        nodes, _ = _run(
            spark, [("k1", "ab")], "k string, c string",
            "- repeat_twice: {column: c, to_object: obj, via_relation: rel}",
        )
        assert _object_ids(nodes) == ["ab", "abab"]
    finally:
        unregister("repeat_twice")


def test_translate_error_policy_raises(spark):
    """on_unknown_value=error must fail the job naming the unknown value
    (reference TransformerDataError parity), not silently skip."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    nodes, _ = _run(
        spark, [("k1", "AA"), ("k2", "ZZ")], "k string, c string",
        "- translate: {column: c, translations: {AA: alpha}, on_unknown_value: error, to_object: obj, via_relation: rel}",
    )
    with pytest.raises(SparkRuntimeException, match="no translation for value 'ZZ'"):
        nodes.collect()

    # known-only input passes through fine
    nodes_ok, _ = _run(
        spark, [("k1", "AA")], "k string, c string",
        "- translate: {column: c, translations: {AA: alpha}, on_unknown_value: error, to_object: obj, via_relation: rel}",
    )
    assert _object_ids(nodes_ok) == ["alpha"]


def test_split_translate_large_table_per_piece(spark):
    """A >TRANSLATE_INLINE_MAX table must still translate each SPLIT PIECE
    (the broadcast-join path keys on the raw unsplit cell and would hand
    every piece null — it must not be used for split_translate)."""
    from ontoweaver_spark.transformers import TRANSLATE_INLINE_MAX

    n = TRANSLATE_INLINE_MAX + 50
    table = {f"k{i}": f"v{i}" for i in range(n)}
    entries = "\n".join(f"      k{i}: v{i}" for i in range(n))
    nodes, _ = _run(
        spark, [("r1", "k1;k7")], "k string, c string",
        "- split_translate:\n    column: c\n    separator: ';'\n"
        "    to_object: obj\n    via_relation: rel\n"
        "    translations:\n" + entries,
    )
    assert _object_ids(nodes) == ["v1", "v7"]


def test_translate_two_columns_large_table(spark):
    """Each COLUMN of a multi-column translate gets its own translation
    even above the inline threshold."""
    from ontoweaver_spark.transformers import TRANSLATE_INLINE_MAX

    n = TRANSLATE_INLINE_MAX + 50
    entries = "\n".join(f"      k{i}: v{i}" for i in range(n))
    nodes, _ = _run(
        spark, [("r1", "k2", "k9")], "k string, c string, d string",
        "- translate:\n    columns: [c, d]\n"
        "    to_object: obj\n    via_relation: rel\n"
        "    translations:\n" + entries,
    )
    assert _object_ids(nodes) == ["v2", "v9"]


def test_split_translate_huge_file_rejected(spark, tmp_path):
    """A translations_file above the Spark-join threshold cannot serve
    split_translate — must fail loudly at compile, not silently null out."""
    import pytest
    from ontoweaver_spark.spec import load_mapping
    from ontoweaver_spark.compiler import compile_mapping
    from ontoweaver_spark.transformers import CompileError
    import ontoweaver_spark.transformers as T

    f = tmp_path / "big.csv"
    f.write_text("frm,to\na,b\n")
    df = spark.createDataFrame([("r1", "a;a")], "k string, c string")
    mapping = {
        "row": {"map": {"id_from_column": "k", "to_subject": "thing"}},
        "transformers": [{
            "split_translate": {
                "column": "c", "separator": ";",
                "translations_file": str(f),
                "translate_from": "frm", "translate_to": "to",
                "to_object": "obj", "via_relation": "rel",
            },
        }],
    }
    old = T.TRANSLATE_FILE_SPARK_MIN_BYTES
    T.TRANSLATE_FILE_SPARK_MIN_BYTES = 1  # force the "big file" branch
    try:
        with pytest.raises(CompileError, match="broadcast-join"):
            compile_mapping(df, load_mapping(mapping))
    finally:
        T.TRANSLATE_FILE_SPARK_MIN_BYTES = old


def test_with_row_index_lazy_and_contiguous(spark):
    """VERDICT r3 #6: building the rowIndex frame must run ZERO Spark jobs
    (the old variant collect()-ed per-partition counts at plan time), and
    the index must still be contiguous 0..n-1 in partition order."""
    from ontoweaver_spark.compiler import with_row_index

    tracker = spark.sparkContext.statusTracker()
    df = spark.range(0, 1000, 1, 7).selectExpr("id AS v")
    before = set(tracker.getJobIdsForGroup())
    indexed = with_row_index(df, "_idx")  # plan construction only
    after = set(tracker.getJobIdsForGroup())
    assert before == after  # no driver-side job during planning

    rows = indexed.collect()
    assert sorted(r["_idx"] for r in rows) == list(range(1000))
    # index order follows (partition, intra-partition) order: each source
    # partition owns one contiguous index range
    by_idx = {r["_idx"]: r["v"] for r in rows}
    values_in_index_order = [by_idx[i] for i in range(1000)]
    assert sorted(values_in_index_order) == sorted(r["v"] for r in rows)
    # column order: original columns first, index appended
    assert indexed.columns == ["v", "_idx"]
