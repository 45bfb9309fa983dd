"""strip_boilerplate_lines and inverted_index (textops)."""

from ontoweaver_spark.textops import inverted_index, strip_boilerplate_lines


def test_boilerplate_strip_threshold_and_order(spark):
    # footer in 12 docs (> max 10) -> stripped; 'shared' in 3 docs -> kept
    rows = [(i, f"unique {i}\nFOOTER\nshared" if i < 3 else f"unique {i}\nFOOTER")
            for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           strip_boilerplate_lines(df, max_line_docs=10).collect()}
    assert got[0]["clean_text"] == "unique 0\nshared"
    assert got[0]["n_kept"] == 2 and got[0]["n_removed"] == 1
    assert got[5]["clean_text"] == "unique 5"
    assert got[5]["n_kept"] == 1 and got[5]["n_removed"] == 1
    assert len(got) == 12 and all("FOOTER" not in r["clean_text"] for r in got.values())


def test_boilerplate_all_stripped_doc_survives(spark):
    rows = [(i, "SPAM") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = strip_boilerplate_lines(df, max_line_docs=3).collect()
    assert len(got) == 5
    assert all(r["clean_text"] == "" and r["n_kept"] == 0 and r["n_removed"] == 1
               for r in got)


def test_boilerplate_within_doc_duplicates(spark):
    # the same line twice in ONE doc counts once toward df (countDistinct)
    rows = [(1, "x\nx\ny")] + [(i, "z") for i in range(2, 5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           strip_boilerplate_lines(df, max_line_docs=1).collect()}
    assert got[1]["clean_text"] == "x\nx\ny" and got[1]["n_removed"] == 0
    assert got[2]["clean_text"] == ""  # z in 3 docs > 1


def test_inverted_index_hand_computed(spark):
    rows = [(2, "foo bar foo"), (1, "bar baz"), (3, "foo xy")]  # xy < min_len
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["token"]: r for r in inverted_index(df, min_len=3).collect()}
    assert set(got) == {"foo", "bar", "baz"}
    assert got["foo"]["df_t"] == 2 and got["foo"]["total_tf"] == 3
    assert got["foo"]["postings"] == "2:2 3:1"  # doc-id sorted
    assert got["bar"]["postings"] == "1:1 2:1"
    assert got["baz"]["postings"] == "1:1"
