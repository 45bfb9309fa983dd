"""chunk_documents and pack_sequences (textops)."""

import pytest

from ontoweaver_spark.textops import chunk_documents, pack_sequences


def test_chunk_sliding_windows(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    got = sorted(
        chunk_documents(df, chunk_tokens=3, overlap=1).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [(r["chunk_id"], r["chunk"], r["n_chunk_toks"]) for r in got] == [
        (0, "a b c", 3),
        (1, "c d e", 3),
        (2, "e f g", 3),
        (3, "g", 1),
    ]


def test_chunk_short_doc_and_validation(spark):
    df = spark.createDataFrame([(1, "only two"), (2, "")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           chunk_documents(df, chunk_tokens=10, overlap=2).collect()}
    assert got[1]["chunk"] == "only two" and got[1]["n_chunk_toks"] == 2
    assert got[2]["chunk_id"] == 0  # empty doc still yields its one chunk
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=5, overlap=5)


def test_pack_sequences_offsets_and_bins(spark):
    # token counts: id1=3, id2=4, id3=2, id4=5 -> starts 0,3,7,9
    rows = [(1, "a b c"), (2, "a b c d"), (3, "a b"), (4, "a b c d e")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pack_sequences(df, seq_len=4).collect()}
    assert [(got[i]["start_tok"], got[i]["seq_id"]) for i in (1, 2, 3, 4)] == [
        (0, 0), (3, 0), (7, 1), (9, 2),
    ]
    # doc starting exactly on a boundary opens the next sequence
    assert got[3]["start_tok"] == 7 and got[4]["seq_id"] == 2


def test_pack_sequences_partition_invariance(spark):
    rows = [(i, " ".join(["tok"] * (i % 7 + 1))) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    one = sorted(map(tuple, pack_sequences(df, seq_len=32, partitions=1).collect()))
    many = sorted(
        map(tuple, pack_sequences(df.repartition(13), seq_len=32, partitions=7).collect())
    )
    assert one == many
    # contiguity: starts are the exclusive prefix sums of n_toks in id order
    ordered = sorted(one)
    acc = 0
    for _, n, start, seq in ordered:
        assert start == acc and seq == start // 32
        acc += n
