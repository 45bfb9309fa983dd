"""Goldens for gazetteer mention spotting: multi-word n-gram hits,
maximal-match overlap policy, normalization, and surviving partial
overlaps."""

from ontoweaver_spark.linking import spot_mentions


def _gaz(spark):
    return spark.createDataFrame(
        [("new york city", "Q60"), ("new york", "Q.state"), ("york", "Q.uk")],
        ["surface", "entity_id"],
    )


def test_maximal_match_policy(spark):
    docs = spark.createDataFrame(
        [(1, "I moved to New York City, from york!"), (2, "york new york")],
        ["doc_id", "text"],
    )
    got = {(r["doc_id"], r["pos"]): (r["surface"], r["entity_id"])
           for r in spot_mentions(docs, _gaz(spark)).collect()}
    assert got == {
        (1, 4): ("new york city", "Q60"),  # swallows inner new york / york
        (1, 8): ("york", "Q.uk"),  # standalone, punctuation stripped
        (2, 1): ("york", "Q.uk"),  # NOT contained in the later bigram
        (2, 2): ("new york", "Q.state"),
    }


def test_no_hits_and_case_normalization(spark):
    docs = spark.createDataFrame([(1, "nothing matches here")], ["doc_id", "text"])
    assert spot_mentions(docs, _gaz(spark)).count() == 0
    gaz = spark.createDataFrame([("New  York", "Q")], ["surface", "entity_id"])
    docs2 = spark.createDataFrame([(1, "NEW YORK")], ["doc_id", "text"])
    rows = spot_mentions(docs2, gaz).collect()
    assert len(rows) == 1 and rows[0]["entity_id"] == "Q"


def test_repeated_occurrences_each_fire(spark):
    docs = spark.createDataFrame([(1, "york and york and york")], ["doc_id", "text"])
    gaz = spark.createDataFrame([("york", "Q.uk")], ["surface", "entity_id"])
    assert spot_mentions(docs, gaz).count() == 3
