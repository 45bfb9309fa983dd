"""Hearst-pattern hypernym extraction goldens: the five COLING'92
lexico-syntactic is-a frames over hand sentences, the documented greedy
comma-list residue, the grammar-word stoplist, and min-length/self-pair
filters. Reference analog: none (the reference consumes ontologies as
given — src/ontoweaver/ontology handling); bootstrapping is-a triples
FROM the corpus is the web-KG surface the north rule targets."""

import pyspark.sql.functions as F

from ontoweaver_spark.webdoc import hearst_hypernyms


def _rows(df):
    return {
        (r.hyponym, r.hypernym, r.pattern)
        for r in df.select("hyponym", "hypernym", "pattern").collect()
    }


def test_all_five_patterns(spark):
    docs = spark.createDataFrame(
        [
            (1, "We stock fruits such as Apples, pears and plums."),
            (2, "Such vendors as acme or zenith ship fast."),
            (3, "Bread, butter and other staples sell out."),
            (4, "Metals, including copper and zinc, corrode."),
            (5, "Browsers, especially firefox, vary."),
        ],
        "doc_id long, text string",
    )
    got = _rows(hearst_hypernyms(docs))
    assert {
        ("apples", "fruits", "such_as"),
        ("pears", "fruits", "such_as"),
        ("plums", "fruits", "such_as"),
        ("acme", "vendors", "such_x_as"),
        ("zenith", "vendors", "such_x_as"),
        ("bread", "staples", "and_other"),
        ("butter", "staples", "and_other"),
        ("copper", "metals", "including"),
        ("zinc", "metals", "including"),
        ("firefox", "browsers", "especially"),
    } <= got


def test_greedy_list_residue_documented(spark):
    # a clause after a comma is absorbed into the greedy list — the
    # documented precision residue, pinned so a regex change is loud
    docs = spark.createDataFrame(
        [(1, "browsers, especially chrome, dominate the market.")],
        "doc_id long, text string",
    )
    got = _rows(hearst_hypernyms(docs))
    assert ("chrome", "browsers", "especially") in got
    assert ("dominate", "browsers", "especially") in got


def test_stoplist_minlen_and_self_pairs(spark):
    docs = spark.createDataFrame(
        [
            # "other" as a list member is grammar, not a noun
            (1, "pets such as dogs and other animals bark."),
            # two-char members fall below min_len
            (2, "ids such as ab, cd and efghi differ."),
            # hyponym == hypernym never emits
            (3, "tools such as tools exist."),
        ],
        "doc_id long, text string",
    )
    got = _rows(hearst_hypernyms(docs))
    assert ("dogs", "pets", "such_as") in got
    assert not any(h == "other" for h, _, _ in got)
    assert ("ab", "ids", "such_as") not in got
    assert ("efghi", "ids", "such_as") in got
    assert ("tools", "tools", "such_as") not in got


def test_multi_match_and_distinct(spark):
    docs = spark.createDataFrame(
        [
            (
                1,
                "fruits such as kiwis. fruits such as kiwis. "
                "fruits such as mangos.",
            )
        ],
        "doc_id long, text string",
    )
    out = hearst_hypernyms(docs)
    got = [
        (r.hyponym, r.hypernym) for r in out.select("hyponym", "hypernym").collect()
    ]
    assert sorted(got) == [("kiwis", "fruits"), ("mangos", "fruits")]


def test_whitespace_and_case_normalization(spark):
    docs = spark.createDataFrame(
        [(1, "FRUITS  such\tas\n APPLES and  PEARS.")],
        "doc_id long, text string",
    )
    got = _rows(hearst_hypernyms(docs))
    assert ("apples", "fruits", "such_as") in got
    assert ("pears", "fruits", "such_as") in got
