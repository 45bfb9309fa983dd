"""Hand-computed RAKE golden (Rose et al. 2010): deg/freq word scores,
phrase sums, stopword + punctuation segmentation, occurrence counting."""

from ontoweaver_spark.textops import rake_keyphrases


def test_rake_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "Deep learning of deep networks, and the deep learning rocks.")],
        ["doc_id", "text"],
    )
    got = {r["phrase"]: r for r in rake_keyphrases(df).collect()}
    # deep: freq 3, deg 2+2+3=7 -> 2333333; learning: 2, 5 -> 2500000
    # networks: 1, 2 -> 2000000; rocks: 1, 3 -> 3000000
    assert got["deep learning"]["score_ppm"] == 2333333 + 2500000
    assert got["deep networks"]["score_ppm"] == 2333333 + 2000000
    assert got["deep learning rocks"]["score_ppm"] == 2333333 + 2500000 + 3000000
    assert set(got) == {"deep learning", "deep networks", "deep learning rocks"}


def test_rake_occurrences_and_cap(spark):
    df = spark.createDataFrame([(1, "red fox and red fox")], ["doc_id", "text"])
    rows = rake_keyphrases(df).collect()
    assert len(rows) == 1 and rows[0]["n_occ"] == 2
    # red: freq 2 deg 4 -> 2000000; fox same -> phrase 4000000 (occurrences
    # share ONE score row, never doubled)
    assert rows[0]["score_ppm"] == 4_000_000
    # a run longer than the cap drops entirely
    assert rake_keyphrases(
        spark.createDataFrame([(1, "one two three")], ["doc_id", "text"]),
        max_phrase_len=2,
    ).count() == 0


def test_rake_repeated_word_in_phrase_counts_twice(spark):
    df = spark.createDataFrame([(1, "new york new york")], ["doc_id", "text"])
    rows = rake_keyphrases(df).collect()
    # one 4-token phrase; new: freq 2 deg 8 -> 4e6, york same;
    # each occurrence inside the phrase contributes -> 4 * 4e6
    assert rows[0]["score_ppm"] == 16_000_000
    assert rows[0]["n_words"] == 4


def test_cohen_kappa_textbook(spark):
    from ontoweaver_spark.textops import annotator_agreement

    rows = ([("y", "y")] * 20 + [("y", "n")] * 10
            + [("n", "y")] * 5 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, ["label_a", "label_b"])
    got = annotator_agreement(df).collect()[0]
    # po = 0.7, pe = (30*25 + 20*25)/2500 = 0.5 -> kappa = 0.4
    assert (got["n"], got["agree_ppm"], got["kappa_ppm"]) == (50, 700000, 400000)


def test_cohen_kappa_undefined_is_null(spark):
    from ontoweaver_spark.textops import annotator_agreement

    df = spark.createDataFrame([("x", "x")] * 5, ["label_a", "label_b"])
    got = annotator_agreement(df).collect()[0]
    assert got["agree_ppm"] == 1_000_000 and got["kappa_ppm"] is None


def test_readability_hand_computed(spark):
    from ontoweaver_spark.textops import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran fast!"), (2, "")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    # W=7 S=2 Y=7: 390000*7//2 + 11800000 - 15590000 = -2425000
    assert (got[1]["n_words"], got[1]["n_sentences"], got[1]["n_syllables"]) == (7, 2, 7)
    assert got[1]["fk_grade_ppm"] == 1365000 + 11800000 - 15590000
    # junk input floors everything at 1 and stays total
    assert (got[2]["n_words"], got[2]["n_sentences"]) == (1, 1)


def test_textrank_salience_and_scoping(spark):
    from ontoweaver_spark.textops import textrank_keywords

    df = spark.createDataFrame(
        [(1, "spark engine ranks the spark graph with spark power"),
         (2, "quiet words")],
        ["doc_id", "text"],
    )
    got = {(r["doc_id"], r["word"]): r["rank"]
           for r in textrank_keywords(df).collect()}
    d1 = {w: v for (d, w), v in got.items() if d == "1"}
    # the hub word dominates its document's graph
    assert max(d1, key=d1.get) == "spark"
    assert "the" not in d1  # stopword filtered
    # doc 2's two words form one symmetric pair -> equal ranks, and
    # doc scoping means they never mix with doc 1
    assert got[("2", "quiet")] == got[("2", "words")]
