"""Meronym-pattern part-whole extraction goldens: the five conservative
part-of frames (Berland & Charniak ACL'99 / Girju et al. ACL'03) over
hand sentences, the frame-grammar stoplist (part/parts/member/members on
top of the Hearst one), and the rename contract (part/whole columns).
Reference analog: none (the reference consumes ontologies as given —
src/ontoweaver/ontology handling); harvesting the mereology FROM the
corpus is engine-side superset surface feeding graph_from_triples."""

from ontoweaver_spark.webdoc import meronym_parts


def _rows(df):
    return {
        (r.part, r.whole, r.pattern)
        for r in df.select("part", "whole", "pattern").collect()
    }


def test_all_five_frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "The engine consists of pistons, valves and rods."),
            (2, "Water is composed of hydrogen and oxygen."),
            (3, "A cell contains nucleus, cytoplasm."),
            (4, "Wheels, axles are parts of wagon."),
            (5, "Finland is a member of nato."),
        ],
        "doc_id long, text string",
    )
    got = _rows(meronym_parts(docs))
    assert {
        ("pistons", "engine", "consists_of"),
        ("valves", "engine", "consists_of"),
        ("rods", "engine", "consists_of"),
        ("hydrogen", "water", "composed_of"),
        ("oxygen", "water", "composed_of"),
        ("nucleus", "cell", "contains"),
        ("cytoplasm", "cell", "contains"),
        ("wheels", "wagon", "part_of"),
        ("axles", "wagon", "part_of"),
        ("finland", "nato", "member_of"),
    } <= got


def test_singular_part_and_optional_articles(spark):
    docs = spark.createDataFrame(
        [
            (1, "the wheel is part of the car."),
            (2, "carbon is a member of group fourteen."),
        ],
        "doc_id long, text string",
    )
    got = _rows(meronym_parts(docs))
    assert ("wheel", "car", "part_of") in got
    assert ("carbon", "group", "member_of") in got


def test_stoplist_and_filters(spark):
    docs = spark.createDataFrame(
        [
            # "members" as the list word is frame grammar, not a part
            (1, "members are parts of club."),
            # self-pair and short words filtered
            (2, "gas is part of gas. ab is part of cd."),
            # grammar word as whole dropped
            (3, "wheels are parts of parts."),
        ],
        "doc_id long, text string",
    )
    got = _rows(meronym_parts(docs))
    assert not {t for t in got if t[0] in ("members", "gas", "ab")}
    assert not {t for t in got if t[1] == "parts"}


def test_distinct_across_repeats(spark):
    docs = spark.createDataFrame(
        [(1, "water is composed of hydrogen. water is composed of hydrogen.")],
        "doc_id long, text string",
    )
    out = meronym_parts(docs)
    assert out.count() == 1


def test_acronym_pairs_schwartz_hearst(spark):
    from ontoweaver_spark.webdoc import acronym_pairs

    docs = spark.createDataFrame(
        [
            (1, "The World Health Organization (WHO) said so."),
            (2, "the central processing unit (CPU) and a bad match (xyz)."),
            # 4-letter acronym over a longer preceding span: only the
            # last 4 words' initials count
            (3, "we love the hyper text markup language (html) spec."),
            # too few words before the paren
            (4, "only two (otw) here."),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.short_form, r.long_form)
        for r in acronym_pairs(docs).collect()
    }
    assert got == {
        (1, "who", "world health organization"),
        (2, "cpu", "central processing unit"),
        (3, "html", "hyper text markup language"),
    }


def test_acronym_pairs_distinct(spark):
    from ontoweaver_spark.webdoc import acronym_pairs

    docs = spark.createDataFrame(
        [(1, "central processing unit (cpu). central processing unit (cpu).")],
        "doc_id long, text string",
    )
    assert acronym_pairs(docs).count() == 1
