"""Date-mention extraction + exact-integer epoch-day normalization
goldens: all four formats, the calendar-validity filter (day-in-month,
leap rule), the month-name table, distinct semantics, and a python
replay of the Hinnant days-from-civil arithmetic against datetime.
Reference analog: none (the reference maps tabular cells as given —
src/ontoweaver/transformer.py); harvesting temporal qualifiers FROM raw
text is engine-side superset surface for the web-KG north rule."""

import datetime as dt

from ontoweaver_spark.textops import extract_dates


def _rows(df):
    return {
        (r.fmt, r.y, r.m, r.d, r.epoch_day)
        for r in df.select("fmt", "y", "m", "d", "epoch_day").collect()
    }


def _ed(y, m, d):
    return (dt.date(y, m, d) - dt.date(1970, 1, 1)).days


def test_all_four_formats_exact_epoch_days(spark):
    docs = spark.createDataFrame(
        [
            (1, "Released on 2021-03-17."),
            (2, "Updated March 5, 2022 at noon."),
            (3, "Due 28 february 1999."),
            (4, "Filed 12/31/2020."),
        ],
        "doc_id long, text string",
    )
    got = _rows(extract_dates(docs))
    assert got == {
        ("iso", 2021, 3, 17, _ed(2021, 3, 17)),
        ("us_text", 2022, 3, 5, _ed(2022, 3, 5)),
        ("eu_text", 1999, 2, 28, _ed(1999, 2, 28)),
        ("slash", 2020, 12, 31, _ed(2020, 12, 31)),
    }


def test_calendar_validity_filter(spark):
    docs = spark.createDataFrame(
        [
            # feb 30, nov 31, month 13, non-leap feb 29, year 0000
            (1, "2023-02-30 and 11/31/2020 and 13/1/2020 and "
                "1900-02-29 and 0000-01-01."),
            # the leap day that IS valid
            (2, "2020-02-29 and 2000-02-29."),
        ],
        "doc_id long, text string",
    )
    got = _rows(extract_dates(docs))
    assert got == {
        ("iso", 2020, 2, 29, _ed(2020, 2, 29)),
        ("iso", 2000, 2, 29, _ed(2000, 2, 29)),
    }


def test_distinct_and_case_insensitive(spark):
    docs = spark.createDataFrame(
        [(1, "JANUARY 2, 2001 and january 2, 2001 and 2001-01-02.")],
        "doc_id long, text string",
    )
    out = extract_dates(docs)
    # one us_text row (case folded + distinct) and one iso row
    assert out.count() == 2
    assert {r.epoch_day for r in out.collect()} == {_ed(2001, 1, 2)}


def test_epoch_day_matches_datetime_across_eras(spark):
    days = [
        (1, 1, 1), (1582, 10, 15), (1900, 3, 1), (1970, 1, 1),
        (2000, 2, 29), (2024, 12, 31), (9999, 12, 31),
    ]
    text = " ".join(f"{y:04d}-{m:02d}-{d:02d}" for y, m, d in days)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {(r.y, r.m, r.d): r.epoch_day for r in extract_dates(docs).collect()}
    assert got == {(y, m, d): _ed(y, m, d) for y, m, d in days}


def test_qualify_with_first_date(spark):
    from ontoweaver_spark.webdoc import qualify_with_first_date

    facts = spark.createDataFrame(
        [(1, "wheel", "car"), (2, "leaf", "tree"), (3, "nodate", "x")],
        "doc_id long, part string, whole string",
    )
    dates = spark.createDataFrame(
        [(1, 100), (1, 50), (2, 7)],
        "doc_id long, epoch_day long",
    )
    got = {
        (r.doc_id, r.part, r.first_seen_day)
        for r in qualify_with_first_date(facts, dates).collect()
    }
    # earliest date wins; undated doc 3 is dropped
    assert got == {(1, "wheel", 50), (2, "leaf", 7)}
