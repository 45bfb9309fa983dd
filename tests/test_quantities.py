"""Quantity-mention extraction + exact-integer canonicalization goldens:
both kinds (closed unit table, scale words), fraction handling in
millionths, longest-first unit alternation, the int64 overflow guard
(NULL, never wraparound), the 12-digit split residue, and distinct
semantics. Reference analog: none (the reference maps tabular cells as
given); harvesting numeric property values FROM raw text is engine-side
superset surface — the numeric complement of extract_dates."""

from ontoweaver_spark.textops import extract_quantities


def _rows(df):
    return {
        (r.kind, r.num_e6, r.unit, r.base_unit, r.canonical_e6)
        for r in df.collect()
    }


def test_units_and_scales_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "A 3.5 GHz chip with 512gb storage weighs 1.2 kg."),
            (2, "Population 8.1 billion; budget 250 million."),
            (3, "It is 30 m tall and 5 b large."),
        ],
        "doc_id long, text string",
    )
    got = _rows(extract_quantities(docs))
    assert got == {
        ("unit", 3_500_000, "ghz", "hz", 3_500_000 * 10**9),
        ("unit", 512_000_000, "gb", "b", 512_000_000 * 10**9),
        ("unit", 1_200_000, "kg", "g", 1_200_000 * 10**3),
        ("scale", 8_100_000, "billion", "count", 8_100_000 * 10**9),
        ("scale", 250_000_000, "million", "count", 250_000_000 * 10**6),
        ("unit", 30_000_000, "m", "m", 30_000_000),
        ("unit", 5_000_000, "b", "b", 5_000_000),
    }


def test_overflow_guard_yields_null(spark):
    docs = spark.createDataFrame(
        [(1, "999999999999 gb and 999999999999.999999 km and 9000000000 km.")],
        "doc_id long, text string",
    )
    rows = {(r.unit, r.canonical_e6) for r in extract_quantities(docs).collect()}
    # 1e12 gb (x1e9) and ~1e12 km (x1e3, num_e6 ~1e18) both exceed
    # int64 -> NULL; 9e9 km (num_e6 9e15 * 1e3 = 9e18 < 2^63) fits
    assert rows == {
        ("gb", None), ("km", None), ("km", 9_000_000_000 * 10**6 * 10**3),
    }


def test_longest_first_alternation(spark):
    docs = spark.createDataFrame(
        [(1, "5 mb vs 5 mhz vs 5 khz vs 5 hz.")],
        "doc_id long, text string",
    )
    units = {r.unit for r in extract_quantities(docs).collect()}
    assert units == {"mb", "mhz", "khz", "hz"}


def test_twelve_digit_split_residue_documented(spark):
    # int parts beyond 12 digits split at the regex bound — pinned so a
    # pattern change is loud; both engines split identically
    docs = spark.createDataFrame(
        [(1, "measured 1234567890123456.8 km.")],
        "doc_id long, text string",
    )
    got = _rows(extract_quantities(docs))
    assert got == {("unit", 8_000_000, "km", "m", 8_000_000_000)}


def test_distinct_across_repeats(spark):
    docs = spark.createDataFrame(
        [(1, "5 km and 5 km and 5.000000 km.")],
        "doc_id long, text string",
    )
    # "5" and "5.000000" normalize to the same num_e6 -> one row
    assert extract_quantities(docs).count() == 1


def test_extract_geo_signs_and_range(spark):
    from ontoweaver_spark.textops import extract_geo

    docs = spark.createDataFrame(
        [
            (1, "NYC sits at 40.7128 N, 74.006 W; London 51.5074 n 0.1278 w."),
            (2, "Sydney 33.8688 S, 151.2093 E."),
            (3, "bogus 95.1 n, 10 e. bogus2 10 n, 181 e. none here."),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.lat_udeg, r.lon_udeg)
        for r in extract_geo(docs).collect()
    }
    assert got == {
        (1, 40_712_800, -74_006_000),
        (1, 51_507_400, -127_800),
        (2, -33_868_800, 151_209_300),
    }


def test_extract_geo_boundary_inclusive(spark):
    from ontoweaver_spark.textops import extract_geo

    docs = spark.createDataFrame(
        [(1, "poles 90 n, 180 w and 90.000001 n, 0 e.")],
        "doc_id long, text string",
    )
    got = {(r.lat_udeg, r.lon_udeg) for r in extract_geo(docs).collect()}
    # exactly 90/180 kept; one microdegree over dropped
    assert got == {(90_000_000, -180_000_000)}
