"""Registrable-domain (eTLD+1) extraction via the PSL longest-match
algorithm with the vendored suffix subset.

Checks multi-label suffixes beat naive last-two-labels, platform
suffixes (github.io) isolate registrants, the host-is-a-suffix NULL,
the implicit * fallback, custom suffix lists, and a python replay.
"""

from ontoweaver_spark.urls import DEFAULT_PUBLIC_SUFFIXES, with_registrable_domain


def _py_domain(host, suffixes):
    best = None
    for s in suffixes:
        if host == s or host.endswith("." + s):
            if best is None or len(s) > len(best):
                best = s
    labels = host.split(".")
    if best is None:
        sfx = labels[-1]
        dom = host if len(labels) <= 1 else ".".join(labels[-2:])
        return dom, sfx
    if host == best:
        return None, best
    prefix = host[: len(host) - len(best) - 1]
    return prefix.split(".")[-1] + "." + best, best


def _run(spark, hosts, suffixes=None):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = with_registrable_domain(df, "host", suffixes=suffixes)
    return {r["host"]: (r["domain"], r["public_suffix"]) for r in out.collect()}


def test_psl_cases(spark):
    hosts = [
        "a.b.co.uk",       # -> b.co.uk (NOT co.uk)
        "c.co.uk",         # -> c.co.uk
        "www.example.com", # -> example.com
        "example.com",     # -> example.com
        "co.uk",           # IS a suffix -> NULL
        "user.github.io",  # -> user.github.io (platform registrant)
        "deep.user.github.io",  # -> user.github.io
        "single",          # * fallback, one label
        "x.unknowntld",    # * fallback -> x.unknowntld
        "a.b.unknowntld",  # * fallback -> b.unknowntld
    ]
    got = _run(spark, hosts)
    for h in hosts:
        assert got[h] == _py_domain(h, DEFAULT_PUBLIC_SUFFIXES), h
    assert got["a.b.co.uk"][0] == "b.co.uk"
    assert got["co.uk"][0] is None
    assert got["deep.user.github.io"][0] == "user.github.io"


def test_custom_suffix_list(spark):
    got = _run(spark, ["a.internal.corp", "b.corp"], suffixes=["internal.corp", "corp"])
    assert got["a.internal.corp"] == ("a.internal.corp", "internal.corp")
    assert got["b.corp"] == ("b.corp", "corp")


def test_row_table_join_back_preserves_rows(spark):
    df = spark.createDataFrame(
        [(1, "x.example.com"), (2, "x.example.com"), (3, None)],
        "id long, host string",
    )
    out = with_registrable_domain(df, "host").collect()
    assert len(out) == 3
    by_id = {r["id"]: r["domain"] for r in out}
    assert by_id[1] == by_id[2] == "example.com"
    assert by_id[3] is None
