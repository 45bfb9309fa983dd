"""Golden-tuple comparison helpers.

Mirrors the reference test policy (/root/reference/tests/testing_functions.py:28-59):
order-insensitive set comparison; multi-valued properties compared as
','-joined sets. Edge identity = (src, dst, label, properties) — the
reference's own asserts never check fused edge IDs (its convert_to_set
skips 5-tuples entirely), and golden fixtures document edge IDs as ''.
"""

from __future__ import annotations

from ontoweaver_spark.fusion import format_for_export


def _props_key(props: dict | None, joined_sep: str = ",") -> tuple:
    if not props:
        return ()
    out = {}
    for k, v in props.items():
        if isinstance(v, (list, tuple, set)):
            out[k] = joined_sep.join(sorted(str(x) for x in v))
        else:
            # normalize a pre-joined multi-value to set order
            parts = str(v).split(joined_sep)
            out[k] = joined_sep.join(sorted(parts)) if len(parts) > 1 else str(v)
    return tuple(sorted(out.items()))


def nodes_set(rows, sep=","):
    """rows: iterable of (id, label, props)."""
    return {(r[0], r[1], _props_key(r[2], sep)) for r in rows}


def edges_set(rows, sep=","):
    """rows: iterable of (id?, src, dst, label, props) or (src, dst, label, props)."""
    out = set()
    for r in rows:
        if len(r) == 5:
            _, src, dst, label, props = r
        else:
            src, dst, label, props = r
        out.add((src, dst, label, _props_key(props, sep)))
    return out


def collect_nodes(df, sep=","):
    rows = format_for_export(df, sep).collect()
    return nodes_set([(r["id"], r["label"], r["properties"]) for r in rows], sep)


def collect_edges(df, sep=","):
    rows = format_for_export(df, sep).collect()
    return edges_set(
        [(r["src"], r["dst"], r["label"], r["properties"]) for r in rows], sep
    )


def assert_graph(
    fnodes_df, fedges_df, expected_nodes, expected_edges, sep=","
):
    got_n = collect_nodes(fnodes_df, sep)
    exp_n = nodes_set(expected_nodes, sep)
    assert got_n == exp_n, (
        f"nodes mismatch:\n extra={sorted(got_n - exp_n)}\n missing={sorted(exp_n - got_n)}"
    )
    got_e = collect_edges(fedges_df, sep)
    exp_e = edges_set(expected_edges, sep)
    assert got_e == exp_e, (
        f"edges mismatch:\n extra={sorted(got_e - exp_e)}\n missing={sorted(exp_e - got_e)}"
    )


def precision_recall(got: set, expected: set) -> tuple[float, float]:
    if not got:
        return (1.0 if not expected else 0.0), (1.0 if not expected else 0.0)
    tp = len(got & expected)
    return tp / len(got), tp / len(expected) if expected else 1.0
