"""Transformer operator algebra -> Spark Column expressions.

Each reference transformer (/root/reference/src/ontoweaver/transformer.py)
is compiled to ONE Column expression producing an ``array<string>`` of
candidate values per input row — a whole-partition, codegen-friendly
re-expression of the reference's per-row generators. Multi-yield operators
(multi-column ``map``, ``split``) become arrays that the compiler later
explodes; the null-skip contract (`base.is_not_null`) is applied by the
compiler as an array filter.

Some operators need *pre-stages* (DataFrame-level rewrites applied before
the projection), e.g. ``translate`` with a large table compiles to a
broadcast join instead of an in-plan map literal.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import registry
from .maths_grammar import compile_maths
from .nulls import is_not_null
from .spec import TransformerSpec

ROW_ID_COL = "_ow_row_id"

# Above this many entries, `translate` compiles to a broadcast join instead
# of an in-plan map literal (which would bloat the serialized plan).
TRANSLATE_INLINE_MAX = 2000
# absolute bound for shapes that can only inline (split pieces/multi-column)
TRANSLATE_INLINE_HARD_MAX = 100_000

# Above this many bytes, a `translations_file` is read by SPARK and
# broadcast-joined directly — never loaded driver-side through pandas
# (a multi-GB alias table at 100 TB would OOM the driver dict).
TRANSLATE_FILE_SPARK_MIN_BYTES = 32 * 1024 * 1024


class CompileError(ValueError):
    pass


@dataclass
class CompiledValues:
    """values: array<string> candidate values per row (pre null-filter);
    prestages: DataFrame rewrites to apply before selecting `values`."""

    values: Column
    prestages: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)


@dataclass
class CompiledCandidates:
    """Fully-typed candidates from a user transformer (the UDTF surface):
    ``candidates`` is a Column of
    ``array<struct<value:string,label:string,edge:string,final:string,rev:string>>``
    — the user hook does its own branching (the reference's custom
    transformers yield (value, edge_t, node_t, rev) 4-tuples with
    row-dependent types, e.g.
    /root/reference/tests/custom_transformer/custom.py:36-103). Build it
    from Column expressions, or from a vectorized pandas UDF returning the
    same struct array."""

    candidates: Column
    prestages: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)


def _strip_ws(c: Column) -> Column:
    # Python str.strip() semantics: ALL Unicode whitespace (incl. \xa0),
    # not F.trim (ASCII space only) and not Java's default ASCII \s —
    # (?U) switches the Java regex to Unicode character classes.
    # Found by the hypothesis parity test (tests/test_property_parity.py).
    return F.regexp_replace(c, r"(?U)(^\s+|\s+$)", "")


def _strip_chars(c: Column, chars: str) -> Column:
    """Python ``str.strip(chars)`` semantics: remove leading/trailing chars
    belonging to the set. Empty set -> unchanged (reference `replace` uses
    ``.strip(substitute)`` with default substitute "",
    /root/reference/src/ontoweaver/transformer.py:1010-1012)."""
    if not chars:
        return c
    cls = re.escape(chars).replace("]", r"\]")
    return F.regexp_replace(c, f"^[{cls}]+|[{cls}]+$", "")


def _split_regex(separator: str) -> str:
    """The separator is a regex, as in the reference
    (``re.split(repr(sep)[1:-1], val)``,
    /root/reference/src/ontoweaver/transformer.py:187-188). Deviation: the
    reference repr-escapes the pattern, which doubles user backslashes and
    silently breaks regex-intent separators like ``\\|``; we pass the
    pattern through unchanged — identical behavior for every separator the
    reference's own tests use ("; ", ";", ", ")."""
    if separator is None:
        separator = ","
    return separator


def _case_op(op: str, c: Column) -> Column:
    if op == "lower":
        return F.lower(c)
    if op == "upper":
        # Reference `upper` has a bug and lowercases
        # (/root/reference/src/ontoweaver/transformer.py:671); we implement
        # the *documented* uppercase semantics.
        return F.upper(c)
    # capitalize / lower_capitalize: Python str.capitalize() — first char
    # upper, rest lower. NOT Spark initcap (which capitalizes every word).
    return F.concat(
        F.upper(F.substring(c, 1, 1)),
        F.lower(F.substring(c, 2, 2147483646)),
    )


def _split_arrays(t: TransformerSpec) -> Column:
    rx = _split_regex(t.params.get("separator"))
    parts = []
    for col in t.columns:
        c = F.col(col)
        parts.append(
            F.when(is_not_null(c), F.transform(F.split(c, rx), _strip_ws))
            .otherwise(F.array().cast("array<string>"))
        )
    return parts[0] if len(parts) == 1 else F.flatten(F.array(*parts))


def _cat_format_expr(fmt: str) -> Column:
    pieces = re.split(r"(\{[^{}]+\})", fmt)
    cols = []
    for p in pieces:
        if not p:
            continue
        if p.startswith("{") and p.endswith("}"):
            cols.append(F.col(p[1:-1]))
        else:
            cols.append(F.lit(p))
    return F.concat(*cols) if cols else F.lit("")


def _load_translations(t: TransformerSpec) -> dict[str, str]:
    """Resolve the translation dict (inline or from a small file), mirroring
    /root/reference/src/ontoweaver/transformer.py:760-880."""
    translations = t.params.get("translations")
    translations_file = t.params.get("translations_file")
    if translations and translations_file:
        raise CompileError("translate: cannot set both `translations` and `translations_file`")
    if translations:
        return {str(k): str(v) for k, v in dict(translations).items()}
    if not translations_file:
        raise CompileError("translate: needs `translations` or `translations_file`")
    frm, to = t.params.get("translate_from"), t.params.get("translate_to")
    if not frm or not to:
        raise CompileError("translate: `translations_file` needs `translate_from` and `translate_to`")
    import pandas as pd
    sep = t.params.get("sep", ",")
    if sep == "TAB":
        sep = "\t"
    if str(translations_file).endswith(".parquet"):
        tdf = pd.read_parquet(translations_file)
    else:
        tdf = pd.read_csv(translations_file, sep=sep, dtype=str)
    for needed in (frm, to):
        if needed not in tdf.columns:
            raise CompileError(f"translate: column {needed!r} not in {translations_file}")
    out: dict[str, str] = {}
    for f_, t_ in zip(tdf[frm], tdf[to]):
        if f_ and t_ and str(f_) != "nan" and str(t_) != "nan":
            out[str(f_)] = str(t_)
    return out


def _spark_file_translation_prestage(t: TransformerSpec, derived: str):
    """Prestage that reads ``translations_file`` with ``spark.read`` and
    broadcast-joins it — the alias table never materializes on the driver.
    Mirrors ``_load_translations`` semantics: string-typed cells, null/'nan'
    entries dropped, LAST occurrence of a duplicate key wins (dict-build
    order)."""
    path = str(t.params["translations_file"])
    frm, to = str(t.params["translate_from"]), str(t.params["translate_to"])
    sep = t.params.get("sep", ",")
    if sep == "TAB":
        sep = "\t"
    src_col = t.columns[0]

    def prestage(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        if path.endswith(".parquet"):
            raw = spark.read.parquet(path)
        else:
            raw = spark.read.csv(path, sep=sep, header=True, inferSchema=False)
        for needed in (frm, to):
            if needed not in raw.columns:
                raise CompileError(f"translate: column {needed!r} not in {path}")
        k, v = F.col(frm).cast("string"), F.col(to).cast("string")
        pairs = raw.select(
            k.alias("_ow_k"), v.alias("_ow_v"),
            # file order proxy: increasing within and across splits of one
            # file, so max_by picks the last occurrence like the dict build
            F.monotonically_increasing_id().alias("_ow_ord"),
        ).where(
            k.isNotNull() & v.isNotNull() & (k != "nan") & (v != "nan")
            & (k != "") & (v != "")
        )
        tdf = pairs.groupBy("_ow_k").agg(
            F.max_by("_ow_v", "_ow_ord").alias(derived)
        ).withColumnRenamed("_ow_k", src_col)
        return df.join(F.broadcast(tdf), on=src_col, how="left")

    return prestage


def _raise_on_unknown(mapped: Column, original: Column) -> Column:
    """translate on_unknown_value=error: fail the JOB on the first unknown
    value, naming it — runtime raise_error parity with the reference's
    TransformerDataError (transformer.py translate error path), zero extra
    scans. Null/invalid originals still pass through as null (the row-skip
    contract runs downstream, not here)."""
    return F.when(
        is_not_null(original) & mapped.isNull(),
        F.raise_error(F.concat(
            F.lit("translate: no translation for value '"), original,
            F.lit("' (on_unknown_value=error)"),
        )).cast("string"),
    ).otherwise(mapped)


def _translate_lookup(t: TransformerSpec, tag: str):
    """Return (fn(Column)->Column mapped-or-null, prestages).

    Small dicts inline as a map literal (shipped with the plan — effectively
    a broadcast); large dicts become a real ``broadcast()`` hash join on a
    derived column; file-backed tables above
    ``TRANSLATE_FILE_SPARK_MIN_BYTES`` are read BY SPARK and broadcast-
    joined without ever touching the driver (the 100-TB-safe path)."""
    on_unknown_early = t.params.get("on_unknown_value", "skip")
    if on_unknown_early not in ("skip", "keep", "error"):
        raise CompileError(f"translate: bad on_unknown_value {on_unknown_early!r}")

    # Join-backed lookups (prestage left-joins the table on the RAW first
    # column, then the lookup reads the joined column) are only correct when
    # the lookup is applied to exactly that raw column: plain `translate` on
    # one column. split_translate applies the lookup per SPLIT PIECE and a
    # multi-column translate applies it per column — a join keyed on the
    # unsplit first cell would hand every piece/column the first cell's
    # translation (or null). Those shapes must stay expression-inline.
    joinable = t.op == "translate" and len(t.columns) == 1

    tfile = t.params.get("translations_file")
    if tfile and not t.params.get("translations"):
        frm, to = t.params.get("translate_from"), t.params.get("translate_to")
        if not frm or not to:
            raise CompileError(
                "translate: `translations_file` needs `translate_from` and `translate_to`"
            )
        import os as _os

        try:
            big = _os.path.getsize(str(tfile)) >= TRANSLATE_FILE_SPARK_MIN_BYTES
        except OSError:
            big = True  # non-local path (hdfs/s3): always the Spark path
        if big and not joinable:
            raise CompileError(
                f"translate ({t.op}): translations_file {tfile!r} is too large "
                "to inline and per-piece/multi-column translation cannot use "
                "the broadcast-join path (it keys on the raw first column); "
                "pre-explode the input or split the table"
            )
        if big:
            derived = f"_ow_trans_{tag}"

            def apply_file_policy(c: Column) -> Column:
                mapped = F.col(derived)
                if on_unknown_early == "keep":
                    return F.coalesce(mapped, c)
                if on_unknown_early == "error":
                    return _raise_on_unknown(mapped, c)
                return mapped

            return (lambda c: apply_file_policy(c)), [
                _spark_file_translation_prestage(t, derived)
            ]

    table = _load_translations(t)
    on_unknown = t.params.get("on_unknown_value", "skip")
    if on_unknown not in ("skip", "keep", "error"):
        raise CompileError(f"translate: bad on_unknown_value {on_unknown!r}")

    def apply_policy(mapped: Column, original: Column) -> Column:
        if on_unknown == "keep":
            return F.coalesce(mapped, original)
        if on_unknown == "error":
            return _raise_on_unknown(mapped, original)
        return mapped  # skip: unknown -> null (filtered by the null contract)

    if len(table) <= TRANSLATE_INLINE_MAX or not joinable:
        # non-joinable shapes (split pieces / multi-column) stay inline at
        # any size up to a hard cap — a join keyed on the raw cell would be
        # semantically wrong for them (see `joinable` above)
        if len(table) > TRANSLATE_INLINE_HARD_MAX:
            raise CompileError(
                f"translate ({t.op}): {len(table)} entries exceed the inline "
                f"cap ({TRANSLATE_INLINE_HARD_MAX}) and per-piece/multi-column "
                "translation cannot use the broadcast-join path; pre-explode "
                "the input or split the table"
            )
        items = []
        for k, v in table.items():
            items.append(F.lit(k))
            items.append(F.lit(v))
        m = F.create_map(*items)
        return (lambda c: apply_policy(F.element_at(m, c), c)), []

    derived = f"_ow_trans_{tag}"
    src_col = t.columns[0]

    def prestage(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        tdf = spark.createDataFrame(
            [(k, v) for k, v in table.items()], schema=f"`{src_col}` string, `{derived}` string"
        )
        return df.join(F.broadcast(tdf), on=src_col, how="left")

    return (lambda c: apply_policy(F.col(derived), c)), [prestage]


def compile_values(t: TransformerSpec, tag: str = "t") -> CompiledValues:
    """Compile one transformer spec to its candidate-values expression."""
    op = t.op
    cols = [F.col(c) for c in t.columns]

    if op in registry.USER_TRANSFORMERS:
        out = registry.USER_TRANSFORMERS[op](t)
        if isinstance(out, (CompiledValues, CompiledCandidates)):
            return out
        return CompiledValues(out)

    if op == "map":
        return CompiledValues(F.array(*cols))

    if op == "split":
        return CompiledValues(_split_arrays(t))

    if op == "cat":
        return CompiledValues(F.array(F.concat_ws("", *cols)))

    if op == "cat_format":
        fmt = t.params.get("format_string")
        if not fmt:
            raise CompileError("cat_format: needs `format_string`")
        return CompiledValues(F.array(_cat_format_expr(fmt)))

    if op == "rowIndex":
        return CompiledValues(F.array(F.col(ROW_ID_COL).cast("string")))

    if op == "string":
        if "value" not in t.params:
            raise CompileError("string: needs `value`")
        return CompiledValues(F.array(F.lit(str(t.params["value"]))))

    if op in ("lower", "upper", "capitalize", "lower_capitalize"):
        return CompiledValues(F.array(*[_case_op(op, c) for c in cols]))

    if op == "translate":
        lookup, pre = _translate_lookup(t, tag)
        return CompiledValues(F.array(*[lookup(c) for c in cols]), pre)

    if op == "split_translate":
        lookup, pre = _translate_lookup(t, tag)
        return CompiledValues(F.transform(_split_arrays(t), lookup), pre)

    if op == "replace":
        forbidden = t.params.get("forbidden", r"[^a-zA-Z0-9_`.()]")
        substitute = t.params.get("substitute", "")
        return CompiledValues(F.array(*[
            _strip_chars(F.regexp_replace(c, forbidden, substitute), substitute)
            for c in cols
        ]))

    if op == "split_replace":
        forbidden = t.params.get("forbidden", r"[^a-zA-Z0-9_`.()]")
        substitute = t.params.get("substitute", "")
        return CompiledValues(F.transform(
            _split_arrays(t),
            lambda x: _strip_chars(F.regexp_replace(x, forbidden, substitute), substitute),
        ))

    if op == "boolean":
        consider_true = [str(x) for x in t.params.get("consider_true") or []]
        consider_false = [str(x) for x in t.params.get("consider_false") or []]
        if not consider_true or not consider_false:
            raise CompileError("boolean: needs non-empty `consider_true` and `consider_false`")
        if set(consider_true) & set(consider_false):
            raise CompileError("boolean: overlapping consider_true/consider_false")
        out_t = str(t.params.get("output_true", "true"))
        out_f = str(t.params.get("output_false", "false"))
        if out_t == out_f:
            raise CompileError("boolean: output_true == output_false")

        def boo(c: Column) -> Column:
            return (
                F.when(c.isin(consider_true), F.lit(out_t))
                .when(c.isin(consider_false), F.lit(out_f))
            )
        return CompiledValues(F.array(*[boo(c) for c in cols]))

    if op == "nested":
        if len(t.columns) < 2:
            raise CompileError("nested: needs a column then at least one key")
        path = "$." + ".".join(t.columns[1:])
        return CompiledValues(F.array(F.get_json_object(cols[0], path)))

    if op == "split_nested":
        if len(t.columns) < 2:
            raise CompileError("split_nested: needs a column then at least one key")
        path = "$." + ".".join(t.columns[1:])
        split_spec = TransformerSpec(op="split", columns=t.columns[:1], params=t.params)
        return CompiledValues(F.transform(
            _split_arrays(split_spec), lambda x: F.get_json_object(x, path)
        ))

    if op == "maths":
        sql = compile_maths(t.params.get("operation"))
        return CompiledValues(F.array(F.expr(sql).cast("string")))

    # --- engine-native extensions (beyond the reference's operator set;
    # needed for web-text triple extraction where cell values are long
    # unstructured strings rather than pre-parsed CSV cells) -------------
    if op == "regex_extract":
        pattern = t.params.get("pattern")
        group = int(t.params.get("group", 1))
        if not pattern:
            raise CompileError("regex_extract: needs `pattern`")
        return CompiledValues(F.array(*[
            F.nullif(F.regexp_extract(c, pattern, group), F.lit("")) for c in cols
        ]))

    if op == "regex_extract_all":
        pattern = t.params.get("pattern")
        group = int(t.params.get("group", 1))
        if not pattern:
            raise CompileError("regex_extract_all: needs `pattern`")
        parts = [F.regexp_extract_all(c, F.lit(pattern), F.lit(group)) for c in cols]
        return CompiledValues(parts[0] if len(parts) == 1 else F.flatten(F.array(*parts)))

    if op == "token_count":
        # whitespace token count as a string value (text-quality feature)
        return CompiledValues(F.array(*[
            F.size(F.split(F.trim(c), r"\s+")).cast("string") for c in cols
        ]))

    raise CompileError(f"unknown transformer operator {op!r}")
