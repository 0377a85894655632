"""Vectorized parse stage: pages -> lines -> typed parsed struct.

The core custom operator (SURVEY.md §4 item 1). Catalyst cannot express the
reference's format-spec semantics (INT zero-rule, trailing-field
optionality, NCHAR), so parsing runs inside ONE Arrow-batched pandas UDF
per line column:

1. **regex fast path** — the compiled spec's anchored possessive regex
   (``FormatSpec.to_regex``) executed via ``pandas.Series.str.extract``
   (C-level, no per-row Python). Possessive quantifiers mirror the
   reference walker's greedy no-backtracking consumption exactly
   (``/root/reference/src/line_parsing/line_parser.cpp:58-98``).
2. **oracle walker fallback** — only for rows the regex rejects or flags
   (the walker can succeed where no regex can: ``parse_int`` accepts
   ``-5`` by value without consuming the sign, ``parsing_basics.cpp:7-13``;
   ``atof`` value/cursor divergences). The byte-exact pure-Python oracle
   (``functions.oracle.parse_line``) decides those rows.

Scale notes (100 TB): the UDF sees a single string column per batch; all
other columns stay JVM-side. Everything upstream (split/posexplode/CRLF
strip) and downstream (filters, joins, aggregates) is pure Catalyst, so
predicate pushdown and whole-stage codegen are unaffected. The Python
worker cost is one C-regex pass per batch; fallback rows are O(malformed).

Unicode caveat: the reference parses raw bytes; we parse Python ``str``
codepoints. For ASCII payloads (the mandated fixtures) these agree
byte-for-byte; NCHAR counts would differ on multi-byte UTF-8.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional

import pandas as pd

from ..functions.formats import FieldType, FormatSpec
from ..functions.oracle import parse_line as oracle_parse_line

__all__ = ["explode_lines", "make_parse_udf", "parse_lines"]


def _batch_parse(lines: pd.Series, spec: FormatSpec) -> pd.DataFrame:
    """Parse one Arrow batch of lines into the spec's output columns +
    ``well_formed``. Pure pandas/C-regex; Python loop only over fallback
    rows."""
    pattern = re.compile(spec.to_regex())
    cols = spec.column_names()
    out_fields = spec.output_fields()

    s = lines.astype("object").fillna("")
    # Sentinel group `wf0` participates iff the anchored pattern matched
    # (it captures '', which is notna; unmatched rows are all-NaN).
    extracted = s.str.extract(pattern)
    matched = extracted["wf0"].notna()

    # Rows the fast path may not decide correctly -> oracle walker:
    #  - regex failed (walker can still succeed: sign/ws-led numbers);
    #  - any DBL capture in the atof-divergence set (see to_regex docstring).
    fallback = ~matched
    for k, (i, f) in enumerate(out_fields):
        if f.ftype != FieldType.DBL:
            continue
        g = extracted[f"g{i}"]
        present = g.notna()
        num = pd.to_numeric(g, errors="coerce")
        susp = present & (
            g.isin(["", ".", "0"])
            | (num.eq(0.0) & ~g.str.startswith("0").fillna(False))
            | num.isna()
        )
        fallback |= susp

    null_line = lines.isna()
    fallback &= ~null_line

    data = {}
    for k, (i, f) in enumerate(out_fields):
        g = extracted[f"g{i}"]
        if f.ftype == FieldType.INT:
            data[cols[k]] = pd.to_numeric(g, errors="coerce").astype("Int64")
        elif f.ftype == FieldType.DBL:
            data[cols[k]] = pd.to_numeric(g, errors="coerce").astype("float64")
        else:  # CHR / STR as strings; CHR capture is the target char
            data[cols[k]] = g.where(g.notna(), None)
    result = pd.DataFrame(data, index=s.index)
    well = matched & ~null_line

    if fallback.any():
        fb_idx = s.index[fallback]
        fb_vals: dict[str, list] = {c: [] for c in cols}
        fb_wf = []
        for raw in s.loc[fb_idx]:
            values, wf = oracle_parse_line(raw, spec)
            fb_wf.append(wf)
            for k, v in enumerate(values):
                fb_vals[cols[k]].append(v)
        for k, (i, f) in enumerate(out_fields):
            col = pd.Series(fb_vals[cols[k]], index=fb_idx, dtype="object")
            if f.ftype == FieldType.INT:
                col = col.astype("Int64")
            elif f.ftype == FieldType.DBL:
                col = col.astype("float64")
            result.loc[fb_idx, cols[k]] = col
        well = well.copy()
        well.loc[fb_idx] = fb_wf

    # dtypes can degrade through .loc assignment; restore the Arrow-friendly ones
    for k, (i, f) in enumerate(out_fields):
        if f.ftype == FieldType.INT:
            result[cols[k]] = result[cols[k]].astype("Int64")
        elif f.ftype == FieldType.DBL:
            result[cols[k]] = result[cols[k]].astype("float64")
    result["well_formed"] = well.astype(bool)
    return result


def make_parse_udf(spec: FormatSpec):
    """Build the pandas UDF ``string -> struct<fields..., well_formed>``.

    The compiled spec travels to executors via closure capture (the Spark
    analog of the reference's compile-once parse program,
    ``line_parser.cpp:5-45``)."""
    from pyspark.sql.functions import pandas_udf

    schema = spec.spark_schema()

    @pandas_udf(schema)
    def parse(lines: pd.Series) -> pd.DataFrame:
        return _batch_parse(lines, spec)

    return parse


def explode_lines(
    df,
    text_col: str = "text",
    keep_cols: Optional[Iterable[str]] = None,
    line_no_col: str = "line_no",
    raw_col: str = "raw_line",
):
    """pages -> one row per line, JVM-side only.

    Reproduces the reference's file read (split on ``\\n``, strip one
    trailing ``\\r`` per line, no phantom line after a trailing newline —
    ``filtered_file_reader.cpp:137-167``). ``line_no`` is the 0-based
    per-document line id (the reference's global ``line_num`` scoped per
    document; SURVEY.md §7.4 risk 2 — avoids a global zipWithIndex shuffle).
    """
    from pyspark.sql import functions as F

    keep = list(keep_cols) if keep_cols is not None else [
        c for c in df.columns if c != text_col
    ]
    lines = F.split(F.col(text_col), "\n")
    lines = F.when(
        F.col(text_col).endswith("\n") & (F.size(lines) > 1),
        F.slice(lines, 1, F.size(lines) - 1),
    ).otherwise(lines)
    out = df.select(
        *keep, F.posexplode(lines).alias(line_no_col, raw_col)
    )
    return out.withColumn(raw_col, F.regexp_replace(raw_col, "\r$", ""))


def parse_lines(
    df,
    spec: FormatSpec,
    line_col: str = "raw_line",
    out_col: str = "parsed",
    with_matched_format: bool = True,
):
    """Attach the parsed struct (and the ``matched_format`` tag used by the
    per-format aggregate counts)."""
    from pyspark.sql import functions as F

    udf = make_parse_udf(spec)
    out = df.withColumn(out_col, udf(F.col(line_col)))
    if with_matched_format:
        out = out.withColumn(
            "matched_format",
            F.when(F.col(f"{out_col}.well_formed"), F.lit(spec.name)),
        )
    return out
