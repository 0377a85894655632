"""As-of (point-in-time) join — the time-series operator Spark's join
surface lacks, expressed as the scalable union + running-``last``
formulation instead of a range join.

Semantics (matching DuckDB/pandas ``ASOF LEFT JOIN`` / ``merge_asof``
with ``direction='backward'``, ``allow_exact_matches=True``): each left
row is paired with the single right row sharing its key whose timestamp
is the LARGEST one ``<=`` the left timestamp; left rows with no such
right row keep NULL right values.

Why not a join: the naive formulation is a band/theta join
(``l.key = r.key AND r.ts <= l.ts`` + a per-row argmax), which Spark
plans as a shuffled join with per-key Cartesian blow-up — O(|L_k|·|R_k|)
per key. The union formulation is O((|L|+|R|) log) with exactly ONE
shuffle:

1. tag right rows 0 and left rows 1, union them on (key, ts, tag);
2. one window partitioned by key, ordered by (ts, tag), running
   ``last(right_value, ignorenulls=True)`` — Spark evaluates a growing
   ``rowsBetween(unboundedPreceding, currentRow)`` frame in a single
   streaming pass per partition, no per-row rescans;
3. keep the left rows.

The (ts, tag) order makes a right row at exactly the left timestamp
visible to it (tag 0 sorts first) — the ``allow_exact_matches`` rule.
If several right rows share (key, ts), the survivor is the last in the
(deterministic) ``tiebreak_cols`` order, mirroring DuckDB's choice of
the max matching row.

Scale shape: one hash exchange on the key for the union, then a
per-key sort — the same cost as the groupBy the semantics force.
Hot keys degrade to single-partition sorts; the standard salting
escape (split the key's right rows into salt ranges and as-of join
per salt with a carried boundary row) composes on top, but at the
10^9-events-per-user point a real pipeline would pre-bucket by time
anyway. No broadcast, no range explosion, no driver-side state.

Reference scope note: the reference engine (tGautot/LogParser) has no
temporal join; this operator extends the telemetry surface
(SURVEY.md §2.6 events family) the way a production log pipeline
needs — enriching events against slowly-changing dimensions
(config/plan/deploy changes) without a dimension snapshot per event.
"""

from __future__ import annotations

from typing import Sequence

_TAG = "__asof_is_left"
_STRUCT = "__asof_left_row"
_RVALS = "__asof_right_row"


def asof_join(
    left,
    right,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    tiebreak_cols: Sequence[str] = (),
):
    """As-of join ``left`` to ``right`` on key ``on``: every left row
    gains ``value_cols`` (and ``asof_<right_ts>``, the matched right
    timestamp) from the latest right row at-or-before its ``left_ts``.

    ``value_cols`` defaults to every right column except the key and
    timestamp. Left columns pass through unchanged. ``tiebreak_cols``
    (right-side) deterministically orders right rows that share
    (key, ts).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (on, right_ts)
        ]
    matched_ts = f"asof_{right_ts}"

    # Common union schema: key, ts, tag, packed left row, packed right
    # row. BOTH sides are packed into one struct each: the left struct
    # keeps the union schema fixed regardless of the left projection; the
    # right struct carries (matched_ts, *value_cols) as a single value so
    # the running ``last(ignorenulls=True)`` below sees one NON-NULL cell
    # per right row even when individual value columns are NULL — a
    # per-column last() would let a NULL value field inherit from an
    # OLDER right row while asof_ts reported the newer one, diverging
    # from DuckDB/pandas ASOF semantics.
    rval_struct = F.struct(
        F.col(right_ts).alias(matched_ts),
        *[F.col(c) for c in value_cols],
    )
    rv_dtype = right.select(rval_struct.alias("x")).schema["x"].dataType

    lhs = left.select(
        F.col(on),
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_TAG),
        F.struct(*[F.col(c) for c in left.columns]).alias(_STRUCT),
        F.lit(None).cast(rv_dtype).alias(_RVALS),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}")
          for c in tiebreak_cols],
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_TAG),
        F.lit(None).cast(lhs.schema[_STRUCT].dataType).alias(_STRUCT),
        rval_struct.alias(_RVALS),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak_cols],
    )

    w = (
        Window.partitionBy(on)
        .orderBy("__asof_ts", _TAG, *[f"__tb_{c}" for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).select(
        F.col(on),
        F.col(_TAG),
        F.col(_STRUCT),
        F.last(_RVALS, ignorenulls=True).over(w).alias(_RVALS),
    )
    carried = [matched_ts] + list(value_cols)
    out = merged.where(F.col(_TAG) == 1).select(
        *[F.col(f"{_STRUCT}.{c}").alias(c) for c in left.columns],
        *[F.col(f"{_RVALS}.{c}").alias(c) for c in carried],
    )
    return out
