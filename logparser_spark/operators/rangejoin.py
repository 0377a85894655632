"""Range (interval) join — the point-in-interval join Spark's
optimizer has no native strategy for: a plain ``ON start <= ts AND ts
< end`` plans BroadcastNestedLoopJoin (forbidden here) or a cartesian.
The standard scalable rewrite (the Databricks "bin/bucket range join
optimization" shape, also how KDB/QuestDB execute it): overlay a
fixed grid of width ``bucket_s`` seconds, EXPLODE each interval into
the grid cells it covers, compute each point's single cell, equality-
join on the cell, and re-check the exact predicate on the residual.

Cost model: one hash-partitioned equality join; the interval side
inflates by ceil(interval_len / bucket_s) rows — pick ``bucket_s``
near the median interval length so the inflation is a small constant
(the classic tuning rule). Grid cells are computed with floor
division on epoch seconds, so the decomposition is deterministic and
restatable in SQL; the ORACLE, by contrast, states the plain
inequality join directly — checking the rewrite against the naive
semantics, not against itself.

Join semantics: inner, half-open ``start <= ts < end``; NULL
timestamps or bounds never match (SQL comparison semantics).
"""

from __future__ import annotations


def range_join(points, intervals, ts_col: str = "ts",
               start_col: str = "start_ts", end_col: str = "end_ts",
               bucket_s: int = 3600):
    """Inner-join ``points`` to every interval containing their
    timestamp. Returns all point columns plus all interval columns.

    Scale shape: map-side grid decomposition (explode factor =
    interval span / bucket_s) + ONE equality-shuffle on the grid cell
    + residual filter in codegen. Never a nested-loop or cartesian
    plan (plan-shape-tested). A point matches an interval exactly
    once: the point lives in one cell, and each interval covers that
    cell at most once."""
    from pyspark.sql import functions as F

    def _epoch(c):
        # parquet timestamps often read as TIMESTAMP_NTZ; normalize so
        # the grid math is type-independent (cells only need to be
        # self-consistent between the two sides)
        return F.unix_timestamp(F.col(c).cast("timestamp"))

    p_cell = F.floor(_epoch(ts_col) / F.lit(int(bucket_s))).cast("long")
    i_first = F.floor(
        _epoch(start_col) / F.lit(int(bucket_s))
    ).cast("long")
    # half-open end: the cell containing (end - 1s) is the last one
    # an interval can match a point in
    i_last = F.floor(
        (_epoch(end_col) - 1) / F.lit(int(bucket_s))
    ).cast("long")

    iv = intervals.withColumn(
        "__cell",
        F.explode(
            F.when(
                F.col(start_col) < F.col(end_col),
                F.sequence(i_first, i_last),
            ).otherwise(
                F.array().cast("array<long>")  # empty interval
            )
        ),
    )
    pt = points.withColumn("__cell", p_cell)
    return (
        pt.join(iv, "__cell")
        .where(
            (F.col(start_col) <= F.col(ts_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__cell")
    )
