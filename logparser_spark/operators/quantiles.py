"""Exact distributed quantiles WITHOUT a global sort.

``approx_percentile`` exists in Spark, but a training-data pipeline
frequently needs the exact cut (deterministic shard boundaries,
reproducible length filters). The classic scalable shape is
rank-select over the VALUE HISTOGRAM: one value-keyed aggregate
(vocabulary-sized, not corpus-sized), a two-level prefix sum — the
same bounded-window construction as ``parse.with_global_line_id``:
order-preserving buckets (``value div bucket_width``), per-bucket
totals cumulated in one tiny single-partition window, within-bucket
cumsum partitioned by bucket — then one wide aggregate picks the
minimal value whose cumulative count reaches each target rank. No
``orderBy().limit()``, no single-partition pass over row-level data.

Rank contract (quantile_disc / "lower" interpolation), integer-exact:
``r(q) = (q_ppm * (N - 1)) div 10^6 + 1`` (1-based), the q-quantile is
the r-th smallest value. Quantile positions are parts-per-million
integers so no IEEE multiply enters the contract.
"""

from __future__ import annotations

from typing import List, Sequence


def quantiles_exact(df, value_col: str, q_ppm: Sequence[int],
                    bucket_width: int = 64):
    """Exact q-quantiles of a NON-NEGATIVE integer column (``div``
    bucketing truncates toward zero, which would interleave negative
    buckets with bucket 0 — shift negative domains before calling).

    Output: one row per requested quantile, ``(q_ppm, value)``;
    an empty input yields null values (n = 0). NULL (or
    non-castable) values are EXCLUDED from the population — both the
    histogram and N skip them, so ranks stay aligned (SQL
    quantile_disc semantics).

    Shuffles: the value histogram (map-side combine collapses to
    distinct-value cardinality), the per-bucket totals (bucket
    cardinality — the only single-partition window, same bounded shape
    as the global-line-id prefix sum), and the within-bucket cumsum.
    One O(1) scalar job fetches N (the unigram-total pattern)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    vals = (
        df.select(F.col(value_col).cast("long").alias("val"))
        .where(F.col("val").isNotNull())
    )
    counts = (
        vals.groupBy("val")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumn("bucket", F.expr(f"val div {int(bucket_width)}"))
    )
    btot = counts.groupBy("bucket").agg(F.sum("c").alias("bc"))
    boff = btot.select(
        "bucket",
        (F.sum("bc").over(
            Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        ) - F.col("bc")).alias("boff"),
    )
    within = F.sum("c").over(
        Window.partitionBy("bucket").orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        counts.join(F.broadcast(boff), "bucket")
        .select("val", (F.col("boff") + within).alias("cum"))
    )
    n = vals.count()
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [(int(q), None) for q in q_ppm], "q_ppm long, value long"
        )
    aggs = []
    for q in q_ppm:
        r = (int(q) * (n - 1)) // 1_000_000 + 1
        aggs.append(
            F.min(F.when(F.col("cum") >= r, F.col("val")))
            .alias(f"q{int(q)}")
        )
    wide = cum.agg(*aggs)
    stack = ", ".join(
        f"{int(q)}L, q{int(q)}" for q in q_ppm
    )
    return wide.select(
        F.expr(f"stack({len(q_ppm)}, {stack}) AS (q_ppm, value)")
    ).select(
        F.col("q_ppm").cast("long"), F.col("value").cast("long")
    )
