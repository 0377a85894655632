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


def quantile_sketch(df, value_col: str, q_ppm: Sequence[int],
                    r: int = 16, id_col: str = "doc_id",
                    bucket_width: int = 4096,
                    val_bucket_width: int = 64):
    """Deterministic MERGEABLE quantile sketch — the approximate
    companion to :func:`quantiles_exact` for pipelines that keep a
    per-shard summary and merge summaries instead of re-scanning
    (incremental corpus stats, per-snapshot length profiles).

    Construction (every step replayable in one SQL statement — no
    randomness, no float):

    1. shard rows into id-range buckets (``id div bucket_width`` —
       value-independent, so a shard's sketch never depends on other
       shards: that is what makes two sketches merge by plain UNION of
       their samples);
    2. within each bucket rank by ``(value, id)`` and keep every r-th
       element (ranks 1, r+1, ...), carrying weight = the number of
       elements it stands for (``min(r, n_bucket − rank + 1)`` — the
       tail keeper's weight is the remainder, so weights total exactly
       n_bucket);
    3. merged sample → cumulative weights in ``(value, bucket, rank)``
       order via the two-level value-bucket prefix sum (bounded
       windows — never a global single-task sort);
    4. the q-quantile estimate is the first sample value whose
       cumulative weight reaches ``target(q) = (q_ppm·(N−1)) div 10⁶
       + 1`` — ONE conditional aggregation over the sample (no
       non-equi join, keeping the no-BNLJ plan contract).

    Rank guarantee (deterministic, not probabilistic): within a
    bucket the kept sample's cumulative weight overstates any value's
    true rank by at most r−1, so the returned value's true rank is
    within ``(r−1) · n_buckets`` of the target — choose r ≈
    target_sample_error / n_buckets. Sample size is N/r rows; pick r
    for the summary size the merge fan-in needs (a two-level compaction
    — sketching the sketch — compounds the same bound additively).

    Output: one row per requested quantile, ``(q_ppm, est)``; empty
    input (or all-NULL values) yields no rows. NULLs are excluded from
    both the sample and N (the quantiles_exact contract).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not q_ppm:
        raise ValueError("q_ppm must be non-empty")
    vals = df.select(
        F.col(id_col).alias("__id"),
        F.col(value_col).cast("long").alias("val"),
    ).where(F.col("val").isNotNull())
    n = vals.count()
    if n == 0:
        return vals.select(
            F.lit(0).cast("long").alias("q_ppm"),
            F.lit(None).cast("long").alias("est"),
        ).where(F.lit(False))

    b = vals.withColumn("bucket", F.expr(f"__id div {int(bucket_width)}"))
    w_rank = Window.partitionBy("bucket").orderBy("val", "__id")
    w_cnt = Window.partitionBy("bucket")
    ranked = b.select(
        "bucket", "val",
        F.row_number().over(w_rank).alias("rnk"),
        F.count(F.lit(1)).over(w_cnt).alias("nb"),
    )
    sample = ranked.where(F.expr(f"(rnk - 1) % {int(r)} = 0")).select(
        "bucket", "val", "rnk",
        F.least(F.lit(int(r)), F.col("nb") - F.col("rnk") + 1)
        .cast("long").alias("w"),
    )
    # two-level prefix sum over the SAMPLE in (val, bucket, rnk) order:
    # value-bucket windows are bounded; the value-bucket offset table is
    # tiny (one row per val div width)
    sb = sample.withColumn(
        "vb", F.expr(f"val div {int(val_bucket_width)}")
    )
    w_in = (
        Window.partitionBy("vb").orderBy("val", "bucket", "rnk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = sb.withColumn("__cin", F.sum("w").over(w_in))
    vbt = sb.groupBy("vb").agg(F.sum("w").alias("__vn"))
    w_vb = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    voff = vbt.withColumn(
        "__voff", F.coalesce(F.sum("__vn").over(w_vb), F.lit(0))
    ).select("vb", "__voff")
    cum = intra.join(F.broadcast(voff), "vb").select(
        "val", (F.col("__cin") + F.col("__voff")).alias("cum")
    )
    # one conditional aggregation picks every quantile: values are
    # non-decreasing along the cum order, so min(val | cum >= target)
    # IS the first qualifying sample
    aggs = []
    targets = []
    for q in q_ppm:
        t = (int(q) * (n - 1)) // 1_000_000 + 1
        targets.append((int(q), t))
        aggs.append(
            F.min(F.when(F.col("cum") >= t, F.col("val")))
            .alias(f"__e{q}")
        )
    one = cum.agg(*aggs)
    stack = ", ".join(
        f"{q}L, __e{q}" for q, _ in targets
    )
    return one.select(
        F.expr(f"stack({len(targets)}, {stack}) AS (q_ppm, est)")
    )
