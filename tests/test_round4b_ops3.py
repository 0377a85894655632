"""Round-4b batch 3: per-group HyperLogLog and unigram drift."""

from __future__ import annotations


def test_hll_by_group_matches_global_per_group(spark):
    """Per-group registers/estimate must equal running the GLOBAL hll
    on each group's slice — the grouped op is a keyed restatement, not
    a new sketch."""
    from pyspark.sql import functions as F

    from logparser_spark.operators.sketch import (
        hll_estimate,
        hll_estimate_by,
        hll_registers,
        hll_registers_by,
    )

    rows = [(f"g{i % 3}", f"user{i % 37}") for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "item"])
    grouped = {
        r.g: (r.v_empty, r.s30, r.raw_est)
        for r in hll_estimate_by(hll_registers_by(df, "g", "item"),
                                 "g").collect()
    }
    assert set(grouped) == {"g0", "g1", "g2"}
    for g in sorted(grouped):
        solo = hll_estimate(
            hll_registers(df.where(F.col("g") == g), "item")
        ).collect()[0]
        assert grouped[g] == (solo.v_empty, solo.s30, solo.raw_est), g


def test_hll_by_group_estimate_in_range(spark):
    """Each group's raw estimate lands within the HLL error envelope
    of its exact distinct (generous 3σ ≈ 39% at m=64, small-range
    regime included via the v_empty>0 linear-counting escape)."""
    import math

    from logparser_spark.operators.sketch import (
        hll_estimate_by,
        hll_registers_by,
    )

    rows = [("a", f"u{i}") for i in range(200)] + [
        ("b", f"v{i % 9}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "item"])
    got = {r.g: r for r in hll_estimate_by(
        hll_registers_by(df, "g", "item"), "g").collect()}
    exact = {"a": 200, "b": 9}
    for g, n in exact.items():
        r = got[g]
        if r.v_empty > 0 and r.raw_est <= 2.5 * 64:
            # linear-counting regime: m·ln(m/V) is the client-side
            # correction; check IT, not the raw estimate
            est = 64 * math.log(64 / r.v_empty)
        else:
            est = r.raw_est
        assert abs(est - n) <= max(0.4 * n, 4), (g, est, n)


def test_unigram_drift_detects_shift(spark):
    from logparser_spark.operators.textstats import unigram_drift

    a = spark.createDataFrame(
        [(1, "alpha beta gamma " * 10)], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [(2, "alpha beta DELTA " * 10)], ["doc_id", "text"]
    )
    got = {r.word: r for r in unigram_drift(a, b, 1000).collect()}
    # gamma: 333333 ppm -> 0; DELTA: 0 -> 333333; alpha/beta unchanged
    assert set(got) == {"gamma", "DELTA"}
    assert got["gamma"].ppm_a == 333_333 and got["gamma"].ppm_b == 0
    assert got["DELTA"].cnt_a == 0 and got["DELTA"].cnt_b == 10
    assert got["gamma"].delta_ppm == 333_333


def test_unigram_drift_integer_ppm_trunc(spark):
    """ppm is trunc(count*1e6/total) — 1/3 must be 333333, never a
    rounded 333334 (the cross-engine division contract)."""
    from logparser_spark.operators.textstats import unigram_drift

    a = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "x x x")], ["doc_id", "text"])
    got = {r.word: r for r in unigram_drift(a, b, 0).collect()}
    assert got["x"].ppm_a == 333_333
    assert got["x"].ppm_b == 1_000_000
    assert got["y"].delta_ppm == 333_333
