"""Sink-target abstraction: parse round-trips and the Iceberg branch up
to the classpath boundary (this sandbox has no Iceberg jars — verified
each round via the capability probe — so the write path must fail with
the documented, actionable error, not a ClassNotFoundException deep in
py4j)."""

from __future__ import annotations

import pytest

from logparser_spark.sources.sinks import (
    SinkTarget,
    _iceberg_available,
    read_source,
    write_sink,
)


def test_sink_target_parse_round_trips():
    cases = {
        "parquet:/tmp/out": ("parquet", "/tmp/out"),
        "iceberg:cat.db.tbl": ("iceberg", "cat.db.tbl"),
        "iceberg:cat.db.tbl.with.dots": ("iceberg", "cat.db.tbl.with.dots"),
        "/bare/path": ("parquet", "/bare/path"),
        "relative/path": ("parquet", "relative/path"),
        # a windows-ish or url-ish spec without a known kind prefix is a
        # bare parquet path, not a crash
        "s3://bucket/key": ("parquet", "s3://bucket/key"),
    }
    for spec, (kind, loc) in cases.items():
        t = SinkTarget.parse(spec)
        assert (t.kind, t.location) == (kind, loc), spec


def test_iceberg_branch_raises_documented_error_without_jars(spark):
    """Exercises the iceberg write/read branches to the classpath
    boundary: with no Iceberg runtime on the classpath the capability
    probe is False and both paths raise the actionable RuntimeError
    (naming --packages) BEFORE any writeTo/load call. If this
    environment ever gains the jars, the probe flips and this test
    documents that the real branch needs an integration run instead."""
    if _iceberg_available(spark):
        pytest.skip("Iceberg runtime present — run the real write path")
    df = spark.range(3)
    tgt = SinkTarget.parse("iceberg:cat.db.tbl")
    with pytest.raises(RuntimeError, match="--packages"):
        write_sink(df, tgt)
    with pytest.raises(RuntimeError, match="classpath"):
        read_source(spark, tgt)


def test_parquet_sink_round_trip(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "v")
    tgt = SinkTarget.parse(f"parquet:{tmp_path}/t")
    write_sink(df, tgt, mode="overwrite")
    back = read_source(spark, tgt)
    assert sorted(r["v"] for r in back.collect()) == [0, 1, 2, 3, 4]
