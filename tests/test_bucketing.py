"""Bucketed co-located join: the zero-shuffle contract is validated on
the actual executed plan, and results equal the plain shuffled join."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_tables(spark):
    from pyspark.sql import functions as F

    from logparser_spark.plans.bucketing import write_bucketed

    # warehouse.dir is a STATIC conf — managed tables land in the
    # session default (./spark-warehouse); DROP TABLE removes the files
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("payload_a"),
    )
    meta = spark.range(0, 1000, 3).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).alias("payload_b"),
    )
    write_bucketed(docs, "t_docs_bkt", "doc_id", n_buckets=4)
    write_bucketed(meta, "t_meta_bkt", "doc_id", n_buckets=4)
    yield "t_docs_bkt", "t_meta_bkt"
    spark.sql("DROP TABLE IF EXISTS t_docs_bkt")
    spark.sql("DROP TABLE IF EXISTS t_meta_bkt")


def test_bucketed_join_plans_no_exchange(spark, bucketed_tables):
    from logparser_spark.plans.bucketing import (
        assert_no_shuffle,
        co_located_join,
    )

    lt, rt = bucketed_tables
    # force the SMJ path so the test checks bucket co-location, not a
    # broadcast that would hide a layout mismatch
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, lt, rt, "doc_id")
        plan = assert_no_shuffle(j)
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    from logparser_spark.plans.bucketing import co_located_join

    lt, rt = bucketed_tables
    j = co_located_join(spark, lt, rt, "doc_id")
    got = sorted((r.doc_id, r.payload_a, r.payload_b) for r in j.collect())
    expected = sorted(
        (i, i % 97, i % 13) for i in range(0, 1000, 3)
    )
    assert got == expected


def test_mismatched_layout_is_detected(spark, bucketed_tables):
    """An unbucketed side must trip assert_no_shuffle, not silently
    shuffle — the contract is explicit."""
    from pyspark.sql import functions as F

    from logparser_spark.plans.bucketing import assert_no_shuffle

    lt, _ = bucketed_tables
    plain = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    plain.createOrReplaceTempView("t_plain")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(lt).join(spark.table("t_plain"), "doc_id")
        with pytest.raises(AssertionError):
            assert_no_shuffle(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
