"""Bucketed co-located joins: the shuffle-elimination strategy for
repeated large-table joins at 100 TB.

A join between two 10^12-row tables shuffles BOTH sides on the key —
every time the join runs. If the tables are WRITTEN bucketed by that
key (same bucket count, same key), Spark plans a SortMergeJoin with NO
Exchange on either side: each task reads matching bucket files from
both tables and joins locally. For pipelines that join the same keys
every run (digest ledgers for incremental dedup, posting shards joined
to doc metadata, CDX index to capture blobs), paying one bucketed
write amortizes the per-run shuffle away entirely.

This module wraps the three moving parts so operators can opt in:

- :func:`write_bucketed` — persist a DataFrame as a bucketed+sorted
  table (``bucketBy().sortBy().saveAsTable()``; bucketed layout needs
  the session catalog, plain ``parquet(path)`` silently drops bucket
  metadata — the classic trap).
- :func:`co_located_join` — join two bucketed tables on their bucket
  key with the configuration that keeps the planner honest
  (``spark.sql.sources.bucketing.enabled``, autoBroadcast off for the
  check) and return the joined frame.
- :func:`assert_no_shuffle` — raise if a plan still contains an
  Exchange; the bucketing contract is load-bearing, so plan shape is
  validated, not assumed (same philosophy as tests/test_plan_shapes).

Cluster notes: bucket count is a layout decision — pick it for the
TARGET scale (buckets ≈ total_size / healthy_partition_size; they are
read-parallelism units), and keep it IDENTICAL on both join sides or
Spark shuffles the mismatched side. Writes of a bucketed table want
``df.repartition(n_buckets, key)`` first so each task writes one file
per bucket instead of n_buckets small files (the small-files explosion
at 10^5 tasks).
"""

from __future__ import annotations


def write_bucketed(df, table: str, key: str, n_buckets: int = 8,
                   mode: str = "overwrite"):
    """Persist ``df`` as a bucketed-and-sorted managed table keyed on
    ``key``. Pre-repartitions by (n_buckets, key) so every bucket is
    written by one task — one file per bucket, not one per
    (task, bucket) pair."""
    (
        df.repartition(n_buckets, df[key])
        .write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def co_located_join(spark, left_table: str, right_table: str, key: str,
                    how: str = "inner"):
    """Join two same-bucketed tables on ``key`` — planned with zero
    Exchange nodes when the bucket layouts line up (verify with
    :func:`assert_no_shuffle`; layouts drift when someone rewrites one
    side unbucketed)."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # bucketed SMJ only wins over broadcast for LARGE×LARGE joins; for
    # the verification path force the planner to show its SMJ hand
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)


def assert_no_shuffle(df) -> str:
    """Validate the co-location contract: the executed plan must not
    contain an Exchange (shuffle). Returns the plan string for
    logging; raises AssertionError with the plan when violated."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "bucketed join planned a shuffle — layouts do not line up:\n"
            + plan
        )
    return plan
