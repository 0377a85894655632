"""Checkpoint/lineage + idempotent resume (north rule: 'resumable from
checkpoint with per-partition lineage + metrics') and skew helpers."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def parsed(spark):
    from logparser_spark.functions.formats import DEFAULT_FORMAT, compile_format
    from logparser_spark.operators.parse import explode_lines, parse_lines
    from logparser_spark.sources.pages import build_pages_from_documents

    spec = compile_format(DEFAULT_FORMAT)
    pages = build_pages_from_documents(spark, SF_DIR)
    lines = explode_lines(pages, keep_cols=["doc_id", "url", "lang"])
    return parse_lines(lines, spec).persist(), spec


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sinks():
    from logparser_spark.operators.route import SinkSpec

    return [SinkSpec("s_info", "Level EQ INFO"), SinkSpec("s_all", None)]


def test_clean_run_then_noop(spark, parsed, base):
    from logparser_spark.plans import checkpoint as C

    df, spec = parsed
    r1 = C.route_checkpointed(df, _sinks(), spec, base, buckets=8)
    assert len(r1["processed"]) == 8 and not r1["skipped"]

    n_info = C.read_routed(spark, base, "s_info").count()
    n_all = C.read_routed(spark, base, "s_all").count()
    assert n_all == df.count()
    # oracle: INFO routed = wf&INFO + malformed (accept_bad_format)
    wf = F.col("parsed.well_formed")
    expected = df.filter(
        (~wf) | (wf & (F.col("parsed.Level") == "INFO"))
    ).count()
    assert n_info == expected

    # second run is a no-op
    r2 = C.route_checkpointed(df, _sinks(), spec, base, buckets=8)
    assert r2["processed"] == [] and len(r2["skipped"]) == 8
    assert C.read_routed(spark, base, "s_info").count() == n_info

    m = C.lineage_metrics(base)
    assert m["buckets"] == 8 and m["rows"] == df.count()
    assert m["well_formed_rows"] == df.filter(wf).count()


def test_kill_and_rerun_exact_counts(spark, parsed, base):
    from logparser_spark.plans import checkpoint as C

    df, spec = parsed
    # crash after 3 of 8 bucket commits
    with pytest.raises(RuntimeError, match="injected failure"):
        C.route_checkpointed(
            df, _sinks(), spec, base, buckets=8, fail_after_buckets=3
        )
    partial = C.lineage_metrics(base)
    assert partial["buckets"] == 3

    # resume: only the 5 unpublished buckets are reprocessed
    r = C.route_checkpointed(df, _sinks(), spec, base, buckets=8)
    assert len(r["processed"]) == 5 and len(r["skipped"]) == 3

    # exact-count invariant: neither duplicated nor dropped
    assert C.read_routed(spark, base, "s_all").count() == df.count()
    ids_routed = (
        C.read_routed(spark, base, "s_all")
        .select("doc_id", "line_no")
        .distinct()
        .count()
    )
    assert ids_routed == df.select("doc_id", "line_no").distinct().count()


def test_salted_count_equals_plain(spark, parsed):
    from logparser_spark.operators.enrich import url_host
    from logparser_spark.plans.skew import salted_count

    df, _ = parsed
    hosts = df.withColumn("host", url_host(F.col("url")))
    plain = {
        r["host"]: r["n"]
        for r in hosts.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["host"]: r["n"] for r in salted_count(hosts, "host", k=16).collect()
    }
    assert salted == plain
    # the fixture skew really is there: the 3 hot hosts (x6 TLD variants)
    # own ~70% of all lines
    hot = sum(n for h, n in plain.items() if h.startswith("hot"))
    assert hot / sum(plain.values()) > 0.6


def test_salted_distinct_count(spark, parsed):
    from logparser_spark.operators.enrich import url_host
    from logparser_spark.plans.skew import salted_distinct_count

    df, _ = parsed
    hosts = df.filter(F.col("parsed.well_formed")).select(
        url_host(F.col("url")).alias("host"),
        F.col("parsed.Level").alias("level"),
    )
    plain = {
        r["host"]: r["n"]
        for r in hosts.groupBy("host")
        .agg(F.countDistinct("level").alias("n"))
        .collect()
    }
    got = {
        r["host"]: r["n_distinct"]
        for r in salted_distinct_count(hosts, "host", "level").collect()
    }
    assert got == plain
