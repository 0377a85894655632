"""Config-driven job runner (plans/job.py) + sink abstraction."""

from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture()
def work(spark):
    d = tempfile.mkdtemp(prefix="job_")
    from logparser_spark.sources.pages import build_pages_from_documents

    build_pages_from_documents(spark, "/root/testdata/sf0.001").write.parquet(
        f"{d}/pages"
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_job_run_and_resume(spark, work):
    from logparser_spark.plans.job import JobConfig, run_job

    cfg = JobConfig.from_dict(
        {
            "input": f"parquet:{work}/pages",
            "output": f"{work}/out",
            "sinks": [
                {"name": "info", "filter": "Level EQ INFO"},
                {"name": "all", "filter": None},
            ],
            "buckets": 8,
        }
    )
    m1 = run_job(spark, cfg)
    assert m1["buckets"] == 8 and m1["rows"] == 15634
    assert m1["well_formed_rows"] == 14626
    # idempotent re-run
    m2 = run_job(spark, cfg)
    assert m2 == m1

    hist = spark.read.parquet(f"{work}/out/_agg/info_level_hist").collect()
    assert {(r["Level"], r["n"]) for r in hist} == {("INFO", 2521)}


def test_job_single_pass_strategy_matches_checkpoint(spark, work):
    """route_strategy='single_pass' (one streamed scan, partitioned
    write) must land the same per-sink row sets as the checkpointed
    strategy, and its aggregate tables must agree."""
    from logparser_spark.plans import checkpoint as C
    from logparser_spark.plans.job import JobConfig, run_job

    base_cfg = {
        "input": f"parquet:{work}/pages",
        "sinks": [
            {"name": "info", "filter": "Level EQ INFO"},
            {"name": "all", "filter": None},
        ],
        "buckets": 8,
    }
    cfg_cp = JobConfig.from_dict(
        {**base_cfg, "output": f"{work}/out_cp"}
    )
    cfg_sp = JobConfig.from_dict(
        {**base_cfg, "output": f"{work}/out_sp",
         "route_strategy": "single_pass"}
    )
    run_job(spark, cfg_cp)
    m = run_job(spark, cfg_sp)
    assert m["strategy"] == "single_pass"

    from logparser_spark.operators.route import read_routed_sink

    for name in ("info", "all"):
        cp = {
            (r["doc_id"], r["line_no"])
            for r in C.read_routed(spark, f"{work}/out_cp", name)
            .select("doc_id", "line_no").collect()
        }
        sp = {
            (r["doc_id"], r["line_no"])
            for r in read_routed_sink(spark, f"{work}/out_sp/routed", name)
            .select("doc_id", "line_no").collect()
        }
        assert sp == cp, name
        assert m["sink_rows"][name] == len(cp)

    h_cp = {(r["Level"], r["n"]) for r in spark.read.parquet(
        f"{work}/out_cp/_agg/info_level_hist").collect()}
    h_sp = {(r["Level"], r["n"]) for r in spark.read.parquet(
        f"{work}/out_sp/_agg/info_level_hist").collect()}
    assert h_cp == h_sp

    with pytest.raises(ValueError, match="route_strategy"):
        run_job(spark, JobConfig.from_dict(
            {**base_cfg, "output": f"{work}/out_bad",
             "route_strategy": "bogus"}
        ))


def test_sink_target_parse_and_iceberg_gate(spark):
    from logparser_spark.sources.sinks import SinkTarget, write_sink

    assert SinkTarget.parse("/tmp/x").kind == "parquet"
    assert SinkTarget.parse("parquet:/tmp/x").location == "/tmp/x"
    t = SinkTarget.parse("iceberg:cat.db.tbl")
    assert t.kind == "iceberg" and t.location == "cat.db.tbl"

    df = spark.range(1)
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        write_sink(df, t)


def test_job_multi_format_cascade(spark, work):
    """extra_formats in the job config runs the first-match cascade:
    hex-dump lines (malformed under the primary format) are tagged with
    the secondary format, and primary-format routing is unchanged."""
    from pyspark.sql import functions as F

    from logparser_spark.plans.job import JobConfig, run_job

    cfg = JobConfig.from_dict(
        {
            "input": f"parquet:{work}/pages",
            "output": f"{work}/out_mf",
            "extra_formats": {
                "hexdump": ("{INT:B0}x{STR:H0} {INT:B1}x{STR:H1} "
                            "{INT:B2}x{STR:H2} {INT:B3}x{STR:H3} "
                            "{STR:Tag}"),
            },
            "sinks": [
                {"name": "info", "filter": "Level EQ INFO"},
                {"name": "all", "filter": None},
            ],
            "buckets": 4,
        }
    )
    m = run_job(spark, cfg)
    assert m["rows"] == 15634
    assert m["well_formed_rows"] == 14626  # primary-format well-formed

    from logparser_spark.plans.checkpoint import read_routed

    routed = read_routed(spark, f"{work}/out_mf", "all")
    counts = {
        r["matched_format"]: r["count"]
        for r in routed.groupBy("matched_format").count().collect()
    }
    assert counts["default"] == 14626
    assert counts["hexdump"] == 1008  # every hex line matched the 2nd spec
    # the info sink's routing (primary-format filter) is unchanged
    info = read_routed(spark, f"{work}/out_mf", "info")
    assert info.filter(F.col("parsed.Level") == "INFO").count() == 2521
