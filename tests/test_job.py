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


def test_sink_target_parse_and_iceberg_gate(spark):
    from logparser_spark.sources.sinks import SinkTarget, write_sink

    assert SinkTarget.parse("/tmp/x").kind == "parquet"
    assert SinkTarget.parse("parquet:/tmp/x").location == "/tmp/x"
    t = SinkTarget.parse("iceberg:cat.db.tbl")
    assert t.kind == "iceberg" and t.location == "cat.db.tbl"

    df = spark.range(1)
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        write_sink(df, t)
