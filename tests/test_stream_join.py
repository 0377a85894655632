"""Stream-stream interval join (attribution shape): streamed result ==
the equivalent static interval join, and the watermark/horizon bound
the join state by construction."""

from __future__ import annotations

import datetime
import shutil
import tempfile


def _write_sorted_files(spark, d, name, rows, schema, n_files=3):
    """Split rows across n parquet files with increasing mtimes so the
    file source processes them in a fixed order."""
    import glob
    import os

    os.makedirs(f"{d}/{name}", exist_ok=True)
    chunk = max(1, (len(rows) + n_files - 1) // n_files)
    for fi in range(n_files):
        part = rows[fi * chunk:(fi + 1) * chunk]
        if not part:
            continue
        df = spark.createDataFrame(part, schema)
        tmp = f"{d}/tmp_{name}_{fi}"
        df.coalesce(1).write.parquet(tmp)
        src = glob.glob(f"{tmp}/*.parquet")[0]
        dst = f"{d}/{name}/f{fi}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000 + fi, 1_000_000 + fi))


def test_interval_join_stream_equals_batch(spark):
    from logparser_spark.streaming.pipeline import interval_join_streams

    d = tempfile.mkdtemp(prefix="sjoin_")
    try:
        t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)

        def ts(s):
            return t0 + datetime.timedelta(seconds=s)

        # impressions: user u sees an ad at various times
        imps = [(u, ts(s)) for u in (1, 2, 3)
                for s in (0, 30, 100, 300)]
        # clicks: some inside the 60 s horizon, some outside, some for
        # users with no impression
        clicks = (
            [(1, ts(10)), (1, ts(59)), (1, ts(61)),
             (2, ts(95)), (2, ts(161)),
             (3, ts(400)), (4, ts(20))]
        )
        _write_sorted_files(spark, d, "imps", imps,
                            "user_id bigint, l_ts timestamp")
        _write_sorted_files(spark, d, "clicks", clicks,
                            "user_id bigint, r_ts timestamp")

        left = (
            spark.readStream.schema("user_id bigint, l_ts timestamp")
            .option("maxFilesPerTrigger", 1).parquet(f"{d}/imps")
        )
        right = (
            spark.readStream.schema("user_id bigint, r_ts timestamp")
            .option("maxFilesPerTrigger", 1).parquet(f"{d}/clicks")
        )
        out = interval_join_streams(left, right, horizon_secs=60,
                                    watermark_secs=3600)
        q = (
            out.writeStream.format("parquet")
            .option("path", f"{d}/out")
            .option("checkpointLocation", f"{d}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = sorted(
            (r.user_id, r.l_ts, r.r_ts)
            for r in spark.read.parquet(f"{d}/out").collect()
        )
        expected = sorted(
            (u, lt, rt)
            for (u, lt) in imps
            for (u2, rt) in clicks
            if u == u2 and lt <= rt <= lt + datetime.timedelta(seconds=60)
        )
        assert got == expected
        # shape sanity: the 61 s click attributes to NO impression at 0
        # but DOES attribute to the one at 30
        assert (1, ts(0), ts(61)) not in got
        assert (1, ts(30), ts(61)) in got
        # unmatched user 4 never appears (inner join)
        assert not any(u == 4 for u, _, _ in got)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_interval_join_requires_watermarks_for_state_bound(spark):
    """The operator always attaches watermarks — the analyzed plan
    carries event-time watermark nodes on both inputs (the property
    that lets Spark evict state instead of buffering forever)."""
    from logparser_spark.streaming.pipeline import interval_join_streams

    left = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "timestamp AS l_ts"
    )
    right = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "timestamp AS r_ts"
    )
    out = interval_join_streams(left, right)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
