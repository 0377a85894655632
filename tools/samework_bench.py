"""Identical-workload microbenchmark: the Spark side of tools/refbench.

Measures EXACTLY the reference's per-line scan work (parse + `Level EQ
INFO` filter + count — filtered_file_reader.cpp:236-270) over in-RAM
lines, so the number is directly comparable with `tools/refbench/
bench_ref` (the reference TUs, single thread, same corpus).

Usage::

    python tools/samework_bench.py [--sweep]   # one JSON line

--sweep additionally times the parse stage at several Arrow batch sizes
(spark.sql.execution.arrow.maxRecordsPerBatch is a runtime conf, so the
sweep shares one JVM; each point is best-of-3 fresh plans).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_LINES = int(os.environ.get("SAMEWORK_LINES", "12_000_000").replace("_", ""))
SWEEP = (32768, 65536, 131072, 262144)


def main():
    from pyspark.sql import functions as F

    from bench import make_spark
    from logparser_spark.functions.formats import DEFAULT_FORMAT, compile_format
    from logparser_spark.operators.parse import parse_lines_arrow
    from logparser_spark.sources.corpus import GOLDEN_LINES

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spec = compile_format(DEFAULT_FORMAT)

    # in-RAM lines, same corpus the refbench loops over
    n_rep = N_LINES // len(GOLDEN_LINES)
    corpus = spark.createDataFrame(
        [(l,) for l in GOLDEN_LINES], "raw_line STRING"
    )
    lines = (
        spark.range(n_rep)
        .repartition(CPUS * 4)
        .crossJoin(F.broadcast(corpus))
        .select("raw_line")
        .persist()
    )
    total = lines.count()  # materialize the cache

    def one_pass():
        parsed = parse_lines_arrow(
            lines, spec, drop_cols=["raw_line"]
        )
        return parsed.filter(F.col("parsed.Level") == "INFO").count()

    one_pass()  # warm python workers

    def best_of(k=5):
        best = None
        for _ in range(k):
            t0 = time.time()
            n_info = one_pass()
            dt = time.time() - t0
            if best is None or dt < best[0]:
                best = (dt, n_info)
        return best

    dt, n_info = best_of(5)
    result = {
        "workload": "parse + Level EQ INFO filter + count, in-RAM lines",
        "cpus": CPUS,
        "lines": total,
        "sec": round(dt, 3),
        "rows_per_sec": int(total / dt),
        "n_info": n_info,
    }

    if "--sweep" in sys.argv:
        sweep = {}
        for b in SWEEP:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", str(b)
            )
            sdt, _ = best_of(3)
            sweep[str(b)] = {
                "sec": round(sdt, 3),
                "rows_per_sec": int(total / sdt),
            }
        result["batch_sweep"] = sweep

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
