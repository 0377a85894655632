"""Config-driven pipeline job: the reference's ConfigHandler + main()
re-imagined as a spark-submit entrypoint.

A job config (JSON — the ``~/.logram`` profile analog, SURVEY §2.1
S5/S7) declares the input, the format spec, the sink filters, the
enrichment toggles, and the output base. ``run_job`` executes the full
parse → enrich → route → aggregate pipeline with checkpoint/lineage
resume, and ``main`` makes the module directly usable as::

    spark-submit --py-files logparser_spark.zip \\
        -m logparser_spark.plans.job --config job.json

Config example::

    {
      "input": "parquet:/data/pages",
      "format": "{INT:Date} {INT:Time} {STR:Level} :{CHR:,.,1}{STR:Source}: {STR:Mesg}",
      "accept_bad_format": true,
      "sinks": [
        {"name": "errors", "filter": "Level EQ ERROR"},
        {"name": "all", "filter": null}
      ],
      "enrich": true,
      "output": "/data/out",
      "buckets": 64
    }
"""

from __future__ import annotations

import argparse
import json
from dataclasses import dataclass, field

from ..functions.formats import DEFAULT_FORMAT, compile_format
from ..operators.route import SinkSpec


@dataclass
class JobConfig:
    input: str
    output: str
    format: str = DEFAULT_FORMAT
    # name -> format string; tried in insertion order AFTER `format`
    # (the reference's runtime format swap as a declarative cascade)
    extra_formats: dict = field(default_factory=dict)
    accept_bad_format: bool = True
    sinks: list[SinkSpec] = field(default_factory=list)
    enrich: bool = True
    buckets: int = 64
    text_col: str = "text"
    key_col: str = "doc_id"
    # "checkpoint": lineage-bucketed fan-out with idempotent resume (the
    # default; one persisted scan per bucket, right for small sink
    # counts). "single_pass": route.write_routes_single_pass — ONE
    # streamed scan, explode by matching sink, dynamic-partitioned
    # write; the 10^12-row / large-N strategy (no persist of the parse
    # output, no per-sink re-scan; resume = re-run, the write is a
    # single atomic overwrite).
    route_strategy: str = "checkpoint"

    @classmethod
    def from_dict(cls, d: dict) -> "JobConfig":
        from ..operators.filters import resolve_filter_arg

        # each sink filter goes through the reference's argument
        # convention (:fset <path-or-text>), but declarative configs use
        # the EXPLICIT @/path marker only — bare-path probing (an
        # expression that happens to name a readable file silently
        # becoming that file's first line) stays interactive-only, so a
        # job config's semantics can't depend on the filesystem.
        sinks = [
            SinkSpec(
                s["name"],
                resolve_filter_arg(s["filter"], probe_paths=False)
                if s.get("filter") is not None else None,
                s.get("accept_bad_format", d.get("accept_bad_format", True)),
            )
            for s in d.get("sinks", [])
        ] or [SinkSpec("all", None)]
        return cls(
            input=d["input"],
            output=d["output"],
            format=d.get("format", DEFAULT_FORMAT),
            extra_formats=d.get("extra_formats", {}),
            accept_bad_format=d.get("accept_bad_format", True),
            sinks=sinks,
            enrich=d.get("enrich", True),
            buckets=d.get("buckets", 64),
            text_col=d.get("text_col", "text"),
            key_col=d.get("key_col", "doc_id"),
            route_strategy=d.get("route_strategy", "checkpoint"),
        )

    @classmethod
    def from_json(cls, path: str) -> "JobConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def run_job(spark, cfg: JobConfig) -> dict:
    """Full pipeline with lineage-checkpointed routing. Returns the
    lineage metrics summary (rows / well-formed across buckets)."""
    from pyspark.sql import functions as F

    from ..operators import aggregate, enrich as enrich_mod
    from ..operators.parse import explode_lines, parse_lines
    from ..plans import checkpoint as C
    from ..plans.skew import skew_conf
    from ..sources.sinks import SinkTarget, read_source, write_sink

    skew_conf(spark)
    spec = compile_format(cfg.format)

    pages = read_source(spark, SinkTarget.parse(cfg.input))
    keep = [c for c in (cfg.key_col, "url", "lang") if c in pages.columns]
    lines = explode_lines(pages, text_col=cfg.text_col, keep_cols=keep)
    if cfg.extra_formats:
        # multi-format cascade: primary format first, then the extras in
        # declaration order; the primary's struct becomes `parsed` so
        # sink filters (bound to the primary format's fields) apply
        # unchanged — lines matched only by a secondary format are
        # malformed under the primary, exactly the reference's semantics
        # before a runtime format swap.
        from ..operators.parse import parse_lines_multi

        specs = [spec] + [
            compile_format(f, name) for name, f in cfg.extra_formats.items()
        ]
        parsed = parse_lines_multi(lines, specs).withColumnRenamed(
            f"parsed_{spec.name}", "parsed"
        )
    else:
        parsed = parse_lines(lines, spec)
    if cfg.enrich and "url" in parsed.columns and "lang" in parsed.columns:
        parsed = enrich_mod.enrich_all(parsed, spark)

    if cfg.route_strategy == "single_pass":
        from ..operators.route import (
            read_routed_sink,
            write_routes_single_pass,
        )

        base = f"{cfg.output}/routed"
        write_routes_single_pass(parsed, cfg.sinks, spec, base)
        for s in cfg.sinks:
            routed = read_routed_sink(spark, base, s.name)
            hist = aggregate.field_histogram(routed, "Level")
            write_sink(
                hist.withColumn("sink", F.lit(s.name)),
                SinkTarget.parse(f"{cfg.output}/_agg/{s.name}_level_hist"),
                mode="overwrite",
            )
        counts = {
            r["sink"]: r["n"]
            for r in spark.read.parquet(base)
            .groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        return {"strategy": "single_pass",
                "sink_rows": {s.name: int(counts.get(s.name, 0))
                              for s in cfg.sinks}}
    if cfg.route_strategy != "checkpoint":
        raise ValueError(
            f"unknown route_strategy {cfg.route_strategy!r} "
            "(expected 'checkpoint' or 'single_pass')"
        )

    C.route_checkpointed(
        parsed, cfg.sinks, spec, cfg.output,
        buckets=cfg.buckets, key_col=cfg.key_col,
    )

    # per-sink aggregate tables (counts by matched format + level hist)
    for s in cfg.sinks:
        routed = C.read_routed(spark, cfg.output, s.name)
        hist = aggregate.field_histogram(routed, "Level")
        write_sink(
            hist.withColumn("sink", F.lit(s.name)),
            SinkTarget.parse(f"{cfg.output}/_agg/{s.name}_level_hist"),
            mode="overwrite",
        )
    return C.lineage_metrics(cfg.output)


def main(argv=None):
    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser(description="logparser_spark pipeline job")
    ap.add_argument("--config", required=True)
    args = ap.parse_args(argv)

    cfg = JobConfig.from_json(args.config)
    spark = SparkSession.builder.appName("logparser-spark-job").getOrCreate()
    metrics = run_job(spark, cfg)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
