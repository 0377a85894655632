"""Sink/source abstraction: parquet paths locally, Iceberg tables on a
real cluster.

The reference's terminal render (SURVEY §2.1 S6) becomes sink tables;
its config persistence (S7) becomes the job-state/metrics files written
by plans/checkpoint.py. Iceberg support is gated on the runtime actually
having the Iceberg catalog configured (``spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-...`` + catalog conf) — this
sandbox has no Iceberg jars, so targets of kind "iceberg" raise a clear
error here while the parquet path exercises the identical dataflow.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SinkTarget:
    """Where a routed view lands: kind is 'parquet' or 'iceberg'."""

    kind: str
    location: str  # path (parquet) or table identifier (iceberg)

    @classmethod
    def parse(cls, spec: str) -> "SinkTarget":
        """'parquet:/path' | 'iceberg:catalog.db.tbl' | bare path."""
        if ":" in spec and spec.split(":", 1)[0] in ("parquet", "iceberg"):
            kind, loc = spec.split(":", 1)
            return cls(kind, loc)
        return cls("parquet", spec)


def _iceberg_available(spark) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_sink(df, target: SinkTarget, mode: str = "append",
               partition_by: list[str] | None = None) -> None:
    if target.kind == "iceberg":
        if not _iceberg_available(df.sparkSession):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime and "
                "a catalog config, or use a parquet: target"
            )
        w = df.writeTo(target.location)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode if mode != "append" else "append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target.location)


def read_source(spark, target: SinkTarget):
    if target.kind == "iceberg":
        if not _iceberg_available(spark):
            raise RuntimeError("Iceberg runtime not on the classpath")
        return spark.read.format("iceberg").load(target.location)
    return spark.read.parquet(target.location)
