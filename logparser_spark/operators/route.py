"""Fan-out routing: one parsed DataFrame -> N sink predicates -> N outputs.

Generalizes the reference's filter-composition algebra (SURVEY.md §2.3 F13:
one filter = one visible view) to multi-sink routing. Every sink predicate
is wrapped in the malformed-acceptance rule (F10,
``filtered_file_reader.cpp:258-262``).

Two physical strategies (SURVEY.md §4 custom item 3):

- :func:`route` — persist the parsed DF once, then N filtered outputs.
  Right for small N (each sink is a cheap scan of the cached parse
  result; without the persist, Catalyst re-runs the parse UDF per sink —
  verified via .explain, see .claude/skills/verify/SKILL.md).
- :func:`route_mask` — single pass producing one boolean column per sink
  (plus a packed bitmask); right for large N or when sinks feed one
  aggregate pass instead of N writers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

from ..functions.formats import FormatSpec
from .filters import Filter, accept_expr, parse_filter, to_column


@dataclass
class SinkSpec:
    """One route: a name, a filter (DSL string, AST, or None = pass-all
    well-formed), and the accept_bad_format flag."""

    name: str
    filter: Union[str, Filter, None] = None
    accept_bad_format: bool = True

    def ast(self, spec: FormatSpec) -> Optional[Filter]:
        if self.filter is None or isinstance(self.filter, str):
            return parse_filter(self.filter or "", spec)
        return self.filter


# The seven fixture sinks (FIXTURES.md §4) exercising every comparator
# class, boolean op, inversion, line ranges, and the badfmt-only view.
def fixture_sinks() -> list[SinkSpec]:
    from .filters import parse_filter as pf

    return [
        SinkSpec("sink_info", "Level EQ INFO"),
        SinkSpec("sink_late", "Time GREATER_EQ 085409"),
        SinkSpec("sink_rsvp", "Source CT_CI RSVP AND Mesg BW state"),
        SinkSpec(
            "sink_mixed",
            "(Level EQ INFO OR Level EQ EVENT) XOR Time ST 085353",
        ),
        SinkSpec("sink_window", "line_num CT 10,50"),
        SinkSpec("sink_not", _inverted("Level EQ TRACE")),
        # malformed-only view: None filter never passes for well-formed rows
        # is not expressible in the DSL; model it as a raw False filter with
        # accept_bad_format=True -> only malformed rows route.
        SinkSpec("sink_badfmt", "Level EQ INFO AND Level EQ TRACE",
                 accept_bad_format=True),
    ]


def _inverted(dsl: str):
    f = parse_filter(dsl)
    return f.invert()


def sink_column(sink: SinkSpec, spec: FormatSpec, parsed_col: str = "parsed"):
    """The full routing predicate for one sink (filter + acceptance rule),
    coalesced to false so NULL verdicts neither route nor poison masks."""
    from pyspark.sql import functions as F

    ast = sink.ast(spec)
    base = to_column(ast, spec, parsed_col=parsed_col) if ast is not None else None
    wf = F.col(f"{parsed_col}.well_formed")
    if base is None:
        expr = (~wf & F.lit(sink.accept_bad_format)) | wf
    else:
        expr = accept_expr(base, wf, sink.accept_bad_format)
    return F.coalesce(expr, F.lit(False))


def route_mask(parsed_df, sinks: list[SinkSpec], spec: FormatSpec,
               parsed_col: str = "parsed"):
    """Single-pass: adds ``route_<name>`` boolean per sink and a packed
    ``route_bits`` long (bit i = sink i). One projection, one parse-UDF
    evaluation, no data movement."""
    from pyspark.sql import functions as F

    out = parsed_df
    bits = F.lit(0).cast("long")
    for i, s in enumerate(sinks):
        c = sink_column(s, spec, parsed_col)
        out = out.withColumn(f"route_{s.name}", c)
        bits = bits + F.when(F.col(f"route_{s.name}"), F.lit(1 << i)).otherwise(0)
    return out.withColumn("route_bits", bits)


def route(parsed_df, sinks: list[SinkSpec], spec: FormatSpec,
          parsed_col: str = "parsed", persist: bool = True):
    """Classic fan-out: returns {sink_name: filtered DataFrame}.

    Persists the parsed DF (MEMORY_AND_DISK) so the parse UDF runs exactly
    once across all sinks; caller owns unpersist via the returned handle.

    SMALL-N ONLY: persisting the full parse output is not viable at
    10^12 rows. At that scale use :func:`write_routes_single_pass`
    (one streamed pass, no persist) for writers, or
    :func:`route_mask` / ``aggregate.sink_count_frame`` when the sinks
    feed aggregates.
    """
    if persist:
        from pyspark.storagelevel import StorageLevel

        parsed_df = parsed_df.persist(StorageLevel.MEMORY_AND_DISK)
    return {
        s.name: parsed_df.filter(sink_column(s, spec, parsed_col))
        for s in sinks
    }, parsed_df


def write_routes(routes: dict, base_path: str, fmt: str = "parquet",
                 mode: str = "overwrite", partition_by: Optional[list] = None):
    """Write each routed view to ``{base_path}/{name}``. Parquet locally;
    on a real cluster pass fmt='iceberg' table identifiers instead (the
    sink abstraction in sources/sinks.py).

    Scale note: this is the SMALL-N strategy — it scans the persisted
    parse output once per sink, and :func:`route`'s persist of the full
    parse output is not viable at 10^12 rows. For large N (or any time
    the parse output can't be cached) use
    :func:`write_routes_single_pass`, which streams every row
    source→parse→explode→writer exactly once."""
    for name, df in routes.items():
        w = df.write.format(fmt).mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(f"{base_path}/{name}")


def routed_sink_ids(sinks: list[SinkSpec], spec: FormatSpec,
                    parsed_col: str = "parsed"):
    """Array column of the sink names whose predicate accepts the row
    (empty array = row routes nowhere)."""
    from pyspark.sql import functions as F

    return F.array_compact(F.array(*[
        F.when(sink_column(s, spec, parsed_col), F.lit(s.name))
        for s in sinks
    ]))


def write_routes_single_pass(parsed_df, sinks: list[SinkSpec],
                             spec: FormatSpec, base_path: str,
                             fmt: str = "parquet", mode: str = "overwrite",
                             parsed_col: str = "parsed"):
    """Large-N fan-out writer (SURVEY §4 custom item 3's
    route_mask+explode shape): ONE scan of the parse output, every sink
    predicate evaluated in a single projection, each row exploded to its
    matching sink names, one write dynamic-partitioned by ``sink``.

    Layout: ``{base_path}/sink=<name>/part-*`` — per-sink reads are
    single-directory scans via partition pruning
    (:func:`read_routed_sink`).

    Why this exists: :func:`route` + :func:`write_routes` persist the
    full parse output and scan it N times — fine for N=7 at bench scale,
    impossible at 10^12 rows (nothing that size fits a cache tier, and N
    re-scans of cold parquet re-pay the IO N times). Here rows flow
    source→parse→explode→writer exactly once; a row matching k sinks is
    duplicated k times AT THE WRITER ONLY — the same total output bytes
    ``write_routes`` produces, without persisting or re-scanning the
    input. Rows matching no sink are dropped by the explode (no
    pass-through cost)."""
    from pyspark.sql import functions as F

    out = parsed_df.withColumn(
        "sink", F.explode(routed_sink_ids(sinks, spec, parsed_col))
    )
    out.write.format(fmt).mode(mode).partitionBy("sink").save(base_path)
    return base_path


def read_routed_sink(spark, base_path: str, name: str,
                     fmt: str = "parquet"):
    """Read one sink's rows from a :func:`write_routes_single_pass`
    layout; the ``sink = name`` filter prunes to one partition
    directory, so this scans only that sink's files."""
    from pyspark.sql import functions as F

    return (
        spark.read.format(fmt).load(base_path)
        .filter(F.col("sink") == name)
        .drop("sink")
    )
