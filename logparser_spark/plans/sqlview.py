"""SQL surface: register the pipeline stages as temp views so users can
query with plain ``spark.sql`` — the interactive query surface a
reference user would reach for after switching engines::

    register_views(spark, pages_df, spec, sinks)
    spark.sql("SELECT parsed.Level, count(*) FROM parsed_lines "
              "WHERE parsed.well_formed GROUP BY 1")
    spark.sql("SELECT * FROM sink_info WHERE parsed.Time > 85400")
"""

from __future__ import annotations

from typing import Optional

from ..functions.formats import FormatSpec
from ..operators.parse import explode_lines, parse_lines
from ..operators.route import SinkSpec, sink_column


def register_views(
    spark,
    pages_df,
    spec: FormatSpec,
    sinks: Optional[list[SinkSpec]] = None,
    keep_cols: Optional[list] = None,
) -> dict:
    """Create temp views: ``pages``, ``lines``, ``parsed_lines``, and one
    ``sink_<name>`` view per sink spec. Returns {view_name: DataFrame}.
    Views are lazy — nothing materializes until queried."""
    views = {}
    pages_df.createOrReplaceTempView("pages")
    views["pages"] = pages_df

    lines = explode_lines(
        pages_df,
        keep_cols=keep_cols
        or [c for c in ("doc_id", "url", "lang") if c in pages_df.columns],
    )
    lines.createOrReplaceTempView("lines")
    views["lines"] = lines

    parsed = parse_lines(lines, spec)
    parsed.createOrReplaceTempView("parsed_lines")
    views["parsed_lines"] = parsed

    for s in sinks or []:
        name = f"sink_{s.name}" if not s.name.startswith("sink_") else s.name
        v = parsed.filter(sink_column(s, spec))
        v.createOrReplaceTempView(name)
        views[name] = v
    return views
