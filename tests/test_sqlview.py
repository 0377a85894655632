"""spark.sql surface over the registered pipeline views."""

from __future__ import annotations


def test_sql_views_roundtrip(spark):
    from logparser_spark.functions.formats import DEFAULT_FORMAT, compile_format
    from logparser_spark.operators.route import SinkSpec
    from logparser_spark.plans.sqlview import register_views
    from logparser_spark.sources.pages import build_pages_from_documents

    spec = compile_format(DEFAULT_FORMAT)
    pages = build_pages_from_documents(spark, "/root/testdata/sf0.001")
    register_views(
        spark, pages, spec, sinks=[SinkSpec("info", "Level EQ INFO")]
    )

    total = spark.sql("SELECT count(*) AS n FROM lines").collect()[0]["n"]
    assert total == 15634

    hist = {
        r["Level"]: r["n"]
        for r in spark.sql(
            "SELECT parsed.Level AS Level, count(*) AS n FROM parsed_lines "
            "WHERE parsed.well_formed GROUP BY 1"
        ).collect()
    }
    assert hist["INFO"] == 2521 and set(hist) == {"TRACE", "INFO", "EVENT"}

    info = spark.sql(
        "SELECT count(*) AS n FROM sink_info WHERE parsed.well_formed"
    ).collect()[0]["n"]
    assert info == 2521
    # acceptance rule keeps malformed rows in the sink view
    info_all = spark.sql("SELECT count(*) AS n FROM sink_info").collect()[0]["n"]
    assert info_all == 2521 + 1008
