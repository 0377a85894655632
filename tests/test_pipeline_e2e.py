"""End-to-end: pages synthesis -> explode -> parse -> enrich -> route ->
aggregate, verified against a pure-Python oracle computing the same
pipeline from the same parquet inputs (SURVEY.md §7.2 step 2: the walking
skeleton, extended through steps 4-5)."""

import collections

import duckdb
import pytest

from logparser_spark.functions.formats import DEFAULT_FORMAT, compile_format
from logparser_spark.functions.oracle import (
    OracleLine,
    accepts,
    parse_line,
)
from logparser_spark.operators.aggregate import (
    bucket_tally,
    field_histogram,
    parse_metrics,
    sink_count_frame,
)
from logparser_spark.operators.enrich import STATUS_DIM, enrich_all
from logparser_spark.operators.parse import explode_lines, parse_lines
from logparser_spark.operators.route import fixture_sinks, route, route_mask
from logparser_spark.sources.corpus import GOLDEN_LINES
from logparser_spark.sources.pages import build_pages_from_documents

SF_DIR = "/root/testdata/sf0.001"
SPEC = compile_format(DEFAULT_FORMAT)


# ── pure-Python oracle of the whole pipeline ─────────────────────────


def oracle_docs():
    return duckdb.sql(
        f"SELECT doc_id, lang FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def oracle_lines():
    """[(doc_id, lang, line_no, raw, values, well_formed)] — parse results
    memoized per corpus id (there are only 62 distinct lines)."""
    parsed = [parse_line(l, SPEC) for l in GOLDEN_LINES]
    out = []
    for doc_id, lang in oracle_docs():
        n_lines = (doc_id % 62) + 1
        for j in range(n_lines):
            cid = (doc_id * 7 + j) % 62
            vals, wf = parsed[cid]
            out.append((doc_id, lang, j, GOLDEN_LINES[cid], vals, wf))
    return out


ORACLE_LINES = oracle_lines()
COLS = SPEC.column_names()


def oracle_routed(sink):
    ast = sink.ast(SPEC)
    kept = []
    for doc_id, lang, j, raw, vals, wf in ORACLE_LINES:
        ol = OracleLine(raw_line=raw, line_num=j, values=vals, well_formed=wf)
        if accepts(ast, ol, SPEC, sink.accept_bad_format):
            kept.append((doc_id, j))
    return set(kept)


@pytest.fixture(scope="module")
def parsed_df(spark):
    pages = build_pages_from_documents(spark, SF_DIR)
    lines = explode_lines(pages, keep_cols=["doc_id", "url", "lang"])
    return parse_lines(lines, SPEC)


class TestPagesSynthesis:
    def test_shape_and_determinism(self, spark):
        pages = build_pages_from_documents(spark, SF_DIR)
        assert [f.name for f in pages.schema.fields] == [
            "url", "warc_ts", "html", "text", "lang", "doc_id"
        ]
        types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
        assert types["html"] == "binary" and types["warc_ts"] == "timestamp"
        row = pages.filter("doc_id = 5").collect()[0]
        # doc 5: 6 lines starting at corpus id 35
        want_text = "\n".join(GOLDEN_LINES[(35 + j) % 62] for j in range(6))
        assert row["text"] == want_text
        assert row["url"] == "https://hot2.io/doc-5"
        assert bytes(row["html"]).decode().startswith("<html><body><pre>0322")
        assert str(row["warc_ts"]).startswith("2026-01-01 00:00:05")

    def test_line_count_matches_oracle(self, parsed_df):
        assert parsed_df.count() == len(ORACLE_LINES)


class TestParsePipeline:
    def test_per_line_equality_with_oracle(self, parsed_df):
        got = {
            (r["doc_id"], r["line_no"]): r
            for r in parsed_df.select("doc_id", "line_no", "parsed").collect()
        }
        assert len(got) == len(ORACLE_LINES)
        for doc_id, lang, j, raw, vals, wf in ORACLE_LINES:
            g = got[(doc_id, j)]["parsed"]
            assert g["well_formed"] == wf, (doc_id, j, raw)
            if wf:
                for k, c in enumerate(COLS):
                    assert g[c] == vals[k], (doc_id, j, c)

    def test_parse_metrics(self, parsed_df):
        m = parse_metrics(parsed_df).collect()[0]
        want_wf = sum(1 for *_x, wf in ORACLE_LINES if wf)
        assert m["total_lines"] == len(ORACLE_LINES)
        assert m["well_formed_lines"] == want_wf
        assert m["malformed_lines"] == len(ORACLE_LINES) - want_wf


class TestRouting:
    def test_routed_row_sets_exact(self, parsed_df):
        routes, handle = route(parsed_df, fixture_sinks(), SPEC)
        try:
            for sink in fixture_sinks():
                want = oracle_routed(sink)
                got = {
                    (r["doc_id"], r["line_no"])
                    for r in routes[sink.name].select("doc_id", "line_no").collect()
                }
                assert got == want, f"{sink.name}: {len(got)} vs {len(want)}"
        finally:
            handle.unpersist()

    def test_single_pass_counts_match(self, parsed_df, spark):
        cf = {r["sink"]: r["n"] for r in
              sink_count_frame(parsed_df, fixture_sinks(), SPEC, spark).collect()}
        for sink in fixture_sinks():
            assert cf[sink.name] == len(oracle_routed(sink)), sink.name

    def test_route_mask_agrees(self, parsed_df):
        masked = route_mask(parsed_df, fixture_sinks(), SPEC)
        rows = masked.select(
            "doc_id", "line_no",
            *[f"route_{s.name}" for s in fixture_sinks()], "route_bits",
        ).collect()
        for i, sink in enumerate(fixture_sinks()):
            want = oracle_routed(sink)
            got = {(r["doc_id"], r["line_no"]) for r in rows if r[f"route_{sink.name}"]}
            assert got == want, sink.name
            bits = {(r["doc_id"], r["line_no"]) for r in rows
                    if (r["route_bits"] >> i) & 1}
            assert bits == want, f"bitmask {sink.name}"

    def test_single_pass_writer_matches_route(self, parsed_df, spark,
                                              tmp_path):
        """write_routes_single_pass: per-sink row sets identical to
        route()'s for all 7 fixture sinks, from ONE scan of the input —
        no persist, no per-sink re-scan (the large-N shape; SURVEY §4
        custom item 3)."""
        from logparser_spark.operators.route import (
            read_routed_sink,
            routed_sink_ids,
            write_routes_single_pass,
        )

        base = str(tmp_path / "routed")
        write_routes_single_pass(parsed_df, fixture_sinks(), SPEC, base)
        for sink in fixture_sinks():
            got = {
                (r["doc_id"], r["line_no"])
                for r in read_routed_sink(spark, base, sink.name)
                .select("doc_id", "line_no").collect()
            }
            assert got == oracle_routed(sink), sink.name

        # plan shape: the exploded write input scans its source ONCE and
        # parses once — N sinks never multiply the scan or the Python
        # stage (contrast: route() persists + N filtered scans)
        from pyspark.sql import functions as F

        out = parsed_df.withColumn(
            "sink", F.explode(routed_sink_ids(fixture_sinks(), SPEC))
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly ONE source scan. If another test module cached the
        # documents parquet, the source resolves through one
        # InMemoryTableScan (whose printout embeds the relation's own
        # FileScan line) — still a single scan.
        n_scans = plan.count("InMemoryTableScan") or plan.count("FileScan")
        n_py = (plan.count("ArrowEvalPython") + plan.count("MapInArrow")
                + plan.count("MapInPandas"))
        assert n_scans == 1, plan
        assert n_py <= 1, plan

        # per-sink reads prune to the one sink=<name> directory
        files = read_routed_sink(spark, base, "sink_info").select(
            F.input_file_name().alias("f")
        ).distinct().collect()
        assert files and all("sink=sink_info" in r["f"] for r in files)


class TestAggregates:
    def test_level_histogram(self, parsed_df):
        got = {r["Level"]: r["n"] for r in field_histogram(parsed_df, "Level").collect()}
        want = collections.Counter(
            dict(zip(COLS, vals))["Level"]
            for *_a, vals, wf in [(x[0], x[1], x[2], x[3], x[4], x[5]) for x in ORACLE_LINES]
            if wf
        )
        assert got == dict(want)

    def test_bucket_tally(self, parsed_df):
        got = {r["bucket"]: r["n"] for r in bucket_tally(parsed_df).collect()}
        want = collections.Counter(d % 32 for d, *_ in ORACLE_LINES)
        assert got == dict(want)


class TestEnrich:
    def test_enrich_joins_are_broadcast(self, parsed_df, spark):
        enriched = enrich_all(parsed_df, spark)
        plan = enriched._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_status_severity_counts(self, parsed_df, spark):
        from pyspark.sql import functions as F

        enriched = enrich_all(parsed_df, spark)
        got = {
            (r["severity"], r["is_error"]): r["n"]
            for r in enriched.filter("parsed.well_formed")
            .groupBy("severity", "is_error")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        sev = {lvl: (s, e) for lvl, s, e in STATUS_DIM}
        want = collections.Counter()
        for *_a, vals, wf in ORACLE_LINES:
            if wf:
                lvl = dict(zip(COLS, vals))["Level"]
                want[sev.get(lvl, (None, None))] += 1
        assert got == dict(want)

    def test_lang_null_path(self, parsed_df, spark):
        enriched = enrich_all(parsed_df, spark)
        null_langs = {
            r["lang"]
            for r in enriched.filter("lang_name IS NULL").select("lang").distinct().collect()
        }
        # zh is absent from the dim -> null lang_name
        assert "zh" in null_langs
        assert "en" not in null_langs
