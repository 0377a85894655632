"""Deterministic Common-Crawl-style pages synthesis.

BASELINE.json input_hint mandates the input shape
``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``. No external data: pages are synthesized with pure Spark
expressions (JVM-side, no Python row generation — scales to any row count
on a cluster) from deterministic integer arithmetic on a key, so an
independent engine (DuckDB oracle SQL) can reproduce the exact same
logical rows.

Derivations for key ``i`` (all integer arithmetic, replicated in
``__spark_entry__.oracle_sql``):

- ``n_lines = (i % 62) + 1``; line ``j`` is golden-corpus line
  ``((i * 7) + j) % 62``; ``text`` joins them with ``\\n``;
- host: Zipf-ish skew — 70% of pages land on 3 hot hosts
  (``i % 10 < 7 -> 'hot' + (i % 3)``), the rest spread over 97
  (``'h' + (i % 97)``) — exercises salting/AQE skew handling;
- ``tld``: cyclic over 6 TLDs; ``url = https://{host}.{tld}/doc-{i}``;
- ``warc_ts = 2026-01-01T00:00:00Z + i seconds``;
- ``lang``: from the documents table when keyed on it, else cyclic.
"""

from __future__ import annotations

from ..sources.corpus import GOLDEN_LINES

TLDS = ["com", "org", "net", "de", "fr", "io"]
LANG_CYCLE = ["en", "de", "fr", "es", "zz"]

HTML_PREFIX = "<html><body><pre>"
HTML_SUFFIX = "</pre></body></html>"


def _page_cols(F, key_col, lang_col):
    corpus = F.array(*[F.lit(l) for l in GOLDEN_LINES])
    n_lines = (key_col % 62) + 1
    start = (key_col * 7) % 62
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda j: F.element_at(corpus, (((start + j) % 62) + 1).cast("int")),
        ),
        "\n",
    )
    host = F.when(
        key_col % 10 < 7, F.concat(F.lit("hot"), (key_col % 3).cast("string"))
    ).otherwise(F.concat(F.lit("h"), (key_col % 97).cast("string")))
    tld = F.element_at(F.array(*[F.lit(t) for t in TLDS]), ((key_col % 6) + 1).cast("int"))
    url = F.concat(
        F.lit("https://"), host, F.lit("."), tld, F.lit("/doc-"),
        key_col.cast("string"),
    )
    warc_ts = F.expr(
        "timestamp'2026-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, __key)"
    )
    html = F.encode(
        F.concat(F.lit(HTML_PREFIX), text, F.lit(HTML_SUFFIX)), "UTF-8"
    )
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": text,
        "lang": lang_col,
        "doc_id": key_col,
    }


def build_pages_from_documents(spark, sf_dir: str, with_doc_id: bool = True):
    """Parity generator: keyed on ``documents.doc_id`` (+ its ``lang``) so
    DuckDB oracle SQL over the same parquet reproduces the rows exactly.
    ``doc_id`` is kept as the stable join/compare key (the per-row identity
    is (doc_id, line_no); SURVEY.md §7.4 risk 2)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    docs = docs.withColumn("__key", F.col("doc_id").cast("long"))
    cols = _page_cols(F, F.col("__key"), F.col("lang"))
    names = ["url", "warc_ts", "html", "text", "lang"] + (
        ["doc_id"] if with_doc_id else []
    )
    return docs.select(*[cols[n].alias(n) for n in names])


def synth_pages(spark, n_pages: int, partitions: int | None = None):
    """Scale generator for bench/e2e: ``spark.range`` keyed, same
    derivations, cyclic lang. Pure JVM codegen — generates millions of
    pages per second per core, so the bench measures the pipeline, not the
    generator."""
    from pyspark.sql import functions as F

    rng = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    rng = rng.withColumn("__key", F.col("id"))
    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANG_CYCLE]), ((F.col("__key") % 5) + 1).cast("int")
    )
    cols = _page_cols(F, F.col("__key"), lang)
    return rng.select(
        *[cols[n].alias(n) for n in ["url", "warc_ts", "html", "text", "lang", "doc_id"]]
    )
