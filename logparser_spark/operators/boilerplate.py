"""Block-level boilerplate removal — the jusText-family heuristic
(Pomikálek 2011, "Removing Boilerplate and Duplicate Content from Web
Corpora"; same family as Readability/trafilatura): segment a page into
blocks at block-level tag boundaries, score each block on LINK DENSITY
and STOPWORD DENSITY, and keep only content-classified blocks. This is
the extraction step between raw crawl HTML and every text operator in
``textstats.py``/``corpus.py`` — nav bars, footers and button rows
would otherwise dominate n-gram and dedup statistics.

Simplified-jusText rules, pinned exactly (the DuckDB oracle restates
them):

- blocks: split on any block-level open/close tag (``p div h1-h6 li ul
  ol table thead tbody tr td th section article header footer nav
  aside blockquote br``), after removing ``<script>``/``<style>``
  elements wholesale (their content is code, not text);
- block text: inline tags stripped, the five named entities unescaped,
  whitespace collapsed, trimmed;
- ``link_density_ppm`` = (chars of cleaned ``<a>`` inner text) /
  (chars of cleaned block text), ppm floor division;
- ``stopword_density_ppm`` = stopword tokens / tokens (count, not
  distinct — jusText's definition), ppm;
- verdict: ``empty`` (no words) → ``linky`` (link density > 20 %) →
  ``short`` (< 10 words) → ``good`` (stopword density ≥ 30 %) →
  ``low_stop``; only ``good`` blocks survive into the document's main
  content. (Full jusText also re-classifies near-good blocks by
  neighbor context; that second pass is deliberately out of scope —
  the four-way verdict is the load-bearing part.)

Scale shape: blocks are map-only (one regexp split + posexplode + one
projection of per-block expressions, all codegen); the document
reassembly is one groupBy(doc_id) whose per-group state is the kept
blocks of ONE page — bounded by page size, the same unit every stage
shards on. No UDF anywhere.
"""

from __future__ import annotations

JUSTEXT_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "is",
    "it", "that", "this", "with", "as", "for", "was", "are", "be",
    "by",
]

_BLOCK_SPLIT_RX = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th"
    r"|section|article|header|footer|nav|aside|blockquote|br)\b[^>]*>"
)
_ANCHOR_INNER_RX = r"(?is)<a\b[^>]*>(.*?)</a>"


def _unescape5(col):
    from pyspark.sql import functions as F

    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _clean_text(col):
    """fragment → visible text: strip tags, unescape, collapse, trim."""
    from pyspark.sql import functions as F

    return F.trim(F.regexp_replace(
        _unescape5(F.regexp_replace(col, r"(?s)<[^>]*>", " ")),
        r"\s+", " ",
    ))


def boilerplate_blocks(pages, html_col: str = "html",
                       id_col: str = "doc_id"):
    """Per-block classification table.

    Output: ``(doc_id, seq, text, n_words, link_density_ppm,
    stopword_density_ppm, verdict)`` — ``seq`` the 0-based block
    ordinal (split segments, empties dropped but ordinals kept),
    densities NULL where their denominator is 0."""
    from pyspark.sql import functions as F

    stripped = F.col(html_col)
    for tag in ("script", "style"):
        stripped = F.regexp_replace(
            stripped, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", " "
        )
    blocks = pages.select(
        F.col(id_col),
        F.posexplode(F.split(stripped, _BLOCK_SPLIT_RX))
        .alias("seq", "__b"),
    )
    text = _clean_text(F.col("__b"))
    words = F.filter(F.split(text, " "), lambda t: F.length(t) > 0)
    n_words = F.size(words).cast("long")
    n_chars = F.length(text).cast("long")
    link_chars = F.aggregate(
        F.transform(
            F.regexp_extract_all(
                F.col("__b"), F.lit(_ANCHOR_INNER_RX), F.lit(1)
            ),
            _clean_text,
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t),
    )
    n_stop = F.size(F.filter(
        words,
        lambda w: F.lower(w).isin(JUSTEXT_STOPWORDS),
    )).cast("long")
    d = blocks.select(
        id_col,
        F.col("seq").cast("long"),
        text.alias("text"),
        n_words.alias("n_words"),
        link_chars.alias("__lc"),
        n_chars.alias("__nc"),
        n_stop.alias("__ns"),
    )
    d = d.select(
        id_col, "seq", "text", "n_words",
        F.when(F.col("__nc") > 0,
               F.expr("(__lc * 1000000) div __nc"))
        .cast("long").alias("link_density_ppm"),
        F.when(F.col("n_words") > 0,
               F.expr("(__ns * 1000000) div n_words"))
        .cast("long").alias("stopword_density_ppm"),
    ).where(F.col("text") != "")
    verdict = (
        F.when(F.col("n_words") == 0, F.lit("empty"))
        .when(F.col("link_density_ppm") > 200_000, F.lit("linky"))
        .when(F.col("n_words") < 10, F.lit("short"))
        .when(F.col("stopword_density_ppm") >= 300_000, F.lit("good"))
        .otherwise(F.lit("low_stop"))
    )
    return d.withColumn("verdict", verdict)


def main_content(pages, html_col: str = "html", id_col: str = "doc_id"):
    """Document main content: the ``good`` blocks joined with
    newlines in block order. Pages with no good block yield no row
    (route them to a reject sink, the malformed-acceptance pattern).

    Output: ``(doc_id, content, n_good_blocks)``."""
    from pyspark.sql import functions as F

    good = boilerplate_blocks(pages, html_col, id_col).where(
        F.col("verdict") == "good"
    )
    return good.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "text"))),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("content"),
        F.count(F.lit(1)).cast("long").alias("n_good_blocks"),
    )
