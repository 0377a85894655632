"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — "Winnowing: Local Algorithms for Document
Fingerprinting", the MOSS algorithm) and the pairwise overlap report
built on them — the classic near-copy detector that, unlike
MinHash/LSH (``dedup.py``), GUARANTEES detection of any shared
substring of length ≥ w + k − 1 (the winnowing coverage theorem),
which is why plagiarism/code-clone pipelines use it even where LSH
already screens for whole-document similarity.

Semantics (pinned so the DuckDB oracle can restate them exactly):

- Normalize MOSS-style: lowercase, strip every non-``[a-z0-9]`` char —
  whitespace/punctuation/case-insensitive matching.
- k-grams: every length-``k`` substring of the normalized text,
  1-based positions.
- Hash: the first 15 hex chars of ``md5(gram)`` (60 bits; hex strings
  compare lexicographically = numerically, so string ``min`` IS hash
  min — no bigint conversion on the hot path).
- Windows: every run of ``w`` consecutive gram hashes. In each window
  select the MINIMUM hash; on ties the RIGHTMOST occurrence (the
  paper's rule — implemented by appending ``10^9 − pos`` zero-padded
  to the hash before the min, so a larger position sorts smaller).
  A document with fewer than ``w`` grams yields one window covering
  all of them (every non-empty normalized doc fingerprints).
- Fingerprint set: DISTINCT selected ``(hash, pos)`` pairs per doc.

Scale shape: one projection + one per-doc window (partitioned by
doc_id, ordered by gram position, frame ``ROWS BETWEEN CURRENT ROW
AND w−1 FOLLOWING``) + one distinct. The window partition is one
DOCUMENT — bounded by the pipeline's max document length (the
``filter_chain`` length gate runs upstream), not by corpus size;
winnowing is inherently sequential per document, so this is the
intrinsic unit of work, the same shape every production fingerprinter
shards on. Positions above 10^9 (a >1 GB single document) would break
the tie-break packing — far past the documented per-doc bound.
"""

from __future__ import annotations

_POS_PACK = 1_000_000_000


def winnow_fingerprints(docs, k: int = 5, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id"):
    """Winnowed fingerprint set per document.

    Output: ``(doc_id, fingerprint, pos)`` — ``fingerprint`` the
    15-hex-char gram hash, ``pos`` the 1-based gram position it was
    selected at, distinct per doc."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    base = (
        docs.select(F.col(id_col), norm.alias("__norm"))
        .withColumn(
            "__g", (F.length("__norm") - (k - 1)).cast("int")
        )
    )
    grams = (
        base.where(F.col("__g") >= 1)
        .select(
            id_col,
            "__g",
            F.explode(F.sequence(F.lit(1), F.col("__g"))).alias("__pos"),
            "__norm",
        )
        .select(
            id_col,
            "__g",
            "__pos",
            F.concat(
                F.substring(
                    F.md5(F.expr(f"substring(__norm, __pos, {int(k)})")),
                    1, 15,
                ),
                F.lpad(
                    (F.lit(_POS_PACK) - F.col("__pos")).cast("string"),
                    10, "0",
                ),
            ).alias("__sel"),
        )
    )
    win = (
        Window.partitionBy(id_col).orderBy("__pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.withColumn("__fp", F.min("__sel").over(win))
        # keep only FULL windows — except the short-doc case, where the
        # single window at pos 1 covers every gram the doc has
        .where(
            F.col("__pos")
            <= F.greatest(F.col("__g") - (w - 1), F.lit(1))
        )
        .select(
            F.col(id_col),
            F.substring("__fp", 1, 15).alias("fingerprint"),
            (F.lit(_POS_PACK)
             - F.substring("__fp", 16, 10).cast("long"))
            .cast("long").alias("pos"),
        )
        .distinct()
    )


def winnow_overlap(fps, id_col: str = "doc_id",
                   fp_col: str = "fingerprint",
                   max_df: int = 50, min_shared: int = 2):
    """Pairwise shared-fingerprint report (the MOSS match table):
    documents sharing ≥ ``min_shared`` distinct fingerprints, after
    dropping fingerprints present in more than ``max_df`` documents
    (the paper's "ignore very common" pass — boilerplate phrases
    would otherwise pair everything with everything).

    Output: ``(doc_a, doc_b, n_shared)``, ``doc_a < doc_b``.

    Scale shape: the document-frequency filter bounds every join
    bucket at ``max_df`` rows per side BEFORE the self-join — the same
    bucket-cap discipline as ``dedup.lsh_pairs``; the join shuffles on
    the fingerprint key, pairs aggregate with map-side combine. Never
    an all-pairs product."""
    from pyspark.sql import functions as F

    dfp = fps.select(id_col, fp_col).distinct()
    keep = (
        dfp.groupBy(fp_col)
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= int(max_df))
        .select(fp_col)
    )
    kept = dfp.join(keep, fp_col)
    a = kept.select(F.col(fp_col), F.col(id_col).alias("doc_a"))
    b = kept.select(F.col(fp_col), F.col(id_col).alias("doc_b"))
    return (
        a.join(b, fp_col)
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= int(min_shared))
    )
