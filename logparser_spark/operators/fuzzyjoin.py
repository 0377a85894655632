"""Fuzzy key matching at scale: all pairs of distinct keys within
Levenshtein distance 1, WITHOUT a cross product — the FastSS /
deletion-neighborhood blocking scheme (Bocek et al. 2007): two strings
are within edit distance 1 iff they share a member of their
1-deletion neighborhoods (the string itself plus every
one-character-deleted variant). So: explode each key into its
neighborhood, equality-join on the variant, verify with the exact
``levenshtein`` — candidates scale with Σ len(key), never |keys|².

The variant generation is a pure Catalyst transform over character
positions; the verify is the built-in edit distance (same DP in any
engine). Used for vocabulary normalization (spelling variants),
near-identical host names, and key reconciliation."""

from __future__ import annotations


def deletion_neighborhood(col):
    """key → array of the key itself + every 1-deletion variant."""
    from pyspark.sql import functions as F

    return F.array_union(
        F.array(col),
        F.when(
            F.length(col) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    col.substr(F.lit(1), i - 1),
                    col.substr(i + 1, F.length(col)),
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def fuzzy_key_pairs(keys_df, key_col: str = "key",
                    max_bucket: int | None = 500):
    """Distinct pairs (key_a < key_b) of keys within Levenshtein
    distance 1. ``keys_df`` should carry distinct keys (dedupe first —
    pair semantics are over the key SET). Buckets larger than
    ``max_bucket`` are dropped before the pair join (the LSH-style
    output-cardinality bound; a variant shared by b keys emits O(b²)
    candidates).

    Output: ``(key_a, key_b, dist)`` with dist ∈ {1} (identical keys
    are not pairs; distance-0 duplicates belong to exact dedup)."""
    from pyspark.sql import functions as F

    base = keys_df.select(F.col(key_col).alias("k")).distinct()
    nbh = base.select(
        "k", F.explode(deletion_neighborhood(F.col("k"))).alias("v")
    ).distinct()
    if max_bucket is not None:
        ok = (
            nbh.groupBy("v").agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("v")
        )
        nbh = nbh.join(ok, "v", "left_semi")
    a = nbh.select(F.col("v"), F.col("k").alias("key_a"))
    b = nbh.select(F.col("v"), F.col("k").alias("key_b"))
    return (
        a.join(b, "v")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
        .withColumn("dist",
                    F.levenshtein("key_a", "key_b").cast("int"))
        .filter(F.col("dist") <= 1)
    )


def blocked_levenshtein_pairs(keys_df, key_col: str = "key",
                              max_dist: int = 2,
                              max_bucket: int | None = 2000):
    """Distinct key pairs within Levenshtein distance ``max_dist`` (≥2 —
    for distance 1 use :func:`fuzzy_key_pairs`, whose deletion-variant
    blocking is exhaustive) via two-signature blocking + exact verify,
    still never |keys|².

    Blocking: candidates must share a (signature, length-band) bucket,
    where the signature is the key's FIRST character or its LAST
    character (each key enters both blocks; a UNION of two block
    passes), and the length band is ``length div (max_dist+1)`` expanded
    to its ±1 neighbors on ONE side of the join — any pair with
    ``|len_a − len_b| ≤ max_dist`` lands in adjacent bands, so band
    expansion makes length blocking exhaustive. First/last-char blocking
    is the standard recall trade: a pair that BOTH starts AND ends with
    an edit (e.g. "cat"/"bath" at distance 2) is missed; single-sided
    edits — the overwhelming mass of spelling variants — always share
    one anchor. The exact ``levenshtein`` verify means no false
    positives, ever.

    Buckets larger than ``max_bucket`` are dropped before the pair join
    (the LSH-style output-cardinality bound). Output: ``(key_a, key_b,
    dist)`` with ``1 ≤ dist ≤ max_dist``, key_a < key_b, distinct.

    Scale shape: block-keyed equality joins only — per-key fan-out is
    bounded by ``max_bucket``², and the verify is a codegen DP over
    candidate rows. One distinct over the pair set at the end.
    """
    from pyspark.sql import functions as F

    d1 = int(max_dist) + 1
    base = keys_df.select(F.col(key_col).alias("k")).distinct() \
        .filter(F.length("k") > 0)
    sig = base.select(
        "k",
        F.explode(F.array_distinct(F.array(
            F.substring("k", 1, 1),
            F.expr("substring(k, length(k), 1)"),
        ))).alias("sig"),
        F.expr(f"length(k) div {d1}").alias("band"),
    )
    if max_bucket is not None:
        ok = (
            sig.groupBy("sig", "band")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("sig", "band")
        )
        sig = sig.join(ok, ["sig", "band"], "left_semi")
    # expand bands on the LEFT side only: pairs in adjacent bands meet
    # exactly once per signature, same-band pairs via delta=0
    a = sig.select(
        F.col("k").alias("key_a"), "sig",
        F.explode(F.array(
            F.col("band") - 1, F.col("band"), F.col("band") + 1
        )).alias("band"),
    )
    b = sig.select(F.col("k").alias("key_b"), "sig", "band")
    return (
        a.join(b, ["sig", "band"])
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(
            F.abs(F.length("key_a") - F.length("key_b")) <= int(max_dist)
        )
        .select("key_a", "key_b")
        .distinct()
        .withColumn("dist", F.levenshtein("key_a", "key_b").cast("int"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= int(max_dist)))
    )
