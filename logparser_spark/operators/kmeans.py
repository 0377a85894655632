"""Deterministic integer k-means over embedding vectors (Lloyd's
algorithm) — the clustering primitive behind semantic dedup, IVF
index construction and domain-mix analysis over an
``array<float>`` embedding column.

Why INTEGER: floating-point means drift across engines (IEEE
reduction order), so a float k-means can never be hash-compared
against an oracle. This implementation quantizes each coordinate to
round(x·10⁶) ONCE (the same integer-space half-up contract as
``similarity.embedding_near_dup_pairs``) and then runs entirely in
int64: squared-L2 distances are exact (|q| ≤ ~10⁶ ⇒ per-dim square
≤ ~4·10¹², ×dims ≪ 2⁶³), centroid updates are element-wise
``sum div count`` truncated toward zero (the rule Spark ``div`` and
DuckDB ``//`` share), ties in the argmin break to the smaller
centroid id, and an emptied cluster keeps its previous centroid —
every rule restatable in SQL, so a DuckDB oracle can replay the
whole training bit-for-bit.

Determinism of init: centroids start from the k smallest ``id_col``
rows (no RNG — k-means++ would need a seeded sampler; the fixed init
is the documented contract, callers pass pre-shuffled ids for a
random-like start).

Scale shape per iteration: assignment is ZERO-shuffle — the k
centroids are driver-side literals folded into codegen (k·dim int64s,
the same driver-data budget class as ``bpe_train``'s per-round argmax
row), so the argmin is a map-only expression, never a cross join; the
update is ONE (cluster, dim) exchange of k·dim partial sums
(map-side combined). Driver round-trips per iteration: one
k·dim-cell collect. At 10⁹ vectors × 64 dims × k=1024 this is the
textbook Spark k-means shape.
"""

from __future__ import annotations

from typing import List

QUANT = 1_000_000


def quantize(df, vec_col: str = "embedding", id_col: str = "vec_id",
             out_col: str = "q"):
    """embedding → int64 coordinate array via ``floor(x·10⁶ + 0.5)``
    — NOT ``round``: Spark ROUND is half-up but DuckDB ROUND is
    banker's half-even on doubles; the floor form is the identical
    IEEE expression in both engines (the established cross-engine
    contract, see ``similarity.embedding_near_dup_pairs``)."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(QUANT)) + F.lit(0.5)
            ).cast("long"),
        ).alias(out_col),
    )


def _dist_expr(q_col, centroid: List[int]):
    from pyspark.sql import functions as F

    c = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(q_col, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_fit_assign(df, k: int = 4, iters: int = 3,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id"):
    """Run ``iters`` Lloyd iterations from the deterministic init and
    return the FINAL assignment: ``(id_col, cluster, dist)`` with
    ``dist`` the exact integer squared-L2 distance to the final
    centroid. (The final centroids are a k·dim literal — callers
    needing them use :func:`kmeans_centroids`.)"""
    from pyspark.sql import functions as F

    qdf = quantize(df, vec_col, id_col).persist()
    try:
        init = (
            qdf.orderBy(id_col).limit(k)
            .select("q").collect()
        )
        centroids: List[List[int]] = [list(r["q"]) for r in init]
        if len(centroids) < k:
            raise ValueError(f"need >= {k} rows to init {k} centroids")
        dim = len(centroids[0])

        for _ in range(iters):
            assigned = _assign(qdf, centroids)
            sums = (
                assigned.select(
                    "cluster",
                    F.posexplode("q").alias("dim", "v"),
                )
                .groupBy("cluster", "dim")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            new = [list(c) for c in centroids]  # empty keeps previous
            acc: dict = {}
            for r in sums:
                acc.setdefault(r["cluster"], [[0] * dim, 0])
                acc[r["cluster"]][0][r["dim"]] = r["s"]
                acc[r["cluster"]][1] = r["n"]
            for cid, (svec, n) in acc.items():
                # mean = sum/count TRUNCATED TOWARD ZERO — the rule
                # Spark `div` and DuckDB `//` share (python's // floors
                # negatives, so it is NOT used here; sums go negative)
                new[cid] = [
                    (abs(s) // n) * (1 if s >= 0 else -1) for s in svec
                ]
            centroids = new

        return _assign(qdf, centroids).select(id_col, "cluster", "dist")
    finally:
        qdf.unpersist()


def _assign(qdf, centroids):
    """Map-only argmin over driver-literal centroids: min(struct(dist,
    cid)) — ties break to the smaller centroid id by struct order."""
    from pyspark.sql import functions as F

    pairs = F.array(*[
        F.struct(
            _dist_expr(F.col("q"), c).alias("dist"),
            F.lit(j).alias("cid"),
        )
        for j, c in enumerate(centroids)
    ])
    best = F.array_min(pairs)
    return qdf.select(
        "*",
        best.getField("cid").alias("cluster"),
        best.getField("dist").alias("dist"),
    )
