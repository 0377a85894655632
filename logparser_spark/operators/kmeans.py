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


def kmeans_fit(df, k: int = 4, iters: int = 3,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> List[List[int]]:
    """Run ``iters`` Lloyd iterations from the deterministic init and
    return the FINAL centroids (k·dim int64 lists) — the IVF coarse
    quantizer :func:`kmeans_ivf_topk` probes."""
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

        return centroids
    finally:
        qdf.unpersist()


def kmeans_fit_assign(df, k: int = 4, iters: int = 3,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id"):
    """:func:`kmeans_fit` + final assignment: ``(id_col, cluster,
    dist)`` with ``dist`` the exact integer squared-L2 distance to the
    final centroid."""
    centroids = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col,
                           id_col=id_col)
    return _assign(
        quantize(df, vec_col, id_col), centroids
    ).select(id_col, "cluster", "dist")


def kmeans_ivf_topk(df, k: int = 4, iters: int = 3, nprobe: int = 2,
                    topk: int = 5, query_mod: int = 100,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """IVF approximate nearest neighbors — the canonical two-level ANN
    (FAISS IVF-Flat shape) over the k-means coarse quantizer: every
    vector lives in its nearest centroid's cell; a query scans only
    its ``nprobe`` nearest cells and ranks candidates by EXACT integer
    squared-L2. Queries here are the rows with
    ``id % query_mod == 0`` (a deterministic query set the oracle can
    restate); the query itself is a candidate (dist 0, rank 1) — the
    standard self-hit, kept so recall accounting is explicit.

    Output: ``(qid, vec_id, dist, rank)``, ``rank`` 1-based by
    ``(dist, vec_id)`` within each query, ≤ ``topk`` rows per query.

    Scale shape: the probe step is MAP-ONLY (centroids are driver
    literals: per-query probe list = array_sort of k (dist, cid)
    structs, sliced to nprobe, exploded); candidates join on the cell
    id — the IVF argument: each query shuffles against ~nprobe/k of
    the corpus, not all of it. The per-query rank window is bounded by
    the probed cells' population (the standard IVF cost model —
    balanced cells by construction of k-means; a skewed corpus wants
    more centroids, which is a parameter, not a shape change)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    centroids = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col,
                           id_col=id_col)
    qdf = quantize(df, vec_col, id_col)
    data = _assign(qdf, centroids).select(
        F.col(id_col).alias("vec_id"), F.col("q").alias("__dq"),
        "cluster",
    )
    probes = F.slice(
        F.array_sort(F.array(*[
            F.struct(
                _dist_expr(F.col("q"), c).alias("dist"),
                F.lit(j).alias("cid"),
            )
            for j, c in enumerate(centroids)
        ])),
        1, nprobe,
    )
    queries = (
        qdf.where(F.col(id_col) % query_mod == 0)
        .select(
            F.col(id_col).alias("qid"), F.col("q").alias("__qq"),
            F.explode(F.transform(probes, lambda s: s["cid"]))
            .alias("cluster"),
        )
    )
    cand = queries.join(data, "cluster").select(
        "qid", "vec_id",
        F.aggregate(
            F.zip_with(F.col("__qq"), F.col("__dq"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist"),
    )
    w = Window.partitionBy("qid").orderBy("dist", "vec_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= topk)
    )


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
