"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means-cluster the embeddings, find
within-cluster pairs whose cosine similarity reaches ``tau``, connect
them transitively into duplicate groups, and KEEP exactly one document
per group — the member FARTHEST from its cluster centroid (the paper's
keep-low-centroid-similarity rule: the most marginal example carries
the most information), ties to the smaller id.

Pinned semantics (a DuckDB oracle replays every stage):

- clustering: :func:`kmeans.kmeans_fit` — the deterministic integer
  contract (floor(x·1e6+0.5) quantization, exact int64 squared-L2,
  trunc-div means, smaller-cid ties, k-smallest-id init,
  empty-cluster carryover);
- pair similarity: exact cosine on the RAW vectors in sequential
  double arithmetic (the ``similarity.embedding_near_dup_pairs``
  cross-engine contract), half-up-floored to integer ppm
  (``floor(sim·1e6 + 0.5)``); a pair duplicates when
  ``cos_ppm >= tau_ppm``. Pairs form ONLY within a cluster — the
  paper's approximation; cross-cluster near-dups are the recall/cost
  dial that ``k`` controls;
- groups: transitive closure via min-label propagation
  (``dedup.near_dup_clusters``); ``component_id`` = the component's
  minimum member id, so singletons label themselves;
- keep: maximum integer squared-L2 distance to the assigned centroid,
  ties → smaller id.

Scale shape: assignment is map-only (driver-literal centroids, the
``kmeans`` budget class); the candidate stage is ONE equality
self-join on the cluster id — cost Σ|cluster|², the paper's own cost
model, with ``k`` the knob (pick k ≈ N / expected-cluster-size; the
paper runs k = 50 000 on LAION-scale corpora, keeping clusters in the
10³–10⁴ range). The component loop shuffles (id, id) longs only; the
champion fold is one aggregate plus one key-partitioned join back —
no per-component window over data rows, no driver-side collect beyond
the k·dim centroid table.
"""

from __future__ import annotations

COS_PPM = 1_000_000


def semdedup(df, k: int = 4, iters: int = 3, tau_ppm: int = 900_000,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_iter: int = 20):
    """Run SemDeDup. Output: ``(id_col, cluster, dist, component_id,
    keep)`` — one row per input vector; ``keep`` marks the single
    retained representative of each duplicate group (every singleton
    keeps itself)."""
    from pyspark.sql import functions as F

    from .dedup import near_dup_clusters
    from .kmeans import QUANT, _assign, kmeans_fit
    from .similarity import _dot, _norm

    centroids = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col,
                           id_col=id_col)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(QUANT)) + F.lit(0.5)
            ).cast("long"),
        ).alias("q"),
    )
    asg = _assign(base, centroids).select(
        "__id", "__v", "cluster", "dist"
    )

    a = asg.select(
        "cluster", F.col("__id").alias("id_a"), F.col("__v").alias("__va")
    )
    b = asg.select(
        "cluster", F.col("__id").alias("id_b"), F.col("__v").alias("__vb")
    )
    sim = _dot(F.col("__va"), F.col("__vb")) / (
        _norm(F.col("__va")) * _norm(F.col("__vb"))
    )
    # half-up floor to ppm — floor(x*1e6+0.5) is the identical IEEE
    # expression in Spark and DuckDB (see embedding_near_dup_pairs)
    cos_ppm = F.floor(sim * F.lit(float(COS_PPM)) + F.lit(0.5)) \
        .cast("long")
    pairs = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos_ppm.alias("cos_ppm"))
        .where(F.col("cos_ppm") >= int(tau_ppm))
        .select("id_a", "id_b")
    )

    comp = near_dup_clusters(
        asg.select(F.col("__id")), pairs, id_col="__id",
        max_iter=max_iter,
    ).withColumnRenamed("cluster_id", "component_id")

    w = asg.join(comp, "__id")
    champ = w.groupBy("component_id").agg(
        F.min(F.struct(
            (-F.col("dist")).alias("nd"), F.col("__id").alias("cid")
        )).alias("__c")
    ).select(
        "component_id", F.col("__c.cid").alias("__keep_id")
    )
    return (
        w.join(champ, "component_id")
        .select(
            F.col("__id").alias(id_col),
            "cluster",
            "dist",
            "component_id",
            (F.col("__id") == F.col("__keep_id")).alias("keep"),
        )
    )
