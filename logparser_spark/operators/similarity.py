"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, and a sign-bucket
(IVF/LSH-flavored) variant as the scale path: embeddings are bucketed by
the sign pattern of their leading dimensions, so a query only scans its
own bucket (plus Hamming-1 neighbors for recall) instead of the full
table — the standard coarse-quantization trade at 10^9+ vectors.

All arithmetic is float→double, evaluated with Spark's sequential
``aggregate`` over the array, so DuckDB (``list_dot_product`` over the
same values, same order) reproduces results bit-for-bit; comparisons
round to 6 decimals to be safe across rounding of the final division.
No UDFs — ``zip_with``/``aggregate`` stay in codegen.
"""

from __future__ import annotations

SIGN_BITS = 8  # leading dims used for the IVF-ish bucket id


def _dot(a, b):
    from pyspark.sql import functions as F

    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    from pyspark.sql import functions as F

    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(df, query_vec, k: int = 10, id_col: str = "vec_id",
                vec_col: str = "embedding"):
    """Exact brute-force cosine top-k against a literal query vector.
    One scan, one ORDER BY LIMIT k (Spark's TakeOrdered — no full sort).
    ``query_vec`` is a Python list[float]."""
    from pyspark.sql import functions as F

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    out = df.select(
        F.col(id_col), F.round(sim, 6).alias("cos_sim")
    )
    return out.orderBy(F.desc("cos_sim"), id_col).limit(k)


def hard_negatives(df, queries: list, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label"):
    """Hard-negative mining for contrastive training: for each query
    (id, vector, label), the top-``k`` most-cosine-similar corpus
    vectors whose label DIFFERS — the negatives that sit closest to
    the decision boundary and teach an embedding model the most.

    ``queries`` is a driver-side list of ``(query_id, vector, label)``
    triples rendered as LITERAL structs (the same zero-shuffle trick as
    ``embedding_kmeans``'s centroid assign): the fan-out is a map-only
    explode of a Q-element literal array — no join, no
    BroadcastNestedLoop, no cartesian — followed by ONE shuffle for
    the per-query rank window over fixed-width (query_id, vec_id,
    cos_sim) rows. At 10^9+ vectors put :func:`sign_bucket` in front
    so each query ranks its candidate buckets, not the corpus; Q is
    assumed small (it's a training-batch slice, not a table).

    Output: ``(query_id, rank, vec_id, cos_sim)``; self-matches are
    excluded by the label rule (same label ⇒ never a negative).
    Rounding/tie contract identical to :func:`cosine_topk`."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    qarr = F.array(*[
        F.struct(
            F.lit(int(qid)).cast("long").alias("qid"),
            F.array(*[F.lit(float(x)) for x in vec]).alias("qv"),
            F.lit(ql).alias("ql"),
        )
        for qid, vec, ql in queries
    ])
    ex = df.select(
        id_col, vec_col, label_col, F.explode(qarr).alias("q")
    ).where(F.col(label_col) != F.col("q.ql"))
    sim = _dot(F.col(vec_col), F.col("q.qv")) / (
        _norm(F.col(vec_col)) * _norm(F.col("q.qv"))
    )
    scored = ex.select(
        F.col("q.qid").alias("query_id"),
        F.col(id_col),
        F.round(sim, 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cos_sim")
    )


def sign_bucket(vec_col, bits: int = SIGN_BITS):
    """Bucket id from the sign bits of the first ``bits`` dims: the
    coarse quantizer. Pure Catalyst."""
    from pyspark.sql import functions as F

    val = F.lit(0)
    for j in range(bits):
        val = val + F.when(
            F.element_at(vec_col, j + 1) >= 0, F.lit(1 << j)
        ).otherwise(0)
    return val


def query_buckets(query_vec, bits: int = SIGN_BITS,
                  hamming: int = 1) -> list[int]:
    """The query's sign-bucket plus its Hamming-``hamming`` neighbors —
    the candidate set an ANN scan must touch (``bits + 1`` buckets for
    hamming=1)."""
    qb = 0
    for j in range(bits):
        if float(query_vec[j]) >= 0:
            qb |= 1 << j
    out = [qb]
    if hamming >= 1:
        out += [qb ^ (1 << j) for j in range(bits)]
    return out


def cosine_topk_ann(df, query_vec, k: int = 10, id_col: str = "vec_id",
                    vec_col: str = "embedding", bits: int = SIGN_BITS,
                    hamming: int = 1):
    """ANN top-k: scan only vectors whose sign-bucket is within
    ``hamming`` bit-flips of the query's bucket (bucket + its ``bits``
    neighbors for hamming=1). Computes the bucket on the fly — a filter
    scan; use ``write_embeddings_bucketed`` + ``cosine_topk_ann_pruned``
    to turn it into real partition pruning at scale."""
    from pyspark.sql import functions as F

    buckets = query_buckets(query_vec, bits, hamming)
    cand = df.filter(sign_bucket(F.col(vec_col), bits).isin(buckets))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def write_embeddings_bucketed(df, path: str, vec_col: str = "embedding",
                              bits: int = SIGN_BITS,
                              mode: str = "overwrite") -> str:
    """Materialize the embedding table PARTITIONED BY its sign-bucket
    (one directory per coarse cell) so ANN reads list only the
    ``hamming+1`` candidate directories — partition pruning the file
    listing itself, which is what makes the ANN claim executable at
    10^9+ vectors instead of a full-table filter scan."""
    from pyspark.sql import functions as F

    out = df.withColumn("sign_bucket", sign_bucket(F.col(vec_col), bits))
    out.write.mode(mode).partitionBy("sign_bucket").parquet(path)
    return path


def cosine_topk_ann_pruned(spark, path: str, query_vec, k: int = 10,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           bits: int = SIGN_BITS, hamming: int = 1):
    """ANN top-k over a ``write_embeddings_bucketed`` table: the filter
    is on the PARTITION column, so Spark prunes non-candidate bucket
    directories at planning time (PartitionFilters in the scan node) —
    only ``len(query_buckets)`` of the ``2^bits`` directories are read."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    buckets = query_buckets(query_vec, bits, hamming)
    cand = df.filter(F.col("sign_bucket").isin(buckets))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(df, tau: float = 0.9, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             bits: int = SIGN_BITS, hamming: int = 1):
    """Embedding-cosine near-dup pairs (id_a < id_b, cos_sim >= tau)
    WITHOUT the all-pairs cross join: candidates come from the
    sign-bucket join — side B is exploded to its own bucket plus its
    ``hamming`` bit-flip probes, so the join key equality covers exactly
    the pairs within Hamming-``hamming`` of each other. At 10^9+ vectors
    only same/neighbor-bucket rows shuffle together (the LSH argument;
    recall follows the SimHash bound: cos-similar vectors agree on sign
    bits with probability 1 - theta/pi per bit). Exact cosine (codegen
    ``zip_with``/``aggregate``, float→double, sequential — engine-
    portable bit-for-bit) filters the candidates to >= tau."""
    from pyspark.sql import functions as F

    bkt = sign_bucket(F.col(vec_col), bits)
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        bkt.alias("__bk"),
    )
    probes = F.array(
        bkt, *[
            bkt.bitwiseXOR(F.lit(1 << j)) for j in range(bits)
        ][: bits if hamming >= 1 else 0]
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        F.explode(probes).alias("__bk"),
    )
    cand = a.join(b, "__bk").filter(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("__va"), F.col("__vb")) / (
        _norm(F.col("__va")) * _norm(F.col("__vb"))
    )
    # half-up rounding via floor(x*1e6 + 0.5), NOT F.round: Spark ROUND
    # is half-up but DuckDB ROUND is banker's half-even, so a decimal
    # tie in cos_sim would break oracle bit-parity. floor(x*1e6+0.5) is
    # the identical IEEE-double expression in both engines (the dot
    # product itself is sequential double arithmetic on both sides), so
    # equal inputs round identically regardless of tie behavior.
    rounded = F.floor(sim * F.lit(1_000_000.0) + F.lit(0.5)) / F.lit(
        1_000_000.0
    )
    return (
        cand.select("id_a", "id_b", rounded.alias("cos_sim"))
        .filter(F.col("cos_sim") >= tau)
        .distinct()
    )
