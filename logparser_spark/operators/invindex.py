"""Inverted index over the document corpus — the other classic
web-scale index besides the CDX/SURT capture index: term → posting
list (doc_id, term frequency, sorted positions), built with one
explode + one (term, doc_id) shuffle, served by conjunctive term
search and positional phrase search as pure Catalyst plans.

Scale shape:
- build: explode is map-only; the single shuffle keys on
  (term, doc_id) with map-side partial aggregation — postings, never
  documents, move.
- storage: ``write_index_partitioned`` hash-buckets terms into a
  bounded number of directories (md5-derived, engine-portable and
  re-run-stable — the same trick as ``corpus.sample_stratified``), so
  a query for K terms prunes to ≤K bucket directories instead of
  scanning the index.
- search: filtering the index to the query terms makes the posting
  slice tiny; the doc-grouped AND (count of distinct matched terms =
  query arity) and the phrase position-intersection both run on that
  slice. Positions intersect via ``F.arrays_overlap``-free exact
  counting: ``size(array_intersect(transform(pos_a, p -> p + 1),
  pos_b))`` is the number of places term B directly follows term A —
  array expressions inside codegen, no UDF.

Reference scope note: the reference's substring search (N4 rows in
SURVEY.md §2) scans lines; a 10^12-document corpus answers the same
"find documents containing X" question from this index without
touching the corpus.
"""

from __future__ import annotations


def build_inverted_index(docs, text_col: str = "text",
                         id_col: str = "doc_id"):
    """(term, doc_id, tf, positions) posting rows. Positions index the
    empty-token-filtered word sequence (0-based) and come out sorted;
    tf == size(positions) by construction."""
    from pyspark.sql import functions as F

    words = F.filter(
        F.split(F.col(text_col), " "), lambda w: F.length(w) > 0
    )
    posts = docs.select(
        F.col(id_col),
        F.posexplode(words).alias("pos", "term"),
    )
    return posts.groupBy("term", id_col).agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.array_sort(F.collect_list("pos")).alias("positions"),
    )


def write_index_partitioned(index, path: str, n_buckets: int = 64):
    """Persist postings PARTITIONED BY a deterministic md5-derived
    term bucket: a K-term query reads ≤K directories. md5 (not Spark's
    ``hash``) keeps the bucket assignment engine-portable and stable
    across runs/versions — the same determinism contract as the
    stratified sampler."""
    from pyspark.sql import functions as F

    b = term_bucket(F.col("term"), n_buckets)
    (
        index.withColumn("__b", b)
        .repartition("__b")
        .write.mode("overwrite").partitionBy("__b").parquet(path)
    )


def term_bucket(term_col, n_buckets: int = 64):
    """Deterministic bucket id for a term: first 15 md5 hex digits
    (always < 2^63, no sign issues) mod n_buckets."""
    from pyspark.sql import functions as F

    return (
        F.conv(F.substring(F.md5(term_col), 1, 15), 16, 10)
        .cast("long") % n_buckets
    ).cast("int")


def term_search(index, terms: list, k: int = 10,
                id_col: str = "doc_id"):
    """Conjunctive (AND) term search: documents containing EVERY query
    term, scored by total tf, top-k with deterministic (score DESC,
    doc_id ASC) order. Returns ``(rank, doc_id, score)``.

    The index filter keeps only the query terms' postings — the
    grouped AND runs over that slice, and the final rank window sees
    at most k rows after the ordered limit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # Dedupe the query list first: the AND arity is matched against
    # countDistinct('term'), so a duplicated query term would make
    # the equality unsatisfiable and silently return zero results.
    terms = list(dict.fromkeys(terms))
    n = len(terms)
    hits = (
        index.where(F.col("term").isin(list(terms)))
        .groupBy(id_col)
        .agg(
            F.countDistinct("term").alias("__nt"),
            F.sum("tf").cast("long").alias("score"),
        )
        .where(F.col("__nt") == n)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return hits.select(
        F.row_number().over(w).cast("int").alias("rank"),
        id_col,
        "score",
    )


def phrase_search(index, first: str, second: str,
                  id_col: str = "doc_id"):
    """Positional phrase search for the bigram ``first second``:
    intersect (positions(first) + 1) with positions(second) per
    document — the count is the exact number of occurrences. Pure
    array expressions over the two terms' posting slices; one
    doc-keyed join between them."""
    from pyspark.sql import functions as F

    a = index.where(F.col("term") == first).select(
        id_col, F.col("positions").alias("__pa")
    )
    b = index.where(F.col("term") == second).select(
        id_col, F.col("positions").alias("__pb")
    )
    nxt = F.transform(F.col("__pa"), lambda p: p + 1)
    return (
        a.join(b, id_col)
        .select(
            id_col,
            F.size(F.array_intersect(nxt, F.col("__pb")))
            .cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") > 0)
    )


def proximity_search(index, first: str, second: str, slop: int = 3,
                     id_col: str = "doc_id"):
    """Ordered proximity (NEAR/k) search: documents where ``second``
    follows ``first`` within ``slop`` word positions, with the exact
    ordered-pair count — the classic positional-index operator between
    exact phrase (slop=1) and bag-of-words AND (slop=∞).

    ``n_pairs = Σ_{p ∈ pos(first)} |{q ∈ pos(second) : p < q ≤ p+slop}|``
    as a pure array fold (aggregate + filter) over the two terms'
    posting slices — codegen array expressions, no UDF; per-doc cost is
    tf(first)·tf(second), bounded by the posting lengths. One doc-keyed
    join between two term slices, same scale shape as phrase_search."""
    from pyspark.sql import functions as F

    a = index.where(F.col("term") == first).select(
        id_col, F.col("positions").alias("__pa")
    )
    b = index.where(F.col("term") == second).select(
        id_col, F.col("positions").alias("__pb")
    )
    n = F.aggregate(
        F.col("__pa"),
        F.lit(0),
        lambda acc, p: acc + F.size(F.filter(
            F.col("__pb"),
            lambda q: (q > p) & (q <= p + F.lit(int(slop))),
        )),
    )
    return (
        a.join(b, id_col)
        .select(id_col, n.cast("long").alias("n_pairs"))
        .where(F.col("n_pairs") > 0)
    )


def bm25_topk(index, terms: list, k: int = 10, id_col: str = "doc_id",
              idf_mode: str = "rational"):
    """Disjunctive (OR) BM25 ranked retrieval over the inverted index,
    integer-exact end to end so a SQL oracle reproduces every score
    bit-for-bit (the repo's ppm discipline: no floats, no logs, no
    rounding contract to negotiate between engines).

    **Ranking caveat — read before assuming parity with standard
    BM25.** The default ``idf_mode="rational"`` replaces
    ``ln((N-df+0.5)/(df+0.5))`` with its ARGUMENT (in ppm). Within a
    single term that substitution is rank-preserving (ln is monotone),
    but the per-doc score SUMS over query terms, and the un-logged
    ratio weights rare terms exponentially more than log-idf would —
    so for MULTI-term queries whose terms have very different df, the
    top-k ORDER can diverge from textbook BM25(k1=1.2, b=0.75). Use
    ``idf_mode="log"`` when standard cross-term weighting matters: it
    computes ``floor(ln((2N-2df+1)/(2df+1))·10⁶ + 0.5)`` ONCE per
    query term on the driver (df is a |terms|-row collect — the O(1)
    scalar class) and injects the integers as a broadcast literal
    table, so scores stay exact int64 sums and the scale shape is
    unchanged; it is not the oracle default only because a
    cross-engine SQL replay would have to trust two libm ``ln``
    implementations to agree bit-for-bit. Negative log-idf (df >
    ~N/2) is kept un-clamped, per Robertson's original formulation.

    BM25 with the standard k1=1.2, b=0.75 rewritten as one integer
    rational per (doc, term):

    - idf surrogate (``idf_mode="rational"``):
      ``idf_ppm = ((2N - 2df + 1) * 10^6) div (2df + 1)``
      — the exact argument of the classic ``ln((N-df+0.5)/(df+0.5))``
      in ppm. ln is monotone, so rankings by the argument and by the
      log agree within a term; dropping the log keeps every score an
      exact integer both engines compute identically (see the ranking
      caveat above for what it does NOT preserve).
    - tf normalization with k1=6/5, b=3/4 cleared of denominators:
      ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
        = (44*tf*avgdl) / (20*tf*avgdl + 6*avgdl + 18*dl)``.
    - per-(doc,term) score: ``(idf_ppm * 44 * tf * avgdl)
      div (20*tf*avgdl + 6*avgdl + 18*dl)``; per-doc score is the sum
      over matched query terms. ``div`` is truncating integer division
      (Spark ``div`` == DuckDB ``//`` for non-negative operands).

    Corpus stats come from the index itself (zero-token docs carry no
    postings and no mass): ``N = countDistinct(doc_id)``,
    ``avgdl = sum(tf) div N`` (truncated — pinned cross-engine).

    Scale shape: the query-term slice is |terms| posting lists; df per
    term is an agg over that slice; dl is ONE full-index (doc) agg —
    the same single shuffle the index build already pays — joined to
    the slice on doc_id; the rank window sees ≤k rows after the
    ordered limit. Overflow note: the numerator is bounded by
    ``2e6 * N * 44 * tf * avgdl`` — fits BIGINT through N ≈ 10^9 docs
    per index shard; beyond that drop the ppm scale to 10^3 or move
    the product to DECIMAL(38,0).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    terms = list(dict.fromkeys(terms))
    stats = index.agg(
        F.countDistinct(id_col).alias("n"),
        F.sum("tf").cast("long").alias("toks"),
    ).collect()[0]
    n_docs = int(stats["n"])
    avgdl = int(stats["toks"]) // max(n_docs, 1)

    slice_ = index.where(F.col("term").isin(list(terms)))
    df_t = slice_.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    dl = index.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    if idf_mode == "log":
        import math

        idf_rows = [
            (r["term"], int(math.floor(math.log(
                (2 * n_docs - 2 * int(r["df"]) + 1)
                / (2 * int(r["df"]) + 1)
            ) * 1_000_000 + 0.5)))
            for r in df_t.collect()
        ]
        idf_t = index.sparkSession.createDataFrame(
            idf_rows, "term string, idf_ppm long"
        )
    elif idf_mode == "rational":
        idf_ppm = F.expr(
            f"((2 * {n_docs}L - 2 * df + 1) * 1000000L) div (2 * df + 1)"
        )
        idf_t = df_t.withColumn("idf_ppm", idf_ppm)
    else:
        raise ValueError(f"unknown idf_mode: {idf_mode!r}")
    scored = (
        slice_
        .join(F.broadcast(idf_t), "term")
        .join(dl, id_col)
        .withColumn(
            "__s",
            F.expr(
                f"(idf_ppm * 44L * tf * {avgdl}L) div "
                f"(20L * tf * {avgdl}L + 6L * {avgdl}L + 18L * dl)"
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("__s").cast("long").alias("score_ppm"))
        .orderBy(F.col("score_ppm").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score_ppm").desc(), F.col(id_col))
    return scored.select(
        F.row_number().over(w).cast("int").alias("rank"),
        id_col,
        "score_ppm",
    )


def read_postings_pruned(spark, path: str, terms: list,
                         n_buckets: int = 64):
    """Read only the bucket directories the query terms can live in —
    buckets are computed DRIVER-SIDE with the same md5 arithmetic
    (:func:`_term_buckets_py`), so the predicate on the ``__b``
    partition column is a literal list and Spark prunes directories
    before listing a single file; the exact term filter then applies
    inside the surviving buckets."""
    from pyspark.sql import functions as F

    buckets = _term_buckets_py(terms, n_buckets)
    return (
        spark.read.parquet(path)
        .where(F.col("__b").isin(buckets))
        .where(F.col("term").isin(list(terms)))
    )


def _term_buckets_py(terms: list, n_buckets: int) -> list:
    """Driver-side mirror of :func:`term_bucket` (same md5 prefix
    arithmetic), so lookups know their buckets without a Spark job."""
    import hashlib

    return sorted({
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        % n_buckets
        for t in terms
    })
