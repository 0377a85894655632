"""Mergeable frequency sketches, integer-exact and engine-portable.

Count-min sketch (Cormode & Muthukrishnan 2005): ``depth`` hash rows ×
``width`` counters; update adds 1 to one counter per row, point query
takes the MIN over rows — an overestimate bounded by
``true + (2/width) * total`` with probability ``1 - 2^-depth``. The
sketch here is a plain DataFrame ``(r, bucket, cnt)``: built with one
bounded-key groupBy (key space = depth × width, so map-side partial
aggregation collapses each partition to at most that many rows before
the shuffle — the sketch is exactly the "shuffle tiny aggregates, not
the corpus" shape), merged by summing counts, and queried with a
broadcast join.

Hashing is the repo's cross-engine contract: row ``r``'s bucket for a
term is the first 8 hex chars of ``md5('<r>:' || term)`` mod width —
bit-identical in Spark (``conv(substr(md5(..),1,8),16,10)``) and ANSI
SQL (``('0x' || substr(md5(..),1,8))::BIGINT``), so a DuckDB oracle
reproduces every counter and every estimate exactly. No float ever
enters; estimates are exact 64-bit integers.
"""

from __future__ import annotations


def _bucket(col, r: int, width: int):
    """Row-``r`` counter index for a term: md5-based, engine-portable,
    uniform over [0, width)."""
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{r}:"), col)), 1, 8), 16, 10
    ).cast("long")
    return h % width


def _words(text_col):
    from pyspark.sql import functions as F

    return F.filter(F.split(F.col(text_col), " "),
                    lambda t: F.length(t) > 0)


def cms_build(docs, depth: int = 4, width: int = 64,
              text_col: str = "text"):
    """Corpus token stream → count-min sketch table ``(r, bucket,
    cnt)``. One explode (depth rows per token — map-side) + one
    bounded-key groupBy; the shuffle carries at most depth × width
    rows per map partition regardless of corpus size. Sketches built
    over corpus shards merge by ``union → groupBy(r, bucket) →
    sum(cnt)``."""
    from pyspark.sql import functions as F

    toks = docs.select(F.explode(_words(text_col)).alias("term"))
    rows = toks.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(r).alias("r"),
                _bucket(F.col("term"), r, width).alias("bucket"),
            )
            for r in range(depth)
        ])).alias("p")
    )
    return (
        rows.groupBy(
            F.col("p.r").cast("int").alias("r"),
            F.col("p.bucket").cast("long").alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(sketch_df, terms_df, depth: int = 4, width: int = 64,
                 term_col: str = "term"):
    """Point-query every row of ``terms_df`` against a sketch: explode
    the term's depth (row, bucket) probes, broadcast-join the sketch
    (depth × width rows — always broadcastable), take the min counter
    (absent bucket = 0). Output: ``terms_df``'s columns + ``est``."""
    from pyspark.sql import functions as F

    probes = terms_df.select(
        "*",
        F.explode(F.array(*[
            F.struct(
                F.lit(r).alias("r"),
                _bucket(F.col(term_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ])).alias("p"),
    ).select("*", F.col("p.r").alias("r"),
             F.col("p.bucket").alias("bucket")).drop("p")
    keep = [c for c in terms_df.columns]
    return (
        probes.join(F.broadcast(sketch_df), ["r", "bucket"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long")
             .alias("est"))
    )


def cms_heavy_hitters(docs, threshold: int, depth: int = 4,
                      width: int = 64, text_col: str = "text"):
    """Heavy hitters via the sketch: estimate every distinct term and
    keep those with ``est >= threshold``. ``cnt_true`` (the exact
    count) rides along so the one-sided guarantee ``est >= cnt_true``
    is visible in the output — the sketch can only overestimate, so
    recall of true heavy hitters is total; precision is what width
    buys. Two bounded shuffles (sketch build + distinct-term count);
    the estimate join is broadcast."""
    from pyspark.sql import functions as F

    sketch = cms_build(docs, depth=depth, width=width,
                       text_col=text_col)
    terms = (
        docs.select(F.explode(_words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt_true"))
    )
    est = cms_estimate(sketch, terms, depth=depth, width=width)
    return est.where(F.col("est") >= threshold).select(
        "term", "cnt_true", "est"
    )
