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


HLL_M = 64          # registers (6-bit bucket index)
HLL_HASH_BITS = 60  # 15 hex chars of md5 — positive in any BIGINT
HLL_RANK_BITS = HLL_HASH_BITS - 6   # 54-bit suffix; ranks 1..55
HLL_ALPHA_PPT = 709  # alpha_64 = 0.709 (Flajolet et al. 2007, exact
                     # rational 709/1000 as the cross-engine contract)
HLL_SUM_SCALE = 30   # harmonic sum carried as sum(2^(30-min(r,30)))


def hll_registers(df, item_col):
    """HyperLogLog register table over an item column (duplicates
    irrelevant by construction — that is the sketch's point): 64
    registers, bucket = top 6 bits of the 60-bit md5-contract hash,
    rank = leading zeros of the 54-bit suffix + 1. One bounded-key
    groupBy (≤ 64 rows out of any partition after map-side max);
    registers from corpus shards merge by ``union → groupBy(bucket) →
    max(max_rank)``. Output: ``(bucket, max_rank)``, integer-exact in
    any engine."""
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15),
        16, 10,
    ).cast("long")
    # shiftright, not `/`: the hash exceeds 2^53, where double
    # division would lose exactness
    bucket = F.shiftright(h, HLL_RANK_BITS).cast("long")
    suffix = h % F.lit(1 << HLL_RANK_BITS)
    # bin() of a positive value has no leading zeros, so its length IS
    # the highest-set-bit position; suffix 0 → max rank
    rank = F.when(suffix == 0, F.lit(HLL_RANK_BITS + 1)).otherwise(
        F.lit(HLL_RANK_BITS + 1) - F.length(F.bin(suffix))
    )
    return (
        df.select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").cast("int").alias("max_rank"))
    )


def hll_estimate(registers_df):
    """Registers → one row ``(v_empty, s30, raw_est)``: ``v_empty`` =
    empty registers (the linear-counting trigger — the ln-based
    small-range correction is a client-side float step by contract,
    everything here stays integer), ``s30`` = the harmonic sum scaled
    by 2^30 (terms below 2^-30 truncate — a documented, deterministic
    contract costing < m·2^-30 relative error), ``raw_est`` =
    alpha·m² / (s30 / 2^30) in exact 64-bit integer division."""
    from pyspark.sql import functions as F

    m = HLL_M
    term = F.expr(
        f"CAST(pow(2, {HLL_SUM_SCALE} - least(max_rank, "
        f"{HLL_SUM_SCALE})) AS BIGINT)"
    )
    agg = registers_df.agg(
        F.count("*").cast("long").alias("used"),
        F.sum(term).cast("long").alias("s_used"),
    )
    # empty registers contribute 2^-0 = 1 each → 2^30 scaled
    numerator = HLL_ALPHA_PPT * m * m * (1 << HLL_SUM_SCALE)
    return agg.select(
        (F.lit(m) - F.col("used")).cast("long").alias("v_empty"),
        (F.col("s_used")
         + (F.lit(m) - F.col("used")) * F.lit(1 << HLL_SUM_SCALE))
        .cast("long").alias("s30"),
        F.expr(
            f"CAST({numerator} div (1000 * (s_used + "
            f"({m} - used) * {1 << HLL_SUM_SCALE})) AS BIGINT)"
        ).alias("raw_est"),
    )


def hll_registers_by(df, group_col, item_col):
    """Per-group HyperLogLog registers — the "distinct users per
    event_type / per host" shape: same md5-contract hash, bucket and
    rank as :func:`hll_registers`, keyed by ``group_col``. One bounded
    groupBy (≤ 64 register rows per group after map-side max); shards
    merge by ``union → groupBy(group, bucket) → max``."""
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15),
        16, 10,
    ).cast("long")
    bucket = F.shiftright(h, HLL_RANK_BITS).cast("long")
    suffix = h % F.lit(1 << HLL_RANK_BITS)
    rank = F.when(suffix == 0, F.lit(HLL_RANK_BITS + 1)).otherwise(
        F.lit(HLL_RANK_BITS + 1) - F.length(F.bin(suffix))
    )
    return (
        df.select(
            F.col(group_col), bucket.alias("bucket"), rank.alias("rank")
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rank").cast("int").alias("max_rank"))
    )


def hll_estimate_by(registers_df, group_col):
    """Per-group estimate rows ``(group, v_empty, s30, raw_est)`` —
    the integer-exact contract of :func:`hll_estimate` applied per
    group key (one aggregate over ≤ 64·n_groups register rows)."""
    from pyspark.sql import functions as F

    m = HLL_M
    term = F.expr(
        f"CAST(pow(2, {HLL_SUM_SCALE} - least(max_rank, "
        f"{HLL_SUM_SCALE})) AS BIGINT)"
    )
    agg = registers_df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("used"),
        F.sum(term).cast("long").alias("s_used"),
    )
    numerator = HLL_ALPHA_PPT * m * m * (1 << HLL_SUM_SCALE)
    return agg.select(
        group_col,
        (F.lit(m) - F.col("used")).cast("long").alias("v_empty"),
        (F.col("s_used")
         + (F.lit(m) - F.col("used")) * F.lit(1 << HLL_SUM_SCALE))
        .cast("long").alias("s30"),
        F.expr(
            f"CAST({numerator} div (1000 * (s_used + "
            f"(64 - used) * {1 << HLL_SUM_SCALE})) AS BIGINT)"
        ).alias("raw_est"),
    )
