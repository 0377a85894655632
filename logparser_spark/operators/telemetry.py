"""Event-telemetry analytics beyond plain groupBys: the ordered
funnel — the canonical product-analytics operator.

``funnel``: per user, the strict-order step chain — t1 = earliest
step-1 event; t_k = earliest step-k event STRICTLY after t_{k-1}. A
user converts through step k iff t_k exists. Expressed as chained
conditional window minima over ONE user-keyed shuffle: the three
Window nodes share the partitioning, so Catalyst plans a single
exchange and three in-partition passes — no joins, no per-user
collect, no UDF. Same-timestamp events do NOT satisfy "after"
(documented strictness contract).
"""

from __future__ import annotations

from typing import List, Sequence


def funnel(events, steps: Sequence[str], user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type"):
    """Strict-order funnel over an event stream.

    Output: one row per step, ``(step, event_type, n_users,
    conv_ppm)`` — users reaching the step in order, and the
    parts-per-million conversion vs step 1 (floor division; step 1
    converts at exactly 1,000,000).

    Scale shape: one hash exchange on the user column; each step adds
    one conditional-min Window over the same partitioning; the final
    funnel table comes from one global aggregate over per-user flags
    (map-side partials reduce each partition to a single row)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev = None
    tcols: List[str] = []
    for k, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() \
                & (F.col(ts_col) > F.col(prev))
        tname = f"__t{k}"
        df = df.withColumn(
            tname, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        tcols.append(tname)
        prev = tname
    per_user = df.groupBy(user_col).agg(*[
        F.max(F.col(t).isNotNull().cast("long")).alias(f"__r{k}")
        for k, t in enumerate(tcols)
    ])
    wide = per_user.agg(*[
        F.coalesce(F.sum(f"__r{k}"), F.lit(0)).cast("long")
        .alias(f"__u{k}")
        for k in range(len(steps))
    ])
    conv = [
        F.when(
            F.col("__u0") > 0,
            F.expr(f"(__u{k} * 1000000) div __u0"),
        ).otherwise(F.lit(0)).cast("long").alias(f"__c{k}")
        for k in range(len(steps))
    ]
    wide = wide.select("*", *conv)
    stack = ", ".join(
        f"{k + 1}, '{s}', __u{k}, __c{k}" for k, s in enumerate(steps)
    )
    return wide.select(F.expr(
        f"stack({len(steps)}, {stack}) "
        "AS (step, event_type, n_users, conv_ppm)"
    )).select(
        F.col("step").cast("int"), "event_type",
        F.col("n_users").cast("long"), F.col("conv_ppm").cast("long"),
    )


def cohort_retention(events, epoch: str, user_col: str = "user_id",
                     ts_col: str = "ts", unit_days: int = 7):
    """Cohort retention: cohort(user) = the ``unit_days``-bucket of
    the user's FIRST event (anchored at ``epoch``, a date literal —
    part of the query contract, not data-sniffed); retention cell
    (cohort, offset) = distinct cohort users active in bucket
    cohort + offset.

    Output: ``(cohort, offset, n_users)`` with integer bucket indexes.

    Scale shape: two user-keyed aggregates (first-event, distinct
    user-bucket activity) + one broadcastable join of the per-user
    cohort onto the activity rows (both sides are user-cardinality,
    the join key is the user id — a co-partitioned hash join, no
    corpus-sized side), then one bounded groupBy (#cohorts ×
    #offsets)."""
    from pyspark.sql import functions as F

    bucket = F.expr(
        f"datediff(to_date({ts_col}), date'{epoch}') "
        f"div {int(unit_days)}"
    ).cast("long")
    ev = events.select(F.col(user_col).alias("u"),
                       bucket.alias("bkt"))
    cohorts = ev.groupBy("u").agg(F.min("bkt").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(cohorts, "u")
        .select("cohort", (F.col("bkt") - F.col("cohort"))
                .alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def spike_hours(events, window_hours: int = 24,
                factor_num: int = 3, factor_den: int = 2,
                ts_col: str = "ts", type_col: str = "event_type"):
    """Hourly spike detection per event type: an hour spikes when its
    count exceeds ``factor`` × the mean of the trailing
    ``window_hours`` OBSERVED hours (rows-based window — missing hours
    don't pad; the documented contract), requiring a full trailing
    window. Integer cross-multiplication, no division:
    ``cnt * window * factor_den > factor_num * trail_sum * 1``.

    Output: ``(event_type, hour, cnt, trail_sum)`` for spiking hours.

    Scale shape: one (type, hour)-keyed aggregate (bounded key space),
    then windows partitioned by type over hour-cardinality rows —
    never event-level data inside a window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    hourly = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-window_hours, -1)
    )
    scored = hourly.select(
        "event_type", "hour", "cnt",
        F.sum("cnt").over(w).alias("trail_sum"),
        F.count("cnt").over(w).alias("__nprev"),
    )
    return (
        scored.where(
            (F.col("__nprev") == window_hours)
            & (F.col("cnt") * window_hours * factor_den
               > factor_num * F.col("trail_sum"))
        )
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "cnt", F.col("trail_sum").cast("long").alias("trail_sum"),
        )
    )
