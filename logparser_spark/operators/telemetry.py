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
