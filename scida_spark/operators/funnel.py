"""Funnel analysis — ordered event-sequence conversion (the product-
analytics staple: of the users who did A, how many then did B, then
C, each within an optional time window of the previous step).

Semantics (the standard "earliest completion" funnel): step 1's time
is the user's FIRST A event; step k's time is the first step-k event
STRICTLY AFTER the user's step-(k-1) time (and within ``within``
seconds of it, when given). Greedy-earliest is the canonical choice
and is NOT the same as "any subsequence exists" when windows are
tight — documented so the oracle and tests pin one definition.

Scale: the obvious per-user sort (collect each user's events into an
array and fold) puts a hot user's whole history in one task. The
cascade below instead runs ONE filtered min-aggregation per step over
the raw events — map-side combinable, one shuffle on the user key
each — and carries only the (user, step_time) table (≤ one row per
user) between steps via broadcast-or-shuffled equi-joins. k steps =
k cheap aggregations, no per-user memory, no sort of any user's
history. Works identically inside ``foreachBatch`` over mergeable
per-step minima for a streaming funnel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps,
    within_seconds: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-user earliest-completion funnel over the ordered ``steps``
    event types. Returns one row per user who completed step 1:
    (``user_col``, t1..tk timestamps — NULL once a step is unreached,
    depth int = number of completed steps).

    ``within_seconds`` bounds each step's delay after the PREVIOUS
    step (per-hop window, the common product definition). Strictly
    increasing timestamps between steps; ``tiebreak_col`` (e.g. an
    event id) makes "first" deterministic when a user has equal
    timestamps — the min is taken over (ts, tiebreak) structs."""
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")

    def first_ts(df: DataFrame) -> Column:
        if tiebreak_col is None:
            return F.min(ts_col)
        return F.min(F.struct(ts_col, tiebreak_col))[ts_col]

    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(first_ts(events).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        prev = f"t{k-1}"
        nxt = events.filter(F.col(type_col) == step).join(
            cur.select(user_col, prev), user_col
        )
        cond = F.col(ts_col) > F.col(prev)
        if within_seconds is not None:
            cond = cond & (
                F.col(ts_col).cast("double")
                <= F.col(prev).cast("double") + float(within_seconds)
            )
        stepped = (
            nxt.filter(cond)
            .groupBy(user_col)
            .agg(first_ts(nxt).alias(f"t{k}"))
        )
        cur = cur.join(stepped, user_col, "left")
    depth = F.lit(0)
    for k in range(1, len(steps) + 1):
        depth = depth + F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0)
    return cur.withColumn("depth", depth.cast("int"))


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps,
    within_seconds: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """The rollup: (step int, step_type, n_users, conversion double) —
    users reaching step k, and k's fraction of step 1. One extra
    aggregation over the per-user table."""
    per_user = funnel_steps(
        events, user_col, type_col, ts_col, steps,
        within_seconds=within_seconds, tiebreak_col=tiebreak_col,
    )
    steps = list(steps)
    counts = per_user.agg(
        *[
            F.sum(F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0)).alias(
                f"n{k}"
            )
            for k in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for k, name in enumerate(steps, start=1):
        r = counts.select(
            F.lit(k).alias("step"),
            F.lit(name).alias("step_type"),
            F.col(f"n{k}").cast("long").alias("n_users"),
            F.when(
                F.col("n1") > 0, F.col(f"n{k}").cast("double") / F.col("n1")
            ).alias("conversion"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 604_800_000_000,  # one week of microseconds
) -> DataFrame:
    """Cohort retention — the product-analytics triangle next to the
    funnel: bucket every user into the period of their FIRST event
    (the cohort), then for each (cohort, offset) count how many of
    that cohort were active ``offset`` periods later and what fraction
    of the cohort that is.

    Exactness: periods are integer ``epoch_us DIV period_us`` (the
    sessionization lesson — whole-second/naive-date truncation drifts
    across engines, integer microsecond division does not); retention
    is ONE division of exact integers, so any engine replays the
    triangle bit-for-bit.

    Scale: one groupBy(user) min for cohorts (map-side combined), one
    distinct over (user, period) — activity grain, not event grain —
    one broadcast-sized join (cohort table is users-sized but the
    aggregate it joins INTO is (cohort, offset)-sized), one final
    count. No windows, no per-user history sort; a hot user costs one
    distinct row per active period."""
    # 64-bit integer DIV — never a double quotient (the split_thresholds
    # lesson); ts >= epoch so DIV == floor.
    pw = F.expr(f"unix_micros({ts_col}) DIV {int(period_us)}L")
    first = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(pw).alias("__cw")
    )
    act = events.select(
        F.col(user_col).alias("__u"), pw.alias("__w")
    ).distinct()
    sizes = first.groupBy("__cw").agg(F.count("*").alias("__size"))
    tri = (
        act.join(first, "__u")
        .groupBy("__cw", (F.col("__w") - F.col("__cw")).alias("offset"))
        .agg(F.count("*").alias("n_users"))
        .join(F.broadcast(sizes), "__cw")
    )
    return tri.select(
        F.col("__cw").alias("cohort"),
        "offset",
        "n_users",
        F.col("__size").alias("cohort_size"),
        (F.col("n_users").cast("double") / F.col("__size")).alias("retention"),
    )
