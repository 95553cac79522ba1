"""Time-series operators: fixed-grid resampling, gap filling,
forward fill, and linear interpolation.

Resampling IS tumbling-window aggregation (one shuffle on the grain);
the gap/fill/interp stages then run as per-key ordered windows over
the BUCKET-grain rows — a table that is ``days x buckets_per_day``
per key regardless of raw row count, so the windows stay small at
100 TB even though the input does not.

Forward fill and interpolation use ``last/first(..., ignorenulls)``
over ONE per-key ordered window — every neighbor column shares the
same partitioning and sort, so the whole fill stage costs a single
exchange + sort regardless of how many neighbor values it derives.
(r7 shipped a gaps-and-islands construction instead — a cumulative
count forming a carry-group id, then a max over (key, group) — which
is value-identical but repartitions by the derived group id: two extra
exchanges per operator, and the bench's new per-section timings showed
interp at 5.5 s of its slot's 6 s. An oracle can reproduce either
construction: the gaps-and-islands SQL remains valid for engines
without IGNORE NULLS, and both evaluate the identical
``prev + (next - prev) * ((t - tp) / (tn - tp))`` double expression,
so results are bit-for-bit unchanged.)

No reference counterpart (scida has no time axis); net-new Spark
capability like the streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    interval_s: int,
    agg_exprs: list,
) -> DataFrame:
    """Aggregate to a fixed ``interval_s`` grid: one shuffle on
    (keys, bucket), map-side partial aggregation. ``bkt`` is epoch
    seconds truncated to the interval."""
    bkt = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / interval_s) * interval_s
    ).alias("bkt")
    return df.groupBy(*key_cols, bkt).agg(*agg_exprs)


def fill_gaps(
    resampled: DataFrame,
    key_cols: list[str],
    interval_s: int,
    bucket_col: str = "bkt",
) -> DataFrame:
    """Left-join the resampled table against the full (key x grid)
    frame spanning the GLOBAL [min, max] bucket range, so every key
    carries every grid point; missing points surface with NULL
    aggregates. The grid is a JVM ``sequence`` explode of
    span/interval elements — metadata-sized next to the fact table."""
    bounds = resampled.agg(
        F.min(bucket_col).alias("mn"), F.max(bucket_col).alias("mx")
    )
    grid = bounds.select(
        F.explode(
            F.sequence("mn", "mx", F.lit(int(interval_s)).cast("long"))
        ).alias(bucket_col)
    )
    keys = resampled.select(*key_cols).distinct()
    frame = keys.crossJoin(grid)
    return frame.join(resampled, [*key_cols, bucket_col], "left")


def forward_fill(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    bucket_col: str = "bkt",
    out_col: str | None = None,
) -> DataFrame:
    """Carry the last non-null ``value_col`` forward along the bucket
    order within each key. Leading gaps stay NULL. ONE window over the
    key partitioning — no derived-group repartition, so the whole
    operator is one exchange + one sort."""
    out = out_col or f"{value_col}_ffill"
    cum = W.partitionBy(*key_cols).orderBy(bucket_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn(out, F.last(value_col, ignorenulls=True).over(cum))


def linear_interp(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    bucket_col: str = "bkt",
    out_col: str | None = None,
) -> DataFrame:
    """Linearly interpolate NULL ``value_col`` points between their
    nearest non-null neighbors along the bucket order (per key).
    Points with a neighbor missing on either side stay NULL. The
    arithmetic is the canonical
    ``prev + (next - prev) * ((t - tp) / (tn - tp))`` on doubles,
    with that exact association — oracles must mirror it to
    reproduce results bit-for-bit. Both neighbor directions are
    GROWING frames (unboundedPreceding -> currentRow): the "next"
    neighbors run over the DESCENDING bucket order, where a growing
    frame over rows with bucket >= current is exactly "first non-null
    at-or-after". Growing frames are maintained incrementally by
    WindowExec (O(rows)); the naive forward-looking frame
    (currentRow -> unboundedFollowing) is a SHRINKING frame, which
    ignorenulls aggregates force to re-scan per row — O(rows^2) per
    key, measurably slower even at bucket grain. One exchange, two
    local sorts (asc + desc), no derived-group repartitions."""
    out = out_col or f"{value_col}_interp"
    cum = W.partitionBy(*key_cols).orderBy(bucket_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    rev = W.partitionBy(*key_cols).orderBy(F.col(bucket_col).desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    obs_b = F.when(F.col(value_col).isNotNull(), F.col(bucket_col))
    prev_v = F.last(value_col, ignorenulls=True).over(cum)
    prev_b = F.last(obs_b, ignorenulls=True).over(cum)
    next_v = F.last(value_col, ignorenulls=True).over(rev)
    next_b = F.last(obs_b, ignorenulls=True).over(rev)
    t, tp, tn = F.col(bucket_col), prev_b, next_b
    interp = prev_v + (next_v - prev_v) * (
        (t - tp).cast("double") / (tn - tp).cast("double")
    )
    filled = F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
        F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
    )
    return df.withColumn(out, filled)


def rolling_anomaly_flags(
    buckets: DataFrame,
    group_cols,
    n_col: str = "n",
    bucket_col: str = "bkt",
    window: int = 6,
    factor: int = 2,
) -> DataFrame:
    """Spike detection over a resampled (group, bucket, count) grid:
    flag buckets whose count exceeds ``factor`` x the rolling MEAN of
    the previous ``window`` buckets — evaluated as the ALL-INTEGER
    predicate ``n * frame_count > factor * frame_sum`` (never a float
    mean: division order can differ across engines; the cross-
    multiplied form is exact, the sampling.py lesson). Buckets with an
    empty preceding frame (series head) are never flagged.

    Returns only the flagged rows: (group_cols..., bucket, n,
    rolling_sum, rolling_cnt). Run it on the gap-FILLED grid
    (:func:`fill_gaps`) so quiet periods count as zeros instead of
    silently shrinking the frame.

    Scale: the input is bucket grain (days x buckets-per-day per
    group — metadata-sized at any event volume; the one event-grain
    shuffle already happened in :func:`resample`), so the per-group
    ordered window is cheap and bounded."""
    group_cols = list(group_cols)
    w = (
        W.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(-int(window), -1)
    )
    flagged = buckets.withColumn(
        "rolling_sum", F.sum(n_col).over(w)
    ).withColumn("rolling_cnt", F.count(n_col).over(w))
    return flagged.filter(
        (F.col("rolling_cnt") > 0)
        & (
            F.col(n_col) * F.col("rolling_cnt")
            > F.lit(int(factor)) * F.col("rolling_sum")
        )
    ).select(*group_cols, bucket_col, n_col, "rolling_sum", "rolling_cnt")
