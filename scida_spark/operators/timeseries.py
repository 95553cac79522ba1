"""Time-series operators: fixed-grid resampling, gap filling,
forward fill, and linear interpolation.

Resampling IS tumbling-window aggregation (one shuffle on the grain);
the gap/fill/interp stages then run as per-key ordered windows over
the BUCKET-grain rows — a table that is ``days x buckets_per_day``
per key regardless of raw row count, so the windows stay small at
100 TB even though the input does not.

Forward fill uses the gaps-and-islands construction (a cumulative
count of non-null observations forms a group id per carried value)
instead of ``last(..., ignorenulls=True)`` — the construction is
expressible identically in ANSI SQL, which keeps the DuckDB oracle
able to reproduce results bit-for-bit. Linear interpolation carries
the same property: both engines evaluate the identical
``prev + (next - prev) * ((t - tp) / (tn - tp))`` double expression.

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
    order within each key (gaps-and-islands: the running count of
    non-null observations partitions rows into carry groups, each
    holding exactly one non-null value at its head). Leading gaps stay
    NULL. One extra column; no extra shuffle beyond the key window."""
    out = out_col or f"{value_col}_ffill"
    cum = W.partitionBy(*key_cols).orderBy(bucket_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    df = df.withColumn("_ffgrp", F.count(value_col).over(cum))
    carried = F.max(value_col).over(W.partitionBy(*key_cols, "_ffgrp"))
    return df.withColumn(out, carried).drop("_ffgrp")


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
    reproduce results bit-for-bit."""
    out = out_col or f"{value_col}_interp"
    cum = W.partitionBy(*key_cols).orderBy(bucket_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    fwd = W.partitionBy(*key_cols).orderBy(bucket_col).rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    df = (
        df.withColumn("_pgrp", F.count(value_col).over(cum))
        .withColumn("_ngrp", F.count(value_col).over(fwd))
    )
    wp = W.partitionBy(*key_cols, "_pgrp")
    wn = W.partitionBy(*key_cols, "_ngrp")
    prev_v = F.max(value_col).over(wp)
    prev_b = F.max(F.when(F.col(value_col).isNotNull(), F.col(bucket_col))).over(wp)
    next_v = F.max(value_col).over(wn)
    next_b = F.max(F.when(F.col(value_col).isNotNull(), F.col(bucket_col))).over(wn)
    t, tp, tn = F.col(bucket_col), prev_b, next_b
    interp = prev_v + (next_v - prev_v) * (
        (t - tp).cast("double") / (tn - tp).cast("double")
    )
    filled = F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
        F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
    )
    return df.withColumn(out, filled).drop("_pgrp", "_ngrp")
