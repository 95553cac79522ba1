"""Skew-handling operators: salted two-phase aggregation.

SURVEY §4: one giant halo ≙ one hot key. AQE's skew handling covers
*joins*; a skewed **aggregation with a non-algebraic combine** (e.g.
collecting per-group state in applyInPandas) still lands one task with
the giant group. The classic fix is salting: split each key into
``nsalt`` subkeys, partially aggregate per (key, salt), then merge the
partials — turning one hot task into ``nsalt`` even ones.

For ALGEBRAIC aggregates (sum/count/min/max/avg) Spark's map-side
partial aggregation already does this implicitly — use plain
``groupBy``. ``salted_agg`` exists for the documented pattern and for
aggregates expressed as (partial, merge) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_col: str,
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    nsalt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` run per (key, salt); ``merge_aggs`` combine the
    ``nsalt`` partials per key (they reference the partial output
    columns). Salt = hash(row columns, partition id): the partition-id
    term spreads byte-identical duplicate rows (the typical hot key in
    dedup workloads) that a pure row hash would send to one bucket.
    Which salt a row lands in never affects the merged result — the
    (partial, merge) pair must be assignment-independent, as all
    algebraic aggregates are — so task retries changing partition ids
    are harmless.
    """
    salt = F.pmod(
        F.hash(*[F.col(c) for c in df.columns], F.spark_partition_id()),
        F.lit(nsalt),
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key_col, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(key_col).agg(*merge_aggs)


def salted_sum_count(
    df: DataFrame, key_col: str, value_col: str, nsalt: int = 16
) -> DataFrame:
    """sum+count+avg per key via explicit salting (the worked example;
    algebraic, so plain groupBy is equivalent — this form documents the
    pattern and is the template for non-algebraic state)."""
    out = salted_agg(
        df,
        key_col,
        partial_aggs=[
            F.sum(value_col).alias("__psum"),
            F.count("*").alias("__pcnt"),
        ],
        merge_aggs=[
            F.sum("__psum").alias("sum_value"),
            F.sum("__pcnt").alias("n"),
        ],
        nsalt=nsalt,
    )
    return out.withColumn("avg_value", F.col("sum_value") / F.col("n"))
