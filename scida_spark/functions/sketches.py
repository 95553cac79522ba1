"""Mergeable-sketch aggregation: pre-aggregate once, re-aggregate
forever — the pattern that makes 100 TB distinct-count dashboards
cheap. (No reference counterpart; net-new Spark capability, like the
streaming surface.)

Spark ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` — JVM-side, whole-stage
codegen): build per-fine-grain sketches at ingest (one shuffle on the
grain), persist the binary sketch column, then answer ANY coarser
distinct-count rollup by unioning sketches — never rescanning rows.
The union is associative + commutative, so daily → monthly → all-time
rollups compose, and late partitions merge in O(sketch bytes).

Quantile rollups get the same treatment from ``percentile_approx``'s
partial aggregation (Spark merges its internal QuantileSummaries state
map-side); no extra machinery needed here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_table(
    df: DataFrame, grain_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Per-grain HLL sketch of ``value_col`` — the ingest-time artifact
    (persist it next to the fact table; binary column, ~2^lgk bytes).
    One shuffle on the grain, map-side partial sketching."""
    return df.groupBy(*grain_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def rollup_distinct(
    sketches: DataFrame, rollup_cols: list[str]
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grain: union the
    binaries, estimate at the end. No row rescans — cost is
    O(groups × sketch bytes)."""
    grouped = (
        sketches.groupBy(*rollup_cols)
        if rollup_cols
        else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


def distinct_estimate(value_col, lgk: int = 12) -> Column:
    """One-shot approximate distinct count (aggregate Column)."""
    return F.hll_sketch_estimate(F.hll_sketch_agg(value_col, F.lit(lgk)))
