"""Distributed global prefix sum — scale-safe running totals under a
total ordering.

A naive ``SUM() OVER (ORDER BY ...)`` forces Spark to move *all* rows
to one task (WindowExec warns "No Partition Defined"). The reference
never hits this because its offsets cumsum runs over the small catalog
only (arepo/dataset.py:342-352) — but a 100 TB engine needs the general
form. Classic two-phase scan, in DataFrame terms (SURVEY §7 hard-item
(b); same pattern as operators/uid.py::with_uid_by_order):

  1. per-key partial sums (one groupBy shuffle; output is |keys| rows);
  2. exclusive prefix over the *small* per-key table (window over keys
     — one task over |keys| rows, which is the point: the big side
     never serializes);
  3. broadcast the key offsets back; within-key running sum under the
     tie-break ordering (partitioned window — parallel at any scale);
  4. row result = key offset + local running sum.

For key cardinality beyond ~1e7, apply step 2 recursively (bucket the
keys). Sums are computed in DECIMAL(38,6): exact, order-independent,
and bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

DEC = "decimal(38,6)"


def global_running_sum(
    df: DataFrame,
    value_col: str,
    key_col: str,
    *tiebreak_cols: str,
    out_col: str = "running",
) -> DataFrame:
    """running[i] = sum of value over all rows ordered before-or-at i
    under (key_col, *tiebreak_cols) total ordering — no single-task
    window over the big side."""
    totals = df.groupBy(key_col).agg(
        F.sum(F.col(value_col).cast(DEC)).alias("__tot")
    )
    w_off = W.orderBy(key_col).rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0).cast(DEC)),
    ).select(key_col, "__off")
    w_local = (
        W.partitionBy(key_col)
        .orderBy(*(tiebreak_cols or (key_col,)))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.join(F.broadcast(offsets), key_col)
        .withColumn(
            out_col,
            (F.sum(F.col(value_col).cast(DEC)).over(w_local) + F.col("__off")),
        )
        .drop("__off")
    )
