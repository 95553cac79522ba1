"""Global 0-based row index (``uid``) — the load-bearing positional
semantic of the reference data model.

scida injects ``uid = da.arange(nparts)`` per container at load
(reference src/scida/io/_base.py:734-750); group membership is defined
by contiguous uid ranges. Spark relations are unordered, so the engine
makes the index explicit and persists it as a column.

Two strategies:

* :func:`with_uid_by_order` — deterministic uid from a total ordering
  (sort keys). Scale-safe: ``row_number`` over a partitioned window
  would need a single task for a global ordering, so we use the
  two-phase form — per-partition local ranks + broadcast partition
  offsets (classic zipWithIndex, but in DataFrame terms).
* :func:`with_uid_ingest_order` — uid from physical ingest order
  (file/split order). Matches scida's "file order is the order"
  assumption; valid for sources that enumerate splits in order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def with_uid_by_order(
    df: DataFrame, key_col: str, *tiebreak_cols: str, uid_col: str = "uid"
) -> DataFrame:
    """Assign uid = dense global 0-based index under
    ``(key_col, *tiebreak_cols)`` ordering.

    Deterministic two-phase plan (no single-task global window over the
    big side, no reliance on physical partition ids):

      1. per-key row counts (groupBy — output is |distinct keys| rows),
         prefix-summed into per-key offsets with a window over the
         *small* aggregated side;
      2. broadcast-join the offsets back and rank within each key
         (shuffle partitioned by key — parallel at any scale).

    The phase-1 window orders the distinct-key table in one task; for
    key cardinality beyond ~1e7 apply the same trick recursively
    (bucket keys → per-bucket cumsum → bucket offsets).
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("__cnt"))
    w_off = W.orderBy(key_col).rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long")
    ).select(key_col, "__offset")
    w_local = W.partitionBy(key_col).orderBy(*(tiebreak_cols or (key_col,)))
    return (
        df.join(F.broadcast(offsets), key_col)
        .withColumn(uid_col, F.row_number().over(w_local).cast("long") + F.col("__offset") - 1)
        .drop("__offset")
    )


def with_uid_ingest_order(df: DataFrame, uid_col: str = "uid") -> DataFrame:
    """Assign uid from physical partition order (split order ≙ file order).

    Uses monotonically_increasing_id's partition-prefix layout only to
    rank *within* a partition; offsets between partitions come from
    exact per-partition counts, so uids are dense 0..N-1.
    """
    pid = F.spark_partition_id()
    # localCheckpoint pins ONE physical materialization: the per-pid
    # counts (job 1) and the uid assignment (job 2) must see identical
    # partition ids / row order, which AQE re-planning or shuffle-fetch
    # nondeterminism would otherwise break between jobs.
    local = (
        df.withColumn("__pid", pid)
        .withColumn("__mono", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    counts = local.groupBy("__pid").count().orderBy("__pid").collect()
    acc = 0
    rows = []
    for r in counts:
        rows.append((r["__pid"], acc))
        acc += r["count"]
    off_df = df.sparkSession.createDataFrame(rows, "__pid int, __offset long")
    w = W.partitionBy("__pid").orderBy("__mono")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(uid_col, F.row_number().over(w).cast("long") + F.col("__offset") - 1)
        .drop("__pid", "__mono", "__offset")
    )
