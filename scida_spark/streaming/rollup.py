"""Incremental materialized-aggregate maintenance over a stream.

The 100 TB dashboard shape: the raw event stream is far too large to
re-aggregate per query, so each micro-batch is reduced to MERGEABLE
per-key partials — count, DECIMAL sum, and an HLL sketch of the
distinct-count column — and appended to a partial store keyed by
``batch_id``. Serving a query merges partials (sum the counts/sums,
union the sketches): cost O(keys × batches written), never a rescan
of history. A maintenance compaction periodically folds all partials
into one base partial, restoring O(keys) serving cost; because every
component is a commutative monoid, compact-then-merge ≡ merge — the
same algebra the batch-side sketch rollups (functions/sketches.py)
rely on.

Exactly-once to storage: each batch writes its OWN
``batch_id=N`` subdirectory with ``mode("overwrite")`` — a replayed
batch after failure overwrites its previous output instead of
double-counting (same idempotence convention as streaming/ingest.py).

Net-new surface (no reference counterpart — SURVEY §2.7); the
batch-side equivalence contract (merged view ≡ one-shot groupBy over
all data, exactly for count/sum, within the HLL bound for distincts)
is pinned in tests/test_streaming_rollup.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scida_spark.streaming import storekit

DEC = "decimal(38,6)"


def _partial(batch_df: DataFrame, key_cols: list[str], sum_col: str,
             distinct_col: str, lgk: int) -> DataFrame:
    """Reduce one micro-batch to mergeable per-key partials."""
    return batch_df.groupBy(*key_cols).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(sum_col).cast(DEC)).alias("sum_val"),
        F.hll_sketch_agg(distinct_col, F.lit(lgk)).alias("distinct_sketch"),
    )


def incremental_rollup_ingest(
    spark: SparkSession,
    input_dir: str,
    schema,
    *,
    store_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    sum_col: str,
    distinct_col: str,
    lgk: int = 12,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Watch ``input_dir`` for new parquet files and maintain the
    partial store; returns the StreamingQuery. Partials land under
    ``store_dir/batch_id=N/`` (idempotent overwrite per batch).
    ``max_files_per_trigger`` bounds each micro-batch's file count
    (availableNow otherwise folds the whole backlog into one batch)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = _partial(batch_df, key_cols, sum_col, distinct_col, lgk)
        part.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch_id={batch_id}")
        )

    return storekit.run_file_ingest(
        spark, input_dir, schema, process, checkpoint_dir,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )


def read_rollup(
    spark: SparkSession, store_dir: str, key_cols: list[str]
) -> DataFrame:
    """Serve the materialized aggregate: merge all partials into one
    row per key — counts and sums re-aggregate EXACTLY (monoid),
    distincts via HLL union (within the sketch bound). Cost is
    O(keys × partial files), independent of raw history size."""
    partials = storekit.read_partials(spark, store_dir)
    return partials.groupBy(*key_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_val").alias("sum_val"),
        F.hll_sketch_estimate(F.hll_union_agg("distinct_sketch")).alias(
            "approx_distinct"
        ),
    )


def compact_rollup(
    spark: SparkSession, store_dir: str, key_cols: list[str]
) -> int:
    """Fold every partial into a single base partial (batch_id=-1 by
    convention, read like any other partial). Serving cost drops back
    to O(keys); the merged view is unchanged because every component
    is mergeable. Heal/lock/promote mechanics:
    :func:`storekit.compact_monoid_store`."""
    def _base():
        partials = storekit.read_partials(spark, store_dir)
        return partials.groupBy(*key_cols).agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_val").alias("sum_val"),
            F.hll_union_agg("distinct_sketch").alias("distinct_sketch"),
        )

    return storekit.compact_monoid_store(spark, store_dir, _base)


# ---------------------------------------------------------------------------
# Incremental heavy-hitters store (Misra-Gries partials per batch, r9)
# ---------------------------------------------------------------------------


def incremental_freq_ingest(
    spark: SparkSession,
    input_dir: str,
    schema,
    *,
    store_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Maintain a streaming heavy-hitters store: each micro-batch is
    reduced to Misra-Gries partials (functions/sketches.py::
    freq_partials — O(k) rows per batch-group, the same mergeable-
    summaries algebra as the count/sum/HLL rollup above) and appended
    under its own ``batch_id=N`` dir (idempotent overwrite). Serving
    merges partials; history is never re-scanned."""
    from scida_spark.functions.sketches import freq_partials

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = freq_partials(batch_df, group_cols, value_col, k)
        part.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch_id={batch_id}")
        )

    return storekit.run_file_ingest(
        spark, input_dir, schema, process, checkpoint_dir,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )


def read_freq(
    spark: SparkSession, store_dir: str, group_cols: list[str], k: int = 32
) -> DataFrame:
    """Serve the heavy hitters: merge every stored partial into one
    ``(group..., item, w, err)`` summary per group (functions/
    sketches.py::freq_merge). All Misra-Gries guarantees hold against
    the FULL ingested history: ``w <= true <= w + err``, completeness
    above ``err``, ``err <= n/(k+1)``."""
    from scida_spark.functions.sketches import freq_merge

    partials = storekit.read_partials(spark, store_dir)
    return freq_merge(
        partials.select(*group_cols, "item", "w"), group_cols, k
    )


def _freq_summary_to_partials(summary: DataFrame, group_cols: list[str]):
    """A merged summary is itself a valid partial: its item rows plus
    one err row (item NULL) per group re-enter freq_merge unchanged —
    with <= k items the re-compression threshold is 0, so
    serve-after-compact is BIT-IDENTICAL to serve (a fixed point, not
    just guarantee-preserving)."""
    items = summary.filter(F.col("item").isNotNull()).select(
        *group_cols, "item", "w"
    )
    errs = (
        summary.groupBy(*group_cols)
        .agg(F.max("err").alias("w"))
        .select(*group_cols, F.lit(None).cast("string").alias("item"), "w")
    )
    return items.unionByName(errs)


def compact_freq(
    spark: SparkSession, store_dir: str, group_cols: list[str], k: int = 32
) -> int:
    """Fold all heavy-hitter partials into one base partial
    (``batch_id=-1``) via :func:`storekit.compact_monoid_store`."""
    return storekit.compact_monoid_store(
        spark,
        store_dir,
        lambda: _freq_summary_to_partials(
            read_freq(spark, store_dir, group_cols, k), group_cols
        ),
    )


# --------------------------------------------------------------------------
# Deterministic streaming reservoir (min-k-by-hash uniform sample)
# --------------------------------------------------------------------------


def _reservoir_partial(
    batch_df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    salt: str,
) -> DataFrame:
    """Per-group k smallest md5(id || salt) rows of one batch — the
    min-k monoid partial. The rank filter plans as WindowGroupLimit
    (map-side prune before the exchange)."""
    from pyspark.sql.window import Window as W

    keyed = batch_df.select(
        *group_cols,
        F.col(id_col).alias("rid"),
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias(
            "rkey"
        ),
    ).dropDuplicates(group_cols + ["rkey"])
    w = W.partitionBy(*group_cols).orderBy("rkey", "rid")
    return (
        keyed.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= int(k))
        .drop("_r")
    )


def incremental_reservoir_ingest(
    spark: SparkSession,
    input_dir: str,
    schema,
    *,
    store_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    id_col: str,
    k: int = 64,
    salt: str = "res",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Maintain a DETERMINISTIC streaming reservoir: a uniform
    without-replacement sample of k ids per group over the whole
    ingested history, kept incrementally — the dataset-card /
    eyeball-sample primitive at 100 TB (you never rescan the corpus to
    draw a sample).

    Determinism is the whole design (the sampling.py no-rand() rule):
    the "random" priority of an id is md5(id || salt), so the
    reservoir is min-k over a pure function of the data — a mergeable
    MONOID (merge = union, keep k smallest), which makes the streaming
    store EXACTLY equal to a batch top-k over all distinct ids: no
    probabilistic reservoir state, no replay sensitivity, idempotent
    per-batch overwrite like every store here. Each batch writes O(k x
    groups) rows; serving merges partials; compaction folds to one
    base partial and is a FIXED POINT (serve-after-compact is
    bit-identical — min-k of a min-k is itself)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = _reservoir_partial(batch_df, group_cols, id_col, k, salt)
        part.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch_id={batch_id}")
        )

    return storekit.run_file_ingest(
        spark, input_dir, schema, process, checkpoint_dir,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )


def read_reservoir(
    spark: SparkSession, store_dir: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Serve the reservoir: merge all partials, dedupe on the hash key
    (the same id may survive several batches' partials), keep the k
    smallest per group. Returns (group..., rid, rkey, sample_rank)."""
    from pyspark.sql.window import Window as W

    partials = storekit.read_partials(spark, store_dir)
    w = W.partitionBy(*group_cols).orderBy("rkey", "rid")
    return (
        partials.select(*group_cols, "rid", "rkey")
        .dropDuplicates(group_cols + ["rkey"])
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= int(k))
    )


def compact_reservoir(
    spark: SparkSession, store_dir: str, group_cols: list[str], k: int = 64
) -> int:
    """Fold all reservoir partials into one base partial
    (``batch_id=-1``); min-k is idempotent, so serving afterwards is
    bit-identical. Via :func:`storekit.compact_monoid_store`."""
    return storekit.compact_monoid_store(
        spark,
        store_dir,
        lambda: read_reservoir(spark, store_dir, group_cols, k).drop(
            "sample_rank"
        ),
    )


# --------------------------------------------------------------------------
# One ingest pass, many stores
# --------------------------------------------------------------------------


def rollup_writer(
    store_dir: str,
    key_cols: list[str],
    sum_col: str,
    distinct_col: str,
    lgk: int = 12,
):
    """Per-batch writer for the count/sum/HLL rollup store (the
    ``incremental_rollup_ingest`` partial), composable under
    :func:`incremental_multi_store_ingest`."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        _partial(batch_df, key_cols, sum_col, distinct_col, lgk).write.mode(
            "overwrite"
        ).parquet(os.path.join(store_dir, f"batch_id={batch_id}"))

    return write


def reservoir_writer(
    store_dir: str,
    group_cols: list[str],
    id_col: str,
    k: int = 64,
    salt: str = "res",
):
    """Per-batch writer for the deterministic reservoir store,
    composable under :func:`incremental_multi_store_ingest`."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        _reservoir_partial(batch_df, group_cols, id_col, k, salt).write.mode(
            "overwrite"
        ).parquet(os.path.join(store_dir, f"batch_id={batch_id}"))

    return write


def incremental_multi_store_ingest(
    spark: SparkSession,
    input_dir: str,
    schema,
    *,
    checkpoint_dir: str,
    writers,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """ONE streaming pass maintaining MANY mergeable stores: every
    micro-batch is persisted once and each writer derives its partial
    from the same in-memory batch — the production shape at 100 TB,
    where the event stream is read once per trigger no matter how many
    materializations (rollup, heavy hitters, reservoir, ...) ride it.
    Each writer keeps the idempotent ``batch_id=N`` overwrite
    contract, so replay safety composes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for w in writers:
                w(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return storekit.run_file_ingest(
        spark, input_dir, schema, process, checkpoint_dir,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )
