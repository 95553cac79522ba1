"""Streaming windowed aggregations with watermark late-data handling.

These builders take any streaming DataFrame with an event-time column
and return the aggregated streaming DataFrame; the batch-equivalent
semantics are oracle-checked in queries_pipeline.py (same F.window
calls on the bounded table).

Scale posture: watermark bounds state size (state per open window per
key only); sliding windows share state via Spark's native window
exploding; session windows use the built-in ``session_window`` operator
(state merges adjacent sessions under the gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), key_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Native session windows (gap-based merge) — the streaming twin of
    the batch lag+cumsum sessionizer (queries q_sessionization)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count("*").alias("n_events"), F.min(ts_col).alias("session_start"))
        .select(
            key_col,
            F.col("session_window.start").alias("window_start"),
            "n_events",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drive a bounded streaming source to completion via the memory sink
    (complete mode) and return the result as a batch DataFrame — the
    local-test harness pattern."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
