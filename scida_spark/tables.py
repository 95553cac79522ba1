"""Helpers for the driver's synthetic star-schema tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; parquet scan → full pushdown/pruning.

    ``events.ts`` has shipped under two parquet encodings, normalized
    here to a session-TZ TIMESTAMP either way (session TZ is pinned UTC
    in session.py, so wall-clock values match DuckDB's):

    * TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read as
      int64 nanos (legacy conf, runtime-settable) and convert with
      *integer* division to the same microsecond truncation DuckDB
      applies when it coerces ns → µs.
    * timestamp[us] without the UTC-adjusted flag: Spark ≥4.1 reads it
      as TIMESTAMP_NTZ, which breaks ``withWatermark`` and bigint
      casts downstream; cast to TIMESTAMP (same wall-clock under UTC).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_dtype = dict(df.dtypes).get("ts")
        if ts_dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
