"""uid assignment: dense, deterministic, partition-invariant."""

import pytest
from pyspark.sql import functions as F

from scida_spark.operators.uid import with_uid_by_order, with_uid_ingest_order


@pytest.mark.parametrize("npartitions", [1, 3, 8])
def test_uid_by_order_dense_and_deterministic(spark, npartitions):
    df = (
        spark.range(500)
        .select(
            (F.col("id") % 50).alias("k"),
            (F.col("id") / 50).cast("long").alias("sub"),
        )
        .repartition(npartitions)
    )
    out = with_uid_by_order(df, "k", "sub")
    rows = out.orderBy("uid").collect()
    assert [r["uid"] for r in rows] == list(range(500))
    # uid order must equal (k, sub) lexicographic order
    keys = [(r["k"], r["sub"]) for r in rows]
    assert keys == sorted(keys)
    # deterministic across re-evaluation
    rows2 = out.orderBy("uid").collect()
    assert rows == rows2


def test_uid_ingest_order_dense(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    out = with_uid_ingest_order(df)
    uids = sorted(r["uid"] for r in out.collect())
    assert uids == list(range(100))
