"""Mergeable HLL sketch rollups: merge-equals-rebuild, rollup
composition, and accuracy against exact distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from scida_spark.functions import sketches as SK
from scida_spark.tables import table


def test_rollup_matches_direct_sketch(spark, sf_dir):
    """Union of per-(type,user-bucket) sketches == sketching the rows
    directly at the coarser grain (merge associativity), and both are
    within HLL error of the exact distinct count."""
    ev = table(spark, sf_dir, "events").withColumn(
        "bucket", (F.col("user_id") % 8).cast("int")
    )
    fine = SK.sketch_table(ev, ["event_type", "bucket"], "user_id").localCheckpoint()
    rolled = {
        r["event_type"]: (r["approx_distinct"], r["n_rows"])
        for r in SK.rollup_distinct(fine, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(SK.distinct_estimate(ev["user_id"]).alias("d"))
        .collect()
    }
    exact = {
        r["event_type"]: (r["d"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"), F.count("*").alias("n"))
        .collect()
    }
    assert set(rolled) == set(exact)
    for et, (approx, nrows) in rolled.items():
        # rebuild-at-coarse-grain equals union-of-fine-sketches exactly
        assert approx == direct[et]
        # n_rows re-aggregates exactly
        assert nrows == exact[et][1]
        # HLL(lgk=12) relative error ~0.8%; allow 5% slack
        assert abs(approx - exact[et][0]) <= max(2, 0.05 * exact[et][0])


def test_global_rollup(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    fine = SK.sketch_table(ev, ["event_type"], "user_id")
    total = SK.rollup_distinct(fine, []).collect()[0]
    exact = ev.select(F.countDistinct("user_id").alias("d")).collect()[0]["d"]
    assert abs(total["approx_distinct"] - exact) <= max(2, 0.05 * exact)
