"""Mergeable sketch families: HLL merge-equals-rebuild and accuracy,
KLL merged-rollup rank-error contracts, Theta set algebra vs exact
set-op cardinalities (exact mode below 2^lgk retained keys)."""

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


def test_kll_merged_rollup_rank_contract(spark, sf_dir):
    """Quantiles read from MERGED per-bucket KLL sketches land within
    the rank-error contract: the exact rank of each estimate is within
    2×1.65 % of the target quantile. (KLL is randomized — re-runs give
    different estimates inside the bound — so the contract is on rank,
    never on the value.)"""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    fine = SK.kll_sketch_table(
        ev.withColumn("b", (F.crc32(F.col("value").cast("string")) % 8).cast("int")),
        ["event_type", "b"],
        "value",
    )
    est = SK.rollup_quantiles(fine, ["event_type"], [0.1, 0.5, 0.9])
    rows = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                (
                    F.sum((F.col("value") <= F.element_at("qs", i + 1)).cast("int"))
                    / F.count("*")
                ).alias(f"r{i}")
                for i in range(3)
            ]
        )
        .collect()
    )
    eps = 2 * SK.KLL_RANK_EPS_K200
    assert rows, "no event types"
    for r in rows:
        for i, q in enumerate([0.1, 0.5, 0.9]):
            assert abs(r[f"r{i}"] - q) <= eps, (r["event_type"], q, r[f"r{i}"])


def test_kll_global_rollup_n_rows_exact(spark, sf_dir):
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    fine = SK.kll_sketch_table(ev, ["event_type"], "value")
    total = SK.rollup_quantiles(fine, [], [0.5]).collect()[0]
    assert total["n_rows"] == ev.count()
    # global median estimate must sit between per-engine min and max
    mm = ev.agg(F.min("value"), F.max("value")).collect()[0]
    assert mm[0] <= total["qs"][0] <= mm[1]


def test_theta_set_algebra_exact_mode(spark, sf_dir):
    """Per-day Theta sketches composed with union/intersection/
    difference reproduce the exact set-op cardinalities while the day
    sets hold fewer than 2^lgk keys (exact mode — θ=1, no sampling):
    the regime every test SF sits in. Beyond that the estimates
    degrade gracefully per the DataSketches bounds (documented, not
    testable at these SFs)."""
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    days = [r["d"] for r in ev.select("d").distinct().orderBy("d").limit(2).collect()]
    ev2 = ev.filter(F.col("d").isin(days))
    tsk = SK.theta_sketch_table(ev2, ["d"], "user_id")
    one = tsk.agg(
        F.min_by("theta", "d").alias("a"), F.max_by("theta", "d").alias("b")
    )
    e_union, e_inter, e_diff = SK.theta_set_estimates(F.col("a"), F.col("b"))
    got = one.select(
        e_union.alias("u"), e_inter.alias("i"), e_diff.alias("x")
    ).collect()[0]
    s1 = {r[0] for r in ev2.filter(F.col("d") == days[0]).select("user_id").distinct().collect()}
    s2 = {r[0] for r in ev2.filter(F.col("d") == days[1]).select("user_id").distinct().collect()}
    assert round(got["u"]) == len(s1 | s2)
    assert round(got["i"]) == len(s1 & s2)
    assert round(got["x"]) == len(s1 - s2)
