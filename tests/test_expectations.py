"""Data-quality expectations: one-scan report, verdict semantics,
empty-input fail-closed, FK orphans, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark):
    rows = [
        (1, "click", 10.0),
        (2, "view", 20.0),
        (3, "click", None),
        (4, "error", -5.0),
        (5, None, 30.0),
        (5, "view", 999.0),  # duplicate id
    ]
    return spark.createDataFrame(rows, "id long, etype string, v double")


def test_expect_report_values_and_verdicts(spark):
    from scida_spark.functions.expectations import (
        accepted,
        expect_report,
        in_range,
        matches,
        not_null,
        unique,
    )

    rep = {
        r["check"]: r
        for r in expect_report(
            _df(spark),
            [
                not_null("v", 0.5),            # 5/6 ≈ 0.833 -> pass
                not_null("etype", 1.0),        # 5/6 -> fail
                unique("id"),                  # 5 distinct / 6 -> fail
                in_range("v", 0.0, 100.0, 0.55),  # 3 of 5 non-null in range -> 0.6 pass
                accepted("etype", ["click", "view"], 0.9),  # 4/5 = 0.8 -> fail
                matches("etype", "^[a-z]+$", 0.99),  # 5/5 -> pass
            ],
        ).collect()
    }
    assert rep["not_null:v"]["observed"] == 5 / 6 and rep["not_null:v"]["passed"]
    assert rep["not_null:etype"]["observed"] == 5 / 6
    assert not rep["not_null:etype"]["passed"]
    assert rep["unique:id"]["observed"] == 5 / 6 and not rep["unique:id"]["passed"]
    assert rep["in_range:v:[0.0,100.0]"]["observed"] == 0.6
    assert rep["in_range:v:[0.0,100.0]"]["passed"]
    assert rep["accepted:etype"]["observed"] == 0.8
    assert not rep["accepted:etype"]["passed"]
    assert rep["matches:etype"]["observed"] == 1.0 and rep["matches:etype"]["passed"]


def test_expect_report_empty_input_fails_closed(spark):
    from scida_spark.functions.expectations import expect_report, not_null, unique

    empty = spark.createDataFrame([], "id long, v double")
    rows = expect_report(empty, [not_null("v"), unique("id")]).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["observed"] is None and r["passed"] is False


def test_expect_report_one_scan(spark):
    """All checks share a single aggregation: exactly one scan of the
    input in the plan (count the parquet/LocalTableScan leaves)."""
    from scida_spark.functions.expectations import (
        expect_report,
        in_range,
        not_null,
    )

    plan = expect_report(
        _df(spark), [not_null("v"), not_null("etype"), in_range("v", 0, 50)]
    )._jdf.queryExecution().optimizedPlan().toString()
    # one shared Aggregate, no union of per-check subplans, no joins
    assert plan.count("Aggregate") == 1
    assert "Union" not in plan and "Join" not in plan


def test_unique_approx_mode(spark):
    from scida_spark.functions.expectations import expect_report, unique

    df = spark.range(1000).select(F.col("id").alias("k"))
    r = expect_report(df, [unique("k")], approx=True).collect()[0]
    # HLL estimate within its documented ~2-5% band of exactly unique
    assert 0.9 <= r["observed"] <= 1.1


def test_fk_check_orphans_and_nulls(spark):
    from scida_spark.functions.expectations import fk_check

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk int")
    r = fk_check(child, "fk", parent, "pk").collect()[0]
    assert r["observed"] == 1.0  # only fk=99; NULL is not an orphan
    assert not r["passed"]
    r2 = fk_check(child, "fk", parent, "pk", max_orphans=1).collect()[0]
    assert r2["passed"]


def test_fk_check_unions_with_scan_report(spark):
    from scida_spark.functions.expectations import (
        expect_report,
        fk_check,
        not_null,
    )

    child = spark.createDataFrame([(1, 10)], "id long, fk int")
    parent = spark.createDataFrame([(10,)], "pk int")
    rep = expect_report(child, [not_null("fk")]).unionAll(
        fk_check(child, "fk", parent, "pk")
    )
    got = {r["check"]: r["passed"] for r in rep.collect()}
    assert got == {"not_null:fk": True, "fk:fk": True}
