"""Time-series operators: resample bucketing, gap filling against the
global grid, forward fill (gaps-and-islands), linear interpolation —
golden values on a hand-built series, plus invariants on the events
table."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scida_spark.operators import timeseries as TS
from scida_spark.tables import table


def _series(spark):
    """Two keys, 60 s grid. Key a: values at t=0, 180, 240 (gaps at 60,
    120 interior; leading/trailing none). Key b: single value at t=60
    (so its grid rows elsewhere are leading/trailing gaps)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base, 10.0),
        ("a", base + dt.timedelta(seconds=180), 40.0),
        ("a", base + dt.timedelta(seconds=240), 20.0),
        ("b", base + dt.timedelta(seconds=60), 7.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_resample_fill_ffill_interp_golden(spark):
    df = _series(spark)
    res = TS.resample(
        df, ["k"], "ts", 60, [F.count("*").alias("n"), F.sum("v").alias("s")]
    )
    filled = TS.fill_gaps(res, ["k"], 60)
    out = TS.linear_interp(
        TS.forward_fill(filled, ["k"], "s", out_col="ff"),
        ["k"],
        "s",
        out_col="ip",
    )
    got = {
        (r["k"], r["bkt"] % 86400): (r["s"], r["ff"], r["ip"])
        for r in out.collect()
    }
    # global grid spans t=0..240 for BOTH keys (5 points each)
    assert len(got) == 10
    # key a: gaps at 60, 120 -> ffill carries 10.0; interp walks
    # linearly from 10 (t=0) to 40 (t=180)
    assert got[("a", 60)] == (None, 10.0, 20.0)
    assert got[("a", 120)] == (None, 10.0, 30.0)
    # observed points pass through everywhere
    assert got[("a", 0)] == (10.0, 10.0, 10.0)
    assert got[("a", 180)] == (40.0, 40.0, 40.0)
    assert got[("a", 240)] == (20.0, 20.0, 20.0)
    # key b: leading gap stays NULL in ffill AND interp; trailing gaps
    # carry forward but cannot interpolate (no right neighbor)
    assert got[("b", 0)] == (None, None, None)
    assert got[("b", 60)] == (7.0, 7.0, 7.0)
    assert got[("b", 120)] == (None, 7.0, None)
    assert got[("b", 240)] == (None, 7.0, None)


def test_fill_gaps_completeness_events(spark, sf_dir):
    """Every (event_type, grid point) over the global span is present
    exactly once, and the non-gap buckets reproduce the plain
    resample aggregate."""
    ev = table(spark, sf_dir, "events")
    res = TS.resample(
        ev, ["event_type"], "ts", 3600, [F.count("*").alias("n")]
    )
    filled = TS.fill_gaps(res, ["event_type"], 3600)
    bounds = res.agg(F.min("bkt"), F.max("bkt")).collect()[0]
    n_points = (bounds[1] - bounds[0]) // 3600 + 1
    n_keys = ev.select("event_type").distinct().count()
    assert filled.count() == n_points * n_keys
    assert filled.groupBy("event_type", "bkt").count().filter("count > 1").count() == 0
    # row-count conservation: filled non-gap buckets sum to the table size
    total = filled.agg(F.sum("n")).collect()[0][0]
    assert total == ev.count()


def test_rolling_anomaly_flags_hand_computed(spark):
    """n * frame_count > 2 * frame_sum over the previous 6 buckets.
    Series a: flat 10s then a 25 spike -> only the spike flags (25*6 >
    2*60). Head bucket (empty frame) never flags even when huge. A
    zero-history run (all zeros then 1) flags the 1 (1*6 > 0)."""
    from scida_spark.operators.timeseries import rolling_anomaly_flags

    rows = (
        [("a", 300 * i, 10) for i in range(6)]
        + [("a", 1800, 25)]
        + [("b", 0, 999)]                      # head: no frame, no flag
        + [("c", 300 * i, 0) for i in range(6)]
        + [("c", 1800, 1)]
    )
    df = spark.createDataFrame(rows, "event_type string, bkt long, n long")
    got = {
        (r["event_type"], r["bkt"]): (r["n"], r["rolling_sum"], r["rolling_cnt"])
        for r in rolling_anomaly_flags(df, ["event_type"]).collect()
    }
    assert got == {("a", 1800): (25, 60, 6), ("c", 1800): (1, 0, 6)}


def test_rolling_anomaly_boundary_not_flagged(spark):
    """Exactly 2x the rolling mean is NOT an anomaly (strict >)."""
    from scida_spark.operators.timeseries import rolling_anomaly_flags

    rows = [("a", 300 * i, 10) for i in range(6)] + [("a", 1800, 20)]
    df = spark.createDataFrame(rows, "event_type string, bkt long, n long")
    assert rolling_anomaly_flags(df, ["event_type"]).count() == 0
