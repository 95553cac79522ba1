"""Funnel analysis: earliest-completion semantics, per-hop windows,
tie-breaks, rollup conversion."""

from __future__ import annotations

from datetime import datetime

import pytest


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, 1, 0, 0, s), e) for u, t, s, e in rows],
        "user_id long, etype string, ts timestamp, event_id long",
    )


def test_funnel_earliest_completion(spark):
    from scida_spark.operators.funnel import funnel_steps

    rows = [
        # user 1 completes A->B->C in order
        (1, "A", 10, 100), (1, "B", 20, 101), (1, "C", 30, 102),
        # user 2: B before A only -> depth 1 (B must follow A)
        (2, "B", 5, 200), (2, "A", 10, 201),
        # user 3: A then C (no B) -> depth 1
        (3, "A", 10, 300), (3, "C", 20, 301),
        # user 4: never A -> absent from output
        (4, "B", 10, 400),
        # user 5: two A's; earliest A counts, B after it
        (5, "A", 40, 500), (5, "A", 10, 501), (5, "B", 20, 502),
    ]
    got = {
        r["user_id"]: (r["depth"], r["t1"], r["t2"], r["t3"])
        for r in funnel_steps(
            _ev(spark, rows), "user_id", "etype", "ts", ["A", "B", "C"]
        ).collect()
    }
    assert set(got) == {1, 2, 3, 5}
    assert got[1][0] == 3
    assert got[2][0] == 1 and got[2][2] is None
    assert got[3][0] == 1
    assert got[5][0] == 2 and got[5][1].second == 10 and got[5][2].second == 20


def test_funnel_greedy_not_subsequence(spark):
    """Pin the documented semantics: greedy-earliest can report a
    shallower depth than 'some subsequence exists' when a window is
    tight — A@0, B@1, B@50, C@55 with within=10: greedy takes B@1,
    then no C within 10 of it (depth 2), even though A->B@50->C@55
    would fit hop windows."""
    from scida_spark.operators.funnel import funnel_steps

    rows = [(1, "A", 0, 1), (1, "B", 1, 2), (1, "B", 50, 3), (1, "C", 55, 4)]
    [r] = funnel_steps(
        _ev(spark, rows), "user_id", "etype", "ts", ["A", "B", "C"],
        within_seconds=10,
    ).collect()
    assert r["depth"] == 2
    # without the window the same user completes all three
    [r2] = funnel_steps(
        _ev(spark, rows), "user_id", "etype", "ts", ["A", "B", "C"]
    ).collect()
    assert r2["depth"] == 3


def test_funnel_tiebreak_and_layout(spark):
    from scida_spark.operators.funnel import funnel_steps

    # equal timestamps: event_id breaks the tie deterministically
    rows = [(1, "A", 10, 7), (1, "A", 10, 3), (1, "B", 20, 9)]
    df = _ev(spark, rows)
    for layout in (df, df.repartition(8)):
        [r] = funnel_steps(
            layout, "user_id", "etype", "ts", ["A", "B"], tiebreak_col="event_id"
        ).collect()
        assert r["depth"] == 2 and r["t1"].second == 10


def test_funnel_conversion_rollup(spark):
    from scida_spark.operators.funnel import funnel_conversion

    rows = [
        (1, "A", 1, 1), (1, "B", 2, 2), (1, "C", 3, 3),
        (2, "A", 1, 4), (2, "B", 2, 5),
        (3, "A", 1, 6),
        (4, "B", 1, 7),  # no A: not in funnel
    ]
    got = {
        r["step"]: (r["step_type"], r["n_users"], r["conversion"])
        for r in funnel_conversion(
            _ev(spark, rows), "user_id", "etype", "ts", ["A", "B", "C"]
        ).collect()
    }
    assert got[1] == ("A", 3, 1.0)
    assert got[2] == ("B", 2, pytest.approx(2 / 3, abs=0))
    assert got[3] == ("C", 1, pytest.approx(1 / 3, abs=0))


def test_funnel_no_cartesian_plan(spark):
    from scida_spark.operators.funnel import funnel_steps

    rows = [(u, "A", u % 50, u) for u in range(100)]
    rows += [(u, "B", u % 50 + 1, 1000 + u) for u in range(100)]
    plan = funnel_steps(
        _ev(spark, rows), "user_id", "etype", "ts", ["A", "B"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cohort_retention_hand_computed(spark):
    """Two cohorts over 3 weekly periods: cohort 0 = users 1,2 (user 1
    active weeks 0,1,2; user 2 only week 0); cohort 1 = user 3 (active
    weeks 1,2). Retention is exact integer division; repeat events in
    one period count once."""
    import datetime as dt

    from scida_spark.operators.funnel import cohort_retention

    wk = 7 * 86400

    def ts(week, sec=0):
        return dt.datetime.utcfromtimestamp(week * wk + sec)

    rows = [
        (1, ts(0)), (1, ts(0, 60)), (1, ts(1)), (1, ts(2)),
        (2, ts(0, 5)),
        (3, ts(1, 9)), (3, ts(2, 3)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort"], r["offset"]): (r["n_users"], r["cohort_size"], r["retention"])
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (0, 2): (1, 2, 0.5),
        (1, 0): (1, 1, 1.0),
        (1, 1): (1, 1, 1.0),
    }
