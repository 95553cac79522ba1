"""Exact AUC (midrank ties) + confusion/derived metrics."""

from __future__ import annotations

import pytest


def _sk_auc(scores, labels):
    """Reference midrank AUC (pure Python)."""
    n = len(scores)
    order = sorted(range(n), key=lambda i: scores[i])
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j + 1 < n and scores[order[j + 1]] == scores[order[i]]:
            j += 1
        mid = (i + 1 + j + 1) / 2.0
        for k in range(i, j + 1):
            ranks[order[k]] = mid
        i = j + 1
    pos = [ranks[i] for i in range(n) if labels[i]]
    np_, nn = len(pos), n - len(pos)
    return (sum(pos) - np_ * (np_ + 1) / 2.0) / (np_ * nn)


def test_auc_exact_matches_reference_with_ties(spark):
    from scida_spark.functions.metrics import auc_exact

    scores = [0.1, 0.4, 0.4, 0.8, 0.8, 0.8, 0.2, 0.9, 0.4, 0.05]
    labels = [False, True, False, True, True, False, False, True, True, False]
    df = spark.createDataFrame(
        list(zip(range(10), scores, labels)), "id long, s double, y boolean"
    )
    [r] = auc_exact(df, "s", "y").collect()
    assert r["auc"] == pytest.approx(_sk_auc(scores, labels), abs=0)
    assert r["n_pos"] == 5 and r["n_neg"] == 5


def test_auc_perfect_random_and_inverted(spark):
    from scida_spark.functions.metrics import auc_exact

    rows = [(i, float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s double, y boolean")
    assert auc_exact(df, "s", "y").collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(i, float(-i), i >= 50) for i in range(100)], "id long, s double, y boolean"
    )
    assert auc_exact(inv, "s", "y").collect()[0]["auc"] == 0.0
    const = spark.createDataFrame(
        [(i, 1.0, i % 2 == 0) for i in range(10)], "id long, s double, y boolean"
    )
    assert const.transform(
        lambda d: auc_exact(d, "s", "y")
    ).collect()[0]["auc"] == 0.5  # all tied -> 0.5 by midranks


def test_auc_grouped_and_degenerate(spark):
    from scida_spark.functions.metrics import auc_exact

    rows = [(i, "g1", float(i), i >= 5) for i in range(10)]
    rows += [(100 + i, "g2", float(i), True) for i in range(4)]  # no negatives
    df = spark.createDataFrame(rows, "id long, g string, s double, y boolean")
    got = {r["g"]: r["auc"] for r in auc_exact(df, "s", "y", ["g"]).collect()}
    assert got["g1"] == 1.0
    assert got["g2"] is None  # undefined, surfaced as NULL


def test_auc_layout_independent(spark):
    from scida_spark.functions.metrics import auc_exact

    rows = [(i, float((i * 7) % 13), (i * 3) % 5 < 2) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, s double, y boolean")
    a = auc_exact(df, "s", "y").collect()[0]["auc"]
    b = auc_exact(df.repartition(17), "s", "y").collect()[0]["auc"]
    assert a == b


def test_confusion_at_threshold(spark):
    from scida_spark.functions.metrics import confusion_at_threshold

    rows = [
        (1, 0.9, True),   # tp
        (2, 0.8, False),  # fp
        (3, 0.2, True),   # fn
        (4, 0.1, False),  # tn
        (5, 0.5, True),   # tp (>= boundary)
    ]
    df = spark.createDataFrame(rows, "id long, s double, y boolean")
    [r] = confusion_at_threshold(df, "s", "y", 0.5).collect()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 1)
    assert r["precision"] == pytest.approx(2 / 3, abs=0)
    assert r["recall"] == pytest.approx(2 / 3, abs=0)
    assert r["f1"] == pytest.approx(2 * 2 / (2 * 2 + 1 + 1), abs=0)
    # empty input -> NULL metrics, zero counts
    empty = spark.createDataFrame([], "id long, s double, y boolean")
    [e] = confusion_at_threshold(empty, "s", "y", 0.5).collect()
    assert (e["tp"], e["precision"]) == (0, None)


def test_auc_randomized_reference_multi_seed(spark):
    """Randomized agreement with the pure-Python midrank reference
    across several seeds and heavy-tie regimes (bucketed scores)."""
    import random

    from scida_spark.functions.metrics import auc_exact

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        n = 500
        scores = [float(rng.randint(0, 12)) for _ in range(n)]  # heavy ties
        labels = [rng.random() < 0.3 for _ in range(n)]
        if not any(labels) or all(labels):
            labels[0] = not labels[0]
        df = spark.createDataFrame(
            list(zip(range(n), scores, labels)), "id long, s double, y boolean"
        )
        got = auc_exact(df, "s", "y").collect()[0]["auc"]
        assert got == pytest.approx(_sk_auc(scores, labels), abs=0), seed
