"""Dataset diff: status semantics, NULL content, facet rollup,
layout independence."""

from __future__ import annotations


def test_dataset_diff_statuses(spark):
    from scida_spark.functions.diff import dataset_diff, diff_summary

    old = spark.createDataFrame(
        [
            (1, "a", "en"),
            (2, "b", "en"),
            (3, "c", "de"),
            (4, None, "de"),
            (5, "e", "fr"),
        ],
        "id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "en"),     # unchanged
            (2, "B", "en"),     # changed
            (4, None, "de"),    # unchanged (NULL == NULL content)
            (5, None, "fr"),    # changed (content -> NULL)
            (6, "f", "zh"),     # added
        ],                      # 3 removed
        "id long, text string, lang string",
    )
    d = dataset_diff(old, new, "id", ["text"], keep_cols=["lang"])
    got = {r["id"]: (r["status"], r["lang"]) for r in d.collect()}
    assert got == {
        1: ("unchanged", "en"),
        2: ("changed", "en"),
        3: ("removed", "de"),
        4: ("unchanged", "de"),
        5: ("changed", "fr"),
        6: ("added", "zh"),
    }
    s = {
        (r["lang"], r["status"]): r["n"]
        for r in diff_summary(d, ["lang"]).collect()
    }
    assert s[("en", "unchanged")] == 1 and s[("en", "changed")] == 1
    assert s[("de", "removed")] == 1 and s[("zh", "added")] == 1


def test_dataset_diff_layout_independent(spark):
    from scida_spark.functions.diff import dataset_diff

    old = spark.createDataFrame(
        [(k, f"t{k}") for k in range(100)], "id long, text string"
    )
    new = spark.createDataFrame(
        [(k, f"t{k}" if k % 3 else "mut") for k in range(5, 105)],
        "id long, text string",
    )
    a = {
        (r["id"], r["status"])
        for r in dataset_diff(old, new, "id", ["text"]).collect()
    }
    b = {
        (r["id"], r["status"])
        for r in dataset_diff(
            old.repartition(7), new.coalesce(1), "id", ["text"]
        ).collect()
    }
    assert a == b
    assert sum(1 for _, st in a if st == "added") == 5
    assert sum(1 for _, st in a if st == "removed") == 5


def test_dataset_diff_multicolumn_no_boundary_collision(spark):
    """('ab','c') vs ('a','bc') must register as CHANGED — the digest
    separator prevents cross-column concatenation collisions."""
    from scida_spark.functions.diff import dataset_diff

    old = spark.createDataFrame([(1, "ab", "c")], "id long, x string, y string")
    new = spark.createDataFrame([(1, "a", "bc")], "id long, x string, y string")
    [r] = dataset_diff(old, new, "id", ["x", "y"]).collect()
    assert r["status"] == "changed"
