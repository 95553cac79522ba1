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


def test_dataset_diff_null_position_and_separator_injective(spark):
    """The ADVICE-flagged collisions: (a,NULL,b) vs (a,b,NULL) must be
    CHANGED (concat_ws would skip NULLs and hash them identically), and
    a value CONTAINING the old separator byte vs the same bytes split
    across columns must be CHANGED. The length-prefixed encoding is
    injective, so every distinct tuple digests differently."""
    from scida_spark.functions.diff import dataset_diff

    schema = "id long, x string, y string, z string"
    old = spark.createDataFrame(
        [
            (1, "a", None, "b"),
            (2, "a\x1fb", "c", None),
            (3, "12:x", "y", None),
            (4, None, None, None),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, "a", "b", None),        # NULL moved -> changed
            (2, "a", "b\x1fc", None),   # separator-split -> changed
            (3, "12:x", "y", None),     # identical incl ':' -> unchanged
            (4, None, None, None),      # all-NULL tuple -> unchanged
        ],
        schema,
    )
    got = {
        r["id"]: r["status"]
        for r in dataset_diff(old, new, "id", ["x", "y", "z"]).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "unchanged", 4: "unchanged"}


def test_scd2_history_hand_computed(spark):
    """Every SCD2 rule on one fixture: change splits a run, a presence
    GAP splits a run even with identical content, late appearance,
    deletion before the end, is_current only for runs reaching the
    latest version."""
    from scida_spark.functions.diff import scd2_history

    rows = [
        (1, 0, "a"), (1, 1, "a"), (1, 2, "b"),   # change at v2
        (2, 0, "x"), (2, 2, "x"),                 # gap -> two runs
        (3, 1, "z"), (3, 2, "z"),                 # late, current
        (4, 0, "q"),                              # deleted after v0
    ]
    df = spark.createDataFrame(rows, "id long, version long, text string")
    got = {
        (r["id"], r["valid_from"]): (
            r["valid_to"], r["n_versions"], r["is_current"]
        )
        for r in scd2_history(df, "id", ["text"]).collect()
    }
    assert got == {
        (1, 0): (1, 2, False),
        (1, 2): (2, 1, True),
        (2, 0): (0, 1, False),
        (2, 2): (2, 1, True),
        (3, 1): (2, 2, True),
        (4, 0): (0, 1, False),
    }


def test_scd2_history_layout_independent(spark):
    from scida_spark.functions.diff import scd2_history

    rows = [
        (i, v, f"t{i}" if (i + v) % 3 else "mut")
        for i in range(40)
        for v in range(4)
        if (i * v) % 5 != 3
    ]
    df = spark.createDataFrame(rows, "id long, version long, text string")
    a = {tuple(r) for r in scd2_history(df, "id", ["text"]).collect()}
    b = {
        tuple(r)
        for r in scd2_history(df.repartition(11, "version"), "id", ["text"]).collect()
    }
    assert a == b and len(a) > 40


def test_scd2_history_tolerates_exact_duplicate_rows(spark):
    """Appending the same snapshot twice (exact duplicate (id, version,
    content) rows) must NOT create spurious run breaks: the digest-grain
    drop makes the result identical to the clean stack — the ADVICE r10
    regression. Conflicting content per (id, version) stays a documented
    contract violation."""
    from scida_spark.functions.diff import scd2_history

    clean = [(1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (2, 0, "x")]
    df_clean = spark.createDataFrame(clean, "id long, version long, text string")
    df_dup = spark.createDataFrame(
        clean + clean[:2], "id long, version long, text string"
    )
    a = {tuple(r) for r in scd2_history(df_clean, "id", ["text"]).collect()}
    b = {tuple(r) for r in scd2_history(df_dup, "id", ["text"]).collect()}
    assert a == b and len(a) == 3
