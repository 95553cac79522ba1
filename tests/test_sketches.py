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


# ---------------------------------------------------------------------------
# Misra-Gries frequent items (freq_items_by_group, r9)
# ---------------------------------------------------------------------------


def _mg_truth(rows):
    from collections import Counter

    truth = {}
    for g, v in rows:
        truth.setdefault(g, Counter())[v] += 1
    return truth


def _check_guarantees(res, truth, k):
    for g, counts in truth.items():
        n = sum(counts.values())
        items = {r.item: r.w for r in res if r[0] == g and r.item is not None}
        errs = {r.err for r in res if r[0] == g}
        assert len(errs) == 1, errs
        err = errs.pop()
        assert err * (k + 1) <= n, (g, err, n)
        assert len(items) <= k
        for it, w in items.items():
            assert 0 <= counts[it] - w <= err, (g, it, w, counts[it], err)
        for it, c in counts.items():
            if c > err:
                assert it in items, (g, it, c, err)


def test_freq_items_guarantees_on_skewed_corpus(spark):
    import random

    from scida_spark.functions.sketches import freq_items_by_group

    rng = random.Random(5)
    rows = []
    for g in ["a", "b"]:
        for _ in range(3000):
            v = (
                f"hot{rng.randint(0, 2)}"
                if rng.random() < 0.3
                else f"cold{rng.randint(0, 400)}"
            )
            rows.append((g, v))
    df = spark.createDataFrame(rows, "g string, v string").repartition(7)
    res = freq_items_by_group(df, ["g"], "v", k=16).collect()
    truth = _mg_truth(rows)
    _check_guarantees(res, truth, 16)
    for g in truth:
        items = {r.item for r in res if r[0] == g and r.item is not None}
        assert {"hot0", "hot1", "hot2"} <= items, (g, items)


def test_freq_items_guarantees_hold_across_partitionings(spark):
    """Estimates may differ with merge order; the GUARANTEES may not."""
    import random

    from scida_spark.functions.sketches import freq_items_by_group

    rng = random.Random(9)
    rows = [
        ("g", f"v{int(rng.paretovariate(1.2)) % 200}") for _ in range(4000)
    ]
    truth = _mg_truth(rows)
    for nparts in (1, 3, 13):
        df = spark.createDataFrame(rows, "g string, v string").repartition(
            nparts
        )
        res = freq_items_by_group(df, ["g"], "v", k=8).collect()
        _check_guarantees(res, truth, 8)


def test_freq_items_exact_when_k_covers_domain(spark):
    """Fewer distinct values than k in every batch: the summary is the
    exact count table with err 0."""
    from scida_spark.functions.sketches import freq_items_by_group

    rows = [("g", f"v{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v string").coalesce(1)
    res = freq_items_by_group(df, ["g"], "v", k=16).collect()
    got = {r.item: r.w for r in res if r.item is not None}
    assert got == {"v0": 100, "v1": 100, "v2": 100, "v3": 100}
    assert all(r.err == 0 for r in res)


def test_freq_items_nulls_ignored_and_multi_group_cols(spark):
    from scida_spark.functions.sketches import freq_items_by_group

    rows = [("a", "x", "v1"), ("a", "x", "v1"), ("a", "x", None),
            ("a", "y", "v2"), ("b", "x", "v3")]
    df = spark.createDataFrame(rows, "g1 string, g2 string, v string")
    res = freq_items_by_group(df, ["g1", "g2"], "v", k=4).collect()
    got = {(r.g1, r.g2, r.item): r.w for r in res if r.item is not None}
    assert got == {("a", "x", "v1"): 2, ("a", "y", "v2"): 1,
                   ("b", "x", "v3"): 1}


# ---------------------------------------------------------------------------
# Count-Min sketch (r9)
# ---------------------------------------------------------------------------


def _cms_inputs(spark):
    # skewed synthetic corpus: 'hot' 300x, 'warm' 60x, 200 singletons
    rows = (
        [("g1", "hot")] * 300
        + [("g1", "warm")] * 60
        + [("g1", f"u{i}") for i in range(200)]
        + [("g2", "hot")] * 40
        + [("g2", f"v{i}") for i in range(100)]
    )
    return spark.createDataFrame(rows, "g string, v string")


def test_cms_never_undercounts_and_bounds_overcount(spark):
    df = _cms_inputs(spark).repartition(5)
    counters = SK.cms_table(df, ["g"], "v", depth=4, width=512)
    exact = df.groupBy("g", "v").agg(F.count("*").alias("c"))
    qs = exact.select("g", "v")
    est = SK.cms_point_estimate(counters, qs, ["g"], "v", depth=4, width=512)
    chk = {
        (r["g"], r["item"]): r["est"]
        for r in est.collect()
    }
    n_per = {r["g"]: r["n"] for r in df.groupBy("g").agg(F.count("*").alias("n")).collect()}
    for r in exact.collect():
        e = chk[(r["g"], r["v"])]
        assert e >= r["c"], (r, e)
        assert e - r["c"] <= max(4, 8 * n_per[r["g"]] / 512), (r, e)


def test_cms_merge_is_counter_sum(spark):
    # sketch(A ∪ B) == elementwise-sum of sketch(A), sketch(B):
    # the mergeable-monoid property that makes per-day sketches
    # compose without rescans.
    df = _cms_inputs(spark)
    a = df.filter(F.crc32(F.col("v")) % 2 == 0)
    b = df.filter(F.crc32(F.col("v")) % 2 != 0)
    whole = SK.cms_table(df, ["g"], "v", depth=3, width=128)
    parts = (
        SK.cms_table(a, ["g"], "v", depth=3, width=128)
        .unionAll(SK.cms_table(b, ["g"], "v", depth=3, width=128))
        .groupBy("g", "d", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert whole.exceptAll(parts).count() == 0
    assert parts.exceptAll(whole).count() == 0


def test_cms_deterministic_across_partitionings(spark):
    df = _cms_inputs(spark)
    c1 = SK.cms_table(df.repartition(1), ["g"], "v", depth=4, width=256)
    c7 = SK.cms_table(df.repartition(17), ["g"], "v", depth=4, width=256)
    assert c1.exceptAll(c7).count() == 0 and c7.exceptAll(c1).count() == 0


def test_cms_missing_key_estimates_only_collision_mass(spark):
    # a key never inserted must estimate 0 unless every one of its
    # depth slots collides — with 540 rows over width 4096 x depth 4
    # a zero estimate is overwhelmingly expected and DETERMINISTIC
    # for this fixed corpus (hashing is seed-free xxhash64).
    df = _cms_inputs(spark)
    counters = SK.cms_table(df, ["g"], "v", depth=4, width=4096)
    qs = spark.createDataFrame([("g1", "never-seen-key")], "g string, v string")
    est = SK.cms_point_estimate(counters, qs, ["g"], "v", depth=4, width=4096)
    assert est.collect()[0]["est"] <= 2


def test_freq_items_composes_for_hot_phrase_mining(spark):
    # corpus hot-phrase mining = Misra-Gries over exploded word
    # bigrams: the mergeable heavy-hitter family composes with the
    # text surface with no new machinery (bounded state per group —
    # the 100 TB phrase-mining shape).
    from pyspark.sql import functions as F

    from scida_spark.functions.sketches import freq_items_by_group

    hot = "click here now"
    rows = [(i, hot if i % 3 == 0 else f"unique text {i} body {i*7}")
            for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.split(F.trim(F.col("text")), " ")
    grams = docs.select(
        F.lit("all").alias("g"),
        F.explode(
            F.zip_with(
                F.slice(t, 1, F.size(t) - 1),
                F.slice(t, 2, F.size(t) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    mg = freq_items_by_group(grams, ["g"], "bg", k=8)
    items = {r["item"] for r in mg.filter(F.col("item").isNotNull()).collect()}
    assert "click here" in items and "here now" in items
