"""Domain mixing: integer-exact thresholds, deterministic stratified
hash sampling, target-proportion composition."""

from __future__ import annotations

from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Domain mixing
# --------------------------------------------------------------------------


def test_mix_thresholds_integer_exact():
    from scida_spark.functions.sampling import BUCKET_SPACE, mix_thresholds

    counts = {"a": 1000, "b": 100, "c": 500}
    # weights 1:1:1 → b is the constraint (100/1); a keeps 100/1000,
    # c keeps 100/500 — exact integer floors.
    thr = mix_thresholds(counts, {"a": 1, "b": 1, "c": 1})
    assert thr["b"] == BUCKET_SPACE
    assert thr["a"] == (100 * BUCKET_SPACE) // 1000
    assert thr["c"] == (100 * BUCKET_SPACE) // 500


def test_mix_thresholds_weighted_and_ties():
    from scida_spark.functions.sampling import BUCKET_SPACE, mix_thresholds

    # a: 600/3=200, b: 200/1=200 — exact tie on count/weight; the
    # name tie-break must pick 'a' deterministically.
    thr = mix_thresholds({"a": 600, "b": 200}, {"a": 3, "b": 1})
    assert thr == {"a": BUCKET_SPACE, "b": BUCKET_SPACE}


def test_mix_thresholds_missing_weight_raises():
    import pytest as _pytest

    from scida_spark.functions.sampling import mix_thresholds

    with _pytest.raises(ValueError, match="without a mix weight"):
        mix_thresholds({"a": 10, "b": 10}, {"a": 1})


def test_domain_mix_hits_target_proportions(spark):
    from scida_spark.functions.sampling import domain_mix

    df = spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "web").otherwise("code").alias("domain"),
    )
    # web:16k, code:4k; target 1:1 → code constrains, web thins to 4k.
    out = domain_mix(df, "doc_id", "domain", {"web": 1, "code": 1}, salt="t")
    got = {r[0]: r[1] for r in out.groupBy("domain").count().collect()}
    assert got["code"] == 4000
    # Hash thinning is binomial around the exact threshold: 16k rows at
    # p=0.25 → sd ≈ 55; allow 5 sd.
    assert abs(got["web"] - 4000) < 275


def test_domain_mix_deterministic_and_nested(spark):
    from scida_spark.functions.sampling import domain_mix

    df = spark.range(0, 5_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 < 3, "big").otherwise("small").alias("domain"),
    )
    a = {r[0] for r in domain_mix(df, "doc_id", "domain", {"big": 1, "small": 1}, salt="s").select("doc_id").collect()}
    b = {r[0] for r in domain_mix(df, "doc_id", "domain", {"big": 1, "small": 1}, salt="s").select("doc_id").collect()}
    assert a == b
    # A tighter mix (small upweighted → big thinned harder) at the SAME
    # salt selects a SUBSET of big's rows (nested composition).
    c = {r[0] for r in domain_mix(df, "doc_id", "domain", {"big": 1, "small": 3}, salt="s").filter(F.col("domain") == "big").select("doc_id").collect()}
    assert c <= {x for x in a}


def test_in_mix_column_unknown_stratum_excluded(spark):
    from scida_spark.functions.sampling import BUCKET_SPACE, in_mix_column

    df = spark.createDataFrame(
        [(1, "known"), (2, "unknown")], "doc_id long, domain string"
    )
    out = df.withColumn(
        "m", in_mix_column(F.col("doc_id"), F.col("domain"), {"known": BUCKET_SPACE})
    )
    got = {r.domain: r.m for r in out.collect()}
    assert got == {"known": True, "unknown": False}
