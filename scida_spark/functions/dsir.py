"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus, by per-document importance
log-weights  sum_f [ log p_target(f) - log p_raw(f) ]  over hashed
unigram+bigram features. The standard pretraining-data curation step
("make CommonCrawl look like Wikipedia") — the learned-classifier-free
complement of functions/quality_classifier.py.

Engine-portability rules (the repo's cross-oracle conventions):

* Feature hashing is the md5 hash-bucket (functions/sampling.py) mod a
  power-of-two vocab — a pure function of the n-gram text + salt, so
  any engine reproduces the features bit-for-bit (no rand(), no
  engine-specific hash).
* Per-document scores FOLD IN SORTED FEATURE ORDER (array_sort then
  aggregate), because float addition does not commute across orders —
  the same rule that makes BM25 hash-match (functions/retrieval.py).
  Equal buckets contribute equal addends, so ties cost nothing.
* Smoothed log-probabilities use add-one smoothing over the hashed
  vocab: log((c_f + 1) / (N + V)). All inputs are integer-valued
  doubles, so libm ``ln`` agrees bit-for-bit across engines.

Scale: ONE explode of the corpus into feature instances feeds BOTH
count tables (target side is a filter, not a second scan) with
map-side combine into at most V buckets each; the V-row (V = 2^13
default) log-ratio table broadcasts back onto the feature stream —
the corpus-sized side never shuffles on anything but the bounded
bucket key. Selection quotas reuse the deterministic (score, id)
window machinery; for a GLOBAL quota over an unbounded corpus, route
the rank through operators/prefix_sum.py::grouped_ntile instead of a
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scida_spark.functions.sampling import hash_bucket
from scida_spark.functions.text import tokens

DSIR_VOCAB = 1 << 13


def hashed_ngram_features(
    text: Column, vocab: int = DSIR_VOCAB, salt: str = "dsir"
) -> Column:
    """Array of hashed feature buckets for ``text``: word unigrams +
    adjacent-word bigrams, each md5-bucketed into [0, vocab). Pure
    Column expressions (split / transform / concat) — zero UDF."""
    t = tokens(text)
    unis = t
    bis = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    # guard 1-token docs: sequence(1, 0) yields [1, 0] (a DESCENDING
    # range), not an empty array — slice bigrams away explicitly
    bis = F.when(F.size(t) >= 2, bis).otherwise(F.array().cast("array<string>"))
    grams = F.concat(unis, bis)
    return F.transform(grams, lambda g: (hash_bucket(g, salt) % vocab).cast("int"))


def _bucket_counts(feats: DataFrame, flag: Column | None) -> DataFrame:
    rows = feats if flag is None else feats.filter(flag)
    return rows.groupBy("bucket").agg(F.count("*").alias("c"))


def dsir_log_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    vocab: int = DSIR_VOCAB,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR importance log-weight: ``(id, score)`` where
    score = sum over the doc's feature instances of
    log p_target(bucket) - log p_raw(bucket), add-one smoothed over
    the hashed vocab. ``is_target`` marks the rows defining the target
    distribution (e.g. ``lang == 'en'``); the raw distribution is the
    whole input. Deterministic: hashing, counts, and the sorted-order
    float fold are all pure functions of the data."""
    feats = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(hashed_ngram_features(F.col(text_col), vocab, salt)).alias(
            "bucket"
        ),
        is_target.alias("_tgt"),
    )
    tc = _bucket_counts(feats, F.col("_tgt")).withColumnRenamed("c", "ct")
    rc = _bucket_counts(feats, None).withColumnRenamed("c", "cr")
    # V-row log-ratio table: lr(b) = ln(ct+1) - ln(nt+V) - ln(cr+1) + ln(nr+V).
    # The totals nt/nr are SUMS of the bucket counts, so they come from
    # an unpartitioned window over the ≤V-row table (bounded by vocab,
    # not data — the repo's small-side-only window rule), not a second
    # corpus scan or a 1-row cross join (which would plan as
    # BroadcastNestedLoopJoin and trip the no-cartesian pins).
    wall = W.partitionBy()
    ctv = F.coalesce(F.col("ct"), F.lit(0))
    lr = (
        rc.join(tc, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(ctv + 1.0)
                - F.log(F.sum(ctv).over(wall) + float(vocab))
                - F.log(F.col("cr") + 1.0)
                + F.log(F.sum("cr").over(wall) + float(vocab))
            ).alias("lr"),
        )
    )
    # fold per doc in sorted-(bucket, lr) order — order-pinned float sum
    per_doc = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("bucket", "lr"))).alias("_fs"))
        .select(
            F.col("_id").alias(id_col),
            F.aggregate(
                "_fs", F.lit(0.0), lambda acc, x: acc + x["lr"]
            ).alias("score"),
        )
    )
    return per_doc


def dsir_select_stratified(
    scored: DataFrame,
    id_col: str,
    stratum_col: str,
    num: int,
    den: int,
    score_col: str = "score",
    out_col: str = "in_dsir",
) -> DataFrame:
    """Flag the top ceil(count·num/den) documents of every stratum by
    (score desc, id asc) — the deterministic exact-quota selection
    (same contract as sampling.stratified_exact_sample, ranked by the
    importance weight instead of a hash). Per-stratum windows bound
    task size by the stratum; a single global quota should rank via
    grouped_ntile's two-level plan instead."""
    w = W.partitionBy(stratum_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    cnt = W.partitionBy(stratum_col)
    return (
        scored.withColumn("_rn", F.row_number().over(w).cast("long"))
        .withColumn("_n", F.count("*").over(cnt))
        # 64-bit integer ceil-division (the split_thresholds lesson)
        .withColumn(
            out_col,
            F.expr(f"_rn <= ((_n * {int(num)} + {int(den) - 1}) DIV {int(den)})"),
        )
        .drop("_rn", "_n")
    )
