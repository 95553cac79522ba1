"""Exact ranking-quality metrics for scored corpora — the evaluation
tail of the train/score pipeline (quality classifiers, DSIR weights,
FS linkage scores): did the score actually order positives above
negatives?

AUC is computed EXACTLY via the Mann-Whitney rank-sum identity
AUC = (sum of positive midranks - n_pos(n_pos+1)/2) / (n_pos * n_neg),
with tie handling by MIDRANKS (ties between a positive and a negative
count 1/2, the standard correction). The scale shape is the
grouped_median_element lesson: aggregate to one row per DISTINCT score
value first (counts + positive counts), then run the rank window over
THAT table — a billion-row corpus with a bounded score vocabulary
costs its distinct-value count, and no task ever sorts raw rows.
Midranks derive from integer cumulative counts ((2*cum - n + 1)/2 —
halves are exact in binary), so the result is bit-identical across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols=(),
) -> DataFrame:
    """Exact tie-corrected AUC of ``score_col`` for boolean
    ``label_col``, optionally per group. Returns (``group_cols``...,
    auc double, n_pos long, n_neg long); groups with no positives or
    no negatives emit NULL auc (undefined, surfaced not hidden).

    ``score_col`` must be non-NULL (engines disagree where NULLs
    sort — the grouped_median_element precondition); filter upstream.
    """
    group_cols = list(group_cols)
    cnt = df.groupBy(*group_cols, score_col).agg(
        F.count("*").alias("__n"),
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("__np"),
    )
    w_cum = (
        W.partitionBy(*group_cols).orderBy(score_col)
        if group_cols
        else W.orderBy(score_col)
    )
    cum = cnt.select(
        *group_cols,
        "__n",
        "__np",
        F.sum("__n").over(w_cum).alias("__cum"),
    )
    # DOUBLED midrank of every row sharing this score value:
    # 2 * (min_rank + max_rank)/2 = 2*cum - n + 1 — an INTEGER, so the
    # rank sum stays exact integer arithmetic (DECIMAL against 100 TB
    # overflow) and is order-independent across partitions; the ONLY
    # float operation is the final single division — bit-identical on
    # any engine/partitioning (a double rank-sum would accumulate in
    # partial-aggregation order).
    mid2 = (2 * F.col("__cum") - F.col("__n") + 1).cast("decimal(38,0)")
    agg = cum.groupBy(*group_cols).agg(
        F.sum(F.col("__np").cast("decimal(38,0)") * mid2).alias("__rsum2"),
        F.sum("__np").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).alias("n_neg"),
    )
    # AUC = (rsum2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg), rsum2 doubled
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (
            F.col("__rsum2")
            - F.col("n_pos").cast("decimal(38,0)") * (F.col("n_pos") + 1)
        ).cast("double")
        / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
    )
    return agg.select(
        *group_cols, auc.alias("auc"), "n_pos", "n_neg"
    )


def confusion_at_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float,
    group_cols=(),
) -> DataFrame:
    """(tp, fp, fn, tn) plus derived precision/recall/f1 at
    ``score >= threshold`` — one aggregation pass, mergeable counts.
    Zero-denominator metrics emit NULL (undefined, not 0)."""
    group_cols = list(group_cols)
    pred = F.col(score_col) >= float(threshold)
    lab = F.col(label_col)
    # coalesce: an empty (ungrouped) input still yields one row, and
    # its SUMs are NULL — report zero counts with NULL derived metrics
    agg = df.groupBy(*group_cols).agg(
        F.coalesce(F.sum(F.when(pred & lab, 1).otherwise(0)), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(F.when(pred & ~lab, 1).otherwise(0)), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(F.when(~pred & lab, 1).otherwise(0)), F.lit(0)).alias("fn"),
        F.coalesce(F.sum(F.when(~pred & ~lab, 1).otherwise(0)), F.lit(0)).alias("tn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    )
    return agg.select(
        *group_cols,
        "tp",
        "fp",
        "fn",
        "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )
