"""Fuzzy string matching: edit-distance pairs with sound q-gram
count-filter blocking (entity resolution / noisy-duplicate detection).

The q-gram lemma (Gravano+ 2001, "Approximate String Joins in a
Database (Almost) for Free"): if ``edit_distance(a, b) <= d`` then the
positional-free q-gram multisets of a and b share at least
``max(|a|,|b|) - q + 1 - d*q`` grams — each edit destroys at most ``q``
grams. So candidates come from an inverted-index join on q-grams with a
COUNT filter (the same counted-intersection shape as the n-gram Jaccard
baseline in functions/dedup.py — one equi-join + one groupBy on the
pair key, never all-pairs), plus the length filter ``||a|-|b|| <= d``.
Strings too short for the lemma to prune (the shared-gram bound
non-positive) fall back to a length-window equi-join — a tiny, bounded
subset. Every candidate is verified with the built-in JVM
``levenshtein`` (exact), so results carry true distances.

At 100 TB: both candidate paths are bucketed equi-joins; the count
filter runs map-side-combinable; hot q-grams (stop-grams) can be
df-capped by the caller the same way the Jaccard index caps shingles —
soundness then degrades exactly like dedup's documented contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _qgram_table(df: DataFrame, id_col: str, text_col: str, q: int) -> DataFrame:
    """(id, len, g, pos) exploded q-gram rows. Built with posexplode of
    a substring transform — all JVM expressions."""
    n = F.length(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - q, F.lit(0))),
        lambda i: F.col(text_col).substr(i + 1, F.lit(q)),
    )
    return df.select(
        F.col(id_col).alias("id"), n.alias("len"), F.explode(grams).alias("g")
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    q: int = 2,
) -> DataFrame:
    """All (id_a, id_b, distance) pairs with Levenshtein distance
    ``<= max_distance`` (id_a < id_b), via sound blocking + exact
    verify. Complete: the q-gram count path covers every pair where the
    lemma's bound is positive; shorter strings route through the
    length-window path."""
    d = max_distance
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        F.length(text_col).alias("len"),
    ).localCheckpoint(eager=True)
    # Lemma bound: shared >= max(la, lb) - q + 1 - d*q must be > 0 to
    # prune; with ||a|-|b||<=d, max(la,lb) <= min(la,lb)+d, so strings
    # with len > short_cut ALWAYS have a positive bound against any
    # eligible partner; len <= short_cut strings may not.
    short_cut = q - 1 + d * q + d  # max(la,lb) <= len+d must exceed q-1+d*q
    long_side = base.filter(F.col("len") > short_cut)
    short_side = base.filter(F.col("len") <= short_cut)

    # --- q-gram count candidates among long strings -------------------
    g = _qgram_table(
        long_side.select(F.col("id").alias(id_col), F.col("t").alias(text_col)),
        id_col, text_col, q,
    )
    a = g.select(F.col("id").alias("id_a"), F.col("len").alias("la"), "g")
    b = g.select(F.col("id").alias("id_b"), F.col("len").alias("lb"), "g")
    cand_long = (
        a.join(b, "g")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= d)
        )
        .groupBy("id_a", "id_b", "la", "lb")
        .agg(F.count("*").alias("shared"))
        .filter(
            F.col("shared")
            >= F.greatest("la", "lb") - F.lit(q - 1) - F.lit(d * q)
        )
        .select("id_a", "id_b")
    )
    # --- short strings: length-window equi-join -----------------------
    # Every short string pairs with strings (short OR long) whose
    # length is within ±d: emit join keys len..len+d on one side.
    sk = short_side.select(
        F.col("id").alias("id_a"),
        F.explode(
            F.sequence(F.col("len"), F.col("len") + d)
        ).alias("lkey"),
    )
    other = base.select(F.col("id").alias("id_b"), F.col("len").alias("lkey"))
    cand_short = (
        sk.join(other, "lkey")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    # The ±d window above only looks UPWARD from the short string
    # (len..len+d); downward partners (lb < la) are short strings too
    # (lb <= la <= short_cut) and appear with roles swapped, so the
    # least/greatest normalization already covers them.
    cands = cand_long.unionAll(cand_short).distinct()
    ta = base.select(F.col("id").alias("id_a"), F.col("t").alias("ta"))
    tb = base.select(F.col("id").alias("id_b"), F.col("t").alias("tb"))
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("distance", F.levenshtein("ta", "tb"))
        .filter(F.col("distance") <= d)
        .select("id_a", "id_b", "distance")
    )
