"""Probabilistic record linkage — Fellegi & Sunter (1969), the
standard model for "are these two records the same entity" beyond
single-field string distance.

Pipeline shape (all existing machinery composes in):

  1. **Blocking** generates candidate pairs — any of the engine's
     blockers (prefix-filtered Jaccard, PassJoin segments, MinHash
     bands, SimHash/SRP Hamming buckets) serves; never all-pairs.
  2. :func:`field_agreement` joins both records' fields onto the pair
     and evaluates per-field agreement predicates (exact equality by
     default, any Column comparator — e.g. a levenshtein bound — per
     field).
  3. :func:`fs_score` turns agreement patterns into the log-likelihood
     ratio score: agreeing field f contributes ln(m_f/u_f), a
     disagreeing one ln((1-m_f)/(1-u_f)), where m_f = P(agree | same
     entity) and u_f = P(agree | different entities). Summed in
     SORTED field order (the repo's float-fold rule) the score is
     engine-reproducible; with weights passed as precomputed double
     literals it is bit-exact without any libm dependence.
  4. :func:`fs_classify` applies the two-threshold decision: match /
     possible (clerical review) / non-match.

Parameter estimation: ``m`` is a data-owner prior (how often a true
duplicate preserves the field — OCR noise, nicknames); ``u`` is
estimable from data because random pairs are overwhelmingly
non-matches: :func:`estimate_u` measures field agreement over the
cross-pairs of a deterministic hash sample (md5-ordered smallest-N —
layout-independent, no rand()). Full EM fitting is deliberately out
of scope: on corpora this engine targets, labeled m-priors +
estimated u is the operating regime (EM's latent-class fit needs the
match prevalence to be non-vanishing in the candidate set).

Scale: step 2 is two broadcast-or-shuffle equi-joins of the pair list
against the record table (pairs come from a blocker, so |pairs| <<
|records|²); steps 3-4 are map-only Column arithmetic. u-estimation
collects a fixed-size sample (default 256 rows → ≤32640 local pairs)
once per field config.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def field_agreement(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    fields: dict,
    left_col: str = "id_a",
    right_col: str = "id_b",
) -> DataFrame:
    """Join both sides' fields onto ``pairs`` and evaluate one boolean
    agreement column per field.

    ``fields`` maps field name -> comparator: ``None`` for exact
    equality (null-safe: two NULLs agree — eqNullSafe), or a callable
    ``(left_col, right_col) -> Column`` for fuzzy agreement (e.g.
    ``lambda a, b: F.levenshtein(a, b) <= 2``). Output keeps the pair
    id columns plus ``agree_<field>`` booleans."""
    la = records.select(
        F.col(id_col).alias("__la"),
        *[F.col(f).alias(f"__a_{f}") for f in fields],
    )
    lb = records.select(
        F.col(id_col).alias("__lb"),
        *[F.col(f).alias(f"__b_{f}") for f in fields],
    )
    out = (
        pairs.join(la, F.col(left_col) == F.col("__la"))
        .join(lb, F.col(right_col) == F.col("__lb"))
    )
    for f, cmp_ in fields.items():
        a, b = F.col(f"__a_{f}"), F.col(f"__b_{f}")
        agree = a.eqNullSafe(b) if cmp_ is None else cmp_(a, b)
        out = out.withColumn(f"agree_{f}", F.coalesce(agree, F.lit(False)))
    return out.drop(
        "__la", "__lb", *[c for f in fields for c in (f"__a_{f}", f"__b_{f}")]
    )


def fs_weights(m_u: dict) -> dict:
    """Precompute (agreement_weight, disagreement_weight) double
    literals from {field: (m, u)} — ln(m/u) and ln((1-m)/(1-u))
    evaluated ONCE driver-side, so downstream scoring is pure literal
    addition (bit-exact on any engine, no runtime ln)."""
    out = {}
    for f, (m, u) in m_u.items():
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"field {f!r}: need 0 < u < m < 1 (got m={m}, u={u}) — "
                "agreement must be LIKELIER among matches"
            )
        out[f] = (math.log(m / u), math.log((1.0 - m) / (1.0 - u)))
    return out


def fs_score(
    agreements: DataFrame, m_u: dict, out_col: str = "fs_score"
) -> DataFrame:
    """Log-likelihood-ratio score = sum over fields (sorted order) of
    the precomputed agreement/disagreement weight literals."""
    w = fs_weights(m_u)
    score = F.lit(0.0)
    for f in sorted(w):
        wa, wd = w[f]
        score = score + F.when(F.col(f"agree_{f}"), F.lit(wa)).otherwise(
            F.lit(wd)
        )
    return agreements.withColumn(out_col, score)


def fs_classify(
    scored: DataFrame,
    upper: float,
    lower: float,
    score_col: str = "fs_score",
    out_col: str = "link_class",
) -> DataFrame:
    """Fellegi-Sunter two-threshold decision: score >= upper ->
    'match', <= lower -> 'non_match', else 'possible' (clerical
    review band). Thresholds trade false-match vs false-non-match
    rates; upper >= lower is required."""
    if upper < lower:
        raise ValueError("upper threshold must be >= lower")
    return scored.withColumn(
        out_col,
        F.when(F.col(score_col) >= float(upper), F.lit("match"))
        .when(F.col(score_col) <= float(lower), F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


def estimate_u(
    records: DataFrame,
    id_col: str,
    fields: dict,
    sample_n: int = 256,
    salt: str = "fsu",
) -> dict:
    """u_f = P(field f agrees | different entities), estimated from
    the C(n,2) cross-pairs of a DETERMINISTIC sample (smallest-n by
    md5(id||salt) — layout/run-independent): random pairs are
    non-matches with overwhelming probability, so their agreement
    rate estimates u. Laplace-smoothed so a never-agreeing field
    yields a small positive u instead of a degenerate 0. Returns
    {field: u_hat}; pair with owner-supplied m priors for
    :func:`fs_weights`."""
    from scida_spark.functions.sampling import hash_bucket

    rows = (
        records.select(
            id_col, *fields, hash_bucket(F.col(id_col), salt).alias("__hb")
        )
        .orderBy("__hb", id_col)
        .limit(int(sample_n))
        .collect()
    )
    n = len(rows)
    n_pairs = n * (n - 1) // 2
    out = {}
    for f, cmp_ in fields.items():
        if cmp_ is not None:
            raise ValueError(
                "estimate_u supports exact-equality fields only; supply u "
                f"for comparator field {f!r} directly"
            )
        agree = 0
        for i in range(n):
            for j in range(i + 1, n):
                if rows[i][f] == rows[j][f]:
                    agree += 1
        out[f] = (agree + 1.0) / (n_pairs + 2.0)
    return out
