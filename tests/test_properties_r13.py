"""Randomized/invariant contracts for the r13 session-2 operators:

* MMR greedy == the pure-Python reference on randomized candidate
  batches (sizes 1..12, duplicate vectors, rel ties) — one Spark call
  scores every group, so the test stays fast while covering breadth.
* Weighted QL with uniform weights is BITWISE equal to plain QL — the
  decomposition identity (W_q generalizes nq) holds exactly, not just
  to tolerance.
* ranking_metrics swap-monotonicity: promoting a relevant doc one rank
  never decreases MRR/nDCG/AP and never changes recall.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _cos(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def _mmr_ref(pool, k, lam):
    sel, out = [], []
    remaining = dict(pool)
    for step in range(1, k + 1):
        if not remaining:
            break
        best = None
        for cid in sorted(remaining):
            rel, v = remaining[cid]
            pen = (
                max(_cos(v, pool[s][1]) for s in sel) if sel else 0.0
            )
            score = lam * rel - (1.0 - lam) * pen
            if best is None or score > best[1]:
                best = (cid, score)
        sel.append(best[0])
        out.append((step, best[0]))
        del remaining[best[0]]
    return out


def test_mmr_matches_reference_on_random_batches(spark):
    from scida_spark.functions.similarity import mmr_rerank

    rng = np.random.RandomState(77)
    rows, pools = [], {}
    for q in range(25):
        n = rng.randint(1, 13)
        pool = {}
        base = rng.normal(0, 1, (n, 6))
        for i in range(n):
            cid = int(100 * q + i)
            vec = base[i]
            if i > 0 and rng.rand() < 0.25:
                vec = base[i - 1]  # planted duplicate vector
            rel = float(np.round(rng.rand(), 2))  # coarse: forces ties
            pool[cid] = (rel, [float(x) for x in vec])
            rows.append((q, cid, rel, [float(x) for x in vec]))
        pools[q] = pool
    cands = spark.createDataFrame(
        rows, "query_id long, cand_id long, rel double, cvec array<double>"
    )
    got = {}
    for r in mmr_rerank(cands, k=5, lam=0.65).collect():
        got.setdefault(r["query_id"], []).append((r["step"], r["cand_id"]))
    for q, pool in pools.items():
        assert sorted(got[q]) == _mmr_ref(pool, 5, 0.65), f"query {q}"


def test_weighted_ql_uniform_weights_bitwise_equals_ql(spark):
    from scida_spark.functions.retrieval import (
        ql_topk_from_index,
        query_likelihood_topk,
        weighted_ql_topk_from_index,
    )
    from scida_spark.functions import text as TX

    docs = spark.createDataFrame(
        [
            (0, "spark shuffles the data the fast way"),
            (1, "the quick brown fox jumps"),
            (2, "spark spark streaming state"),
            (3, "unrelated content entirely here"),
        ],
        "doc_id long, text string",
    )
    queries = [(0, "spark the"), (1, "quick fox")]
    plain = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in query_likelihood_topk(docs, queries, k=10, mu=40.0).collect()
    }
    postings = (
        docs.select(
            F.col("doc_id"), F.explode(TX.tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dl = docs.select("doc_id", TX.token_count(F.col("text")).alias("_dl"))
    st = dl.agg(F.count("*").alias("n"), F.sum("_dl").alias("t")).first()
    cs = (int(st["n"]), int(st["t"]))
    wterms = [
        (q, t, 1.0) for q, qt in queries for t in sorted(set(qt.split()))
    ]
    weighted = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in weighted_ql_topk_from_index(
            spark, postings, dl, cs, wterms, k=10, mu=40.0
        ).collect()
    }
    assert weighted.keys() == plain.keys() and len(plain) > 0
    for key in plain:
        assert weighted[key] == plain[key], key  # BITWISE, not approx


def test_ranking_metrics_swap_monotonicity(spark):
    from scida_spark.functions.metrics import ranking_metrics

    qrels = spark.createDataFrame(
        [(0, 13, 1.0), (0, 11, 1.0)], "query_id long, doc_id long, rel double"
    )

    def run_of(order):
        return spark.createDataFrame(
            [(0, d, i + 1) for i, d in enumerate(order)],
            "query_id long, doc_id long, rank int",
        )

    base = [10, 11, 12, 13]
    [m0] = ranking_metrics(run_of(base), qrels, k=4).collect()
    # promote the rank-4 relevant doc one position at a time
    for order in ([10, 11, 13, 12], [10, 13, 11, 12], [13, 10, 11, 12]):
        [m1] = ranking_metrics(run_of(order), qrels, k=4).collect()
        assert m1["recall"] == m0["recall"] == 1.0
        assert m1["mrr"] >= m0["mrr"]
        assert m1["ndcg"] >= m0["ndcg"]
        assert m1["ap"] >= m0["ap"]
        m0 = m1
    assert m0["mrr"] == 1.0
    # the IDEAL ordering (both relevant docs on top) scores ndcg == 1
    [mi] = ranking_metrics(run_of([11, 13, 10, 12]), qrels, k=4).collect()
    assert mi["ndcg"] == pytest.approx(1.0) and mi["ap"] == pytest.approx(1.0)
