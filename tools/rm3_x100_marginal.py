"""Measure the RM3 pass-2 marginal at x100 with and without the r14
expansion-term df ceiling (r13 VERDICT next #2).

The expansion weights are an ingest/cache-time artifact (memoized per
corpus in the sim_topk slot), so the per-call serving cost is exactly
the weighted pass-2 scan over the expanded terms' postings. This
script times that marginal: rm3_topk with PRECOMPUTED wterms/cf —
(a) no ceiling, (b) max_df=0.5 — over the x100 documents table.

Usage: python tools/rm3_x100_marginal.py [x100_dir] [passes]
Emits one JSON line per (variant, pass) + a summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    x100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scida_spark_sfx100"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from scida_spark.functions import text as TX
    from scida_spark.functions.retrieval import rm3_expand_terms, rm3_topk
    from scida_spark.queries_pipeline import (
        _BM25_QUERIES,
        _QL_MU,
        _RM3_ALPHA,
        _RM3_FB,
        _RM3_M,
        _RM3_MAXDF,
    )
    from scida_spark.session import get_spark

    spark = get_spark("rm3-x100")
    docs = spark.read.parquet(os.path.join(x100, "documents.parquet")).select(
        "doc_id", "text"
    )
    st = (
        docs.select(TX.token_count(F.col("text")).alias("_dl"))
        .agg(F.count("*").alias("n"), F.sum("_dl").alias("tot"))
        .first()
    )
    cs = (int(st["n"]), int(st["tot"] or 0))
    print(json.dumps({"corpus": x100, "n_docs": cs[0], "total_tokens": cs[1]}))

    variants = {}
    for name, maxdf in (("no_ceiling", None), (f"maxdf_{_RM3_MAXDF}", _RM3_MAXDF)):
        t0 = time.perf_counter()
        w = rm3_expand_terms(
            docs, _BM25_QUERIES, k_fb=_RM3_FB, m=_RM3_M, alpha=_RM3_ALPHA,
            mu=_QL_MU, corpus_stats=cs, max_df=maxdf,
        )
        terms = sorted({t for _, t, _ in w})
        cf = {
            r["tok"]: int(r["cf"])
            for r in docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
            .filter(F.col("tok").isin(terms))
            .groupBy("tok")
            .agg(F.count("*").alias("cf"))
            .collect()
        }
        expand_s = time.perf_counter() - t0
        variants[name] = (w, cf)
        print(json.dumps({
            "variant": name, "expand_sec": round(expand_s, 2),
            "n_weighted_terms": len(terms), "terms": terms,
        }))

    for p in range(passes):
        for name, (w, cf) in variants.items():
            t0 = time.perf_counter()
            n = rm3_topk(
                docs, _BM25_QUERIES, k=10, mu=_QL_MU,
                corpus_stats=cs, wterms=w, cf=cf,
            ).count()
            print(json.dumps({
                "variant": name, "pass": p,
                "pass2_marginal_sec": round(time.perf_counter() - t0, 2),
                "rows": n,
            }))
    spark.stop()


if __name__ == "__main__":
    main()
