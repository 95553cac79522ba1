"""x100 sweep for exact-substring dedup (r14): show candidate counts
stay ANCHOR-bounded at a 500k-doc corpus and record the stage walls.

The x100 set replicates documents verbatim (each text a 100-clique),
so per the operator's documented rule exact cliques are collapsed
FIRST (signature relations are pure text functions — the r8
dedup_signature_pairs convention) and the pair machinery runs over
representatives.

Usage: python tools/esub_x100_sweep.py [x100_dir]
Emits JSON lines: corpus stats, anchor density, candidate count,
verified pair count, stage walls.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    x100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scida_spark_sfx100"

    from pyspark.sql import functions as F

    from scida_spark.functions.dedup import (
        exact_clique_map,
        exact_substring_pairs,
        winnow_anchors,
    )
    from scida_spark.session import get_spark

    spark = get_spark("esub-x100")
    docs = spark.read.parquet(os.path.join(x100, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    t0 = time.perf_counter()
    clique = exact_clique_map(docs, "doc_id", "text").localCheckpoint(
        eager=True
    )
    reps = docs.join(
        clique.filter(F.col("doc") == F.col("rep")).select(
            F.col("doc").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    ).localCheckpoint(eager=True)
    n_reps = reps.count()
    t_clique = time.perf_counter() - t0
    print(json.dumps({
        "n_docs": n_docs, "n_reps": n_reps,
        "clique_collapse_sec": round(t_clique, 2),
    }))

    k, L = 16, 60
    w = L - k + 1
    t0 = time.perf_counter()
    anchors = winnow_anchors(reps, "doc_id", "text", k=k, window=w)
    n_anchors = anchors.count()
    t_anchor = time.perf_counter() - t0
    n_grams = reps.select(
        F.sum(F.greatest(F.length("text") - (k - 1), F.lit(0)))
    ).first()[0]
    print(json.dumps({
        "n_grams": int(n_grams), "n_anchors": n_anchors,
        "anchor_density": round(n_anchors / max(int(n_grams), 1), 4),
        "theory_2_over_w_plus_1": round(2.0 / (w + 1), 4),
        "anchor_sec": round(t_anchor, 2),
    }))

    t0 = time.perf_counter()
    a = anchors.select(F.col("doc_id").alias("doc_a"), "h", F.col("pos").alias("pos_a"))
    b = anchors.select(F.col("doc_id").alias("doc_b"), "h", F.col("pos").alias("pos_b"))
    n_cand = (
        a.join(b, "h").filter(F.col("doc_a") < F.col("doc_b")).count()
    )
    t_cand = time.perf_counter() - t0
    print(json.dumps({
        "n_candidate_anchor_pairs": n_cand,
        "candidate_join_sec": round(t_cand, 2),
    }))

    t0 = time.perf_counter()
    n_pairs = exact_substring_pairs(reps, "doc_id", "text", min_len=L, k=k).count()
    t_full = time.perf_counter() - t0
    print(json.dumps({
        "n_verified_pairs": n_pairs,
        "full_operator_sec": round(t_full, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
