"""Adversarial stress for exact_substring_cut (r15, closes r14 VERDICT
next #6): long documents with heavy overlap — near-copies of one long
base doc, so every pair shares giant matches and thousands of anchors
land inside the same runs. Measures wall seconds and prints the
candidate/anchor counts that bound the kernel.

Usage: python tools/esubcut_stress_sweep.py [n_copies] [doc_len]
"""
from __future__ import annotations

import random
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from scida_spark.functions.dedup import winnow_anchors  # noqa: E402
from scida_spark.functions.spans import exact_substring_cut  # noqa: E402


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("esubcut-stress")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    random.seed(271)
    alph = "abcdefghijklmnop "
    base = "".join(random.choice(alph) for _ in range(doc_len))
    rows = []
    for i in range(n_copies):
        # each copy edits ~10 scattered positions: the pair diagonals
        # fracture into long runs, every run >= L, anchors dense in all
        t = list(base)
        ed = random.Random(i)
        for _ in range(10):
            t[ed.randrange(doc_len)] = "Z"
        rows.append((i, "".join(t)))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(
        32
    ).localCheckpoint()

    window = 60 - 16 + 1
    na = winnow_anchors(df, "doc_id", "text", k=16, window=window).count()
    print(
        f"{n_copies} near-copies of a {doc_len}-char doc: {na} anchor "
        f"occurrences ({na // n_copies}/doc), "
        f"~{n_copies * (n_copies - 1) // 2} overlapping pairs",
        flush=True,
    )
    t0 = time.time()
    out = exact_substring_cut(df, "doc_id", "text", min_len=60, k=16)
    stats = out.agg(
        F.count("*").alias("n"), F.sum("n_removed").alias("removed")
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"exact_substring_cut: {dt:.1f} s  docs={stats['n']}  "
        f"chars_removed={stats['removed']}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
