"""Long-document winnowing sweep (r15 verdict item #1): measure the
codegen O(n·window) winnow vs the linear monotonic-queue Arrow winnow
as document length grows, and verify the auto-switch picks the flat
path. Writes one line per (doc_len, engine) with wall seconds.

Usage: python tools/winnow_longdoc_sweep.py [n_docs]
"""
from __future__ import annotations

import random
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from scida_spark.functions.dedup import winnow_anchors  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("winnow-longdoc-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    random.seed(97)
    alph = "abcdefghijklmnop qrstuvwxyz"
    for doc_len in (10_000, 50_000, 100_000, 200_000, 500_000):
        texts = [
            (i, "".join(random.choice(alph) for _ in range(doc_len)))
            for i in range(n_docs)
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string").repartition(32)
        df = df.localCheckpoint()  # exclude generation from the timing
        for engine in ("codegen", "arrow"):
            if engine == "codegen" and doc_len > 100_000 and "--full" not in sys.argv:
                print(
                    f"doc_len={doc_len:>7} engine={engine:>7}  SKIPPED "
                    "(quadratic path; pass --full to run)",
                    flush=True,
                )
                continue
            t0 = time.time()
            n = winnow_anchors(
                df, "doc_id", "text", k=16, window=45, engine=engine
            ).count()
            dt = time.time() - t0
            print(
                f"doc_len={doc_len:>7} engine={engine:>7}  {dt:7.2f} s  "
                f"anchors={n}  ({n_docs} docs)",
                flush=True,
            )
        # auto must route these (all >= 16384 except the 10k row) sanely
        t0 = time.time()
        n = winnow_anchors(df, "doc_id", "text", k=16, window=45).count()
        print(
            f"doc_len={doc_len:>7} engine=   auto  {time.time() - t0:7.2f} s  "
            f"anchors={n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
