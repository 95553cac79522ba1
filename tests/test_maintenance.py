"""Compaction: many small batch files → few target-sized files,
data identical, optional sort-clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from scida_spark.operators.maintenance import compact_parquet, dir_stats


def _fragmented(spark, path, n_batches=24):
    for b in range(n_batches):
        spark.range(b * 1000, (b + 1) * 1000).select(
            F.col("id"), (F.col("id") % 97).alias("k"), (F.col("id") * 0.5).alias("v")
        ).coalesce(2).write.parquet(f"{path}/batch_id={b}")


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    _fragmented(spark, src)
    n_before, total = dir_stats(src)
    assert n_before >= 48
    report = compact_parquet(spark, src, dst, target_bytes=total)
    assert report["files_before"] == n_before
    assert report["files_after"] == 1
    a = spark.read.parquet(src).select("id", "k", "v")
    b = spark.read.parquet(dst).select("id", "k", "v")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compaction_target_splits_output(spark, tmp_path):
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "compact2")
    _fragmented(spark, src)
    _n, total = dir_stats(src)
    report = compact_parquet(spark, src, dst, target_bytes=max(1, total // 4))
    assert 3 <= report["files_after"] <= 6


def test_compaction_sorted_clusters_rows(spark, tmp_path):
    src = str(tmp_path / "frag3")
    dst = str(tmp_path / "compact3")
    _fragmented(spark, src, n_batches=8)
    _n, total = dir_stats(src)
    compact_parquet(spark, src, dst, target_bytes=max(1, total // 2),
                    sort_cols=["k", "id"])
    # Range partitioning on k: per-file k-ranges must not overlap
    # (that's what makes min/max skipping effective post-compaction).
    import pyarrow.parquet as pq
    import os

    ranges = []
    for root, _d, files in os.walk(dst):
        for f in files:
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f), columns=["k"])
                ks = t["k"].to_pylist()
                if ks:
                    ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
