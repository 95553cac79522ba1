"""Table maintenance: small-file compaction.

Streaming ingest (streaming/ingest.py) appends one directory per
micro-batch; at high trigger rates that accumulates thousands of small
files, and at 100 TB small files are a scan killer (per-file open cost,
tiny row groups defeat min/max skipping, listing dominates planning).
Compaction rewrites a directory to ~target-sized files; run it on cold
batch partitions (e.g. behind the watermark), then atomically swap.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
    n = 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``src_dir`` into ``dst_dir`` with ~``target_bytes``
    output files. File count comes from the MEASURED source bytes
    (footer-free directory walk, no data read); optional ``sort_cols``
    re-clusters rows during the rewrite so min/max row-group skipping
    works on the compacted output (pair with the Z-order writer in
    operators/spatial.py for multi-column locality). Returns a report
    dict; the caller owns the swap (rename/retarget) so readers never
    see a half-written directory."""
    n_before, total = dir_stats(src_dir)
    n_out = max(1, -(-total // target_bytes))
    df = spark.read.parquet(src_dir)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    n_after, total_after = dir_stats(dst_dir)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": total,
        "bytes_after": total_after,
        "target_bytes": target_bytes,
    }
