"""Training-shard export: the last mile of a corpus pipeline.

Loaders for large-model training consume a directory of roughly
equal-sized shards in a DETERMINISTIC pseudo-random document order
(so a run can be resumed / re-sharded reproducibly, and any shard
prefix is an unbiased corpus sample), plus a manifest recording what
each shard holds — the contract dataset cards and ingest audits check.

Design for 100 TB:

* Global pseudo-random order = sort by ``md5(id || salt)`` — a pure
  function of the row id, so the order (and therefore every shard's
  membership) is reproducible across runs, engines, cluster sizes,
  and input layouts. No ``rand()`` anywhere (the sampling.py rule).
* Shard assignment = EXPLICIT equal-width slices of the hash key
  space: ``shard = floor(prefix32(key) * n_shards / 2**32)`` — a pure
  function of (id, salt, n_shards), computed per row with integer
  arithmetic. Deliberately NOT ``repartitionByRange``, whose range
  boundaries come from sampling the input's partition layout and so
  can shift with parallelism; here the cut points themselves are
  deterministic, making shard membership bit-reproducible. The
  physical shuffle is ONE hash exchange on the shard id; a uniform
  hash key makes the equal-width slices balanced to within sampling
  error. Rows-per-shard is a target, not a quota — the manifest
  records actuals (an exact quota would cost a second full shuffle
  for no loader-visible benefit).
* The manifest is computed by RE-READING the written files (one extra
  scan of the export, grouped by ``input_file_name``): it attests what
  is actually on disk, not what the writer intended — the integrity
  property an audit needs. Per-shard content hash is an
  order-invariant sum of per-row 56-bit md5 prefixes, so any SQL
  engine can re-derive and verify it shard-by-shard.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 56-bit per-row fingerprint; shard hashes SUM these in DECIMAL(38,0)
# (exact, never overflows — a 2^56 fingerprint summed over even 10^18
# rows stays under 38 digits; a bare int64 sum overflows at ~128 rows
# per shard under ANSI mode).
_FP_HEX_DIGITS = 14


def shard_key(id_col: str, salt: str = "") -> F.Column:
    """Deterministic 64-bit-ordered shuffle key: first 16 md5 hex
    digits of ``id || salt``. Hex-string ordering equals numeric
    ordering here (fixed width, lowercase), so the column works both
    as a range-partition key and as an ORDER BY in any SQL engine."""
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))


def shard_id(id_col: str, n_shards: int, salt: str = "") -> F.Column:
    """Deterministic shard index: equal-width slices of the 32-bit
    prefix of the md5 key space — ``floor(prefix * n_shards / 2**32)``
    via exact long arithmetic (prefix < 2**32, n_shards < 2**31, so
    the product never overflows). Monotone in the full hex key, so
    shards concatenated in index order yield the globally hash-sorted
    corpus; any SQL engine can recompute the same assignment."""
    prefix = F.conv(F.substring(shard_key(id_col, salt), 1, 8), 16, 10).cast(
        "long"
    )
    return F.shiftright(prefix * F.lit(int(n_shards)), 32).cast("int")


def row_fingerprint(cols: list[str]) -> F.Column:
    """Order-invariant per-row content fingerprint: 56-bit integer
    from md5 over the concatenated column values (null-safe: NULL
    encodes as the literal ``\\N``, distinct from the string 'null')."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in sorted(cols)
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, _FP_HEX_DIGITS), 16, 10
    ).cast("long")


def export_training_shards(
    df: DataFrame,
    id_col: str,
    dst_dir: str,
    rows_per_shard: int,
    salt: str = "",
) -> dict:
    """Write ``df`` to ``dst_dir`` as hash-ordered parquet shards and
    a ``_manifest.json`` verified against the files on disk (the
    underscore prefix keeps it invisible to Spark's file listing,
    like ``_SUCCESS``).

    Returns the manifest dict: global totals plus one entry per shard
    file with ``n_rows`` and ``content_hash`` (sum of row
    fingerprints). Reproducible end-to-end: same input + salt +
    rows_per_shard → same shard membership (explicit key-space cut
    points, not sampled range boundaries) and same hashes, regardless
    of input partitioning or cluster size.
    """
    n_total = df.count()
    n_shards = max(1, -(-n_total // rows_per_shard))
    if n_total == 0:
        # partitionBy writes NO files for an empty input, so the
        # read-back below couldn't infer a schema and would crash.
        # "Card zeros, don't crash" (same convention as bm25_topk):
        # emit an empty-but-valid manifest so downstream audit tooling
        # sees an explicit zero, not an exception.
        os.makedirs(dst_dir, exist_ok=True)
        manifest = {
            "n_rows": 0,
            "n_shards": 0,
            "rows_per_shard_target": rows_per_shard,
            "id_col": id_col,
            "salt": salt,
            "columns": [c for c in df.columns],
            "shards": [],
        }
        with open(os.path.join(dst_dir, "_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        return manifest
    keyed = df.withColumn("_shard_key", shard_key(id_col, salt)).withColumn(
        "_shard", shard_id(id_col, n_shards, salt)
    )
    # ONE hash exchange on the deterministic shard id; each shard id
    # lands in exactly one task, so partitionBy writes exactly one
    # file per shard directory, internally sorted by the full key.
    (
        keyed.repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_shard_key")
        .write.partitionBy("_shard")
        .mode("overwrite")
        .parquet(dst_dir)
    )

    spark = df.sparkSession
    back = spark.read.parquet(dst_dir)
    data_cols = [c for c in back.columns if c not in ("_shard_key", "_shard")]
    stats = (
        back.withColumn(
            "_file",
            F.concat_ws(
                "/",
                F.element_at(F.split(F.input_file_name(), "/"), -2),
                F.element_at(F.split(F.input_file_name(), "/"), -1),
            ),
        )
        .groupBy("_file")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(row_fingerprint(data_cols).cast("decimal(38,0)"))
            .cast("string")
            .alias("content_hash"),
            F.min("_shard_key").alias("key_min"),
            F.max("_shard_key").alias("key_max"),
        )
        .orderBy("key_min")
        .collect()
    )
    manifest = {
        "n_rows": n_total,
        "n_shards": len(stats),
        "rows_per_shard_target": rows_per_shard,
        "id_col": id_col,
        "salt": salt,
        "columns": data_cols,
        "shards": [
            {
                "file": r["_file"],
                "n_rows": r["n_rows"],
                "content_hash": r["content_hash"],
                "key_min": r["key_min"],
                "key_max": r["key_max"],
            }
            for r in stats
        ],
    }
    assert sum(s["n_rows"] for s in manifest["shards"]) == n_total
    with open(os.path.join(dst_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_shards(spark, dst_dir: str) -> dict:
    """Re-derive every shard's count + content hash from the files on
    disk and diff against ``_manifest.json`` — the audit half of the
    contract (run it after a copy/move/retention pass). Returns
    ``{"ok": bool, "bad_shards": [...]}``."""
    with open(os.path.join(dst_dir, "_manifest.json")) as f:
        manifest = json.load(f)
    back = spark.read.parquet(dst_dir)
    data_cols = [c for c in back.columns if c not in ("_shard_key", "_shard")]
    got = {
        r["_file"]: (r["n_rows"], r["content_hash"])
        for r in back.withColumn(
            "_file",
            F.concat_ws(
                "/",
                F.element_at(F.split(F.input_file_name(), "/"), -2),
                F.element_at(F.split(F.input_file_name(), "/"), -1),
            ),
        )
        .groupBy("_file")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(row_fingerprint(data_cols).cast("decimal(38,0)"))
            .cast("string")
            .alias("content_hash"),
        )
        .collect()
    }
    bad = [
        s["file"]
        for s in manifest["shards"]
        if got.get(s["file"]) != (s["n_rows"], s["content_hash"])
    ]
    extra = sorted(set(got) - {s["file"] for s in manifest["shards"]})
    return {"ok": not bad and not extra, "bad_shards": bad + extra}
