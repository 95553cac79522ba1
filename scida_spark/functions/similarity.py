"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk_bruteforce` — exact baseline: broadcast the query
  set, cross-join, rank. Correct at any scale where the *query* side is
  small (the candidate side streams; no shuffle of the big side until
  the final per-query top-k aggregation, which is O(queries × k)).
* :func:`lsh_topk` — scale path: random-hyperplane LSH buckets shrink
  the candidate set; recall traded for a bucket-local search. At 100 TB
  this replaces the cross-join with an equi-join on bucket signatures.

Dot products are computed with ``zip_with`` + a sequential ``aggregate``
fold — JVM-side, deterministic evaluation order (so cross-engine
comparison with an identical fold is bitwise-stable before rounding).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Queries are broadcast; candidates never shuffle until the rank
    window keyed by query_id (O(queries×candidates) compute, O(q×k)
    shuffle output with AQE coalescing).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    nbits: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature (int bucket of ``nbits`` sign bits)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((nbits, dim))
    bcast = embeddings.sparkSession.sparkContext.broadcast(planes)

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        p = bcast.value
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        proj = mat @ p.T  # (batch, nbits)
        bits = (proj > 0).astype(np.uint64)
        weights = (np.uint64(1) << np.arange(p.shape[0], dtype=np.uint64))[None, :]
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return embeddings.select(
        F.col(id_col), F.col(vec_col), _sig(F.col(vec_col).cast("array<double>")).alias("bucket")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Equi-join on bucket replaces the cross-join — the 100 TB plan. Multi-
    probe (flip one bit) improves recall for near-boundary vectors.
    """
    sig_c = hyperplane_signatures(embeddings, nbits, dim, seed, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        "bucket",
    )
    sig_q = hyperplane_signatures(queries, nbits, dim, seed, id_col, vec_col)
    # Multi-probe: original bucket + each 1-bit flip.
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(nbits)]
    )
    q = sig_q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(probes).alias("bucket"),
    )
    scored = (
        sig_c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "cand_id", "sim")
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def _kmeans_centroids(sample: np.ndarray, nlist: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (spherical:
    cosine assignment via normalized vectors)."""
    rng = np.random.RandomState(seed)
    x = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cent = x[rng.choice(len(x), size=nlist, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for j in range(nlist):
            members = x[assign == j]
            if len(members):
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cent[j] = c / n
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroid lists
    (cosine). One narrow Pandas-UDF pass over a broadcast centroid
    matrix — no shuffle."""
    bcast = embeddings.sparkSession.sparkContext.broadcast(centroids)

    @F.pandas_udf("array<int>")
    def _lists(vecs: pd.Series) -> pd.Series:
        c = bcast.value  # (nlist, dim), unit-norm
        mat = np.stack(vecs.to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ c.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return embeddings.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).cast("array<double>").alias("v"),
        _lists(F.col(vec_col).cast("array<double>")).alias("lists"),
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    sample_stride: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize candidates into ``nlist``
    inverted lists (k-means centroids from a deterministic driver-side
    sample), probe the query's ``nprobe`` nearest lists only.

    The scale path complementing :func:`lsh_topk`: candidate vectors
    get ONE list id (narrow map, no shuffle), queries explode to
    nprobe probes, and the search is an equi-join on list id — the
    cross-join never happens. Centroid training reads a ~1e4-row
    deterministic sample (``id % stride == 0``), so the index build is
    O(sample) on the driver and O(N) distributed assignment.
    """
    sample = np.stack(
        [
            np.asarray(r["v"], dtype=np.float64)
            for r in embeddings.select(
                F.col(vec_col).cast("array<double>").alias("v")
            )
            .filter(F.col(id_col) % sample_stride == 0)
            .limit(max(nlist * 64, 1024))
            .collect()
        ]
    )
    cent = _kmeans_centroids(sample, nlist, seed)
    cands = ivf_assign(embeddings, cent, 1, id_col, vec_col, out_id="cand_id").select(
        "cand_id", F.col("v").alias("cv"), F.element_at("lists", 1).alias("list_id")
    )
    q = ivf_assign(queries, cent, nprobe, id_col, vec_col, out_id="query_id").select(
        "query_id", F.col("v").alias("qv"), F.explode("lists").alias("list_id")
    )
    scored = (
        cands.join(F.broadcast(q), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "cand_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact; use LSH buckets at scale)."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
