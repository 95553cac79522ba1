"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (100 TB):
  * exact dedup — hash-groupBy: one shuffle on the digest, map-side
    combine; never materializes text twice.
  * n-gram Jaccard — exact pairwise via shingle inverted index
    (explode → self-join on shingle → count). Correct but O(pairs
    sharing a shingle); at scale use MinHash LSH below to generate
    candidates and verify only those.
  * MinHash LSH — shingle → 64-bit hash → K permutations → minima →
    B bands; identical band hash ⇒ candidate pair. All shuffles are on
    band keys; candidates then verified with exact Jaccard. This is the
    scale path: cost is O(docs × K) + O(candidates).
  * SimHash — 64-bit signature; near-dups = small Hamming distance.
  * embedding cosine — see functions/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup_clusters(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts by md5; canonical id = min id per cluster."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.count("*").alias("n"), F.min(id_col).alias("canonical_id"))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct text (the min-id row). Two shuffles:
    digest-agg + semi-join back; both on the digest key."""
    keep = exact_dedup_clusters(df, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# --------------------------------------------------------------------------
# Shingles + exact n-gram Jaccard
# --------------------------------------------------------------------------


def shingles_from_tokens(tok_col, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles from a pre-split token array column.

    The token array MUST be a materialized column (not an inline split
    expression): Catalyst does not CSE subexpressions inside lambda
    bodies, so an inlined split would re-tokenize the text once per
    element_at — ~10x slower on 50-token docs.
    """
    t = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    idx = F.sequence(F.lit(0), F.size(t) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, (i + k + 1).cast("int")) for k in range(n)])
    )
    # sequence(0, negative) is DESCENDING in Spark, not empty — guard
    # short docs (fewer than n tokens) to an empty shingle set.
    grams = F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a single-space-tokenized text.

    Prefer ``_shingle_table`` / ``shingles_from_tokens`` in hot paths —
    this inline form re-splits the text per element access (see above).
    """
    return shingles_from_tokens(F.split(F.trim(F.col(text_col)), " "), n)


def _shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, sh) with tokens materialized as a column before shingling."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.split(F.trim(F.col(text_col)), " ").alias("_t")
    )
    return toks.select("doc", shingles_from_tokens("_t", n).alias("sh"))


def shingle_hash_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc, sh: array<long>) — distinct word-n-gram shingles as 64-bit
    blake2b hashes, computed in one Arrow-batched Pandas UDF.

    This is the hot-path form: Spark's higher-order functions
    (transform/array_distinct) execute *interpreted*, outside
    whole-stage codegen, so JVM-side shingle-string construction costs
    ~2 ms/doc; the vectorized Python kernel is ~30x faster and the
    shingle strings never cross into the JVM at all — only the 8-byte
    hashes. Downstream set ops (intersection/union/minhash) are
    hash-based, exact modulo 64-bit collisions (~(k/2^32)^2 per corpus
    shard — negligible and deterministic).
    """
    import hashlib

    @F.pandas_udf("array<long>")
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").strip().split(" ")
            if len(toks) < n:
                out.append(np.empty(0, dtype=np.int64))
                continue
            seen = {
                int.from_bytes(
                    hashlib.blake2b(
                        " ".join(toks[i : i + n]).encode(), digest_size=8
                    ).digest(),
                    "big",
                    signed=True,
                )
                for i in range(len(toks) - n + 1)
            }
            out.append(np.fromiter(seen, dtype=np.int64, count=len(seen)))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc"), _sh(F.col(text_col)).alias("sh"))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact pairwise Jaccard over word n-gram shingle sets.

    Inverted-index self-join: explode shingles, join on shingle with
    id_a < id_b, count intersections, derive union from per-doc set
    sizes. Jaccard = |∩| / (|A|+|B|-|∩|) — an exact ratio of integers,
    so the double division is engine-independent.
    """
    sh = shingle_hash_table(df, id_col, text_col, n)
    sizes = sh.select("doc", F.size("sh").alias("nsh"))
    ex = sh.select("doc", F.explode("sh").alias("g"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("nsh").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash coefficients sized so (a*x + b) NEVER overflows
    uint64: a,b < 2^31 and inputs reduced to 32 bits, so a*x+b < 2^63
    and the mod-Mersenne reduction is exact. (A previous draw from
    [1, 2^61) silently wrapped mod 2^64, leaving an ad-hoc hash family
    whose band-collision probability no longer tracked MinHash theory.)
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=num_perm, dtype=np.int64)
    b = rng.randint(0, 1 << 31, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """Per-doc MinHash signature (array<long>, length num_perm).

    Shingle → xxhash64 (JVM-side) → vectorized (a·x+b) mod p minima in
    a Pandas UDF over the hash array. One narrow pass, no shuffle.
    """
    a, b = _perm_params(num_perm, seed)
    sc = df.sparkSession.sparkContext
    bcast = sc.broadcast((a, b))

    sh = shingle_hash_table(df, id_col, text_col, n).select(
        "doc", F.col("sh").alias("hashes")
    )

    @F.pandas_udf("array<long>")
    def _sig(hashes: pd.Series) -> pd.Series:
        aa, bb = bcast.value
        a64 = aa[:, None].astype(np.uint64)
        b64 = bb[:, None].astype(np.uint64)
        out = []
        for hs in hashes:
            # Reduce shingle hashes to 32 bits so a*x+b stays < 2^63
            # (no uint64 wrap → the Mersenne universal family is exact).
            h = (np.asarray(hs, dtype=np.int64).astype(np.uint64) >> np.uint64(32))
            vals = (a64 * h[None, :] + b64) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    # Docs with no shingles (shorter than the n-gram width) have no
    # signature at all: an empty set has Jaccard 0/undefined with
    # everything, and a shared sentinel signature would make ALL short
    # docs collide in every band — a quadratic candidate blow-up on
    # real corpora.
    return sh.filter(F.size("hashes") > 0).select(
        "doc", _sig(F.col("hashes")).alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature; equal band-hash ⇒ candidate pair.

    Shuffles only on (band, band_hash) keys; the quadratic blow-up is
    confined to hash buckets (skew-safe via AQE).
    """
    sig = signatures
    band_cols = []
    for bi in range(bands):
        lo = bi * rows_per_band + 1  # slice() is 1-based
        band_cols.append(
            F.xxhash64(
                F.lit(bi), F.concat_ws(",", F.slice("signature", lo, rows_per_band))
            ).alias(f"b{bi}")
        )
    banded = sig.select("doc", F.explode(F.array(*band_cols)).alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash-LSH pipeline: candidates → exact-Jaccard verify.

    Returns (doc_a, doc_b, jaccard) for verified near-dup pairs. The
    exact verification joins shingle sets only for candidate pairs —
    at scale this is the crucial difference from the all-pairs join.
    """
    rows_per_band = num_perm // bands
    # Cache the signature table: the banded self-join references it on
    # both sides, and without the cache the Pandas-UDF minhash kernel
    # re-runs once per side per band expression.
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm, seed).cache()
    # Eager localCheckpoint instead of cache(): materializes the (small)
    # candidate table once and truncates lineage, with block cleanup tied
    # to this DataFrame's lifetime — a cache() here leaked one cached
    # table per call (same in-session leak 4b336d2 fixed for sigs).
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band).localCheckpoint(eager=True)
    sh = shingle_hash_table(df, id_col, text_col, n)
    a = sh.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    # On a sparse-duplicate corpus LSH prunes ~all pairs → broadcast the
    # candidates so the shingle table streams through two broadcast
    # joins with no shuffle. But candidate count scales with the SQUARE
    # of near-dup cluster sizes (measured: 20x corpus of dense replicas
    # → 400x candidates), so past a size bound fall back to shuffle
    # joins rather than OOM the driver/executors on the broadcast.
    # sigs are only an input to cands (already materialized above) —
    # drop them now rather than leaking a cached signature table per
    # call (repeated invocations in one session otherwise accumulate
    # eviction churn).
    sigs.unpersist()
    n_cands = cands.count()  # cheap: counts the checkpointed blocks
    cand_side = F.broadcast(cands) if n_cands <= 2_000_000 else cands
    verified = (
        cand_side.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_union", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("n_inter").cast("double") / F.col("n_union").cast("double"))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


# --------------------------------------------------------------------------
# Connected components (dedup clusters from near-dup pairs)
# --------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster ids from an undirected near-dup pair list: each node gets
    the MIN node id reachable from it (the canonical representative).

    Per round: (1) every node takes min(own, neighbors') label —
    one-hop propagation; (2) pointer jumping — node's label becomes its
    label's label (path doubling), so convergence is O(log diameter)
    rounds, not O(diameter). Each round localCheckpoints (truncating
    lineage — the plan would otherwise grow a join per round). The loop
    is driver-side *plan* iteration only; data never leaves executors.
    Non-convergence inside the cap raises rather than returning wrong
    labels.
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct().cache()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.src == labels.node)
                .groupBy(F.col("dst").alias("node2"))
                .agg(F.min("label").alias("nlabel"))
            )
            stepped = labels.join(
                neighbor_min, labels.node == F.col("node2"), "left"
            ).select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            # Pointer jumping: label := label's label (path doubling).
            lb = stepped.select(
                F.col("node").alias("pnode"), F.col("label").alias("plabel")
            )
            new_labels = (
                stepped.join(lb, stepped.label == F.col("pnode"), "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select("node", F.col("label").alias("cluster_id"))
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    finally:
        edges.unpersist()


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash over token xxhash64 values (vectorized bit-count)."""

    tok_hashes = F.transform(
        F.split(F.trim(F.col(text_col)), " "), lambda t: F.xxhash64(t)
    )
    sh = df.select(F.col(id_col).alias("doc"), tok_hashes.alias("hashes"))

    @F.pandas_udf("long")
    def _simhash(hashes: pd.Series) -> pd.Series:
        # Fully vectorized over the Arrow batch: flatten every doc's
        # token hashes, unpack to a (total_tokens, 64) bit matrix, then
        # per-doc column sums via reduceat over doc offsets — no Python
        # loop over docs or bits (the loop form measured ~8x slower at
        # 64 tokens/doc; see SCALE.md). Little-endian byte view ⇒ bit
        # column b == (hash >> b) & 1 on every platform Spark runs on.
        if len(hashes) == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        lens = hashes.map(len).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(hashes), dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hashes if len(h)]
        )
        bits = np.unpackbits(
            flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int64)
        nonempty = lens > 0
        starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(lens[nonempty][:-1], out=starts[1:])
        bitsum = np.add.reduceat(bits, starts, axis=0)
        sig_bits = (bitsum * 2 > lens[nonempty, None]).astype(np.uint8)
        sigs = np.packbits(sig_bits, axis=1, bitorder="little").view(np.int64).ravel()
        out = np.zeros(len(hashes), dtype=np.int64)
        out[nonempty] = sigs
        return pd.Series(out)

    return sh.select("doc", _simhash(F.col("hashes")).alias("simhash"))


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance over SimHash signatures.

    Pigeonhole blocking: split the 64 bits into ``max_hamming + 1``
    chunks — distance ≤ d flips at most d chunks, so at least one chunk
    is equal and the join is equi on chunk values, never all-pairs.
    (A fixed 4-chunk split is only complete for d ≤ 3; the chunk count
    must follow the requested distance or recall silently drops.)
    """
    nchunks = max_hamming + 1
    if nchunks > 64:
        raise ValueError("max_hamming must be < 64")
    base = 64 // nchunks
    rem = 64 % nchunks
    widths = [base + (1 if i < rem else 0) for i in range(nchunks)]
    offs = [sum(widths[:i]) for i in range(nchunks)]
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), offs[i])
        .bitwiseAND(F.lit((1 << widths[i]) - 1))
        .alias(f"c{i}")
        for i in range(nchunks)
    ]
    blocked = signatures.select("doc", "simhash", *chunks)
    pieces = []
    for i in range(nchunks):
        a = blocked.select(
            F.col("doc").alias("doc_a"), F.col("simhash").alias("sig_a"), F.col(f"c{i}").alias("ck")
        )
        b = blocked.select(
            F.col("doc").alias("doc_b"), F.col("simhash").alias("sig_b"), F.col(f"c{i}").alias("ck")
        )
        pieces.append(a.join(b, ["ck"]).filter(F.col("doc_a") < F.col("doc_b")).drop("ck"))
    cands = pieces[0]
    for p in pieces[1:]:
        cands = cands.unionAll(p)
    cands = cands.distinct()
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.withColumn("hamming", ham.cast("int")).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
