"""Document chunking: split long documents into fixed-token windows
with overlap — the complement of sequence packing (packing.py merges
short docs up to a budget; chunking cuts long docs down to one).
The shape every context-window-bounded consumer needs: embedding
pipelines, RAG indexing, and pretraining with long-document splitting.

Chunk i covers tokens ``1 + i*step .. 1 + i*step + chunk - 1``
(1-based, step = chunk - overlap); the number of chunks is
``1 + ceil(max(n - chunk, 0) / step)`` so the final chunk always
reaches the end of the document and no start position is emitted that
a previous chunk already fully covers. Every token appears in at
least one chunk; consecutive chunks share exactly ``overlap`` tokens
(except the last, which may shift left less than a full step).

Pure JVM Column arithmetic (sequence/transform/slice/posexplode) —
zero shuffle, no UDF; the explode multiplies rows, not bytes read, and
runs map-side wherever the corpus already lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scida_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """One row per chunk: all input columns except ``text_col``, plus
    ``chunk_idx`` (0-based), ``chunk_text`` and ``n_chunk_tokens``.
    ``overlap`` must be smaller than ``chunk_tokens``."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    t = tokens(F.col(text_col))
    n = F.size(t)
    nchunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(step))
    ).cast("int")
    pieces = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.slice(t, i * step + 1, chunk_tokens),
    )
    other = [c for c in docs.columns if c != text_col]
    return docs.select(
        *other,
        F.posexplode(pieces).alias("chunk_idx", "_piece"),
    ).select(
        *other,
        "chunk_idx",
        F.array_join("_piece", " ").alias("chunk_text"),
        F.size("_piece").cast("long").alias("n_chunk_tokens"),
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    divisor: int = 32,
) -> DataFrame:
    """CONTENT-DEFINED chunking (the Karp-Rabin/rolling-hash boundary
    family behind rsync/LBFS/FastCDC, re-expressed engine-portably):
    the text cuts AFTER every position whose character ``k``-gram hash
    satisfies ``H % divisor == 0`` — boundaries are a pure function of
    local CONTENT, so two documents sharing a long region produce
    identical interior chunks even when the region sits at DIFFERENT
    offsets (the shift-resilience fixed-size chunking lacks, and the
    reason chunk-hash dedup works on near-identical crawl snapshots).
    Expected chunk length is ~``divisor`` chars + k.

    ``H`` is the first 8 hex chars of md5(gram) as an integer — the
    repo's oracle-portable hash convention (DuckDB replays it as
    ``('0x' || substr(md5(g),1,8))::UBIGINT``).

    Returns one row per chunk: (id, chunk_idx int, start int 1-based,
    n_chars int, chunk_hash string). Every character lands in exactly
    one chunk (chunks partition the text); docs shorter than ``k``
    (or with no qualifying gram) are one whole-text chunk; empty docs
    emit no rows.

    Scale: per-row column arrays only (the winnow staging rule: the
    hashed-gram array materializes in its OWN projection so each
    reference is O(1), not a re-hash) — MAP-ONLY whole-stage codegen,
    zero shuffle, zero UDF. Downstream chunk-hash dedup
    (:func:`cdc_dup_doc_flags`) is one groupBy on the chunk hash.
    """
    n = F.length(F.col(text_col))
    n_grams = F.greatest(n - (k - 1), F.lit(0))
    hm = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.struct(
            (
                F.conv(
                    F.substring(
                        F.md5(F.substr(F.col(text_col), i, F.lit(k))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % divisor
            ).alias("m"),
            i.alias("p"),
        ),
    )
    staged = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.when(n_grams > 0, hm)
        .otherwise(F.array().cast("array<struct<m:long,p:int>>"))
        .alias("_g"),
        n.alias("_n"),
    ).filter(F.col("_n") > 0)
    cuts = F.transform(
        F.filter(F.col("_g"), lambda x: x["m"] == 0),
        lambda x: x["p"] + (k - 1),
    )
    bounds = F.array_sort(
        F.array_distinct(
            F.concat(F.array(F.lit(0)), cuts, F.array(F.col("_n")))
        )
    )
    # size(bounds) >= 2 always here: 0 and _n are distinct since _n > 0,
    # so the sequence below never runs descending (the r14
    # sequence(1, 0) phantom-gram regression class)
    chunks = F.transform(
        F.sequence(F.lit(2), F.size("_b")),
        lambda i: F.struct(
            (F.element_at("_b", i - 1) + 1).alias("start"),
            (F.element_at("_b", i) - F.element_at("_b", i - 1)).alias(
                "len"
            ),
        ),
    )
    return (
        staged.select(F.col(id_col), F.col(text_col), bounds.alias("_b"))
        .select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(chunks).alias("chunk_idx", "_c"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int"),
            F.col("_c.start").cast("int").alias("start"),
            F.col("_c.len").cast("int").alias("n_chars"),
            F.md5(
                F.substr(F.col(text_col), F.col("_c.start"), F.col("_c.len"))
            ).alias("chunk_hash"),
        )
    )


def cdc_dup_doc_flags(chunks: DataFrame, id_col: str) -> DataFrame:
    """(id, shares_chunk boolean): does this document share at least
    one content-defined chunk (by hash) with a DIFFERENT document?
    The chunk-level dup detector: one groupBy on the chunk hash
    (map-side combined), then a broadcast-friendly semi-join of the
    multi-doc hashes back onto the chunk table. Output is per-doc."""
    multi = (
        chunks.groupBy("chunk_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("chunk_hash")
    )
    shared = (
        chunks.join(multi, "chunk_hash", "left_semi")
        .select(F.col(id_col))
        .distinct()
        .withColumn("shares_chunk", F.lit(True))
    )
    return (
        chunks.select(F.col(id_col))
        .distinct()
        .join(shared, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("shares_chunk", F.lit(False)).alias("shares_chunk"),
        )
    )
