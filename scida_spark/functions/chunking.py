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
