"""BPE tokenizer learning + encoding over the corpus.

The missing half of the tokenizer story (text.py has a fixed
regex pre-tokenizer; lm.py scores with a learned unigram model): LEARN
the subword vocabulary from the corpus, then encode documents with it
— the Sennrich+ 2016 byte-pair-encoding algorithm, arranged for the
Spark execution model:

* **One corpus-scale pass, total.** BPE statistics depend only on the
  word-frequency table: explode → groupBy(word) is the single shuffle
  that ever touches the corpus, and its output is O(word types), not
  O(rows). (That table is also reusable across vocab sizes — learn
  100 merges, later 10k, same scan.)
* **The merge loop never sees the corpus.** Pair counting + merging
  runs driver-side over the (bounded) type table — at 100 TB you cap
  the table with ``max_types`` (keep the most frequent types; the
  long tail contributes negligible pair mass and standard BPE
  implementations cut it the same way). Every iteration is O(types
  touched), using the classic incremental update: only words
  containing the merged pair are re-segmented.
* **Encoding is embarrassingly parallel**: the learned merge ranks
  broadcast into one Arrow-batched pandas UDF; no shuffle, rides the
  corpus's existing partitioning.

Determinism contract (the sampling.py rule — same corpus → same
tokenizer, any engine, any partitioning): pair selection breaks count
ties lexicographically, so the merge sequence is a pure function of
the word-count table.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"  # end-of-word marker, standard BPE

# Word splitter shared by learning (JVM `\s+`, which in Java regex is
# the ASCII class below) and encoding (Python, where str.split() would
# ALSO split on Unicode whitespace like \xa0 — a word learned as one
# type must never encode as two).
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — THE one corpus-scale operation
    behind tokenizer learning. Partial aggregation makes the shuffle
    O(distinct words per partition)."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _segment(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + _EOW,) if word else ()


def learn_bpe(
    wc: list[tuple[str, int]] | DataFrame,
    n_merges: int,
    max_types: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-count table (DataFrame
    or pre-collected list). Returns the ordered merge list — rank =
    list position, the whole tokenizer state.

    The driver-side loop is the SCALABLE choice, not a shortcut: the
    type table is bounded (``max_types`` keeps the most frequent
    types, ordered by (count desc, word) so the cut is deterministic),
    while a distributed pair-count per merge would re-shuffle the
    corpus ``n_merges`` times. Incremental update: each merge
    re-segments only the words containing the merged pair.
    """
    if isinstance(wc, DataFrame):
        rows = (
            wc.orderBy(F.col("n").desc(), F.col("word"))
            .limit(max_types)
            .collect()
        )
        wc = [(r["word"], r["n"]) for r in rows]
    else:
        wc = sorted(wc, key=lambda t: (-t[1], t[0]))[:max_types]

    segs: dict[str, tuple[str, ...]] = {w: _segment(w) for w, _ in wc}
    counts = dict(wc)
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, seg in segs.items():
        n = counts[w]
        for p in zip(seg, seg[1:]):
            pair_counts[p] += n
            pair_words.setdefault(p, set()).add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged_sym = best[0] + best[1]
        for w in list(pair_words.get(best, ())):
            seg = segs[w]
            n = counts[w]
            # retract this word's pair contributions
            for p in zip(seg, seg[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        pair_words.pop(p, None)
            # re-segment with the new merge
            out: list[str] = []
            i = 0
            while i < len(seg):
                if i + 1 < len(seg) and (seg[i], seg[i + 1]) == best:
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[w] = tuple(out)
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
                pair_words.setdefault(p, set()).add(w)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (pure kernel, exposed
    for property tests)."""
    seg = list(_segment(word))
    while len(seg) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seg) - 1):
            r = ranks.get((seg[i], seg[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seg[best_i : best_i + 2] = [seg[best_i] + seg[best_i + 1]]
    return seg


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with the learned merges: broadcast the
    rank table into one Arrow-batched pandas UDF over the existing
    partitioning — zero shuffle, no driver involvement per row. Adds
    ``out_col`` (array<string>) and ``n_bpe_tokens``."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})

    @F.pandas_udf("struct<toks: array<string>, n: long>")
    def _enc(s: pd.Series) -> pd.DataFrame:
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        toks_out, n_out = [], []
        for txt in s:
            toks: list[str] = []
            for w in _WS_RE.split(txt or ""):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                toks.extend(got)
            toks_out.append(toks)
            n_out.append(len(toks))
        return pd.DataFrame({"toks": toks_out, "n": n_out})

    r = docs.withColumn("_bpe", _enc(F.col(text_col)))
    return r.select(
        *docs.columns,
        F.col("_bpe.toks").alias(out_col),
        F.col("_bpe.n").alias("n_bpe_tokens"),
    )
