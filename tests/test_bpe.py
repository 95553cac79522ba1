"""BPE learning + encoding: classic textbook example, determinism,
round-trip invariants, and the zero-shuffle encode plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scida_spark.functions.bpe import (
    bpe_encode,
    encode_word,
    learn_bpe,
    word_counts,
)


def test_learn_bpe_textbook_sequence():
    """Sennrich's running example: {low:5, lower:2, newest:6, widest:3}.
    First merges must combine the most frequent pair (e s -> es, count
    9), then es t</w>, then l o.

    Note: with the end-of-word marker ATTACHED to the final character
    (this implementation's convention), ``w`` and ``w</w>`` are
    distinct symbols, so after (l,o) the best pair is (e,w) from
    newest (6) — not (lo,w), whose count splits 5 (w</w>) / 2 (w)."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(wc, n_merges=4)
    assert merges[0] == ("e", "s")           # 6 + 3 = 9
    assert merges[1] == ("es", "t</w>")      # 9
    assert merges[2] == ("l", "o")           # 5 + 2 = 7
    assert merges[3] == ("e", "w")           # 6 (newest)
    # encoding with those merges segments as expected
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["lo", "w", "est</w>"]
    assert encode_word("low", ranks) == ["lo", "w</w>"]
    assert encode_word("newest", ranks) == ["n", "ew", "est</w>"]


def test_learn_bpe_deterministic_tiebreak():
    """Equal-count pairs break lexicographically — same table in any
    order gives the identical merge sequence."""
    wc = [("ab", 3), ("cd", 3)]
    m1 = learn_bpe(wc, 2)
    m2 = learn_bpe(list(reversed(wc)), 2)
    assert m1 == m2
    assert m1[0] == ("a", "b</w>")  # ('a','b</w>') < ('c','d</w>')


def test_word_counts_and_learn_from_dataframe(spark):
    docs = spark.createDataFrame(
        [(0, "low low low low low lower lower"), (1, "newest " * 6 + "widest " * 3)],
        "doc_id long, text string",
    )
    wc = word_counts(docs)
    got = {r["word"]: r["n"] for r in wc.collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(wc, 2)
    assert merges == [("e", "s"), ("es", "t</w>")]


def test_encode_invariants(spark):
    """Concatenating a word's BPE tokens (minus the marker) rebuilds
    the word; token count <= character count; more merges never
    produce more tokens."""
    docs = spark.createDataFrame(
        [(0, "banana bandana"), (1, "banana banana band")],
        "doc_id long, text string",
    )
    wc = word_counts(docs)
    for n in (0, 2, 6):
        merges = learn_bpe(wc, n)
        enc = bpe_encode(docs, merges)
        for r in enc.collect():
            words = r["text"].split()
            rebuilt = "".join(r["bpe_tokens"]).replace("</w>", " ").rstrip()
            assert rebuilt == " ".join(words)
            assert r["n_bpe_tokens"] <= sum(len(w) + 1 for w in words)
    n0 = bpe_encode(docs, learn_bpe(wc, 0)).agg(F.sum("n_bpe_tokens")).first()[0]
    n6 = bpe_encode(docs, learn_bpe(wc, 6)).agg(F.sum("n_bpe_tokens")).first()[0]
    assert n6 < n0


def test_encode_plan_is_map_only(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    enc = bpe_encode(docs, [("a", "b</w>")])
    p = enc._sc._jvm.PythonSQLUtils.explainString(
        enc._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p


def test_max_types_cut_is_deterministic():
    wc = [("aaa", 2), ("bbb", 2), ("ccc", 2), ("ddd", 1)]
    # cap keeps (count desc, word) order: aaa, bbb
    m = learn_bpe(wc, 1, max_types=2)
    assert m == [("a", "a")]


def test_nonascii_whitespace_consistent_with_learning(spark):
    """Java \\s+ (learning) is ASCII-only; the encode UDF must segment
    identically, so a NBSP-joined pair learned as ONE word type never
    encodes as two words (ADVICE r7)."""
    docs = spark.createDataFrame(
        [(0, "xy zw xy zw")], "doc_id long, text string"
    )
    wc = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    assert wc == {"xy zw": 2}  # JVM side: NBSP is not a separator
    merges = learn_bpe(word_counts(docs), 8)
    enc = bpe_encode(docs, merges).first()
    rebuilt = "".join(enc["bpe_tokens"]).replace("</w>", " ").rstrip()
    assert rebuilt == "xy zw xy zw"


def test_tokpack_closed_form_token_count_property():
    """The tokpack driver section's oracle replays n_bpe_tokens under
    the pinned merges [('l','o'), ('e','s</w>')] with the closed form
    n = len(w) - #non-overlapping 'lo' pairs in w[:-1] - [w ends 'es'].
    Property-test it against the production encode_word kernel over
    an adversarial alphabet (dense in l/o/e/s so merge interactions,
    overlaps, and EOW boundary cases all occur)."""
    import random

    from scida_spark.functions.bpe import encode_word

    ranks = {("l", "o"): 0, ("e", "s</w>"): 1}

    def closed_form(w: str) -> int:
        x = w[:-1]
        cnt_lo = (len(x) - len(x.replace("lo", ""))) // 2
        return len(w) - cnt_lo - (1 if len(w) >= 2 and w.endswith("es") else 0)

    fixed = ["lo", "lol", "lolo", "lolol", "llo", "lllo", "es", "les",
             "loes", "elos", "blos", "lowes", "oles", "s", "e", "l", "o",
             "lose", "closes", "lolesslo", "eslo", "loe", "losles"]
    rng = random.Random(20260815)
    rand = [
        "".join(rng.choice("loesabx") for _ in range(rng.randint(1, 14)))
        for _ in range(5000)
    ]
    for w in fixed + rand:
        assert len(encode_word(w, ranks)) == closed_form(w), w
