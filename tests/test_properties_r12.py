"""Property-based contracts for the r12 operators (hypothesis):

* phrase counting: the lookahead-regexp implementation must equal the
  brute-force token-sliding-window count on ARBITRARY texts — this is
  the split/join-inverse argument tested adversarially (multi-space
  gaps, leading/trailing whitespace, repeated tokens).
* PSI/KL fold: sign contracts and PSI's (p,q) symmetry on arbitrary
  integer count tables.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scida_spark.functions.drift import psi_kl

ALPHA = ["a", "b", "ab", "zz", "a.b", "x+y"]  # incl. regex metachars

tokens_st = st.lists(st.sampled_from(ALPHA), min_size=0, max_size=12)
phrase_st = st.lists(st.sampled_from(ALPHA), min_size=1, max_size=3)


def _brute_count(tokens: list[str], phrase: list[str]) -> int:
    k = len(phrase)
    return sum(
        1
        for i in range(len(tokens) - k + 1)
        if tokens[i : i + k] == phrase
    )


def _regexp_equiv_count(text: str, phrase: list[str]) -> int:
    """Pure-Python twin of the engine's lookahead count: occurrences of
    ' w1 .. wk ' in ' ' + text.strip() + ' ' with overlap."""
    padded = " " + text.strip() + " "
    needle = " " + " ".join(phrase) + " "
    n = 0
    i = padded.find(needle)
    while i != -1:
        n += 1
        i = padded.find(needle, i + 1)
    return n


@given(tokens_st, phrase_st, st.sampled_from(["", " ", "  ", "\t"]))
@settings(max_examples=300, deadline=None)
def test_phrase_string_count_equals_token_window(toks, phrase, pad):
    """For any token list, counting ' w1 .. wk ' substrings of the
    space-padded single-space-joined text (with overlap) equals the
    sliding token-window count — the equivalence the engine's
    regexp_count implementation rests on. Outer whitespace is
    irrelevant (trim); inner structure is exact because single-char
    split/join are inverses."""
    text = pad + " ".join(toks) + pad
    tokens = text.strip().split(" ") if text.strip() else [""]
    assert _regexp_equiv_count(text, phrase) == _brute_count(tokens, phrase)


@given(
    st.dictionaries(
        st.integers(0, 20), st.integers(0, 1000), min_size=1, max_size=12
    ),
    st.dictionaries(
        st.integers(0, 20), st.integers(0, 1000), min_size=1, max_size=12
    ),
)
@settings(max_examples=300, deadline=None)
def test_psi_sign_and_symmetry(old, new):
    buckets = sorted(set(old) | set(new))
    counts = [(b, old.get(b, 0), new.get(b, 0)) for b in buckets]
    swapped = [(b, n, o) for b, o, n in counts]
    psi, kl, n_old, n_new, nb = psi_kl(counts)
    psi2, _kl2, *_ = psi_kl(swapped)
    assert psi >= 0.0  # every term is sign-definite
    assert kl >= -1e-9  # Gibbs, up to float rounding
    # PSI is symmetric in (p, q) mathematically; in floats only to
    # rounding (ln(q/p) is not bitwise -ln(p/q)) — which is exactly
    # why the replay contract fixes ONE orientation and fold order
    assert abs(psi - psi2) <= 1e-9 * max(1.0, psi)
    assert nb == len(buckets)
    assert n_old == sum(old.get(b, 0) for b in buckets)
    assert n_new == sum(new.get(b, 0) for b in buckets)


@given(
    st.dictionaries(
        st.integers(0, 10), st.integers(0, 500), min_size=1, max_size=8
    )
)
@settings(max_examples=200, deadline=None)
def test_psi_zero_iff_identical_counts(counts):
    pairs = [(b, c, c) for b, c in counts.items()]
    psi, kl, *_ = psi_kl(pairs)
    assert psi == 0.0 and kl == 0.0
