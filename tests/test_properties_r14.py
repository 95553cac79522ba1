"""Randomized/invariant contracts for the r14 operators:

* exact_substring_pairs == the naive L-gram-join semantics on
  randomized corpora with planted shares at, above, and below the
  threshold (ONE Spark call covers every generated case).
* exact_substring_cut == the per-position coverage reference on the
  same corpora, and cut+pairs are CONSISTENT: a doc loses characters
  iff it appears in some pair.
* rm3_expand_terms(max_df=1.0) is exactly the unceilinged expansion;
  lowering max_df never ADDS expansion terms (anti-monotone in the
  ceiling), and original query terms always survive.
* cap_per_domain: never more than cap per domain, deterministic under
  permutation, and the kept set is exactly the python md5-order
  replay.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

L, K = 60, 16


def _mk_corpus(seed: int):
    rng = random.Random(seed)
    alph = "abcdefgh "

    def rnd(n):
        return "".join(rng.choice(alph) for _ in range(n))

    base = [rnd(rng.randint(70, 220)) for _ in range(12)]
    rows = [(i, t) for i, t in enumerate(base)]
    nid = 100
    for i, t in enumerate(base):
        r = rng.random()
        if r < 0.3 and len(t) >= 100:
            # planted share of random length straddling the threshold
            share = rng.choice([L - 2, L - 1, L, L + 1, L + 25])
            s = rng.randint(0, len(t) - share)
            rows.append((nid, rnd(8) + t[s : s + share] + rnd(8)))
            nid += 1
        elif r < 0.4:
            rows.append((nid, t))  # exact duplicate
            nid += 1
    rows.append((990, ""))
    rows.append((991, "tiny"))
    return rows


def _grams(t):
    return {t[i : i + L] for i in range(len(t) - L + 1)}


def test_exact_substring_pairs_random_corpora(spark):
    from scida_spark.functions.dedup import exact_substring_pairs

    for seed in (1, 7, 23):
        rows = _mk_corpus(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"])
            for r in exact_substring_pairs(df, "doc_id", "text", L, K).collect()
        }
        g = {d: _grams(t) for d, t in rows}
        want = {
            (a, b) for a in g for b in g if a < b and g[a] & g[b]
        }
        assert got == want, (seed, got ^ want)


def test_exact_substring_cut_random_corpora_and_pair_consistency(spark):
    from scida_spark.functions.dedup import exact_substring_pairs
    from scida_spark.functions.spans import exact_substring_cut

    for seed in (3, 11):
        rows = _mk_corpus(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        gram_docs: dict = {}
        for d, t in rows:
            for i in range(len(t) - L + 1):
                gram_docs.setdefault(t[i : i + L], set()).add(d)
        want = {}
        for d, t in rows:
            cov = set()
            for i in range(len(t) - L + 1):
                if len(gram_docs[t[i : i + L]]) >= 2:
                    cov.update(range(i, i + L))
            want[d] = (
                "".join(c for p, c in enumerate(t) if p not in cov),
                len(cov),
            )
        got = {
            r["doc_id"]: (r["cleaned"], r["n_removed"])
            for r in exact_substring_cut(df, "doc_id", "text", L, K).collect()
        }
        assert got == want, seed
        pairs = {
            x
            for r in exact_substring_pairs(df, "doc_id", "text", L, K).collect()
            for x in (r["doc_a"], r["doc_b"])
        }
        cut_docs = {d for d, (_, n) in got.items() if n > 0}
        assert cut_docs == pairs, seed  # cut iff paired


def test_rm3_max_df_monotone_and_originals_survive(spark):
    from scida_spark.functions.retrieval import rm3_expand_terms

    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "rare"]
    rows = [
        (
            i,
            " ".join(
                rng.choices(vocab[:-1], k=rng.randint(5, 12))
                + (["rare"] if i % 7 == 0 else [])
            ),
        )
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [(0, "alpha rare"), (1, "beta gamma")]
    kw = dict(k_fb=3, m=5, alpha=0.5, mu=50.0)
    base = rm3_expand_terms(docs, queries, **kw)
    assert rm3_expand_terms(docs, queries, max_df=1.0, **kw) == base
    prev = {t for _, t, _ in base}
    for ceiling in (0.9, 0.5, 0.2, 0.05):
        cur = {
            t
            for _, t, _ in rm3_expand_terms(
                docs, queries, max_df=ceiling, **kw
            )
        }
        assert cur <= prev, ceiling  # anti-monotone in the ceiling
        assert {"alpha", "rare", "beta", "gamma"} <= cur  # originals kept
        prev = cur


def test_cap_per_domain_python_replay_random(spark):
    from scida_spark.functions.urls import cap_per_domain

    rng = random.Random(13)
    rows = [
        (i, f"http://h{rng.randint(0, 5)}.dom{i % 3}.org/{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    cap = 7
    got = {}
    for r in cap_per_domain(df, "doc_id", "url", cap=cap, salt="pz").collect():
        got.setdefault(r["url_domain"], []).append(
            (r["domain_rank"], r["doc_id"])
        )
    doms: dict = {}
    for i, _ in rows:
        doms.setdefault(f"dom{i % 3}.org", []).append(i)

    def key(i):
        return (hashlib.md5(f"{i}pz".encode()).hexdigest(), i)

    for dom, ids in doms.items():
        keep = sorted(ids, key=key)[:cap]
        assert sorted(got[dom]) == [(r + 1, d) for r, d in enumerate(keep)]
        assert len(got[dom]) <= cap
