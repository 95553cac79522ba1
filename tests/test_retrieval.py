"""BM25 top-k retrieval (functions/retrieval.py) vs a naive Python
oracle, plus ranking/edge semantics."""

import math

import pytest

from scida_spark.functions.retrieval import bm25_topk


DOCS = [
    (0, "spark shuffles the data"),
    (1, "the quick brown fox"),
    (2, "spark spark spark streaming"),
    (3, "a b c d e f g h"),
    (4, "quick spark"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _naive_bm25(queries, k=10, k1=1.2, b=0.75):
    toks = {d: t.strip().split(" ") for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in sorted(set(qtext.split())):
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf:
                    scores[d] = scores.get(d, 0.0) + idf * (tf * (k1 + 1.0)) / (
                        tf + k1 * ((1.0 - b) + b * len(t) / avgdl)
                    )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = ranked
    return out


def test_bm25_matches_naive(docs_df):
    queries = [(0, "spark"), (1, "quick spark"), (2, "the fox")]
    got = bm25_topk(docs_df, queries, k=10).collect()
    expect = _naive_bm25(queries)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    assert set(by_q) == set(expect)
    for qid in expect:
        assert [d for d, _ in by_q[qid]] == [d for d, _ in expect[qid]]
        for (_, s_got), (_, s_exp) in zip(by_q[qid], expect[qid]):
            assert s_got == pytest.approx(s_exp, rel=1e-12)


def test_bm25_query_tokenization_mirror(spark):
    """Engine and oracle must tokenize query constants IDENTICALLY:
    ``strip().split(' ')`` (single-space split), NOT any-whitespace
    ``split()``. A query with a double space yields an empty-string
    token, which genuinely matches a corpus document containing a
    double space — any oracle that silently drops it diverges (r14
    verdict residual #1: queries_pipeline._QCTE built its VALUES
    literal from ``qt.split()``; now fixed and pinned here)."""
    docs = spark.createDataFrame(
        [(0, "alpha  beta"), (1, "alpha beta"), (2, "gamma delta")],
        "doc_id long, text string",
    )
    queries = [(0, "alpha  beta")]  # double space -> '' token
    got = {
        (r["doc_id"], round(r["score"], 10))
        for r in bm25_topk(docs, queries, k=10).collect()
    }

    def naive(tokenize):
        toks = {0: ["alpha", "", "beta"], 1: ["alpha", "beta"],
                2: ["gamma", "delta"]}
        n, k1, b = 3, 1.2, 0.75
        avgdl = sum(len(t) for t in toks.values()) / n
        scores = {}
        for term in sorted(set(tokenize(queries[0][1]))):
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf:
                    scores[d] = scores.get(d, 0.0) + idf * (
                        tf * (k1 + 1.0)
                    ) / (tf + k1 * ((1.0 - b) + b * len(t) / avgdl))
        return {(d, round(s, 10)) for d, s in scores.items()}

    engine_recipe = naive(lambda q: q.strip().split(" "))
    old_oracle_recipe = naive(lambda q: q.split())
    assert got == engine_recipe
    # the two recipes REALLY diverge on this constant — the pin is
    # meaningful, not vacuous
    assert engine_recipe != old_oracle_recipe
    # and the repo's oracle literal builder emits EXACTLY the engine
    # recipe's (query_id, token) rows — including any '' token a
    # future double-spaced constant would produce
    from scida_spark import queries_pipeline as QP

    for q, qt in QP._BM25_QUERIES:
        for t in sorted(set(qt.strip().split(" "))):
            assert f"({q},'{t}')" in QP._QCTE


def test_bm25_tf_saturation(docs_df):
    """Doc 2 (tf=3 for 'spark') outranks single-tf docs, but its score
    is < 3x theirs (k1 saturation)."""
    [(_, ranked)] = _naive_bm25([(0, "spark")]).items()
    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs_df, [(0, "spark")]).collect()}
    assert max(got, key=got.get) == 2
    single = [v for d, v in got.items() if d != 2]
    assert got[2] < 3 * min(single)


def test_bm25_rank_and_k(docs_df):
    got = bm25_topk(docs_df, [(7, "spark quick")], k=2).collect()
    assert len(got) == 2
    assert sorted(r["rank"] for r in got) == [1, 2]
    assert all(r["query_id"] == 7 for r in got)


def test_bm25_no_match_and_empty(docs_df, spark):
    # query with no corpus hits → no rows for it
    got = bm25_topk(docs_df, [(0, "zzz qqq")], k=5).collect()
    assert got == []
    # duplicate term in query counts once
    one = bm25_topk(docs_df, [(0, "spark")], k=5).collect()
    two = bm25_topk(docs_df, [(0, "spark spark")], k=5).collect()
    assert sorted((r["doc_id"], r["score"]) for r in one) == sorted(
        (r["doc_id"], r["score"]) for r in two
    )


def test_bm25_empty_corpus_returns_empty(spark):
    """Empty corpus → empty result, not ZeroDivisionError/float(None)
    (the repo's 'card zeros, don't crash' convention)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    got = bm25_topk(empty, [(0, "spark")], k=5)
    assert got.collect() == []
    assert [f.name for f in got.schema.fields] == [
        "query_id",
        "doc_id",
        "score",
        "rank",
    ]


# ---------------------------------------------------------------------------
# Query likelihood + RRF (r9)
# ---------------------------------------------------------------------------


def _ql_corpus(spark):
    rows = [
        (0, "hash join hash join hash"),      # tf-heavy for 'hash join'
        (1, "hash partition scan"),
        (2, "merge join strategy"),
        (3, "window agg stream stream"),
        (4, "totally unrelated words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_query_likelihood_ranks_tf_heavy_doc_first(spark):
    from scida_spark.functions.retrieval import query_likelihood_topk

    docs = _ql_corpus(spark)
    out = query_likelihood_topk(docs, [(0, "hash join")], k=5, mu=10.0)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["doc_id"] == 0
    # docs 1 and 2 match one term each; doc 4 matches nothing -> absent
    ids = {r["doc_id"] for r in rows}
    assert 4 not in ids and {0, 1, 2} <= ids


def test_query_likelihood_matches_hand_computation(spark):
    import math

    from scida_spark.functions.retrieval import query_likelihood_topk

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string"
    )
    mu = 5.0
    out = {
        r["doc_id"]: r["score"]
        for r in query_likelihood_topk(docs, [(0, "a b")], k=5, mu=mu).collect()
    }
    C = 5
    cf = {"a": 3, "b": 1}
    lg = math.log

    def score(tfs, dl):
        s = 0.0
        for t in sorted(tfs):  # sorted-term fold
            m = mu * cf[t] / C
            s += lg(tfs[t] + m) - lg(m)
        bq = 0.0
        for t in sorted(cf):
            bq += lg(mu * cf[t] / C)
        return s + bq - len(cf) * lg(dl + mu)

    assert abs(out[0] - score({"a": 2, "b": 1}, 3)) < 1e-14
    assert abs(out[1] - score({"a": 1}, 2)) < 1e-14


def test_rrf_fuse_combines_and_breaks_ties(spark):
    from scida_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1.0, 1), (0, 11, 0.9, 2)],
        "query_id long, doc_id long, score double, rank int",
    )
    b = spark.createDataFrame(
        [(0, 11, -1.0, 1), (0, 12, -2.0, 2)],
        "query_id long, doc_id long, score double, rank int",
    )
    rows = sorted(rrf_fuse(a, b, k=5).collect(), key=lambda r: r["rank"])
    # doc 11 appears in both lists -> highest fused score
    assert rows[0]["doc_id"] == 11
    assert abs(rows[0]["score"] - (1 / 62 + 1 / 61)) < 1e-15
    # docs 10 (rank1 in a) vs 12 (rank2 in b): 1/61 > 1/62
    assert rows[1]["doc_id"] == 10 and rows[2]["doc_id"] == 12


def test_tfidf_keywords_hand_computed(spark):
    """idf = ln(N+1) - ln(df+1) + 1; per-doc top-k by (score desc,
    term asc). 'rare' appears in one doc (max idf); 'common' in all
    (min idf); tf breaks within-doc ordering."""
    import math

    from scida_spark.functions.retrieval import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common mid"),
            (3, "common mid"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_keywords(docs, k=2).collect()
    }
    ln4 = math.log(4.0)

    def idf(df):
        return (ln4 - math.log(df + 1.0)) + 1.0

    assert got[(1, 1)] == ("common", 2, 2.0 * idf(3))
    assert got[(1, 2)] == ("rare", 1, 1.0 * idf(1))
    # doc 2: mid (df=2) vs common (df=3), both tf=1 -> mid scores higher
    assert got[(2, 1)][0] == "mid" and got[(2, 2)][0] == "common"
    # tie-break: equal scores order by ascending term
    t = spark.createDataFrame([(9, "b a")], "doc_id long, text string")
    tied = [r["term"] for r in tfidf_keywords(t, k=2).orderBy("rank").collect()]
    assert tied == ["a", "b"]


def test_tfidf_keywords_layout_independent(spark, sf_dir):
    from scida_spark.functions.retrieval import tfidf_keywords
    from scida_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    a = {tuple(r) for r in tfidf_keywords(docs, k=3).collect()}
    b = {tuple(r) for r in tfidf_keywords(docs.repartition(7), k=3).collect()}
    assert a == b and len(a) > 100


def test_phrase_occurrences_contract(spark):
    """phrase_occurrences (r12): overlapping sliding-window counts,
    zero-hit phrases emit nothing, k > len(tokens) is safe, the plan
    is map-only (no Exchange), and partitioning never changes a count."""
    from scida_spark.functions.retrieval import phrase_occurrences

    df = spark.createDataFrame(
        [
            (0, "the the the"),          # overlapping: "the the" x2
            (1, "a b c a b"),            # "a b" x2, "c a b" x1
            (2, "x"),                    # shorter than any phrase
            (3, " a b "),                # outer whitespace trimmed
            # multi-space gap: single-space house tokenization yields
            # empty tokens between a and b — NOT adjacent, no match
            (4, "a   b"),
        ],
        "doc_id long, text string",
    )
    phrases = [
        ("p0", "the the"),
        ("p1", "a b"),
        ("p2", "c a b"),
        ("p3", "zz qq"),
    ]
    got = {
        (r["phrase_id"], r["doc_id"]): r["n_occ"]
        for r in phrase_occurrences(df, phrases).collect()
    }
    assert got == {
        ("p0", 0): 2,
        ("p1", 1): 2,
        ("p1", 3): 1,
        ("p2", 1): 1,
    }
    # map-only: one scan, no shuffle
    plan = (
        phrase_occurrences(df, phrases)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    got2 = {
        (r["phrase_id"], r["doc_id"]): r["n_occ"]
        for r in phrase_occurrences(df.repartition(7), phrases).collect()
    }
    assert got2 == got


# --------------------------------------------------------------------------
# RM3 pseudo-relevance feedback
# --------------------------------------------------------------------------


def _naive_rm3(queries, k=10, k_fb=2, m=4, alpha=0.5, mu=50.0):
    """Pure-Python RM3 over DOCS with the module's exact conventions."""
    toks = {d: t.strip().split(" ") for d, t in DOCS}
    c_total = sum(len(t) for t in toks.values())
    out = {}
    for qid, qtext in queries:
        qtoks = qtext.strip().split(" ")
        # ---- pass 1: uniform-weight QL (standard formula, not the
        # decomposed form — equality of the two is what we verify)
        terms = sorted(set(qtoks))
        cf = {t: sum(tt.count(t) for tt in toks.values()) for t in terms}
        live = [t for t in terms if cf[t] > 0]
        s1 = {}
        for d, tt in toks.items():
            if not any(t in tt for t in live):
                continue
            s = 0.0
            for t in live:
                p = (tt.count(t) + mu * cf[t] / c_total) / (len(tt) + mu)
                s += math.log(p)
            s1[d] = s
        fb = sorted(s1.items(), key=lambda kv: (-kv[1], kv[0]))[:k_fb]
        # ---- posterior + RM1
        mx = max(s for _, s in fb)
        den = sum(math.exp(s - mx) for _, s in sorted(fb))
        post = {d: math.exp(s - mx) / den for d, s in fb}
        rm = {}
        for d in post:
            for t in set(toks[d]):
                rm[t] = rm.get(t, 0.0) + post[d] * toks[d].count(t) / len(
                    toks[d]
                )
        topm = sorted(rm.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        rmsum = sum(v for _, v in topm)
        # ---- interpolate
        w = {}
        for t in set(qtoks):
            w[t] = alpha * (qtoks.count(t) / len(qtoks))
        for t, v in topm:
            w[t] = w.get(t, 0.0) + (1.0 - alpha) * (v / rmsum)
        # ---- pass 2: weighted QL
        cf2 = {t: sum(tt.count(t) for tt in toks.values()) for t in w}
        live2 = {t for t in w if cf2[t] > 0}
        s2 = {}
        for d, tt in toks.items():
            if not any(t in tt for t in live2):
                continue
            s = 0.0
            for t in sorted(live2):
                p = (tt.count(t) + mu * cf2[t] / c_total) / (len(tt) + mu)
                s += w[t] * math.log(p)
            s2[d] = s
        out[qid] = sorted(s2.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return out


def test_rm3_matches_naive_reference(docs_df):
    from scida_spark.functions.retrieval import rm3_topk

    queries = [(0, "quick fox"), (1, "spark streaming")]
    got = rm3_topk(
        docs_df, queries, k=10, k_fb=2, m=4, alpha=0.5, mu=50.0
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    want = _naive_rm3(queries, k=10, k_fb=2, m=4, alpha=0.5, mu=50.0)
    for qid, ranked in want.items():
        mine = sorted(by_q[qid])
        assert [d for _, d, _ in mine] == [d for d, _ in ranked]
        for (_, _, s), (_, ws) in zip(mine, ranked):
            assert s == pytest.approx(ws, abs=1e-9)


def test_rm3_alpha_one_equals_plain_ql(docs_df):
    """alpha=1 zeroes the expansion weights' mass ONLY for terms
    outside the original query; original terms keep alpha*MLE, a
    positive rescale of uniform weights per query -> same RANKING as
    plain QL (scores differ by the per-query scale)."""
    from scida_spark.functions.retrieval import (
        query_likelihood_topk,
        rm3_topk,
    )

    queries = [(0, "quick fox")]
    got = rm3_topk(docs_df, queries, k=5, k_fb=2, m=0, alpha=1.0, mu=50.0)
    plain = query_likelihood_topk(docs_df, queries, k=5, mu=50.0)
    assert [
        (r["rank"], r["doc_id"]) for r in got.orderBy("rank").collect()
    ] == [(r["rank"], r["doc_id"]) for r in plain.orderBy("rank").collect()]


def test_rm3_expansion_adds_terms_beyond_query(docs_df):
    from scida_spark.functions.retrieval import rm3_expand_terms

    queries = [(0, "quick fox")]
    wt = rm3_expand_terms(docs_df, queries, k_fb=2, m=4, alpha=0.5, mu=50.0)
    terms = {t for _, t, _ in wt}
    assert terms > {"quick", "fox"}  # expansion brought new terms
    assert all(w > 0 for _, _, w in wt)
    # weights of the weighted query sum to ~1 when every original term
    # is in the collection (alpha * 1 + (1-alpha) * 1)
    assert sum(w for _, _, w in wt) == pytest.approx(1.0, abs=1e-12)


def test_rm3_max_df_ceiling(docs_df):
    """r14: the expansion-term df ceiling. max_df=1.0 is a no-op
    (df <= n always); a tight ceiling bars corpus-frequent terms from
    the RM1 top-m but never touches the original query's alpha side;
    and the full rm3_topk honors it end-to-end (matches the naive
    reference with the same filter)."""
    from scida_spark.functions.retrieval import rm3_expand_terms, rm3_topk

    queries = [(0, "quick fox")]
    kw = dict(k_fb=2, m=6, alpha=0.5, mu=50.0)
    base = rm3_expand_terms(docs_df, queries, **kw)
    assert rm3_expand_terms(docs_df, queries, max_df=1.0, **kw) == base

    # cap = int(0.5 * 5) = 2: 'spark' (df=3) is barred from expansion
    tight = rm3_expand_terms(docs_df, queries, max_df=0.5, **kw)
    toks = {d: t.strip().split(" ") for d, t in DOCS}

    def df(t):
        return sum(1 for tt in toks.values() if t in tt)

    for _, t, _ in tight:
        if t not in ("quick", "fox"):
            assert df(t) <= 2, t
    assert {"quick", "fox"} <= {t for _, t, _ in tight}
    assert {t for _, t, _ in tight} != {t for _, t, _ in base}
    assert "spark" in {t for _, t, _ in base}  # the guard bit a real term

    # end-to-end: rm3_topk(max_df) == rm3_topk(wterms=ceiling expansion)
    via_param = rm3_topk(docs_df, queries, k=10, max_df=0.5, **kw).collect()
    via_wterms = rm3_topk(docs_df, queries, k=10, wterms=tight, **kw).collect()
    key = lambda rs: sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in rs
    )
    assert key(via_param) == key(via_wterms)


def test_rm3_no_feedback_docs_degenerates_to_orig_terms(spark):
    from scida_spark.functions.retrieval import rm3_expand_terms

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    wt = rm3_expand_terms(docs, [(0, "zzz qqq")], k_fb=2, m=4, alpha=0.5)
    assert {t for _, t, _ in wt} == {"zzz", "qqq"}
