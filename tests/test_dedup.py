"""Dedup operators vs exact ground truth computed in plain Python."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scida_spark.functions import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (3, "a completely different document about spark and distributed computing engines"),
    (4, "a completely different document about spark and distributed computing engines"),  # dup of 3
    (5, "spark engines process distributed data with partitions and shuffles at scale"),
    (6, "short text"),
]


def _shingles(text, n=3):
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a, b):
    sa, sb = _shingles(a), _shingles(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs_df):
    kept = sorted(r["doc_id"] for r in D.exact_dedup(docs_df, "doc_id", "text").collect())
    assert kept == [0, 2, 3, 5, 6]
    clusters = {r["canonical_id"]: r["n"] for r in D.exact_dedup_clusters(docs_df, "doc_id", "text").collect()}
    assert clusters == {0: 2, 2: 1, 3: 2, 5: 1, 6: 1}


def test_ngram_jaccard_exact(spark, docs_df):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs_df, "doc_id", "text", n=3, threshold=0.3).collect()
    }
    expected = {}
    for i, (ia, ta) in enumerate(DOCS):
        for ib, tb in DOCS[i + 1 :]:
            j = _jaccard(ta, tb)
            if j >= 0.3:
                expected[(ia, ib)] = j
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_minhash_lsh_finds_near_dups(spark, docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_dedup_pairs(
            docs_df, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.3
        ).collect()
    }
    # exact dups must always be found (identical signatures); verified
    # jaccard filter guarantees precision = 1 vs exact ground truth
    assert (0, 1) in pairs and (3, 4) in pairs
    exact = {
        (ia, ib)
        for i, (ia, ta) in enumerate(DOCS)
        for ib, tb in DOCS[i + 1 :]
        if _jaccard(ta, tb) >= 0.3
    }
    assert pairs <= exact  # no false positives survive verification
    assert len(pairs) >= len(exact) - 0  # high recall on this tiny set


def test_simhash_identical_and_near(spark, docs_df):
    sigs = {r["doc"]: r["simhash"] for r in D.simhash_signatures(docs_df, "doc_id", "text").collect()}
    assert sigs[0] == sigs[1]  # identical text → identical signature
    assert sigs[3] == sigs[4]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_near_pairs(
            D.simhash_signatures(docs_df, "doc_id", "text"), max_hamming=10
        ).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs  # near dup within 10 bits


def test_minhash_signature_deterministic(spark, docs_df):
    s1 = D.minhash_signatures(docs_df, "doc_id", "text").orderBy("doc").collect()
    s2 = D.minhash_signatures(docs_df, "doc_id", "text").orderBy("doc").collect()
    assert [r["signature"] for r in s1] == [r["signature"] for r in s2]


def test_connected_components_vs_union_find(spark):
    from scida_spark.functions.dedup import connected_components

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 10)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        (r.node, r.cluster_id) for r in connected_components(df).collect()
    }
    # union-find ground truth
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        parent[find(a)] = find(b)
    for a, b in edges:
        union(a, b)
    nodes = {n for e in edges for n in e}
    roots = {}
    for n in nodes:
        roots.setdefault(find(n), []).append(n)
    expect = {(n, min(members)) for members in roots.values() for n in members}
    assert got == expect


def test_connected_components_long_chain(spark):
    from scida_spark.functions.dedup import connected_components

    # diameter-30 chain — exercises multi-round convergence
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert set(got.keys()) == set(range(31))
