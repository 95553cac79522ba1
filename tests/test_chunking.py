"""Document chunking (functions/chunking.py) vs a naive oracle:
coverage, overlap, edge sizes, and the no-shuffle plan contract."""

from __future__ import annotations

import random

import pytest

from scida_spark.functions.chunking import chunk_documents


def _naive(text, chunk, overlap):
    toks = text.strip().split(" ")
    n = len(toks)
    step = chunk - overlap
    nchunks = 1 + -(-max(n - chunk, 0) // step)
    out = []
    for i in range(nchunks):
        piece = toks[i * step : i * step + chunk]
        out.append((i, " ".join(piece), len(piece)))
    return out


def test_chunks_match_oracle_randomized(spark):
    rng = random.Random(5)
    corpus = [
        (i, " ".join(f"t{rng.randint(0, 9)}" for _ in range(rng.randint(1, 57))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    for chunk, ov in [(16, 0), (16, 4), (8, 7), (100, 10)]:
        got = {}
        for r in chunk_documents(docs, "doc_id", "text", chunk, ov).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
            )
        for doc_id, text in corpus:
            assert sorted(got[doc_id]) == _naive(text, chunk, ov), (
                doc_id,
                chunk,
                ov,
            )


def test_coverage_and_overlap(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(str(i) for i in range(1, 11)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(docs, "doc_id", "text", 8, 4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_text"] for r in rows] == [
        "1 2 3 4 5 6 7 8",
        "5 6 7 8 9 10",
    ]
    # every token covered, consecutive chunks share `overlap` tokens
    assert set(" ".join(r["chunk_text"] for r in rows).split()) == {
        str(i) for i in range(1, 11)
    }


def test_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    rows = chunk_documents(docs, "doc_id", "text", 128, 16).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b c"


def test_invalid_overlap_raises(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", 8, 8)


def test_plan_is_map_only(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    out = chunk_documents(docs, "doc_id", "text", 2, 1)
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in p and "EvalPython" not in p


# --------------------------------------------------------------------------
# Content-defined chunking (r15)
# --------------------------------------------------------------------------


def _cdc_oracle(did, t, k=16, D=32):
    import hashlib

    n = len(t)
    if n == 0:
        return []
    cuts = [
        i + k - 1
        for i in range(1, n - k + 2)
        if int(hashlib.md5(t[i - 1 : i - 1 + k].encode()).hexdigest()[:8], 16)
        % D
        == 0
    ]
    bs = sorted(set([0] + cuts + [n]))
    return [
        (
            did,
            j - 1,
            bs[j - 1] + 1,
            bs[j] - bs[j - 1],
            hashlib.md5(
                t[bs[j - 1] : bs[j]].encode()
            ).hexdigest(),
        )
        for j in range(1, len(bs))
    ]


def test_cdc_chunks_match_reference_and_partition_text(spark):
    """cdc_chunks == the rolling-boundary reference on randomized
    docs (empty, sub-k, boundary-free, long), chunks PARTITION the
    text exactly, and boundaries are content-defined: a shifted copy
    shares its interior chunk hashes."""
    import random

    from scida_spark.functions.chunking import cdc_chunks, cdc_dup_doc_flags

    random.seed(21)
    alph = "abcdefgh "

    def rnd(n):
        return "".join(random.choice(alph) for _ in range(n))

    base = rnd(900)
    rows = [
        (0, base),
        (1, "SHIFTED!! " + base),  # offset copy: interior chunks equal
        (2, rnd(400)),
        (3, ""),
        (4, "sub-k"),
        (5, base),  # exact copy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["start"], r["n_chars"], r["chunk_hash"])
        for r in cdc_chunks(df, "doc_id", "text", 16, 32).collect()
    )
    want = sorted(sum((_cdc_oracle(d, t) for d, t in rows), []))
    assert got == want
    # chunks partition each doc: starts/lens tile [1..len] exactly
    for did, t in rows:
        cs = sorted((s, L) for d, _, s, L, _ in got if d == did)
        pos = 1
        for s, L in cs:
            assert s == pos and L >= 1
            pos += L
        assert pos == len(t) + 1 or (len(t) == 0 and not cs)
    # shift resilience + dup flags
    h0 = {h for d, *_, h in got if d == 0}
    h1 = {h for d, *_, h in got if d == 1}
    assert len(h0 & h1) >= len(h0) - 2  # all but the first chunk(s)
    flags = {
        r["doc_id"]: r["shares_chunk"]
        for r in cdc_dup_doc_flags(
            cdc_chunks(df, "doc_id", "text", 16, 32), "doc_id"
        ).collect()
    }
    assert flags[0] and flags[1] and flags[5]
    assert not flags[2] and not flags[4]


def test_cdc_chunks_partitioning_invariant_and_no_udf(spark):
    from scida_spark.functions.chunking import cdc_chunks

    rows = [(i, ("w%d " % (i % 3)) * 60) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, cdc_chunks(df.coalesce(1), "doc_id", "text").collect()))
    b = sorted(
        map(tuple, cdc_chunks(df.repartition(7), "doc_id", "text").collect())
    )
    assert a == b
    ch = cdc_chunks(df, "doc_id", "text")
    p = ch._sc._jvm.PythonSQLUtils.explainString(
        ch._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in p  # pure JVM, no Python in the plan
    assert "Exchange" not in p  # map-only: chunking never shuffles
