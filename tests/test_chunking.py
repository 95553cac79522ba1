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
