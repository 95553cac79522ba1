"""Streaming incremental-dedup ingest: waves of document files flow
through foreachBatch; each batch is deduped within itself and against
the persisted signature index of prior survivors (keep-history-first).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scida_spark.streaming.ingest import incremental_dedup_ingest

SCHEMA = "doc_id long, text string"

BASE = [
    "the quick brown fox jumps over the lazy dog near the quiet river bank today",
    "a distributed query engine partitions data across many executors to scan in parallel",
    "minhash signatures approximate jaccard similarity between shingle sets of documents",
    "structured streaming processes unbounded data as a sequence of small batch jobs",
    "column pruning and predicate pushdown reach the parquet scan when plans are declarative",
]


def _near(text: str) -> str:
    words = text.split()
    words[3] = words[3] + "x"
    return " ".join(words)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "input": tmp_path / "in",
        "corpus": tmp_path / "corpus",
        "index": tmp_path / "index",
        "ckpt": tmp_path / "ckpt",
    }
    d["input"].mkdir()
    return {k: str(v) for k, v in d.items()}


def _write_wave(path: str, rows: list[tuple[int, str]]) -> None:
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path)


def _run(spark, dirs):
    q = incremental_dedup_ingest(
        spark,
        dirs["input"],
        SCHEMA,
        corpus_dir=dirs["corpus"],
        index_dir=dirs["index"],
        checkpoint_dir=dirs["ckpt"],
        num_perm=64,
        bands=32,
        threshold=0.5,
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_incremental_dedup_ingest(spark, dirs):
    # Wave 1: five distinct documents.
    _write_wave(f"{dirs['input']}/w1.parquet", list(enumerate(BASE, start=1)))
    _run(spark, dirs)
    got1 = {
        r.doc_id for r in spark.read.parquet(dirs["corpus"]).select("doc_id").collect()
    }
    assert got1 == {1, 2, 3, 4, 5}

    # Wave 2: 11 = exact copy of 1 (cross-batch), 12 = near-dup of 2
    # (cross-batch), 13 = new, 14/15 identical (exact within batch),
    # 16 = near-dup of 14 (within batch).
    fresh14 = "language identification uses character ngram frequencies as a cheap robust signal"
    _write_wave(
        f"{dirs['input']}/w2.parquet",
        [
            (11, BASE[0]),
            (12, _near(BASE[1])),
            (13, "benchmark decontamination removes training documents overlapping the evaluation suites from the final corpus before release"),
            (14, fresh14),
            (15, fresh14),
            (16, _near(fresh14)),
        ],
    )
    _run(spark, dirs)
    got2 = {
        r.doc_id for r in spark.read.parquet(dirs["corpus"]).select("doc_id").collect()
    }
    assert got2 == {1, 2, 3, 4, 5, 13, 14}

    # Wave 3: 17 near-duplicates 13 — a WAVE-2 survivor — proving the
    # index was extended with wave-2 acceptances; 18 is new; 19 is a
    # SHORT new doc (2 tokens → empty 3-gram shingle set).
    _write_wave(
        f"{dirs['input']}/w3.parquet",
        [
            (17, _near("benchmark decontamination removes training documents overlapping the evaluation suites from the final corpus before release")),
            (18, "vectorized arrow batches move columnar data between the jvm and python workers"),
            (19, "short doc"),
        ],
    )
    _run(spark, dirs)
    got3 = {
        r.doc_id for r in spark.read.parquet(dirs["corpus"]).select("doc_id").collect()
    }
    assert got3 == {1, 2, 3, 4, 5, 13, 14, 18, 19}

    # Wave 4: 20 exactly duplicates the SHORT doc 19 — invisible to
    # MinHash (no shingles, no bands), caught only by the digest index.
    _write_wave(f"{dirs['input']}/w4.parquet", [(20, "short doc")])
    _run(spark, dirs)
    got4 = {
        r.doc_id for r in spark.read.parquet(dirs["corpus"]).select("doc_id").collect()
    }
    assert got4 == {1, 2, 3, 4, 5, 13, 14, 18, 19}

    # The index holds bands/shingles ONLY for accepted documents with
    # shingles (the short doc 19 has none), and one digest per
    # accepted doc.
    idx_docs = {
        r.doc
        for r in spark.read.parquet(f"{dirs['index']}/bands").select("doc").collect()
    }
    assert idx_docs == got4 - {19}
    sh_docs = {
        r.doc
        for r in spark.read.parquet(f"{dirs['index']}/shingles").select("doc").collect()
    }
    assert sh_docs == got4
    assert spark.read.parquet(f"{dirs['index']}/digests").count() == len(got4)


def test_ingest_batch_writes_idempotent(spark, dirs):
    """Replaying a batch id overwrites its own output (no duplicates)."""
    _write_wave(f"{dirs['input']}/w1.parquet", list(enumerate(BASE, start=1)))
    _run(spark, dirs)
    n1 = spark.read.parquet(dirs["corpus"]).count()
    # Simulate a replay of batch 0 by calling the foreachBatch body
    # again through a fresh stream with a WIPED checkpoint (Spark will
    # re-deliver the same file as batch 0 against the existing sinks).
    import shutil

    shutil.rmtree(dirs["ckpt"])
    _run(spark, dirs)
    got = spark.read.parquet(dirs["corpus"])
    assert got.count() == n1
    assert got.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


# --------------------------------------------------------------------------
# Vector index ingest
# --------------------------------------------------------------------------


def test_vector_index_ingest_accumulates_and_queries(spark, tmp_path):
    import numpy as np

    from scida_spark.functions.similarity import (
        load_pq_codebooks,
        pq_topk_from_encoded,
    )
    from scida_spark.streaming.ingest import vector_index_ingest

    rng = np.random.RandomState(3)
    in_dir = tmp_path / "vin"
    in_dir.mkdir()
    idx = str(tmp_path / "vidx")
    ck = str(tmp_path / "vck")
    schema = "vec_id long, embedding array<double>"

    def wave(path, ids):
        vecs = rng.standard_normal((len(ids), 16))
        pd.DataFrame(
            {"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]}
        ).to_parquet(path)

    wave(f"{in_dir}/w1.parquet", list(range(0, 120)))
    q = vector_index_ingest(
        spark, str(in_dir), schema, index_dir=idx, checkpoint_dir=ck,
        m=4, nbits=4,
    )
    q.awaitTermination(120)
    wave(f"{in_dir}/w2.parquet", list(range(120, 260)))
    q = vector_index_ingest(
        spark, str(in_dir), schema, index_dir=idx, checkpoint_dir=ck,
        m=4, nbits=4,
    )
    q.awaitTermination(120)

    codes = spark.read.parquet(f"{idx}/codes")
    vecs = spark.read.parquet(f"{idx}/vectors")
    # Every ingested vector encoded exactly once, m bytes each.
    assert codes.count() == 260
    assert codes.select("vec_id").distinct().count() == 260
    assert all(len(r["code"]) == 4 for r in codes.limit(10).collect())
    # Query the ACCUMULATED index: results must equal encoding the full
    # corpus fresh with the SAME persisted codebooks (cross-batch
    # consistency — codebooks were trained once, on wave 1).
    cb = load_pq_codebooks(spark, f"{idx}/codebooks")
    queries = vecs.filter(F.col("vec_id") < 3)
    got = sorted(
        (r["query_id"], r["cand_id"])
        for r in pq_topk_from_encoded(codes, vecs, cb, queries, k=5).collect()
    )
    from scida_spark.functions.similarity import pq_encode

    fresh = pq_encode(vecs, cb)
    want = sorted(
        (r["query_id"], r["cand_id"])
        for r in pq_topk_from_encoded(fresh, vecs, cb, queries, k=5).collect()
    )
    assert got == want and len(got) == 15


def test_vector_index_compaction_preserves_query_results(spark, tmp_path):
    """The full index lifecycle: stream waves in, COMPACT the
    batch-fragmented code/vector dirs (operators/maintenance.py), and
    query the compacted index — results must be identical to querying
    the fragmented one."""
    import numpy as np

    from scida_spark.functions.similarity import (
        load_pq_codebooks,
        pq_topk_from_encoded,
    )
    from scida_spark.operators.maintenance import compact_parquet, dir_stats
    from scida_spark.streaming.ingest import vector_index_ingest

    rng = np.random.RandomState(11)
    in_dir = tmp_path / "vin"
    in_dir.mkdir()
    idx = str(tmp_path / "vidx")
    ck = str(tmp_path / "vck")
    schema = "vec_id long, embedding array<double>"
    for w in range(3):
        ids = list(range(w * 80, (w + 1) * 80))
        vecs = rng.standard_normal((len(ids), 16))
        pd.DataFrame(
            {"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]}
        ).to_parquet(f"{in_dir}/w{w}.parquet")
        q = vector_index_ingest(
            spark, str(in_dir), schema, index_dir=idx, checkpoint_dir=ck,
            m=4, nbits=4,
        )
        q.awaitTermination(120)

    cb = load_pq_codebooks(spark, f"{idx}/codebooks")
    codes = spark.read.parquet(f"{idx}/codes").select("vec_id", "code")
    vecs_df = spark.read.parquet(f"{idx}/vectors").select("vec_id", "embedding")
    queries = vecs_df.filter(F.col("vec_id") < 3)
    before = sorted(
        (r["query_id"], r["cand_id"], r["rank"])
        for r in pq_topk_from_encoded(codes, vecs_df, cb, queries, k=5).collect()
    )

    n_frag, total = dir_stats(f"{idx}/codes")
    assert n_frag >= 3
    rep = compact_parquet(spark, f"{idx}/codes", str(tmp_path / "codes_c"),
                          target_bytes=total)
    assert rep["files_after"] < n_frag
    compact_parquet(spark, f"{idx}/vectors", str(tmp_path / "vecs_c"),
                    target_bytes=1 << 30)
    codes_c = spark.read.parquet(str(tmp_path / "codes_c")).select("vec_id", "code")
    vecs_c = spark.read.parquet(str(tmp_path / "vecs_c")).select("vec_id", "embedding")
    after = sorted(
        (r["query_id"], r["cand_id"], r["rank"])
        for r in pq_topk_from_encoded(codes_c, vecs_c, cb, queries, k=5).collect()
    )
    assert before == after and len(after) == 15


# ---------------------------------------------------------------------------
# Streaming span-dedup (r9): rolling ingest of span-count partials +
# read-time masking == batch-mode mask_hot_spans of the concatenation.
# ---------------------------------------------------------------------------

BOILER = "all rights reserved this page is licensed under creative commons attribution"


def _span_rows():
    """3 waves; the boilerplate span appears once per wave — hot only
    once the corpus is concatenated (cross-batch hotness)."""
    return [
        [(1, "alpha beta gamma " + BOILER + " delta epsilon"),
         (2, "totally unrelated words about query engines and parquet scans here")],
        [(3, BOILER + " plus some unique trailing content of its own"),
         (4, "another independent document mentioning executors and shuffles")],
        [(5, "prefix words then " + BOILER + " and a suffix"),
         (6, "final unrelated filler document with enough tokens to matter")],
    ]


def test_span_ingest_equals_batch_mode(spark, dirs):
    """N-batch ingest + read_masked_corpus ≡ batch-mode mask_hot_spans
    over the concatenation — the Lee-et-al rolling regime, exact."""
    import os

    from scida_spark.functions.spans import hot_spans, mask_hot_spans
    from scida_spark.streaming.ingest import (
        compact_span_index,
        read_masked_corpus,
        span_index_ingest,
    )

    waves = _span_rows()
    k = 8
    for i, rows in enumerate(waves):
        _write_wave(os.path.join(dirs["input"], f"wave{i}.parquet"), rows)
        q = span_index_ingest(
            spark, dirs["input"], SCHEMA,
            corpus_dir=dirs["corpus"], index_dir=dirs["index"],
            checkpoint_dir=dirs["ckpt"], k=k,
        )
        q.awaitTermination(120)
        assert not q.isActive

    got = {
        (r["doc_id"], r["masked"], r["n_masked"])
        for r in read_masked_corpus(
            spark, dirs["corpus"], dirs["index"], k=k, min_docs=2
        ).select("doc_id", "masked", "n_masked").collect()
    }
    all_docs = spark.createDataFrame(
        [t for w in waves for t in w], SCHEMA
    )
    hot = hot_spans(all_docs, "text", k, min_docs=2)
    want = {
        (r["doc_id"], r["masked"], r["n_masked"])
        for r in mask_hot_spans(all_docs, hot, "doc_id", "text", k)
        .select("doc_id", "masked", "n_masked").collect()
    }
    assert got == want
    # the boilerplate actually got masked (hot only across batches:
    # once per wave, never twice within one)
    masked_docs = {d for d, m, n in got if n > 0}
    assert masked_docs == {1, 3, 5}

    # compaction folds partials without changing the answer
    compact_span_index(spark, dirs["index"])
    after = {
        (r["doc_id"], r["masked"], r["n_masked"])
        for r in read_masked_corpus(
            spark, dirs["corpus"], dirs["index"], k=k, min_docs=2
        ).select("doc_id", "masked", "n_masked").collect()
    }
    assert after == got
    spans_root = os.path.join(dirs["index"], "spans")
    assert os.listdir(spans_root) == ["batch_id=-1"] or sorted(
        d for d in os.listdir(spans_root) if d.startswith("batch_id=")
    ) == ["batch_id=-1"]


# --------------------------------------------------------------------------
# Takedown deletions + transactional compaction of the signature index
# --------------------------------------------------------------------------


def test_takedown_unblocks_resubmission_and_compaction_purges(spark, dirs):
    """A tombstoned doc (1) drops from the corpus view immediately,
    (2) stops blocking an exact or near-dup resubmission at the next
    batch, and (3) is physically purged from corpus + all three index
    substores by the transactional compaction, which clears the
    tombstones and stays a fixed point."""
    import os

    from scida_spark.streaming.ingest import (
        compact_dedup_index,
        delete_ingested_docs,
        read_accepted_corpus,
        read_ingest_deletes,
    )

    # wave 1: 5 distinct docs, all accepted
    _write_wave(
        os.path.join(dirs["input"], "w1.parquet"),
        [(i, BASE[i]) for i in range(5)],
    )
    _run(spark, dirs)
    assert read_accepted_corpus(spark, dirs["corpus"]).count() == 5

    # take down doc 2 (content removed: right-to-be-forgotten)
    delete_ingested_docs(spark, dirs["index"], [2], batch_id=100)
    masked = read_accepted_corpus(spark, dirs["corpus"], dirs["index"])
    assert sorted(r["doc_id"] for r in masked.collect()) == [0, 1, 3, 4]

    # wave 2: an EXACT copy of doc 2's text (new id 12) and a NEAR dup
    # of it (id 13) — both must now be admitted; an exact copy of the
    # still-live doc 0 (id 10) must still be dropped
    _write_wave(
        os.path.join(dirs["input"], "w2.parquet"),
        [(10, BASE[0]), (12, BASE[2]), (13, _near(BASE[2]))],
    )
    _run(spark, dirs)
    after = read_accepted_corpus(spark, dirs["corpus"], dirs["index"])
    ids = sorted(r["doc_id"] for r in after.collect())
    # 12 in, 13 deduped against 12 WITHIN the batch (min-id wins), 10 out
    assert 12 in ids and 10 not in ids and 2 not in ids

    # compaction: physical purge + tombstone clear, serve fixed point
    before_rows = sorted(
        (r["doc_id"], r["text"]) for r in after.collect()
    )
    folded = compact_dedup_index(
        spark, dirs["index"], corpus_dir=dirs["corpus"]
    )
    assert folded >= 1
    assert read_ingest_deletes(spark, dirs["index"]) is None
    post = read_accepted_corpus(spark, dirs["corpus"], dirs["index"])
    assert sorted((r["doc_id"], r["text"]) for r in post.collect()) == before_rows
    # the purged doc's signatures are gone from every substore
    for sub in ("bands", "shingles"):
        part = spark.read.parquet(os.path.join(dirs["index"], sub))
        assert part.filter(F.col("doc") == 2).count() == 0
    dig = spark.read.parquet(os.path.join(dirs["index"], "digests"))
    assert dig.filter(F.col("doc") == 2).count() == 0
    # base partial only
    assert sorted(
        d
        for d in os.listdir(os.path.join(dirs["index"], "bands"))
        if d.startswith("batch_id=")
    ) == ["batch_id=-1"]

    # wave 3 on the compacted index: still keep-history-first
    _write_wave(
        os.path.join(dirs["input"], "w3.parquet"),
        [(20, BASE[1]), (21, "entirely new content about vector search")],
    )
    _run(spark, dirs)
    final = read_accepted_corpus(spark, dirs["corpus"], dirs["index"])
    fids = {r["doc_id"] for r in final.collect()}
    assert 21 in fids and 20 not in fids


def test_compaction_without_deletes_is_pure_fold(spark, dirs):
    import os

    from scida_spark.streaming.ingest import (
        compact_dedup_index,
        read_accepted_corpus,
    )

    _write_wave(
        os.path.join(dirs["input"], "w1.parquet"),
        [(i, BASE[i]) for i in range(3)],
    )
    _run(spark, dirs)
    before = sorted(
        r["doc_id"]
        for r in read_accepted_corpus(spark, dirs["corpus"]).collect()
    )
    bands_before = spark.read.parquet(
        os.path.join(dirs["index"], "bands")
    ).count()
    assert compact_dedup_index(spark, dirs["index"]) >= 1
    assert (
        spark.read.parquet(os.path.join(dirs["index"], "bands")).count()
        == bands_before
    )
    # corpus untouched (no corpus_dir passed, no deletes anyway)
    assert (
        sorted(
            r["doc_id"]
            for r in read_accepted_corpus(spark, dirs["corpus"]).collect()
        )
        == before
    )
