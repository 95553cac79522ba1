"""Incremental retrieval-index store (streaming/postings.py): serve
from the accumulated postings/doclen/stats partials must equal a batch
bm25/QL rebuild over the full corpus BIT-FOR-BIT, before and after
compaction; bucket pruning must reach the parquet scan."""

from __future__ import annotations

import os
import zlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scida_spark.functions.retrieval import bm25_topk, query_likelihood_topk
from scida_spark.streaming.postings import (
    DEFAULT_BUCKETS,
    bm25_topk_from_store,
    compact_postings,
    incremental_postings_ingest,
    ql_topk_from_store,
    read_corpus_stats,
    term_bucket,
)

SCHEMA = "doc_id long, text string"

TEXTS = [
    "hash join order scan",
    "stream window agg window",
    "the dup the dup the",
    "sort merge join hash hash",
    "scan scan scan",
    "window stream batch",
    "the quick brown fox",
    "join hash stream",
    "",
]

QUERIES = [(0, "hash join"), (1, "stream window"), (2, "the dup")]


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "input": tmp_path / "in",
        "store": tmp_path / "store",
        "ckpt": tmp_path / "ckpt",
    }
    d["input"].mkdir()
    return {k: str(v) for k, v in d.items()}


def _wave(path: str, lo: int, hi: int) -> None:
    rows = [
        (i, TEXTS[i % len(TEXTS)] + (" extra" if i % 4 == 0 else ""))
        for i in range(lo, hi)
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path)


def _ingest(spark, dirs, **kw):
    q = incremental_postings_ingest(
        spark,
        dirs["input"],
        SCHEMA,
        store_dir=dirs["store"],
        checkpoint_dir=dirs["ckpt"],
        **kw,
    )
    q.awaitTermination(120)
    assert not q.isActive


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in df.collect()
    )


def test_serve_equals_batch_bitwise(spark, dirs):
    """3 ingested waves; bm25 and QL served from the store must match
    the batch rankers over the concatenated corpus EXACTLY (same
    doubles — shared scorer, identical index content)."""
    _wave(os.path.join(dirs["input"], "w0.parquet"), 0, 30)
    _ingest(spark, dirs, max_files_per_trigger=1)
    _wave(os.path.join(dirs["input"], "w1.parquet"), 30, 55)
    _wave(os.path.join(dirs["input"], "w2.parquet"), 55, 80)
    _ingest(spark, dirs, max_files_per_trigger=1)

    # the store really is incremental: one dir per micro-batch
    batches = [
        d
        for d in os.listdir(os.path.join(dirs["store"], "postings"))
        if d.startswith("batch_id=")
    ]
    assert len(batches) == 3, batches

    docs = spark.read.schema(SCHEMA).parquet(dirs["input"])
    assert read_corpus_stats(spark, dirs["store"]) == (
        80,
        docs.select(
            F.coalesce(
                F.sum(F.size(F.split(F.trim("text"), r"\s+"))), F.lit(0)
            )
        ).first()[0],
    )

    got_bm = _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5))
    want_bm = _rows(bm25_topk(docs, QUERIES, k=5))
    assert got_bm == want_bm and len(got_bm) > 0

    got_ql = _rows(ql_topk_from_store(spark, dirs["store"], QUERIES, k=5))
    want_ql = _rows(query_likelihood_topk(docs, QUERIES, k=5))
    assert got_ql == want_ql and len(got_ql) > 0


def test_compaction_is_fixed_point(spark, dirs):
    _wave(os.path.join(dirs["input"], "w0.parquet"), 0, 20)
    _ingest(spark, dirs, max_files_per_trigger=1)
    _wave(os.path.join(dirs["input"], "w1.parquet"), 20, 45)
    _ingest(spark, dirs, max_files_per_trigger=1)

    before_bm = _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES))
    before_ql = _rows(ql_topk_from_store(spark, dirs["store"], QUERIES))
    before_cs = read_corpus_stats(spark, dirs["store"])
    assert compact_postings(spark, dirs["store"]) == 2
    for sub in ("postings", "doclen", "stats"):
        dirs_left = [
            d
            for d in os.listdir(os.path.join(dirs["store"], sub))
            if d.startswith("batch_id=")
        ]
        assert dirs_left == ["batch_id=-1"], (sub, dirs_left)
    assert read_corpus_stats(spark, dirs["store"]) == before_cs
    assert _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES)) == before_bm
    assert _rows(ql_topk_from_store(spark, dirs["store"], QUERIES)) == before_ql
    # compacting a compacted store is a no-op
    assert compact_postings(spark, dirs["store"]) == 0


def test_replayed_batch_is_idempotent(spark, dirs):
    """Re-running the SAME writer for a batch id overwrites instead of
    double-counting (the batch_id=N overwrite contract)."""
    from scida_spark.streaming.postings import postings_writer

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(25)], SCHEMA
    )
    w = postings_writer(dirs["store"])
    w(docs, 0)
    first = _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES))
    w(docs, 0)  # replay
    assert read_corpus_stats(spark, dirs["store"])[0] == 25
    assert _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES)) == first


def test_bucket_function_matches_jvm(spark):
    """term_bucket (zlib.crc32) must equal the JVM crc32 the writer
    partitions by, or pruning would silently drop postings."""
    terms = ["hash", "join", "stream", "window", "the", "dup", "zzz", "é"]
    df = spark.createDataFrame([(t,) for t in terms], "tok string")
    got = {
        r["tok"]: r["b"]
        for r in df.select(
            "tok",
            (F.crc32(F.col("tok").cast("binary")) % DEFAULT_BUCKETS)
            .cast("int")
            .alias("b"),
        ).collect()
    }
    assert got == {t: term_bucket(t) for t in terms}


def test_bucket_pruning_reaches_scan(spark, dirs):
    """The served plan must show partition pruning on tok_bucket —
    the point of sharding the postings (only the query terms' buckets
    are read)."""
    from scida_spark.streaming.postings import read_postings, postings_writer

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(25)], SCHEMA
    )
    postings_writer(dirs["store"])(docs, 0)
    p = read_postings(spark, dirs["store"], terms={"hash", "join"})
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "tok_bucket" in plan
    # the scan's partition filter prunes buckets: reading ALL postings
    # would list every bucket dir; the pruned scan reads at most the
    # buckets of the two terms.
    want = {term_bucket("hash"), term_bucket("join")}
    n_parts = p.select("tok_bucket").distinct().count()
    assert n_parts <= len(want)


def test_meta_n_buckets_persisted_and_validated(spark, dirs):
    """The store is self-describing (r11 ADVICE #1): n_buckets is
    written to _meta.json at ingest, readers resolve it from there, and
    a conflicting explicit value (reader or appending writer) raises
    instead of silently pruning / sharding the wrong buckets."""
    from scida_spark.streaming.postings import (
        postings_writer,
        read_postings,
        store_meta,
    )

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(25)], SCHEMA
    )
    postings_writer(dirs["store"], n_buckets=8)(docs, 0)
    assert store_meta(dirs["store"])["n_buckets"] == 8

    # reader with no explicit value uses the store's own meta (NOT the
    # 16-bucket default) — serve works and pruning stays consistent
    rows = _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5))
    assert rows == _rows(bm25_topk(docs, QUERIES, k=5))

    # conflicting reader value → refuse, don't mis-prune
    with pytest.raises(ValueError, match="n_buckets"):
        read_postings(spark, dirs["store"], terms={"hash"}, n_buckets=16)
    # conflicting appending writer → refuse, don't mix shardings
    with pytest.raises(ValueError, match="n_buckets"):
        postings_writer(dirs["store"], n_buckets=16)(docs, 1)


@pytest.fixture(params=["local", "object"])
def fs_backend(request, tmp_path):
    """Run a test's storefs traffic on the local-FS backend and again
    on the rename-free object-store emulation mounted over the same
    tmp dir (r15, closes r14 VERDICT next #4: the storekit port
    contract, proven parametrically)."""
    if request.param == "local":
        yield "local"
        return
    from scida_spark.streaming import storefs
    from scida_spark.streaming.objstore import mount_fake_object_store

    store, _ = mount_fake_object_store(str(tmp_path))
    try:
        yield "object"
        assert store.renames_used == 0  # no directory move ever leaked
    finally:
        storefs.unregister_backend(str(tmp_path))


def test_storefs_crash_recovery_states(tmp_path, fs_backend):
    """recover_pending repairs every interruption point of the
    scratch → manifest → delete → promote sequence (r11 ADVICE #2) —
    on BOTH backends: POSIX rename semantics and the five-primitive
    object store (overwrite-copy + marker + delete promote)."""
    import shutil

    from scida_spark.streaming import storefs

    def mk_store():
        root = tmp_path / "s"
        shutil.rmtree(root, ignore_errors=True)
        for b in (0, 1):
            d = root / f"batch_id={b}"
            d.mkdir(parents=True)
            pd.DataFrame({"v": [b]}).to_parquet(d / "part.parquet")
        return str(root)

    def mk_scratch(root):
        sc = storefs.scratch_dir(root)
        os.makedirs(sc)
        pd.DataFrame({"v": [0, 1]}).to_parquet(
            os.path.join(sc, "part.parquet")
        )

    # A: crash BEFORE the manifest commit point — the (possibly torn)
    # scratch is dropped, the store is untouched
    root = mk_store()
    mk_scratch(root)
    assert storefs.recover_pending(root)
    assert storefs.list_batches(root) == ["batch_id=0", "batch_id=1"]
    assert not os.path.isdir(storefs.scratch_dir(root))

    # B: crash right AFTER the manifest commit — the fold is replayed:
    # batches retired, scratch promoted to the base
    root = mk_store()
    mk_scratch(root)
    storefs.write_json_atomic(
        os.path.join(root, storefs.MANIFEST),
        {"folded": ["batch_id=0", "batch_id=1"]},
    )
    assert storefs.recover_pending(root)
    assert storefs.list_batches(root) == []
    assert os.path.isdir(os.path.join(root, "batch_id=-1"))
    assert not os.path.isfile(os.path.join(root, storefs.MANIFEST))

    # C: crash MID-DELETE (one batch already gone) — same outcome
    root = mk_store()
    mk_scratch(root)
    storefs.write_json_atomic(
        os.path.join(root, storefs.MANIFEST),
        {"folded": ["batch_id=0", "batch_id=1"]},
    )
    shutil.rmtree(os.path.join(root, "batch_id=0"))
    assert storefs.recover_pending(root)
    assert storefs.list_batches(root) == []
    assert os.path.isdir(os.path.join(root, "batch_id=-1"))

    # D: crash AFTER the promote, before the manifest removal — the
    # leftover manifest is cleared, the promoted base survives
    root = mk_store()
    mk_scratch(root)
    storefs.promote_compacted(root, ["batch_id=0", "batch_id=1"])
    storefs.write_json_atomic(
        os.path.join(root, storefs.MANIFEST), {"folded": []}
    )
    assert storefs.recover_pending(root)
    assert os.path.isdir(os.path.join(root, "batch_id=-1"))
    assert not os.path.isfile(os.path.join(root, storefs.MANIFEST))

    # clean store: nothing to do
    assert not storefs.recover_pending(root)


def test_objstore_replace_dir_crash_windows(tmp_path):
    """The object backend's rename-free promote (overwrite-copy +
    commit marker + source delete) converges from a crash at EVERY
    window: mid-copy (no marker — dst partial), post-marker mid-delete
    (src partial but dst complete). The mid-delete window is exactly
    where a naive copy-then-delete loses data if replayed from the
    top."""
    from scida_spark.streaming.objstore import FakeObjectStore, ObjectBackend

    def mk():
        import shutil

        shutil.rmtree(tmp_path / "o", ignore_errors=True)
        st = FakeObjectStore(str(tmp_path / "o"))
        be = ObjectBackend(st, str(tmp_path / "o"))
        for i in range(3):
            st.put(f"tmp/part{i}.parquet", b"new%d" % i)
        st.put("base/old.parquet", b"stale")
        return st, be

    src = str(tmp_path / "o" / "tmp")
    dst = str(tmp_path / "o" / "base")

    # clean run
    st, be = mk()
    be.replace_dir(src, dst)
    assert st.list_prefix("base") == [
        "base/part0.parquet", "base/part1.parquet", "base/part2.parquet"
    ]
    assert st.list_prefix("tmp") == []

    # crash mid-copy: only one object copied, stale dst partially
    # cleared, no marker — replay must fully rebuild dst from src
    st, be = mk()
    be.rmtree(dst)
    st.copy("tmp/part1.parquet", "base/part1.parquet")
    be.replace_dir(src, dst)  # the replay
    assert st.list_prefix("base") == [
        "base/part0.parquet", "base/part1.parquet", "base/part2.parquet"
    ]
    assert st.list_prefix("tmp") == []

    # crash post-marker mid-delete: copy complete, marker present,
    # one src object already deleted — replay must NOT recopy the
    # now-partial src over the complete dst
    st, be = mk()
    be.rmtree(dst)
    for i in range(3):
        st.copy(f"tmp/part{i}.parquet", f"base/part{i}.parquet")
    st.put("tmp/_MOVE_OK", b"")
    st.delete("tmp/part0.parquet")
    be.replace_dir(src, dst)  # the replay
    assert st.list_prefix("base") == [
        "base/part0.parquet", "base/part1.parquet", "base/part2.parquet"
    ]
    assert st.get("base/part0.parquet") == b"new0"
    assert st.list_prefix("tmp") == []


def test_object_backend_full_store_lifecycle(spark, dirs):
    """The UNCHANGED postings store modules run their whole lifecycle
    — 2-wave streaming ingest, serve == batch bitwise, transactional
    compaction, serve fixed point, crash healing — with every storefs
    call under the store root routed through the five-primitive
    object backend (r15: the storekit port contract, end-to-end)."""
    from scida_spark.streaming import storefs
    from scida_spark.streaming.objstore import mount_fake_object_store

    store, _ = mount_fake_object_store(dirs["store"])
    try:
        _wave(os.path.join(dirs["input"], "w0.parquet"), 0, 30)
        _ingest(spark, dirs)
        _wave(os.path.join(dirs["input"], "w1.parquet"), 30, 60)
        _ingest(spark, dirs)
        corpus = spark.createDataFrame(
            [
                (i, TEXTS[i % len(TEXTS)] + (" extra" if i % 4 == 0 else ""))
                for i in range(60)
            ],
            SCHEMA,
        )
        expect = _rows(bm25_topk(corpus, QUERIES, k=5))
        assert (
            _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5))
            == expect
        )
        compact_postings(spark, dirs["store"])
        assert (
            storefs.list_batches(os.path.join(dirs["store"], "postings"))
            == []
        )
        assert (
            _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5))
            == expect
        )
        assert store.renames_used == 0
    finally:
        storefs.unregister_backend(dirs["store"])


@pytest.fixture(params=["local", "object"])
def bdirs(request, dirs):
    """`dirs` with the store root optionally mounted on the rename-free
    object backend — the crash-heal tests run on BOTH backends (r15:
    the crash windows are where the backends genuinely differ)."""
    if request.param == "local":
        yield dirs
        return
    from scida_spark.streaming import storefs
    from scida_spark.streaming.objstore import mount_fake_object_store

    store, _ = mount_fake_object_store(dirs["store"])
    try:
        yield dirs
        assert store.renames_used == 0
    finally:
        storefs.unregister_backend(dirs["store"])


def test_compaction_crash_heals_on_next_read(spark, bdirs, monkeypatch):
    """A compaction killed right after its commit point must not lose
    (or double-count) any postings: the next store READ self-heals via
    recover_pending and serves the identical rankings. Parametrized
    over the POSIX and object-store backends."""
    dirs = bdirs
    from scida_spark.streaming import storefs
    from scida_spark.streaming.postings import postings_writer

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(40)], SCHEMA
    )
    w = postings_writer(dirs["store"])
    w(docs.filter(F.col("doc_id") < 20), 0)
    w(docs.filter(F.col("doc_id") >= 20), 1)
    before = _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES))

    # kill the fold at the commit point: every substore scratch and
    # the store-level txn manifest written (r13: ONE commit point for
    # all three substores), nothing retired or promoted yet
    real_finish = storefs._finish

    def boom(root, folded):
        raise RuntimeError("simulated crash at the commit point")

    monkeypatch.setattr(storefs, "_finish", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_postings(spark, dirs["store"])
    monkeypatch.setattr(storefs, "_finish", real_finish)

    # the crash window really exists (txn manifest + all scratches on
    # disk, batch partials untouched)
    assert os.path.isfile(
        os.path.join(dirs["store"], storefs.TXN_MANIFEST)
    )
    for sub in ("postings", "doclen", "stats"):
        root = os.path.join(dirs["store"], sub)
        assert os.path.isdir(storefs.scratch_dir(root))
        assert storefs.list_batches(root) == ["batch_id=0", "batch_id=1"]

    # the next serve heals the WHOLE store transactionally and returns
    # identical rankings
    assert _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES)) == before
    assert not os.path.isfile(
        os.path.join(dirs["store"], storefs.TXN_MANIFEST)
    )
    for sub in ("postings", "doclen", "stats"):
        assert storefs.list_batches(os.path.join(dirs["store"], sub)) == []
    # and a rerun compaction completes normally, still a fixed point
    compact_postings(spark, dirs["store"])
    assert _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES)) == before


def test_tombstone_deletes_serve_equals_batch(spark, dirs):
    """delete_docs (r12): serving after tombstones must equal a batch
    rebuild over corpus-minus-deleted BIT-for-bit; compaction applies
    the tombstones (delete store empties, rankings unchanged); deletes
    of unknown ids and re-deletes are no-ops."""
    from scida_spark.streaming.postings import (
        delete_docs,
        postings_writer,
        read_corpus_stats,
        read_deletes,
    )

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(40)], SCHEMA
    )
    w = postings_writer(dirs["store"])
    w(docs.filter(F.col("doc_id") < 20), 0)
    w(docs.filter(F.col("doc_id") >= 20), 1)

    gone = [3, 7, 21, 35]
    delete_docs(spark, dirs["store"], gone, 0)
    # re-delete one + delete a never-ingested id: both no-ops
    delete_docs(spark, dirs["store"], [3, 999], 1)

    remaining = docs.filter(~F.col("doc_id").isin(gone))
    want_bm = _rows(bm25_topk(remaining, QUERIES, k=5))
    want_ql = _rows(query_likelihood_topk(remaining, QUERIES, k=5))
    got_bm = _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5))
    got_ql = _rows(ql_topk_from_store(spark, dirs["store"], QUERIES, k=5))
    assert got_bm == want_bm and len(got_bm) > 0
    assert got_ql == want_ql

    # corpus stats: raw partials still include deleted docs (the read
    # path subtracts); after compaction the store itself is clean
    want_stats = (
        remaining.count(),
        remaining.select(
            F.coalesce(
                F.sum(F.size(F.split(F.trim("text"), r"\s+"))), F.lit(0)
            )
        ).first()[0],
    )
    compact_postings(spark, dirs["store"])
    assert read_deletes(spark, dirs["store"]) is None  # tombstones applied
    assert read_corpus_stats(spark, dirs["store"]) == want_stats
    assert _rows(
        bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5)
    ) == want_bm
    # deleted ids are physically gone from the folded doclen
    from scida_spark.streaming.postings import read_doclen

    assert (
        read_doclen(spark, dirs["store"])
        .filter(F.col("doc_id").isin(gone))
        .count()
        == 0
    )


def test_tombstone_on_compacted_store(spark, dirs):
    """Deleting AFTER compaction folds the base partial again — the
    apply path works without batch partials present."""
    from scida_spark.streaming.postings import delete_docs, postings_writer

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(30)], SCHEMA
    )
    postings_writer(dirs["store"])(docs, 0)
    compact_postings(spark, dirs["store"])
    delete_docs(spark, dirs["store"], [1, 2], 0)
    remaining = docs.filter(~F.col("doc_id").isin([1, 2]))
    want = _rows(bm25_topk(remaining, QUERIES, k=5))
    assert _rows(
        bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5)
    ) == want
    compact_postings(spark, dirs["store"])
    assert _rows(
        bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5)
    ) == want


def test_positional_store_phrase_serve_equals_batch(spark, dirs):
    """Positional postings (r12): phrase counts served from the store
    must equal the batch phrase_occurrences operator EXACTLY, survive
    compaction, respect tombstones, and refuse non-positional stores."""
    from scida_spark.functions.retrieval import phrase_occurrences
    from scida_spark.streaming.postings import (
        delete_docs,
        phrase_docs_from_store,
        postings_writer,
    )

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(36)], SCHEMA
    )
    w = postings_writer(dirs["store"], with_positions=True)
    w(docs.filter(F.col("doc_id") < 18), 0)
    w(docs.filter(F.col("doc_id") >= 18), 1)

    phrases = [
        ("p0", "the dup"),        # bigram with a repeated-word context
        ("p1", "scan scan"),      # overlapping self-bigram
        ("p2", "sort merge join"),  # trigram
        ("p3", "hash"),           # single term: occ = tf
        ("p4", "zz qq"),          # zero-hit
    ]

    def _rows_p(df):
        return sorted(
            (r["phrase_id"], r["doc_id"], r["phrase"], r["n_occ"])
            for r in df.collect()
        )

    want = _rows_p(phrase_occurrences(docs, phrases))
    got = _rows_p(phrase_docs_from_store(spark, dirs["store"], phrases))
    assert got == want and len(got) > 0

    # compaction keeps positional postings a fixed point
    assert compact_postings(spark, dirs["store"]) == 2
    assert _rows_p(phrase_docs_from_store(spark, dirs["store"], phrases)) == want

    # tombstones mask phrase serving too
    gone = sorted({d for _pid, d, _ph, _n in want})[:2]
    delete_docs(spark, dirs["store"], gone, 0)
    want2 = _rows_p(
        phrase_occurrences(docs.filter(~F.col("doc_id").isin(gone)), phrases)
    )
    assert _rows_p(phrase_docs_from_store(spark, dirs["store"], phrases)) == want2

    # ranked serving still works off the positional store (tf carried)
    assert (
        bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5).count() > 0
    )


def test_phrase_serve_requires_positions(spark, dirs):
    from scida_spark.streaming.postings import (
        phrase_docs_from_store,
        postings_writer,
    )

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(10)], SCHEMA
    )
    postings_writer(dirs["store"])(docs, 0)  # no positions
    with pytest.raises(ValueError, match="without positions"):
        phrase_docs_from_store(spark, dirs["store"], [("p0", "hash join")])


def test_min_cover_span_matches_brute_force(spark, dirs):
    """min_cover_span_from_store (r12): spans equal a pure-Python
    brute-force over every token window, for single- and multi-term
    queries, incl. repeated terms in the doc; docs missing a term emit
    nothing; tombstones respected."""
    from scida_spark.streaming.postings import (
        delete_docs,
        min_cover_span_from_store,
        postings_writer,
    )

    texts = [
        "a x x b",            # cover(a,b) = 4
        "b a",                # cover(a,b) = 2 (order-free)
        "a x b x x a b",      # best window is the tail 'a b' = 2
        "a a a",              # no b -> no row for (a,b)
        "q w e r t",          # cover(q,t) = 5
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    w = postings_writer(dirs["store"], with_positions=True)
    w(docs, 0)

    def brute(tokens, terms):
        best = None
        n = len(tokens)
        for i in range(n):
            for j in range(i, n):
                win = tokens[i : j + 1]
                if all(t in win for t in terms):
                    sp = j - i + 1
                    best = sp if best is None else min(best, sp)
        return best

    queries = [(0, "a b"), (1, "q t"), (2, "a"), (3, "zz")]
    got = {
        (r["query_id"], r["doc_id"]): r["span"]
        for r in min_cover_span_from_store(spark, dirs["store"], queries).collect()
    }
    want = {}
    for qid, q in queries:
        terms = sorted(set(q.split()))
        for d, tx in enumerate(texts):
            b = brute(tx.split(" "), terms)
            if b is not None:
                want[(qid, d)] = b
    assert got == want
    assert got[(0, 0)] == 4 and got[(0, 1)] == 2 and got[(0, 2)] == 2
    assert (0, 3) not in got  # missing term -> conjunctive filter drops

    # tombstone masks span serving too
    delete_docs(spark, dirs["store"], [0], 0)
    got2 = {
        (r["query_id"], r["doc_id"]): r["span"]
        for r in min_cover_span_from_store(spark, dirs["store"], queries).collect()
    }
    assert (0, 0) not in got2 and got2[(0, 1)] == 2


# ---------------------------------------------------------------------------
# r13: store-level transactions, single-writer lock, stats contract
# ---------------------------------------------------------------------------


def test_txn_crash_between_substores_heals_consistently(
    spark, bdirs, monkeypatch
):
    """The r12 ADVICE #3 window: a compaction that died after applying
    tombstones to doclen but before rewriting stats left
    read_corpus_stats overcounting. r13's single-txn commit makes that
    impossible — kill the apply after the FIRST substore fold and the
    next READ replays the WHOLE plan (all three folds + the tombstone
    clear) before serving. Parametrized over both backends."""
    dirs = bdirs
    from scida_spark.streaming import storefs
    from scida_spark.streaming.postings import (
        delete_docs,
        postings_writer,
        read_deletes,
        read_doclen,
    )

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(40)], SCHEMA
    )
    w = postings_writer(dirs["store"])
    w(docs.filter(F.col("doc_id") < 20), 0)
    w(docs.filter(F.col("doc_id") >= 20), 1)
    gone = [3, 7, 21]
    delete_docs(spark, dirs["store"], gone, 0)
    remaining = docs.filter(~F.col("doc_id").isin(gone))
    want_stats = (
        remaining.count(),
        remaining.select(
            F.coalesce(
                F.sum(F.size(F.split(F.trim("text"), r"\s+"))), F.lit(0)
            )
        ).first()[0],
    )
    want_bm = _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5))

    # die after the first substore's _finish (postings folded, doclen
    # and stats still staged, tombstones not yet cleared)
    real_finish = storefs._finish
    calls = {"n": 0}

    def flaky(root, folded):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("simulated crash mid-apply")
        real_finish(root, folded)

    monkeypatch.setattr(storefs, "_finish", flaky)
    with pytest.raises(RuntimeError, match="mid-apply"):
        compact_postings(spark, dirs["store"])
    monkeypatch.setattr(storefs, "_finish", real_finish)

    # the partial-apply window really exists: postings folded, doclen
    # partials still in place, txn manifest pending
    assert storefs.list_batches(os.path.join(dirs["store"], "postings")) == []
    assert storefs.list_batches(os.path.join(dirs["store"], "doclen")) == [
        "batch_id=0",
        "batch_id=1",
    ]
    assert os.path.isfile(os.path.join(dirs["store"], storefs.TXN_MANIFEST))

    # next read heals the WHOLE transaction first: stats are the
    # post-delete truth (the r12 sequence would have overcounted here)
    assert read_corpus_stats(spark, dirs["store"]) == want_stats
    assert not os.path.isfile(
        os.path.join(dirs["store"], storefs.TXN_MANIFEST)
    )
    assert read_deletes(spark, dirs["store"]) is None  # clear replayed
    assert (
        read_doclen(spark, dirs["store"])
        .filter(F.col("doc_id").isin(gone))
        .count()
        == 0
    )
    assert (
        _rows(bm25_topk_from_store(spark, dirs["store"], QUERIES, k=5))
        == want_bm
    )


def test_single_writer_lock_and_reader_hands_off(spark, dirs):
    """r12 ADVICE #4: a second maintainer must raise while the first
    is alive; a reader's recovery hooks must NOT heal (delete scratch /
    replay manifests) under a live maintainer's lock, and must heal as
    soon as the owner is provably dead."""
    from scida_spark.streaming import storefs
    from scida_spark.streaming.postings import postings_writer

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(10)], SCHEMA
    )
    postings_writer(dirs["store"])(docs, 0)

    # simulate a LIVE foreign maintainer (pid 1 is always alive)
    lock = os.path.join(dirs["store"], storefs.LOCK_FILE)
    storefs.write_json_atomic(lock, {"pid": 1})
    with pytest.raises(RuntimeError, match="single-writer"):
        compact_postings(spark, dirs["store"])

    # a live maintainer's working state is hands-off for readers
    proot = os.path.join(dirs["store"], "postings")
    os.makedirs(storefs.scratch_dir(proot))
    assert not storefs.recover_pending(proot)
    assert os.path.isdir(storefs.scratch_dir(proot))
    storefs.write_json_atomic(
        os.path.join(dirs["store"], storefs.TXN_MANIFEST),
        {"folds": [], "clear": []},
    )
    assert not storefs.recover_store(dirs["store"])

    # owner dies -> the same hooks heal (dead-pid lease semantics)
    storefs.write_json_atomic(lock, {"pid": 999999999})
    assert storefs.recover_store(dirs["store"])
    assert storefs.recover_pending(proot)
    assert not os.path.isdir(storefs.scratch_dir(proot))

    # and a new maintainer steals the dead lock and completes
    assert compact_postings(spark, dirs["store"]) == 1
    assert not os.path.isfile(lock)  # released on exit


def test_corpus_stats_live_contract_with_tombstones(spark, dirs):
    """r12 ADVICE #1: sharing read_corpus_stats() output across
    rankers must score identically to passing nothing, even with
    tombstones outstanding (the old path re-subtracted the deletes)."""
    from scida_spark.streaming.postings import delete_docs, postings_writer

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(30)], SCHEMA
    )
    postings_writer(dirs["store"])(docs, 0)
    delete_docs(spark, dirs["store"], [2, 5, 11], 0)

    cs = read_corpus_stats(spark, dirs["store"])  # LIVE (delete-adjusted)
    for fn in (bm25_topk_from_store, ql_topk_from_store):
        implicit = _rows(fn(spark, dirs["store"], QUERIES, k=5))
        shared = _rows(
            fn(spark, dirs["store"], QUERIES, k=5, corpus_stats=cs)
        )
        assert shared == implicit and len(shared) > 0


def test_meta_validates_every_ingest_param_on_reopen(spark, dirs):
    """r12 ADVICE #2: re-opening a store with a different
    with_positions / id_col / text_col must be refused — a mixed-
    schema store silently breaks phrase serving."""
    from scida_spark.streaming.postings import postings_writer

    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(5)], SCHEMA
    )
    postings_writer(dirs["store"], with_positions=True)(docs, 0)

    with pytest.raises(ValueError, match="with_positions"):
        postings_writer(dirs["store"], with_positions=False)(docs, 1)
    with pytest.raises(ValueError, match="id_col"):
        postings_writer(dirs["store"], id_col="uid", with_positions=True)(
            docs.withColumnRenamed("doc_id", "uid"), 1
        )
    # identical params keep appending fine
    postings_writer(dirs["store"], with_positions=True)(docs, 1)


def test_span_serving_tolerates_quote_terms(spark, dirs):
    """r12 ADVICE #5: a query term holding a single quote must not be
    rendered into raw SQL (parse crash) — and must actually match."""
    from scida_spark.streaming.postings import (
        min_cover_span_from_store,
        postings_writer,
    )

    docs = spark.createDataFrame(
        [(0, "i don't match sql injection don't"), (1, "no apostrophes here")],
        SCHEMA,
    )
    postings_writer(dirs["store"], with_positions=True)(docs, 0)
    got = {
        (r["query_id"], r["doc_id"]): r["span"]
        for r in min_cover_span_from_store(
            spark, dirs["store"], [(0, "don't match")]
        ).collect()
    }
    assert got == {(0, 0): 2}


# --------------------------------------------------------------------------
# Forward substore + RM3 served entirely from the index
# --------------------------------------------------------------------------


def test_doc_bucket_jvm_python_twin(spark):
    from scida_spark.streaming.postings import doc_bucket

    ids = [0, 1, 7, 12345, 999999999, 2**40 + 3]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").select(
        "doc_id",
        (F.crc32(F.col("doc_id").cast("string").cast("binary")) % 16)
        .cast("int")
        .alias("b"),
    )
    got = {r["doc_id"]: r["b"] for r in df.collect()}
    assert got == {i: doc_bucket(i, 16) for i in ids}


def test_rm3_from_store_equals_batch_bitwise(spark, dirs):
    """RM3 served ENTIRELY from the incrementally maintained index (QL
    pass-1 from token-sharded postings, feedback term vectors from the
    doc-sharded forward substore, weighted pass-2 from postings) is
    BIT-identical to batch rm3_topk over the concatenated corpus —
    before AND after compaction, and with tombstones masked."""
    from scida_spark.functions.retrieval import rm3_topk
    from scida_spark.streaming.postings import (
        delete_docs,
        read_forward,
        rm3_topk_from_store,
    )

    _wave(os.path.join(dirs["input"], "w0.parquet"), 0, 30)
    _wave(os.path.join(dirs["input"], "w1.parquet"), 30, 55)
    _wave(os.path.join(dirs["input"], "w2.parquet"), 55, 80)
    _ingest(spark, dirs, max_files_per_trigger=1, with_forward=True)

    docs = spark.read.schema(SCHEMA).parquet(dirs["input"])
    params = dict(k=10, k_fb=3, m=5, alpha=0.5, mu=60.0)
    served = rm3_topk_from_store(spark, dirs["store"], QUERIES, **params)
    batch = rm3_topk(docs, QUERIES, **params)
    assert _rows(served) == _rows(batch) and served.count() > 0

    # forward fetch is pruned AND masked: tombstone a feedback doc and
    # both engines must agree on the post-delete ranking
    dead = [5, 6, 7]
    delete_docs(spark, dirs["store"], dead, batch_id=50)
    live = docs.filter(~F.col("doc_id").isin(dead))
    served_d = rm3_topk_from_store(spark, dirs["store"], QUERIES, **params)
    batch_d = rm3_topk(live, QUERIES, **params)
    assert _rows(served_d) == _rows(batch_d)
    assert not {r["doc_id"] for r in served_d.collect()} & set(dead)

    # compaction folds the forward substore too and stays a fixed point
    assert compact_postings(spark, dirs["store"]) == 3
    assert sorted(
        d
        for d in os.listdir(os.path.join(dirs["store"], "fwd"))
        if d.startswith("batch_id=")
    ) == ["batch_id=-1"]
    served_c = rm3_topk_from_store(spark, dirs["store"], QUERIES, **params)
    assert _rows(served_c) == _rows(batch_d)

    # read_forward prunes to the requested ids' buckets and masks
    fwd = read_forward(spark, dirs["store"], [10, 11])
    assert {r["doc_id"] for r in fwd.select("doc_id").distinct().collect()} == {
        10,
        11,
    }


def test_rm3_from_store_max_df_equals_batch(spark, dirs):
    """r14: the expansion-term df ceiling served from the index (df
    from a bucket-pruned postings read) is bit-identical to the batch
    twin's (df from a corpus scan), and the ceiling genuinely changes
    the result vs the unceilinged run."""
    from scida_spark.functions.retrieval import rm3_topk
    from scida_spark.streaming.postings import rm3_topk_from_store

    _wave(os.path.join(dirs["input"], "w0.parquet"), 0, 30)
    _wave(os.path.join(dirs["input"], "w1.parquet"), 30, 55)
    _ingest(spark, dirs, max_files_per_trigger=1, with_forward=True)

    docs = spark.read.schema(SCHEMA).parquet(dirs["input"])
    params = dict(k=10, k_fb=3, m=5, alpha=0.5, mu=60.0, max_df=0.25)
    served = rm3_topk_from_store(spark, dirs["store"], QUERIES, **params)
    batch = rm3_topk(docs, QUERIES, **params)
    assert _rows(served) == _rows(batch) and served.count() > 0

    no_ceiling = rm3_topk(
        docs, QUERIES, k=10, k_fb=3, m=5, alpha=0.5, mu=60.0
    )
    assert _rows(no_ceiling) != _rows(batch)


def test_read_forward_refuses_non_forward_store(spark, dirs):
    from scida_spark.streaming.postings import (
        read_forward,
        rm3_topk_from_store,
    )

    _wave(os.path.join(dirs["input"], "w0.parquet"), 0, 10)
    _ingest(spark, dirs)  # with_forward NOT set
    with pytest.raises(ValueError, match="without"):
        read_forward(spark, dirs["store"], [1, 2])
    # rm3 serve fails FAST too — even for queries that would find no
    # feedback docs (uniform behavior, not data-dependent)
    with pytest.raises(ValueError, match="forward substore"):
        rm3_topk_from_store(spark, dirs["store"], [(0, "zzz")])


def test_forward_meta_validated_on_reopen(spark, dirs):
    from scida_spark.streaming.postings import postings_writer

    _wave(os.path.join(dirs["input"], "w0.parquet"), 0, 10)
    _ingest(spark, dirs, with_forward=True)
    docs = spark.read.schema(SCHEMA).parquet(dirs["input"])
    w = postings_writer(dirs["store"], with_forward=False)
    with pytest.raises(ValueError, match="with_forward"):
        w(docs, 99)
