"""Streaming npy source: micro-batch tailing of a growing array,
exactly-once offsets, downstream aggregation."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from scida_spark.sources.npy_stream import register


def _write(d, n, start=0):
    # Publish atomically (tmp + os.replace) like a well-behaved writer;
    # the torn-read test below covers the ill-behaved one.
    vals = np.arange(start, start + n, dtype=np.float64)
    full = np.concatenate([np.arange(0, start, dtype=np.float64), vals])
    tmp = d / ".Value.tmp.npy"
    np.save(tmp, full)
    os.replace(tmp, d / "Value.npy")


def test_stream_reads_all_rows_in_batches(spark, tmp_path):
    _write(tmp_path, 250)
    register(spark)
    stream = (
        spark.readStream.format("npystream")
        .option("path", str(tmp_path))
        .option("rows_per_batch", 100)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("npys_all")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM npys_all").collect()
    assert len(rows) == 250
    assert sorted(r.uid for r in rows) == list(range(250))
    got = {r.uid: r.Value for r in rows}
    assert got[123] == pytest.approx(123.0)


def test_stream_picks_up_appended_rows(spark, tmp_path):
    _write(tmp_path, 100)
    register(spark)
    stream = (
        spark.readStream.format("npystream")
        .option("path", str(tmp_path))
        .option("rows_per_batch", 1000)
        .load()
    )
    agg = stream.groupBy().agg(
        F.count("*").alias("n"), F.sum("Value").alias("s")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("npys_grow")
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("SELECT * FROM npys_grow").first()
        assert first.n == 100
        _write(tmp_path, 50, start=100)  # array grows to 150 rows
        q.processAllAvailable()
        second = spark.sql("SELECT * FROM npys_grow").first()
        assert second.n == 150
        assert second.s == pytest.approx(float(np.arange(150).sum()))
    finally:
        q.stop()


def test_stream_survives_torn_read(spark, tmp_path):
    """A writer mid-`np.save` presents a truncated npy header; the
    stream must treat it as "no new rows yet" (offset holds) instead of
    dying, then pick up the rows once a consistent file lands."""
    _write(tmp_path, 100)
    register(spark)
    stream = (
        spark.readStream.format("npystream")
        .option("path", str(tmp_path))
        .option("rows_per_batch", 1000)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("npys_torn")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) n FROM npys_torn").first().n == 100

        # Simulate an ill-behaved writer: clobber the field file with a
        # truncated npy (valid magic, torn header/data) IN PLACE.
        full = bytes((tmp_path / "Value.npy").read_bytes())
        (tmp_path / "Value.npy").write_bytes(full[:40])
        q.processAllAvailable()  # must not raise; no rows gained/lost
        assert q.exception() is None
        assert spark.sql("SELECT count(*) n FROM npys_torn").first().n == 100

        # Writer finishes: consistent 150-row file replaces the torn one.
        _write(tmp_path, 50, start=100)
        q.processAllAvailable()
        assert q.exception() is None
        rows = spark.sql("SELECT uid FROM npys_torn").collect()
        assert sorted(r.uid for r in rows) == list(range(150))
    finally:
        q.stop()


def test_stream_2d_field(spark, tmp_path):
    np.save(tmp_path / "Coordinates.npy", np.arange(60, dtype=np.float64).reshape(20, 3))
    register(spark)
    stream = (
        spark.readStream.format("npystream")
        .option("path", str(tmp_path))
        .option("rows_per_batch", 7)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("npys_2d")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM npys_2d ORDER BY uid").collect()
    assert len(rows) == 20
    assert list(rows[4].Coordinates) == [12.0, 13.0, 14.0]


def test_replay_of_committed_range_is_strict(spark, tmp_path):
    """readBetweenOffsets replays a COMMITTED range: a torn read there
    must RAISE (so Spark retries the task) — silently yielding an
    empty/short batch would permanently drop committed rows. The
    forward read() path keeps the swallow-and-retry behavior."""
    from scida_spark.sources.npy import discover_schema
    from scida_spark.sources.npy_stream import NpyStreamReader

    _write(tmp_path, 100)
    schema, _, _ = discover_schema(str(tmp_path))
    rdr = NpyStreamReader(str(tmp_path), schema, rows_per_batch=1000)

    # Healthy replay: full committed range comes back.
    rows = list(rdr.readBetweenOffsets({"row": 0}, {"row": 100}))
    assert len(rows) == 100

    # Field file truncated below the committed range → strict replay
    # raises instead of truncating.
    full = bytes((tmp_path / "Value.npy").read_bytes())
    np.save(tmp_path / ".t.npy", np.arange(60, dtype=np.float64))
    os.replace(tmp_path / ".t.npy", tmp_path / "Value.npy")
    with pytest.raises(Exception):
        list(rdr.readBetweenOffsets({"row": 0}, {"row": 100}))

    # Torn header → strict replay raises; forward read() still
    # swallows (offset does not advance).
    (tmp_path / "Value.npy").write_bytes(full[:40])
    with pytest.raises(Exception):
        list(rdr.readBetweenOffsets({"row": 0}, {"row": 100}))
    it, off = rdr.read({"row": 0})
    assert list(it) == [] and off == {"row": 0}
