"""Multimodal plumbing: binary payloads + typed metadata through
mapInPandas (decode kernels stubbed; schemas/batch shapes real)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from scida_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(i, f"payload number {i} " * (i + 1)) for i in range(20)],
        "doc_id long, text string",
    )
    return M.to_media_table(df, "doc_id", "text")


def test_media_table_schema_and_meta(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    r = media.filter(F.col("media_id") == 3).first()
    assert bytes(r.payload).decode() == "payload number 3 " * 4
    assert r.meta.n_bytes == len("payload number 3 " * 4)
    assert r.meta.mime == "text/plain"


def test_extract_features_deterministic(media):
    rows = {r.media_id: r for r in M.extract_features(media).collect()}
    payload = ("payload number 5 " * 6).encode()
    assert rows[5].sha256 == hashlib.sha256(payload).hexdigest()
    assert rows[5].n_bytes == len(payload)
    digest = hashlib.sha256(payload).digest()
    assert rows[5].fake_mean_pixel == pytest.approx(sum(digest) / len(digest))


def test_resize_rewrites_payload_and_meta(media):
    out = M.resize_images(media, 8, 4)  # 32-byte target
    rows = out.collect()
    assert all(len(bytes(r.payload)) == 32 for r in rows)
    assert all((r.meta.width, r.meta.height, r.meta.n_bytes) == (8, 4, 32) for r in rows)
    # Truncation is deterministic: prefix of the original payload.
    r = out.filter(F.col("media_id") == 4).first()
    assert bytes(r.payload) == ("payload number 4 " * 5).encode()[:32]


def test_frame_sample_plan_shape(media):
    plan = M.frame_sample_plan(media, every_n=2)
    rows = plan.filter(F.col("media_id") == 10).collect()
    n_bytes = len("payload number 10 " * 11)
    n_frames = n_bytes // 100 + 1
    assert [r.frame_no for r in rows] == list(range(0, n_frames, 2))


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="PIL"):
        M.decode_image(b"\x89PNG")
