"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The decode libraries (PIL/ffmpeg/librosa) are not in this container, so
the decode kernels are STUBBED — either raising NotImplementedError or
producing a deterministic fake — but the Spark-side plumbing (schema,
partitioning, Pandas-UDF signatures, Arrow batch shape) is real and
tested.

Scale design: binary payloads ride in the row (Parquet binary column);
decode/feature-extract runs in ``mapInPandas`` so each task streams
Arrow batches without driver involvement; metadata lives in a sibling
STRUCT column so filters on it prune *before* any decode runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, fingerprint string, "
    "fake_mean_pixel double"
)


def to_media_table(df: DataFrame, id_col: str, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Wrap any column as an opaque binary payload with typed metadata —
    the plumbing pattern for real image/audio ingestion."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decode would use PIL — unavailable in this container."""
    raise NotImplementedError(
        "image decode requires PIL/imageio, not installed; use extract_features"
        " (deterministic fake) for plumbing tests"
    )


def _fake_decode_stats(payload: bytes) -> float:
    """Deterministic fake 'mean pixel': mean byte value of the sha256
    digest — stable across runs/engines, exercises the batch path."""
    digest = hashlib.sha256(payload or b"").digest()
    return sum(digest) / len(digest)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Streams Arrow batches; each batch is processed columnar-side. At
    scale, repartition upstream so payload bytes per task fit memory
    (payload-size-aware splits — the binary analog of
    spark.sql.files.maxPartitionBytes).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    # Portable content fingerprint: md5 prefix of the
                    # payload bytes (== md5 of the source text for UTF-8
                    # payloads) — the text_fingerprint semantic fused
                    # into the same Arrow pass.
                    "fingerprint": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()[:16]
                    ),
                    "fake_mean_pixel": payloads.map(_fake_decode_stats).astype("float64"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<mime:string,width:int,height:int,n_bytes:bigint>"
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over binary payloads — mapInPandas plumbing with the
    decode/encode kernel stubbed (PIL unavailable): the deterministic
    fake emits a payload truncated/padded to width*height bytes so batch
    shapes, output schema, and metadata rewrite are all exercised for
    real. Swap ``_fake_resize`` for a PIL kernel in production.
    """
    target = width * height

    def _fake_resize(b: bytes) -> bytes:
        b = b or b""
        return b[:target] if len(b) >= target else b + b"\x00" * (target - len(b))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = pdf["payload"].map(_fake_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "meta": [
                        {
                            "mime": m["mime"] if m else None,
                            "width": width,
                            "height": height,
                            "n_bytes": len(p),
                        }
                        for m, p in zip(pdf["meta"], out_payload)
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media, frame idx).

    Decode is stubbed; the exploded plan shape (media_id × frame_no) is
    the real contract a downstream decoder consumes.
    """
    n_frames = (F.col("meta.n_bytes") / 100).cast("int") + 1  # fake duration proxy
    frames = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id", F.explode(frames).alias("frame_no"), F.col("meta.n_bytes").alias("n_bytes")
    )
