"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (this container has no image/audio libraries): a
clearly-marked deterministic fake stands in for pixel/sample decoding, so the
Spark-side contract - schema, batch shape, partitioning, UDF signature - is
real and tested, and a real decoder (PIL/torchaudio/ffmpeg) drops into
`decode_bytes` on a production cluster without touching the plan."""

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
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 8


def decode_bytes(payload: bytes, kind: str) -> list[float]:
    """STUB decoder: deterministic 8-dim feature from the payload hash.

    Production: replace with the real decode + feature extraction
    (PIL.Image.open / soundfile.read / frame sampling).  Everything around
    this function - Arrow batching, schema, partitioning - is the real
    pipeline and is what the tests pin down."""
    digest = hashlib.sha256(kind.encode() + payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over opaque binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                feats.append(decode_bytes(raw, kind))
                hashes.append(hashlib.md5(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic width*height-byte pseudo-pixel buffer from
    the payload digest (production: PIL.Image.open(...).resize((w, h)));
    the Arrow batching, schema and row-count contract around it are real."""
    digest = hashlib.sha256(payload).digest()
    need = width * height
    return (digest * (need // len(digest) + 1))[:need]


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Arrow-batched image resize over opaque payloads (kind='image' rows
    only; the filter stays JVM-side so audio/video rows never enter Python)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_stub(bytes(p) if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, fps: int = 25) -> DataFrame:
    """Arrow-batched video frame sampling: each video row EXPANDS to
    n_frames rows (uniform stride; production swaps the stub for an ffmpeg
    seek+decode).  Frame bytes are a deterministic function of
    (payload digest, frame_idx), so the pipeline shape - one-to-many
    mapInPandas, per-frame timestamps, downstream feature extraction over
    FRAME_SCHEMA - is fully testable without media libraries."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                # hex-string hash domain: keeps the stub SQL-expressible for
                # the DuckDB oracle (its sha256 is VARCHAR-only)
                base_hex = hashlib.sha256(raw).hexdigest()
                # stub duration: 1 second of synthetic video per KiB
                dur_ms = max(1000, (len(raw) // 1024) * 1000)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * dur_ms // max(n_frames, 1))
                    frames.append(
                        hashlib.sha256(f"{base_hex}:{i}".encode()).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame": frames,
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/bench: treat the documents table's text bytes as an
    opaque payload (the driver testdata ships no real media files)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr("element_at(array('image','audio','video'), cast(pmod(doc_id, 3) AS int) + 1)").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )
