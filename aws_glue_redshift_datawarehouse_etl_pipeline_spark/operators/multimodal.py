"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codecs, so the decode kernels are
STUBBED: each tries the real library (PIL/soundfile) and otherwise
produces a deterministic fake derived from the bytes' md5 — the
Spark-side contract (schemas, batch shapes, partitioning, UDF
signatures) is fully real and tested; swapping in the real kernel
changes only the inner function body.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; operators
keep batches bounded with maxRecordsPerBatch so a partition of large
blobs doesn't blow Arrow memory; decode outputs carry explicit shape
metadata so downstream ops never re-decode to learn dimensions.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("byte_len", T.LongType(), True),
                    T.StructField("checksum", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_from_text(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Build a media (binary + metadata) column from a text column —
    the test-data stand-in for real blob ingestion. Metadata is derived
    JVM-side (no Python)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn(
        "media",
        F.struct(
            content.alias("content"),
            F.struct(
                F.lit(mime).alias("mime"),
                F.length(content).cast("long").alias("byte_len"),
                F.md5(content).alias("checksum"),
            ).alias("meta"),
        ),
    )


_DECODE_SCHEMA = "id long, height int, width int, channels int, pixel_sum long"


def decode_image_batch(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", size: tuple[int, int] = (8, 8)
) -> DataFrame:
    """Decode + resize images to a fixed (h, w, 3), emitting shape
    metadata and a pixel checksum. Real path uses PIL when available;
    the stub synthesizes deterministic pixels from the content md5 so
    the full Spark plumbing (Arrow batches, schema, partition
    parallelism) is exercised and reproducible."""
    h, w = size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = row["__content"]
                if content is None:
                    continue
                if have_pil:
                    raise NotImplementedError(
                        "real image decode: wire PIL.Image.open(BytesIO(content))"
                        ".resize((w,h)) here"
                    )
                digest = hashlib.md5(bytes(content)).digest()
                rng = np.frombuffer(digest, dtype=np.uint8)
                pixels = np.resize(rng, (h, w, 3))
                out.append(
                    {
                        "id": row["__id"],
                        "height": h,
                        "width": w,
                        "channels": 3,
                        "pixel_sum": int(pixels.sum()),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "height", "width", "channels", "pixel_sum"])

    staged = df.select(
        F.col(id_col).alias("__id"), F.col(f"{media_col}.content").alias("__content")
    )
    return staged.mapInPandas(run, _DECODE_SCHEMA)


_FRAME_SCHEMA = "id long, frame_index int, frame_checksum string"


def sample_video_frames(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", every_n: int = 4, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: emit every Nth 'frame' (stub: 16-byte
    chunks of the payload) up to max_frames, each with a checksum.
    Output is one row per (id, frame): downstream image ops apply
    unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row["__content"] or b"")
                chunks = [content[i : i + 16] for i in range(0, len(content), 16)]
                for fi, chunk in enumerate(chunks[:: every_n][:max_frames]):
                    out.append(
                        {
                            "id": row["__id"],
                            "frame_index": fi,
                            "frame_checksum": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["id", "frame_index", "frame_checksum"])

    staged = df.select(
        F.col(id_col).alias("__id"), F.col(f"{media_col}.content").alias("__content")
    )
    return staged.mapInPandas(run, _FRAME_SCHEMA)


_AUDIO_SCHEMA = "id long, n_samples int, sample_rate int, duration_ms double, rms double"


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", sample_rate: int = 16000
) -> DataFrame:
    """Audio feature extraction plumbing: emit sample count, duration,
    and RMS energy per payload. Real path uses soundfile when
    available; the stub interprets the payload bytes as 8-bit PCM so
    the Arrow batching, schema, and parallelism are exercised with
    deterministic output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import soundfile  # noqa: F401

            have_sf = True
        except ImportError:
            have_sf = False
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = row["__content"]
                if content is None:
                    continue
                if have_sf:
                    raise NotImplementedError(
                        "real audio decode: wire soundfile.read(BytesIO(content)) here"
                    )
                samples = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.float64)
                samples = (samples - 128.0) / 128.0
                n = len(samples)
                rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
                out.append(
                    {
                        "id": row["__id"],
                        "n_samples": n,
                        "sample_rate": sample_rate,
                        "duration_ms": 1000.0 * n / sample_rate,
                        "rms": rms,
                    }
                )
            yield pd.DataFrame(
                out, columns=["id", "n_samples", "sample_rate", "duration_ms", "rms"]
            )

    staged = df.select(
        F.col(id_col).alias("__id"), F.col(f"{media_col}.content").alias("__content")
    )
    return staged.mapInPandas(run, _AUDIO_SCHEMA)
