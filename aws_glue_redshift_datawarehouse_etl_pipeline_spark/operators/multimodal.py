"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

Image/audio header METADATA (format, dimensions) is parsed codec-free
with pure Column expressions (``image_header_meta``). Full pixel/
sample decode needs a codec library: the kernels below run the real
decode when PIL / soundfile import (undecodable blobs yield NULL
feature fields — at corpus scale malformed payloads are data, not
exceptions), and otherwise fall back to a deterministic fake derived
from the bytes' md5 so the Spark-side contract (schemas, Arrow batch
shapes, partitioning, UDF signatures) stays exercised and reproducible
in codec-less environments like this container.

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
from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------------------- header parse
#
# Image dimensions/format WITHOUT a codec: PNG, GIF, BMP store them at
# fixed header offsets; JPEG needs a segment walk to the SOF marker.
# All pure Column expressions (JVM-side, codegen'd) — no Python in the
# hot path, no external library, so this runs on the raw binary column
# of a 100 TB table at scan speed. This is the real metadata operator;
# pixel decode (below) stays gated on a codec.


def _u8(c: Column, pos) -> Column:
    """Unsigned byte value at 1-indexed ``pos`` (int or Column)."""
    pos = pos if isinstance(pos, Column) else F.lit(pos)
    return F.conv(F.hex(c.substr(pos, F.lit(1))), 16, 10).cast("long")


def _be(c: Column, pos, nbytes: int) -> Column:
    """Big-endian unsigned integer of ``nbytes`` at 1-indexed ``pos``."""
    pos = pos if isinstance(pos, Column) else F.lit(pos)
    return F.conv(F.hex(c.substr(pos, F.lit(nbytes))), 16, 10).cast("long")


def _le(c: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned integer: per-byte reads recombined."""
    total = F.lit(0).cast("long")
    for i in range(nbytes):
        total = total + _u8(c, pos + i) * F.lit(1 << (8 * i)).cast("long")
    return total


def _le32_signed(c: Column, pos: int) -> Column:
    """Little-endian SIGNED int32 (BMP dimensions): two's-complement
    reinterpretation in long arithmetic — an ANSI int cast would throw
    on the high-bit values a top-down BMP stores."""
    raw = _le(c, pos, 4)
    return F.when(raw >= F.lit(1 << 31), raw - F.lit(1 << 32)).otherwise(raw)


def _jpeg_sof_pos(c: Column, max_segments: int = 48) -> Column:
    """1-indexed position of the first SOFn marker (0xFFC0-0xFFCF minus
    the non-frame C4/C8/CC), found by walking the segment chain from
    byte 3: each segment is marker(2) + big-endian length(2) + payload.

    The walk runs as an ``F.aggregate`` over a constant sequence — a
    RUNTIME loop with a (pos, found) struct accumulator, not a
    statically unrolled when-chain whose expression tree would grow
    exponentially with the segment bound. ``max_segments`` bounds work
    per row; headers deeper than that (dozens of APP/COM segments
    before SOF) return NULL rather than scanning unboundedly."""
    sof = lambda m: m.between(0xC0, 0xCF) & ~m.isin(0xC4, 0xC8, 0xCC)  # noqa: E731

    def step(acc: Column, _: Column) -> Column:
        pos, found = acc["pos"], acc["found"]
        m1, m2 = _u8(c, pos), _u8(c, pos + 1)
        valid = (m1 == 0xFF) & m2.isNotNull()
        standalone = m2.isin(0x01, *range(0xD0, 0xD8))  # TEM/RSTn: no length
        nxt = (
            F.when(valid & sof(m2), F.struct(pos.alias("pos"), pos.alias("found")))
            .when(
                valid & standalone,
                F.struct((pos + 2).alias("pos"), F.lit(None).cast("long").alias("found")),
            )
            .when(
                valid,
                F.struct(
                    (pos + 2 + _be(c, pos + 2, 2)).alias("pos"),
                    F.lit(None).cast("long").alias("found"),
                ),
            )
            # corrupt chain: stay put with found NULL (loop is a no-op)
            .otherwise(F.struct(pos.alias("pos"), F.lit(None).cast("long").alias("found")))
        )
        return F.when(found.isNotNull(), acc).otherwise(nxt)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(max_segments)),
        F.struct(
            F.lit(3).cast("long").alias("pos"),
            F.lit(None).cast("long").alias("found"),
        ),
        step,
        lambda acc: acc["found"],
    )


def image_header_meta(
    df: DataFrame,
    content_col: str = "media.content",
    out_format: str = "format",
    out_width: str = "width",
    out_height: str = "height",
) -> DataFrame:
    """Attach ``format`` / ``width`` / ``height`` parsed from the image
    header bytes of a binary column — pure Column ops, no codec:

    - PNG:  magic ``89 50 4E 47 0D 0A 1A 0A``; width/height are
      big-endian uint32 at byte offsets 16 and 20 (inside IHDR).
    - GIF:  magic ``GIF8[79]a``; width/height little-endian uint16 at
      offsets 6 and 8 (logical screen descriptor).
    - BMP:  magic ``BM``; width/height little-endian int32 at offsets
      18 and 22 (BITMAPINFOHEADER; a negative height means top-down
      row order, so its absolute value is reported).
    - JPEG: magic ``FF D8``; dimensions live in the first SOFn segment,
      located by the bounded segment walk in ``_jpeg_sof_pos`` —
      height/width big-endian uint16 at SOF+5 / SOF+7.

    Unrecognized or truncated payloads yield NULLs, never errors — at
    corpus scale malformed blobs are data, not exceptions. The engine
    has no multimodal reference counterpart (engine extension); decode
    beyond the header requires a codec and stays in
    ``decode_image_batch``."""
    c = F.col(content_col)
    blen = F.length(c)
    is_png = (blen >= 24) & (F.hex(c.substr(1, 8)) == F.lit("89504E470D0A1A0A"))
    is_jpeg = (blen >= 4) & (F.hex(c.substr(1, 2)) == F.lit("FFD8"))
    is_gif = (blen >= 10) & (
        F.hex(c.substr(1, 6)).isin("474946383761", "474946383961")
    )
    is_bmp = (blen >= 26) & (F.hex(c.substr(1, 2)) == F.lit("424D"))

    sof = _jpeg_sof_pos(c)
    jpeg_ok = sof.isNotNull() & (blen >= sof + 8)

    fmt = (
        F.when(is_png, "png")
        .when(is_jpeg, "jpeg")
        .when(is_gif, "gif")
        .when(is_bmp, "bmp")
        .otherwise(F.lit(None).cast("string"))
    )
    width = (
        F.when(is_png, _be(c, 17, 4))
        .when(is_jpeg & jpeg_ok, _be(c, sof + 7, 2))
        .when(is_gif, _le(c, 7, 2))
        .when(is_bmp, F.abs(_le32_signed(c, 19)))
        .otherwise(F.lit(None).cast("long"))
    )
    height = (
        F.when(is_png, _be(c, 21, 4))
        .when(is_jpeg & jpeg_ok, _be(c, sof + 5, 2))
        .when(is_gif, _le(c, 9, 2))
        .when(is_bmp, F.abs(_le32_signed(c, 23)))
        .otherwise(F.lit(None).cast("long"))
    )
    return (
        df.withColumn(out_format, fmt)
        .withColumn(out_width, width)
        .withColumn(out_height, height)
    )


def _be_bytes(n: Column, nbytes: int) -> Column:
    """Big-endian ``nbytes`` binary encoding of a non-negative int col."""
    return F.unhex(F.lpad(F.hex(n), 2 * nbytes, "0"))


def _le_bytes(n: Column, nbytes: int) -> Column:
    be = _be_bytes(n, nbytes)
    return F.concat(*[be.substr(i, 1) for i in range(nbytes, 0, -1)])


def synthesize_image_bytes(
    width: Column, height: Column, fmt: Column
) -> Column:
    """Format-correct image HEADER bytes (not full images) for the
    given dimensions — the test-data stand-in for a real blob column,
    built entirely JVM-side. ``fmt`` selects 'png' | 'jpeg' | 'gif' |
    'bmp'; the JPEG variant prepends APP0 (JFIF) and a COM segment
    before SOF0 so a parser must genuinely walk the segment chain, and
    uses progressive SOF2 for odd widths to exercise the SOFn range."""
    w, h = width.cast("long"), height.cast("long")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),          # signature
        F.unhex(F.lit("0000000D49484452")),          # IHDR length + tag
        _be_bytes(w, 4),
        _be_bytes(h, 4),
        F.unhex(F.lit("0806000000")),                # bit depth/color/etc
        F.unhex(F.lit("DEADBEEF")),                  # CRC (unchecked)
    )
    sof_marker = F.when(w % 2 == 1, F.unhex(F.lit("FFC2"))).otherwise(
        F.unhex(F.lit("FFC0"))
    )
    jpeg = F.concat(
        F.unhex(F.lit("FFD8")),                      # SOI
        F.unhex(F.lit("FFE000104A46494600010100000100010000")),  # APP0 JFIF
        F.unhex(F.lit("FFFE0005646F63")),            # COM "doc"
        sof_marker,
        F.unhex(F.lit("0011")),                      # SOF length 17
        F.unhex(F.lit("08")),                        # precision
        _be_bytes(h, 2),
        _be_bytes(w, 2),
        F.unhex(F.lit("03012200021101031101")),      # 3 components
    )
    gif = F.concat(
        F.unhex(F.lit("474946383961")),              # GIF89a
        _le_bytes(w, 2),
        _le_bytes(h, 2),
        F.unhex(F.lit("F70000")),
    )
    bmp = F.concat(
        F.unhex(F.lit("424D")),                      # BM
        F.unhex(F.lit("00000000000000003600000028000000")),
        _le_bytes(w, 4),
        _le_bytes(h, 4),
        F.unhex(F.lit("01001800")),
    )
    return (
        F.when(fmt == "png", png)
        .when(fmt == "jpeg", jpeg)
        .when(fmt == "gif", gif)
        .when(fmt == "bmp", bmp)
        .otherwise(F.lit(None).cast("binary"))
    )


def _riff_chunk_pos(c: Column, tag_hex: str, max_chunks: int = 8) -> Column:
    """1-indexed position of the first RIFF subchunk whose 4-byte tag
    matches ``tag_hex``, walking the chain from byte 13 (after
    RIFF<size>WAVE): each chunk is tag(4) + le32 size + payload padded
    to even length. Same bounded ``F.aggregate`` runtime-loop shape as
    ``_jpeg_sof_pos``; corrupt/truncated chains return NULL."""

    def step(acc: Column, _: Column) -> Column:
        pos, found = acc["pos"], acc["found"]
        tag = F.hex(c.substr(pos, F.lit(4)))
        size = _le_at(c, pos + 4, 4)
        intact = (F.length(c) >= pos + 7) & size.isNotNull()
        nxt = (
            F.when(
                intact & (tag == F.lit(tag_hex)),
                F.struct(pos.alias("pos"), pos.alias("found")),
            )
            .when(
                intact,
                F.struct(
                    (pos + 8 + size + size % 2).alias("pos"),
                    F.lit(None).cast("long").alias("found"),
                ),
            )
            .otherwise(
                F.struct(pos.alias("pos"), F.lit(None).cast("long").alias("found"))
            )
        )
        return F.when(found.isNotNull(), acc).otherwise(nxt)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(max_chunks)),
        F.struct(
            F.lit(13).cast("long").alias("pos"),
            F.lit(None).cast("long").alias("found"),
        ),
        step,
        lambda acc: acc["found"],
    )


def wav_header_meta(
    df: DataFrame,
    content_col: str = "media.content",
) -> DataFrame:
    """Attach ``channels`` / ``sample_rate`` / ``bits`` / ``n_frames`` /
    ``duration_ms`` parsed from WAV (RIFF) header bytes of a binary
    column — pure Column ops, no codec, the audio analog of
    ``image_header_meta``. The ``fmt `` and ``data`` chunks are located
    by a bounded chunk walk (real WAV files interleave LIST/INFO/fact
    chunks before data, so fixed offsets would be wrong), then:
    channels le16@+10, sample rate le32@+12, block align le16@+20,
    bits le16@+22 inside fmt; frame count = data size / block align;
    duration in integer milliseconds. Non-RIFF or truncated payloads
    yield NULLs, never errors."""
    c = F.col(content_col)
    blen = F.length(c)
    is_wav = (
        (blen >= 36)
        & (F.hex(c.substr(1, 4)) == F.lit("52494646"))  # RIFF
        & (F.hex(c.substr(9, 4)) == F.lit("57415645"))  # WAVE
    )
    fpos = _riff_chunk_pos(c, "666D7420")  # "fmt "
    dpos = _riff_chunk_pos(c, "64617461")  # "data"
    ok = is_wav & fpos.isNotNull() & dpos.isNotNull() & (blen >= dpos + 7)
    channels = F.when(ok, _le_at(c, fpos + 10, 2))
    rate = F.when(ok, _le_at(c, fpos + 12, 4))
    block = _le_at(c, fpos + 20, 2)
    bits = F.when(ok, _le_at(c, fpos + 22, 2))
    dsize = _le_at(c, dpos + 4, 4)
    frames = F.when(ok & (block > 0), F.floor(dsize / block).cast("long"))
    dur = F.when(
        ok & (rate > 0), F.floor(frames * 1000 / rate).cast("long")
    )
    return (
        df.withColumn("channels", channels)
        .withColumn("sample_rate", rate)
        .withColumn("bits", bits)
        .withColumn("n_frames", frames)
        .withColumn("duration_ms", dur)
    )


def _le_at(c: Column, pos: Column, nbytes: int) -> Column:
    """Little-endian unsigned int at a COLUMN position (``_le`` takes a
    static one)."""
    total = F.lit(0).cast("long")
    for i in range(nbytes):
        total = total + _u8(c, pos + i) * F.lit(1 << (8 * i)).cast("long")
    return total


def synthesize_wav_bytes(
    sample_rate: Column,
    channels: Column,
    bits: Column,
    n_frames: Column,
    with_list_chunk: Column | None = None,
) -> Column:
    """Spec-correct WAV (RIFF/PCM) HEADER bytes — the audio analog of
    ``synthesize_image_bytes``, built entirely JVM-side; the data
    payload itself is omitted (declared sizes only), which is exactly
    what a header parser may read. ``with_list_chunk`` optionally
    interleaves a LIST/INFO chunk between fmt and data so a parser
    must genuinely walk the chunk chain."""
    sr = sample_rate.cast("long")
    ch = channels.cast("long")
    bt = bits.cast("long")
    nf = n_frames.cast("long")
    ba = F.floor(ch * bt / 8).cast("long")
    dsize = nf * ba
    list_chunk = F.concat(
        F.unhex(F.lit("4C495354")),  # LIST
        _le_bytes(F.lit(6).cast("long"), 4),
        F.unhex(F.lit("494E464F4142")),  # INFO + 2 payload bytes
    )
    use_list = (
        with_list_chunk
        if with_list_chunk is not None
        else F.lit(False)
    )
    riff_size = F.lit(36).cast("long") + dsize + F.when(use_list, 14).otherwise(0)
    head = F.concat(
        F.unhex(F.lit("52494646")),  # RIFF
        _le_bytes(riff_size, 4),
        F.unhex(F.lit("57415645")),  # WAVE
        F.unhex(F.lit("666D7420")),  # "fmt "
        _le_bytes(F.lit(16).cast("long"), 4),
        _le_bytes(F.lit(1).cast("long"), 2),  # PCM
        _le_bytes(ch, 2),
        _le_bytes(sr, 4),
        _le_bytes(sr * ba, 4),
        _le_bytes(ba, 2),
        _le_bytes(bt, 2),
    )
    tail = F.concat(F.unhex(F.lit("64617461")), _le_bytes(dsize, 4))
    return F.when(use_list, F.concat(head, list_chunk, tail)).otherwise(
        F.concat(head, tail)
    )


_DECODE_SCHEMA = "id long, height int, width int, channels int, pixel_sum long"


def decode_image_batch(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", size: tuple[int, int] = (8, 8)
) -> DataFrame:
    """Decode + resize images to a fixed (h, w, 3), emitting shape
    metadata and a pixel checksum. With PIL importable this is the REAL
    decode (open → RGB → resize → sum; an undecodable blob emits NULL
    feature fields); without a codec a deterministic fake derived from
    the content md5 keeps the full Spark plumbing (Arrow batches,
    schema, partition parallelism) exercised and reproducible."""
    h, w = size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image

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
                    import io

                    try:
                        img = (
                            Image.open(io.BytesIO(bytes(content)))
                            .convert("RGB")
                            .resize((w, h))
                        )
                        pixels = np.asarray(img, dtype=np.uint8)
                        out.append(
                            {
                                "id": row["__id"],
                                "height": h,
                                "width": w,
                                "channels": 3,
                                "pixel_sum": int(pixels.sum()),
                            }
                        )
                    except Exception:  # noqa: BLE001 — malformed blob = data
                        out.append(
                            {
                                "id": row["__id"],
                                "height": None,
                                "width": None,
                                "channels": None,
                                "pixel_sum": None,
                            }
                        )
                    continue
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
    """Audio feature extraction: emit sample count, sample rate,
    duration, and RMS energy per payload. With soundfile importable
    this is the REAL decode (multi-channel downmixed to mono, the
    file's own sample rate reported; undecodable blobs emit NULL
    fields); without a codec the fallback interprets the payload bytes
    as 8-bit PCM at ``sample_rate`` so the Arrow batching, schema, and
    parallelism stay exercised with deterministic output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import soundfile

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
                    import io

                    try:
                        data, sr = soundfile.read(
                            io.BytesIO(bytes(content)), dtype="float64"
                        )
                        if data.ndim > 1:
                            data = data.mean(axis=1)
                        n = len(data)
                        out.append(
                            {
                                "id": row["__id"],
                                "n_samples": n,
                                "sample_rate": int(sr),
                                "duration_ms": 1000.0 * n / sr,
                                "rms": float(np.sqrt(np.mean(data**2))) if n else 0.0,
                            }
                        )
                    except Exception:  # noqa: BLE001 — malformed blob = data
                        out.append(
                            {
                                "id": row["__id"],
                                "n_samples": None,
                                "sample_rate": None,
                                "duration_ms": None,
                                "rms": None,
                            }
                        )
                    continue
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
