"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; the Spark-side plumbing (schema, partitioning, Arrow batch
shape, UDF signatures) is real and tested. Codec work: ``decode_strict``
REALLY decodes the two stdlib-parseable containers (RIFF/WAVE PCM audio,
uncompressed 24/32-bpp BMP images) with numpy-vectorized stats, and raises
``NotImplementedError`` for formats that need absent libraries (JPEG/PNG/
MP4/…); ``decode_stub`` keeps deterministic fake features for plumbing
tests over arbitrary payloads. Production swap: add Pillow / torchaudio /
pyav branches to ``decode_strict``'s magic-byte dispatch, same
``mapInPandas`` bodies.

Scale notes: media rows are large and skewed — feature extraction uses
``mapInPandas`` (per-partition Arrow iterator, constant memory via
``maxRecordsPerBatch``) rather than ``groupBy().applyInPandas`` so no key
skew can concentrate payload bytes on one task; repartition by a hash of
the media id upstream for even byte distribution.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>, note string"


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents (payload = utf-8 text
    bytes) — exercises the binary-column plumbing without codec libs."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
            (F.col("doc_id") * 33 % 10000).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def decode_stub(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction with a DETERMINISTIC FAKE decoder.

    Real deployment: replace the body of ``extract`` with the codec call
    (PIL.Image.open / soundfile.read / pyav frame sample) — the signature,
    schema, and batching are production-shaped already.
    """

    def extract(batches):
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                # STUB: sha256-seeded pseudo-features instead of a decode
                dig = hashlib.sha256(bytes(payload)).digest()
                feats.append([b / 255.0 for b in dig[:feature_dim]])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                    "note": "stub-decode",
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def _decode_wav(data: bytes) -> list[float]:
    """REAL stdlib decode of a RIFF/WAVE PCM payload → 8 features:
    [channels, sample_rate, duration_s, mean, rms, peak, sampwidth, 0]
    (amplitude stats normalized to [-1, 1] full scale). numpy vectorized
    over the sample buffer — no per-sample Python."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data)) as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        fr = w.getframerate()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if sw == 2:
        samples = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(
            np.float64
        )
    elif sw == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise NotImplementedError(
            f"WAV sample width {sw} bytes unsupported (8/16-bit PCM only)"
        )
    scale = float(2 ** (8 * sw - 1))
    if samples.size == 0:
        mean = rms = peak = 0.0
    else:
        mean = float(samples.mean()) / scale
        rms = float(np.sqrt(np.mean(samples**2))) / scale
        peak = float(np.abs(samples).max()) / scale
    dur = nframes / fr if fr else 0.0
    return [float(nch), float(fr), float(dur), mean, rms, peak, float(sw), 0.0]


def _decode_bmp(data: bytes) -> list[float]:
    """REAL stdlib decode of an uncompressed 24/32-bpp BMP payload → 8
    features: [width, height, bpp, meanB, meanG, meanR, meanA, 0]
    (channel means in [0, 1]; BMP stores pixels blue-first, bottom-up,
    rows padded to 4 bytes — the padding is sliced out before the means)."""
    import struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} unsupported "
            "(uncompressed 24/32-bpp only)"
        )
    nch = bpp // 8
    abs_h = abs(height)
    row_bytes = (width * nch + 3) // 4 * 4
    px = np.frombuffer(data, dtype=np.uint8, count=row_bytes * abs_h, offset=pix_off)
    px = px.reshape(abs_h, row_bytes)[:, : width * nch].reshape(abs_h, width, nch)
    means = px.astype(np.float64).mean(axis=(0, 1)) / 255.0
    mean_a = float(means[3]) if nch == 4 else 0.0
    return [
        float(width),
        float(abs_h),
        float(bpp),
        float(means[0]),
        float(means[1]),
        float(means[2]),
        mean_a,
        0.0,
    ]


def decode_strict(media: DataFrame) -> DataFrame:
    """Production decode path. REAL (stdlib + numpy, no codec libraries)
    for the two formats whose containers are stdlib-parseable — RIFF/WAVE
    PCM audio and uncompressed BMP images, dispatched on magic bytes — and
    a loud ``NotImplementedError`` for every other format (JPEG/PNG/MP4/…
    need Pillow/pyav, absent in this container; swap them into the same
    dispatch table in production). Same Arrow batching and output schema as
    :func:`decode_stub`."""

    def extract(batches):
        for pdf in batches:
            feats, notes = [], []
            for payload in pdf["payload"]:
                data = bytes(payload)
                if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                    feats.append([float(x) for x in _decode_wav(data)])
                    notes.append("wav-pcm")
                elif data[:2] == b"BM":
                    feats.append([float(x) for x in _decode_bmp(data)])
                    notes.append("bmp")
                else:
                    raise NotImplementedError(
                        "decode_strict: payload is neither RIFF/WAVE nor BMP; "
                        "decoding other formats requires codec libraries "
                        "(Pillow/soundfile/pyav) not present in this "
                        "environment — use decode_stub for plumbing tests"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                    "note": notes,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: passes payload through, rewrites meta dims (real impl
    would transform pixels inside the same mapInPandas body)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling stub for video rows: emits (media_id, frame_ts_ms)
    rows from metadata duration — the real variant would also carry the
    decoded frame bytes."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
