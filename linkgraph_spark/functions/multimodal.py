"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; the Spark-side plumbing (schema, partitioning, Arrow batch
shape, UDF signatures) is real and tested. The actual codec work is STUBBED
— the image/audio libraries are not in this container — behind
``decode_stub`` (deterministic fake features) and ``decode_strict``
(raises ``NotImplementedError``), clearly marked for a production swap
(e.g. Pillow / torchaudio inside the same ``mapInPandas`` bodies).

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


def decode_strict(media: DataFrame) -> DataFrame:
    """Production decode path — NOT IMPLEMENTED in this container."""

    def extract(batches):
        raise NotImplementedError(
            "real media decoding requires codec libraries (Pillow/soundfile/"
            "pyav) not present in this environment; use decode_stub for "
            "plumbing tests"
        )
        yield  # pragma: no cover

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
