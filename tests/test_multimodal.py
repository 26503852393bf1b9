import pytest

from linkgraph_spark.functions import multimodal as mm
from pyspark.sql import functions as F


@pytest.fixture
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"doc text number {i} " * (i + 1), "en", "src", 10) for i in range(9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return mm.synthesize_media(docs)


def test_media_schema_and_kinds(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,duration_ms:int,codec:string>>"
    )
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_plumbing(media):
    feats = mm.decode_stub(media, feature_dim=8).collect()
    assert len(feats) == 9
    for r in feats:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        assert r["n_bytes"] > 0
        assert r["note"] == "stub-decode"
    # deterministic: same payload -> same fake features
    again = mm.decode_stub(media, feature_dim=8).collect()
    assert sorted(map(repr, feats)) == sorted(map(repr, again))


def test_decode_strict_raises_on_unknown_format(media):
    # synthesize_media payloads are utf-8 text — neither WAVE nor BMP, so
    # the strict path must refuse loudly, never emit fake features
    with pytest.raises(Exception, match="NotImplementedError|neither RIFF"):
        mm.decode_strict(media).collect()


def _make_wav(samples, framerate=8000, nch=1, sampwidth=2):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def _make_bmp(pixels_bgr):
    """Minimal uncompressed 24-bpp BMP from rows of (b, g, r) tuples
    (bottom-up storage handled here — means are row-order-invariant)."""
    import struct

    h, w = len(pixels_bgr), len(pixels_bgr[0])
    row_bytes = (w * 3 + 3) // 4 * 4
    body = b""
    for row in reversed(pixels_bgr):
        raw = b"".join(bytes(px) for px in row)
        body += raw + b"\x00" * (row_bytes - len(raw))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def test_decode_strict_wav_real(spark):
    """REAL WAV decode: stats computed from a synthesized 16-bit PCM
    payload must match the closed form."""
    samples = [0, 16384, -16384, 32767]  # mean 8191.75, peak 32767
    payload = _make_wav(samples, framerate=8000)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(payload), (0, 0, 0, "wav"))], mm.MEDIA_SCHEMA
    )
    (r,) = mm.decode_strict(df).collect()
    nch, fr, dur, mean, rms, peak, sw, _ = r["feature"]
    assert (nch, fr, sw) == (1.0, 8000.0, 2.0)
    assert r["note"] == "wav-pcm"
    assert abs(dur - 4 / 8000) < 1e-9
    assert abs(mean - 8191.75 / 32768) < 1e-6
    assert abs(peak - 32767 / 32768) < 1e-6
    import math

    want_rms = math.sqrt(sum(s * s for s in samples) / 4) / 32768
    assert abs(rms - want_rms) < 1e-6


def test_decode_strict_bmp_real(spark):
    """REAL BMP decode: a 3x2 24-bpp image with known channel values →
    exact means; odd width exercises the 4-byte row padding slice."""
    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],  # BGR tuples
        [(255, 255, 255), (0, 0, 0), (255, 0, 255)],
    ]
    payload = _make_bmp(pixels)
    df = spark.createDataFrame(
        [(2, "image", bytearray(payload), (3, 2, 0, "bmp"))], mm.MEDIA_SCHEMA
    )
    (r,) = mm.decode_strict(df).collect()
    w, h, bpp, mb, mg, mr, ma, _ = r["feature"]
    assert (w, h, bpp, ma) == (3.0, 2.0, 24.0, 0.0)
    assert r["note"] == "bmp"
    flat = [px for row in pixels for px in row]
    for got, ch in ((mb, 0), (mg, 1), (mr, 2)):
        want = sum(p[ch] for p in flat) / len(flat) / 255.0
        assert abs(got - want) < 1e-6


def test_decode_strict_mixed_batch(spark):
    """One Arrow batch carrying both formats dispatches per-row."""
    rows = [
        (1, "audio", bytearray(_make_wav([100, -100])), (0, 0, 0, "wav")),
        (2, "image", bytearray(_make_bmp([[(10, 20, 30)]])), (1, 1, 0, "bmp")),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).coalesce(1)
    got = {r["media_id"]: r["note"] for r in mm.decode_strict(df).collect()}
    assert got == {1: "wav-pcm", 2: "bmp"}


def test_resize_and_frame_sample_stubs(media):
    resized = mm.resize_stub(media, 224, 224)
    dims = resized.select("meta.width", "meta.height").distinct().collect()
    assert dims == [(224, 224)] or [(r[0], r[1]) for r in dims] == [(224, 224)]
    frames = mm.frame_sample_stub(media, every_ms=500)
    rows = frames.collect()
    assert all(r["frame_ts_ms"] % 500 == 0 for r in rows)
    n_videos = media.where(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == n_videos
