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


def _make_png(px, color_type, filters=None):
    """Minimal PNG encoder for tests: ``px`` is a numpy uint8 array of
    shape (h, w, channels); per-row filter types (0-4) are applied
    FORWARD here exactly per the spec, so the decoder's unfilter path is
    exercised filter-by-filter."""
    import struct
    import zlib

    import numpy as np

    h, w, nch = px.shape
    bpp = nch
    filters = filters if filters is not None else [0] * h
    prev = np.zeros(w * nch, dtype=np.uint8)
    stream = bytearray()
    for y, ftype in zip(range(h), filters):
        line = px[y].reshape(-1)
        if ftype == 0:
            filt = line.copy()
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            filt = line - left
        elif ftype == 2:
            filt = line - prev
        elif ftype in (3, 4):
            filt = np.empty_like(line)
            for x in range(len(line)):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (int(line[x]) - pred) & 0xFF
        stream += bytes([ftype]) + filt.tobytes()
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def test_decode_strict_png_real(spark):
    """REAL PNG decode: an RGB image whose five rows use filter types
    0,1,2,3,4 round-trips to exact channel means; RGBA and grayscale
    exercise the channel mapping."""
    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    payload = _make_png(px, color_type=2, filters=[0, 1, 2, 3, 4])
    df = spark.createDataFrame(
        [(3, "image", bytearray(payload), (6, 5, 0, "png"))], mm.MEDIA_SCHEMA
    )
    (r,) = mm.decode_strict(df).collect()
    w, h, bits, mr, mg, mb, ma, _ = r["feature"]
    assert (w, h, bits, ma) == (6.0, 5.0, 24.0, 0.0)
    assert r["note"] == "png"
    want = px.astype(np.float64).mean(axis=(0, 1)) / 255.0
    for got, wv in zip((mr, mg, mb), want):
        assert abs(got - wv) < 1e-6

    # RGBA: alpha mean lands in slot 7 of the feature head
    rgba = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    pay4 = _make_png(rgba, color_type=6, filters=[4, 3, 1])
    df4 = spark.createDataFrame(
        [(4, "image", bytearray(pay4), (3, 3, 0, "png"))], mm.MEDIA_SCHEMA
    )
    (r4,) = mm.decode_strict(df4).collect()
    want4 = rgba.astype(np.float64).mean(axis=(0, 1)) / 255.0
    assert all(
        abs(g - wv) < 1e-6 for g, wv in zip(r4["feature"][3:7], want4)
    )
    assert r4["feature"][2] == 32.0

    # grayscale replicates into R=G=B
    gray = rng.integers(0, 256, size=(4, 4, 1), dtype=np.uint8)
    payg = _make_png(gray, color_type=0, filters=[0, 2, 1, 2])
    dfg = spark.createDataFrame(
        [(5, "image", bytearray(payg), (4, 4, 0, "png"))], mm.MEDIA_SCHEMA
    )
    (rg,) = mm.decode_strict(dfg).collect()
    wantg = float(gray.astype(np.float64).mean()) / 255.0
    assert all(abs(rg["feature"][i] - wantg) < 1e-6 for i in (3, 4, 5))

    # unsupported shapes refuse loudly (16-bit depth)
    import struct as _struct
    import zlib as _zlib

    bad_ihdr = _struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

    def _chunk(ct, d):
        return _struct.pack(">I", len(d)) + ct + d + _struct.pack(
            ">I", _zlib.crc32(ct + d) & 0xFFFFFFFF
        )

    bad = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", bad_ihdr) + _chunk(b"IEND", b"")
    dfb = spark.createDataFrame(
        [(6, "image", bytearray(bad), (2, 2, 0, "png"))], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|unsupported"):
        mm.decode_strict(dfb).collect()


def _make_gif(px_idx, palette):
    """Minimal GIF encoder for tests: palette-indexed pixels with the LZW
    stream emitted as CLEAR before every pixel code (the classic
    'uncompressed GIF' trick — fixed code width, no table growth), plus a
    graphic-control extension so the decoder's skip path is exercised."""
    import struct

    h, w = len(px_idx), len(px_idx[0])
    n_bits = max(1, (len(palette) - 1).bit_length())
    gct_n = max(0, n_bits - 1)
    table_size = 2 << gct_n
    mcs = max(2, n_bits)
    clear, end, code_size = 1 << mcs, (1 << mcs) + 1, mcs + 1
    bits = []

    def emit(code):
        for i in range(code_size):
            bits.append((code >> i) & 1)

    emit(clear)
    for row in px_idx:
        for p in row:
            emit(p)
            emit(clear)
    emit(end)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        data.append(byte)
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | gct_n, 0, 0)
    for i in range(table_size):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes([r, g, b])
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([mcs])
    for i in range(0, len(data), 255):
        blk = data[i : i + 255]
        out += bytes([len(blk)]) + bytes(blk)
    return out + b"\x00\x3b"


def test_decode_strict_gif_real(spark):
    """REAL GIF decode: LZW-decompressed first frame round-trips to exact
    palette-resolved channel means; a 20x20 frame forces multiple LZW
    sub-blocks."""
    import numpy as np

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    px = [[0, 0], [1, 2]]
    payload = _make_gif(px, palette)
    df = spark.createDataFrame(
        [(6, "image", bytearray(payload), (2, 2, 0, "gif"))], mm.MEDIA_SCHEMA
    )
    (r,) = mm.decode_strict(df).collect()
    w, h, ncolors, mr, mg, mb, _, _ = r["feature"]
    assert (w, h, ncolors) == (2.0, 2.0, 4.0)
    assert r["note"] == "gif"
    want = np.array(
        [palette[i] for row in px for i in row], dtype=np.float64
    ).mean(axis=0) / 255.0
    for got, wv in zip((mr, mg, mb), want):
        assert abs(got - wv) < 1e-6

    rng = np.random.default_rng(11)
    big = rng.integers(0, 4, size=(20, 20)).tolist()
    pay2 = _make_gif(big, palette)
    assert pay2.count(b"\x3b") >= 1 and len(pay2) > 300  # multi-sub-block
    df2 = spark.createDataFrame(
        [(7, "image", bytearray(pay2), (20, 20, 0, "gif"))], mm.MEDIA_SCHEMA
    )
    (r2,) = mm.decode_strict(df2).collect()
    want2 = np.array(
        [palette[i] for row in big for i in row], dtype=np.float64
    ).mean(axis=0) / 255.0
    assert (r2["feature"][0], r2["feature"][1]) == (20.0, 20.0)
    for got, wv in zip(r2["feature"][3:6], want2):
        assert abs(got - wv) < 1e-6
