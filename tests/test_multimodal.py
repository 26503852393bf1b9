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


def test_decode_strict_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        mm.decode_strict(media).collect()


def test_resize_and_frame_sample_stubs(media):
    resized = mm.resize_stub(media, 224, 224)
    dims = resized.select("meta.width", "meta.height").distinct().collect()
    assert dims == [(224, 224)] or [(r[0], r[1]) for r in dims] == [(224, 224)]
    frames = mm.frame_sample_stub(media, every_ms=500)
    rows = frames.collect()
    assert all(r["frame_ts_ms"] % 500 == 0 for r in rows)
    n_videos = media.where(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == n_videos
