"""Wave-15 operators: A/B-test z-score over hash-assigned variants,
Matryoshka dimension-truncation audit, real BMP nearest-neighbor resize,
ORC export round-trip."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.functions import multimodal as mm
from linkgraph_spark.functions.events import ab_test
from linkgraph_spark.functions.similarity import matryoshka_audit
from linkgraph_spark.sources.export import read_ranks_orc, write_ranks_orc
from tests.test_multimodal import _make_bmp


def _variant(user_id: int) -> int:
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:15], 16) % 2


# ------------------------------------------------------------------ A/B test
def test_ab_test_counts_and_z(spark):
    users = list(range(1, 13))
    converted = {1, 2, 3, 4, 5}  # conversion correlates with... nothing
    rows = []
    for u in users:
        rows.append((u * 10, "2024-01-01 00:00:00", u, "view", 1.0, ""))
        if u in converted:
            rows.append((u * 10 + 1, "2024-01-01 01:00:00", u, "purchase", 1.0, ""))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    (r,) = ab_test(df, target="purchase").collect()

    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    for u in users:
        v = _variant(u)
        n[v] += 1
        c[v] += int(u in converted)
    assert (r.n_control, r.n_treatment) == (n[0], n[1])
    assert (r.conv_control, r.conv_treatment) == (c[0], c[1])
    assert r.rate_control == pytest.approx(round(c[0] / n[0], 6))
    p0, p1 = c[0] / n[0], c[1] / n[1]
    pp = (c[0] + c[1]) / (n[0] + n[1])
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / n[0] + 1 / n[1]))
    assert r.z_score == pytest.approx(round(z, 6), abs=1e-9)


def test_ab_test_degenerate_pooled_rate_yields_null_z(spark):
    rows = [
        (1, 1, "purchase"),
        (2, 2, "purchase"),
        (3, 3, "purchase"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    (r,) = ab_test(df, target="purchase").collect()
    assert r.z_score is None  # pooled rate = 1 → zero SE, guarded


# ------------------------------------------------------------- matryoshka
def _topk_py(vecs, n_queries, k, dims):
    norms = {
        i: math.sqrt(sum(x * x for x in v[:dims])) for i, v in vecs.items()
    }
    out = {}
    for q in range(n_queries):
        cands = []
        for o, ov in vecs.items():
            if o == q:
                continue
            cos = sum(a * b for a, b in zip(vecs[q][:dims], ov[:dims])) / (
                norms[q] * norms[o]
            )
            cands.append((round(cos, 6), o))
        cands.sort(key=lambda t: (-t[0], t[1]))
        out[q] = [o for _, o in cands[:k]]
    return out


def test_matryoshka_audit_matches_python(spark):
    vecs = {
        i: [round(math.cos(0.9 * i * (j + 1)) + 0.05 * j, 4) for j in range(6)]
        for i in range(15)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {r.query_id: r for r in matryoshka_audit(df, n_queries=4, k=3, dims=2).collect()}
    full = _topk_py(vecs, 4, 3, 6)
    trunc = _topk_py(vecs, 4, 3, 2)
    for q in range(4):
        hits = len(set(full[q]) & set(trunc[q]))
        assert got[q].n_full == 3
        assert got[q].n_trunc_hits == hits
        assert got[q].overlap == pytest.approx(round(hits / 3, 6))
    # truncating 6 dims to 2 must actually perturb at least one query
    assert any(got[q].overlap < 1.0 for q in range(4))


def test_matryoshka_full_dims_is_identity(spark):
    vecs = {i: [float(i + j + 1) for j in range(4)] for i in range(8)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = matryoshka_audit(df, n_queries=3, k=2, dims=4).collect()
    assert all(r.overlap == 1.0 for r in out)


# -------------------------------------------------------------- BMP resize
def test_resize_bmp_upscale_replicates_pixels(spark):
    pixels = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (255, 255, 255)],
    ]
    payload = _make_bmp(pixels)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), (2, 2, 7, "bmp"))], mm.MEDIA_SCHEMA
    )
    (r,) = mm.resize_bmp(df, 4, 4).collect()
    assert (r.meta.width, r.meta.height) == (4, 4)
    assert r.meta.duration_ms == 7 and r.meta.codec == "bmp"
    (d,) = mm.decode_strict(
        spark.createDataFrame(
            [(1, "image", bytearray(bytes(r.payload)), (4, 4, 0, "bmp"))],
            mm.MEDIA_SCHEMA,
        )
    ).collect()
    w, h, bpp, mb, mg, mr, _, _ = d.feature
    assert (w, h, bpp) == (4.0, 4.0, 24.0)
    # exact 2x nearest-neighbor upscale preserves channel means exactly
    flat = [px for row in pixels for px in row]
    for got, ch in ((mb, 0), (mg, 1), (mr, 2)):
        assert got == pytest.approx(sum(p[ch] for p in flat) / 4 / 255.0, abs=1e-9)


def test_resize_bmp_downscale_picks_center_pixels(spark):
    # 4x4 image whose quadrants are solid colors: 2x2 NN downscale picks
    # the center-of-quadrant sample = the quadrant color
    q = [
        [(10, 20, 30), (10, 20, 30), (40, 50, 60), (40, 50, 60)],
        [(10, 20, 30), (10, 20, 30), (40, 50, 60), (40, 50, 60)],
        [(70, 80, 90), (70, 80, 90), (200, 210, 220), (200, 210, 220)],
        [(70, 80, 90), (70, 80, 90), (200, 210, 220), (200, 210, 220)],
    ]
    df = spark.createDataFrame(
        [(1, "image", bytearray(_make_bmp(q)), (4, 4, 0, "bmp"))], mm.MEDIA_SCHEMA
    )
    (r,) = mm.resize_bmp(df, 2, 2).collect()
    px = mm._bmp_pixels(bytes(r.payload))
    assert px.shape == (2, 2, 3)
    assert list(px[0][0]) == [10, 20, 30]
    assert list(px[0][1]) == [40, 50, 60]
    assert list(px[1][0]) == [70, 80, 90]
    assert list(px[1][1]) == [200, 210, 220]


def test_resize_bmp_rejects_non_bmp(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"JFIF not a bmp"), (0, 0, 0, "jpeg"))],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        mm.resize_bmp(df, 2, 2).collect()


# ----------------------------------------------------------------- ORC sink
def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 0.25), (2, 0.5), (3, 0.25)], "id long, rank double"
    )
    path = str(tmp_path / "ranks_orc")
    write_ranks_orc(df, path)
    back = read_ranks_orc(spark, path)
    assert {(r.id, r.rank) for r in back.collect()} == {
        (1, 0.25),
        (2, 0.5),
        (3, 0.25),
    }


# -------------------------------------------------------------- shuffle order
def test_shuffle_order_matches_hash_permutation(spark):
    from linkgraph_spark.functions.sampling import shuffle_order

    rows = [(i, f"doc {i}") for i in range(37)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.shuffle_rank, r.shard) for r in shuffle_order(df, salt="s1", partitions=5).collect()}
    assert sorted(r for r, _ in out.values()) == list(range(1, 38))
    want_order = sorted(
        (i for i, _ in rows),
        key=lambda i: (
            int(hashlib.md5(f"s1\x1f{i}".encode()).hexdigest()[:15], 16),
            i,
        ),
    )
    for rank, i in enumerate(want_order, 1):
        assert out[i] == (rank, (rank - 1) % 4)
    # replayable: same salt → identical permutation; new salt → a new epoch
    again = {r.doc_id: r.shuffle_rank for r in shuffle_order(df, salt="s1", partitions=3).collect()}
    assert again == {i: r for i, (r, _) in out.items()}
    epoch2 = {r.doc_id: r.shuffle_rank for r in shuffle_order(df, salt="s2", partitions=5).collect()}
    assert epoch2 != again


# --------------------------------------------------------------- skew profile
def test_skew_profile_star_closed_form(spark):
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels.stats import skew_profile
    from tests.fixtures_graphs import STAR10

    g = graph_from_edges(spark, STAR10)
    (r,) = skew_profile(g, key="dst").collect()
    # dst counts: {0: 9, 1: 1}
    assert (r.n_rows, r.n_keys, r.max_cnt) == (10, 2, 9)
    assert r.avg_cnt == 5.0
    assert r.p50_cnt == 5.0
    assert r.p99_cnt == pytest.approx(1 + 0.99 * 8, abs=1e-9)  # linear interp
    assert r.skew_factor == pytest.approx(9 / 5, abs=1e-9)
