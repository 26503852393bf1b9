"""Wave-22 operators: hub walk counts, densification curve, JL
random-projection distortion, referential integrity audit, role token
share."""

import datetime

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.curation import integrity_audit
from linkgraph_spark.functions.hashing import MERSENNE_P
from linkgraph_spark.functions.similarity import random_projection, rp_distortion
from linkgraph_spark.kernels import densification, walk_counts
from linkgraph_spark.transcripts import role_token_share


# -------------------------------------------------------------- walk_counts
def _wc(spark, edges, n_hubs=10):
    rows = walk_counts(graph_from_edges(spark, edges), n_hubs=n_hubs).collect()
    return {r.id: (r.walks1, r.walks2, r.walks3) for r in rows}


def test_walk_counts_path(spark):
    # 0→1→2→3: every prefix walk is unique
    w = _wc(spark, [(0, 1), (1, 2), (2, 3)])
    assert w[0] == (1, 1, 1)
    assert w[1] == (1, 1, 0)
    assert w[2] == (1, 0, 0)


def test_walk_counts_diamond_multiplicity(spark):
    # 0→{1,2}→3→4: two length-2 walks reach 3, both extend to 4
    w = _wc(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    assert w[0] == (2, 2, 2)
    assert w[3] == (1, 0, 0)


def test_walk_counts_cycle_revisits(spark):
    # directed triangle: walks revisit the start — counts stay 1 per hop
    w = _wc(spark, [(0, 1), (1, 2), (2, 0)])
    assert w[0] == (1, 1, 1) and w[1] == (1, 1, 1) and w[2] == (1, 1, 1)


def test_walk_counts_hub_cap(spark):
    # n_hubs=1 keeps only the max-out-degree vertex (ties → min id)
    w = _wc(spark, [(5, 1), (5, 2), (0, 1), (1, 2)], n_hubs=1)
    assert set(w) == {5}
    assert w[5] == (2, 1, 0)  # 5→1→2 is the only length-2 extension


# ------------------------------------------------------------ densification
def test_densification_curve(spark):
    te = spark.createDataFrame(
        [(1, 2, 0), (1, 2, 3600), (2, 3, 3600), (4, 4, 7200)],
        "src long, dst long, ts long",
    )
    rows = {r.bucket_ts: r for r in densification(te, bucket_sec=3600).collect()}
    b0, b1, b2 = rows[0], rows[3600], rows[7200]
    assert (b0.new_vertices, b0.new_edges, b0.v_cum, b0.e_cum) == (2, 1, 2, 1)
    assert b0.dens_exp == 0.0  # ln(1)/ln(2)
    assert (b1.new_vertices, b1.new_edges, b1.v_cum, b1.e_cum) == (1, 1, 3, 2)
    assert b1.dens_exp == pytest.approx(0.630930, abs=1e-6)
    # self-loop (4,4) counts the vertex but not the edge
    assert (b2.new_vertices, b2.new_edges, b2.v_cum, b2.e_cum) == (1, 0, 4, 2)
    assert b2.dens_exp == pytest.approx(0.5, abs=1e-9)


def test_densification_first_seen_not_recounted(spark):
    # the same edge re-arriving later adds nothing
    te = spark.createDataFrame(
        [(1, 2, 0), (1, 2, 999999)], "src long, dst long, ts long"
    )
    rows = densification(te, bucket_sec=3600).collect()
    assert len(rows) == 1 and rows[0].bucket_ts == 0


# ------------------------------------------------------------ rp_distortion
def _sign(p, i):
    return ((((1 + 7 * p) * ((i * 2654435761) % MERSENNE_P)) % MERSENNE_P) % 2) * 2 - 1


def _project(v, k):
    root = int(k) ** 0.5
    out = []
    for p in range(k):
        acc = 0.0
        for i, x in enumerate(v, start=1):
            acc = acc + x * _sign(p, i)
        out.append(round(acc / root, 9))
    return out


def test_random_projection_matches_python_replay(spark):
    vecs = [
        (0, [0.5, -1.25, 2.0, 0.125]),
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r.vec_id: list(r.proj) for r in random_projection(df, k=4).collect()}
    for vid, v in vecs:
        assert got[vid] == pytest.approx(_project(v, 4), abs=1e-9)


def test_rp_distortion_pairs_and_null_ratio(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # identical to 0 → ratio NULL
        (2, [0.0, 2.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = {
        (r.vec_id_a, r.vec_id_b): r for r in rp_distortion(df, k=4).collect()
    }
    assert set(rows) == {(0, 1), (1, 2)}
    assert rows[(0, 1)].d2_orig == 0.0 and rows[(0, 1)].ratio is None
    r = rows[(1, 2)]
    assert r.d2_orig == pytest.approx(5.0, abs=1e-9)
    pa, pb = _project(vecs[1][1], 4), _project(vecs[2][1], 4)
    d2p = round(sum((a - b) ** 2 for a, b in zip(pa, pb)), 6)
    assert r.d2_proj == pytest.approx(d2p, abs=1e-9)
    assert r.ratio == pytest.approx(round(d2p / 5.0, 6), abs=1e-6)


def test_rp_rejects_non_square_k(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        random_projection(df, k=3)
    with pytest.raises(ValueError):
        rp_distortion(df, k=0)


# ---------------------------------------------------------- integrity_audit
def test_integrity_audit_plants_every_violation(spark):
    docs = spark.createDataFrame(
        [
            (1, "good text", "en", 9),
            (1, "dup id", "en", 6),      # duplicate doc_id
            (2, "   ", None, 5),          # empty text + wrong n_chars + no lang
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    t0 = datetime.datetime(2026, 1, 1)
    events = spark.createDataFrame(
        [
            (1, t0, 1, "click", 1.0),
            (1, t0, None, "click", -2.0),  # dup event_id + null user + negative
            (2, None, 3, "click", 0.0),    # null ts
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    embs = spark.createDataFrame(
        [
            (1, [1.0, 2.0], 0),
            (1, [0.0, 0.0], None),  # dup vec_id + zero vector + null label
            (2, [1.0], 1),          # wrong dim
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r.check_name: (r.n_bad, r.n_total)
        for r in integrity_audit(docs, events, embs, dim=2).collect()
    }
    assert got["doc_nchars_mismatch"] == (1, 3)  # "   " is 3 chars, not 5
    assert got["doc_empty_text"] == (1, 3)
    assert got["doc_dup_id"] == (1, 3)
    assert got["doc_null_lang"] == (1, 3)
    assert got["event_dup_id"] == (1, 3)
    assert got["event_null_user"] == (1, 3)
    assert got["event_null_ts"] == (1, 3)
    assert got["event_negative_value"] == (1, 3)
    assert got["emb_dup_id"] == (1, 3)
    assert got["emb_dim_mismatch"] == (1, 3)
    assert got["emb_zero_vector"] == (1, 3)
    assert got["emb_null_label"] == (1, 3)


def test_integrity_audit_clean_tables_report_zero(spark):
    docs = spark.createDataFrame(
        [(1, "ok", "en", 2)], "doc_id long, text string, lang string, n_chars long"
    )
    events = spark.createDataFrame(
        [(1, datetime.datetime(2026, 1, 1), 1, "click", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    embs = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    rows = integrity_audit(docs, events, embs, dim=2).collect()
    assert len(rows) == 12
    assert all(r.n_bad == 0 for r in rows)


# --------------------------------------------------------- role_token_share
def test_role_token_share_hand_counts(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "hi", None, t0),           # 2 chars
        ("c1", 1, "assistant", "hello!", None, t0),  # 6 chars
        ("c1", 2, "user", "bye", None, t0),          # 3 chars
        ("c2", 0, "system", "x", None, t0),          # 1 char
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r.role: r for r in role_token_share(df).collect()}
    assert got["user"].n_turns == 2 and got["user"].n_chars == 5
    assert got["user"].turn_share == 0.5
    assert got["user"].char_share == pytest.approx(round(5 / 12, 6), abs=1e-9)
    assert got["assistant"].char_share == 0.5
    assert got["system"].turn_share == 0.25
    total = sum(r.turn_share for r in got.values())
    assert total == pytest.approx(1.0, abs=1e-5)
