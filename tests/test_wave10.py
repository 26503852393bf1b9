"""Wave-10 operators: simplified silhouette, degree Gini/HHI,
centrality-degree correlation, label mixing matrix, DAU/WAU stickiness,
hourly seasonality profile, int8 embedding quantization audit, and the
distributed BPE merge learner (exact pure-python reference — the rows-only
gate entry's pinning oracle, same contract as boruvka_msf)."""

import math
import re
from collections import Counter
from datetime import datetime, timezone

from linkgraph_spark.edges import graph_from_edges


# ------------------------------------------------------------- silhouette
def test_silhouette_two_far_clusters(spark):
    from linkgraph_spark.kernels.kmeans import silhouette

    # init centroids = vec_id 0 (cluster 0) and 1 (cluster 1); after one
    # Lloyd step: centroid0 = (0, 1), centroid1 = (10, 1); stable after
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 0.0]),
        (2, [0.0, 2.0]),
        (3, [10.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["cluster"]: r.asDict() for r in silhouette(df, k=2, iterations=2).collect()}
    a, b = 1.0, math.sqrt(101.0)  # own-centroid dist 1, other sqrt(10^2+1)
    want = round(round((b - a) / b, 9), 6)
    assert got[0]["n_members"] == 2 and got[1]["n_members"] == 2
    assert got[0]["mean_silhouette"] == want
    assert got[1]["mean_silhouette"] == want


def test_silhouette_rejects_k1(spark):
    from linkgraph_spark.kernels.kmeans import silhouette

    df = spark.createDataFrame([(0, [0.0])], "vec_id long, embedding array<float>")
    try:
        silhouette(df, k=1)
        assert False, "k=1 must raise"
    except ValueError:
        pass


# ------------------------------------------------------------ degree gini
def test_degree_gini_uniform_ring(spark):
    from linkgraph_spark.kernels.stats import degree_gini

    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])
    got = {r["metric"]: r.asDict() for r in degree_gini(g).collect()}
    for m in ("in", "out", "total"):
        assert got[m]["gini"] == 0.0
        assert got[m]["hhi"] == round(1.0 / 3.0, 6)
    g.unpersist()


def test_degree_gini_star(spark):
    from linkgraph_spark.kernels.stats import degree_gini

    # out degrees [3,0,0,0] -> gini .75, hhi 1; in [0,1,1,1] -> .25, 1/3
    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3)])
    got = {r["metric"]: r.asDict() for r in degree_gini(g).collect()}
    assert got["out"]["gini"] == 0.75 and got["out"]["hhi"] == 1.0
    assert got["in"]["gini"] == 0.25 and got["in"]["hhi"] == round(1.0 / 3.0, 6)
    g.unpersist()


# ------------------------------------------- centrality-degree correlation
def test_centrality_degree_corr_perfect(spark):
    from linkgraph_spark.kernels.stats import centrality_degree_corr

    ranks = spark.createDataFrame(
        [(0, 0.1), (1, 0.2), (2, 0.3)], "id long, rank double"
    )
    degrees = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 2), (2, 3, 1)], "id long, in_deg long, out_deg long"
    )
    got = {r["pair"]: r["pearson"] for r in centrality_degree_corr(ranks, degrees).collect()}
    assert got["rank_vs_in"] == 1.0
    assert got["rank_vs_out"] == -1.0
    assert got["in_vs_out"] == -1.0


# ------------------------------------------------------------ label mixing
def test_label_mixing_cells(spark):
    from linkgraph_spark.kernels.modularity import label_mixing

    g = graph_from_edges(spark, [(0, 1), (1, 0), (2, 3), (0, 2)])
    labels = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20)], "id long, label long"
    )
    got = {
        (r["label_x"], r["label_y"]): (r["n_edges"], r["frac"])
        for r in label_mixing(g, labels).collect()
    }
    assert got[(10, 10)] == (2, 0.5)
    assert got[(20, 20)] == (1, 0.25)
    assert got[(10, 20)] == (1, 0.25)
    g.unpersist()


# ----------------------------------------------------------------- dau/wau
def test_dau_wau_trailing_window(spark):
    from linkgraph_spark.functions.events import dau_wau

    def ev(eid, uid, day):
        return (eid, uid, "x", datetime(2024, 1, day, 12, 0, tzinfo=timezone.utc))

    df = spark.createDataFrame(
        [ev(1, 1, 1), ev(2, 2, 1), ev(3, 1, 3), ev(4, 1, 1)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {str(r["day"]): r.asDict() for r in dau_wau(df).collect()}
    assert len(got) == 2  # only days with events
    d1, d3 = got["2024-01-01"], got["2024-01-03"]
    assert (d1["dau"], d1["wau"], d1["stickiness"]) == (2, 2, 1.0)
    # day-3 window [dec 28..jan 3] sees both users' day-1 activity
    assert (d3["dau"], d3["wau"], d3["stickiness"]) == (1, 2, 0.5)


# ---------------------------------------------------------- hourly profile
def test_hourly_profile_shares(spark):
    from linkgraph_spark.functions.events import hourly_profile

    rows = [
        (1, 1, "a", datetime(2024, 1, 1, 9, 5), 10.0),
        (2, 1, "a", datetime(2024, 1, 2, 9, 50), 20.0),
        (3, 1, "a", datetime(2024, 1, 1, 17, 0), 40.0),
        (4, 1, "b", datetime(2024, 1, 1, 9, 30), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    got = {
        (r["event_type"], r["hour"]): (r["n"], r["share"], r["avg_value"])
        for r in hourly_profile(df).collect()
    }
    assert got[("a", 9)] == (2, round(2 / 3, 6), 15.0)
    assert got[("a", 17)] == (1, round(1 / 3, 6), 40.0)
    assert got[("b", 9)] == (1, 1.0, 1.0)


# ---------------------------------------------------- embedding quantize
def test_embedding_quantize_exact_grid(spark):
    from linkgraph_spark.functions.similarity import embedding_quantize

    # dim 0: values 0..255 hit the int8 grid exactly -> zero error;
    # dim 1: constant column -> mx == mn guard -> zero error
    rows = [(i, [float(i), 7.0]) for i in range(256)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["dim"]: r.asDict() for r in embedding_quantize(df, bits=8).collect()}
    assert got[0]["mn"] == 0.0 and got[0]["mx"] == 255.0
    assert got[0]["mse"] == 0.0 and got[0]["max_abs_err"] == 0.0
    assert got[1]["mn"] == 7.0 and got[1]["mx"] == 7.0
    assert got[1]["mse"] == 0.0 and got[1]["max_abs_err"] == 0.0


def test_embedding_quantize_midpoint_error(spark):
    from linkgraph_spark.functions.similarity import embedding_quantize

    # range [0, 255], one value at a half-step (0.5): err = 0.5 exactly
    rows = [(0, [0.0]), (1, [255.0]), (2, [0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_quantize(df, bits=8).collect()[0]
    assert got["max_abs_err"] == 0.5
    assert got["mse"] == round(0.25 / 3, 9)


# -------------------------------------------------------------- BPE merges
def _ref_bpe(texts, merges):
    """Exact sequential reference: Sennrich-style BPE over the word-type
    table — max pair count, ties (left asc, right asc); greedy
    left-to-right application."""
    wf = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.strip(" ").lower()).split(" "):
            if w:
                wf[w] += 1
    toks = {w: list(w) + ["</w>"] for w in wf}
    out = []
    for r in range(1, merges + 1):
        pc = Counter()
        for w, f in wf.items():
            tk = toks[w]
            for i in range(len(tk) - 1):
                pc[(tk[i], tk[i + 1])] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((r, left, right, left + right, cnt))
        for w in toks:
            acc = []
            for t in toks[w]:
                if acc and acc[-1] == left and t == right:
                    acc[-1] = left + right
                else:
                    acc.append(t)
            toks[w] = acc
    return out


def test_bpe_merges_matches_reference(spark):
    from linkgraph_spark.functions.text import bpe_merges

    texts = [
        "low low low lower lowest",
        "new newer newest newest",
        "wide wider widest  wide",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(docs, merges=6).orderBy("rank").collect()
    ]
    assert got == _ref_bpe(texts, 6)


def test_bpe_merges_overlapping_run(spark):
    from linkgraph_spark.functions.text import bpe_merges

    # "aaa": pair (a,a) counted twice per word; greedy application
    # merges left-to-right -> [aa, a, </w>] not [a, aa, </w>]
    docs = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(docs, merges=2).orderBy("rank").collect()
    ]
    assert got == _ref_bpe(["aaa aaa"], 2)
    assert got[0] == (1, "a", "a", "aa", 4)  # 2 overlapping pairs x freq 2
