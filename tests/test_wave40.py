"""Wave-40 operators: hub-distance histogram, unicode script-mix census,
hourly burst episodes."""

import datetime

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.events import hourly_bursts
from linkgraph_spark.functions.text import script_mix
from linkgraph_spark.kernels.paths import hub_distance


# ---------------------------------------------------------------- hub_distance
def test_hub_distance_star_chain(spark):
    # hub 0 → {1,2,3}; chain 3→4→5. Top-1 hub is 0 (out-deg 3).
    # Undirected distances from 0: {0:0, 1:1, 2:1, 3:1, 4:2, 5:3}
    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5)])
    got = {r.distance: r.n_vertices for r in hub_distance(g, k=1).collect()}
    assert got == {0: 1, 1: 3, 2: 1, 3: 1}


def test_hub_distance_excludes_unreached(spark):
    # isolated directed pair 8→9 is unreachable from hub 0's component
    g = graph_from_edges(spark, [(0, 1), (0, 2), (8, 9)])
    got = {r.distance: r.n_vertices for r in hub_distance(g, k=1).collect()}
    assert got == {0: 1, 1: 2}
    with pytest.raises(ValueError):
        hub_distance(g, k=0)


# ------------------------------------------------------------------ script_mix
def test_script_mix_labels(spark):
    docs = spark.createDataFrame(
        [
            (0, "hello world", "en", "s", 11),
            (1, "привет", "ru", "s", 6),
            (2, "pайypal", "en", "s", 7),   # latin + cyrillic homoglyph
            (3, "你好 hello", "zh", "s", 8),
            (4, "12345 !!!", "en", "s", 9),  # no tracked script
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.scripts: r.n_docs for r in script_mix(docs).collect()}
    assert got["latin"] == 1
    assert got["cyrillic"] == 1
    assert got["latin+cyrillic"] == 1
    assert got["latin+cjk"] == 1
    assert got["none"] == 1


# ---------------------------------------------------------------- hourly_bursts
def _ev(spark, hour_counts):
    t0 = datetime.datetime(2026, 1, 1)
    rows, i = [], 0
    for h, c in enumerate(hour_counts):
        for _ in range(c):
            rows.append((i, t0 + datetime.timedelta(hours=h, minutes=2), 1, "view", 0.0))
            i += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_hourly_bursts_runs(spark):
    # median of [1,1,5,6,1,1,9,1] = 1 → threshold 2: runs (5,6) and (9)
    rows = hourly_bursts(_ev(spark, [1, 1, 5, 6, 1, 1, 9, 1])).collect()
    runs = sorted((r.n_hours, r.total_events, r.peak) for r in rows)
    assert runs == [(1, 9, 9), (2, 11, 6)]
    assert len({r.start_h for r in rows}) == 2


def test_hourly_bursts_quiet_stream_empty(spark):
    assert hourly_bursts(_ev(spark, [2, 2, 2, 2])).count() == 0
    with pytest.raises(ValueError):
        hourly_bursts(_ev(spark, [1]), factor=0)
