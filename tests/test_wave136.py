"""Wave-136 operators: day-grain event-type PMI and the Goh-Barabasi
burstiness index."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import burstiness_index, type_pmi_daily

_SCHEMA = "event_id long, user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, 1.0, _T0 + timedelta(days=d, seconds=s))
         for i, (u, t, d, s) in enumerate(rows, 1)],
        _SCHEMA,
    )


def test_pmi_hand_computed(spark):
    # units: (u1,d0): {a,b}; (u1,d1): {a}; (u2,d0): {a,b}; (u2,d1): {b};
    # (u3,d0): {c}  -> N=5, na=3, nb=3, nc=1, nab=2, nac=0, nbc=0
    rows = [
        (1, "a", 0, 0), (1, "b", 0, 10),
        (1, "a", 1, 0),
        (2, "a", 0, 0), (2, "b", 0, 5), (2, "b", 0, 6),
        (2, "b", 1, 0),
        (3, "c", 0, 0),
    ]
    out = {
        (r.type_a, r.type_b): r
        for r in type_pmi_daily(_ev(spark, rows)).collect()
    }
    ab = out[("a", "b")]
    assert ab.n_both == 2
    assert ab.pmi == round(math.log(2 * 5 / (3 * 3)), 6)
    # never co-occurring pairs still emit a row with NULL pmi
    assert out[("a", "c")].n_both == 0 and out[("a", "c")].pmi is None
    assert out[("b", "c")].n_both == 0
    assert len(out) == 3


def test_pmi_perfect_cooccurrence_positive(spark):
    rows = []
    for u in range(1, 6):
        rows += [(u, "x", 0, 0), (u, "y", 0, 1)]
    out = type_pmi_daily(_ev(spark, rows)).collect()[0]
    # every unit has both: pmi = ln(N*N/(N*N)) = ... nab=N, na=nb=N
    assert out.pmi == round(math.log(5 * 5 / (5 * 5)), 6) == 0.0


def test_burstiness_hand_computed(spark):
    # u1 gaps: 10, 10, 100 s; u2 gaps: 5 s
    rows = [
        (1, "a", 0, 0), (1, "a", 0, 10), (1, "a", 0, 20), (1, "a", 0, 120),
        (2, "a", 0, 0), (2, "a", 0, 5),
    ]
    out = burstiness_index(_ev(spark, rows)).collect()[0]
    gaps = [10, 10, 100, 5]
    n = len(gaps)
    mu = sum(gaps) / n
    sd = math.sqrt((n * sum(g * g for g in gaps) - sum(gaps) ** 2) / (n * n))
    b = (sd - mu) / (sd + mu)
    assert out.n_gaps == n
    assert out.mean_gap_s == round(mu, 6)
    assert out.b_index == round(b, 6)
    assert out.b_index > 0  # bursty by construction


def test_burstiness_metronome_is_minus_one(spark):
    rows = [(1, "a", 0, 10 * i) for i in range(6)]
    out = burstiness_index(_ev(spark, rows)).collect()[0]
    # constant gaps: sigma = 0 -> B = -1
    assert out.b_index == -1.0


def test_burstiness_single_events_is_null(spark):
    rows = [(u, "a", 0, 0) for u in range(1, 5)]
    out = burstiness_index(_ev(spark, rows)).collect()[0]
    assert out.n_gaps == 0 and out.b_index is None
