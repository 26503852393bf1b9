"""Wave-94 operator: Bloom-filter join prefilter audit (Bloom 1970) —
broadcastable bit-position table, exact false-positive accounting, and
the no-false-negative structural invariant."""

import hashlib
import math

from linkgraph_spark.functions.sketches import bloom_prefilter_audit

_P = 2_147_483_647


def _h(key):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def _positions(key, m_bits, k):
    params = [(1 + 7 * j, 13 + 97 * j) for j in range(1, k + 1)]
    return [((a * (_h(key) % _P) + b) % _P) % m_bits for a, b in params]


def _cust(spark, rows):
    return spark.createDataFrame(rows, "c_custkey long, c_mktsegment string")


def _ords(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "o_custkey long")


def test_audit_matches_python_mirror_saturated(spark):
    # m=16 forces a saturated filter -> real false positives to account for
    m_bits, k = 16, 4
    members = list(range(1, 6))
    probe = list(range(1, 21))
    cust = _cust(
        spark,
        [(u, "BUILDING") for u in members] + [(99, "MACHINERY")],
    )
    r = bloom_prefilter_audit(
        _ords(spark, probe), cust, m_bits=m_bits, k=k
    ).collect()[0]
    bits = {p for u in members for p in _positions(u, m_bits, k)}
    passes = {u for u in probe if all(p in bits for p in _positions(u, m_bits, k))}
    fp = passes - set(members)
    assert r.n_members == 5
    assert r.n_bits_set == len(bits)
    assert r.n_probed == 20
    assert r.n_pass == len(passes)
    assert r.n_member_hits == 5
    assert r.n_false_pos == len(fp)
    assert r.n_false_neg == 0  # Bloom structural invariant
    assert set(members) <= passes
    assert r.fpr_measured == round(len(fp) / 15, 6)
    assert r.fpr_theory == round((1 - math.exp(-k * 5 / m_bits)) ** k, 6)


def test_members_absent_from_probe_do_not_count(spark):
    cust = _cust(spark, [(1, "BUILDING"), (2, "BUILDING")])
    r = bloom_prefilter_audit(
        _ords(spark, [1, 50, 51]), cust, m_bits=1024, k=4
    ).collect()[0]
    assert r.n_members == 2  # filter built from BOTH members
    assert r.n_member_hits == 1  # but only one was probed
    assert r.n_false_neg == 0
    # with 8 of 1024 bits set, keys 50/51 almost surely miss; verify exactly
    bits = {p for u in (1, 2) for p in _positions(u, 1024, 4)}
    expect_fp = sum(
        all(p in bits for p in _positions(u, 1024, 4)) for u in (50, 51)
    )
    assert r.n_false_pos == expect_fp


def test_empty_segment_passes_nothing(spark):
    cust = _cust(spark, [(1, "MACHINERY")])
    r = bloom_prefilter_audit(
        _ords(spark, [1, 2, 3]), cust, m_bits=64, k=4
    ).collect()[0]
    assert (r.n_members, r.n_bits_set, r.n_pass, r.n_false_pos) == (0, 0, 0, 0)
    assert r.fpr_measured == 0.0 and r.fpr_theory == 0.0
