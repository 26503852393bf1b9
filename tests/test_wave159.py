"""Wave-159 operator: conversation flow-template detection."""

import hashlib

from linkgraph_spark.transcripts import conv_templates


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )


def _sig(flow):
    return int(hashlib.md5(flow.encode()).hexdigest()[:15], 16)


def test_templates_group_identical_flows_text_free(spark):
    # c1/c2/c3 share the exact flow; c4 differs at one tool; c5 is a
    # different length — only the trio groups
    flow = [("user", None), ("assistant", "search"), ("assistant", None)]
    rows = []
    for cid in ("c1", "c2", "c3"):
        rows += [(cid, i, r, t) for i, (r, t) in enumerate(flow)]
    rows += [("c4", 0, "user", None), ("c4", 1, "assistant", "bash"),
             ("c4", 2, "assistant", None)]
    rows += [("c5", 0, "user", None), ("c5", 1, "assistant", "search")]
    got = conv_templates(_t(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_convs == 3 and r.n_turns == 3
    assert r.flow_sig == _sig("user|∅>assistant|search>assistant|∅")
    assert r.flow_head == "user|∅>assistant|search>assistant|∅"


def test_templates_turn_order_matters_and_head_truncates(spark):
    rows = (
        [("a", i, "u", None) for i in range(5)]
        + [("b", i, "u", None) for i in range(5)]
        # same multiset of states as a/b but different ORDER at turn 0
        + [("c", 0, "x", None)] + [("c", i, "u", None) for i in range(1, 5)]
    )
    got = {r.flow_sig: r for r in conv_templates(_t(spark, rows)).collect()}
    assert len(got) == 1  # only a/b group; c's reordering breaks the flow
    (r,) = got.values()
    assert r.n_convs == 2 and r.n_turns == 5
    assert r.flow_head == "u|∅>u|∅>u|∅"  # truncated to 3 states


def test_templates_min_convs_filters_singletons(spark):
    rows = [("solo", 0, "user", None)]
    assert conv_templates(_t(spark, rows)).count() == 0
    assert conv_templates(_t(spark, rows), min_convs=1).count() == 1
