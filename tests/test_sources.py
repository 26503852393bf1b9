import json
import os

from linkgraph_spark.sources.edgelist import (
    clean_int_edges,
    read_adjacency_json,
    read_edge_list,
    write_adjacency_json,
)
from tests.oracles import clean


def test_edge_list_scan_parses_reference_format(spark, tmp_path):
    """Tab-separated src\\tdst lines incl. \\r line endings and malformed
    rows — the reference's exact input handling (init_to_s3.py:60-62,78-79)."""
    p = tmp_path / "edges.txt"
    p.write_text("1\t2\n2\t3\r\nbogus line\n3\t\n4\t1\n\n5\tnotanum\n")
    got = sorted(
        (r["src"], r["dst"]) for r in read_edge_list(spark, str(p)).collect()
    )
    assert got == [(1, 2), (2, 3), (4, 1)]


def test_adjacency_json_roundtrip(spark, tmp_path):
    edges_in = [(1, 2), (2, 3), (4, 1), (7, 1500), (9, 1500), (2, 3), (3, 3)]
    df = spark.createDataFrame(edges_in, "src long, dst long")
    cleaned = clean_int_edges(df)
    out = str(tmp_path / "adj")
    write_adjacency_json(cleaned, out, partition_width=1000)

    # reference layout: partition i holds dsts in [i*1000, (i+1)*1000)
    parts = sorted(d for d in os.listdir(out) if d.startswith("part="))
    assert parts == ["part=0", "part=1"]

    back = sorted((r["src"], r["dst"]) for r in read_adjacency_json(spark, out).collect())
    assert back == sorted(set(clean(edges_in)))


def test_adjacency_json_is_reference_shaped(spark, tmp_path):
    """Each partition file holds one {dst: [srcs]} JSON dict with string
    keys/values, like relation/<i>.txt (init_to_s3.py:72-84)."""
    df = spark.createDataFrame([(10, 20), (11, 20), (10, 21)], "src long, dst long")
    out = str(tmp_path / "adj")
    write_adjacency_json(df, out, partition_width=1000)
    files = [
        os.path.join(out, "part=0", f)
        for f in os.listdir(os.path.join(out, "part=0"))
        if f.endswith(".json")
    ]
    payloads = []
    for f in files:
        with open(f) as fh:
            payloads += [json.loads(line) for line in fh if line.strip()]
    assert len(payloads) == 1
    adj = json.loads(payloads[0]["adjacency_json"])
    assert adj == {"20": ["10", "11"], "21": ["10"]}


def test_ranks_jdbc_roundtrip(spark, tmp_path):
    """Export final ranks to an embedded-Derby JDBC table and read them
    back — the reference's external-readout exit (dynamodb_get_json.py),
    Spark-native (per-partition connections, no driver collect)."""
    from linkgraph_spark.sources import read_ranks_jdbc, write_ranks_jdbc

    ranks = spark.range(50).selectExpr("id", "1.0 / (id + 1) as rank")
    url = f"jdbc:derby:{tmp_path}/derby_ranks;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    write_ranks_jdbc(ranks, url, "final_ranks", driver=driver, num_partitions=2)
    back = read_ranks_jdbc(spark, url, "final_ranks", driver=driver)
    got = {r["id"]: r["rank"] for r in back.collect()}
    want = {r["id"]: r["rank"] for r in ranks.collect()}
    assert got == want


def test_ranks_json_roundtrip(spark, tmp_path):
    from linkgraph_spark.sources import write_ranks_json

    ranks = spark.range(20).selectExpr("id", "cast(id as double) as rank")
    out = str(tmp_path / "ranks_json")
    write_ranks_json(ranks, out)
    back = spark.read.json(out)
    assert back.count() == 20
    assert {r["id"]: r["rank"] for r in back.collect()} == {
        r["id"]: r["rank"] for r in ranks.collect()
    }
