"""Bucketed graph sink: the pre-paid-shuffle contract. A join between
the bucketed edges and nodes tables on the bucket key must plan as a
bucket-local SortMergeJoin with ZERO Exchange operators — the property
that makes every downstream graph join shuffle-free at 10^12 edges.
"""

import pytest
from pyspark.sql import functions as F

from gfftoneo4j_spark.plans.graph_sink import write_bucketed_graph


@pytest.fixture()
def graph_frames(spark):
    nodes = spark.createDataFrame(
        [(f"n{i}", "turn", None) for i in range(100)],
        "node_id string, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 100}", "next_turn") for i in range(100)]
        + [("n1", "n7", "next_turn")],  # dup of i=1: deduped on write
        "src string, dst string, type string",
    )
    return nodes, edges


def test_bucketed_join_has_no_exchange(spark, graph_frames, tmp_path):
    nodes, edges = graph_frames
    write_bucketed_graph(
        nodes, edges, "kgtest", n_buckets=4, path=str(tmp_path / "bkt")
    )
    e = spark.table("kgtest_edges")
    n = spark.table("kgtest_nodes")
    # K2 dedup-on-write rode the bucketing shuffle
    assert e.count() == 100

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = e.join(n, e["src"] == n["node_id"]).select("src", "dst", "label")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS kgtest_edges")
        spark.sql("DROP TABLE IF EXISTS kgtest_nodes")
