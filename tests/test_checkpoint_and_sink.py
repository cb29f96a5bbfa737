"""K3 checkpoint/resume + K1/K2 persisted graph sink.

Reference semantics: Neo4JUtils.scala:22-28 brackets writes in a
transaction (the only atomicity/restart story); GenesToNeo4j.scala:9-25
materializes the node/edge sets. Here: a resumed run must reuse every
stage snapshot whose fingerprint matches, a fingerprint change must
invalidate, and the written graph must round-trip losslessly with
dedup-on-write and manifest-last atomicity.
"""

from datetime import datetime, timedelta

import pytest

from gfftoneo4j_spark.plans.checkpoint import StageCheckpointer
from gfftoneo4j_spark.plans.graph_sink import (
    GRAPH_MANIFEST,
    read_graph,
    write_graph,
)
from gfftoneo4j_spark.plans.pipeline import build_kg
from gfftoneo4j_spark.sources.transcripts import ALIAS_DICT_SCHEMA, TRANSCRIPT_SCHEMA

T0 = datetime(2024, 1, 1)

TURNS = [
    {
        "conv_id": c,
        "turn_idx": i,
        "role": "user" if i % 2 == 0 else "assistant",
        "text": t,
        "tool": None,
        "ts": T0 + timedelta(seconds=30 * i),
    }
    for c, i, t in [
        ("cA", 0, "hello <<m:spark_a0>> intro"),
        ("cA", 1, "more on <<m:spark_a1>> and <<m:join_b0>>"),
        ("cA", 2, "wrap up <<m:spark_a0>>"),
        ("cB", 0, "other thread <<m:join_b1>>"),
        ("cB", 1, "unlinked <<m:ghost_404>>"),
    ]
]

ALIASES = [
    {"alias": "spark_a0", "entity_id": "E10", "entity_type": "entity", "parent_id": None},
    {"alias": "spark_a1", "entity_id": "E11", "entity_type": "topic", "parent_id": "E10"},
    {"alias": "join_b0", "entity_id": "E20", "entity_type": "entity", "parent_id": None},
    {"alias": "join_b1", "entity_id": "E21", "entity_type": "entity", "parent_id": "E20"},
]

ALL_STAGES = ["mentions", "canon", "linked", "edges"]


@pytest.fixture()
def dfs(spark):
    return (
        spark.createDataFrame(TURNS, TRANSCRIPT_SCHEMA),
        spark.createDataFrame(ALIASES, ALIAS_DICT_SCHEMA),
    )


def _triples(res):
    return {(r["subj"], r["pred"], r["obj"]) for r in res.triples.collect()}


def test_resume_reuses_all_stages(spark, dfs, tmp_path):
    tdf, ddf = dfs
    ck1 = StageCheckpointer(spark, str(tmp_path / "ck"))
    res1 = build_kg(spark, tdf, ddf, checkpointer=ck1, fingerprint="v1")
    got1 = _triples(res1)
    assert ck1.computed == ALL_STAGES and ck1.reused == []

    ck2 = StageCheckpointer(spark, str(tmp_path / "ck"))
    res2 = build_kg(spark, tdf, ddf, checkpointer=ck2, fingerprint="v1")
    assert ck2.reused == ALL_STAGES and ck2.computed == []
    assert _triples(res2) == got1


def test_partial_run_resumes_from_surviving_stage(spark, dfs, tmp_path):
    """'Killed after mentions': only the mentions snapshot exists; the
    restarted run must reuse it and compute the rest."""
    tdf, ddf = dfs
    base = str(tmp_path / "ck")
    ck_partial = StageCheckpointer(spark, base)
    # drive build_kg but stop consuming after the mentions stage was
    # materialized: stage() writes eagerly, so constructing the plan is
    # enough, and we then delete every later snapshot to simulate a kill
    build_kg(spark, tdf, ddf, checkpointer=ck_partial, fingerprint="v1")
    import shutil

    for late in ALL_STAGES[1:]:
        shutil.rmtree(tmp_path / "ck" / late)

    ck = StageCheckpointer(spark, base)
    res = build_kg(spark, tdf, ddf, checkpointer=ck, fingerprint="v1")
    assert ck.reused == ["mentions"]
    assert ck.computed == ALL_STAGES[1:]
    assert len(_triples(res)) > 0


def test_fingerprint_change_invalidates(spark, dfs, tmp_path):
    tdf, ddf = dfs
    base = str(tmp_path / "ck")
    build_kg(
        spark, tdf, ddf, checkpointer=StageCheckpointer(spark, base), fingerprint="v1"
    )
    ck = StageCheckpointer(spark, base)
    build_kg(spark, tdf, ddf, checkpointer=ck, fingerprint="v2")
    assert ck.reused == [] and ck.computed == ALL_STAGES


def test_graph_sink_roundtrip(spark, dfs, tmp_path):
    tdf, ddf = dfs
    res = build_kg(spark, tdf, ddf)
    path = str(tmp_path / "graph")
    write_graph(res.nodes, res.edges, path, fingerprint="t1")

    g = read_graph(spark, path)
    want_nodes = {(r["node_id"], r["label"]) for r in res.nodes.collect()}
    got_nodes = {(r["node_id"], r["label"]) for r in g.nodes.collect()}
    assert got_nodes == want_nodes

    want_edges = {(r["src"], r["dst"], r["type"]) for r in res.edges.collect()}
    got_edges = {(r["src"], r["dst"], r["type"]) for r in g.edges.collect()}
    assert got_edges == want_edges

    # triples view is a pure rename of edges
    assert _triples(res) == {
        (r["subj"], r["pred"], r["obj"]) for r in g.triples.collect()
    }

    # partition pruning surface: per-type subdirectories exist
    assert (tmp_path / "graph" / "edges" / "type=next_turn").exists()


def test_graph_sink_dedup_on_write(spark, dfs, tmp_path):
    """`create unique` (Neo4JUtils.scala:43): duplicate inserts collapse."""
    tdf, ddf = dfs
    res = build_kg(spark, tdf, ddf)
    path = str(tmp_path / "graph")
    write_graph(
        res.nodes.unionByName(res.nodes),
        res.edges.unionByName(res.edges),
        path,
    )
    g = read_graph(spark, path)
    assert g.edges.count() == res.edges.count()
    assert g.nodes.count() == res.nodes.count()


def test_graph_sink_torn_write_detected(spark, dfs, tmp_path):
    tdf, ddf = dfs
    res = build_kg(spark, tdf, ddf)
    path = str(tmp_path / "graph")
    write_graph(res.nodes, res.edges, path)
    (tmp_path / "graph" / GRAPH_MANIFEST).unlink()  # simulate torn run
    with pytest.raises(FileNotFoundError):
        read_graph(spark, path)
