"""BFS distance invariants (operators/graph.bfs_distances)."""

from __future__ import annotations

from gfftoneo4j_spark.operators.graph import bfs_distances


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u bigint, v bigint")


def test_path_graph_exact_distances(spark):
    e = _edges(spark, [(i, i + 1) for i in range(6)])
    got = {r["node"]: r["dist"] for r in bfs_distances(e, 0, 4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}  # 5,6 beyond depth


def test_undirected_and_shortest_wins(spark):
    # 0-1-2-3 chain plus shortcut 0-3: dist(3) must be 1, not 3
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    got = {r["node"]: r["dist"] for r in bfs_distances(e, 0, 4).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 2: 2}


def test_cycle_terminates_and_covers(spark):
    n = 10
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    got = {r["node"]: r["dist"] for r in bfs_distances(e, 0, n).collect()}
    assert len(got) == n
    assert got[5] == 5  # antipode of the 10-cycle
    assert got[7] == 3  # reached backwards (undirected)


def test_disconnected_component_excluded(spark):
    e = _edges(spark, [(0, 1), (10, 11)])
    got = {r["node"]: r["dist"] for r in bfs_distances(e, 0, 5).collect()}
    assert set(got) == {0, 1}
