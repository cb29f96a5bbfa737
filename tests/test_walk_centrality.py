"""walk_visit_centrality vs exact betweenness on a hub-bridge toy
(operators/graph.py). The estimator screens for high-traffic nodes; the
pinned property is that the TOP node matches exact Brandes betweenness
on a graph with one unambiguous traffic hub, plus bit-stability."""

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import walk_visit_centrality


def _star_edges(spark):
    # center 0 <-> spokes 1..4, directed both ways. Exact directed
    # betweenness: center lies on ALL 4*3=12 spoke->spoke shortest
    # paths; every spoke has betweenness 0. Unambiguous argmax.
    pairs = []
    for s in range(1, 5):
        pairs.append((0, s))
        pairs.append((s, 0))
    return spark.createDataFrame(pairs, "u long, v long")


def test_top_node_matches_exact_betweenness_on_star(spark):
    e = _star_edges(spark)
    rows = walk_visit_centrality(e, steps=3).collect()
    by_node = {r["node"]: r["visits"] for r in rows}
    # every walk from a spoke hits the center at step 1 (its only
    # out-neighbor), so the center dominates interior visits, matching
    # the exact-betweenness argmax
    assert max(by_node, key=by_node.get) == 0
    # normalization: centralities sum to ~1
    assert abs(sum(r["centrality"] for r in rows) - 1.0) < 1e-4


def test_centrality_is_bit_stable_across_partitionings(spark):
    e = _star_edges(spark)
    a = sorted(
        walk_visit_centrality(e, steps=3).collect(),
        key=lambda r: r["node"],
    )
    b = sorted(
        walk_visit_centrality(e.repartition(7), steps=3).collect(),
        key=lambda r: r["node"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_interior_visits_exclude_start_and_endpoint(spark):
    # path graph 1 -> 2 -> 3 -> 4: walk from 1 = [1,2,3,4]; interior
    # steps are 1..2 so node 4 (the endpoint of the full-length walk)
    # is only counted when some SHORTER walk reaches it mid-walk
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "u long, v long"
    )
    rows = {
        r["node"]: r["visits"]
        for r in walk_visit_centrality(e, steps=3).collect()
    }
    # from 1: interior visits 2 (step1), 3 (step2)
    # from 2: interior visits 3 (step1), 4 (step2)
    # from 3: interior visits 4 (step1)
    assert rows == {2: 1, 3: 2, 4: 2}
