"""boruvka_mst vs a hand-written Kruskal (unique MSF under distinct
weights) plus spanning invariants on the gated circulant graph."""

import numpy as np
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import boruvka_mst
from gfftoneo4j_spark.queries import QUERIES


def _kruskal(edges):
    """edges: [(a, b, w)] canonical distinct; returns the unique MSF
    edge set as {(a, b)} via union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            mst.add((a, b))
    return mst


def _run(spark, edges, phases=10):
    df = spark.createDataFrame(edges, "u long, v long, w long")
    rows = boruvka_mst(df, phases=phases).collect()
    return {(r["a"], r["b"]) for r in rows}, sum(r["w"] for r in rows)


def test_mst_matches_kruskal_random(spark):
    for seed in (5, 23, 99):
        rng = np.random.RandomState(seed)
        n = 12
        cand = sorted(
            {
                (int(rng.randint(0, n)), int(rng.randint(0, n)))
                for _ in range(30)
            }
        )
        edges = []
        weights = rng.permutation(10000)[: len(cand)]
        for (u, v), w in zip(cand, weights):
            if u != v:
                a, b = min(u, v), max(u, v)
                edges.append((a, b, int(w)))
        # dedup canonical pairs keeping min weight (operator does same)
        best = {}
        for a, b, w in edges:
            if (a, b) not in best or w < best[(a, b)]:
                best[(a, b)] = w
        canon = [(a, b, w) for (a, b), w in best.items()]
        expect = _kruskal(canon)
        got, _ = _run(spark, canon)
        assert got == expect, f"seed {seed}"


def test_mst_disconnected_gives_forest(spark):
    # two components: each gets its own tree, no bridge invented
    edges = [(0, 1, 5), (1, 2, 3), (0, 2, 9), (10, 11, 1)]
    got, _ = _run(spark, edges)
    assert got == {(0, 1), (1, 2), (10, 11)}


def test_mst_gate_graph_spans(spark, sf_dir):
    rows = QUERIES["boruvka_mst"](spark, sf_dir).collect()
    got = {(r["a"], r["b"]): r["w"] for r in rows}
    from gfftoneo4j_spark.sources.transcripts import load_table

    d = load_table(spark, sf_dir, "documents")
    m = d.count()
    ids = sorted({r["doc_id"] % m for r in d.select("doc_id").collect()})
    # rebuild the weighted graph in python and Kruskal it
    import hashlib

    edges = {}
    for i in ids:
        for t in ((i + 1) % m, (i * 2) % m, (i * 3) % m):
            if t != i:
                a, b = min(i, t), max(i, t)
                w = int(
                    hashlib.md5(f"w:{a}:{b}".encode()).hexdigest()[:12], 16
                )
                edges[(a, b)] = w
    canon = [(a, b, w) for (a, b), w in edges.items()]
    expect = _kruskal(canon)
    assert set(got) == expect
    # circulant with +1 generator is connected: spanning tree, n-1 edges
    assert len(got) == len(ids) - 1
    # weights faithful
    for (a, b), w in got.items():
        assert edges[(a, b)] == w
