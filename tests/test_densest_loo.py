"""Tests for densest-subgraph peeling and LOO source influence."""

from collections import defaultdict

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_densest_peel_recompute(spark, sf_dir):
    rows = sorted(
        QUERIES["densest_subgraph_peel"](spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert rows
    docs = load_table(spark, sf_dir, "documents").count()
    edges = set()
    for i in range(docs):
        for t in [
            (i + 1) % docs,
            (i + 2) % docs,
            (i + 3) % docs,
            (i * 2) % docs,
        ]:
            if i != t:
                edges.add((min(i, t), max(i, t)))
    curve = []
    e = edges
    for _ in range(6):
        deg = defaultdict(int)
        for a, b in e:
            deg[a] += 1
            deg[b] += 1
        if not deg:
            break
        nn, ee = len(deg), len(e)
        curve.append((nn, ee))
        thr = 1.1 * 2.0 * ee / nn
        keep = {n for n, d in deg.items() if d > thr}
        e = {(a, b) for a, b in e if a in keep and b in keep}
    assert len(rows) == len(curve)
    for r, (nn, ee) in zip(rows, curve):
        assert (r["n_nodes"], r["n_edges"]) == (nn, ee)
        assert abs(r["density"] - ee / nn) < 1e-5
    best = max(range(len(curve)), key=lambda i: (curve[i][1] / curve[i][0], -i))
    assert [r["is_best"] for r in rows].index(1) == best
    assert sum(r["is_best"] for r in rows) == 1


def test_source_loo_identities(spark, sf_dir):
    rows = QUERIES["source_influence_loo"](spark, sf_dir).collect()
    assert len(rows) == 20
    nn = sum(r["n"] for r in rows)
    ss = sum(r["s"] for r in rows)
    for r in rows:
        assert abs(r["corpus_mean"] - ss / nn) < 1e-5
        want = (ss - r["s"]) / (nn - r["n"]) - ss / nn
        assert abs(r["loo_delta"] - want) < 1e-5
    # influence sums to ~0 only under equal sizes; at least check that
    # longer-than-average sources pull the mean DOWN when removed
    for r in rows:
        if r["source_mean"] > r["corpus_mean"]:
            assert r["loo_delta"] < 0
        elif r["source_mean"] < r["corpus_mean"]:
            assert r["loo_delta"] > 0
