"""Tests for mutual-NN pairs, forecast backtest, SCAN edge similarity."""

from collections import defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_mutual_nn_symmetric_and_best(spark, sf_dir):
    rows = QUERIES["mutual_nn_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert -1.0 - 1e-9 <= r["score"] <= 1.0 + 1e-9
    # no vector appears in two mutual pairs (top-1 is unique per side)
    seen = defaultdict(int)
    for r in rows:
        seen[r["id_a"]] += 1
        seen[r["id_b"]] += 1
    assert all(c == 1 for c in seen.values())


def test_forecast_backtest_identities(spark, sf_dir):
    rows = QUERIES["forecast_backtest"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_days"] >= 7
        assert 0 <= r["smape1"] <= 2.0 + 1e-9
        assert r["mase7"] > 0
        assert r["sae1"] >= 0 and r["sae7"] >= 0


def test_scan_sigma_recompute(spark, sf_dir):
    rows = QUERIES["edge_structural_similarity"](spark, sf_dir).collect()
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
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    assert len(rows) == len(edges)
    import math

    for r in rows[:200]:
        a, b = r["a"], r["b"]
        common = len(adj[a] & adj[b])
        assert r["support"] == common
        sigma = (common + 2.0) / math.sqrt(
            (len(adj[a]) + 1.0) * (len(adj[b]) + 1.0)
        )
        assert abs(r["sigma"] - sigma) < 1e-5
        assert r["is_core"] == (1 if sigma >= 0.5 else 0)
    assert any(r["is_core"] == 1 for r in rows)
    assert any(r["is_core"] == 0 for r in rows)
