"""Invariants for the weighted-PageRank variant and the centroid
distance matrix."""

import math

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import pagerank_fixed_point
from gfftoneo4j_spark.queries import QUERIES


def test_weighted_pagerank_w1_equals_unweighted(spark):
    rows = [(f"n{i}", f"n{(i * 3 + 1) % 29}") for i in range(120)]
    edges = spark.createDataFrame(rows, "u string, v string")
    plain = sorted(
        tuple(r) for r in pagerank_fixed_point(edges, iters=3).collect()
    )
    w1 = (
        edges.distinct().withColumn("w", F.lit(1))
    )
    weighted = sorted(
        tuple(r)
        for r in pagerank_fixed_point(w1, iters=3, weight="w").collect()
    )
    assert plain == weighted  # bit-identical, not approximately equal


def test_weighted_pagerank_weight_shifts_mass(spark):
    # a -> b and a -> c; tripling w(a->b) must rank b above c
    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "u string, v string, w int"
    )
    out = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(edges, iters=2, weight="w").collect()
    }
    assert out["b"] > out["c"]


def test_centroid_distances_consistent(spark, sf_dir):
    rows = QUERIES["centroid_distances"](spark, sf_dir).collect()
    assert rows
    labels = set()
    for r in rows:
        assert r["l1"] < r["l2"]
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9
        assert r["l2_dist"] >= 0
        labels |= {r["l1"], r["l2"]}
    # full pairwise matrix over the label set
    n = len(labels)
    assert len(rows) == math.comb(n, 2)
