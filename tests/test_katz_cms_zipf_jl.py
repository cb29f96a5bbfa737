"""Round-5 operator checks: Katz centrality (hand-computed),
Count-Min one-sidedness, token-Zipf MLE vs direct recomputation, and
JL projection vs numpy + plan shape."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import katz_centrality
from gfftoneo4j_spark.operators.sketches import (
    countmin_counters,
    countmin_estimate,
)
from gfftoneo4j_spark.queries import QUERIES


def test_katz_hand_computed_on_path(spark):
    # path 1 -> 2 -> 3, scale 1e6, alpha 20/100:
    # x1 = (1e6, 1.2e6, 1.2e6); x2 = (1e6, 1.2e6, 1.24e6);
    # x3 unchanged (node 2's incoming quotient is already converged)
    e = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    got = {r["node"]: r["katz"] for r in katz_centrality(e, iters=3).collect()}
    assert got == {1: 1_000_000, 2: 1_200_000, 3: 1_240_000}


def test_katz_bit_stable_across_partitionings(spark):
    edges = [(i, (i * 7) % 23) for i in range(60) if i != (i * 7) % 23]
    e1 = spark.createDataFrame(edges, "u long, v long")
    a = sorted(katz_centrality(e1, iters=3).collect())
    b = sorted(katz_centrality(e1.repartition(13), iters=3).collect())
    assert a == b


def test_countmin_is_one_sided_and_exact_when_sparse(spark):
    rows = [(f"t{i % 17}",) for i in range(500)]
    df = spark.createDataFrame(rows, "token string")
    counters = countmin_counters(df, "token")
    probes = df.distinct()
    est = {
        r["val"]: r["est_n"]
        for r in countmin_estimate(counters, probes, "token").collect()
    }
    exact = {
        r["token"]: r["n"]
        for r in df.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for tok, n in exact.items():
        assert est[tok] >= n, (tok, est[tok], n)
    # 17 distinct tokens in 4 x 256 cells: collisions possible but the
    # MIN over 4 independent rows should recover exactness here
    assert sum(est[t] == exact[t] for t in exact) >= 15


def test_countmin_width_guard(spark):
    df = spark.createDataFrame([("x",)], "token string")
    with pytest.raises(ValueError):
        countmin_counters(df, "token", width=512)


def test_token_zipf_alpha_matches_direct_mle(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    pdf = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .count()
        .toPandas()
    )
    tail = [int(c) for c in pdf["count"] if c >= 2]
    want = round(1 + len(tail) / sum(math.log(c / 1.5) for c in tail), 6)
    row = QUERIES["token_zipf_alpha"](spark, sf_dir).collect()[0]
    assert row["n_tail"] == len(tail)
    assert abs(row["alpha"] - want) < 2e-6


def test_jl_projection_matches_numpy_and_is_map_only(spark, sf_dir):
    from gfftoneo4j_spark.operators.similarity import jl_project
    from gfftoneo4j_spark.sources.transcripts import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = jl_project(emb, out_dim=8, in_dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "JL projection must be map-only"
    sample = {r["vec_id"]: r["embedding"] for r in emb.limit(5).collect()}
    got = {
        (r["vec_id"], r["k"]): r["proj"]
        for r in df.where(
            F.col("vec_id").isin(list(sample))
        ).collect()
    }
    signs = np.array(
        [
            [
                1.0
                if int(hashlib.md5(f"jl:{k}:{i}".encode()).hexdigest()[0], 16)
                >= 8
                else -1.0
                for i in range(1, 65)
            ]
            for k in range(8)
        ]
    )
    for vid, vec in sample.items():
        x = np.array(vec, dtype=np.float64)
        want = signs @ x
        for k in range(8):
            assert abs(got[(vid, k)] - round(float(want[k]), 6)) < 2e-6


def test_pq_encode_shape_stability_and_identical_vectors(spark):
    from gfftoneo4j_spark.operators.similarity import pq_encode

    # 24 vectors, dim 32 (2 blocks x 16): two well-separated groups
    # with small deterministic jitter; plus ids 100/101 identical
    rows = []
    for i in range(12):
        rows.append((i, [1.0 + (i % 3) / 100.0] * 32))
        rows.append((50 + i, [-1.0 - (i % 3) / 100.0] * 32))
    rows.append((100, [0.5] * 32))
    rows.append((101, [0.5] * 32))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_encode(df, n_blocks=2, block_dim=16, k=4, lloyd_rounds=1)
    got = {(r["vec_id"], r["block"]): r["code"] for r in out.collect()}
    # shape: n_blocks rows per vector, codes in [0, k)
    assert len(got) == len(rows) * 2
    assert all(0 <= c < 4 for c in got.values())
    # identical vectors quantize identically
    for b in (0, 1):
        assert got[(100, b)] == got[(101, b)]
    # bit-stable across partitionings
    out2 = pq_encode(
        df.repartition(7), n_blocks=2, block_dim=16, k=4, lloyd_rounds=1
    )
    assert got == {
        (r["vec_id"], r["block"]): r["code"] for r in out2.collect()
    }
