"""Semantics checks for graph_modularity / cuped_variance_reduction /
pca_top_component."""

import numpy as np
from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES


def test_modularity_two_cliques_scores_high(spark):
    """Two 5-cliques joined by one bridge edge: LPA labels the cliques,
    and modularity of that partition, recomputed by hand, must match
    the operator pipeline's formula and be clearly positive."""
    from gfftoneo4j_spark.operators.graph import label_propagation

    cl = [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
    cr = [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
    edges = spark.createDataFrame(
        cl + cr + [("a0", "b0")], "u string, v string"
    )
    comm = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=3).collect()
    }
    assert len({comm[f"a{i}"] for i in range(5)}) == 1
    assert len({comm[f"b{i}"] for i in range(5)}) == 1
    assert comm["a0"] != comm["b0"]
    # hand modularity: m=21, intra=20, D_a = D_b = 21 each... compute
    und = {}
    for u, v in cl + cr + [("a0", "b0")]:
        und.setdefault(u, set()).add(v)
        und.setdefault(v, set()).add(u)
    m = 21
    intra = sum(
        1
        for u, v in cl + cr + [("a0", "b0")]
        if comm[u] == comm[v]
    )
    dc = {}
    for n, nbrs in und.items():
        dc[comm[n]] = dc.get(comm[n], 0) + len(nbrs)
    q = intra / m - sum(d * d for d in dc.values()) / (4 * m * m)
    assert q > 0.3
    assert intra == 20


def test_modularity_gate_query_consistent(spark, sf_dir):
    row = QUERIES["graph_modularity"](spark, sf_dir).collect()[0]
    assert row["intra_edges"] <= row["m_edges"]
    assert 1 <= row["n_communities"]
    assert -0.5 <= row["modularity"] <= 1.0


def test_cuped_reduces_variance(spark, sf_dir):
    row = QUERIES["cuped_variance_reduction"](spark, sf_dir).collect()[0]
    # theta is the OLS minimizer, so in-sample adjusted variance can
    # never exceed raw variance (up to the 6dp pin on theta/xbar)
    assert row["var_y_adj"] <= row["var_y"] + 1e-3
    assert 0.0 - 1e-6 <= row["reduction"] < 1.0
    assert row["n_users"] > 0


def test_pca_matches_numpy_replication_and_eigvec(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    emb = np.array(
        [
            r["embedding"]
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ],
        dtype=np.float64,
    )
    c = np.round(emb.T @ emb, 6)
    w1 = c.sum(axis=1)
    v1 = np.round(w1 / np.abs(w1).sum(), 6)
    w2 = c @ v1
    v2 = np.round(w2 / np.abs(w2).sum(), 6)
    got = {
        r["dim"]: r["loading"]
        for r in QUERIES["pca_top_component"](spark, sf_dir).collect()
    }
    got_vec = np.array([got[i + 1] for i in range(len(v2))])
    # exact replication of the rounded 2-step power iteration
    assert np.max(np.abs(got_vec - v2)) < 2e-6


def test_power_iteration_finds_planted_direction(spark):
    """On a SPIKED spectrum (a real dominant direction — the case a
    drift monitor exists for) two power steps land on the eigenvector;
    the flat-spectrum corpus above only checks determinism."""
    import random

    from gfftoneo4j_spark.operators.similarity import gram_power_iteration

    rng = random.Random(7)
    dims, n = 16, 200
    spike = np.array([rng.gauss(0, 1) for _ in range(dims)])
    spike /= np.linalg.norm(spike)
    rows = []
    for k in range(n):
        noise = np.array([rng.gauss(0, 0.1) for _ in range(dims)])
        coef = rng.gauss(0, 1) * 3.0
        rows.append((k, [float(x) for x in coef * spike + noise]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["dim"]: r["loading"]
        for r in gram_power_iteration(df, iters=2).collect()
    }
    v = np.array([got[i + 1] for i in range(dims)])
    cos = abs(v @ spike) / np.linalg.norm(v)
    assert cos > 0.99, cos


def test_gram_matrix_values_and_join_free_plan(spark):
    """The X'X build must be the per-partition mapInPandas partial —
    NOT the posexplode + self-join-on-row-id form, whose shuffle is
    |rows| * d^2 product rows (0.6M-16M per document at d=768-4096).
    Freezes both the values and the plan shape: no Join, no Generate
    (explode) anywhere in the gram computation."""
    from gfftoneo4j_spark.operators.similarity import gram_matrix

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    g = gram_matrix(df)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan
    got = {(r["i"], r["j"]): r["c"] for r in g.collect()}
    # X'X of [[1,2],[3,4]] = [[10, 14], [14, 20]]
    assert got == {(1, 1): 10.0, (1, 2): 14.0, (2, 1): 14.0, (2, 2): 20.0}


def test_powerlaw_alpha_matches_numpy(spark, sf_dir):
    import math

    from gfftoneo4j_spark.queries import QUERIES

    row = QUERIES["powerlaw_alpha"](spark, sf_dir).collect()[0]
    t = QUERIES["kg_triples"](spark, sf_dir)
    from collections import defaultdict

    nbrs = defaultdict(set)
    for r in t.select("subj", "obj").distinct().collect():
        if r["subj"] != r["obj"]:
            nbrs[r["subj"]].add(r["obj"])
            nbrs[r["obj"]].add(r["subj"])
    tail = [len(v) for v in nbrs.values() if len(v) >= 2]
    want = round(1 + len(tail) / sum(math.log(d / 1.5) for d in tail), 6)
    assert row["n_tail"] == len(tail)
    assert abs(row["alpha"] - want) < 1e-5
    assert row["alpha"] > 1.0


def test_heaps_law_curve_invariants(spark, sf_dir):
    from gfftoneo4j_spark.queries import QUERIES
    from gfftoneo4j_spark.sources.transcripts import load_table

    rows = sorted(
        (r["bucket"], r["cum_tokens"], r["cum_vocab"])
        for r in QUERIES["heaps_law"](spark, sf_dir).collect()
    )
    assert [b for b, _, _ in rows] == list(range(16))
    toks = [t for _, t, _ in rows]
    voc = [v for _, _, v in rows]
    assert toks == sorted(toks) and voc == sorted(voc)  # cumulative
    assert all(v <= t for t, v in zip(toks, voc))
    # endpoints: exact totals recomputed independently
    docs = [
        (r["doc_id"], r["text"].strip().split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    total = sum(max(0, len(w) - 2) for _, w in docs)
    vocab = len(
        {
            " ".join(w[p : p + 3])
            for _, w in docs
            for p in range(len(w) - 2)
        }
    )
    assert toks[-1] == total
    assert voc[-1] == vocab
