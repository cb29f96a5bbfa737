"""label_propagation: deterministic synchronous LPA — convergence on a
seeded two-cluster graph, exact tie-break semantics, and partition
invariance (the determinism that makes an iterative community op
hash-gateable at all)."""

from gfftoneo4j_spark.operators.graph import label_propagation


def _labels(df):
    return {r["node"]: r["community"] for r in df.collect()}


def _two_cliques(spark, bridge=True):
    # clique A = a0..a4, clique B = b0..b4, one bridge a4 -- b0
    edges = []
    for p in ("a", "b"):
        ns = [f"{p}{i}" for i in range(5)]
        edges += [(x, y) for i, x in enumerate(ns) for y in ns[i + 1 :]]
    if bridge:
        edges.append(("a4", "b0"))
    return spark.createDataFrame(edges, "u string, v string")


def test_two_cluster_convergence(spark):
    # synchronous LPA with (max votes, min label) tie-break: round 1
    # floods each clique with its two smallest ids, round 2+ collapses
    # to one label per clique; 4 rounds is past the fixed point.
    out = _labels(label_propagation(_two_cliques(spark), iters=4))
    a = {out[f"a{i}"] for i in range(5)}
    b = {out[f"b{i}"] for i in range(5)}
    assert len(a) == 1, f"clique A not converged: {a}"
    assert len(b) == 1, f"clique B not converged: {b}"
    assert a != b, "bridge edge merged the two communities"


def test_fixed_point_is_stable(spark):
    # one more round after convergence must not change any label
    g = _two_cliques(spark)
    assert _labels(label_propagation(g, iters=4)) == _labels(
        label_propagation(g, iters=5)
    )


def test_single_round_tiebreak_exact(spark):
    # path x - y - z: every neighbor multiset is all-distinct labels,
    # so round 1 is pure min-label tie-break:
    #   x sees {y} -> y;  y sees {x, z} -> x;  z sees {y} -> y
    edges = spark.createDataFrame([("x", "y"), ("y", "z")], "u string, v string")
    out = _labels(label_propagation(edges, iters=1))
    assert out == {"x": "y", "y": "x", "z": "y"}


def test_partition_invariance(spark):
    g = _two_cliques(spark)
    base = _labels(label_propagation(g, iters=3))
    for n in (1, 7):
        assert _labels(label_propagation(g.repartition(n), iters=3)) == base
