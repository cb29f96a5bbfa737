"""Tests for luby_mis (independence/maximality/exhaustion),
stupid_backoff_scores (both branches) and fellegi_sunter_scores."""

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import luby_mis
from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def _mis(spark, n, pairs, rounds=8):
    e = spark.createDataFrame(pairs or [(0, 0)], "u long, v long")
    nodes = spark.range(n).select(F.col("id").alias("i"))
    rows = luby_mis(e, nodes=nodes, rounds=rounds).collect()
    return {r["node"] for r in rows}


def _check_mis(mis, n, pairs):
    und = set()
    for u, v in pairs:
        if u != v:
            und.add((u, v))
            und.add((v, u))
    # independence
    for u, v in und:
        assert not (u in mis and v in mis), f"adjacent {u},{v} both in MIS"
    # maximality: every non-member has a member neighbor
    for x in range(n):
        if x not in mis:
            assert any(
                (x, y) in und and y in mis for y in range(n)
            ), f"{x} could be added"


def test_mis_path_graph(spark):
    pairs = [(i, i + 1) for i in range(9)]
    mis = _mis(spark, 10, pairs)
    _check_mis(mis, 10, pairs)


def test_mis_star_graph(spark):
    # hub 0 with leaves: MIS is either {0} or all leaves
    pairs = [(0, i) for i in range(1, 8)]
    mis = _mis(spark, 8, pairs)
    _check_mis(mis, 8, pairs)


def test_mis_isolated_nodes_all_selected(spark):
    mis = _mis(spark, 5, [(0, 1)])
    assert {2, 3, 4} <= mis
    _check_mis(mis, 5, [(0, 1)])


def test_mis_gate_graph_exhausts_and_is_valid(spark, sf_dir):
    """The registered query's 6 rounds must fully exhaust the sf
    graph, and the result must be a true MIS (independence +
    maximality verified edge-by-edge)."""
    d = load_table(spark, sf_dir, "documents")
    m = d.count()
    base = d.select((F.col("doc_id") % m).alias("i"))
    raw = None
    for expr in ["(i + 1) % {m}", "(i + 2) % {m}", "(i + 3) % {m}",
                 "(i * 2) % {m}"]:
        part = base.select(
            F.col("i").alias("u"),
            F.expr(expr.format(m=m)).alias("v"),
        )
        raw = part if raw is None else raw.unionAll(part)
    pairs = [(r["u"], r["v"]) for r in raw.collect()]
    mis = {r["node"] for r in QUERIES["luby_mis"](spark, sf_dir).collect()}
    _check_mis(mis, m, pairs)


def test_stupid_backoff_branches(spark, sf_dir):
    rows = QUERIES["stupid_backoff_scores"](spark, sf_dir).collect()
    assert len(rows) == 961
    seen = [r for r in rows if r["c2"] > 0]
    unseen = [r for r in rows if r["c2"] == 0]
    assert seen and unseen, "both branches must exercise"
    # recompute from raw counts
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.trim("text"), " ")).alias("t"))
    uni = {
        r["t"]: r["c"]
        for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
    }
    n = sum(uni.values())
    for r in rows[:50]:
        if r["c2"] > 0:
            assert r["score_ppm"] == r["c2"] * 1000000 // uni[r["w1"]]
        else:
            assert r["score_ppm"] == uni[r["w2"]] * 400000 // n


def test_fellegi_sunter_weights(spark, sf_dir):
    rows = QUERIES["fellegi_sunter_scores"](spark, sf_dir).collect()
    assert rows
    valid_scores = set()
    for wa in (24, -8):
        for wb in (12, -4):
            for wc in (18, -6):
                s = wa + wb + wc
                if s >= 30:
                    valid_scores.add(s)
    got_scores = {r["fs_score"] for r in rows}
    assert got_scores <= valid_scores
    # a-file even ids, b-file odd ids
    assert all(r["id_a"] % 2 == 0 and r["id_b"] % 2 == 1 for r in rows)
