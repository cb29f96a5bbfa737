"""Tests for chain contraction, isotonic calibration, encoding advisor,
Neyman allocation, snake k-fold, Mann-Kendall, EB shrinkage and the
g-formula ATE."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import contract_chains
from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "s string, t string")


def test_contract_simple_chain(spark):
    # a -> b -> c -> d : b,c interior -> one edge (a, d, 3)
    got = contract_chains(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    ).collect()
    assert [(r["u"], r["v"], r["path_len"]) for r in got] == [("a", "d", 3)]


def test_contract_branching_preserved(spark):
    # hub a fans to two chains and one direct edge; hub/leaves stay
    e = [
        ("a", "b"), ("b", "c"),          # chain via b (interior)
        ("a", "x"),                       # passthrough (x is a sink)
        ("a", "p"), ("p", "q"), ("q", "r"),  # chain via p,q
    ]
    got = {
        (r["u"], r["v"]): r["path_len"]
        for r in contract_chains(_edges(spark, e)).collect()
    }
    assert got == {("a", "c"): 2, ("a", "x"): 1, ("a", "r"): 3}


def test_contract_cycle_dropped(spark):
    # pure interior cycle has no entry/exit -> contributes nothing
    e = [("a", "b"), ("b", "c"), ("c", "a")]
    assert contract_chains(_edges(spark, e)).collect() == []


def test_isotonic_fit_monotone_and_pooled(spark, sf_dir):
    rows = sorted(
        QUERIES["isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    assert len(rows) == 16
    for a, b in zip(rows, rows[1:]):
        assert a["iso_fit"] <= b["iso_fit"] + 1e-9
    # the fit preserves the weighted mean (PAVA projects onto the
    # monotone cone; pooled blocks keep their block averages)
    tot_n = sum(r["n"] for r in rows)
    raw_mean = sum(r["n"] * r["frac_pos"] for r in rows) / tot_n
    iso_mean = sum(r["n"] * r["iso_fit"] for r in rows) / tot_n
    assert abs(raw_mean - iso_mean) < 1e-4


def test_isotonic_matches_pava(spark, sf_dir):
    rows = sorted(
        QUERIES["isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    # classic sequential PAVA recompute on (n, frac_pos)
    blocks = [[r["n"], r["n"] * r["frac_pos"]] for r in rows]
    merged = []
    for b in blocks:
        merged.append(b)
        while len(merged) > 1 and (
            merged[-2][1] / merged[-2][0] > merged[-1][1] / merged[-1][0]
        ):
            n2, s2 = merged.pop()
            merged[-1][0] += n2
            merged[-1][1] += s2
    # expand merged blocks back over the original bins
    out = []
    i = 0
    for n, s in merged:
        acc = 0
        while acc < n:
            acc += rows[i]["n"]
            out.append(s / n)
            i += 1
    assert len(out) == 16
    for r, f in zip(rows, out):
        assert abs(r["iso_fit"] - f) < 1e-4


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    rows = QUERIES["neyman_allocation"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert sum(r["alloc"] for r in rows) == 1000
    for r in rows:
        assert abs(r["alloc"] - r["quota"]) < 1.0
        assert r["sd"] > 0


def test_kfold_balance(spark, sf_dir):
    rows = QUERIES["group_kfold_snake"](spark, sf_dir).collect()
    assert sorted(r["fold"] for r in rows) == [0, 1, 2, 3, 4]
    evs = [r["n_events"] for r in rows]
    # snake draft keeps the fold spread well under one fold's load
    # (with very few users per fold the spread is bounded by a single
    # user's activity, so allow a generous fraction of the mean)
    assert max(evs) - min(evs) <= 0.25 * (sum(evs) / len(evs))
    for r in rows:
        assert abs(r["balance"] - 5 * r["n_events"] / sum(evs)) < 1e-5


def test_mann_kendall_recompute_one_user(spark, sf_dir):
    rows = QUERIES["mann_kendall_trend"](spark, sf_dir).collect()
    assert rows
    uid = rows[0]["user_id"]
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") == uid)
        .select("ts", "event_id", "value")
        .collect()
    )
    seq = sorted(
        (int(e["ts"].timestamp()), e["event_id"], round(e["value"] * 100))
        for e in ev
    )
    vals = [v for _, _, v in seq]
    s = sum(
        (0 if vals[j] == vals[i] else (1 if vals[j] > vals[i] else -1))
        for i in range(len(vals))
        for j in range(i + 1, len(vals))
    )
    r = next(r for r in rows if r["user_id"] == uid)
    assert r["s_stat"] == s
    assert r["n"] == len(vals)
    ties = defaultdict(int)
    for v in vals:
        ties[v] += 1
    n = len(vals)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    assert r["var_s18"] == var18
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    assert abs(r["z"] - (s - cc) / math.sqrt(var18 / 18)) < 1e-5


def test_shrinkage_pulls_toward_prior(spark, sf_dir):
    rows = QUERIES["beta_binomial_shrinkage"](spark, sf_dir).collect()
    assert rows
    a, b = rows[0]["alpha"], rows[0]["beta"]
    assert a > 0 and b > 0
    prior_mean = a / (a + b)
    for r in rows:
        lo, hi = sorted([r["raw_rate"], prior_mean])
        assert lo - 1e-6 <= r["shrunk_rate"] <= hi + 1e-6
        # exact posterior formula
        want = (r["x"] + a) / (r["n"] + a + b)
        assert abs(r["shrunk_rate"] - want) < 1e-4


def test_standardization_ate_weighting(spark, sf_dir):
    rows = QUERIES["standardization_ate"](spark, sf_dir).collect()
    assert len(rows) == 4
    nn = sum(r["n0"] + r["n1"] for r in rows)
    ate = sum(r["diff"] * (r["n0"] + r["n1"]) / nn for r in rows)
    for r in rows:
        assert abs(r["ate"] - ate) < 1e-4
        assert r["n0"] > 0 and r["n1"] > 0
