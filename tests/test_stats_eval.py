"""Tests for the evaluation/statistics batch: transition entropy,
Kaplan-Meier, NDCG@k, Cohen's kappa, one-way ANOVA, Kruskal-Wallis."""

import math

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_transition_entropy_recompute(spark, sf_dir):
    rows = QUERIES["event_transition_entropy"](spark, sf_dir).collect()
    assert rows
    n_types = 5
    for r in rows:
        assert 1 <= r["n_next"] <= n_types
        # bounded by log2 of the out-alphabet
        assert -1e-9 <= r["h_bits"] <= math.log2(r["n_next"]) + 1e-9


def test_transition_entropy_uniform_chain(spark, sf_dir):
    # recompute one source state's entropy from raw pair counts
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("p"),
            F.col("event_type").alias("q"),
        )
        .where(F.col("p").isNotNull())
        .groupBy("p", "q")
        .count()
        .collect()
    )
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in pairs:
        by_src[r["p"]].append(r["count"])
    got = {
        r["prev_type"]: r["h_bits"]
        for r in QUERIES["event_transition_entropy"](spark, sf_dir).collect()
    }
    for src, ns in by_src.items():
        tot = sum(ns)
        h = -sum(n / tot * math.log2(n / tot) for n in ns)
        assert abs(got[src] - h) < 1e-5


def test_kaplan_meier_identities(spark, sf_dir):
    rows = sorted(
        QUERIES["kaplan_meier_churn"](spark, sf_dir).collect(),
        key=lambda r: r["t_days"],
    )
    assert rows
    # n_risk starts at the full cohort and decreases by d+c each step
    for a, b in zip(rows, rows[1:]):
        assert b["n_risk"] == a["n_risk"] - a["n_deaths"] - a["n_censored"]
    # survival is the running product of (1 - d/n)
    s = 1.0
    for r in rows:
        if r["n_deaths"] > 0:
            s *= 1.0 - r["n_deaths"] / r["n_risk"]
        assert abs(r["surv"] - s) < 1e-5
        assert 0.0 <= r["surv"] <= 1.0


def test_ndcg_bounds_and_ratio(spark, sf_dir):
    rows = QUERIES["ndcg_at_k"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["dcg_micro"] <= r["idcg_micro"]
        assert abs(r["ndcg"] - r["dcg_micro"] / r["idcg_micro"]) < 1e-5
        assert r["ndcg"] <= 1.0 + 1e-9
    # some users' spend ranking disagrees with engagement ranking
    assert any(r["ndcg"] < 1.0 for r in rows)


def test_cohens_kappa_range_and_formula(spark, sf_dir):
    r = QUERIES["cohens_kappa"](spark, sf_dir).collect()[0]
    assert r["n_docs"] > 0
    assert 0 <= r["n_agree"] <= r["n_docs"]
    assert abs(r["po"] - r["n_agree"] / r["n_docs"]) < 1e-5
    assert -1.0 <= r["kappa"] <= 1.0
    assert abs(r["kappa"] - (r["po"] - r["pe"]) / (1 - r["pe"])) < 1e-4
    # both raters see the same latent label most of the time
    assert r["po"] > 0.6


def test_anova_partitions_total_ss(spark, sf_dir):
    import numpy as np

    r = QUERIES["anova_oneway_f"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pdf = ev.toPandas()
    v = np.round(pdf["value"].to_numpy() * 100).astype("int64")
    tot_ss = ((v - v.mean()) ** 2).sum() / 10000
    assert r["k_groups"] == pdf["event_type"].nunique()
    assert r["n_total"] == len(pdf)
    assert abs((r["ss_between"] + r["ss_within"]) - tot_ss) < 1e-3 * tot_ss
    assert r["f_stat"] >= 0


def test_kruskal_rank_sum_identity(spark, sf_dir):
    rows = QUERIES["kruskal_wallis"](spark, sf_dir).collect()
    assert rows
    nn = sum(r["n_j"] for r in rows)
    # all (doubled) ranks sum to N(N+1)
    assert sum(r["rank_sum2"] for r in rows) == nn * (nn + 1)
    h = rows[0]["h_stat"]
    assert all(r["h_stat"] == h for r in rows)
    assert h >= 0
    # ties only inflate H after correction
    assert rows[0]["h_corrected"] >= h
