"""Tests for DL meta-analysis, ECE/MCE and the risk-ratio panel."""

import math

from gfftoneo4j_spark.queries import QUERIES


def test_meta_analysis_sane(spark, sf_dir):
    r = QUERIES["meta_analysis_dl"](spark, sf_dir).collect()[0]
    assert r["n_studies"] >= 20
    assert r["q_stat"] >= 0
    assert r["tau2"] >= 0
    assert r["se_random"] > 0
    # parity arms: no true effect — both pooled estimates near zero
    # relative to the value scale (~50)
    assert abs(r["pooled_fixed"]) < 5
    assert abs(r["pooled_random"]) < 5
    # the RE interval covers zero under the null
    assert (
        r["pooled_random"] - 2.1 * r["se_random"]
        <= 0
        <= r["pooled_random"] + 2.1 * r["se_random"]
    )


def test_ece_recovers_planted_gap(spark, sf_dir):
    r = QUERIES["ece_maxce"](spark, sf_dir).collect()[0]
    assert r["n_bins"] == 16
    # construction plants a 1/32 = 0.03125 gap per bin; sampling noise
    # moves individual bins but the mass-weighted mean stays close
    assert 0.01 < r["ece"] < 0.08
    assert r["mce"] >= r["ece"] - 1e-9


def test_risk_ratio_panel_null_covers_one(spark, sf_dir):
    r = QUERIES["risk_ratio_panel"](spark, sf_dir).collect()[0]
    n1, n0 = r["a"] + r["b"], r["c"] + r["d"]
    rr = (r["a"] / n1) / (r["c"] / n0)
    orr = r["a"] * r["d"] / (r["b"] * r["c"])
    assert abs(r["risk_ratio"] - rr) < 1e-5
    assert abs(r["odds_ratio"] - orr) < 1e-5
    assert r["rr_lo"] < r["risk_ratio"] < r["rr_hi"]
    assert r["or_lo"] < r["odds_ratio"] < r["or_hi"]
    # parity arms: intervals cover the null value 1
    assert r["rr_lo"] <= 1.0 <= r["rr_hi"]
    assert r["or_lo"] <= 1.0 <= r["or_hi"]
    # CI recompute for the risk ratio
    se = math.sqrt(1 / r["a"] - 1 / n1 + 1 / r["c"] - 1 / n0)
    assert abs(r["rr_lo"] - math.exp(math.log(rr) - 1.959964 * se)) < 1e-4
