"""Tests for WOE/IV, overdispersion and Bradley-Terry strengths."""

import math
from collections import defaultdict

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_woe_iv_identities(spark, sf_dir):
    rows = QUERIES["woe_information_value"](spark, sf_dir).collect()
    assert rows
    p = sum(r["pos"] for r in rows)
    n = sum(r["neg"] for r in rows)
    iv = rows[0]["iv_total"]
    acc = 0.0
    for r in rows:
        w = math.log(
            ((r["pos"] + 0.5) / (p + 5.0)) / ((r["neg"] + 0.5) / (n + 5.0))
        )
        assert abs(r["woe"] - w) < 1e-5
        acc += (r["pos"] / p - r["neg"] / n) * w
        assert r["iv_total"] == iv
    assert abs(iv - acc) < 1e-4
    # value is engineered independent of event type: IV must be weak
    assert iv < 0.1


def test_overdispersion_recompute(spark, sf_dir):
    rows = QUERIES["overdispersion_check"](spark, sf_dir).collect()
    assert len(rows) == 5
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts"
    ).collect()
    daily = defaultdict(lambda: defaultdict(int))
    for e in ev:
        daily[e["event_type"]][int(e["ts"].timestamp()) // 86400] += 1
    for r in rows:
        cs = list(daily[r["event_type"]].values())
        m = sum(cs) / len(cs)
        v = sum((c - m) ** 2 for c in cs) / (len(cs) - 1)
        assert r["n_days"] == len(cs)
        assert abs(r["mean_count"] - m) < 1e-4
        assert abs(r["var_count"] - v) < 1e-3
        assert r["overdispersed"] == (1 if v > m else 0)


def test_bradley_terry_consistency(spark, sf_dir):
    rows = QUERIES["bradley_terry_strengths"](spark, sf_dir).collect()
    assert len(rows) == 5
    # strengths are normalized to mean 1 each round
    for col in ("strength_r1", "strength_r2"):
        assert abs(sum(r[col] for r in rows) / 5 - 1.0) < 1e-4
    # total wins equal total comparisons / 2 (each comparison has one
    # winner, and nc double-counts both sides)
    assert sum(r["wins"] for r in rows) * 2 == sum(
        r["n_comparisons"] for r in rows
    )
    # win-rate order is preserved by the fitted strengths at round 2
    by_rate = sorted(rows, key=lambda r: r["wins"] / r["n_comparisons"])
    rates_sorted = [r["strength_r2"] for r in by_rate]
    assert rates_sorted == sorted(rates_sorted)
