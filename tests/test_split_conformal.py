"""Tests for the histogram split finder and split-conformal coverage."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_best_split_gain_recompute(spark, sf_dir):
    rows = sorted(
        QUERIES["best_split_finder"](spark, sf_dir).collect(),
        key=lambda r: r["split_bin"],
    )
    assert rows
    assert sum(r["is_best"] for r in rows) == 1
    # recompute totals from raw events and one split's gain
    ev = load_table(spark, sf_dir, "events").select(
        "value", "event_type"
    ).collect()
    nn = len(ev)
    np_ = sum(1 for e in ev if e["event_type"] == "purchase")

    def ent(p):
        if p <= 0 or p >= 1:
            return 0.0
        return -p * math.log2(p) - (1 - p) * math.log2(1 - p)

    # prefix identities hold on every row
    for r in rows:
        assert 0 < r["n_left"] < nn
        nl, pl = r["n_left"], r["pos_left"]
        gain = (
            ent(np_ / nn)
            - (nl / nn) * ent(pl / nl)
            - ((nn - nl) / nn) * ent((np_ - pl) / (nn - nl))
        )
        assert abs(r["gain_nano"] / 1e9 - gain) < 2e-9
    best = max(rows, key=lambda r: (r["gain_nano"], -r["split_bin"]))
    assert best["is_best"] == 1


def test_conformal_qhat_is_exact_order_stat(spark, sf_dir):
    rows = QUERIES["split_conformal"](spark, sf_dir).collect()
    assert rows
    qhat = rows[0]["qhat"]
    assert all(abs(r["qhat"] - qhat) < 1e-9 for r in rows)
    # python recompute of the calibration order statistic
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).collect()
    secs = [int(e["ts"].timestamp()) for e in ev]
    mid = (min(secs) + max(secs)) // 2
    cal = [(e, s) for e, s in zip(ev, secs) if s <= mid]
    test = [(e, s) for e, s in zip(ev, secs) if s > mid]
    mu = defaultdict(lambda: [0, 0])
    for e, _ in cal:
        m = mu[e["event_type"]]
        m[0] += round(e["value"] * 100)
        m[1] += 1
    mu = {k: v[0] / 100 / v[1] for k, v in mu.items()}
    resid = sorted(
        abs(round(e["value"] * 100) / 100 - mu[e["event_type"]])
        for e, _ in cal
    )
    k = math.ceil((len(resid) + 1) * 0.9)
    assert abs(qhat - resid[k - 1]) < 1e-5
    # coverage recompute per type, and the split-conformal guarantee
    cov = defaultdict(lambda: [0, 0])
    for e, _ in test:
        c = cov[e["event_type"]]
        c[0] += 1
        r = abs(round(e["value"] * 100) / 100 - mu[e["event_type"]])
        if r <= resid[k - 1]:
            c[1] += 1
    for r in rows:
        n, h = cov[r["event_type"]]
        assert r["n_test"] == n and r["n_covered"] == h
    overall = sum(v[1] for v in cov.values()) / sum(
        v[0] for v in cov.values()
    )
    assert overall > 0.8  # 90% nominal, generous slack for drift
