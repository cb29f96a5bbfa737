"""Tests for design effect, winner's-curse audit and Qini curve."""

from collections import defaultdict

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_design_effect_recompute(spark, sf_dir):
    r = QUERIES["design_effect_cluster"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value"
    ).collect()
    clusters = defaultdict(list)
    for e in ev:
        clusters[e["user_id"]].append(round(e["value"] * 100))
    k = len(clusters)
    nn = sum(len(v) for v in clusters.values())
    ts = sum(sum(v) for v in clusters.values())
    sb = sum(sum(v) ** 2 / len(v) for v in clusters.values())
    tss = sum(x * x for v in clusters.values() for x in v)
    msb = (sb - ts * ts / nn) / (k - 1)
    msw = (tss - sb) / (nn - k)
    n0 = (nn - sum(len(v) ** 2 for v in clusters.values()) / nn) / (k - 1)
    rho = (msb - msw) / (msb + (n0 - 1) * msw)
    assert r["n_clusters"] == k and r["n_obs"] == nn
    assert abs(r["icc"] - rho) < 1e-4
    assert abs(r["deff"] - (1 + (nn / k - 1) * rho)) < 1e-3
    # random user assignment: ICC near zero, DEFF near 1
    assert abs(r["icc"]) < 0.1


def test_winners_curse_shrinks_toward_mean(spark, sf_dir):
    rows = sorted(
        QUERIES["winners_curse_audit"](spark, sf_dir).collect(),
        key=lambda r: r["rnk"],
    )
    assert [r["rnk"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert abs(
            r["shrink"] - (r["mean_half_a"] - r["mean_half_b"])
        ) < 2e-6
    # the average selected winner regresses toward the grand mean:
    # its half-B mean is closer to grand than its half-A mean was
    gb = rows[0]["grand_mean_b"]
    drift_a = sum(abs(r["mean_half_a"] - gb) for r in rows)
    drift_b = sum(abs(r["mean_half_b"] - gb) for r in rows)
    assert drift_b < drift_a


def test_qini_null_calibrated(spark, sf_dir):
    rows = sorted(
        QUERIES["qini_curve"](spark, sf_dir).collect(),
        key=lambda r: r["dec"],
    )
    assert [r["dec"] for r in rows] == list(range(1, 11))
    n_total = rows[-1]["cnt"] + rows[-1]["cnc"]
    assert n_total == load_table(spark, sf_dir, "events").count()
    for a, b in zip(rows, rows[1:]):
        assert b["cnt"] >= a["cnt"] and b["cnc"] >= a["cnc"]
    # parity treatment independent of score: curve hugs zero relative
    # to the responder mass
    total_resp = rows[-1]["crt"] + rows[-1]["crc"]
    for r in rows:
        assert abs(r["qini"]) < 0.1 * total_resp
