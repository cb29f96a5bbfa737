"""Test for the power-analysis sizing grid."""

import math

from gfftoneo4j_spark.queries import QUERIES


def test_power_grid_recompute(spark, sf_dir):
    rows = sorted(
        QUERIES["power_analysis_grid"](spark, sf_dir).collect(),
        key=lambda r: r["mde"],
    )
    assert [r["mde"] for r in rows] == [0.01, 0.02, 0.05, 0.10]
    p0 = rows[0]["p0"]
    for r in rows:
        assert r["p0"] == p0
        p1 = p0 * (1 + r["mde"])
        pbar = (p0 + p1) / 2
        num = (
            1.959964 * math.sqrt(2 * pbar * (1 - pbar))
            + 0.841621 * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
        ) ** 2
        want = math.ceil(num / (p1 - p0) ** 2)
        # p0 is rounded at 6dp in the report; recompute within 1%
        assert abs(r["n_per_arm"] - want) <= max(2, 0.01 * want)
        assert r["powered"] == (
            1 if r["available_per_arm"] >= r["n_per_arm"] else 0
        )
    # smaller detectable lifts need more traffic
    ns = [r["n_per_arm"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    # a 1% relative lift on ~20% baseline needs ~1.2M per arm: not
    # powered at these corpus sizes; 10% may or may not be
    assert rows[0]["powered"] == 0
