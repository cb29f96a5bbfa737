"""Semantic pins for the Wasserstein/Benford/overlap-sketch/Apriori
batch: W1 equals the hand value on point masses and scales with shift
size, Benford separates organic magnitudes from fabricated uniforms,
the overlap sketch discriminates disjoint vs identical audiences with
bounded error, and Apriori triples match a brute-force recount.
"""

import datetime
import itertools
import math

from gfftoneo4j_spark.queries import QUERIES

_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))


def test_wasserstein_point_masses(spark, tmp_path):
    """click all at 10.0, purchase all at 13.5: W1 is exactly 3.5."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(50):
        rows.append((2 * i, base, 1, "click", 10.0, "{}"))
        rows.append((2 * i + 1, base, 1, "purchase", 13.5, "{}"))
    _write_events(spark, tmp_path, rows)
    r = QUERIES["wasserstein_drift"](spark, str(tmp_path)).collect()[0]
    assert r["n_a"] == 50 and r["n_b"] == 50
    assert r["w1_micro"] == 3_500_000  # 3.5 value units in micro-units
    # a bigger shift must give a bigger W1
    rows = []
    for i in range(50):
        rows.append((2 * i, base, 1, "click", 10.0, "{}"))
        rows.append((2 * i + 1, base, 1, "purchase", 20.0, "{}"))
    _write_events(spark, tmp_path, rows)
    r2 = QUERIES["wasserstein_drift"](spark, str(tmp_path)).collect()[0]
    assert r2["w1_micro"] == 10_000_000
    assert r2["w1_micro"] > r["w1_micro"]


def test_benford_flags_uniform_not_exponential(spark, tmp_path):
    """2^i magnitudes follow Benford almost exactly; uniform 100..999
    values put ~1/9 in every digit and must score far worse."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(900):
        rows.append((eid, base, 1, "organic", float(2 ** (i % 30) % 10**6 + 1), "{}"))
        eid += 1
        rows.append((eid, base, 1, "uniform", 100.0 + (i * 997) % 900, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in QUERIES["benford_audit"](spark, str(tmp_path)).collect()
    }
    assert out["uniform"]["benford_chi_nano"] > out["organic"][
        "benford_chi_nano"
    ]
    assert out["uniform"]["max_dev_micro"] > out["organic"]["max_dev_micro"]


def test_overlap_sketch_discriminates(spark, tmp_path):
    """Types A and B share NO users; B and C share ALL users: the
    sketch estimate must rank common(B,C) >> common(A,B) and land
    within the m=256 sketch's error budget. Audience sizes stay in
    the linear-counting window (n_union < 2.5m) where the register
    estimator is calibrated — the regime the operator documents."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(200):
        rows.append((eid, base, u, "aa", 1.0, "{}"))
        eid += 1
    for u in range(200, 400):
        rows.append((eid, base, u, "bb", 1.0, "{}"))
        eid += 1
        rows.append((eid, base, u, "cc", 1.0, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        (r["ta"], r["tb"]): r
        for r in QUERIES["sketch_overlap_audience"](
            spark, str(tmp_path)
        ).collect()
    }
    ab, bc = out[("aa", "bb")], out[("bb", "cc")]
    assert ab["true_common"] == 0 and bc["true_common"] == 200
    assert bc["est_common"] > 3 * max(1.0, abs(ab["est_common"]))
    for r in (ab, bc):
        assert abs(r["est_a"] - 200) / 200 < 0.2
        assert abs(r["est_b"] - 200) / 200 < 0.2
    assert abs(bc["est_common"] - 200) / 200 < 0.3
    assert abs(ab["est_common"]) < 60


def test_apriori_triples_match_brute_force(spark, tmp_path):
    """Hand-checkable baskets, compared against itertools brute force
    with the same cap-5 smallest-items rule."""
    baskets = {
        1: [10, 20, 30],
        2: [10, 20, 30, 40],
        3: [10, 20, 30],
        4: [20, 30, 40],
        5: [50, 60, 70, 80, 90, 95],  # cap drops 95
        6: [50, 60, 70],
        7: [10, 50],
    }
    rows = []
    for o, items in baskets.items():
        for p in items:
            rows.append((o, p))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        (r["p1"], r["p2"], r["p3"]): r["w"]
        for r in QUERIES["apriori_triples"](spark, str(tmp_path)).collect()
    }
    want = {}
    for o, items in baskets.items():
        kept = sorted(items)[:5]
        for tri in itertools.combinations(sorted(kept), 3):
            want[tri] = want.get(tri, 0) + 1
    want = {k: v for k, v in want.items() if v >= 2}
    assert out == want
    assert (10, 20, 30) in out and out[(10, 20, 30)] == 3
    assert (50, 60, 70) in out and out[(50, 60, 70)] == 2
