"""Semantic checks for the experimentation/privacy stats batch — the
cross-engine gate proves value equality vs DuckDB; these pin MEANING:
Mann-Whitney U matches a hand-ranked example (ties included), a
perfectly proportional contingency table yields zero chi-square,
delta-method SE collapses to zero when users are identical,
t-closeness passes symmetric sources and flags a skewed one, DP noise
is bounded and reproducible, and the bootstrap interval brackets the
point estimate.
"""

import datetime
import math

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES

SF001 = "/root/testdata/sf0.001"

_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ts(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)


def test_mann_whitney_hand_example(spark, tmp_path):
    """A={1,2,3} (click) vs B={2,4} (purchase): ranks 1,2.5,2.5,4,5 =>
    R_a=7.5, U_a=1.5, one tie group of size 2."""
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((i, _ts(i), i, "click", v, "{}"))
    for i, v in enumerate([2.0, 4.0]):
        rows.append((10 + i, _ts(i), 10 + i, "purchase", v, "{}"))
    # a distractor type that must be excluded entirely
    rows.append((99, _ts(0), 99, "view", 100.0, "{}"))
    out = QUERIES["mann_whitney_u"](spark, _write_events(spark, tmp_path, rows))
    r = out.collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["u_a_x2"] == 3  # U_a = 1.5
    n_a, n_b, n, ties3 = 3, 2, 5, 6
    sigma = math.sqrt(
        n_a * n_b / 12.0 * ((n + 1) - ties3 / (n * (n - 1.0)))
    )
    z = (1.5 - n_a * n_b / 2.0) / sigma
    assert r["z_fp"] == math.floor(z * 1_000_000)


def test_chi2_zero_on_proportional_table(spark, tmp_path):
    """Counts exactly proportional across cells => every contribution
    is 0 (independence holds exactly)."""
    rows = []
    eid = 0
    # day 0 (epoch day % 7 == 4 for 2024-01-01; use two distinct days)
    for day, mult in [(0, 1), (1, 2)]:
        for etype, base in [("click", 4), ("view", 8)]:
            for _ in range(base * mult):
                rows.append(
                    (
                        eid,
                        datetime.datetime(2024, 1, 1 + day),
                        eid,
                        etype,
                        1.0,
                        "{}",
                    )
                )
                eid += 1
    out = QUERIES["chi_squared_independence"](
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 4
    assert sum(r["observed"] for r in out) == eid
    assert all(r["contrib_fp"] == 0 for r in out)


def test_delta_method_se_zero_when_users_identical(spark, tmp_path):
    """Every user has identical (x, y) => var/cov are 0 => SE = 0 and
    the ratio is exactly x/y."""
    rows = []
    eid = 0
    for u in range(8):  # arms 0 and 1, 4 users each
        for k in range(4):
            rows.append((eid, _ts(k), u, "click", 3.0, "{}"))
            eid += 1
    out = QUERIES["delta_method_ratio"](
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_users"] == 4
        assert r["ratio_fp"] == 3_000_000  # 12.0 / 4 events
        assert r["se_fp"] == 0


def test_t_closeness_flags_skewed_source(spark, tmp_path):
    rows = []
    did = 0
    # two balanced sources with the same lang mix as the corpus
    for src in ("a", "b"):
        for lang, n in [("en", 6), ("de", 2)]:
            for _ in range(n):
                rows.append((did, "x y", lang, src, 3))
                did += 1
    # one source entirely 'de' — far from the global distribution
    for _ in range(8):
        rows.append((did, "x y", "de", "skew", 3))
        did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in QUERIES["t_closeness_audit"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {"a", "b", "skew"}
    # global: en 12/24, de 12/24; balanced source: en .75 de .25 =>
    # tvd = .25; skew source: en 0 de 1 => tvd = .5 (x2ppb = 1e9)
    assert out["a"]["tvd_x2_ppb"] == out["b"]["tvd_x2_ppb"] == 500_000_000
    assert out["skew"]["tvd_x2_ppb"] == 1_000_000_000
    assert out["a"]["within_t"] == 1 and out["skew"]["within_t"] == 0


def test_dp_noise_bounded_and_deterministic(spark):
    q = QUERIES["dp_noisy_counts"]
    a = {r["event_type"]: r["noisy_count"] for r in q(spark, SF001).collect()}
    b = {r["event_type"]: r["noisy_count"] for r in q(spark, SF001).collect()}
    assert a == b  # content-addressed noise: bit-for-bit reproducible
    truth = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{SF001}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(a) == set(truth)
    for k in truth:
        # Laplace(b=10) with u bounded away from the endpoints by the
        # md5 grid: |noise| <= 10 * ln(2^60) ~ 416
        assert abs(a[k] - truth[k]) <= 500
    # noise must actually be nonzero somewhere (it IS a release, not a copy)
    assert any(a[k] != truth[k] for k in truth)


def test_bootstrap_ci_brackets_point(spark):
    r = QUERIES["bootstrap_ci"](spark, SF001).collect()[0]
    assert r["n_resamples"] == 32
    assert r["lo_fp"] < r["hi_fp"]
    assert r["lo_fp"] <= r["point_fp"] <= r["hi_fp"]
    # resample means concentrate: the interval is a small fraction of
    # the point estimate at n ~ 1200 docs
    assert (r["hi_fp"] - r["lo_fp"]) < 0.2 * r["point_fp"]
