"""Tests for LM interpolation EM, session timeout sweep and ABC."""

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_lm_interpolation_converges_upward(spark, sf_dir):
    r = QUERIES["lm_interpolation_em"](spark, sf_dir).collect()[0]
    assert r["n_heldout"] > 0
    assert 0.0 < r["bigram_coverage"] <= 1.0
    assert 0.0 < r["lambda_1"] < 1.0
    assert 0.0 < r["lambda_2"] < 1.0
    # the tiny-vocab corpus has high bigram coverage; EM is a
    # contraction toward its fixpoint, so step 2 moves no farther
    # than step 1 did from the 0.5 start
    assert r["bigram_coverage"] > 0.8
    assert (
        abs(r["lambda_2"] - r["lambda_1"])
        <= abs(r["lambda_1"] - 0.5) + 1e-6
    )


def test_session_sweep_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["session_timeout_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["timeout_s"],
    )
    assert [r["timeout_s"] for r in rows] == [900, 1800, 3600]
    n_events = load_table(spark, sf_dir, "events").count()
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in rows:
        assert r["n_events"] == n_events
        # at least one session per active user, at most one per event
        assert n_users <= r["n_sessions"] <= n_events
        assert abs(
            r["avg_session_len"] - r["n_events"] / r["n_sessions"]
        ) < 1e-5
    # longer timeouts merge sessions
    assert rows[0]["n_sessions"] >= rows[1]["n_sessions"]
    assert rows[1]["n_sessions"] >= rows[2]["n_sessions"]


def test_abc_partitions_and_thresholds(spark, sf_dir):
    rows = sorted(
        QUERIES["abc_classification"](spark, sf_dir).collect(),
        key=lambda r: (-r["mass"], r["source"]),
    )
    assert len(rows) == 20
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    # cumulative share is monotone and the last row reaches 1
    for a, b in zip(rows, rows[1:]):
        assert a["cum_share"] <= b["cum_share"] + 1e-9
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-6
    # class boundaries follow the prior-cumulative rule
    for r in rows:
        prior = r["cum_share"] - r["share"]
        if prior < 0.8 - 1e-9:
            assert r["abc_class"] == "A"
        elif prior < 0.95 - 1e-9:
            assert r["abc_class"] == "B"
        else:
            assert r["abc_class"] == "C"
    assert {r["abc_class"] for r in rows} == {"A", "B", "C"}
