"""Tests for the Q8-style market share, exact rolling WAU and FD
profiler."""

from collections import defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_market_share_bounds(spark, sf_dir):
    rows = QUERIES["market_share_q8"](spark, sf_dir).collect()
    assert rows
    years = sorted(r["yr"] for r in rows)
    assert years[0] >= 1995 and years[-1] <= 2001
    for r in rows:
        assert 0 <= r["nation_rev"] <= r["total_rev"]
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert abs(r["mkt_share"] - r["nation_rev"] / r["total_rev"]) < 1e-3


def test_rolling_wau_recompute(spark, sf_dir):
    rows = {
        r["day_num"]: r["wau"]
        for r in QUERIES["rolling_distinct_exact"](spark, sf_dir).collect()
    }
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.floor(F.unix_timestamp("ts") / 86400)
            .cast("bigint")
            .alias("d"),
            "user_id",
        )
        .collect()
    )
    by_day = defaultdict(set)
    for e in ev:
        by_day[e["d"]].add(e["user_id"])
    for d, wau in rows.items():
        want = set()
        for dd in range(d - 6, d + 1):
            want |= by_day.get(dd, set())
        assert wau == len(want)
    # WAU >= DAU on every day
    for d in rows:
        assert rows[d] >= len(by_day[d])


def test_fd_profile_consistency(spark, sf_dir):
    rows = {r["fd"]: r for r in QUERIES["fd_violations"](spark, sf_dir).collect()}
    assert set(rows) == {
        "lang->source", "source->lang", "user->type", "type->props",
    }
    for r in rows.values():
        assert r["violating_groups"] <= r["n_groups"]
        assert r["holds"] == (1 if r["violating_groups"] == 0 else 0)
    # synthetic corpus: languages span sources and users mix event
    # types, so these two cannot hold
    assert rows["lang->source"]["holds"] == 0
    assert rows["user->type"]["holds"] == 0
