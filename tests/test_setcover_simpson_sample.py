"""Tests for greedy set cover, Simpson's check, consistent sampling."""

from collections import defaultdict

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_set_cover_greedy_recompute(spark, sf_dir):
    rows = sorted(
        QUERIES["greedy_set_cover"](spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    assert len(rows) == 3
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    sets = defaultdict(set)
    for d in docs:
        sets[d["source"]] |= {w for w in d["text"].split(" ") if w}
    allw = set().union(*sets.values())
    covered: set = set()
    picked = []
    for r in rows:
        gains = {
            s: len(ws - covered)
            for s, ws in sets.items()
            if s not in picked
        }
        # deterministic tie-break: highest gain, then lexicographic
        cand = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert r["source"] == cand[0]
        assert r["gain"] == cand[1]
        picked.append(cand[0])
        covered |= sets[cand[0]]
        assert r["covered"] == len(covered)
        assert abs(r["coverage"] - len(covered) / len(allw)) < 1e-5
    # greedy gains are non-increasing
    assert rows[0]["gain"] >= rows[1]["gain"] >= rows[2]["gain"]


def test_simpsons_consistency_with_ate(spark, sf_dir):
    rows = QUERIES["simpsons_check"](spark, sf_dir).collect()
    assert len(rows) == 4
    ate = {
        r["bucket"]: r
        for r in QUERIES["standardization_ate"](spark, sf_dir).collect()
    }
    pooled = rows[0]["pooled_diff"]
    for r in rows:
        assert r["pooled_diff"] == pooled
        # stratum diffs agree with the g-formula query's cells
        assert abs(r["strat_diff"] - ate[r["bucket"]]["diff"]) < 1e-5
        if r["reversed"]:
            assert r["strat_diff"] * pooled < 0


def test_consistent_sample_no_orphans(spark, sf_dir):
    r = QUERIES["consistent_join_sample"](spark, sf_dir).collect()[0]
    assert r["orphans"] == 0
    assert 0 < r["users_kept"] < r["users_all"]
    assert 0 < r["events_kept"] < r["events_all"]
    # nominal 2/16 = 12.5% keep-rate, wide tolerance at small n
    assert 0.01 < r["user_rate"] < 0.35
    assert abs(r["user_rate"] - r["users_kept"] / r["users_all"]) < 1e-5
