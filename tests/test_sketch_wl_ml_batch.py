"""Semantic pins for the AMS/WL/label-spreading/info-gain/Spearman
batch: AMS counters replicated hash-exact in Python, WL invariants
(refinement is monotone; a true vertex-transitive graph stays one
color), spreading respects clamps and reaches the whole graph,
info-gain is maximal at a planted boundary, Spearman hits exactly +/-1
on monotone data and 0-ish on independent data.
"""

import datetime
import hashlib
import math

from gfftoneo4j_spark.queries import QUERIES

_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def test_ams_f2_matches_python_replication(spark, tmp_path):
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    # type 'sk': user u appears u+1 times, u = 0..9
    for u in range(10):
        for _ in range(u + 1):
            rows.append((eid, base, u, "sk", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = QUERIES["ams_f2_sketch"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["true_f2"] == sum((u + 1) ** 2 for u in range(10))
    counters = []
    for j in range(16):
        c = 0
        for u in range(10):
            sign = 1 if hashlib.md5(f"{j}:{u}".encode()).hexdigest()[0] <= "7" else -1
            c += sign * (u + 1)
        counters.append(c * c)
    counters.sort()
    assert r["est_f2"] == counters[7]  # lower median (rn = 8 of 16)
    assert r["err_fp"] == math.floor(
        abs(counters[7] - r["true_f2"]) / r["true_f2"] * 1000000
    )


def test_wl_is_monotone_and_collapses_on_transitive_graph(spark, tmp_path):
    # m chosen coprime-ish so the circulant is genuinely
    # vertex-asymmetric: color count must be monotone non-decreasing
    m = 40
    rows = [(i, "t", "en", "s", 1) for i in range(m)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["round"]: r
        for r in QUERIES["wl_refinement"](spark, str(tmp_path)).collect()
    }
    assert out[1]["n_colors"] <= out[2]["n_colors"] <= out[3]["n_colors"]
    # each round's classes partition the m nodes
    assert all(r["max_class"] <= m for r in out.values())


def test_label_spreading_clamps_and_covers(spark, tmp_path):
    m = 60
    rows = [(i, "t", "en", "s", 1) for i in range(m)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["node"]: r
        for r in QUERIES["label_spreading"](spark, str(tmp_path)).collect()
    }
    # seeds stay clamped to their own class at full mass
    for i in range(0, m, 10):
        assert out[i]["label"] == (i // 10) % 3
        assert out[i]["score"] == 1_000_000
    # the circulant is connected and dense enough that 3 rounds
    # reach every node
    assert len(out) == m
    # non-seed scores are strictly below the clamp mass
    assert all(
        r["score"] < 1_000_000 for n, r in out.items() if n % 10 != 0
    )


def test_info_gain_finds_planted_boundary(spark, tmp_path):
    """values < 100 are never purchases, values > 200 always are:
    the best split must sit between them and gain must be ~ H(y)."""
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for i in range(300):
        rows.append((eid, base, 1, "click", float(i % 100), "{}"))
        eid += 1
        rows.append((eid, base, 1, "purchase", 220.0 + (i % 80), "{}"))
        eid += 1
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = QUERIES["info_gain_split"](spark, str(tmp_path)).collect()
    best = [r for r in out if r["is_best"] == 1]
    assert len(best) == 1
    assert 99.0 < best[0]["threshold_v"] < 221.0
    # perfect separation: gain == H(0.5) == ln 2
    assert abs(best[0]["ig_micro"] - math.floor(math.log(2) * 1e6)) <= 1
    assert best[0]["n_left"] == 300 and best[0]["n_right"] == 300


def test_spearman_exact_on_monotone_and_antitone(spark, tmp_path):
    docs = [
        (i, " ".join(["w"] * (i + 1)), "en", "s", 10 * (i + 1))
        for i in range(50)
    ]
    spark.createDataFrame(docs, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    r = QUERIES["spearman_rho"](spark, str(tmp_path)).collect()[0]
    assert r["n"] == 50
    assert r["rho_fp"] in (999_999, 1_000_000)
    # antitone: longer text but smaller n_chars column
    docs = [
        (i, " ".join(["w"] * (i + 1)), "en", "s", 10 * (50 - i))
        for i in range(50)
    ]
    spark.createDataFrame(docs, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    r = QUERIES["spearman_rho"](spark, str(tmp_path)).collect()[0]
    assert r["rho_fp"] == -1_000_000
