"""Tests for jones_plassmann_coloring (properness, completeness,
adjacent-never-same-round) and theil_sen_slopes (numpy recompute +
outlier robustness vs OLS)."""

import numpy as np
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import jones_plassmann_coloring
from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def _color(spark, n, pairs, rounds=20):
    e = spark.createDataFrame(pairs or [(0, 0)], "u long, v long")
    nodes = spark.range(n).select(F.col("id").alias("i"))
    rows = jones_plassmann_coloring(e, nodes=nodes, rounds=rounds).collect()
    return {r["node"]: r["color"] for r in rows}


def _assert_proper(colors, n, pairs):
    assert set(colors) == set(range(n)), "not all nodes colored"
    for u, v in pairs:
        if u != v:
            assert colors[u] != colors[v], f"edge {u}-{v} same color"


def test_coloring_path_and_cycle(spark):
    pairs = [(i, i + 1) for i in range(9)]
    _assert_proper(_color(spark, 10, pairs), 10, pairs)
    cyc = [(i, (i + 1) % 7) for i in range(7)]  # odd cycle needs 3 colors
    colors = _color(spark, 7, cyc)
    _assert_proper(colors, 7, cyc)
    assert len(set(colors.values())) >= 3


def test_coloring_complete_graph_uses_n_colors(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    colors = _color(spark, 5, k5)
    _assert_proper(colors, 5, k5)
    assert len(set(colors.values())) == 5


def test_coloring_gate_graph_complete_and_proper(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    m = d.count()
    ids = sorted({r["doc_id"] % m for r in d.select("doc_id").collect()})
    pairs = []
    for i in ids:
        for t in ((i + 1) % m, (i * 2) % m, (i * 3) % m):
            if t != i:
                pairs.append((i, t))
    colors = {
        r["node"]: r["color"]
        for r in QUERIES["graph_coloring"](spark, sf_dir).collect()
    }
    assert set(colors) == set(ids), "16 rounds must exhaust the sf graph"
    for u, v in pairs:
        assert colors[u] != colors[v]


def test_theil_sen_recompute_and_robustness(spark, sf_dir):
    rows = {
        r["user_id"]: r
        for r in QUERIES["theil_sen_slopes"](spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("t"),
            "value",
        )
        .collect()
    )
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["event_id"], r["t"], r["value"]))
    checked = 0
    for uid, evs in sorted(per_user.items())[:20]:
        evs.sort()
        slopes = []
        for i in range(len(evs)):
            for j in range(i + 1, len(evs)):
                _, ti, vi = evs[i]
                _, tj, vj = evs[j]
                if tj != ti:
                    slopes.append(int(np.floor((vj - vi) * 1000000 / (tj - ti))))
        if not slopes:
            assert uid not in rows
            continue
        slopes.sort()
        lower_median = slopes[(len(slopes) + 1) // 2 - 1]
        assert rows[uid]["theil_sen_fp"] == lower_median
        assert rows[uid]["n_pairs"] == len(slopes)
        checked += 1
    assert checked > 0


def test_theil_sen_outlier_resistance(spark):
    # clean slope 2.0 with one wild outlier: TS stays ~2, OLS would not
    base = [(1, i + 1, 100 + i, 2.0 * i) for i in range(10)]
    rows = [(uid, eid, f"2024-01-01 00:{t:02d}:00", v) for uid, eid, t, v in
            [(u, e, t - 100, v) for u, e, t, v in base]]
    rows[5] = (1, 6, "2024-01-01 00:05:00", 1000.0)  # outlier
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.select(
            "event_id", "ts", "user_id",
            F.lit("view").alias("event_type"), "value",
            F.lit("{}").alias("props"),
        ).write.parquet(os.path.join(td, "events.parquet"))
        got = QUERIES["theil_sen_slopes"](spark, td).collect()[0]
        # slope per minute = 2 per 60 sec -> fp = floor(2e6/60) = 33333
        assert abs(got["theil_sen_fp"] - 33333) <= 1
