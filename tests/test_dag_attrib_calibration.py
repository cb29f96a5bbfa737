"""Tests for DAG levels, multi-touch attribution, Brier decomposition,
RAKE keywords, mSPRT monitor and diff-in-diff."""

import hashlib
import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import dag_longest_path_levels
from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "s long, t long")


def test_dag_levels_chain_and_diamond(spark):
    # chain 0->1->2->3 gives levels 0..3
    got = dag_longest_path_levels(
        _edges(spark, [(0, 1), (1, 2), (2, 3)]), rounds=3
    ).collect()
    assert {r["node"]: r["level"] for r in got} == {0: 0, 1: 1, 2: 2, 3: 3}
    # diamond + shortcut: longest path wins (0->1->3 beats 0->3)
    got = dag_longest_path_levels(
        _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)]), rounds=4
    ).collect()
    assert {r["node"]: r["level"] for r in got} == {0: 0, 1: 1, 2: 1, 3: 2}


def test_dag_levels_two_components(spark):
    # independent components each start at level 0
    got = dag_longest_path_levels(
        _edges(spark, [(0, 1), (10, 11), (11, 12)]), rounds=4
    ).collect()
    assert {r["node"]: r["level"] for r in got} == {
        0: 0, 1: 1, 10: 0, 11: 1, 12: 2,
    }


def test_attribution_conservation(spark, sf_dir):
    rows = QUERIES["attribution_multitouch"](spark, sf_dir).collect()
    assert rows
    n_conv_first = sum(r["first_touch"] for r in rows)
    n_conv_last = sum(r["last_touch"] for r in rows)
    # every attributed conversion has exactly one first and one last
    assert n_conv_first == n_conv_last > 0
    # linear credit conserves ~1e6 micro-units per conversion
    # (floor loses < k micro-units per journey)
    tot_linear = sum(r["linear_micro"] for r in rows)
    assert 0 <= n_conv_first * 1000000 - tot_linear < n_conv_first * 200
    assert all(r["n_touches"] > 0 for r in rows)
    assert {r["event_type"] for r in rows} == {
        "click", "error", "signup", "view",
    }


def test_brier_decomposition_identity(spark, sf_dir):
    rows = QUERIES["brier_decomposition"](spark, sf_dir).collect()
    assert len(rows) == 16
    r0 = rows[0]
    # Murphy identity ties the reported scalar columns together
    assert abs(
        r0["brier"]
        - (r0["reliability"] - r0["resolution"] + r0["uncertainty"])
    ) < 3e-6
    # direct Brier recompute from the same md5 labeling
    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    hexd = "0123456789abcdef"
    tot = 0.0
    for d in docs:
        h = hashlib.md5(str(d["doc_id"]).encode()).hexdigest()
        b, v2 = hexd.index(h[0]), hexd.index(h[1])
        p = (2 * b + 1) / 32
        y = 1 if v2 < b else 0
        tot += (p - y) ** 2
    assert abs(r0["brier"] - tot / len(docs)) < 5e-6
    for r in rows:
        assert abs(r["p_pred"] - (2 * r["bin"] + 1) / 32) < 1e-6
        assert 0.0 <= r["frac_pos"] <= 1.0


def test_rake_recompute(spark, sf_dir):
    stop = {"a", "the", "value", "table"}
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    phrases = []
    for d in docs:
        cur = []
        for w in d["text"].split(" "):
            if not w:
                continue
            if w in stop:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    cand = [p for p in phrases if len(p) <= 4]
    freq, deg = Counter(), Counter()
    for p in cand:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    score = {w: math.floor(1000000.0 * deg[w] / freq[w]) for w in freq}
    ph = Counter(cand)
    by_len = defaultdict(list)
    for p, n in ph.items():
        if n >= 2:
            by_len[len(p)].append((-sum(score[w] for w in p), " ".join(p), n))
    want = {}
    for n_w, lst in by_len.items():
        for rnk, (neg, text, n) in enumerate(sorted(lst)[:5], 1):
            want[(n_w, rnk)] = (text, n, -neg)
    got = {
        (r["n_w"], r["rnk"]): (r["phrase"], r["n_occ"], r["score_micro"])
        for r in QUERIES["rake_keywords"](spark, sf_dir).collect()
    }
    assert got == want


def test_msprt_recompute_and_null_quiet(spark, sf_dir):
    rows = sorted(
        QUERIES["msprt_sequential"](spark, sf_dir).collect(),
        key=lambda r: r["day_num"],
    )
    assert rows
    tau2 = 0.01
    for r in rows:
        pbar = (r["x_a"] + r["x_b"]) / (r["n_a"] + r["n_b"])
        v = pbar * (1 - pbar) * (1 / r["n_a"] + 1 / r["n_b"])
        delta = r["x_a"] / r["n_a"] - r["x_b"] / r["n_b"]
        lr = math.sqrt(v / (v + tau2)) * math.exp(
            delta * delta * tau2 / (2 * v * (v + tau2))
        )
        assert abs(r["lr"] - lr) < 1e-5
        assert r["reject"] == (1 if lr > 20 else 0)
    # cumulative counts are monotone
    for a, b in zip(rows, rows[1:]):
        assert b["n_a"] >= a["n_a"] and b["n_b"] >= a["n_b"]
    # parity arms: the always-valid monitor must not fire under the null
    assert all(r["reject"] == 0 for r in rows)


def test_diff_in_diff_recompute(spark, sf_dir):
    r = QUERIES["diff_in_diff"](spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    secs = [int(e["ts"].timestamp()) for e in ev]
    mid = (min(secs) + max(secs)) // 2
    cells = defaultdict(lambda: [0, 0])
    for e, s in zip(ev, secs):
        key = (e["user_id"] % 2, 1 if s > mid else 0)
        cells[key][0] += 1
        cells[key][1] += round(e["value"] * 100)
    m = {k: v[1] / 100 / v[0] for k, v in cells.items()}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert r["n00"] == cells[(0, 0)][0]
    assert r["n11"] == cells[(1, 1)][0]
    assert abs(r["did"] - did) < 1e-5


def test_dag_levels_raises_on_underprovisioned_rounds(spark):
    # depth-3 chain with rounds=2: the frontier still advances after
    # the final round -> must raise, not return truncated levels
    import pytest

    with pytest.raises(ValueError, match="still advancing"):
        dag_longest_path_levels(
            _edges(spark, [(0, 1), (1, 2), (2, 3)]), rounds=2
        ).collect()


def test_dag_levels_raises_on_cycles(spark):
    import pytest

    # cycle reachable from a source: frontier never drains
    with pytest.raises(ValueError, match="still advancing"):
        dag_longest_path_levels(
            _edges(spark, [(0, 1), (1, 2), (2, 1)]), rounds=5
        ).collect()
    # cycle component with no in-degree-0 ancestor: its nodes never
    # enter any frontier -> must raise, not silently drop them
    with pytest.raises(ValueError, match="not a DAG"):
        dag_longest_path_levels(
            _edges(spark, [(0, 1), (5, 6), (6, 5)]), rounds=5
        ).collect()
