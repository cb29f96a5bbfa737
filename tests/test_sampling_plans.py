"""Tests for negative_edge_samples / span_corruption_plan / srm_check
semantics, plus plan-shape guards for the round-5 operators (broadcast
ring in shard_rebalance, no cartesian product in the blocked
edit-distance join)."""

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_negative_samples_are_true_non_edges(spark, sf_dir):
    rows = QUERIES["negative_edge_samples"](spark, sf_dir).collect()
    assert rows
    d = load_table(spark, sf_dir, "documents")
    m = d.count()
    ids = [r["doc_id"] % m for r in d.select("doc_id").collect()]
    edges = set()
    for i in set(ids):
        for t in ((i + 1) % m, (i * 2) % m, (i * 3) % m):
            if t != i:
                edges.add((min(i, t), max(i, t)))
    for r in rows:
        key = (min(r["u"], r["neg"]), max(r["u"], r["neg"]))
        assert key not in edges, f"sampled a real edge {key}"
        assert r["u"] != r["neg"]
        assert 1 <= r["draw"] <= 4
    # every node kept at most 4 draws
    from collections import Counter

    per_node = Counter(r["u"] for r in rows)
    assert max(per_node.values()) <= 4


def test_span_plan_clipped_and_deterministic(spark, sf_dir):
    rows = QUERIES["span_corruption_plan"](spark, sf_dir).collect()
    assert rows
    d = load_table(spark, sf_dir, "documents")
    ntok = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(F.split(F.trim("text"), " ")).alias("n")
        ).collect()
    }
    for r in rows:
        assert 1 <= r["span_len"] <= 3
        assert r["start_pos"] + r["span_len"] - 1 <= ntok[r["doc_id"]]
    # bit-identical on a second evaluation (content-addressed draws)
    again = QUERIES["span_corruption_plan"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # mask-open rate ~ 1/20 of positions
    total_pos = sum(ntok.values())
    assert 0.5 * total_pos / 20 < len(rows) < 2.0 * total_pos / 20


def test_srm_chi2_recompute(spark, sf_dir):
    r = QUERIES["srm_check"](spark, sf_dir).collect()[0]
    n = r["n0"] + r["n1"]
    assert r["chi2_ppm"] == (r["n0"] - r["n1"]) ** 2 * 1000000 // n
    assert r["srm_flag"] == (1 if r["chi2_ppm"] > 3841459 else 0)
    # md5 bucketing of a healthy id space must NOT flag
    assert r["srm_flag"] == 0


def test_shard_rebalance_ring_is_broadcast(spark, sf_dir):
    """The 160-point ring must reach every doc as a broadcast
    (BroadcastNestedLoopJoin / BroadcastHashJoin) — a shuffled or
    cartesian ring join would be a scale defect."""
    plan = _plan(QUERIES["shard_rebalance"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_edit_distance_join_is_equi_not_cartesian(spark, sf_dir):
    """Prefix blocking must surface as an equi-join on the block key;
    an unblocked plan would show CartesianProduct / BroadcastNestedLoop
    over all doc pairs."""
    plan = _plan(QUERIES["edit_distance_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_backoff_candidate_grid_is_bounded(spark, sf_dir):
    """The candidate grid is top-k x top-k (k=40): the only cross
    join in the plan must sit above TakeOrdered-limited inputs, never
    the raw bigram table."""
    df = QUERIES["stupid_backoff_scores"](spark, sf_dir)
    assert df.count() <= 40 * 40
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_hard_negatives_are_cross_label_and_exact(spark, sf_dir):
    import numpy as np

    rows = QUERIES["hard_negative_mining"](spark, sf_dir).collect()
    assert rows
    emb = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, got in by_q.items():
        qv, ql = emb[qid]
        # brute-force cross-label top-3 with the same 3dp + id tiebreak
        scored = []
        for nid, (nv, nl) in emb.items():
            if nid == qid or nl == ql:
                continue
            s = round(
                float(qv @ nv)
                / (float(np.linalg.norm(qv)) * float(np.linalg.norm(nv))),
                3,
            )
            scored.append((-s, nid))
        scored.sort()
        expect = [(nid, -negs) for negs, nid in scored[:3]]
        got.sort(key=lambda r: r["rank"])
        assert [(r["neighbor_id"], r["score"]) for r in got] == [
            (nid, round(s, 3)) for nid, s in expect
        ]
        # every mined negative is truly cross-label
        for r in got:
            assert emb[r["neighbor_id"]][1] != ql
