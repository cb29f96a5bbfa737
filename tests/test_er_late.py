"""Tests for er_clusters (cluster validity) and late_data_audit
(python recompute)."""

from collections import defaultdict

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_er_clusters_valid(spark, sf_dir):
    rows = QUERIES["er_clusters"](spark, sf_dir).collect()
    assert rows
    user_of = {
        r["event_id"]: r["user_id"]
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .collect()
    }
    by_comp = defaultdict(list)
    for r in rows:
        by_comp[r["component"]].append(r)
    for comp, members in by_comp.items():
        ids = [m["event_id"] for m in members]
        # component id is the min member
        assert comp == min(ids)
        # FS blocking confines matches to one user -> so are clusters
        assert len({user_of[i] for i in ids}) == 1
        # size column consistent
        assert all(m["cluster_size"] == len(ids) for m in members)
        assert len(ids) >= 2  # every clustered node had an edge


def test_late_data_audit_recompute(spark, sf_dir):
    rows = {
        r["user_id"]: r
        for r in QUERIES["late_data_audit"](spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", F.unix_timestamp("ts").alias("ep"))
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["event_id"], r["ep"]))
    for uid, evs in per_user.items():
        evs.sort()
        mx = None
        n_late = 0
        max_lag = 0
        for _, ep in evs:
            if mx is not None and ep < mx:
                n_late += 1
                max_lag = max(max_lag, mx - ep)
            mx = ep if mx is None else max(mx, ep)
        r = rows[uid]
        assert r["n_events"] == len(evs)
        assert r["n_late"] == n_late
        assert r["max_lag_sec"] == max_lag
