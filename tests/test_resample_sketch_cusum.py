"""Accuracy and brute-force parity for resample_ffill /
rolling_distinct_sketch / cusum_changepoints."""

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.sketches import rolling_register_min
from gfftoneo4j_spark.queries import QUERIES


def test_rolling_sketch_carries_previous_bucket(spark):
    # hour 0: 120 users; hour 1: ONE user. The trailing-2 merge at
    # hour 1 must still see ~121 distinct — a register hit only in
    # hour 0 has to carry into hour 1's window (the densify grid).
    rows = [(0, f"u{i}") for i in range(120)] + [(1, "only")]
    df = spark.createDataFrame(rows, "b long, user string")
    out = {
        r["b"]: r["distinct_est"]
        for r in rolling_register_min(
            df, F.col("b"), "user", lookback=2
        ).collect()
    }
    assert abs(out[0] - 120) / 120 < 0.25
    assert abs(out[1] - 121) / 121 < 0.25  # NOT ~1: the merge worked


def test_rolling_sketch_estimate_within_bound(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {
        r["hour_bucket"]: r["distinct_est"]
        for r in QUERIES["rolling_distinct_sketch"](spark, sf_dir).collect()
    }
    b = F.expr("unix_timestamp(ts) div 3600")
    exact_rows = ev.select(b.alias("b"), "user_id").distinct().collect()
    from collections import defaultdict

    per_hour = defaultdict(set)
    for r in exact_rows:
        per_hour[r["b"]].add(r["user_id"])
    for hb, est in got.items():
        truth = len(
            per_hour[hb] | per_hour.get(hb - 1, set())
            | per_hour.get(hb - 2, set())
        )
        assert abs(est - truth) / max(truth, 1) < 0.30, (hb, est, truth)


def test_resample_ffill_matches_bruteforce(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("ep"), "value", "event_id"
    )
    events = sorted(
        ((r["user_id"], r["ep"], r["value"]) for r in ev.collect()),
    )
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, ep, v in events:
        per_user[u].append((ep, v))
    got = QUERIES["resample_ffill"](spark, sf_dir).collect()
    assert got
    for r in got[:200]:
        series = per_user[r["user_id"]]
        prior = [(ep, v) for ep, v in series if ep <= r["hour_ep"]]
        if not prior:
            assert r["filled_value"] is None
        else:
            best_ep = max(ep for ep, _ in prior)
            # asof pre-aggregates to max(value) per (user, ts)
            want = max(v for ep, v in prior if ep == best_ep)
            assert r["matched_ep"] == best_ep
            assert r["filled_value"] == want
    # grid is contiguous hours per user
    by_user = defaultdict(list)
    for r in got:
        by_user[r["user_id"]].append(r["hour_ep"])
    for u, eps in by_user.items():
        eps.sort()
        assert eps == list(range(eps[0], eps[-1] + 3600, 3600))


def test_cusum_matches_pandas(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    ev = load_table(spark, sf_dir, "events")
    pdf = ev.select("user_id", "ts", "event_id", "value").toPandas()
    mu = round(pdf["value"].mean(), 6)
    sd = round(pdf["value"].std(ddof=1), 6)
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    pdf["cusum"] = (pdf["value"] - mu).groupby(pdf["user_id"]).cumsum()
    want = {
        (r.user_id, r.event_id)
        for r in pdf[abs(pdf["cusum"]) > 16 * sd].itertuples()
    }
    got = {
        (r["user_id"], r["event_id"])
        for r in QUERIES["cusum_changepoints"](spark, sf_dir).collect()
    }
    assert got == want
