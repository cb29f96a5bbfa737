"""sessionize / asof_join edge semantics: boundary gaps, inclusive
matches, duplicate-timestamp determinism."""

from datetime import datetime

from gfftoneo4j_spark.operators.windows import asof_join, sessionize


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_sessionize_gap_boundary_exact_gap_stays_together(spark):
    # gaps: 1800 (stay), 1801 (split)
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1),
        (1, datetime(2024, 1, 1, 0, 30, 0), 2),   # +1800 -> same session
        (1, datetime(2024, 1, 1, 1, 0, 1), 3),    # +1801 -> new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {
        (r["session_id"], r["n_events"])
        for r in sessionize(df, "user_id", "ts", "event_id", 1800).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_asof_match_is_inclusive_latest_and_null_when_no_prior(spark):
    left = spark.createDataFrame(
        [(1, _t(10)), (1, _t(5)), (2, _t(3))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t(5), 100.0), (1, _t(7), 200.0), (1, _t(11), 999.0), (2, _t(4), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        (r["key"], r["l_ep"] % 60, r["matched_ep"] % 60 if r["matched_ep"] is not None else None, r["matched_val"])
        for r in asof_join(left, right, "user_id", "ts", "value").collect()
    }
    # l@10 -> r@7 (latest <= 10, not the future r@11); l@5 -> r@5 (inclusive);
    # key 2 l@3 has no prior click -> nulls
    assert got == {(1, 10, 7, 200.0), (1, 5, 5, 100.0), (2, 3, None, None)}


def test_asof_duplicate_right_timestamps_take_max_value(spark):
    left = spark.createDataFrame([(1, _t(9))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(8), 3.0), (1, _t(8), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    [r] = asof_join(left, right, "user_id", "ts", "value").collect()
    assert r["matched_val"] == 7.0


def test_binned_interval_join_boundaries_and_wide_intervals(spark):
    """Inclusive bounds on both ends; intervals wider than the
    granularity still match exactly (they just explode into more
    buckets)."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from gfftoneo4j_spark.operators.windows import binned_interval_join

    base = dt.datetime(2026, 1, 1)
    facts = spark.createDataFrame(
        [Row(i=s, ts=base + dt.timedelta(seconds=s)) for s in
         [0, 59, 60, 100, 3600, 7200]]
    )
    t0 = int(base.timestamp())
    intervals = spark.createDataFrame(
        [
            Row(iid=0, lo=t0, hi=t0 + 60),          # matches 0, 59, 60
            Row(iid=1, lo=t0 + 100, hi=t0 + 7200),  # wide: 100, 3600, 7200
        ]
    )
    for g in (30, 60, 10000):  # narrower, equal, wider than intervals
        got = sorted(
            (r["iid"], r["i"])
            for r in binned_interval_join(
                facts, "ts", intervals, "lo", "hi", granularity=g
            ).collect()
        )
        assert got == [(0, 0), (0, 59), (0, 60),
                       (1, 100), (1, 3600), (1, 7200)], g
