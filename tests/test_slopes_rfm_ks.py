"""Independent recomputation checks for user_trend_slopes /
rfm_segments / ks_drift."""

import numpy as np
from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES


def test_trend_slopes_match_numpy(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    ev = load_table(spark, sf_dir, "events")
    pdf = ev.select(
        "user_id",
        (F.unix_timestamp("ts").cast("bigint") / F.lit(3600.0)).alias("x"),
        "value",
    ).toPandas()
    got = {
        r["user_id"]: (r["slope_per_hour"], r["n"])
        for r in QUERIES["user_trend_slopes"](spark, sf_dir).collect()
    }
    assert got
    for uid, grp in pdf.groupby("user_id"):
        if len(grp) < 3:
            assert uid not in got
            continue
        want = np.polyfit(grp["x"], grp["value"], 1)[0]
        slope, n = got[uid]
        assert n == len(grp)
        assert abs(slope - want) < 1e-4, (uid, slope, want)


def test_rfm_segments_consistent(spark, sf_dir):
    rows = QUERIES["rfm_segments"](spark, sf_dir).collect()
    assert rows
    import statistics

    r_med = round(statistics.median(r["r_days"] for r in rows), 6)
    f_med = statistics.median(sorted(r["f_cnt"] for r in rows))
    m_med = round(statistics.median(sorted(r["m_sum"] for r in rows)), 6)
    for r in rows:
        seg = r["segment"]
        assert len(seg) == 3
        assert (seg[0] == "R") == (r["r_days"] <= r_med), r
        assert (seg[1] == "F") == (r["f_cnt"] > f_med), r
        assert (seg[2] == "M") == (r["m_sum"] > m_med), r
    assert len({r["segment"] for r in rows}) > 1


def test_ks_drift_matches_numpy(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    d = load_table(spark, sf_dir, "documents")
    pdf = d.select("source", "n_chars").toPandas()
    m = pdf["n_chars"].max()
    pdf["bin"] = np.minimum(19, (pdf["n_chars"] * 20.0 // (m + 1)).astype(int))
    all_counts = np.bincount(pdf["bin"], minlength=20)
    f_all = np.cumsum(all_counts) / all_counts.sum()
    got = {
        r["source"]: r["ks_stat"]
        for r in QUERIES["ks_drift"](spark, sf_dir).collect()
    }
    for src, grp in pdf.groupby("source"):
        counts = np.bincount(grp["bin"], minlength=20)
        f_src = np.cumsum(counts) / counts.sum()
        want = round(float(np.max(np.abs(f_src - f_all))), 6)
        assert abs(got[src] - want) < 1e-6, (src, got[src], want)
        assert 0.0 <= got[src] <= 1.0
