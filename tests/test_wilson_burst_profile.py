"""Independent recomputation checks for wilson_conversion / burstiness
/ k_anonymity_audit / column_profile."""

import math

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES


def test_wilson_bounds_bracket_p_and_match_formula(spark, sf_dir):
    rows = QUERIES["wilson_conversion"](spark, sf_dir).collect()
    assert rows
    z = 1.96
    for r in rows:
        n, conv = float(r["n_users"]), float(r["n_converted"])
        p = conv / n
        center = p + z * z / (2 * n)
        margin = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        assert abs(r["wilson_lo"] - round((center - margin) / denom, 6)) < 1e-9
        assert abs(r["wilson_hi"] - round((center + margin) / denom, 6)) < 1e-9
        assert r["wilson_lo"] <= r["p"] <= r["wilson_hi"]
        assert 0.0 <= r["wilson_lo"] and r["wilson_hi"] <= 1.0


def test_burstiness_in_range_and_matches_pandas(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    ev = load_table(spark, sf_dir, "events")
    pdf = ev.select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
        "ts",
        "event_id",
    ).toPandas()
    got = {
        r["user_id"]: (r["n_gaps"], r["burstiness"])
        for r in QUERIES["burstiness"](spark, sf_dir).collect()
    }
    assert got
    for uid, grp in pdf.groupby("user_id"):
        gaps = grp.sort_values(["ts", "event_id"])["sec"].diff().dropna()
        if len(gaps) < 2:
            assert uid not in got
            continue
        mu, sd = gaps.mean(), gaps.std(ddof=1)
        want = round((sd - mu) / (sd + mu), 6)
        n_gaps, b = got[uid]
        assert n_gaps == len(gaps)
        assert abs(b - want) < 1e-6
        assert -1.0 <= b <= 1.0


def test_k_anonymity_classes_partition_the_table(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    rows = QUERIES["k_anonymity_audit"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n"] for r in rows) == total
    for r in rows:
        assert r["at_risk"] == (r["n"] < 5)


def test_column_profile_counts(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    prof = {r["col"]: r for r in QUERIES["column_profile"](spark, sf_dir).collect()}
    assert set(prof) == {"event_id", "user_id", "event_type", "value", "props"}
    for col, r in prof.items():
        assert r["n_total"] == n
        assert r["n_null"] == ev.where(F.col(col).isNull()).count()
        assert (
            r["n_distinct"]
            == ev.select(col).where(F.col(col).isNotNull()).distinct().count()
        )
    assert prof["event_id"]["n_distinct"] == n  # primary key property
