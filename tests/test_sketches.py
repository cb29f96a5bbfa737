"""Error bounds and determinism for operators/sketches.py (the gated
queries kmv_distinct_users / weighted_sample_docs pin SQL-twin
equivalence; these pin the statistical claims)."""

import pytest
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.sketches import kmv_distinct, weighted_sample


def test_kmv_exact_below_k(spark):
    df = spark.range(50).select(
        F.lit("g").alias("grp"), F.col("id").alias("val")
    )
    row = kmv_distinct(df, ["grp"], "val", k=256).collect()[0]
    assert row["n_kept"] == 50
    assert row["distinct_est"] == 50.0


def test_kmv_estimate_within_bound(spark):
    # 10_000 distinct values, k=256: KMV relative error concentrates
    # around 1/sqrt(k-2) ~ 6.3%; assert a loose 3-sigma-ish 20% bound
    df = spark.range(10_000).select(
        F.lit("g").alias("grp"), F.col("id").alias("val")
    )
    row = kmv_distinct(df, ["grp"], "val", k=256).collect()[0]
    assert row["n_kept"] == 256
    assert abs(row["distinct_est"] - 10_000) / 10_000 < 0.20


def test_kmv_insensitive_to_duplication_and_partitioning(spark):
    base = spark.range(3_000).select(
        F.lit("g").alias("grp"), (F.col("id") % 1000).alias("val")
    )
    a = kmv_distinct(base, ["grp"], "val", k=64).collect()[0]
    b = kmv_distinct(base.repartition(17), ["grp"], "val", k=64).collect()[0]
    assert a["distinct_est"] == b["distinct_est"]
    # duplication changes nothing: the sketch sees distinct hashes
    c = kmv_distinct(
        base.unionAll(base), ["grp"], "val", k=64
    ).collect()[0]
    assert c["distinct_est"] == a["distinct_est"]


def test_weighted_sample_favors_heavy_rows(spark):
    # 100 light rows (w=1) + 10 heavy rows (w=100) per group; k=10.
    # E[heavy in sample] >> E[light]; with weight ratio 100:1 the
    # heavies should take most of the sample in any non-adversarial
    # fixed draw.
    rows = [("g", i, 1.0) for i in range(100)] + [
        ("g", 1000 + i, 100.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    got = weighted_sample(df, ["grp"], "id", "w", k=10).collect()
    heavy = sum(1 for r in got if r["id"] >= 1000)
    assert len(got) == 10
    assert heavy >= 7


def test_weighted_sample_deterministic_across_partitioning(spark):
    rows = [("g", i, float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    a = {r["id"] for r in weighted_sample(df, ["grp"], "id", "w", k=9).collect()}
    b = {
        r["id"]
        for r in weighted_sample(
            df.repartition(13), ["grp"], "id", "w", k=9
        ).collect()
    }
    assert a == b and len(a) == 9


def test_weighted_sample_excludes_nonpositive_weights(spark):
    rows = [("g", 1, 0.0), ("g", 2, -3.0), ("g", 3, 2.0)]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    got = weighted_sample(df, ["grp"], "id", "w", k=5).collect()
    assert [r["id"] for r in got] == [3]
