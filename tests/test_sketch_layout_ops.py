"""Statistical/structural claims for the round-4 sketch and layout
operators: register-min distinct (MinCount), Bloom semi-join,
winnowing fingerprints, z-order keys. SQL-twin equivalence is pinned
by the gated queries (register_min_distinct / bloom_semi_join /
winnow_fingerprints / zorder_layout); these pin the guarantees the
gate can't express."""

import pytest
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.dedup import winnow_fingerprints
from gfftoneo4j_spark.operators.layout import z_value, zorder_block_stats
from gfftoneo4j_spark.operators.sketches import (
    bloom_build,
    bloom_probe,
    register_min_distinct,
)


# ---------------------------------------------------------------- MinCount
def test_register_min_estimate_within_bound(spark):
    # 10_000 distinct, m=256 registers: MinCount relative error
    # concentrates near 1/sqrt(m) ~ 6.3%; loose 3-sigma-ish 20% bound
    df = spark.range(10_000).select(
        F.lit("g").alias("grp"), F.col("id").alias("val")
    )
    row = register_min_distinct(df, ["grp"], "val", m=256).collect()[0]
    assert abs(row["distinct_est"] - 10_000) / 10_000 < 0.20


def test_register_min_small_n_linear_counting(spark):
    # n ~ m is the regime where the raw inverse estimator is
    # Jensen-biased ~2x low; the HLL-style linear-counting switch on
    # empty registers must hold accuracy here
    for n, lo, hi in ((30, 24, 38), (150, 120, 180)):
        df = spark.range(n).select(
            F.lit("g").alias("grp"), F.col("id").alias("val")
        )
        row = register_min_distinct(df, ["grp"], "val", m=256).collect()[0]
        assert row["n_regs"] <= n
        assert lo <= row["distinct_est"] <= hi, (n, row["distinct_est"])


def test_register_min_insensitive_to_duplication_and_partitioning(spark):
    base = spark.range(3_000).select(
        F.lit("g").alias("grp"), (F.col("id") % 700).alias("val")
    )
    a = register_min_distinct(base, ["grp"], "val").collect()[0]
    b = register_min_distinct(base.repartition(17), ["grp"], "val").collect()[0]
    c = register_min_distinct(
        base.unionAll(base), ["grp"], "val"
    ).collect()[0]
    assert a["distinct_est"] == b["distinct_est"] == c["distinct_est"]


def test_register_min_no_window_in_plan(spark):
    # the operator's reason to exist: NO per-group rank window —
    # both phases are hash aggregations (map-side combinable)
    df = spark.range(100).select(
        F.lit("g").alias("grp"), F.col("id").alias("val")
    )
    plan = (
        register_min_distinct(df, ["grp"], "val")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "HashAggregate" in plan


# ------------------------------------------------------------------- Bloom
def test_bloom_no_false_negatives(spark):
    dim = spark.range(0, 400).select(F.col("id").alias("k"))
    bloom = bloom_build(dim, "k")
    probe = spark.range(0, 2_000).select(F.col("id").alias("k"))
    cand = {
        r["val"]
        for r in bloom_probe(probe, "k", bloom).collect()
        if r["candidate"]
    }
    members = {str(i) for i in range(400)}
    assert members <= cand  # every member IS a candidate


def test_bloom_false_positive_rate_matches_theory(spark):
    # n=400, m=2048, k=4: (1 - e^(-kn/m))^k = (1 - e^(-0.781))^4
    # ~ 8.6% — a deliberately over-loaded filter so the measured rate
    # is statistically meaningful (measured 8.78% at this seed-free
    # md5 draw); assert within ~1.5x of theory both ways
    dim = spark.range(0, 400).select(F.col("id").alias("k"))
    bloom = bloom_build(dim, "k")
    probe = spark.range(0, 20_000).select(F.col("id").alias("k"))
    rows = bloom_probe(probe, "k", bloom).collect()
    fp = sum(1 for r in rows if r["candidate"] and int(r["val"]) >= 400)
    assert 0.055 < fp / 19_600 < 0.13


def test_bloom_filter_is_tiny(spark):
    bloom = bloom_build(
        spark.range(0, 10_000).select(F.col("id").alias("k")), "k"
    )
    assert bloom.count() <= 33  # ceil(2048 / 63)


# --------------------------------------------------------------- Winnowing
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_shared_run_guarantee(spark):
    # width=5, window=4: any shared run of width+window-1 = 8 words
    # must share >= 1 fingerprint (the Schleimer et al. guarantee)
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    d = _docs(
        spark,
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} nine ten eleven twelve thirteen"),
        ],
    )
    fp = winnow_fingerprints(d, width=5, window=4)
    a = {r["fp"] for r in fp.where(F.col("doc_id") == 1).collect()}
    b = {r["fp"] for r in fp.where(F.col("doc_id") == 2).collect()}
    assert a & b


def test_winnow_density(spark):
    import random

    random.seed(42)
    words = " ".join(random.choice("abcdefghij") + str(i % 97) for i in range(500))
    d = _docs(spark, [(1, words)])
    n_sh = 500 - 5 + 1  # positions
    n_fp = winnow_fingerprints(d, width=5, window=4).count()
    # expected density 2/(w+1) = 0.4; allow wide band
    assert 0.15 * n_sh < n_fp < 0.7 * n_sh


def test_winnow_rightmost_tie_and_determinism(spark):
    # identical text -> identical fingerprint sets regardless of
    # partitioning (pure function of content)
    text = "a b c d e f g h i j a b c d e f g h i j"
    d1 = _docs(spark, [(1, text)])
    d2 = _docs(spark, [(2, text)]).repartition(7)
    f1 = {(r["pos"], r["fp"]) for r in winnow_fingerprints(d1).collect()}
    f2 = {(r["pos"], r["fp"]) for r in winnow_fingerprints(d2).collect()}
    assert f1 == f2
    # repeated shingles: the fused key breaks hash ties to the
    # RIGHTMOST position, so no window selects a leftmost duplicate
    # when a rightmost equal-hash one is in range
    assert f1  # non-empty


def test_winnow_short_doc_empty(spark):
    d = _docs(spark, [(1, "only four words here")])
    assert winnow_fingerprints(d, width=5, window=4).count() == 0


# ----------------------------------------------------------------- Z-order
def test_z_value_interleave_known_bits(spark):
    df = spark.createDataFrame([(5, 3)], "x long, y long")
    # x=0b101 in even bits -> 1<<0 | 1<<4 = 17; y=0b011 in odd bits
    # -> 1<<1 | 1<<3 = 10; z = 27
    z = df.select(z_value(F.col("x"), F.col("y"), bits=4).alias("z"))
    assert z.collect()[0]["z"] == 27


def test_zorder_blocks_bound_both_dims(spark):
    # 2^14 points on a 128x128 grid; blocks of 2^12 z-values cover
    # 64x64 tiles -> per-block range <= 63 in BOTH dims, while a
    # row-major layout would span the full 127 in one of them
    df = spark.range(16_384).select(
        (F.col("id") % 128).alias("x"), (F.col("id") / 128).cast("long").alias("y")
    )
    stats = zorder_block_stats(df, "x", "y", bits=7, block_shift=12).collect()
    assert stats
    for r in stats:
        assert r["x_max"] - r["x_min"] <= 63
        assert r["y_max"] - r["y_min"] <= 63


def test_z_value_stays_in_codegen(spark):
    df = spark.range(100).select(
        F.col("id").alias("x"), (F.col("id") * 3 % 64).alias("y")
    )
    plan = (
        df.select(z_value(F.col("x"), F.col("y"), bits=6).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
