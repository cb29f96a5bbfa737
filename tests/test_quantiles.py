"""exact_group_quantiles vs brute-force selection: exactness on seeded
data plus the degenerate shapes the histogram path must survive
(constant groups, groups smaller than the bucket count, boundary ks).
"""

import math
import random

from gfftoneo4j_spark.operators.quantiles import exact_group_quantiles

QS = (0.5, 0.9, 0.99)


def _brute(rows, qs=QS):
    by_g = {}
    for g, v, t in rows:
        by_g.setdefault(g, []).append((v, t))
    want = {}
    for g, vs in by_g.items():
        vs.sort()
        for q in qs:
            want[(g, q)] = vs[math.ceil(q * len(vs)) - 1][0]
    return want


def _run(spark, rows, n_buckets=1024):
    df = spark.createDataFrame(rows, "event_type string, value double, event_id long")
    out = exact_group_quantiles(
        df, "event_type", "value", "event_id", qs=QS, n_buckets=n_buckets
    )
    return {(r["event_type"], r["quantile"]): r["qvalue"] for r in out.collect()}


def test_matches_brute_force_on_seeded_data(spark):
    rng = random.Random(7)
    rows = [
        (g, round(rng.uniform(-50, 50), 6), i)
        for i, g in enumerate(
            g for g in ("click", "view", "purchase") for _ in range(400)
        )
    ]
    assert _run(spark, rows) == _brute(rows)


def test_constant_group_and_tiny_group(spark):
    rows = [("const", 3.14, i) for i in range(50)]  # lo == hi: bucket 0
    rows += [("tiny", float(v), v) for v in (5, 1, 9)]  # n << n_buckets
    got = _run(spark, rows)
    assert got[("const", 0.5)] == 3.14 and got[("const", 0.99)] == 3.14
    # tiny: sorted [1, 5, 9]; k = ceil(.5*3)=2, ceil(.9*3)=3, ceil(.99*3)=3
    assert got[("tiny", 0.5)] == 5.0
    assert got[("tiny", 0.9)] == 9.0 and got[("tiny", 0.99)] == 9.0


def test_few_buckets_still_exact(spark):
    """Correctness must not depend on bucket resolution — only the
    final sort size does."""
    rng = random.Random(11)
    rows = [("g", rng.uniform(0, 1), i) for i in range(500)]
    assert _run(spark, rows, n_buckets=4) == _brute(rows)


def test_histogram_quantiles_error_bounded_by_bin_width(spark):
    from gfftoneo4j_spark.operators.quantiles import histogram_quantiles
    from pyspark.sql import functions as F

    # 10k distinct uniform values 0..9999: p-quantile ~ p*10000
    df = spark.range(10_000).select(F.col("id").cast("double").alias("v"))
    out = {r["p"]: r for r in histogram_quantiles(df, "v", [0.5, 0.9]).collect()}
    width = 9999.0 / 1024
    assert out[0.5]["n"] == 10_000
    assert abs(out[0.5]["est"] - 5000.0) <= width
    assert abs(out[0.9]["est"] - 9000.0) <= width


def test_histogram_quantiles_constant_column_and_merge_invariance(spark):
    from gfftoneo4j_spark.operators.quantiles import histogram_quantiles
    from pyspark.sql import functions as F

    const = spark.range(100).select(F.lit(7.5).alias("v"))
    out = histogram_quantiles(const, "v", [0.5]).collect()
    assert out[0]["est"] == 7.5
    # the sketch is a pure function of the value multiset: any
    # partitioning gives the identical estimate (mergeability)
    df = spark.range(10_000).select(F.col("id").cast("double").alias("v"))
    a = histogram_quantiles(df.repartition(1), "v", [0.9]).collect()[0]["est"]
    b = histogram_quantiles(df.repartition(37), "v", [0.9]).collect()[0]["est"]
    assert a == b
