"""Exact distributed quantiles — the selection operator Spark lacks.

``approx_percentile`` is a sketch (rank error up to n/accuracy, and
not reproducible across engines, so it can't face a correctness
oracle). The naive exact plan — a window sort per group — puts every
row of a group in ONE task's sort: a single hot event_type in a
10^12-row table is a straggler/OOM, the same skew trap the pipeline
windows avoid by construction.

This operator computes EXACT k-th-smallest per group in two bounded
passes (the classic distributed selection / histogram-bisection
scheme):

1. one combinable aggregation for per-group (count, min, max), then
   one combinable fixed-width histogram of ``n_buckets`` per group —
   driver receives <= groups x n_buckets counts, walks the cumulative
   histogram, and pins each requested quantile to (bucket,
   rank-within-bucket);
2. one filtered pass that sorts ONLY the pinned buckets (expected
   n/n_buckets rows per group), never the full group.

Rows with equal values always share a bucket (floor is monotone), so
within-bucket (value, tie) order equals global order restricted to the
bucket and the selection is exact and deterministic. Total order =
(value, tie_col); k = ceil(q * n) (1-based), IEEE-identical in any
engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_buckets: int = 1024,
) -> DataFrame:
    """(group, quantile, qvalue): the exact k-th smallest value per
    group for each q in ``qs``, k = ceil(q * n), order (value, tie)."""
    spark = df.sparkSession
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        F.col(tie_col).alias("t"),
    ).where(F.col("v").isNotNull())

    stats = {
        r["g"]: (r["n"], r["lo"], r["hi"])
        for r in base.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    stats_df = spark.createDataFrame(
        [(g, lo, hi) for g, (_, lo, hi) in stats.items()],
        "g string, lo double, hi double",
    )
    # bucket is monotone in v; degenerate range (lo == hi) -> bucket 0
    width = (F.col("hi") - F.col("lo")) / n_buckets
    bucket = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("v") - F.col("lo")) / width),
                F.lit(n_buckets - 1),
            )
        )
        .cast("int")
    )
    bucketed = base.join(F.broadcast(stats_df), "g").select(
        "g", "v", "t", bucket.alias("bk")
    )
    hist: dict[tuple, int] = {
        (r["g"], r["bk"]): r["c"]
        for r in bucketed.groupBy("g", "bk")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }

    targets = []  # (g, q, bucket, rank_within_bucket)
    for g, (n, _, _) in stats.items():
        cum = 0
        ks = {q: math.ceil(q * n) for q in qs}
        pending = sorted(ks.items(), key=lambda kv: kv[1])
        it = iter(sorted(bk for (gg, bk) in hist if gg == g))
        for bk in it:
            c = hist[(g, bk)]
            while pending and pending[0][1] <= cum + c:
                q, k = pending.pop(0)
                targets.append((g, float(q), bk, k - cum))
            if not pending:
                break
            cum += c
    # k is the rank within the pinned bucket: ~n/n_buckets, so pick
    # n_buckets ~ n / rows-per-task at the target scale (or recurse a
    # second histogram level) to keep the final per-bucket sort bounded
    targets_df = spark.createDataFrame(
        targets, "g string, quantile double, bk int, k bigint"
    )
    w = Window.partitionBy("g", "quantile").orderBy("v", "t")
    return (
        bucketed.join(F.broadcast(targets_df), ["g", "bk"])
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == F.col("k"))
        .select(F.col("g").alias(group_col), "quantile", F.col("v").alias("qvalue"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    bins: int = 1024,
) -> DataFrame:
    """Approximate quantiles via a fixed-width histogram SKETCH — the
    mergeable, bounded-memory sibling of :func:`exact_group_quantiles`
    (which is exact but needs a second pass over the pinned buckets).
    Error is bounded by one bin width: (max-min)/bins, the classic
    equi-width histogram estimator with linear interpolation inside
    the crossing bin.

    Why it exists next to the exact operator: the histogram is a
    MERGEABLE summary (bin counts add), so 1000 executors — or 1000
    DAYS of a rolling pipeline — can each keep `bins` longs and merge
    at read time; Spark realizes the merge as partial aggregation in
    the one combinable groupBy. And unlike approx_percentile's GK
    sketch, the estimate is a pure deterministic function of (min,
    max, bin counts), so it faces the exact-hash gate like KMV does
    for distinct counts.

    Plan: pass 1 = one combinable (min, max, count); pass 2 = one
    combinable bin count (`bins` rows total); the cumulative walk and
    interpolation run on the `bins`-row summary (single-partition
    window over <= 1024 rows — bounded by construction, the same
    argument as exact quantiles' pinned-bucket collect). Constant
    columns (hi == lo) estimate lo for every p.

    Returns (p, n, est) — est rounded to 6dp.
    """
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    stats = df.where(v.isNotNull()).agg(
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
        F.count(v).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    b = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("lo")) / width).cast("int"),
            F.lit(bins - 1),
        )
    )
    hist = (
        df.where(v.isNotNull())
        .crossJoin(F.broadcast(stats))
        .groupBy(b.alias("b"), "lo", "hi", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    ps = spark.createDataFrame([(float(p),) for p in probs], "p double")
    target = F.col("p") * F.col("n")
    cand = cum.crossJoin(F.broadcast(ps)).where(F.col("cum") >= target)
    first = cand.groupBy("p").agg(F.min("b").alias("b"))
    bin_lo = F.col("lo") + F.col("b") * (
        (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    )
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        bin_lo
        + ((F.col("hi") - F.col("lo")) / F.lit(float(bins)))
        * (target - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
    )
    return (
        first.join(cum, "b")
        .select("p", F.col("n").cast("bigint").alias("n"),
                F.round(est, 6).alias("est"))
    )
