"""Deterministic mergeable sketches: KMV distinct-count estimation and
A-ES weighted sampling.

Classic sketch algorithms are randomized; these variants draw all
randomness from md5 of the VALUE (the same content-addressed trick as
dataset_split / mixture_sample / the ANN planes), which makes them
reproducible across engines, runs, and partitionings — and therefore
hash-gateable against an ANSI-SQL oracle, the property every other
operator in this engine holds. Estimation error then depends on the
corpus (md5 is a fixed uniform hash of it), carrying the usual KMV
guarantees for any corpus not adversarially chosen against md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 15 hex digits: fits a signed 64-bit int, uniform on [0, 16^15)
_HEX_DIGITS = 15
_HEX_SPACE = float(16**_HEX_DIGITS)


def _unit_hash(col) -> Column:
    """Deterministic uniform draw in (0, 1]: the first 15 hex digits of
    md5(value) as a fraction of the 60-bit space (+1 so 0 is excluded —
    A-ES exponentiates, and KMV divides by it)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, _HEX_DIGITS), 16, 10)
    return (h.cast("double") + F.lit(1.0)) / F.lit(_HEX_SPACE)


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    k: int = 256,
) -> DataFrame:
    """Per-``keys`` distinct-count estimate of ``value`` via k-minimum
    values: keep each group's k smallest unit-hashes; with the k-th
    smallest at height h, the estimate is (k-1)/h. Exact below k
    (the sketch has seen every distinct hash).

    Scale shape: one distinct on (keys, hash) — two-phase, partial
    aggregation does the heavy dedup map-side — then one rank window
    per group that keeps <= k rows, then a combinable final fold. The
    sketch is MERGEABLE (k smallest of a union = k smallest of the
    merged k-smallest lists), which is the property that lets 1000
    executors sketch partitions independently; the Spark plan realizes
    the merge through the same two-phase aggregation. The rank window
    sorts each group's distinct hashes on one reducer — for a
    mega-group that sort is the dense_ids two-phase pattern's job, at
    which point k rows out of 10^9 still leave on one shuffle.

    Returns keys + (n_kept, distinct_est) — distinct_est exact when
    the group has < k distinct values.
    """
    hashed = df.select(*keys, _unit_hash(F.col(value)).alias("u")).distinct()
    w = Window.partitionBy(*keys).orderBy("u")
    topk = hashed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return topk.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(F.round((F.lit(k) - 1) / F.max("u"), 3))
        .alias("distinct_est"),
    )


def weighted_sample(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    weight: str,
    k: int = 5,
) -> DataFrame:
    """Weight-proportional sample of ``k`` rows per group without
    replacement (Efraimidis-Spirtsis A-ES): each row draws u =
    unit_hash(id) and scores u^(1/w); the k largest scores are the
    sample. Inclusion probability is proportional to weight, and the
    draw is a pure function of row identity — re-running, re-
    partitioning, or re-implementing in another engine selects the
    SAME rows (quality-weighted corpus sampling must be reproducible
    or ablations don't mean anything).

    Scale shape: one zero-shuffle projection computes the score, one
    rank window per group emits <= k rows. Rows with weight <= 0 are
    excluded (score undefined).

    Returns keys + (id_col, weight, score) for the k winners,
    score rounded to 6dp for cross-engine comparison.
    """
    scored = df.where(F.col(weight) > 0).select(
        *keys,
        id_col,
        F.col(weight).alias("weight"),
        F.pow(_unit_hash(F.col(id_col)), 1.0 / F.col(weight)).alias("_s"),
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("_s"), id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(*keys, id_col, "weight", F.round("_s", 6).alias("score"))
    )
