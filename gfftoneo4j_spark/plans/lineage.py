"""Per-partition lineage + run metrics.

The reference threads a Writer monad through assembly to accumulate
"Ignoring N rows. Reason: ..." logs (Writer.scala:3-19,
GeneReader.scala:85-94) and then discards them (quirk Q6). Here lineage
is a first-class side output: every dropped-row branch lands in a
``lineage`` DataFrame with per-partition counts and a bounded sample —
the north_star's "per-partition lineage".
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINEAGE_COLS = ("stage", "reason", "partition_id", "n", "sample")


def lineage_for(
    dropped: DataFrame,
    stage: str,
    reason: str,
    sample_col: str | None = None,
    n_samples: int = 3,
) -> DataFrame:
    """Aggregate a dropped-row branch into per-partition lineage rows.

    Counts are exact. Samples use ``n_samples`` independent one-value
    min() aggregates, each gated to its own hash residue class — every
    aggregation buffer is O(1), so a skewed failure mode dropping
    billions of rows per partition can never build a large collect_list
    (an earlier slice(collect_list(...)) draft buffered ~8% of the
    partition before slicing — an executor OOM hazard at exactly the
    scale lineage exists for).
    """
    base = dropped.withColumn("partition_id", F.spark_partition_id())
    if sample_col is not None:
        h = F.pmod(F.xxhash64(F.col(sample_col)), F.lit(97))
        sample = F.array_compact(
            F.array(
                *[
                    F.min(F.when(h == i, F.col(sample_col)))
                    for i in range(n_samples)
                ]
            )
        )
    else:
        sample = F.array().cast("array<string>")
    return base.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n"), sample.alias("sample")
    ).select(
        F.lit(stage).alias("stage"),
        F.lit(reason).alias("reason"),
        "partition_id",
        "n",
        "sample",
    )


def union_lineage(parts: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), parts)


def per_partition_counts(df: DataFrame, metric: str) -> DataFrame:
    """Run-metric table: row counts per physical partition (north_star's
    per-partition triple counts)."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("value"))
        .select(F.lit(metric).alias("metric"), "partition_id", "value")
    )


def score_histogram(df: DataFrame, score_col: str, bins: int = 20) -> DataFrame:
    """Link-score histogram (north_star run metric): fixed-width bins via
    a single groupBy — map-side combinable, no driver collect."""
    b = F.least(
        F.floor(F.col(score_col) * bins).cast("int"), F.lit(bins - 1)
    )
    return (
        df.groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.col("bin").cast("double") / bins).alias("bin_lo"),
            ((F.col("bin") + 1).cast("double") / bins).alias("bin_hi"),
            "n",
        )
    )
