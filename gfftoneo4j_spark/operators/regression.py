"""In-engine model training via exact normal equations.

A quality-regression fit is the smallest real "training" workload a
data-pipeline engine meets: fit y ~ w0 + w1*x1 + w2*x2 per group and
ship the coefficients to the selection policy. The whole fit is TWO
map-side-combinable aggregation passes collapsed into one groupBy —
nine integer moment sums — followed by a scalar Cramer solve, so the
cost at 100 TB is one combinable agg over the corpus and zero extra
shuffles (the reference has no model surface at all; this generalizes
its per-feature fold style, GeneReader.scala:65-135, to sufficient
statistics).

Determinism contract for the DuckDB gate: features and target are
INTEGER columns, so every moment sum is exact in BIGINT; the 3x3
Cramer determinants are computed in DECIMAL(38,0) (int128-exact in
both engines — products reach ~1e23 at sf0.1, past BIGINT but far
under 38 digits); only the final coefficient division drops to double.
Integer arithmetic is order-free, so the fit is bit-identical at any
partitioning or parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "decimal(38,0)"


def ols_fit_normal_eq(
    df: DataFrame,
    y: str,
    x1: str,
    x2: str,
    group: str,
) -> DataFrame:
    """Per-group exact OLS for y ~ w0 + w1*x1 + w2*x2 (integer cols).

    Returns (group, n, w0, w1, w2, r2) with coefficients and R^2
    rounded to 6dp. Groups whose normal matrix is singular (det = 0,
    e.g. constant features) are dropped rather than emitted as NULLs.
    """
    m = df.groupBy(group).agg(
        F.count("*").cast(_D).alias("n"),
        F.sum(F.col(x1)).cast(_D).alias("s1"),
        F.sum(F.col(x2)).cast(_D).alias("s2"),
        F.sum(F.col(x1) * F.col(x1)).cast(_D).alias("s11"),
        F.sum(F.col(x1) * F.col(x2)).cast(_D).alias("s12"),
        F.sum(F.col(x2) * F.col(x2)).cast(_D).alias("s22"),
        F.sum(F.col(y)).cast(_D).alias("sy"),
        F.sum(F.col(x1) * F.col(y)).cast(_D).alias("s1y"),
        F.sum(F.col(x2) * F.col(y)).cast(_D).alias("s2y"),
        F.sum(F.col(y) * F.col(y)).cast(_D).alias("syy"),
    )
    # Cramer's rule on the 3x3 normal matrix [[n,s1,s2],[s1,s11,s12],
    # [s2,s12,s22]] — all products stay in decimal(38,0), exact.
    dets = m.select(
        F.col(group),
        F.col("n"),
        F.col("sy"),
        F.col("s1y"),
        F.col("s2y"),
        F.col("syy"),
        F.expr(
            "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
            " + s2 * (s1 * s12 - s11 * s2)"
        ).alias("det"),
        F.expr(
            "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
            " + s2 * (s1y * s12 - s11 * s2y)"
        ).alias("det0"),
        F.expr(
            "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
            " + s2 * (s1 * s2y - s1y * s2)"
        ).alias("det1"),
        F.expr(
            "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
            " + sy * (s1 * s12 - s11 * s2)"
        ).alias("det2"),
    ).where(F.col("det") != 0)
    w = dets.select(
        F.col(group),
        F.col("n").cast("bigint").alias("n"),
        (F.col("det0").cast("double") / F.col("det").cast("double")).alias(
            "w0"
        ),
        (F.col("det1").cast("double") / F.col("det").cast("double")).alias(
            "w1"
        ),
        (F.col("det2").cast("double") / F.col("det").cast("double")).alias(
            "w2"
        ),
        F.col("sy").cast("double").alias("syd"),
        F.col("s1y").cast("double").alias("s1yd"),
        F.col("s2y").cast("double").alias("s2yd"),
        F.col("syy").cast("double").alias("syyd"),
    )
    # R^2 from the same sufficient statistics: SSE = syy - w.[sy s1y
    # s2y]; SST = syy - sy^2/n. Double math over identical operands in
    # an identical expression tree — deterministic cross-engine.
    return w.select(
        F.col(group),
        "n",
        F.round("w0", 6).alias("w0"),
        F.round("w1", 6).alias("w1"),
        F.round("w2", 6).alias("w2"),
        F.round(
            F.lit(1.0)
            - (
                F.col("syyd")
                - F.col("w0") * F.col("syd")
                - F.col("w1") * F.col("s1yd")
                - F.col("w2") * F.col("s2yd")
            )
            / (
                F.col("syyd")
                - F.col("syd") * F.col("syd") / F.col("n").cast("double")
            ),
            6,
        ).alias("r2"),
    )
