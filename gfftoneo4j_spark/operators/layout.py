"""Data-layout operators: z-order (Morton) clustering keys.

Multi-dimensional pruning is a write-time problem: a table range-
partitioned on one column prunes scans on that column only, while a
z-ordered layout interleaves the bits of several columns so rows close
in ANY clustered dimension land in the same files — min/max file
statistics then prune selective predicates on every clustered column
(the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`, public
literature: Morton 1966, the original z-curve).

The operator here produces the clustering KEY; writing is just
`df.repartitionByRange(F.col("z")).write...`, and the gated query
demonstrates the property that matters — per-z-block min/max ranges
stay bounded in BOTH dimensions simultaneously.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton z-value (x in even positions, y in odd).

    Pure bit arithmetic — `2 * bits` shift/mask/or terms, all inside
    whole-stage codegen, zero shuffle; expressible verbatim in ANSI
    SQL, which is how the DuckDB oracle runs the identical
    computation. Callers bucket/clamp the inputs to ``bits`` first
    (a z-value is a layout key, so coarse bucketing is the point:
    16 bits per dimension addresses 65536 range buckets each)."""
    def bit_at(c: Column, i: int) -> Column:
        return F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))

    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(bit_at(x, i), 2 * i))
        parts.append(F.shiftleft(bit_at(y, i), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("z")


def z_value_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical interleave as ANSI SQL text (for the oracle twin
    and for engines driven by SQL strings)."""
    parts = []
    for i in range(bits):
        parts.append(
            f"(((CAST(({x_expr}) AS BIGINT) >> {i}) & 1) << {2 * i})"
        )
        parts.append(
            f"(((CAST(({y_expr}) AS BIGINT) >> {i}) & 1) << {2 * i + 1})"
        )
    return " | ".join(parts)


def zorder_block_stats(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 10,
    block_shift: int = 12,
) -> DataFrame:
    """Cluster rows by z-value and report per-block (z >> block_shift)
    row counts and min/max of both dimensions — the file-statistics
    view a z-ordered write produces. Bounded per-block ranges in BOTH
    columns at once is the pruning property; a single-column sort
    shows unbounded range in the other column.

    Scale shape: one projection (codegen bit math) + one combinable
    groupBy on the block id; block count <= 2^(2*bits - block_shift),
    independent of row count."""
    zx = F.col(x).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    zy = F.col(y).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = z_value(zx, zy, bits=bits)
    return (
        df.select(zx.alias("zx"), zy.alias("zy"), z.alias("z"))
        .select("zx", "zy", F.shiftright("z", block_shift).alias("z_block"))
        .groupBy("z_block")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zx").alias("x_min"),
            F.max("zx").alias("x_max"),
            F.min("zy").alias("y_min"),
            F.max("zy").alias("y_max"),
        )
    )
