"""Ordered operators: stable ordering, consecutive pairing, enumeration.

Reference analogues (SURVEY.md §2.5):
- W1 sort-within-group  (GenesToNeo4j.scala:22)  -> window orderBy
- W2 zip-with-tail pair (Neo4JUtils.scala:45-51) -> lead() + filter
- W3 zipWithIndex       (GenesToNeo4j.scala:12)  -> row_number()
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stable_turn_order(
    part: Sequence[str] = ("conv_id",),
    order: Sequence[str | Column] = ("turn_idx", "ts"),
) -> Window:
    """The north_rule's stable (conv_id, turn_idx) ordering window."""
    return Window.partitionBy(*part).orderBy(*order)


def with_rank(df: DataFrame, w: Window, col: str = "rn") -> DataFrame:
    return df.withColumn(col, F.row_number().over(w))


def consecutive_pairs(
    df: DataFrame, id_col: str, w: Window, edge_type: str
) -> DataFrame:
    """zip(xs, xs.tail) as a lead() window: emits (src, dst, type) for
    each consecutive pair in the window's order. One shuffle on the
    partition key, no self-join."""
    nxt = F.lead(id_col).over(w)
    return (
        df.select(
            F.col(id_col).alias("src"),
            nxt.alias("dst"),
            F.lit(edge_type).alias("type"),
        )
        .where(F.col("dst").isNotNull())
    )
