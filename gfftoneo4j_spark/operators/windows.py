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


def _with_segment(df: DataFrame, seg_source: str, segment_rows: int) -> DataFrame:
    return df.withColumn(
        "__seg", F.floor(F.col(seg_source) / F.lit(segment_rows)).cast("long")
    )


def segmented_lead(
    df: DataFrame,
    part: str,
    order: Sequence[str],
    cols: Sequence[str],
    segment_rows: int,
    prefix: str = "next_",
) -> DataFrame:
    """lead(c) over (partitionBy(part) orderBy(order)) for each c in
    ``cols`` — computed WITHOUT ever materializing a whole partition in
    one task, so a mega-conversation holding 10^10 turns cannot produce
    a straggler/OOM window task (the north_rule's mega-conversation
    skew; plain windows cannot be salted without breaking lead chains).

    Mechanics: rows are range-segmented on floor(order[0]/segment_rows)
    (ties on order keys share a segment by construction); an in-segment
    window produces every lead except the segment-last row, and a tiny
    per-segment "first row" table — |partition|/segment_rows rows,
    min-struct aggregated, so map-side combinable — is lead()-ed over
    segments and joined back to stitch the boundaries. The stitch join
    is keyed (part, __seg), the same partitioning the in-segment window
    already established.

    Requirements: order keys unique per partition (plain lead is
    ill-defined under ties anyway) and ``cols`` non-null (boundary fill
    uses coalesce). order[0] must be numeric and roughly dense."""
    seg = _with_segment(df, order[0], segment_rows)
    w_in = Window.partitionBy(part, "__seg").orderBy(*order)
    out = seg
    for c in cols:
        out = out.withColumn(prefix + c, F.lead(c).over(w_in))
    # order fields first (lexicographic min = first row in window order),
    # carried cols aliased uniquely (a col may also be an order key)
    row_struct = F.struct(
        *[F.col(o).alias(f"__o{i}") for i, o in enumerate(order)],
        *[F.col(c).alias(f"__c_{c}") for c in cols],
    )
    firsts = seg.groupBy(part, "__seg").agg(F.min(row_struct).alias("__first"))
    w_seg = Window.partitionBy(part).orderBy("__seg")
    boundary = firsts.withColumn("__nf", F.lead("__first").over(w_seg)).select(
        part, "__seg", "__nf"
    )
    out = out.join(boundary, [part, "__seg"], "left")
    for c in cols:
        # in-segment lead is null exactly on the segment-last row; fill
        # it from the next segment's first row
        out = out.withColumn(
            prefix + c, F.coalesce(F.col(prefix + c), F.col(f"__nf.__c_{c}"))
        )
    return out.drop("__seg", "__nf")


def segmented_lag(
    df: DataFrame,
    part: str,
    order: Sequence[str],
    cols: Sequence[str],
    segment_rows: int,
    prefix: str = "prev_",
) -> DataFrame:
    """lag() twin of segmented_lead (same contract; boundary fill comes
    from the previous segment's LAST row via a max-struct)."""
    seg = _with_segment(df, order[0], segment_rows)
    w_in = Window.partitionBy(part, "__seg").orderBy(*order)
    out = seg
    for c in cols:
        out = out.withColumn(prefix + c, F.lag(c).over(w_in))
    row_struct = F.struct(
        *[F.col(o).alias(f"__o{i}") for i, o in enumerate(order)],
        *[F.col(c).alias(f"__c_{c}") for c in cols],
    )
    lasts = seg.groupBy(part, "__seg").agg(F.max(row_struct).alias("__last"))
    w_seg = Window.partitionBy(part).orderBy("__seg")
    boundary = lasts.withColumn("__pl", F.lag("__last").over(w_seg)).select(
        part, "__seg", "__pl"
    )
    out = out.join(boundary, [part, "__seg"], "left")
    for c in cols:
        out = out.withColumn(
            prefix + c, F.coalesce(F.col(prefix + c), F.col(f"__pl.__c_{c}"))
        )
    return out.drop("__seg", "__pl")


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
