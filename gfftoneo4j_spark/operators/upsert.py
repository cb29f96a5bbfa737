"""CDC merge: last-writer-wins upsert of a change batch into a base
table (MERGE INTO semantics as a pure DataFrame op).

The reference's only write-idempotency tool is Cypher ``CREATE UNIQUE``
(Neo4JUtils.scala:40-44) — insert-if-absent, no update path. A KG that
ingests transcript streams continuously needs the scale-world version:
periodic change batches merged into the persisted graph with
deterministic conflict resolution.

Semantics of :func:`merge_latest`: for each key, keep the single row
with the highest ``version_col``; ties break toward the change batch
(``is_update`` desc), then by the lexicographically greatest payload
hash — fully deterministic for any input. Deletes are rows in the
change batch with ``op = 'D'``: they win like any update, then are
dropped from the output (tombstone semantics).

Scale shape: one union (no shuffle) + one shuffle on the merge key for
the per-key window. With the base stored bucketed by the key
(write_bucketed_graph), the base side's exchange disappears and only
the (small) change batch shuffles — the standard CDC-merge plan. The
window state is O(1) per key (row_number over a 2-3 row group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_latest(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    op_col: str | None = None,
) -> DataFrame:
    """Merge ``changes`` into ``base``; one surviving row per key.

    ``changes`` must share ``base``'s schema (plus optionally
    ``op_col`` with 'U'/'D'). Returns the merged table without the
    bookkeeping columns.
    """
    data_cols = base.columns
    b = base.withColumn("_upd", F.lit(0))
    c = changes.withColumn("_upd", F.lit(1))
    if op_col is not None:
        b = b.withColumn("_del", F.lit(0))
        c = c.withColumn(
            "_del", F.when(F.col(op_col) == "D", F.lit(1)).otherwise(F.lit(0))
        ).drop(op_col)
    else:
        b = b.withColumn("_del", F.lit(0))
        c = c.withColumn("_del", F.lit(0))

    # deterministic payload hash: \x01 field separator keeps it
    # boundary-safe (('ab','c') never collides with ('a','bc')), and a
    # \x00 NULL sentinel closes the remaining hole — concat_ws silently
    # SKIPS nulls, so ('x', NULL, 'y') would otherwise collide with
    # ('x', 'y', NULL) and exact version+side ties between distinct
    # rows could survive nondeterministically
    payload = F.md5(
        F.concat_ws(
            "\x01",
            *[
                F.coalesce(F.col(x).cast("string"), F.lit("\x00"))
                for x in data_cols
            ],
        )
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("_upd").desc(), payload.desc()
    )
    return (
        b.unionByName(c)
        .withColumn("_rk", F.row_number().over(w))
        .where((F.col("_rk") == 1) & (F.col("_del") == 0))
        .select(*data_cols)
    )


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a per-key change stream
    into validity intervals. Where :func:`merge_latest` keeps only each
    key's newest row (SCD1), this keeps EVERY version and stamps it
    [valid_from, valid_to) — valid_to = the next version's timestamp,
    null while current — the shape every time-travel join and
    "as the data was on date X" audit consumes.

    Scale shape: ONE shuffle — the (keys) window that computes
    lead(version) — with O(1) state per row; the is_current flag falls
    out of the same window. Dirty reality is handled deterministically:
    exact-version duplicates are ordered by ``tie_cols`` (default: the
    remaining payload columns) so reruns and engine swaps agree on
    which duplicate precedes which.

    Returns the input columns + (valid_from = version_col's value,
    valid_to, is_current).
    """
    data_cols = changes.columns
    ties = tie_cols if tie_cols is not None else [
        c for c in data_cols if c not in keys and c != version_col
    ]
    w = Window.partitionBy(*keys).orderBy(version_col, *ties)
    nxt = F.lead(version_col).over(w)
    return changes.select(
        *data_cols,
        F.col(version_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
