"""Data-quality expectations: declarative column checks evaluated in
ONE aggregation pass.

The reference's only data-quality machinery is parse-or-abort
(Application.scala:47) / parse-or-quarantine; a production ingest adds
*table-level* contracts checked before data is allowed downstream
(Great-Expectations-style: null fraction, uniqueness, value ranges,
set/pattern membership). The scale-critical property is that N checks
over a 100 TB table must cost ONE scan + ONE combinable aggregation,
never N passes: every check compiles to a conditional-sum expression
inside the same agg, and the single result row is then unpivoted to
one row per check (driver-side-free `stack`).

Uniqueness is the one non-combinable check (count distinct); Spark
plans it as a two-phase partial-distinct expand in the SAME
aggregation, so the pass count stays one.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative check; ``violations`` is a Column summing rows
    that break the contract (NULL-safe: NULL comparisons count as
    violations only for not_null)."""

    name: str
    column: str
    violations: Column


def not_null(col: str) -> Expectation:
    return Expectation(
        f"not_null_{col}",
        col,
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def in_range(col: str, lo: float, hi: float) -> Expectation:
    bad = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return Expectation(
        f"in_range_{col}", col, F.sum(F.when(bad, 1).otherwise(0))
    )


def in_set(col: str, allowed: tuple[str, ...]) -> Expectation:
    bad = F.col(col).isNotNull() & ~F.col(col).isin(*allowed)
    return Expectation(f"in_set_{col}", col, F.sum(F.when(bad, 1).otherwise(0)))


def matches(col: str, pattern: str) -> Expectation:
    bad = F.col(col).isNotNull() & ~F.col(col).rlike(pattern)
    return Expectation(
        f"matches_{col}", col, F.sum(F.when(bad, 1).otherwise(0))
    )


def unique(col: str) -> Expectation:
    return Expectation(
        f"unique_{col}",
        col,
        F.count(F.col(col)) - F.countDistinct(F.col(col)),
    )


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in one aggregation; returns one row
    per check: (check_name, column, n_violations, passed)."""
    aggs = [
        F.coalesce(e.violations.cast("bigint"), F.lit(0)).alias(f"_v{i}")
        for i, e in enumerate(expectations)
    ]
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{e.name}', '{e.column}', _v{i}" for i, e in enumerate(expectations)
    )
    return one.selectExpr(
        f"stack({len(expectations)}, {pairs}) AS (check_name, column, n_violations)"
    ).select(
        "check_name",
        "column",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema-drift report between two table versions: added, removed,
    and type-changed columns (driver-side metadata only — no data is
    read). The pre-flight check an incremental ingest runs before
    merging a producer's new batch into the persisted graph; pairs
    with the reader-side mergeSchema guarantee
    (tests/test_scale_plan_guards.py)."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out: list[dict] = []
    for col in sorted(n.keys() - o.keys()):
        out.append({"op": "added", "column": col, "type": n[col]})
    for col in sorted(o.keys() - n.keys()):
        out.append({"op": "removed", "column": col, "type": o[col]})
    for col in sorted(o.keys() & n.keys()):
        if o[col] != n[col]:
            out.append(
                {"op": "type_changed", "column": col,
                 "from": o[col], "to": n[col]}
            )
    return out
