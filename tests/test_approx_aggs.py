"""Approximate-aggregate scale path: HLL distinct counts and quantile
sketches vs their exact twins.

At 10^12 rows, exact count(distinct) (a two-phase expand) and exact
quantiles (two-phase histogram selection, operators/quantiles.py) have
a shuffle cost proportional to the key cardinality; the sketch forms
(HyperLogLog++ / GK) are single-pass, map-side combinable, O(1) state.
These tests pin the error contract that makes the swap safe — they are
pytest-only because a sketch can't hash-match a DuckDB oracle (the
gate's exact twins cover the exact forms: posting_lists df,
value_quantiles)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_hll_distinct_within_rsd(spark, sf_dir):
    ev = _docs(spark, sf_dir)
    row = ev.select(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.06 * row["exact"])


def test_hll_distinct_per_group_within_rsd(spark, sf_dir):
    ev = _docs(spark, sf_dir)
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.06 * r["exact"]), r


def test_percentile_approx_within_accuracy(spark, sf_dir):
    ev = _docs(spark, sf_dir)
    row = ev.select(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
    ).first()
    # GK sketch with accuracy=10000 -> rank error <= n/10000; translate
    # to a loose value tolerance via the empirical value range
    lo, hi = ev.select(F.min("value"), F.max("value")).first()
    assert abs(row["approx"] - row["exact"]) <= 0.01 * (hi - lo)


def test_sketches_are_partitioning_invariant_enough(spark, sf_dir):
    """The sketch must give the SAME answer under repartitioning (it is
    a deterministic merge of per-partition sketches only if the merge
    is order-insensitive — HLL++ register-max is)."""
    ev = _docs(spark, sf_dir)
    a = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    b = (
        ev.repartition(17, "event_type")
        .select(F.approx_count_distinct("user_id", rsd=0.02))
        .first()[0]
    )
    assert a == b
