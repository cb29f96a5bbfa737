"""Semantic invariants of the CDC merge operator (operators/upsert.py).

The gated `cdc_upsert` query proves hash parity with the SQL twin on a
version-unique corpus; these tests pin the conflict-resolution rules
the gate never exercises (version ties, late-arriving deletes losing
to newer base rows, duplicate keys in both inputs).
"""

from __future__ import annotations

from pyspark.sql import Row

from gfftoneo4j_spark.operators.upsert import merge_latest


def _merge(spark, base_rows, chg_rows, op_col="op"):
    base = spark.createDataFrame(base_rows, "k string, v long, val double")
    chg = spark.createDataFrame(
        chg_rows, "k string, v long, val double, op string"
    )
    out = merge_latest(base, chg, ["k"], "v", op_col=op_col)
    return {r["k"]: (r["v"], r["val"]) for r in out.collect()}


def test_update_wins_on_higher_version(spark):
    got = _merge(
        spark,
        [("a", 1, 1.0), ("b", 1, 2.0)],
        [("a", 2, 9.0, "U")],
    )
    assert got == {"a": (2, 9.0), "b": (1, 2.0)}


def test_stale_update_loses_to_newer_base(spark):
    got = _merge(spark, [("a", 5, 1.0)], [("a", 3, 9.0, "U")])
    assert got == {"a": (5, 1.0)}


def test_delete_tombstone_drops_key(spark):
    got = _merge(
        spark,
        [("a", 1, 1.0), ("b", 1, 2.0)],
        [("a", 2, 0.0, "D")],
    )
    assert got == {"b": (1, 2.0)}


def test_stale_delete_does_not_drop(spark):
    got = _merge(spark, [("a", 5, 1.0)], [("a", 3, 0.0, "D")])
    assert got == {"a": (5, 1.0)}


def test_version_tie_breaks_toward_change_batch(spark):
    got = _merge(spark, [("a", 2, 1.0)], [("a", 2, 9.0, "U")])
    assert got == {"a": (2, 9.0)}


def test_multirow_base_and_batch_collapse_to_latest(spark):
    got = _merge(
        spark,
        [("a", 1, 1.0), ("a", 4, 4.0)],
        [("a", 2, 2.0, "U"), ("a", 3, 3.0, "U")],
    )
    assert got == {"a": (4, 4.0)}


def test_insert_only_batch_without_op_col(spark):
    base = spark.createDataFrame([("a", 1, 1.0)], "k string, v long, val double")
    chg = spark.createDataFrame([("c", 1, 3.0)], "k string, v long, val double")
    out = merge_latest(base, chg, ["k"], "v")
    assert {r["k"]: r["val"] for r in out.collect()} == {"a": 1.0, "c": 3.0}


def test_deterministic_under_repartition(spark):
    base_rows = [(f"k{i % 17}", i, float(i)) for i in range(200)]
    chg_rows = [
        (f"k{i % 17}", i + 100, float(-i), "D" if i % 5 == 0 else "U")
        for i in range(100)
    ]
    base = spark.createDataFrame(base_rows, "k string, v long, val double")
    chg = spark.createDataFrame(
        chg_rows, "k string, v long, val double, op string"
    )
    a = sorted(map(tuple, merge_latest(base, chg, ["k"], "v", "op").collect()))
    b = sorted(
        map(
            tuple,
            merge_latest(
                base.repartition(13), chg.repartition(3), ["k"], "v", "op"
            ).collect(),
        )
    )
    assert a == b


def test_null_field_ties_break_deterministically(spark):
    # exact version+side tie between ('x', NULL) and (NULL, 'x')
    # payloads: concat_ws SKIPS nulls, so without the \x00 sentinel
    # both rows hash identically and the survivor is partition-order
    # luck; with it the greatest-hash rule is well defined
    schema = "k string, v long, c1 string, c2 string"
    chg = [("a", 2, "x", None), ("a", 2, None, "x")]
    base = spark.createDataFrame([("a", 1, "old", "old")], schema)
    outs = set()
    for parts in (1, 3, 7):
        c = spark.createDataFrame(chg, schema).repartition(parts)
        r = merge_latest(base, c, ["k"], "v").collect()
        assert len(r) == 1
        outs.add((r[0]["c1"], r[0]["c2"]))
    assert len(outs) == 1  # same winner under every physical layout


def test_scd2_history_intervals_chain_and_flag_current(spark):
    from gfftoneo4j_spark.operators.upsert import scd2_history

    ch = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, 2.0), ("a", 30, 3.0), ("b", 5, 9.0)],
        "k string, v long, val double",
    )
    out = {
        (r["k"], r["v"]): r
        for r in scd2_history(ch, ["k"], "v").collect()
    }
    # intervals chain: each valid_to equals the next valid_from
    assert out[("a", 10)]["valid_from"] == 10
    assert out[("a", 10)]["valid_to"] == 20
    assert out[("a", 20)]["valid_to"] == 30
    assert out[("a", 30)]["valid_to"] is None
    # exactly the per-key newest row is current
    assert [k for k, r in out.items() if r["is_current"]] in (
        [("a", 30), ("b", 5)], [("b", 5), ("a", 30)],
    )
    assert out[("b", 5)]["is_current"] is True


def test_scd2_exact_version_duplicates_order_by_tie_cols(spark):
    from gfftoneo4j_spark.operators.upsert import scd2_history

    ch = spark.createDataFrame(
        [("a", 10, 2.0), ("a", 10, 1.0)], "k string, v long, val double"
    )
    out = sorted(
        scd2_history(ch, ["k"], "v").collect(), key=lambda r: r["val"]
    )
    # default ties = remaining payload cols: val asc -> 1.0 precedes 2.0
    assert out[0]["val"] == 1.0 and out[0]["valid_to"] == 10
    assert out[1]["val"] == 2.0 and out[1]["is_current"] is True
