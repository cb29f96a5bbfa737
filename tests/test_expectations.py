"""Data-quality expectation semantics + the one-scan plan guarantee."""

from __future__ import annotations

from pyspark.sql import Row

from gfftoneo4j_spark.operators import expectations as DQ


def _df(spark):
    rows = [
        Row(id=1, kind="click", score=5.0),
        Row(id=2, kind=None, score=50.0),        # null kind
        Row(id=3, kind="view", score=-1.0),      # out of range
        Row(id=3, kind="BAD!", score=None),      # dup id + bad set/pattern
        Row(id=4, kind="view", score=200.0),     # out of range (hi=100)
    ]
    return spark.createDataFrame(rows)


def test_violation_counts(spark):
    out = DQ.check_expectations(
        _df(spark),
        [
            DQ.not_null("kind"),
            DQ.in_range("score", 0.0, 100.0),
            DQ.in_set("kind", ("click", "view")),
            DQ.matches("kind", "^[a-z]+$"),
            DQ.unique("id"),
        ],
    )
    got = {r["check_name"]: (r["n_violations"], r["passed"]) for r in out.collect()}
    assert got == {
        "not_null_kind": (1, False),
        "in_range_score": (2, False),   # -1.0 and 200.0; NULL not counted
        "in_set_kind": (1, False),      # BAD! (NULL kind not counted)
        "matches_kind": (1, False),
        "unique_id": (1, False),
    }


def test_all_pass_on_clean_table(spark):
    clean = spark.createDataFrame(
        [Row(id=i, kind="click", score=float(i)) for i in range(10)]
    )
    out = DQ.check_expectations(
        clean,
        [DQ.not_null("kind"), DQ.in_range("score", 0.0, 100.0), DQ.unique("id")],
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_n_checks_one_scan(spark, tmp_path):
    """Six checks must still read the input exactly once."""
    p = str(tmp_path / "t")
    _df(spark).write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        DQ.check_expectations(
            df,
            [
                DQ.not_null("kind"),
                DQ.in_range("score", 0.0, 100.0),
                DQ.in_set("kind", ("click", "view")),
                DQ.matches("kind", "^[a-z]+$"),
                DQ.unique("id"),
                DQ.not_null("id"),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1, plan


def test_schema_diff(spark):
    from gfftoneo4j_spark.operators.expectations import schema_diff

    old = spark.createDataFrame([], "a int, b string, c double")
    new = spark.createDataFrame([], "b string, c string, d boolean")
    got = schema_diff(old, new)
    assert got == [
        {"op": "added", "column": "d", "type": "boolean"},
        {"op": "removed", "column": "a", "type": "int"},
        {"op": "type_changed", "column": "c", "from": "double", "to": "string"},
    ]
    assert schema_diff(old, old) == []
