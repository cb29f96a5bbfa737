"""Tests for Q13 count-of-counts, Q22 dormant customers and the
DAU/WAU stickiness ratio."""

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_custdist_partitions_customers(spark, sf_dir):
    rows = QUERIES["custdist_q13"](spark, sf_dir).collect()
    assert rows
    n_cust = load_table(spark, sf_dir, "customer").count()
    n_ord = load_table(spark, sf_dir, "orders").count()
    # every customer lands in exactly one count class
    assert sum(r["custdist"] for r in rows) == n_cust
    # and the classes weighted by k reproduce the orders table
    assert sum(r["c_count"] * r["custdist"] for r in rows) == n_ord


def test_dormant_q22_recompute(spark, sf_dir):
    rows = QUERIES["dormant_customers_q22"](spark, sf_dir).collect()
    assert rows
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    ab = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(F.avg(F.col("c_acctbal").cast("decimal(18,2)")))
        .collect()[0][0]
    )
    recent = {
        r["o_custkey"]
        for r in orders.where(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
        .collect()
    }
    cand = [
        r
        for r in cust.collect()
        if round(r["c_acctbal"], 2) > float(ab)
        and r["c_custkey"] not in recent
    ]
    assert sum(r["numcust"] for r in rows) == len(cand)


def test_stickiness_bounds_and_warmup(spark, sf_dir):
    rows = sorted(
        QUERIES["stickiness_ratio"](spark, sf_dir).collect(),
        key=lambda r: r["day_num"],
    )
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"]
        assert 0 < r["stickiness"] <= 1.0 + 1e-9
    # the first observed day has no history: WAU == DAU there
    assert rows[0]["wau"] == rows[0]["dau"]
    assert abs(rows[0]["stickiness"] - 1.0) < 1e-9
