"""Tests for median-of-means, blocking quality and position debiasing."""

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_median_of_means_structure(spark, sf_dir):
    rows = sorted(
        QUERIES["median_of_means"](spark, sf_dir).collect(),
        key=lambda r: r["bucket_mean"],
    )
    assert len(rows) == 16
    assert sum(r["is_median_bucket"] for r in rows) == 2
    mids = [r for r in rows if r["is_median_bucket"]]
    mom = rows[0]["mom"]
    assert all(abs(r["mom"] - mom) < 1e-9 for r in rows)
    assert abs(
        mom - (mids[0]["bucket_mean"] + mids[1]["bucket_mean"]) / 2
    ) < 2e-6
    # MoM sits inside the bucket-mean range
    assert rows[0]["bucket_mean"] <= mom <= rows[-1]["bucket_mean"]


def test_blocking_quality_recompute(spark, sf_dir):
    r = QUERIES["blocking_quality"](spark, sf_dir).collect()[0]
    n_docs = load_table(spark, sf_dir, "documents").count()
    n_dups = len(
        [1 for i in range(n_docs) if i % 7 == 0]
    )
    assert r["n_records"] == n_docs + n_dups
    assert r["n_true"] == n_dups
    # injected dups share identical text, hence identical prefix block
    assert r["n_found"] == r["n_true"]
    assert abs(r["pairs_completeness"] - 1.0) < 1e-9
    assert 0.9 < r["reduction_ratio"] < 1.0
    assert r["cand_pairs"] < r["all_pairs"]


def test_position_debias_conservation(spark, sf_dir):
    rows = QUERIES["position_debias_ctr"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["raw_ctr"] <= 1
        assert r["debiased_ctr"] >= 0
        assert r["n_click"] <= r["n_imp"]
    # with value-threshold clicks the raw rate is ~P(value >= 50)
    pooled = sum(r["n_click"] for r in rows) / sum(
        r["n_imp"] for r in rows
    )
    assert 0.2 < pooled < 0.8
