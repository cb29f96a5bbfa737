"""Mixture-sampling invariants: zero-shuffle plan, determinism,
rate-proportional stratum sizes."""

from __future__ import annotations

from gfftoneo4j_spark.queries import QUERIES


def test_mixture_sample_no_exchange(spark, sf_dir):
    df = QUERIES["mixture_sample"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_mixture_sample_deterministic_subset(spark, sf_dir):
    a = {r["doc_id"] for r in QUERIES["mixture_sample"](spark, sf_dir).collect()}
    b = {r["doc_id"] for r in QUERIES["mixture_sample"](spark, sf_dir).collect()}
    assert a == b


def test_mixture_sample_rates_track(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    sample = QUERIES["mixture_sample"](spark, sf_dir).collect()
    kept: dict[str, int] = {}
    rates: dict[str, float] = {}
    for r in sample:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
        rates[r["lang"]] = r["rate"]
    for lang, n_kept in kept.items():
        expect = rates[lang] * totals[lang]
        # 4-sigma binomial envelope (small strata at sf0.001)
        sigma = max(1.0, (totals[lang] * rates[lang] * (1 - rates[lang])) ** 0.5)
        assert abs(n_kept - expect) <= 4 * sigma, (lang, n_kept, expect)
