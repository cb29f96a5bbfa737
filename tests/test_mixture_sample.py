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


def test_ewma_hand_computed(spark):
    """k=8, alpha=0.5 on a 3-event stream: weights 1, .5, .25
    renormalized over available history."""
    from pyspark.sql import Row
    import datetime as dt

    rows = [
        Row(event_id=i, user_id=1, ts=dt.datetime(2026, 1, 1, 0, i), value=v)
        for i, v in enumerate([10.0, 20.0, 40.0])
    ]
    df = spark.createDataFrame(rows)
    # drive the same expression directly over the tiny frame
    from pyspark.sql import Window, functions as F
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num, den = F.lit(0.0), F.lit(0.0)
    for i in range(8):
        wt = float(0.5 ** i)
        lv = F.lag("value", i).over(w)
        num = num + F.coalesce(lv, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lv.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
    got = {
        r["event_id"]: r["e"]
        for r in df.select("event_id", F.round(num / den, 6).alias("e")).collect()
    }
    assert got[0] == 10.0                       # only itself
    assert got[1] == round((20 + 0.5 * 10) / 1.5, 6)
    assert got[2] == round((40 + 0.5 * 20 + 0.25 * 10) / 1.75, 6)
