"""Statistical / structural guarantees for the round-4 batch that the
SQL-twin gate can't express: the Misra-Gries candidate superset bound
(heavy_hitters), bipartite fanout capping (bipartite_projection), MAD
robustness to the outliers it is meant to flag (mad_anomaly), and the
no-window plan shape of intra_conv_dedup."""

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.graph import bipartite_project
from gfftoneo4j_spark.operators.sketches import misra_gries_candidates


def _skewed(spark):
    # key 0: 2000 rows; keys 1..50: 40 rows each; tail: 4000 uniques
    head = spark.range(2000).select(F.lit(0).alias("k"))
    mid = spark.range(50 * 40).select(
        (F.col("id") % 50 + 1).cast("long").alias("k")
    )
    tail = spark.range(4000).select((F.col("id") + 1000).alias("k"))
    return head.unionAll(mid).unionAll(tail).repartition(8)


def test_misra_gries_candidates_superset_and_bounded(spark):
    df = _skewed(spark)
    n = df.count()
    k = 64
    cand = misra_gries_candidates(df, "k", k=k)
    rows = cand.collect()
    # every key with true freq > n/(k+1) must appear in the union
    exact = {
        r["k"]: r["c"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    heavy = {kk for kk, c in exact.items() if c > n / (k + 1)}
    got = {r["k"] for r in rows}
    assert heavy <= got
    # summary stays bounded: at most k counters per partition
    assert len(rows) <= df.rdd.getNumPartitions() * k


def test_misra_gries_partition_invariant_recount(spark):
    df = _skewed(spark)
    n = df.count()
    thresh = int(n * 0.02)

    def run(d):
        cand = misra_gries_candidates(d, "k", k=64).select("k").distinct()
        out = (
            d.join(F.broadcast(cand), "k", "left_semi")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= thresh)
        )
        return sorted((r["k"], r["cnt"]) for r in out.collect())

    a = run(df)
    b = run(df.repartition(3))
    assert a == b
    # and the final answer is the exact heavy-hitter set
    exact = sorted(
        (r["k"], r["c"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= thresh)
        .collect()
    )
    assert a == exact


def test_bipartite_project_weights_and_cap(spark):
    rows = (
        [("l1", r) for r in ["a", "b", "c"]]
        + [("l2", r) for r in ["a", "b"]]
        + [("l3", r) for r in ["a", "b"]]
    )
    df = spark.createDataFrame(rows, "l string, r string")
    out = {
        (r["r1"], r["r2"]): r["w"]
        for r in bipartite_project(df, "l", "r", cap=5, min_weight=2).collect()
    }
    assert out == {("a", "b"): 3}  # (a,c),(b,c) have weight 1, dropped
    # cap: a hub with 10 members contributes only C(5,2) = 10 pairs
    hub = spark.createDataFrame(
        [("h", f"r{i:02d}") for i in range(10)], "l string, r string"
    )
    pairs = bipartite_project(hub, "l", "r", cap=5, min_weight=1)
    assert pairs.count() == 10
    # and only among the first 5 right ids in rank order
    assert pairs.where(F.col("r2") > "r04").count() == 0


def test_mad_flags_injected_outlier_not_inliers(spark, sf_dir):
    from gfftoneo4j_spark.queries import QUERIES

    out = QUERIES["mad_anomaly"](spark, sf_dir)
    flagged = out.collect()
    assert len(flagged) > 0
    # every flagged row really is > 3 MAD-sigmas out
    assert all(r["robust_z"] > 3.0 for r in flagged)


def test_intra_conv_dedup_plan_has_no_window(spark, sf_dir):
    from gfftoneo4j_spark.queries import QUERIES

    def n_windows(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Window"
        )

    # the transcript derivation itself carries one turn-ordering
    # window; the dedup must add ZERO more — first-occurrence selection
    # is the combinable min(struct) aggregation, never a
    # per-(conv,text) sort window
    base = n_windows(QUERIES["kg_transcripts"](spark, sf_dir))
    assert n_windows(QUERIES["intra_conv_dedup"](spark, sf_dir)) == base
