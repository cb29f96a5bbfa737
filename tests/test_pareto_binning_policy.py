"""Brute-force parity and invariants for pareto_frontier /
equi_depth_binning / doc_quality_composite beyond the SQL-twin gate
(the gate already pins cross-engine equality; these pin the algorithmic
claims against independent in-test recomputations)."""

from pyspark.sql import Window, functions as F

from gfftoneo4j_spark.queries import QUERIES


def test_pareto_matches_bruteforce(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    pts = [
        (r["doc_id"], r["x"], r["y"])
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.col("n_chars").alias("x"),
            F.size(F.array_distinct(F.split(F.trim("text"), " ")))
            .cast("long")
            .alias("y"),
        )
        .collect()
    ]
    brute = {
        (i, x, y)
        for i, x, y in pts
        if not any(
            (x2 >= x and y2 > y) or (x2 > x and y2 >= y)
            for _, x2, y2 in pts
        )
    }
    got = {
        (r["doc_id"], r["x"], r["y"])
        for r in QUERIES["pareto_frontier"](spark, sf_dir).collect()
    }
    assert got == brute
    # a frontier is mutually non-dominating by construction
    assert all(
        not ((x2 >= x and y2 > y) or (x2 > x and y2 >= y))
        for (_, x, y) in got
        for (_, x2, y2) in got
    )


def test_equi_depth_matches_spark_ntile(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    want = sorted(
        tuple(r)
        for r in ev.select(
            "value", F.ntile(10).over(w).cast("long").alias("tile")
        )
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_v"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
        )
        .collect()
    )
    got = sorted(
        tuple(r) for r in QUERIES["equi_depth_binning"](spark, sf_dir).collect()
    )
    assert got == want
    # remainder rule: tile sizes differ by at most 1, leading tiles big
    sizes = [r[1] for r in got]  # sorted by tile
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)


def test_doc_policy_keep_iff_no_reasons(spark, sf_dir):
    rows = QUERIES["doc_quality_composite"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (r["reasons"] == ""), r
    kept = sum(1 for r in rows if r["keep"])
    # the policy must actually split the corpus, not rubber-stamp it
    assert 0 < kept < len(rows)
