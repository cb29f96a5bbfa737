"""Plan-shape guards for the at-scale read paths: partition pruning on
the persisted graph, schema evolution on the transcript source, and
AQE skew-join splitting on a hot-key join.

These freeze the claims README's scale-design section makes: a
type-filtered edge read must prune directories (not scan 100 TB and
filter), an old reader must survive a producer adding columns, and a
zipfian join key must be split by AQE rather than serializing one
straggler task.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gfftoneo4j_spark.plans.graph_sink import read_graph, write_graph


def _write_small_graph(spark, out):
    nodes = spark.createDataFrame(
        [(f"n{i}", "turn" if i % 2 else "entity", "p") for i in range(40)],
        "node_id string, label string, props string",
    )
    edges = spark.createDataFrame(
        [
            (f"n{i}", f"n{i+1}", "next_turn" if i % 3 else "has_mention")
            for i in range(39)
        ],
        "src string, dst string, type string",
    )
    write_graph(nodes, edges, out, fingerprint="guards")


def test_edge_type_read_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "graph")
    _write_small_graph(spark, out)
    g = read_graph(spark, out)
    plan = (
        g.edges.where(F.col("type") == "next_turn")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the type predicate must land in PartitionFilters (directory
    # pruning), not PushedFilters (row-group filtering after listing)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "type" in pf, f"partition filter missing: {pf!r}"


def test_schema_evolution_reader_survives_added_column(spark, tmp_path):
    """Producer adds a column mid-stream: readers with mergeSchema see
    the union schema with NULLs backfilled; old columns keep working."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [("c1", 0, "hi")], "conv_id string, turn_idx int, text string"
    ).write.parquet(d + "/batch=1")
    spark.createDataFrame(
        [("c2", 0, "yo", "search")],
        "conv_id string, turn_idx int, text string, tool string",
    ).write.parquet(d + "/batch=2")
    df = spark.read.option("mergeSchema", True).parquet(d)
    rows = {r["conv_id"]: r for r in df.collect()}
    assert set(df.columns) >= {"conv_id", "turn_idx", "text", "tool"}
    assert rows["c1"]["tool"] is None
    assert rows["c2"]["tool"] == "search"


def test_aqe_splits_skewed_join(spark, tmp_path):
    """One key holding ~90% of the fact side must be split by AQE's
    skew-join handling into multiple tasks instead of one straggler."""
    fact_dir, dim_dir = str(tmp_path / "fact"), str(tmp_path / "dim")
    n = 400_000
    (
        spark.range(n)
        # >=8 map blocks: AQE splits a skewed reduce partition at map-
        # output-block granularity, so a single-mapper shuffle would
        # leave nothing to split
        .repartition(8)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .write.mode("overwrite")
        .parquet(fact_dir)
    )
    (
        spark.createDataFrame(
            [("hot", 1)] + [(f"k{i}", i) for i in range(97)], "k string, w int"
        )
        .write.mode("overwrite")
        .parquet(dim_dir)
    )
    fact, dim = spark.read.parquet(fact_dir), spark.read.parquet(dim_dir)
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # forbid broadcast so the join shuffles, and lower the skew
        # thresholds so gate-scale data triggers the same machinery a
        # 100 TB hot key would
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # materialize the JOIN itself (skew splitting is skipped when
        # the join feeds another exchange, e.g. a groupBy, unless
        # forceOptimizeSkewedJoin is on — the terminal join is the
        # honest shape: at scale that's the join writing a sink)
        j = fact.join(dim, "k")
        ck = j.localCheckpoint(eager=True)
        assert ck.count() == n
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def test_merge_intervals_is_single_shuffle(spark):
    # both windows (running max-end flag, island sum) and the final
    # groupBy(key, island) cluster on a superset of the window key, so
    # Spark satisfies them all from ONE hash exchange on `key` — the
    # docstring's one-shuffle claim, frozen
    from gfftoneo4j_spark.operators.windows import merge_intervals

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = spark.createDataFrame(
            [("a", 1, 5), ("a", 3, 9), ("b", 1, 2)],
            "k string, s long, e long",
        )
        out = merge_intervals(df, "k", start="s", end="e")
        assert _n_exchanges(out) == 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_doc_bigram_derivation_is_exchange_free(spark):
    # slices-zip-explode must stay map-only: any Exchange before the
    # first aggregation means the derivation re-shuffles the corpus
    from gfftoneo4j_spark.operators.lm import _doc_bigrams

    df = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    assert _n_exchanges(_doc_bigrams(df, "text", "doc_id")) == 0


def test_doc_chunking_stays_exchange_free_at_width_boundary(spark):
    from gfftoneo4j_spark.operators.cleaning import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(130)))],
        "doc_id long, text string",
    )
    assert _n_exchanges(chunk_documents(df, width=64, overlap=16)) == 0


def test_equi_depth_rank_windows_are_bucket_keyed(spark):
    """equi_depth_binning's whole point is replacing ntile's global
    sort: every Window in its physical plan must be keyed by the range
    bucket (bk), never an empty partition spec over the event rows."""
    from gfftoneo4j_spark.queries import QUERIES

    plan = (
        QUERIES["equi_depth_binning"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # the offsets window runs over the 32-row counts frame (allowed);
    # the per-row rank window must carry bk in its partition spec
    row_windows = [
        ln for ln in plan.splitlines() if "row_number" in ln
    ]
    assert row_windows
    assert all("bk" in ln for ln in row_windows), row_windows
    assert re.search(r"ntile", plan, re.I) is None


def test_pareto_finish_is_not_a_nested_loop_over_the_corpus(spark):
    """pareto_frontier's exact finish must be the bucket-co-partitioned
    equi-join over candidates — a BroadcastNestedLoopJoin/Cartesian
    over the full doc table would be the O(n^2) oracle smuggled into
    the engine."""
    from gfftoneo4j_spark.queries import QUERIES

    plan = (
        QUERIES["pareto_frontier"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the dominance join carries the bucket as an equi-key
    assert "bk" in plan


def test_heavy_hitters_recount_is_candidate_pruned(spark):
    """heavy_hitters' exact recount must probe a broadcast candidate
    set (semi join), never shuffle the full key space."""
    from gfftoneo4j_spark.queries import QUERIES

    plan = (
        QUERIES["heavy_hitters"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "Broadcast" in plan
