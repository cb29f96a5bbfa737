"""Physical-plan shape regression tests.

The scale story lives in the PLAN, not just the results: these tests
freeze the properties that make the pipeline 100-TB-viable so a future
refactor can't silently reintroduce a third full shuffle, a sort-merge
join of the mention table, or a dropped filter pushdown.
"""

import re

import pytest

from gfftoneo4j_spark.queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def triples_plan(spark, sf_dir):
    return _plan(QUERIES["kg_triples"](spark, sf_dir))


def test_pipeline_has_exactly_two_wide_exchanges(triples_plan):
    """The ONLY full-data shuffles are the two per-conversation windows
    (turn pass + mention pass); every edge family rides one of them."""
    n = len(re.findall(r"Exchange hashpartitioning\(conv_id", triples_plan))
    assert n == 2, f"expected 2 conv_id exchanges, plan has {n}"


def test_pipeline_linking_is_broadcast_not_sortmerge(triples_plan):
    """The alias dictionary / canonical map are broadcast: the mention
    table must never shuffle for the join (J1/J2's in-memory index,
    GeneReader.scala:43-56)."""
    assert "BroadcastHashJoin" in triples_plan
    assert "SortMergeJoin" not in triples_plan
    assert "ShuffledHashJoin" not in triples_plan


def test_pipeline_no_global_edge_dedup(triples_plan):
    """Edge uniqueness comes from in-window key dedup, not a corpus-wide
    dropDuplicates (measured hottest operator before removal)."""
    # a global dedup would appear as HashAggregate on (src, dst, type)
    assert not re.search(r"HashAggregate\(keys=\[src[^\]]*dst", triples_plan)


def test_sql_extraction_plan_is_pure_jvm(spark, sf_dir):
    from gfftoneo4j_spark.plans.pipeline import build_kg
    from gfftoneo4j_spark.sources.transcripts import (
        alias_dict_from_events,
        transcripts_from_events,
    )

    t = transcripts_from_events(spark, sf_dir)
    d = alias_dict_from_events(spark, sf_dir)
    plan = _plan(build_kg(spark, t, d, extraction="sql").triples)
    assert "EvalPython" not in plan  # no Python workers anywhere
    plan_pd = _plan(build_kg(spark, t, d, extraction="pandas").triples)
    assert "ArrowEvalPython" in plan_pd  # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in plan_pd


def test_scan_filter_pushdown(spark, sf_dir):
    """Filters must reach the parquet scan (SURVEY §4: predicate
    pushdown is free only if the plan stays declarative)."""
    plan = _plan(QUERIES["scan_project_filter"](spark, sf_dir))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "no filters pushed to the scan"


def test_scan_column_pruning(spark, sf_dir):
    """A projection query must not read unused columns (ReadSchema)."""
    plan = _plan(QUERIES["scan_project_filter"](spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m is not None
    read_cols = m.group(1)
    # the query touches 4 of lineitem's 11 columns; the rest are pruned
    for unused in ("l_partkey", "l_quantity", "l_shipdate", "l_tax"):
        assert unused not in read_cols


def test_kfold_snake_no_global_user_rank(spark, sf_dir):
    """group_kfold_snake (r06): the per-user activity rank must not be
    a single-partition row_number over ALL users — fold aggregates come
    from the bucket-offset two-phase rank blocks. The only remaining
    windows are the <=32-row bucket-offset window, the bucket-local
    running sum (hash-partitioned by bucket), and the 5-row balance
    report."""
    plan = _plan(QUERIES["group_kfold_snake"](spark, sf_dir))
    assert "row_number" not in plan, "global per-user rank reintroduced"
    assert re.search(r"hashpartitioning\(bucket", plan), (
        "bucket-local running sum window missing"
    )
