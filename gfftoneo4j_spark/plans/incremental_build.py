"""Incremental KG construction: merge a NEW transcript batch into the
persisted graph as a fresh snapshot.

The reference is single-shot batch (Application.scala:29-54: parse one
file, load one graph); a production KG ingests transcript batches
continuously. The correctness argument for incrementality: extraction
and linking are per-turn, sequence edges are per-conversation, and
canonicalization depends only on the (static) alias dictionary — so
for conversation-disjoint batches,
``triples(A ∪ B) = triples(A) ∪ triples(B)``, and merging batch
results under the sink's create-unique dedup reproduces the full
rebuild EXACTLY (pytest-proven in tests/test_incremental_build.py).

Scale shape: each increment costs O(|new batch|) pipeline work plus
one union with the previous snapshot's tables at write (the sink's
dedup shuffle — keyed the same as the write layout). The previous
snapshot is parquet already on disk; nothing historical recomputes.
Commits ride write_graph_snapshot, so readers of older snapshots are
undisturbed and a crashed increment is invisible (atomic pointer
swap, torn dirs skipped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gfftoneo4j_spark.plans.graph_sink import (
    read_graph_snapshot,
    write_graph_snapshot,
)
from gfftoneo4j_spark.plans.pipeline import build_kg


def build_kg_incremental(
    spark: SparkSession,
    new_transcripts: DataFrame,
    alias_dict: DataFrame,
    path: str,
    fingerprint: str = "increment",
    extraction: str = "sql",
    strict: bool = False,
    lineage_out: str | None = None,
) -> dict:
    """Run the pipeline over ``new_transcripts`` only, merge with the
    current snapshot (if any), and commit the union as a new snapshot.
    Returns the commit manifest entry ({'version': N, ...}).

    ``strict`` forwards the reference's fail-fast mode to the per-batch
    build_kg (an unparseable row aborts the increment BEFORE anything
    is committed — the snapshot pointer never moves, so a strict
    failure is invisible to readers). ``lineage_out`` writes this
    batch's lineage/metrics parquet next to the commit."""
    res = build_kg(
        spark, new_transcripts, alias_dict, extraction=extraction, strict=strict
    )
    if lineage_out:
        res.lineage.write.mode("overwrite").parquet(f"{lineage_out}/lineage")
        res.metrics.write.mode("overwrite").parquet(f"{lineage_out}/metrics")
    nodes, edges = res.nodes, res.edges
    try:
        cur = read_graph_snapshot(spark, path)
        nodes = cur.nodes.select(*nodes.columns).unionByName(nodes)
        edges = cur.edges.select(*edges.columns).unionByName(edges)
    except FileNotFoundError:
        pass  # first increment: nothing to merge
    return write_graph_snapshot(nodes, edges, path, fingerprint=fingerprint)
