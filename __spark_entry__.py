"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship transcript->KG pipeline on sf0.001.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 +
  training-data operator families) — see gfftoneo4j_spark/queries.py.
- ``oracle_sql()``: exact DuckDB twins for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gfftoneo4j_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full
    extract -> link -> canonicalize -> materialize pipeline, PERSISTED
    through the graph sink (K1/K2: partitioned nodes/edges parquet,
    dedup-on-write, manifest-last) and read back — the returned triples
    come from the durable graph, not the in-flight plan."""
    from gfftoneo4j_spark.plans.graph_sink import read_graph, write_graph
    from gfftoneo4j_spark.plans.pipeline import build_kg
    from gfftoneo4j_spark.sources.transcripts import (
        alias_dict_from_events,
        transcripts_from_events,
    )

    sf_dir = "/root/testdata/sf0.001"
    res = build_kg(
        spark,
        transcripts_from_events(spark, sf_dir),
        alias_dict_from_events(spark, sf_dir),
    )
    # per-application output path: concurrent driver runs must not race
    # on one shared directory (one would read the other's half-
    # overwritten tables)
    out = f"/tmp/kg_entry_graph_{spark.sparkContext.applicationId}"
    write_graph(res.nodes, res.edges, out, fingerprint=sf_dir)
    return read_graph(spark, out).triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
