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
    extract -> link -> canonicalize -> materialize pipeline."""
    return QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
