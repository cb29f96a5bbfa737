"""Transcript-table sources.

Primary input (BASELINE.json input_hint): an Iceberg table
``transcripts(conv_id, turn_idx, role, text, tool, ts)``. The sandbox has
no Iceberg runtime jar, so ``read_transcripts`` tries the catalog table
first and falls back to parquet — same schema, same downstream plan
(SURVEY.md §7 "Iceberg in sandbox" note).

``transcripts_from_events`` derives a deterministic transcript table from
the driver-provided ``events`` parquet (TESTDATA.md) so the KG pipeline
can be correctness-gated against a DuckDB oracle on shared inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ALIAS_DICT_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("parent_id", T.StringType(), True),
    ]
)


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """``source``: catalog table name (Iceberg when configured) or a
    parquet path."""
    if os.path.exists(source) or source.endswith(".parquet"):
        return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(source)
    return spark.read.table(source)


def read_transcripts_jsonl(spark: SparkSession, source: str) -> DataFrame:
    """S1 widening: the same transcript table from JSONL exports (the
    common interchange form of conversation logs). Schema applied
    explicitly — inferSchema on a 100 TB JSONL lake is a full extra
    pass — and timestamps parsed from ISO-8601 strings. Rows failing
    the schema land as all-NULL conv_id and flow to the pipeline's
    quarantine lineage, matching the parquet path's contract."""
    raw = spark.read.schema(
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    ).json(source)
    return raw.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.to_timestamp("ts").alias("ts"),
    )


def read_alias_dict(spark: SparkSession, source: str) -> DataFrame:
    if os.path.exists(source) or source.endswith(".parquet"):
        return spark.read.schema(ALIAS_DICT_SCHEMA).parquet(source)
    return spark.read.table(source)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcript derivation from the shared ``events``
    table (one conversation per user, turns ordered by ts).

    Every expression here has an exact ANSI-SQL twin in
    ``__spark_entry__.oracle_sql`` — keep the two in lockstep.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_type") == "error", F.lit("tool"))
        .when(F.col("event_type") == "purchase", F.lit("assistant"))
        .otherwise(F.lit("user"))
        .alias("role"),
        F.concat(
            F.lit("evt "),
            F.col("event_type"),
            F.lit(" <<m:"),
            F.col("event_type"),
            (F.floor(F.col("value")).cast("long") % 5).cast("string"),
            F.lit(">>"),
        ).alias("text"),
        F.when(F.col("event_type") == "error", F.lit("search"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.col("ts"),
    )


def alias_dict_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary over the derived mention vocabulary
    (event_type x digit 0..4), with linear parent chains per event_type:
    digit d>0 points at digit d-1 — so the canonical entity of every
    chain is closed-form ``E_<type>0`` (what the SQL oracle uses) while
    the Spark side resolves it with real distributed CC."""
    ev = load_table(spark, sf_dir, "events").select("event_type").distinct()
    digits = spark.range(5).select(F.col("id").cast("int").alias("d"))
    return ev.crossJoin(digits).select(
        F.concat(F.col("event_type"), F.col("d").cast("string")).alias("alias"),
        F.concat(F.lit("E_"), F.col("event_type"), F.col("d").cast("string")).alias(
            "entity_id"
        ),
        F.lit("entity").alias("entity_type"),
        F.when(
            F.col("d") > 0,
            F.concat(
                F.lit("E_"), F.col("event_type"), (F.col("d") - 1).cast("string")
            ),
        ).alias("parent_id"),
    )
