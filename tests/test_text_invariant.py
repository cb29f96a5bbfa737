"""north_rule per-row invariant: per-turn TEXT EQUALITY under stable
(conv_id, turn_idx) ordering. The pipeline must never regenerate or
mutate turn text — it is carried or re-joined by key — and the
transcript derivation must be deterministic under re-execution and
repartitioning."""

from pyspark.sql import functions as F

from gfftoneo4j_spark.corpus import CorpusConfig, make_alias_dict, make_transcripts
from gfftoneo4j_spark.plans.pipeline import build_kg
from gfftoneo4j_spark.sources.transcripts import (
    ALIAS_DICT_SCHEMA,
    TRANSCRIPT_SCHEMA,
    transcripts_from_events,
)


def test_pipeline_preserves_turn_text(spark):
    cfg = CorpusConfig(n_conversations=40, seed=5)
    turns = make_transcripts(cfg)
    tdf = spark.createDataFrame(turns, TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(make_alias_dict(cfg), ALIAS_DICT_SCHEMA)
    res = build_kg(spark, tdf, ddf)

    # every surviving turn row carries its input text bit-for-bit
    joined = res.turns.alias("out").join(
        tdf.alias("inp"),
        (F.col("out.conv_id") == F.col("inp.conv_id"))
        & (F.col("out.turn_idx") == F.col("inp.turn_idx")),
    )
    mismatches = joined.where(
        F.col("out.text") != F.col("inp.text")
    ).count()
    assert mismatches == 0
    # nothing invented: kept + quarantined == input
    n_bad = tdf.where(
        F.col("text").isNull() | (F.col("text") == "") | F.col("turn_idx").isNull()
    ).count()
    assert res.turns.count() == tdf.count() - n_bad


def test_transcript_derivation_deterministic(spark, sf_dir):
    """The window-ranked derivation assigns the same (conv_id, turn_idx,
    text) regardless of physical partitioning — the stable-ordering
    half of the invariant."""
    a = transcripts_from_events(spark, sf_dir)
    b = transcripts_from_events(spark, sf_dir).repartition(17)
    rows_a = {(r["conv_id"], r["turn_idx"], r["text"]) for r in a.collect()}
    rows_b = {(r["conv_id"], r["turn_idx"], r["text"]) for r in b.collect()}
    assert rows_a == rows_b
    # turn_idx is a dense 0..n-1 rank within each conversation
    per_conv = (
        transcripts_from_events(spark, sf_dir)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("turn_idx").alias("lo"),
            F.max("turn_idx").alias("hi"),
            F.countDistinct("turn_idx").alias("nd"),
        )
    )
    bad = per_conv.where(
        (F.col("lo") != 0)
        | (F.col("hi") != F.col("n") - 1)
        | (F.col("nd") != F.col("n"))
    ).count()
    assert bad == 0
