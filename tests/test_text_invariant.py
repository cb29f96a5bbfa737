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


def test_char_entropy_bounds_and_uniform_case(spark):
    from gfftoneo4j_spark.queries import QUERIES  # noqa: F401  (idiom)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abab"), (2, "abcd")], "doc_id long, text string"
    )
    chars = df.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).where(F.col("ch") != "")
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.groupBy("doc_id").agg(F.sum("n").alias("total"))
    p = F.col("n") / F.col("total")
    out = {
        r["doc_id"]: r
        for r in hist.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"))
        .collect()
    }
    # constant string: 0 bits; 2 symbols uniform: 1 bit; 4 uniform: 2
    assert out[0]["entropy_bits"] == 0.0
    assert out[1]["entropy_bits"] == 1.0
    assert out[2]["entropy_bits"] == 2.0
