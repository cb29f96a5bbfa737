"""Streaming register-min sketch: stream-vs-batch parity, replay
idempotence (exactly-once by the min algebra), restart across
checkpoints, and compaction neutrality."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.sketches import (
    register_min_distinct,
    register_partials,
)
from gfftoneo4j_spark.streaming.sketch_stream import (
    compact_sketch_state,
    read_sketch_estimate,
    stream_distinct_sketch,
)


def _events(spark, sf_dir):
    from gfftoneo4j_spark.sources.transcripts import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    )


def _est(df):
    return sorted(map(tuple, df.collect()))


def test_stream_sketch_matches_batch_and_restarts(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)  # 4 files -> multiple triggers
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    assert len(files) >= 2

    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")

    def start():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_in)
        )
        return stream_distinct_sketch(
            stream, ["event_type"], "user_id", state, ck
        )

    # phase 1: half the files
    for f in files[: len(files) // 2]:
        shutil.copy(os.path.join(src, f), stream_in)
    q = start()
    q.awaitTermination()

    # phase 2 (restart on the same checkpoint): the rest
    for f in files[len(files) // 2:]:
        shutil.copy(os.path.join(src, f), stream_in)
    q2 = start()
    q2.awaitTermination()

    got = _est(read_sketch_estimate(spark, state, ["event_type"]))
    want = _est(register_min_distinct(ev, ["event_type"], "user_id"))
    assert got == want  # exact parity, not approximate


def test_replayed_batch_is_absorbed(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    state = str(tmp_path / "state")
    part = register_partials(ev, ["event_type"], "user_id")
    part.write.mode("append").parquet(state)
    before = _est(read_sketch_estimate(spark, state, ["event_type"]))
    # simulate an exactly-once failure: the same batch appends AGAIN
    part.write.mode("append").parquet(state)
    after = _est(read_sketch_estimate(spark, state, ["event_type"]))
    assert before == after  # min is idempotent: replay changes nothing


def test_compaction_preserves_estimate_and_shrinks_state(
    spark, sf_dir, tmp_path
):
    ev = _events(spark, sf_dir)
    state = str(tmp_path / "state")
    part = register_partials(ev, ["event_type"], "user_id")
    for _ in range(3):
        part.write.mode("append").parquet(state)
    before = _est(read_sketch_estimate(spark, state, ["event_type"]))
    rows_before = spark.read.parquet(state).count()
    compact_sketch_state(spark, state, ["event_type"])
    after = _est(read_sketch_estimate(spark, state, ["event_type"]))
    rows_after = spark.read.parquet(state).count()
    assert after == before
    assert rows_after == rows_before // 3
    # compacted state is one row per (key, register)
    dup = (
        spark.read.parquet(state)
        .groupBy("event_type", "j")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .count()
    )
    assert dup == 0
