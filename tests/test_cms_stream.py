"""Streaming Count-Min: stream==batch parity, restart on checkpoint,
and replay idempotence via batch-id-keyed OVERWRITE (the additive-
algebra half of the exactly-once design space — contrast
test_streaming_sketch.py's min-algebra half)."""

from __future__ import annotations

import os
import shutil

from gfftoneo4j_spark.operators.sketches import countmin_counters
from gfftoneo4j_spark.streaming.cms_stream import (
    read_countmin_counters,
    stream_countmin,
)


def _tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from gfftoneo4j_spark.sources.transcripts import load_table

    return load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("token")
    )


def _cells(df):
    return sorted(map(tuple, df.collect()))


def test_stream_cms_matches_batch_across_restart(spark, sf_dir, tmp_path):
    tok = _tokens(spark, sf_dir)
    src = str(tmp_path / "src")
    tok.repartition(4).write.parquet(src)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    assert len(files) >= 2

    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")

    def start():
        stream = (
            spark.readStream.schema(tok.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_in)
        )
        return stream_countmin(stream, "token", state, ck)

    for f in files[: len(files) // 2]:
        shutil.copy(os.path.join(src, f), stream_in)
    q = start()
    q.awaitTermination()
    for f in files[len(files) // 2:]:
        shutil.copy(os.path.join(src, f), stream_in)
    q2 = start()
    q2.awaitTermination()

    got = _cells(read_countmin_counters(spark, state))
    want = _cells(countmin_counters(tok, "token"))
    assert got == want  # exact parity: same cells, same counts


def test_replayed_batch_overwrites_not_doubles(spark, sf_dir, tmp_path):
    tok = _tokens(spark, sf_dir)
    state = str(tmp_path / "state")
    part = countmin_counters(tok, "token")
    # a batch writes its own partition dir
    part.write.mode("overwrite").parquet(f"{state}/batch_id=0")
    before = _cells(read_countmin_counters(spark, state))
    # exactly-once failure simulation: the SAME batch id re-runs;
    # addition would double every cell, overwrite replaces instead
    part.write.mode("overwrite").parquet(f"{state}/batch_id=0")
    after = _cells(read_countmin_counters(spark, state))
    assert after == before
    # a genuinely NEW batch does add
    part.write.mode("overwrite").parquet(f"{state}/batch_id=1")
    doubled = {
        (j, pos): n for j, pos, n in _cells(read_countmin_counters(spark, state))
    }
    for j, pos, n in before:
        assert doubled[(j, pos)] == 2 * n
