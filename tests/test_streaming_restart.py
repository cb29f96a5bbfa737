"""Kill-and-restart exactly-once for the stateful next_turn stream —
the streaming analogue of K3's transactional batch resume
(Neo4JUtils.scala:22-28's transaction bracket): a real
checkpointLocation + file sink, stopped between microbatch groups and
restarted, must emit every edge exactly once — no duplicates from
reprocessing, no losses from the restart — and state (each
conversation's tail) must survive the restart so cross-restart chains
connect.
"""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from gfftoneo4j_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from gfftoneo4j_spark.streaming.stateful import streaming_next_turn_edges

from tests.test_stateful_streaming import _rows, _write


def _drain(spark, in_dir, out_dir, ck_dir):
    """One availableNow run of the stateful stream against a durable
    checkpoint + parquet sink; returns after the trigger drains."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_next_turn_edges(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read_sink(spark, out_dir):
    # batch read of a streaming file sink honors _spark_metadata, so
    # only committed files count (the exactly-once contract under test)
    return spark.read.parquet(out_dir).collect()


def test_restart_is_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    convs = ("cA", "cB")
    _write(
        os.path.join(in_dir, "part-000.parquet"),
        [r for c in convs for r in _rows(c, range(0, 6))],
    )
    _drain(spark, in_dir, out_dir, ck_dir)
    first = _read_sink(spark, out_dir)
    first_edges = [(r["subj"], r["pred"], r["obj"]) for r in first]
    assert len(first_edges) == len(set(first_edges)) == 2 * 5  # 0..5 chained

    # --- the stream is STOPPED; more data arrives; a NEW query resumes
    # from the same checkpoint (driver restart / redeploy case), with a
    # duplicate of an already-chained turn mixed in
    time.sleep(1.1)  # distinct mtime -> stable file-source ordering
    _write(
        os.path.join(in_dir, "part-001.parquet"),
        [r for c in convs for r in _rows(c, range(6, 11))] + _rows("cA", [3]),
    )
    _drain(spark, in_dir, out_dir, ck_dir)
    second = _read_sink(spark, out_dir)
    edges = [(r["subj"], r["pred"], r["obj"]) for r in second]
    assert len(edges) == len(set(edges)), "restart re-emitted an edge"

    next_turn = {(s, o) for s, p, o in edges if p == "next_turn"}
    want = {
        (f"turn:{c}:{i}", f"turn:{c}:{i + 1}") for c in convs for i in range(10)
    }
    # state survived the restart: the 5->6 edge spans the stop/start
    assert next_turn == want
    # the duplicate turn became lineage, not a second edge
    assert ("turn:cA:3", "late_turn", "conv:cA") in set(edges)

    # --- a third restart with NOTHING new must be a no-op
    _drain(spark, in_dir, out_dir, ck_dir)
    third = _read_sink(spark, out_dir)
    assert len(third) == len(second), "idle restart changed the sink"
