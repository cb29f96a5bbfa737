"""Streaming Count-Min sketch: per-microbatch counter partials written
to batch-id-keyed state, folded by addition on read.

The exactly-once story is deliberately DIFFERENT from
streaming/sketch_stream.py, because the algebra is different: register
minima merge by MIN (idempotent — replayed partials are absorbed for
free), but Count-Min cells merge by ADDITION, which double-counts a
replayed batch. The standard recipe (Structured Streaming's
foreachBatch contract) supplies idempotence instead: the batch id is
deterministic under replay, each batch OVERWRITES its own
``batch_id=<n>`` partition directory, and the read-side fold sums over
partitions — a re-run batch replaces its own partial rather than
appending a duplicate. Together the two modules demonstrate both halves
of the exactly-once design space: idempotent ALGEBRA (min/max/set-union
sketches) vs idempotent WRITES (additive sketches, counters, sums).

Scale: each microbatch shuffles at most depth * width counter rows
after map-side combine; state grows one depth*width partial per batch
and compacts by re-summing (the fold output is itself a valid partial).
Citation: reference has no streaming surface; engine extension like
streaming/{incremental,stateful,sketch_stream}.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.sketches import countmin_counters


def stream_countmin(
    stream: DataFrame,
    value: str,
    state_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 256,
    available_now: bool = True,
):
    """Start a streaming query writing per-batch Count-Min partials.
    Returns the StreamingQuery (caller awaits/stops)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        countmin_counters(batch_df, value, depth, width).write.mode(
            "overwrite"
        ).parquet(f"{state_dir.rstrip('/')}/batch_id={batch_id}")

    w = (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_countmin_counters(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Fold the per-batch partials into one (j, pos, n) counter table —
    identical to the batch ``countmin_counters`` over the union of all
    batch inputs (pytest-pinned stream==batch parity). Cell-wise
    addition is the CMS merge; replay safety comes from the write side
    (per-batch overwrite), not from this fold."""
    partials = spark.read.option("basePath", state_dir).parquet(
        f"{state_dir.rstrip('/')}/batch_id=*"
    )
    return partials.groupBy("j", "pos").agg(F.sum("n").alias("n"))
