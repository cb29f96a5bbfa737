"""Watermarked stream-stream interval join — the streaming twin of
operators/windows.binned_interval_join, closing the last core
Structured-Streaming shape in the engine (the reference has no
streaming surface at all; this is the §2.10 engine-extension family).

The canonical workload: attribute one event stream to another within a
bounded lateness horizon — e.g. a `purchase` joined back to the same
user's `click` that happened at most ``horizon_sec`` earlier. Batch
expresses this as an equi-join on the key with a time-range
post-filter (hash join; no BroadcastNestedLoopJoin risk because the
user key IS an equality predicate). An unbounded stream can't: the
matching right-side row may not have arrived yet, and naive buffering
holds every left row forever.

Structured Streaming's stream-stream inner join solves it with TWO
requirements this operator encodes so state stays bounded:

- a watermark on BOTH inputs (bounds how late either side can arrive);
- an event-time RANGE in the join condition (``r.ts BETWEEN l.ts AND
  l.ts + horizon``), which tells the engine exactly when a buffered
  left row can never match again (l.ts + horizon < right watermark)
  and is evicted from the state store.

State is then O(events per watermark+horizon window) per side —
independent of stream history, the only shape that survives an
unbounded 10^12-event stream. Join processing shuffles each microbatch
on the key, the stream analogue of the batch hash join's exchange.

Exactly-once across restart comes from the same contract as the other
streaming ops (checkpointLocation + replayable source + idempotent
sink), pytest-verified by kill-and-restart in
tests/test_stream_interval_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    horizon_sec: int,
    watermark: str = "1 hour",
    left_prefix: str = "l",
    right_prefix: str = "r",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event's
    ``ts`` falls in [left.ts, left.ts + horizon_sec].

    Both inputs must carry (``key``, ts timestamp, event_id, value).
    Returns one row per matched pair:
    (key, {l}_event_id, {r}_event_id, lag_sec) — lag_sec in integer
    seconds, deterministic for any arrival order within the watermark.

    ``how="left_outer"`` adds the unmatched-left rows with null
    {r}_event_id / lag_sec — the attribution shape that must also
    REPORT the clicks that never converted. The engine can only emit
    such a null row once the right watermark has passed l.ts + horizon
    (before that, a match could still arrive), so outer results trail
    the watermark by exactly the horizon: bounded state AND bounded
    result lateness, the only correct trade on an unbounded stream.
    """
    lw = left.withWatermark("ts", watermark).alias("L")
    rw = right.withWatermark("ts", watermark).alias("R")
    cond = F.expr(
        f"L.{key} = R.{key} AND R.ts >= L.ts "
        f"AND R.ts <= L.ts + interval {int(horizon_sec)} seconds"
    )
    return lw.join(rw, cond, how).select(
        F.col(f"L.{key}").alias(key),
        F.col("L.event_id").alias(f"{left_prefix}_event_id"),
        F.col("R.event_id").alias(f"{right_prefix}_event_id"),
        (
            F.unix_timestamp(F.col("R.ts")) - F.unix_timestamp(F.col("L.ts"))
        ).cast("bigint").alias("lag_sec"),
    )


def batch_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    horizon_sec: int,
    left_prefix: str = "l",
    right_prefix: str = "r",
    how: str = "inner",
) -> DataFrame:
    """The batch twin: identical semantics over static inputs, used for
    streaming-parity pytests and the SQL-gated query. Plan shape: one
    hash equi-join on ``key`` with the time range as a post-filter —
    the range never degrades the join strategy because the key is an
    equality predicate."""
    lw = left.alias("L")
    rw = right.alias("R")
    cond = F.expr(
        f"L.{key} = R.{key} AND R.ts >= L.ts "
        f"AND R.ts <= L.ts + interval {int(horizon_sec)} seconds"
    )
    return lw.join(rw, cond, how).select(
        F.col(f"L.{key}").alias(key),
        F.col("L.event_id").alias(f"{left_prefix}_event_id"),
        F.col("R.event_id").alias(f"{right_prefix}_event_id"),
        (
            F.unix_timestamp(F.col("R.ts")) - F.unix_timestamp(F.col("L.ts"))
        ).cast("bigint").alias("lag_sec"),
    )
