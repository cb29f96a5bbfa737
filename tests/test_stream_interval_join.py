"""Stream-stream interval join: batch parity, bounded state, and
kill-and-restart exactly-once — the same contract test_streaming_restart
pins for the stateful chain operator, applied to the last core
Structured-Streaming shape (watermarked interval join)."""

import os
import time
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from gfftoneo4j_spark.streaming.interval_join import (
    batch_interval_join,
    streaming_interval_join,
)

T0 = datetime(2026, 1, 1, 12, 0, 0)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)


def _write(path, rows):
    """rows: (user_id, event_id, minutes_after_T0, kind)"""
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [T0 + timedelta(minutes=r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
                "kind": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        path,
    )


def _streams(spark, in_dir):
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    left = raw.where(raw["kind"] == "c").drop("kind")
    right = raw.where(raw["kind"] == "p").drop("kind")
    return left, right


def _drain(spark, in_dir, out_dir, ck_dir, horizon=1800, watermark="10 minutes"):
    left, right = _streams(spark, in_dir)
    q = (
        streaming_interval_join(left, right, key="user_id", horizon_sec=horizon,
                                watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _pairs(rows):
    return [(r["user_id"], r["l_event_id"], r["r_event_id"], r["lag_sec"]) for r in rows]


# (user, event_id, minute, kind) — user 1: click 0, purchases at +10m
# (match), +29m (match, boundary-in), +31m (out); user 2: two clicks
# sharing one purchase (many-to-many fan-out); user 3: purchase with
# no click.
BATCH1 = [
    (1, 100, 0, "c"),
    (1, 200, 10, "p"),
    (1, 201, 29, "p"),
    (1, 202, 31, "p"),
    (2, 101, 0, "c"),
    (2, 102, 5, "c"),
    (2, 210, 20, "p"),
    (3, 220, 7, "p"),
]
WANT1 = {
    (1, 100, 200, 600),
    (1, 100, 201, 1740),
    (2, 101, 210, 1200),
    (2, 102, 210, 900),
}


def test_batch_parity_and_exact_pairs(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _write(os.path.join(in_dir, "part-000.parquet"), BATCH1)
    _drain(spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = set(_pairs(spark.read.parquet(str(tmp_path / "out")).collect()))
    assert got == WANT1

    # parity: the batch twin over the identical static input
    ev = spark.read.parquet(in_dir)
    b = batch_interval_join(
        ev.where(ev["kind"] == "c").drop("kind"),
        ev.where(ev["kind"] == "p").drop("kind"),
        key="user_id",
        horizon_sec=1800,
    )
    assert set(_pairs(b.collect())) == got


def test_restart_exactly_once_and_state_eviction(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    _write(os.path.join(in_dir, "part-000.parquet"), BATCH1)
    _drain(spark, in_dir, out_dir, ck_dir)

    # the stream is STOPPED; late-window data arrives: a purchase for
    # user 1's ALREADY-BUFFERED click (cross-restart match, state must
    # survive), plus a far-future batch that advances the watermark
    # past everything buffered so far (state must then be evicted).
    time.sleep(1.1)
    _write(
        os.path.join(in_dir, "part-001.parquet"),
        [(1, 203, 15, "p")],  # within click-100's horizon, arrives late
    )
    time.sleep(1.1)
    _write(
        os.path.join(in_dir, "part-002.parquet"),
        [(9, 900, 600, "c"), (9, 901, 601, "p")],  # +10h: watermark jump
    )
    q = _drain(spark, in_dir, out_dir, ck_dir)
    rows = _pairs(spark.read.parquet(out_dir).collect())
    assert len(rows) == len(set(rows)), "restart re-emitted a joined row"
    assert set(rows) == WANT1 | {(1, 100, 203, 900), (9, 900, 901, 60)}

    # bounded state: the watermark jump must have evicted the old
    # buffered rows — state cannot hold the full stream history
    prog = q.lastProgress
    state = prog["stateOperators"][0]
    total_fed = len(BATCH1) + 1 + 2
    assert state["numRowsTotal"] < total_fed, (
        f"state holds {state['numRowsTotal']} rows — nothing evicted"
    )

    # idle restart is a no-op
    _drain(spark, in_dir, out_dir, ck_dir)
    again = _pairs(spark.read.parquet(out_dir).collect())
    assert len(again) == len(rows)


def _drain_left(spark, in_dir, out_dir, ck_dir):
    left, right = _streams(spark, in_dir)
    q = (
        streaming_interval_join(
            left, right, key="user_id", horizon_sec=1800,
            watermark="10 minutes", how="left_outer",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    # user 4's click never converts; user 1's does
    rows = [
        (1, 100, 0, "c"),
        (1, 200, 10, "p"),
        (4, 400, 0, "c"),
    ]
    _write(os.path.join(in_dir, "part-000.parquet"), rows)
    _drain_left(spark, in_dir, out_dir, ck_dir)
    got1 = set(_pairs(spark.read.parquet(out_dir).collect()))
    # the unmatched click CANNOT be emitted yet: a purchase inside its
    # horizon could still arrive until the watermark passes ts+horizon
    assert got1 == {(1, 100, 200, 600)}

    # watermark jump far past click-400's horizon -> null row must flush
    time.sleep(1.1)
    _write(
        os.path.join(in_dir, "part-001.parquet"),
        [(9, 900, 600, "c"), (9, 901, 601, "p")],
    )
    _drain_left(spark, in_dir, out_dir, ck_dir)
    got2 = set(_pairs(spark.read.parquet(out_dir).collect()))
    assert (4, 400, None, None) in got2
    assert (1, 100, 200, 600) in got2 and (9, 900, 901, 60) in got2

    # batch twin parity on the final static input (same rows)
    ev = spark.read.parquet(in_dir)
    b = batch_interval_join(
        ev.where(ev["kind"] == "c").drop("kind"),
        ev.where(ev["kind"] == "p").drop("kind"),
        key="user_id",
        horizon_sec=1800,
        how="left_outer",
    )
    assert set(_pairs(b.collect())) == got2
