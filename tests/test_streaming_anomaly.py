"""Welford streaming anomaly operator: cross-microbatch state must
reproduce the batch prefix-window z-scores exactly for in-order
arrival."""

import os

import pytest
from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table
from gfftoneo4j_spark.streaming.anomaly import streaming_welford_anomaly
from gfftoneo4j_spark.streaming.incremental import run_available_now


@pytest.fixture(scope="module")
def split_events(tmp_path_factory, spark, sf_dir):
    """The real events table split into two time-ordered parquet files
    so the file stream replays it as (at least) two microbatches with
    the cut mid-history."""
    d = str(tmp_path_factory.mktemp("anomaly_stream"))
    ev = load_table(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr("percentile_approx(unix_timestamp(ts), 0.5)")
    ).collect()[0][0]
    early = ev.where(F.unix_timestamp("ts") <= mid)
    late = ev.where(F.unix_timestamp("ts") > mid)
    early.coalesce(1).write.parquet(os.path.join(d, "b0"))
    late.coalesce(1).write.parquet(os.path.join(d, "b1"))
    # one directory-ordered source dir with both files
    import glob
    import shutil
    import time

    out = os.path.join(d, "feed")
    os.makedirs(out)
    for i, sub in enumerate(["b0", "b1"]):
        src = glob.glob(os.path.join(d, sub, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(out, f"part-{i:03d}.parquet"))
        time.sleep(1.1)  # distinct mtimes -> microbatch order
    return out


def test_streaming_matches_batch_prefix_z(spark, sf_dir, split_events):
    schema = load_table(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events)
    )
    got = run_available_now(
        streaming_welford_anomaly(stream), "welford_anomaly"
    ).collect()
    want = QUERIES["prefix_zscore_anomaly"](spark, sf_dir).collect()
    gmap = {(r["user_id"], r["event_id"]): r for r in got}
    wmap = {(r["user_id"], r["event_id"]): r for r in want}
    assert set(gmap) == set(wmap)
    assert len(wmap) > 0
    for k, w in wmap.items():
        g = gmap[k]
        assert g["n_prior"] == w["n_prior"]
        assert g["v100"] == w["v100"]
        # rounding rules differ at half-ulp; compare numerically
        assert abs(g["z"] - w["z"]) < 2e-6
        assert g["is_anomaly"] == w["is_anomaly"]


def test_streaming_anomaly_flags_spike(spark):
    """A hand-built stream with a flat history then a spike: the spike
    must be the anomaly, and state must cross the batch boundary (the
    spike sits alone in file 2)."""
    import time
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime(2024, 1, 1)

    def tbl(rows):
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [t0 + timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([7] * len(rows), pa.int64()),
                "event_type": ["view"] * len(rows),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": ["{}"] * len(rows),
            }
        )

    import tempfile

    d = tempfile.mkdtemp()
    base = [(i, i, 10.0 + (i % 3)) for i in range(10)]  # values 10-12
    pq.write_table(tbl(base), os.path.join(d, "part-000.parquet"))
    time.sleep(1.1)
    pq.write_table(
        tbl([(100, 100, 500.0)]), os.path.join(d, "part-001.parquet")
    )
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = run_available_now(
        streaming_welford_anomaly(stream), "welford_spike"
    ).collect()
    by_id = {r["event_id"]: r for r in got}
    assert by_id[100]["is_anomaly"] == 1
    assert by_id[100]["n_prior"] == 10
    flat = [r for r in got if r["event_id"] != 100]
    assert flat and all(r["is_anomaly"] == 0 for r in flat)


def test_score_group_orders_across_arrow_chunks():
    """ADVICE r05: a user whose microbatch spans multiple Arrow chunks
    must be scored in global (sec, event_id) order, not per-chunk.
    Drives _score_group directly with a chunked iterator whose global
    order interleaves across chunk boundaries."""
    import pandas as pd

    from gfftoneo4j_spark.streaming.anomaly import _score_group

    class _FakeState:
        exists = False

        def update(self, v):
            self.value = v

    def run(chunks):
        state = _FakeState()
        out = list(_score_group((7,), iter(chunks), state))
        rows = pd.concat(out) if out else pd.DataFrame()
        return rows, state.value

    # 12 events (non-degenerate spread so prior variance > 0 and
    # post-burn-in events actually score); chunk split puts LATER
    # seconds in the FIRST chunk
    vals = [100, 110, 90, 105, 95, 100, 108, 92, 103, 97, 101, 900]
    evs = [(sec, sec, v) for sec, v in enumerate(vals)]
    cols = ["sec", "event_id", "v100"]
    whole = [pd.DataFrame(evs, columns=cols)]
    split = [
        pd.DataFrame(evs[6:], columns=cols),   # later half first
        pd.DataFrame(evs[:6], columns=cols),
    ]
    rows_whole, st_whole = run(whole)
    rows_split, st_split = run(split)
    assert st_whole == st_split
    pd.testing.assert_frame_equal(
        rows_whole.reset_index(drop=True), rows_split.reset_index(drop=True)
    )
    # the spike at the end scores as an anomaly in both
    assert int(rows_whole.iloc[-1]["is_anomaly"]) == 1
