"""Streaming distinct-count sketch: per-microbatch register-min
partials appended to a persistent state directory, estimate folded on
read.

Exactly-once WITHOUT any dedup bookkeeping, by algebra instead of
machinery: the state is the union of per-batch (keys, register, min)
partials, and the estimator folds them with groupBy-min — min is
idempotent, commutative, and associative, so a replayed batch (restart
re-running the in-flight trigger) appends duplicate partials that
change NOTHING. Contrast streaming/ingest.py, which needs the
create-unique sink dedup for the same guarantee; a sketch's merge
operator supplies it for free. That is the deep reason HLL-class
sketches are the streaming cardinality tool, demonstrated end-to-end:
appends are crash-safe (a torn batch re-runs and re-appends), state is
bounded by batches * keys * m rows, and `compact_sketch_state` folds it
back to keys * m whenever the append log grows.

Scale: each microbatch shuffles only its own partials (<= keys * m
rows after map-side combine); the read-side fold is one groupBy-min
over the state log. Citation: reference has no streaming surface —
this extends the engine like streaming/{incremental,stateful}.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.sketches import (
    fold_registers,
    register_partials,
)


def stream_distinct_sketch(
    stream: DataFrame,
    keys: list[str],
    value: str,
    state_dir: str,
    checkpoint_dir: str,
    m: int = 256,
    available_now: bool = True,
):
    """Start a streaming query appending register partials per
    microbatch. Returns the StreamingQuery (caller awaits/stops)."""

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        register_partials(batch_df, keys, value, m).write.mode(
            "append"
        ).parquet(state_dir)

    w = (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_sketch_estimate(
    spark: SparkSession, state_dir: str, keys: list[str], m: int = 256
) -> DataFrame:
    """Fold the state log into (keys, n_regs, distinct_est) — identical
    estimator to the batch register_min_distinct, so stream-vs-batch
    parity is exact (pytest-pinned)."""
    partials = spark.read.parquet(state_dir)
    merged = partials.groupBy(*keys, "j").agg(
        F.min("umin").alias("umin")
    )
    return fold_registers(merged, keys, m)


def compact_sketch_state(
    spark: SparkSession, state_dir: str, keys: list[str]
) -> None:
    """Fold the append log back to one row per (keys, register).
    Correctness never needs this (the read-side min absorbs any number
    of partials); it bounds state growth on long-running streams.

    Crash-safe by the same min algebra the estimator relies on: the
    fold (1) snapshots the CURRENT list of part files, (2) folds
    exactly those files, (3) appends the folded partials as NEW files
    into the state dir, and (4) only then deletes the snapshot's
    files. A crash at any point leaves duplicate partials — absorbed
    for free by the read-side groupBy-min — never lost state; and a
    microbatch appended by a live stream between (1) and (4) is
    untouched because only the snapshot's own files are removed. (The
    previous delete-then-rename opened both loss windows: a crash
    between delete and rename dropped ALL state, and concurrent
    appends landing after the read were silently deleted.)"""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    root = jvm_path(state_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    snapshot = [
        st.getPath()
        for st in fs.listStatus(root)
        if st.isFile() and st.getPath().getName().startswith("part-")
    ]
    if len(snapshot) <= 1:
        return
    merged = (
        spark.read.parquet(*[p.toString() for p in snapshot])
        .groupBy(*keys, "j")
        .agg(F.min("umin").alias("umin"))
    )
    tmp = state_dir.rstrip("/") + "__compact"
    merged.write.mode("overwrite").parquet(tmp)
    # append-before-delete: task-UUID part names cannot collide with
    # existing files, so a plain rename into the live dir is an append
    for st in fs.listStatus(jvm_path(tmp)):
        name = st.getPath().getName()
        if st.isFile() and name.startswith("part-"):
            fs.rename(
                st.getPath(),
                jvm_path(state_dir.rstrip("/") + "/" + name),
            )
    for p in snapshot:
        fs.delete(p, False)
    fs.delete(jvm_path(tmp), True)
