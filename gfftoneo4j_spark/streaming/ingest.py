"""Streaming KG ingestion: every microbatch becomes one snapshot
commit.

``foreachBatch`` hands each microbatch to the BATCH incremental
builder (plans/incremental_build.py), so the full pipeline — windowed
turn ordering, extraction, linking, CC canonicalization — runs
unchanged on streaming input; no operator needs a streaming twin for
ingest.

Exactly-once story, composed from two halves:
- the streaming checkpoint (``checkpointLocation``) records which
  source files/offsets each batch id consumed, so a restart re-runs
  at most the one in-flight batch;
- a re-run batch merges idempotently: the sink's create-unique dedup
  absorbs the replay (tests/test_incremental_build.py proves replay
  == no-op), and the snapshot commit is an atomic pointer swap, so a
  crash mid-commit leaves the previous snapshot current and an orphan
  v-dir that is skipped.
That is the classic "idempotent sink + replayable source = exactly
once" argument, here with the idempotence mechanically tested.

At scale each commit costs O(|batch|) pipeline work plus the merge
dedup shuffle; size trigger intervals so batches amortize the commit
(minutes, not seconds, for a 10^12-turn firehose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gfftoneo4j_spark.plans.incremental_build import build_kg_incremental


def stream_to_snapshots(
    stream: DataFrame,
    alias_dict: DataFrame,
    path: str,
    checkpoint_dir: str,
    extraction: str = "sql",
    available_now: bool = True,
):
    """Start a streaming query committing one graph snapshot per
    microbatch. Returns the StreamingQuery (caller awaits/stops)."""
    spark = stream.sparkSession

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        build_kg_incremental(
            spark,
            batch_df,
            alias_dict,
            path,
            fingerprint=f"batch-{batch_id}",
            extraction=extraction,
        )

    w = (
        stream.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
