"""Streaming snapshot ingestion: microbatch commits equal the batch
build, and a restart neither duplicates nor loses edges."""

from __future__ import annotations

import os
import shutil

from gfftoneo4j_spark.corpus import write_corpus_fast
from gfftoneo4j_spark.plans.graph_sink import read_graph_snapshot
from gfftoneo4j_spark.plans.pipeline import build_kg
from gfftoneo4j_spark.sources.transcripts import (
    read_alias_dict,
    read_transcripts,
)
from gfftoneo4j_spark.streaming.ingest import stream_to_snapshots
from gfftoneo4j_spark.streaming.incremental import read_transcript_stream


def _triples(df):
    return sorted(map(tuple, df.collect()))


def test_stream_ingest_matches_batch_and_restarts(spark, tmp_path):
    t_path, d_path = write_corpus_fast(
        str(tmp_path / "corpus"), 2000, seed=13, rows_per_file=500
    )
    alias = read_alias_dict(spark, d_path)

    # stage files in one-at-a-time so availableNow sees multiple batches
    stream_dir = str(tmp_path / "stream_in")
    os.makedirs(stream_dir)
    files = sorted(
        f for f in os.listdir(t_path) if f.endswith(".parquet")
    )
    assert files
    graph = str(tmp_path / "graph")
    ck = str(tmp_path / "stream_ck")

    # phase 1: first file only
    shutil.copy(os.path.join(t_path, files[0]), stream_dir)
    q = stream_to_snapshots(
        read_transcript_stream(spark, stream_dir), alias, graph, ck
    )
    q.awaitTermination()
    v_after_1 = _triples(read_graph_snapshot(spark, graph).triples)

    # phase 2 (restart): remaining files appear, same checkpoint — the
    # already-consumed file must not be reprocessed into duplicates
    for f in files[1:]:
        shutil.copy(os.path.join(t_path, f), stream_dir)
    q2 = stream_to_snapshots(
        read_transcript_stream(spark, stream_dir), alias, graph, ck
    )
    q2.awaitTermination()

    got = _triples(read_graph_snapshot(spark, graph).triples)
    want = _triples(
        build_kg(
            spark, read_transcripts(spark, t_path), alias, extraction="sql"
        ).triples
    )
    assert got == want
    assert len(v_after_1) <= len(got)
    # triples are unique (create-unique held across batches/restart)
    assert len(got) == len(set(got))
