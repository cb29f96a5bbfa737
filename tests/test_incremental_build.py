"""Incremental build == full rebuild, snapshot by snapshot."""

from __future__ import annotations

from gfftoneo4j_spark.corpus import CorpusConfig, write_corpus
from gfftoneo4j_spark.plans.graph_sink import read_graph_snapshot
from gfftoneo4j_spark.plans.incremental_build import build_kg_incremental
from gfftoneo4j_spark.plans.pipeline import build_kg
from gfftoneo4j_spark.sources.transcripts import (
    read_alias_dict,
    read_transcripts,
)


def _triples(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_equals_full_rebuild(spark, tmp_path):
    t_path, d_path = write_corpus(
        str(tmp_path / "corpus"), CorpusConfig(n_conversations=40, seed=11)
    )
    turns = read_transcripts(spark, t_path)
    alias = read_alias_dict(spark, d_path)
    # conversation-disjoint halves
    convs = sorted(r["conv_id"] for r in turns.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    batch_a = turns.where(turns["conv_id"].isin(*half))
    batch_b = turns.where(~turns["conv_id"].isin(*half))

    out = str(tmp_path / "graph")
    m1 = build_kg_incremental(spark, batch_a, alias, out, "a")
    m2 = build_kg_incremental(spark, batch_b, alias, out, "b")
    assert (m1["version"], m2["version"]) == (1, 2)

    got = _triples(read_graph_snapshot(spark, out).triples)
    want = _triples(build_kg(spark, turns, alias, extraction="sql").triples)
    assert got == want

    # v1 time-travels to exactly batch A's graph
    got_a = _triples(read_graph_snapshot(spark, out, version=1).triples)
    want_a = _triples(build_kg(spark, batch_a, alias, extraction="sql").triples)
    assert got_a == want_a


def test_reingesting_same_batch_is_idempotent(spark, tmp_path):
    t_path, d_path = write_corpus(
        str(tmp_path / "corpus"), CorpusConfig(n_conversations=15, seed=5)
    )
    turns = read_transcripts(spark, t_path)
    alias = read_alias_dict(spark, d_path)
    out = str(tmp_path / "graph")
    build_kg_incremental(spark, turns, alias, out)
    v1 = _triples(read_graph_snapshot(spark, out).triples)
    build_kg_incremental(spark, turns, alias, out)  # replay the batch
    v2 = _triples(read_graph_snapshot(spark, out).triples)
    assert v1 == v2  # create-unique dedup absorbs the replay


def test_jsonl_source_builds_identical_graph(spark, tmp_path):
    """Transcripts exported to JSONL and re-ingested through
    read_transcripts_jsonl produce the same triples as the parquet
    path — the source layer is format-transparent."""
    from pyspark.sql import functions as F

    from gfftoneo4j_spark.sources.transcripts import read_transcripts_jsonl

    t_path, d_path = write_corpus(
        str(tmp_path / "corpus"), CorpusConfig(n_conversations=12, seed=8)
    )
    turns = read_transcripts(spark, t_path)
    alias = read_alias_dict(spark, d_path)
    jl = str(tmp_path / "jl")
    turns.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS").alias("ts"),
    ).write.json(jl)
    turns2 = read_transcripts_jsonl(spark, jl)
    a = _triples(build_kg(spark, turns, alias, extraction="sql").triples)
    b = _triples(build_kg(spark, turns2, alias, extraction="sql").triples)
    assert a == b and a


def test_strict_incremental_aborts_before_commit(spark, tmp_path):
    # --strict used to be silently dropped on the incremental path
    # (ADVICE r3): a fail-fast request degraded to quarantine. Now the
    # violation raises BEFORE any snapshot commit, so the pointer
    # never moves and readers see nothing.
    import pytest

    from gfftoneo4j_spark.plans.pipeline import StrictModeViolation

    t_path, d_path = write_corpus(
        str(tmp_path / "corpus"), CorpusConfig(n_conversations=10, seed=3)
    )
    turns = read_transcripts(spark, t_path)
    alias = read_alias_dict(spark, d_path)
    out = str(tmp_path / "graph")
    m = build_kg_incremental(spark, turns, alias, out, strict=False)
    assert m["version"] == 1

    bad = spark.createDataFrame(
        [("cX", 0, "user", "", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    with pytest.raises(StrictModeViolation):
        build_kg_incremental(
            spark, turns.unionByName(bad), alias, out, strict=True
        )
    # pointer unmoved: still exactly one committed version
    assert read_graph_snapshot(spark, out).nodes.count() > 0
    with pytest.raises(FileNotFoundError):
        read_graph_snapshot(spark, out, version=2)


def test_incremental_lineage_out_written(spark, tmp_path):
    t_path, d_path = write_corpus(
        str(tmp_path / "corpus"), CorpusConfig(n_conversations=8, seed=4)
    )
    out = str(tmp_path / "graph")
    lin = str(tmp_path / "lin")
    build_kg_incremental(
        spark,
        read_transcripts(spark, t_path),
        read_alias_dict(spark, d_path),
        out,
        lineage_out=lin,
    )
    assert spark.read.parquet(f"{lin}/lineage").columns
    assert spark.read.parquet(f"{lin}/metrics").count() > 0
