"""Segmented-window mega-conversation hardening: identical output to
plain windows (pytest-asserted here), bounded task size at any
conversation length (a plain window puts a whole conversation into one
task; the north_rule calls out mega-conversation skew explicitly and
lead chains cannot be salted)."""

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.windows import segmented_lag, segmented_lead
from gfftoneo4j_spark.plans.pipeline import build_kg
from gfftoneo4j_spark.sources.transcripts import ALIAS_DICT_SCHEMA, TRANSCRIPT_SCHEMA

T0 = datetime(2024, 1, 1)


def test_segmented_lead_lag_equal_plain_window(spark):
    rng = random.Random(17)
    rows = []
    for part in ("a", "b", "c"):
        # sparse, gappy order keys: exercises empty segments
        idxs = sorted(rng.sample(range(200), 60))
        rows += [(part, i, rng.randint(0, 9)) for i in idxs]
    df = spark.createDataFrame(rows, "part string, idx int, payload int")

    w = Window.partitionBy("part").orderBy("idx")
    plain = df.select(
        "part",
        "idx",
        F.lead("idx").over(w).alias("next_idx"),
        F.lead("payload").over(w).alias("next_payload"),
        F.lag("idx").over(w).alias("prev_idx"),
    )
    seg = segmented_lead(
        df, "part", ["idx"], ["idx", "payload"], segment_rows=16
    )
    seg = segmented_lag(seg, "part", ["idx"], ["idx"], segment_rows=16)
    got = {
        (r["part"], r["idx"]): (r["next_idx"], r["next_payload"], r["prev_idx"])
        for r in seg.collect()
    }
    want = {
        (r["part"], r["idx"]): (r["next_idx"], r["next_payload"], r["prev_idx"])
        for r in plain.collect()
    }
    assert got == want


def _mega_fixture():
    rng = random.Random(23)
    aliases = [
        {"alias": f"ent_{i}", "entity_id": f"E{i}", "entity_type": "entity",
         "parent_id": None if i % 3 else f"E{i + 1}"}
        for i in range(12)
    ]
    turns = []
    # one mega conversation (300 turns, with gaps + duplicate keys) and
    # many small ones
    for i in range(0, 600, 2):
        text = f"turn {i} <<m:ent_{rng.randint(0, 11)}>>"
        if rng.random() < 0.2:
            text += f" and <<m:ent_{rng.randint(0, 11)}>>"
        turns.append(
            {"conv_id": "mega", "turn_idx": i, "role": "user", "text": text,
             "tool": None, "ts": T0 + timedelta(seconds=i)}
        )
        if rng.random() < 0.05:  # duplicate turn key -> lineage
            turns.append(dict(turns[-1]))
    for c in range(10):
        for i in range(rng.randint(2, 6)):
            turns.append(
                {"conv_id": f"c{c}", "turn_idx": i, "role": "assistant",
                 "text": f"small <<m:ent_{rng.randint(0, 11)}>>",
                 "tool": None, "ts": T0 + timedelta(seconds=i)}
            )
    return turns, aliases


def test_pipeline_segmented_equals_plain(spark):
    turns, aliases = _mega_fixture()
    tdf = spark.createDataFrame(turns, TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(aliases, ALIAS_DICT_SCHEMA)
    plain = build_kg(spark, tdf, ddf, extraction="sql")
    seg = build_kg(spark, tdf, ddf, extraction="sql", segment_rows=32)

    t_plain = {(r["subj"], r["pred"], r["obj"]) for r in plain.triples.collect()}
    t_seg = {(r["subj"], r["pred"], r["obj"]) for r in seg.triples.collect()}
    assert t_seg == t_plain
    assert len(t_plain) > 1000

    lin_plain = {
        (r["reason"],): r["n"]
        for r in plain.lineage.groupBy("reason").agg(F.sum("n").alias("n")).collect()
    }
    lin_seg = {
        (r["reason"],): r["n"]
        for r in seg.lineage.groupBy("reason").agg(F.sum("n").alias("n")).collect()
    }
    assert lin_seg == lin_plain


def test_segmented_plan_splits_the_partition_key(spark):
    """The wide exchanges must be keyed (conv_id, segment), so one
    conversation spreads over many tasks."""
    turns, aliases = _mega_fixture()
    tdf = spark.createDataFrame(turns, TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(aliases, ALIAS_DICT_SCHEMA)
    seg = build_kg(spark, tdf, ddf, extraction="sql", segment_rows=32)
    plan = seg.triples._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(conv_id" in plan
    assert "__seg" in plan


def test_segmented_running_sum_matches_plain_window(spark):
    from pyspark.sql import Window

    from gfftoneo4j_spark.operators.windows import segmented_running_sum

    rows = [
        ("u1", i, (i * 7) % 13 - 6) for i in range(200)
    ] + [("u2", i, (i * 3) % 5) for i in range(57)]
    df = spark.createDataFrame(rows, "part string, idx long, val long")
    w = Window.partitionBy("part").orderBy("idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = sorted(
        (r["part"], r["idx"], r["rs"])
        for r in df.select(
            "part", "idx", F.sum("val").over(w).alias("rs")
        ).collect()
    )
    got = sorted(
        (r["part"], r["idx"], r["running_sum"])
        for r in segmented_running_sum(
            df, "part", ["idx"], "val", segment_rows=32
        ).collect()
    )
    assert got == want  # integers: bit-exact across the segmentation
    # and the segmented plan's windows are keyed (part, __seg)
    plan = segmented_running_sum(
        df, "part", ["idx"], "val", segment_rows=32
    )._jdf.queryExecution().executedPlan().toString()
    assert "__seg" in plan
