"""Seeded-random bulk parity: the distributed operators vs tiny pure-
Python references, hundreds of randomized groups in one Spark job.

Complements the DuckDB gate (one fixed corpus) and the hand-picked
unit cases: random shapes catch boundary interactions (empty shards,
capacity-exact fills, all-delete batches) no fixed fixture covers.
Deterministic seed — failures reproduce."""

from __future__ import annotations

import random

from gfftoneo4j_spark.operators.packing import pack_next_fit
from gfftoneo4j_spark.operators.upsert import merge_latest


def _py_next_fit(rows, capacity):
    """rows: [(shard, doc_id, tok)] -> {(shard, doc_id): (bin, fill)}"""
    out = {}
    by_shard = {}
    for shard, doc, tok in rows:
        by_shard.setdefault(shard, []).append((doc, tok))
    for shard, docs in by_shard.items():
        b, fill = 0, 0
        for doc, tok in sorted(docs):
            if fill > 0 and fill + tok > capacity:
                b, fill = b + 1, 0
            fill += tok
            out[(shard, doc)] = (b, fill)
    return out


def test_packing_random_parity(spark):
    rng = random.Random(20260817)
    rows = []
    doc_id = 0
    for shard in range(40):
        for _ in range(rng.randint(0, 30)):  # some shards empty
            # token counts spanning 0, capacity-exact and oversized
            tok = rng.choice([0, 1, 7, 50, 64, 65, 128, 200])
            rows.append((shard, doc_id, tok))
            doc_id += 1
    df = spark.createDataFrame(rows, "shard bigint, doc_id bigint, tok bigint")
    got = {
        (r["shard"], r["doc_id"]): (r["bin"], r["fill"])
        for r in pack_next_fit(df, capacity=64).collect()
    }
    assert got == _py_next_fit(rows, 64)


def _py_merge(base, changes):
    """LWW with unique versions; changes win ties never (v unique).
    base: [(k, v, val)], changes: [(k, v, val, op)]."""
    best = {}
    for k, v, val in base:
        if k not in best or v > best[k][0]:
            best[k] = (v, val, False)
    for k, v, val, op in changes:
        if k not in best or v > best[k][0]:
            best[k] = (v, val, op == "D")
    return {k: (v, val) for k, (v, val, dead) in best.items() if not dead}


def test_upsert_random_parity(spark):
    rng = random.Random(42424242)
    keys = [f"k{i}" for i in range(60)]
    versions = list(range(1, 1201))
    rng.shuffle(versions)  # globally unique versions
    vi = iter(versions)
    base = [
        (rng.choice(keys), next(vi), float(rng.randint(0, 99)))
        for _ in range(500)
    ]
    changes = [
        (
            rng.choice(keys),
            next(vi),
            float(rng.randint(0, 99)),
            "D" if rng.random() < 0.2 else "U",
        )
        for _ in range(300)
    ]
    bdf = spark.createDataFrame(base, "k string, v long, val double")
    cdf = spark.createDataFrame(changes, "k string, v long, val double, op string")
    got = {
        r["k"]: (r["v"], r["val"])
        for r in merge_latest(bdf, cdf, ["k"], "v", op_col="op").collect()
    }
    assert got == _py_merge(base, changes)
