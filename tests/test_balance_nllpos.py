"""Tests for class-balanced downsampling and the NLL position curve."""

import hashlib

from gfftoneo4j_spark.queries import QUERIES
from gfftoneo4j_spark.sources.transcripts import load_table


def test_class_balance_rates(spark, sf_dir):
    rows = QUERIES["class_balance_downsample"](spark, sf_dir).collect()
    assert len(rows) == 5
    min_n = min(r["n"] for r in rows)
    for r in rows:
        assert abs(r["target_rate"] - min_n / r["n"]) < 1e-5
        # 16-bit uniform: actual rate within a few percent of target
        assert abs(r["actual_rate"] - r["target_rate"]) < 0.06
        assert 0 < r["kept"] <= r["n"]
    # the smallest class keeps (almost) everything
    smallest = min(rows, key=lambda r: r["n"])
    assert smallest["actual_rate"] > 0.9


def test_class_balance_exact_membership(spark, sf_dir):
    rows = {r["event_type"]: r for r in QUERIES[
        "class_balance_downsample"
    ](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type"
    ).collect()
    hexd = "0123456789abcdef"
    counts: dict = {}
    for e in ev:
        counts[e["event_type"]] = counts.get(e["event_type"], 0) + 1
    min_n = min(counts.values())
    kept: dict = {}
    for e in ev:
        h = hashlib.md5(str(e["event_id"]).encode()).hexdigest()
        u = (
            hexd.index(h[0]) * 4096
            + hexd.index(h[1]) * 256
            + hexd.index(h[2]) * 16
            + hexd.index(h[3])
        )
        if u * counts[e["event_type"]] < min_n * 65536:
            kept[e["event_type"]] = kept.get(e["event_type"], 0) + 1
    for t, r in rows.items():
        assert r["kept"] == kept.get(t, 0)


def test_nll_position_curve_shape(spark, sf_dir):
    rows = sorted(
        QUERIES["nll_position_curve"](spark, sf_dir).collect(),
        key=lambda r: r["pos"],
    )
    assert rows[0]["pos"] == 1
    assert rows[-1]["pos"] == 20
    total = sum(r["n_bigrams"] for r in rows)
    # the capped tail bucket absorbs all long-document positions
    assert rows[-1]["n_bigrams"] > rows[0]["n_bigrams"]
    for r in rows:
        assert r["mean_nll_bits"] > 0
        # bounded by log2 of the ~31-word vocabulary
        assert r["mean_nll_bits"] < 5.1
    # positions 1..19 each have at most as many bigrams as docs
    n_docs = load_table(spark, sf_dir, "documents").count()
    for r in rows[:-1]:
        assert r["n_bigrams"] <= n_docs
    assert total > n_docs
