"""Tests for entity conversation diversity, the perplexity filter
sweep and MinHash calibration."""

from gfftoneo4j_spark.queries import QUERIES


def test_entity_diversity_totals(spark, sf_dir):
    rows = QUERIES["entity_conv_diversity"](spark, sf_dir).collect()
    assert rows
    # 5 canonical entities (one per event type family)
    assert len(rows) == 5
    n_turns = QUERIES["kg_transcripts"](spark, sf_dir).count()
    # every turn carries exactly one mention
    assert sum(r["n_mentions"] for r in rows) == n_turns
    for r in rows:
        assert r["n_convs"] >= 1
        assert r["n_mentions"] >= r["n_convs"]
        assert (
            abs(r["mentions_per_conv"] - r["n_mentions"] / r["n_convs"])
            < 1e-5
        )


def test_ppl_sweep_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["ppl_filter_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    assert len(rows) == 7
    for a, b in zip(rows, rows[1:]):
        assert a["threshold"] <= b["threshold"]
        # raising the cutoff can only keep more
        assert a["n_kept"] <= b["n_kept"]
        assert a["kept_ppl_cents"] <= b["kept_ppl_cents"]
    for r in rows:
        assert 0.0 <= r["frac_kept"] <= 1.0


def test_minhash_calibration_monotone_and_anchored(spark, sf_dir):
    rows = sorted(
        QUERIES["minhash_calibration"](spark, sf_dir).collect(),
        key=lambda r: r["k_match"],
    )
    assert rows
    for r in rows:
        assert r["n_pairs"] > 0
        assert abs(r["est_jaccard"] - r["k_match"] / 8) < 1e-9
        assert 0.0 <= r["mean_true_jaccard"] <= 1.0
    # more matching hashes -> genuinely more similar pairs on average
    assert (
        rows[-1]["mean_true_jaccard"] >= rows[0]["mean_true_jaccard"]
    )
    # the all-8-agree bucket is dominated by genuinely similar pairs
    # (injected exact dups + tiny-vocab near-dups), well above the
    # weakest bucket
    full = [r for r in rows if r["k_match"] == 8]
    if full:
        assert full[0]["mean_true_jaccard"] > 0.75
        assert (
            full[0]["mean_true_jaccard"]
            > rows[0]["mean_true_jaccard"] + 0.2
        )
