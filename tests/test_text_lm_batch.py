"""Semantic checks for the text/LM batch — the cross-engine gate
proves value equality vs DuckDB; these pin MEANING: Kneser-Ney scores
match a hand-computed toy exactly, Dunning G^2 matches the entropy
formula recomputed in Python, TextRank is symmetric on a symmetric
graph, MSTTR scores a hand-segmented doc, and char-trigram KL is zero
for a source that IS the corpus.
"""

import math

from pyspark.sql import functions as F

from gfftoneo4j_spark.queries import QUERIES

SF001 = "/root/testdata/sf0.001"

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_docs(spark, tmp_path, texts, sources=None):
    rows = [
        (i, t, "en", (sources[i] if sources else "s"), len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_kneser_ney_hand_example(spark, tmp_path):
    """Corpus 'a b', 'a b', 'a c': only 'a' has context mass (c1=3,
    N1+(a,.)=2); bigram types N1+(..)=2, continuations
    N1+(.,b)=N1+(.,c)=1. P(b|a) = 1.25/3 + .75*(2/3)*(1/2) = 2/3,
    P(c|a) = .25/3 + .25 = 1/3, P(a|a) = 0 (never a continuation) —
    and the three sum to exactly 1 (KN is a proper distribution over
    the continuation support)."""
    sf = _write_docs(spark, tmp_path, ["a b", "a b", "a c"])
    out = {
        (r["w1"], r["w2"]): (r["c2"], r["score_ppm"])
        for r in QUERIES["kneser_ney_scores"](spark, sf).collect()
    }
    # grid is top-unigrams x top-unigrams restricted to w1 with context
    assert set(out) == {("a", "a"), ("a", "b"), ("a", "c")}
    assert out[("a", "b")] == (2, 666666)
    assert out[("a", "c")] == (1, 333333)
    assert out[("a", "a")] == (0, 0)
    assert sum(v[1] for v in out.values()) in (999999, 1000000)


def test_dunning_g2_matches_formula(spark):
    rows = QUERIES["dunning_llr_collocations"](spark, SF001).collect()
    assert len(rows) > 100
    # recompute G^2 for the highest-scoring bigram from raw counts
    best = max(rows, key=lambda r: r["g2_fp"])
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    bi = (
        docs.select(F.split(F.trim("text"), " ").alias("w"))
        .where(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i-1] AS w1, w[i] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    n = bi.count()
    k11 = bi.where(
        (F.col("w1") == best["w1"]) & (F.col("w2") == best["w2"])
    ).count()
    r1 = bi.where(F.col("w1") == best["w1"]).count()
    c1 = bi.where(F.col("w2") == best["w2"]).count()
    k12, k21, k22 = r1 - k11, c1 - k11, n - r1 - c1 + k11

    def xlx(x):
        return x * math.log(x) if x > 0 else 0.0

    g2 = 2.0 * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
        - xlx(r1) - xlx(n - r1) - xlx(c1) - xlx(n - c1) + xlx(n)
    )
    assert best["k11"] == k11
    assert abs(best["g2_fp"] - math.floor(g2 * 1_000_000)) <= 1
    assert best["g2_fp"] > 0


def test_textrank_symmetric_graph_equal_ranks(spark, tmp_path):
    """'a b c a b c ...' makes a 3-cycle co-occurrence graph where all
    words are automorphic — TextRank must give them identical mass."""
    # trailing 'a' closes the cycle: a-b, b-c, c-a each appear 20x
    sf = _write_docs(spark, tmp_path, ["a b c " * 20 + "a"])
    out = {r["node"]: r["rank"] for r in QUERIES["textrank_keywords"](spark, sf).collect()}
    assert set(out) == {"a", "b", "c"}
    assert len(set(out.values())) == 1
    # hub dominance: a word adjacent to everything outranks leaf words
    sf2 = _write_docs(
        spark, tmp_path, ["hub x hub y hub z hub x hub y hub z"]
    )
    out2 = {
        r["node"]: r["rank"]
        for r in QUERIES["textrank_keywords"](spark, sf2).collect()
    }
    assert out2["hub"] > max(v for k, v in out2.items() if k != "hub")


def test_msttr_hand_segments(spark, tmp_path):
    """20 tokens: segment 0 all-same (TTR .1), segment 1 all-distinct
    (TTR 1.0) => MSTTR = .55; a 9-token doc has no full segment."""
    t20 = " ".join(["a"] * 10 + list("bcdefghijk"))
    t9 = " ".join(list("abcdefghi"))
    sf = _write_docs(spark, tmp_path, [t20, t9])
    out = {r["doc_id"]: r for r in QUERIES["msttr_diversity"](spark, sf).collect()}
    assert set(out) == {0}
    assert out[0]["n_segments"] == 2
    assert out[0]["msttr_fp"] == 550_000


def test_char_trigram_kl_zero_for_identity(spark, tmp_path):
    """With a single source, P_source == P_global exactly => KL = 0."""
    sf = _write_docs(spark, tmp_path, ["abcdefg", "hijklmn"])
    out = QUERIES["char_trigram_kl"](spark, sf).collect()
    assert len(out) == 1
    assert out[0]["kl_ppb"] == 0
    # two sources with disjoint scripts: both diverge from the pooled
    # global distribution
    sf2 = _write_docs(
        spark, tmp_path, ["aaaabbbb", "ccccdddd"], sources=["s1", "s2"]
    )
    out2 = {r["source"]: r["kl_ppb"] for r in QUERIES["char_trigram_kl"](spark, sf2).collect()}
    assert out2["s1"] > 0 and out2["s2"] > 0
