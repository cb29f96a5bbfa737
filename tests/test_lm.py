"""Seeded semantics for the LM operators (operators/lm.py). The gated
queries (lm_perplexity, bpe_pair_counts) pin SQL-twin equivalence on
the documents table; these pin the math on corpora built by hand."""

import math

import pytest

from gfftoneo4j_spark.operators.lm import bigram_perplexity, bpe_pair_counts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_perplexity_uniform_corpus_is_zero_bits(spark):
    # every context has exactly one continuation -> p = 1 everywhere,
    # avg_nll = 0, ppl = 1: the LM is perfectly unsurprised
    out = bigram_perplexity(_docs(spark, ["a b c", "a b c"])).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_bigrams"] == 2
        assert r["avg_nll"] == 0.0
        assert r["ppl"] == 1.0


def test_perplexity_separates_predictable_from_surprising(spark):
    # corpus: 'a' continues to b 3 times and to x once -> doc2's a->x
    # bigram costs -log2(1/4) = 2 bits, doc0/doc1's a->b costs
    # -log2(3/4) ≈ 0.415 — the surprising doc scores strictly higher
    out = {
        r["doc_id"]: r
        for r in bigram_perplexity(
            _docs(spark, ["a b", "a b a b", "a x"])
        ).collect()
    }
    assert out[2]["avg_nll"] == pytest.approx(2.0, abs=1e-4)
    assert out[0]["avg_nll"] == pytest.approx(-math.log2(3 / 4), abs=1e-4)
    assert out[2]["avg_nll"] > out[0]["avg_nll"]
    # doc1: two a->b bigrams and one b->a (b continues to a once out
    # of its 2 bigram-left occurrences... b appears as w1 in 'b a' only
    # -> p(a|b) counts only w1=b rows: 1 of 1 -> 0 bits)
    assert out[1]["n_bigrams"] == 3


def test_perplexity_drops_docs_without_bigrams(spark):
    out = bigram_perplexity(_docs(spark, ["solo", "a b"])).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_bpe_counts_weight_by_word_frequency(spark):
    # 'ab' occurs 3x (pair 'ab' weight 3), 'abc' once (pairs ab, bc)
    # -> ab: 4, bc: 1; single-char words contribute nothing
    out = {
        r["pair"]: r["n"]
        for r in bpe_pair_counts(
            _docs(spark, ["ab ab", "ab abc", "x y z"]), k=10
        ).collect()
    }
    assert out == {"ab": 4, "bc": 1}


def test_bpe_topk_ties_break_lexicographically(spark):
    # xy and yz both count 1; k=1 must pick 'xy' (count tie, pair asc)
    out = bpe_pair_counts(_docs(spark, ["xyz"]), k=1).collect()
    assert len(out) == 1 and out[0]["pair"] == "xy"


def test_nb_classifier_separable_corpus_resubstitutes_perfectly(spark):
    from gfftoneo4j_spark.operators.lm import nb_classify

    rows = [
        (0, "aa aa bb", "A"), (1, "aa bb aa", "A"),
        (2, "zz zz yy", "Z"), (3, "yy zz zz", "Z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_classify(df).collect()}
    assert all(out[i]["correct"] for i in range(4))
    assert out[0]["pred"] == "A" and out[2]["pred"] == "Z"


def test_nb_classifier_priors_break_shared_vocab(spark):
    from gfftoneo4j_spark.operators.lm import nb_classify

    # identical text everywhere -> likelihoods equal across classes,
    # the prior decides: majority class wins for every document
    rows = [(i, "w w w", "M") for i in range(3)] + [(9, "w w w", "m")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_classify(df).collect()
    assert all(r["pred"] == "M" for r in out)
    assert sum(1 for r in out if r["correct"]) == 3


def test_nb_scores_are_negative_log_space(spark):
    from gfftoneo4j_spark.operators.lm import nb_classify

    df = spark.createDataFrame(
        [(0, "a b", "x"), (1, "c d", "y")],
        "doc_id long, text string, lang string",
    )
    for r in nb_classify(df).collect():
        assert r["score"] < 0
