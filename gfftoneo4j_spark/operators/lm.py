"""Statistical language-model operators for corpus quality filtering
and tokenizer training: bigram-LM perplexity scoring (the CCNet-style
"does this document look like the corpus" filter) and BPE pair counting
(one round of byte-pair-encoding tokenizer training).

Both extend the engine the same way the dedup/similarity families do —
pure DataFrame plans, no Python in the hot path, and deterministic
output so an inherently statistical pass faces the exact-hash gate.
The reference engine has no corpus surface (its parser grammar is
`/root/reference/src/main/.../GffParser.scala`); these belong to the
LLM-pipeline addendum in SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_bigrams(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, w1, w2) — one row per consecutive token pair, derived with
    ZERO shuffle: two array slices zipped and exploded. Row growth is
    exactly |tokens| - 1 per document, the same bound as tokenizing."""
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    ).where(F.size("t") >= 2)
    pairs = F.arrays_zip(
        F.slice("t", 1, F.size("t") - 1).alias("w1"),
        F.slice("t", 2, F.size("t") - 1).alias("w2"),
    )
    return toks.select(
        id_col, F.explode(pairs).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def bigram_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document by the perplexity of a bigram LM trained on
    the corpus itself (MLE, no smoothing — every document's bigrams are
    by construction in the training counts, so probabilities are never
    zero). High perplexity = unlike the corpus = the gibberish /
    boilerplate / wrong-language tail that perplexity filtering exists
    to cut (CCNet trains the LM on a trusted corpus; the mechanics —
    count, condition, score, aggregate — are identical).

    Scale shape:
    - bigram derivation is zero-shuffle (`_doc_bigrams`);
    - the LM is two combinable aggregations: count per (w1, w2) and,
      derived FROM those counts (input is already vocab²-bounded),
      count per left context w1;
    - scoring joins doc-bigrams to the probability table on (w1, w2) —
      the one heavy exchange. Stop-word bigrams are the classic hot
      keys; the join is left to AQE's skew-split rather than salted by
      hand (same call as the vocab join in `tfidf_topk`);
    - the per-document fold (mean of -log2 p) is combinable.

    Determinism: -log2(p) sums floats, so cross-engine bit-equality is
    not free; the result rounds avg_nll to 4dp and reports n_bigrams
    exactly — same discipline as quality_scores / tfidf_topk.

    Returns (id_col, n_bigrams, avg_nll, ppl): avg_nll = mean bits per
    bigram, ppl = 2^avg_nll rounded to 2dp.
    """
    bg = _doc_bigrams(docs, text_col, id_col)
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nb"))
    cu = cb.groupBy("w1").agg(F.sum("nb").alias("nu"))
    prob = cb.join(cu, "w1").select(
        "w1", "w2", (F.col("nb") / F.col("nu")).alias("p")
    )
    scored = bg.join(prob, ["w1", "w2"])
    nll = -F.log2("p")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
            F.round(F.pow(F.lit(2.0), F.avg(nll)), 2).alias("ppl"),
        )
    )


def bpe_pair_counts(
    docs: DataFrame,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """One round of BPE tokenizer training: the corpus-wide frequency
    of every adjacent CHARACTER pair, weighted by word frequency — the
    quantity whose argmax BPE merges next. (Full BPE training iterates
    merge-and-recount; each round is this query over the re-segmented
    vocab, so the round IS the distributed primitive.)

    Scale shape — the word-frequency table is the whole trick:
    - one token explode + combinable count builds vocab (word, count);
      everything after runs on the VOCAB, not the corpus — pair
      generation touches |vocab| rows however many times each word
      occurred (Zipf: the corpus is ~10^12 tokens, the vocab ~10^7);
    - per-word pair generation is zero-shuffle: posexplode of an index
      sequence + substr;
    - pair totals are a combinable sum; the top-k is
      TakeOrderedAndProject (per-partition partial top-k, merged on the
      driver — k rows, never a global sort).

    Returns the k most frequent pairs as (pair, n), count-desc then
    pair-asc for a deterministic gate.
    """
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.length("w") >= 2)
    )
    idx = words.select(
        "w",
        "c",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
    )
    pairs = idx.select(
        F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"), "c"
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(k)
    )
