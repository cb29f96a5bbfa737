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

from pyspark.sql import DataFrame, Window
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


# --------------------------------------------------------------------------
# Iterated BPE: k merge rounds + in-engine tokenizer apply
# --------------------------------------------------------------------------

#: symbol-boundary markers for the segmentation encoding: every symbol
#: is stored as SEP + sym + END, concatenated. Wrapping EACH symbol in
#: its own delimiters (rather than sep-joining) is the whole trick —
#: adjacent merge sites then share NO characters, so plain
#: non-overlapping left-to-right string `replace` of SEP+a+END+SEP+b+END
#: is EXACTLY greedy BPE pair-merging (sep-joined forms share the
#: middle separator between consecutive sites and string replace
#: diverges from greedy on runs like 'b b b b'). Control chars never
#: appear in whitespace-split corpus tokens.
BPE_SEP = "\x1f"
BPE_END = "\x1e"


def _bpe_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, c): corpus word frequencies — everything downstream runs on
    the VOCAB, not the corpus (Zipf: ~10^7 rows for a 10^12-token
    corpus), the same trick as bpe_pair_counts."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _wrap_chars(col):
    """'low' -> SEP l END SEP o END SEP w END (initial char-level seg)."""
    return F.regexp_replace(col, "(.)", f"{BPE_SEP}$1{BPE_END}")


def _seg_syms(seg_col):
    """Segmentation string -> symbol array: strip the outer SEP/END,
    split on the END+SEP inter-symbol boundary."""
    inner = seg_col.substr(F.lit(2), F.length(seg_col) - 2)
    return F.split(inner, BPE_END + BPE_SEP)


def bpe_train_merges(
    docs: DataFrame,
    rounds: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """``rounds`` iterations of BPE tokenizer training (Sennrich 2016
    word-level BPE, from the public formulation): per round, count
    adjacent symbol pairs weighted by word frequency, merge the argmax
    pair (ties broken count-desc then lexicographic — deterministic,
    exact-hash gateable) in every word's segmentation, repeat.

    Scale shape (the PageRank driver-loop discipline):
    - loop state is the VOCAB-sized (c, seg) table, re-checkpointed
      every few rounds so plan depth stays bounded;
    - per round: one zero-shuffle pair explode (arrays_zip of two
      slices), one combinable groupBy-sum over pair keys, and a
      1-row TakeOrderedAndProject collected to the driver (the
      CC-checksum discipline: bounded scalar state re-enters the plan
      as a literal);
    - the merge apply is ONE codegen `replace` projection over the
      vocab — greedy left-to-right BPE exactly, via the wrap-each-
      symbol encoding (see BPE_SEP note above).

    Returns (step, lhs, rhs, merged, n) — one row per merge round, in
    training order. Stops early if no pair remains (fully merged).
    """
    spark = docs.sparkSession
    seg = (
        _bpe_vocab(docs, text_col)
        .select("c", _wrap_chars(F.col("w")).alias("seg"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for r in range(1, rounds + 1):
        syms = _seg_syms(F.col("seg"))
        pairs = (
            seg.select("c", syms.alias("s"))
            .where(F.size("s") >= 2)
            .select(
                "c",
                F.explode(
                    F.arrays_zip(
                        F.slice("s", 1, F.size("s") - 1).alias("a"),
                        F.slice("s", 2, F.size("s") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("c").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((r, a, b, a + b, n))
        pat = f"{BPE_SEP}{a}{BPE_END}{BPE_SEP}{b}{BPE_END}"
        rep = f"{BPE_SEP}{a}{b}{BPE_END}"
        seg = seg.select(
            "c", F.replace(F.col("seg"), F.lit(pat), F.lit(rep)).alias("seg")
        )
        if r % 4 == 0:
            # bound plan depth: vocab-sized state, cheap to checkpoint
            seg = seg.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, n bigint"
    )


def bpe_apply_merges(word_col, merges: list[tuple[str, str]]):
    """Column expression applying ordered (lhs, rhs) merges to a word —
    ``rounds`` chained codegen `replace` calls over the wrapped
    segmentation; returns the segmentation string."""
    seg = _wrap_chars(word_col)
    for a, b in merges:
        seg = F.replace(
            seg,
            F.lit(f"{BPE_SEP}{a}{BPE_END}{BPE_SEP}{b}{BPE_END}"),
            F.lit(f"{BPE_SEP}{a}{b}{BPE_END}"),
        )
    return seg


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list to every document: the segmentation
    operator producing the BPE token count every sampling / packing /
    mixture operator upstream assumes, plus an order-exact fingerprint
    of the token stream.

    Scale shape: merges apply to the DISTINCT-WORD table (vocab-sized,
    |merges| chained `replace` projections in one codegen stage); the
    corpus-sized work is ONE word-keyed join of (doc, pos, word) rows
    against the tokenized vocab plus a combinable per-doc fold — the
    lm_perplexity scoring-join shape (hot stop-words left to AQE skew
    split). The per-doc token-stream md5 reassembles order via
    array_sort(collect_list(struct(pos, toks))) — per-doc bounded.

    Returns (id_col, n_words, n_tokens, tok_md5): n_tokens = total BPE
    symbols, tok_md5 = md5 of the space-joined token stream in document
    order.
    """
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "w"
        ),
    ).where(F.col("w") != "")
    seg = bpe_apply_merges(F.col("w"), merges)
    vtok = (
        words.select("w")
        .distinct()
        .select(
            "w",
            F.replace(
                seg.substr(F.lit(2), F.length(seg) - 2),
                F.lit(BPE_END + BPE_SEP),
                F.lit(" "),
            ).alias("tstr"),
            F.size(_seg_syms(seg)).cast("bigint").alias("n_syms"),
        )
    )
    return (
        words.join(vtok, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tstr"))
                        ),
                        lambda x: x["tstr"],
                    ),
                    " ",
                )
            ).alias("tok_md5"),
        )
    )


def nb_classify(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes, trained AND applied in-engine (the
    fastText-style language-ID / quality-classifier shape, trained the
    way the IVF k-means centroids are: inside the engine, no external
    model artifact). Laplace-smoothed token likelihoods
    p(w|c) = (n_wc + 1) / (n_c + |V|) and document-frequency priors;
    each document scores log p(c) + sum log p(w|c) per class and takes
    the argmax.

    Scale shape:
    - training is two combinable aggregations (per-(class, word)
      count, per-class total) + one distinct for |V|;
    - the likelihood GRID is vocab x classes rows — classes are single
      digits, so the grid is vocab-sized and the unseen-(w, c) cells
      materialize from a broadcast cross of the class totals, never
      from the corpus;
    - scoring is ONE word-keyed join of doc-tokens against the grid
      (row growth x|classes|), a combinable per-(doc, class) fold, and
      a |classes|-row-per-doc rank window.

    Determinism: the argmax ranks on round(score, 4) then label, so a
    cross-engine float wobble below 5e-5 cannot flip the prediction —
    same discipline as lm_perplexity / quality_scores.

    Returns (id_col, pred label, score, correct) — correct compares
    against the document's own training label (self-train resubstitution
    accuracy, the in-engine sanity number).
    """
    # one explode carries the label on-row (it lives on the same input
    # row — no corpus-sized join), read twice total: the training pass
    # and the scoring pass, the minimum for train-then-apply
    labeled = docs.select(
        F.col(id_col),
        F.col(label_col).alias("_c"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    # the MODEL is vocab x classes-bounded — checkpoint it so the
    # vocab count, the grid, and the scoring join all reuse one
    # materialization instead of re-aggregating the corpus
    cnt = (
        labeled.groupBy("_c", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    ctot = cnt.groupBy("_c").agg(F.sum("n").alias("tot"))
    vocab_n = cnt.select("w").distinct().count()
    grid = (
        cnt.select("w")
        .distinct()
        .crossJoin(F.broadcast(ctot))
        .join(cnt, ["_c", "w"], "left")
        .select(
            "w",
            "_c",
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + F.lit(1.0))
                / (F.col("tot") + F.lit(float(vocab_n)))
            ).alias("logp"),
        )
    )
    n_docs = docs.count()
    priors = docs.groupBy(F.col(label_col).alias("_c")).agg(
        F.log(F.count(F.lit(1)) / F.lit(float(n_docs))).alias("logprior")
    )
    scored = (
        labeled.drop("_c")
        .join(grid, "w")
        .groupBy(id_col, "_c")
        .agg(F.sum("logp").alias("_s"))
        .join(F.broadcast(priors), "_c")
        .select(
            id_col,
            "_c",
            F.round(F.col("_s") + F.col("logprior"), 4).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "_c")
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, F.col("_c").alias("pred"), "score")
    )
    return best.join(docs.select(id_col, label_col), id_col).select(
        id_col,
        "pred",
        "score",
        (F.col("pred") == F.col(label_col)).alias("correct"),
    )
