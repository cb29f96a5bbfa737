"""Hand-computable BPE training-loop + tokenizer-apply checks
(operators/lm.py bpe_train_merges / bpe_tokenize)."""

import hashlib

from gfftoneo4j_spark.operators.lm import bpe_tokenize, bpe_train_merges


def test_bpe_merge_sequence_hand_computed(spark):
    # vocab: aaab x2, ab x1.
    # r1 pairs: (a,a)=4 (two per 'aaab' occurrence), (a,b)=3 -> merge aa
    # r2: 'aaab'=[aa,a,b] -> (aa,a)=2, (a,b)=2+1=3 -> merge ab
    # r3: 'aaab'=[aa,ab] -> (aa,ab)=2 -> merge aaab
    # r4: everything fully merged -> loop stops early
    d = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "ab")], "doc_id long, text string"
    )
    rows = bpe_train_merges(d, rounds=5).orderBy("step").collect()
    got = [(r["step"], r["lhs"], r["rhs"], r["merged"], r["n"]) for r in rows]
    assert got == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_bpe_merge_is_greedy_left_to_right_on_runs(spark):
    # 'bbbb': r1 merges (b,b) n=3; GREEDY re-segmentation is [bb, bb]
    # (left-to-right non-overlapping), so r2's merge must be (bb, bb).
    # A non-greedy [bb, b, b] would surface (bb,b)/(b,b) instead.
    d = spark.createDataFrame([(1, "bbbb")], "doc_id long, text string")
    rows = bpe_train_merges(d, rounds=2).orderBy("step").collect()
    assert (rows[0]["lhs"], rows[0]["rhs"], rows[0]["n"]) == ("b", "b", 3)
    assert (rows[1]["lhs"], rows[1]["rhs"], rows[1]["merged"]) == (
        "bb",
        "bb",
        "bbbb",
    )


def test_bpe_tokenize_counts_and_stream_md5(spark):
    # merges [(a,a), (a,b)]: 'aaab' -> [aa, ab], 'ab' -> [ab],
    # 'xy' -> [x, y]; doc stream "aa ab ab x y"
    d = spark.createDataFrame(
        [(7, "aaab ab xy")], "doc_id long, text string"
    )
    row = bpe_tokenize(d, [("a", "a"), ("a", "b")]).collect()[0]
    assert row["n_words"] == 3
    assert row["n_tokens"] == 5
    want = hashlib.md5("aa ab ab x y".encode()).hexdigest()
    assert row["tok_md5"] == want


def test_bpe_tokenize_empty_and_single_char_words(spark):
    # single-char word segments to itself; empty docs emit no row
    d = spark.createDataFrame(
        [(1, "a"), (2, "  ")], "doc_id long, text string"
    )
    rows = bpe_tokenize(d, [("a", "b")]).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    assert rows[0]["n_tokens"] == 1
