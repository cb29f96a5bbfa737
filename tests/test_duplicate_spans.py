"""duplicate_spans semantics: exact-substring span detection with
gaps-and-islands merging (Lee et al. 2021 re-expressed relationally)."""

from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.dedup import duplicate_spans


def _rows(df):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_shingles"])
        for r in df.collect()
    }


def test_shared_substring_merges_to_one_maximal_span(spark):
    # docs 1 and 2 share the 7-word run "a b c d e f g" => with width=5,
    # duplicated shingle positions {0,1,2} merge into one span [0, 6]
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g x1 y1 z1"),
            (2, "q2 a b c d e f g w2"),
            (3, "totally different words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    got = _rows(duplicate_spans(df, width=5))
    assert (1, 0, 6, 3) in got
    assert (2, 1, 7, 3) in got
    assert not any(d == 3 for d, *_ in got)


def test_disjoint_runs_stay_separate_spans(spark):
    # shared runs at the start AND end of doc 1, separated by a unique
    # middle => two spans, not one
    shared_a = "s1 s2 s3 s4 s5"
    shared_b = "t1 t2 t3 t4 t5"
    df = spark.createDataFrame(
        [
            (1, f"{shared_a} u1 u2 u3 u4 u5 u6 {shared_b}"),
            (2, shared_a),
            (3, shared_b),
        ],
        "doc_id long, text string",
    )
    spans1 = sorted(t for t in _rows(duplicate_spans(df, width=5)) if t[0] == 1)
    assert spans1 == [(1, 0, 4, 1), (1, 11, 15, 1)]


def test_within_doc_repeats_alone_do_not_mark(spark):
    # duplication must be CROSS-document: a doc repeating itself with no
    # partner doc yields nothing
    df = spark.createDataFrame(
        [(1, "r1 r2 r3 r4 r5 mid r1 r2 r3 r4 r5"), (2, "other words x y z")],
        "doc_id long, text string",
    )
    assert _rows(duplicate_spans(df, width=5)) == set()


def test_short_docs_are_skipped(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    assert duplicate_spans(df, width=5).count() == 0


def test_banded_blocking_catches_cross_length_near_dups(spark):
    """VERDICT round-1: exact-(lang, n_chars) blocking misses near-dups
    of different length. The banded blocker must find a doc vs the same
    doc minus its last word; the exact-length blocker must not."""
    from gfftoneo4j_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_banded,
    )

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    df = spark.createDataFrame(
        [(1, "en", base), (2, "en", base.rsplit(" ", 1)[0])],
        "doc_id long, lang string, text string",
    )
    banded = ngram_jaccard_pairs_banded(
        df.withColumn("n_len", F.length("text")),
        "doc_id",
        "text",
        "lang",
        "n_len",
        threshold=0.8,
        bucket_width=16,
    )
    got = {(r["id_a"], r["id_b"]) for r in banded.collect()}
    assert (1, 2) in got

    exact = ngram_jaccard_pairs(
        df.withColumn("block", F.concat("lang", F.length("text").cast("string"))),
        "doc_id",
        "text",
        "block",
        threshold=0.8,
    )
    assert exact.count() == 0


def test_simhash_banding_pigeonhole(spark):
    """Recall contract: every pair within hamming_max=2 of a 4-band
    16-bit signature MUST be found (2 flips break <= 2 of 4 bands);
    pairs beyond the threshold are excluded by the verify. Expected
    set computed brute-force."""
    from gfftoneo4j_spark.operators.dedup import simhash_near_dup_pairs

    base = 0b1010_0110_0011_1100
    raw = {
        1: base,
        2: base,                          # hamming 0 to base
        3: base ^ 0b1,                    # 1 flip
        4: base ^ 0b1000_0000_0001,       # 2 flips in 2 bands
        5: base ^ 0b0001_0000_0001_0001,  # 3 flips in 3 bands
    }
    expected = {}
    for a in raw:
        for b in raw:
            if a < b:
                h = bin(raw[a] ^ raw[b]).count("1")
                if h <= 2:
                    expected[(a, b)] = h
    assert any(
        bin(raw[a] ^ raw[b]).count("1") == 3 for a in raw for b in raw if a < b
    ), "fixture must contain an over-threshold pair"
    sigs = spark.createDataFrame(list(raw.items()), "id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(sigs, hamming_max=2).collect()
    }
    assert got == expected
