"""Unit semantics for operators/cleaning.py (gate queries
boilerplate_removal / doc_chunks pin the SQL-twin equivalence; these pin
the edge cases the sf corpus doesn't exercise)."""

import pytest
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.cleaning import (
    chunk_documents,
    remove_boilerplate_lines,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "unique alpha\nCOOKIE BANNER\nunique beta"),
        (2, "cookie banner\nown text two"),
        (3, "  cookie banner  \nthird doc line\nsecond third line"),
        (4, "cookie banner"),  # nothing survives
        (5, "solo document"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_removed_case_and_trim_insensitive(docs):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    # 'cookie banner' normalizes identically across case/whitespace in
    # docs 1-4 (df=4 >= 3) -> removed everywhere
    assert out[1]["clean_text"] == "unique alpha\nunique beta"
    assert out[2]["clean_text"] == "own text two"
    assert out[3]["clean_text"] == "third doc line\nsecond third line"
    assert out[4]["clean_text"] == ""  # fully-boilerplate doc kept as row
    assert out[5]["clean_text"] == "solo document"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[4]["n_lines"] == 1 and out[4]["n_kept"] == 0


def test_boilerplate_threshold_not_met_keeps_everything(docs):
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(docs, min_docs=5).collect()
    }
    assert out[1] == "unique alpha\nCOOKIE BANNER\nunique beta"


def test_boilerplate_preserves_intra_doc_duplicates(spark):
    # a line repeated WITHIN one doc counts once toward df (distinct
    # doc_id) and both copies survive if under threshold
    d = spark.createDataFrame(
        [(1, "x\nx\ny"), (2, "z")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(d, min_docs=2).collect()
    }
    assert out[1] == "x\nx\ny"


def test_chunks_cover_all_tokens_with_overlap(spark):
    toks = [f"t{i}" for i in range(10)]
    d = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(d, width=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    texts = [r["chunk_text"].split(" ") for r in rows]
    # stride 2: starts 0,2,4,6 — a start of 8 would be wholly contained
    # in the chunk at 6 ([t6..t9]) so it is not emitted
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert texts[0] == ["t0", "t1", "t2", "t3"]
    assert texts[1] == ["t2", "t3", "t4", "t5"]
    assert texts[3] == ["t6", "t7", "t8", "t9"]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 4]
    # every token appears in at least one chunk
    assert set(toks) == {t for c in texts for t in c}


def test_chunks_no_overlap_partition_exactly(spark):
    d = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(9)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(d, width=3, overlap=0).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_text"] for r in rows] == ["0 1 2", "3 4 5", "6 7 8"]


def test_chunks_single_short_doc_and_bad_args(spark):
    d = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    rows = chunk_documents(d, width=64, overlap=16).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "only two"
    with pytest.raises(ValueError):
        chunk_documents(d, width=8, overlap=8)


def test_chunks_skip_empty_docs_and_contained_tail(spark):
    # empty/whitespace-only docs emit NO chunk (split(trim('')) = ['']
    # must not become a phantom 1-token chunk), and a tail start inside
    # the previous chunk's overlap region is suppressed: width=4
    # overlap=2 n=5 emits starts [0, 2] — a start of 4 would yield "e",
    # wholly contained in "c d e"'s predecessor window [c d e].
    d = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b c d e")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(d, width=4, overlap=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    assert [r["doc_id"] for r in rows] == [3, 3]
    assert [r["chunk_text"] for r in rows] == ["a b c d", "c d e"]
    assert [r["n_tokens"] for r in rows] == [4, 3]


def test_chunk_plan_is_exchange_free(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(d, width=2, overlap=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_prefix_filter_matches_brute_force_exactly(spark):
    # the pruning theorem is recall-lossless: prefix-filtered output
    # must equal brute-force all-pairs Jaccard >= t on the same corpus
    from itertools import combinations

    from gfftoneo4j_spark.operators.dedup import prefix_filter_jaccard

    base = ["red blue green yellow", "red blue green purple",
            "one two three four five", "one two three four six",
            "totally disjoint tokens here", "red blue green yellow"]
    docs = [(i, t) for i, t in enumerate(base)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_jaccard(df, threshold=0.6).collect()
    }
    want = {}
    sets = {i: set(t.split()) for i, t in docs}
    for a, b in combinations(sets, 2):
        inter = len(sets[a] & sets[b])
        jac = inter / len(sets[a] | sets[b])
        if jac >= 0.6:
            want[(a, b)] = round(jac, 6)
    assert got == want
    assert (0, 5) in got and got[(0, 5)] == 1.0   # exact dup pair
    assert (0, 1) in got and got[(0, 1)] == 0.6   # 3/5 boundary case
