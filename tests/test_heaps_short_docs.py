"""Regression: heaps_law must not crash on docs with < 3 tokens
(sequence(1, size-2) steps DOWNWARD for short docs and slice() raises
— ADVICE r04). Short docs contribute no shingles, matching the
oracle's WHERE p + 2 <= len(w) guard."""

from gfftoneo4j_spark.queries import QUERIES


def test_heaps_law_survives_short_and_empty_docs(spark, tmp_path):
    d = spark.createDataFrame(
        [
            (1, "one two"),        # 2 tokens: no shingle, must not raise
            (2, "a"),              # 1 token
            (3, ""),               # empty
            (4, "w1 w2 w3 w4"),    # 2 shingles, both new vocabulary
        ],
        "doc_id long, text string",
    )
    d.write.parquet(str(tmp_path / "documents.parquet"))
    rows = sorted(
        QUERIES["heaps_law"](spark, str(tmp_path)).collect(),
        key=lambda r: r["bucket"],
    )
    assert len(rows) == 16
    assert rows[-1]["cum_tokens"] == 2
    assert rows[-1]["cum_vocab"] == 2
