"""Corpus-cleaning operators: line-frequency boilerplate removal and
fixed-window document chunking.

Both are core passes of a web-scale training-data pipeline (CCNet /
RefinedWeb-style cleaning runs line-dedup before document-dedup; LLM
pretraining consumes fixed-token windows), expressed as pure DataFrame
plans: one explode, combinable aggregations, no Python in the hot path.
The reference engine has no corpus surface — these extend the engine the
same way the dedup/similarity families do (SURVEY.md LLM-pipeline
addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Drop every line whose normalized form appears in >= ``min_docs``
    distinct documents (nav bars, cookie banners, license footers), and
    reassemble the surviving lines in their original order.

    Scale shape (the CCNet pass at 100 TB):
    - one ``posexplode`` — row growth bounded by the documents' own
      line structure, no quadratic step;
    - line identity shuffles as ``xxhash64(normalized line)`` (8 bytes),
      never the line text — same rule the shingle machinery enforces
      (operators/dedup.py `_hashed_shingles`);
    - doc-frequency is distinct(h, doc) -> count, both phases partial-
      aggregatable; the frequent-line set is at most |distinct lines| /
      min_docs rows of 8-byte hashes, so the anti-join is broadcast-
      range for any real min_docs — left to AQE rather than hinted,
      like the vocab join (a pathological corpus can exceed the
      threshold and AQE falls back to shuffle, still correct);
    - reassembly is one groupBy(doc) whose aggregation state is the
      surviving lines of ONE document — the same O(doc) bound as the
      input row that carried it.

    Returns (id_col, clean_text, n_lines, n_kept).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("h", F.xxhash64(F.lower(F.trim(F.col("line")))))
    frequent = (
        lines.select("h", id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_docs)
        .select("h")
    )
    kept = lines.join(frequent, "h", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep)).cast("bigint").alias("n_lines"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
    )


def chunk_documents(
    docs: DataFrame,
    width: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's whitespace tokens into fixed-``width``
    windows that overlap by ``overlap`` tokens — the pretraining
    context-window pass (final short chunk kept, stride = width -
    overlap).

    Scale shape: zero joins and zero aggregations — one projection
    computes the token array and the stride-start sequence, one
    ``posexplode`` emits a row per chunk, and ``slice`` materializes
    each window JVM-side. Row growth is |tokens| / stride per document
    (the overlap factor, ~n/(width-overlap)), embarrassingly parallel
    and partition-preserving: a 100 TB corpus chunks in a single
    map-only stage with no exchange at all.

    Returns (id_col, chunk_idx, chunk_text, n_tokens).
    """
    if overlap >= width:
        raise ValueError("overlap must be < width")
    step = width - overlap
    toks = docs.select(
        F.col(id_col),
        # filter('') : split(trim(''), '\\s+') yields [''] — without the
        # guard an empty/whitespace-only doc emitted a phantom 1-token
        # chunk of empty text
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda w: w != F.lit(""),
        ).alias("toks"),
    ).where(F.size("toks") >= 1)
    # Last start capped at n - overlap - 1 (not n - 1): a chunk starting
    # at s >= n - overlap is wholly contained in its predecessor (which
    # already covers [s-step, s+overlap-1] ⊇ [s, n-1]) — e.g. width=4,
    # overlap=2, n=5 must emit starts [0, 2], not [0, 2, 4]. Coverage is
    # still total: the largest kept multiple of step satisfies
    # s_max + width >= n (proof: s_max > (n-overlap-1) - step =
    # n - width - 1).
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("toks") - overlap - 1, F.lit(0)),
        F.lit(step),
    )
    chunks = toks.select(
        id_col,
        "toks",
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    window = F.slice(F.col("toks"), F.col("start") + 1, width)
    return chunks.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).cast("bigint").alias("n_tokens"),
    )
