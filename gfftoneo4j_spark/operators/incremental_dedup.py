"""Incremental MinHash+LSH dedup across snapshot boundaries.

The batch dedup family (operators/dedup.py) answers "which pairs in
THIS corpus are near-duplicates"; a production ingestion pipeline asks
a different question every day: "which of the NEW documents duplicate
anything already ingested — without re-shingling the history". This
module persists the LSH band table and the token index as append-only
parquet state, so each new batch:

1. shingles/signs ONLY its own rows (history is never re-read as text),
2. probes its band rows against the stored band index (equi-join on
   (band, band_hash) — the same bucketed-never-all-pairs shape as the
   batch LSH),
3. exact-Jaccard-verifies the candidates against the stored token
   index (semi-join-pruned to candidate ids), and
4. appends its own band + token rows to the state.

Because MinHash signatures are content-addressed (min of
md5('<i>:'+token) — operators/dedup.py:148), the band rows a document
produces are a pure function of its text: the union of per-batch
passes finds EXACTLY the pair set the full-corpus rebuild finds
(pytest-pinned on a two-batch split, and the gated query's DuckDB
oracle IS the full-corpus LSH SQL — incremental == rebuild is the
correctness gate itself).

State is append-only parquet; replayed appends (a crashed batch re-run)
are absorbed by the read-side ``.distinct()`` — band and token rows are
idempotent facts, the same loss-vs-duplication trade as
streaming/sketch_stream.py. At 100 TB the band index is the small
artifact (bands x docs rows of 8-byte-ish hashes); bucket it by
``band_hash`` on write so the probe join co-locates without a shuffle
of history.

Citation: reference has no dedup surface; this extends the engine's
LLM-pipeline addendum (SURVEY.md) — Lee et al. 2021 dedup motivation,
Broder MinHash/LSH from the public formulas.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.dedup import (
    minhash_signatures,
    tokens,
    verify_jaccard_candidates,
)

_BANDS_SUBDIR = "bands"
_TOKENS_SUBDIR = "tokens"
# salt width for the probe join (see lsh_index_append): spreads one hot
# band bucket's pair emission over this many tasks
_SALT = 16


def band_rows(
    sigs: DataFrame, k: int = 8, bands: int = 4
) -> DataFrame:
    """(id, band, band_hash) — the persistable LSH index rows, same
    banding rule as operators/dedup.py lsh_candidate_pairs (k/bands
    signatures concatenated then md5'd per band)."""
    rows_per_band = k // bands
    parts = []
    for b in range(bands):
        cols = [
            f"sig_{i}"
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        parts.append(
            sigs.select(
                "id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    return reduce(lambda x, y: x.unionByName(y), parts)


def _read_state(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Read an append-only state table; absent dir -> empty frame.
    (Dedup of replayed appends happens at the union with the new
    batch — one distinct covers both sources.)"""
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def verify_jaccard_pairs(
    cand: DataFrame, tok: DataFrame, threshold: float
) -> DataFrame:
    """Exact token-set Jaccard for candidate (id_a, id_b) pairs against
    a (id, token) table — the shared verify tail of batch and
    incremental LSH (delegates to the r06 array_intersect verify in
    operators/dedup.py: two candidate-list joins against per-doc
    token-set arrays instead of exploding |cand| x |doc| token rows;
    collect_set dedupes, so replayed/duplicated token rows cannot
    inflate sizes). Returns (id_a, id_b, jaccard) at >= threshold,
    3dp."""
    return verify_jaccard_candidates(cand, tok, threshold)


def lsh_index_append(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Process ONE new batch against the persisted LSH index: returns
    the verified near-dup pairs involving at least one new document
    (both new-vs-history and new-vs-new), then appends the batch's
    band and token rows to the state.

    The returned frame is materialized (localCheckpoint) BEFORE the
    state append so a caller collecting lazily never observes its own
    batch twice. Pair ids are normalized (id_a < id_b) so the union of
    per-batch results over any batch split equals the full-corpus
    ``minhash_lsh_dedup`` output exactly (content-addressed signatures
    make candidate generation batch-order-independent).
    """
    state_dir = state_dir.rstrip("/")
    bands_dir = f"{state_dir}/{_BANDS_SUBDIR}"
    tokens_dir = f"{state_dir}/{_TOKENS_SUBDIR}"

    sigs = minhash_signatures(batch, id_col, text_col, k)
    new_bands = band_rows(sigs, k, bands).localCheckpoint(eager=True)
    new_tokens = tokens(batch, id_col, text_col).localCheckpoint(
        eager=True
    )

    old_bands = _read_state(
        spark, bands_dir, "id long, band int, band_hash string"
    )
    old_tokens = _read_state(spark, tokens_dir, "id long, token string")

    # distinct on the UNION, not just the stored side: a replayed batch
    # (crash re-run) is already IN the state, and duplicated token rows
    # would double sz and quadruple inter (exact dups then hit a 0
    # denominator in the Jaccard — pytest-pinned regression)
    all_bands = old_bands.unionByName(new_bands).distinct()
    # candidates: new rows probe everything (history + this batch);
    # the join key is the band bucket — never a corpus self-join.
    # r06 (guide §2.5): the history side carries a deterministic salt
    # and the (smaller) probing batch replicates ``_SALT`` ways, so a
    # hot band bucket's quadratic emission spreads over _SALT tasks;
    # join input and pair stream are pinned to core-derived partition
    # counts because AQE sizes partitions from the KB-scale
    # pre-explosion map outputs (measured: the whole probe+verify
    # chain coalesced onto one task at sf0.1).
    n_par = spark.sparkContext.defaultParallelism
    salts = spark.range(_SALT).select(
        F.col("id").cast("int").alias("_salt")
    )
    probe = new_bands.crossJoin(salts)
    hist = all_bands.select(
        F.col("id").alias("id_o"),
        "band",
        "band_hash",
        F.pmod(F.xxhash64("id"), F.lit(_SALT)).cast("int").alias("_salt"),
    ).repartition(n_par, "band", "band_hash", "_salt")
    cand = (
        # no shuffle_hash hint here, deliberately (contrast with the
        # batch self-join in operators/dedup.py): broadcasting the
        # small probing batch leaves the STREAMING side = the history,
        # whose pinned hash(band, band_hash, _salt) repartition keeps
        # the quadratic emission parallel — forcing SHJ was measured
        # ~25% slower at sf0.1 (extra probe shuffle + per-partition
        # hash build for zero parallelism gain).
        probe.join(hist, ["band", "band_hash", "_salt"])
        .where(F.col("id") != F.col("id_o"))
        .select(
            F.least("id", "id_o").alias("id_a"),
            F.greatest("id", "id_o").alias("id_b"),
        )
        .repartition(n_par * 4, "id_a", "id_b")
        .dropDuplicates()
    )
    # no .distinct() here: the verify's collect_set dedupes token rows
    # itself, so replayed appends still can't inflate sizes (the same
    # guarantee the old union-distinct provided, one shuffle cheaper)
    all_tokens = old_tokens.unionByName(new_tokens)
    out = verify_jaccard_pairs(cand, all_tokens, threshold).localCheckpoint(
        eager=True
    )

    new_bands.write.mode("append").parquet(bands_dir)
    new_tokens.write.mode("append").parquet(tokens_dir)
    return out
