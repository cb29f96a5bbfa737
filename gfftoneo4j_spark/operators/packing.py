"""Sequence packing: assign documents to fixed-capacity token bins.

LLM pretraining concatenates documents into fixed-length context
windows ("sequence packing"); the distributed form shards the corpus,
then packs each shard independently with a streaming next-fit policy:
walk the shard's documents in a deterministic order, keep a running
fill, and open a new bin whenever the next document would overflow the
capacity. A document larger than the capacity still gets its own bin
(it is truncated downstream by the tokenizer, not here).

Spark shape: ``applyInPandas`` over the shard key. Packing is
inherently sequential *within* a bin stream, so the parallelism unit is
the shard — exactly how a 1000-executor packer works at 100 TB: one
task per shard, zero cross-shard coordination, one shuffle total (the
groupBy on the shard key), per-shard state is two integers. Skewed
shards are impossible by construction when the shard key is a hash/mod
of the document id.

The per-group Python loop is Arrow-batched and touches only two numpy
arrays; its cost is linear in shard size and negligible next to the
shuffle that feeds it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "shard bigint, doc_id bigint, tok bigint, bin bigint, fill bigint"
)


def pack_next_fit(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    shard_col: str = "shard",
) -> DataFrame:
    """Next-fit packing of ``df`` rows into bins of ``capacity`` tokens.

    Returns (shard, doc_id, tok, bin, fill): ``bin`` is the 0-based bin
    ordinal within the shard, ``fill`` the bin's running token total
    AFTER this document was placed. Deterministic: documents are packed
    in ascending ``id_col`` order within each shard.
    """

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[tok_col].to_numpy()
        bins = [0] * len(toks)
        fills = [0] * len(toks)
        b, fill = 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if fill > 0 and fill + t > capacity:
                b, fill = b + 1, 0
            fill += t
            bins[i], fills[i] = b, fill
        out = pdf[[shard_col, id_col, tok_col]].copy()
        out.columns = ["shard", "doc_id", "tok"]
        out["bin"] = bins
        out["fill"] = fills
        return out

    cols = [shard_col, id_col, tok_col]
    return df.select(*cols).groupBy(shard_col).applyInPandas(_pack, OUT_SCHEMA)
