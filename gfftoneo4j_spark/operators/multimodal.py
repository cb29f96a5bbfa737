"""Multimodal column plumbing for training-data pipelines.

Image/audio/video content is carried as an opaque ``binary`` column plus
a typed string metadata map — the only schema that survives 100 TB:
content bytes never deserialize JVM-side, Arrow ships them to Python in
batches, and all filtering/routing happens on the cheap metadata columns
so parquet scans prune both rows and the (huge) content column.

The decode step itself is STUBBED: codec libraries (Pillow, ffmpeg,
librosa) are not in this container. ``decode_media`` raises
``NotImplementedError`` by design; ``fake_decode_batch`` is the
deterministic stand-in wired through the same ``mapInPandas`` plumbing
(schema, batching, partitioning) so the Spark side is real and tested.

Reference parity: the reference carries no binary payloads, but its
attributes column is the same "opaque payload + typed envelope" shape
(GffParser.scala:139 ``Either[String, Map[String,String]]``); this module
generalizes that envelope to media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical media envelope: route/filter on everything except `content`
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        # byte-histogram over 16 buckets, L1-normalized — the
        # deterministic stand-in for a real feature extractor
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapt the documents table into the media envelope (text bytes as
    the opaque payload) — the test/bench source for the plumbing."""
    return documents.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Real codec decode. Not available in this container — the
    interface exists so a deployment with Pillow/ffmpeg drops its decoder
    into the same mapInPandas slot as ``fake_decode_batch``."""
    raise NotImplementedError(
        "codec libraries (Pillow/ffmpeg/librosa) are not installed in this "
        "environment; use extract_features(media) which runs the identical "
        "Spark plumbing with a deterministic fake decoder"
    )


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic decode stand-in: per-media byte stats + a 16-bucket
    L1-normalized byte histogram. Vectorized per Arrow batch — no
    per-row Python beyond the numpy calls on each batch."""
    import numpy as np

    for pdf in batches:
        out = {
            "media_id": pdf["media_id"],
            "modality": pdf["modality"],
            "n_bytes": pdf["content"].map(
                lambda b: len(b) if b is not None else 0
            ).astype("int64"),
            "content_sha": pdf["content"].map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            ),
        }
        feats = []
        for b in pdf["content"]:
            if not b:
                feats.append([0.0] * 16)
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=16).astype("float64")
            feats.append((hist / hist.sum()).round(6).tolist())
        out["features"] = feats
        yield pd.DataFrame(out)


def extract_features(
    media: DataFrame,
    partitions: int | None = None,
    decode_fn=None,
    schema: T.StructType = DECODED_SCHEMA,
) -> DataFrame:
    """Feature extraction over the media envelope via mapInPandas.

    ``decode_fn`` is the injection point for a real decoder: any
    ``Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]`` (a Pillow/
    ffmpeg-backed batch function in a deployment that has the codecs)
    drops into the same Arrow-batched slot without editing this
    module; pass a matching ``schema`` if its output shape differs.
    Defaults to ``fake_decode_batch``, the deterministic env-blocked
    stand-in.

    ``repartition`` first when asked: media rows are MBs each, so the
    right partition count is bytes-driven, not row-count-driven —
    at scale set partitions ~= total_bytes / 128MB."""
    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(decode_fn or fake_decode_batch, schema=schema)


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Deterministic frame sampling: n evenly-spaced byte slices per
    media row (the video-keyframe pattern). Pure built-in expressions —
    slicing bytes never leaves the JVM."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    n = F.octet_length("content")
    offset = (F.col("frame_idx") * F.greatest(
        (n / n_frames).cast("long"), F.lit(1)
    ) + 1).cast("int")
    return (
        media.select("media_id", "content", idx)
        .select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.substring(F.col("content"), offset, frame_bytes).alias("frame"),
        )
        .where(F.octet_length("frame") > 0)
    )
