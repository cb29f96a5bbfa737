"""Multimodal envelope plumbing: schema, mapInPandas batching,
deterministic fake decode, frame sampling. The decode itself is stubbed
(codec libs absent) — these tests pin the Spark-side contract a real
decoder drops into."""

import hashlib

import pytest
from pyspark.sql import functions as F

from gfftoneo4j_spark.operators.multimodal import (
    DECODED_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    documents_as_media,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return documents_as_media(docs).persist()


def _names_types(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_media_envelope_schema(media):
    # nullability is planner-inferred; the contract is names + types
    assert _names_types(media.schema) == _names_types(MEDIA_SCHEMA)
    row = media.orderBy("media_id").first()
    assert isinstance(row.content, (bytes, bytearray))
    assert set(row.meta) == {"lang", "source"}


def test_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_extract_features_deterministic(media, spark):
    feats = extract_features(media, partitions=4)
    assert _names_types(feats.schema) == _names_types(DECODED_SCHEMA)
    rows = {r.media_id: r for r in feats.collect()}
    src = {r.media_id: bytes(r.content) for r in media.collect()}
    assert rows.keys() == src.keys()
    some = sorted(rows)[0]
    assert rows[some].n_bytes == len(src[some])
    assert rows[some].content_sha == hashlib.sha256(src[some]).hexdigest()
    # histogram is L1-normalized over 16 buckets
    assert len(rows[some].features) == 16
    assert abs(sum(rows[some].features) - 1.0) < 1e-3
    # re-running yields identical output (content-addressed, no RNG)
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert again[some].features == rows[some].features


def test_frame_sample_slices(media):
    frames = frame_sample(media, n_frames=4, frame_bytes=64)
    pdf = frames.where(F.col("media_id") == "doc:0").orderBy("frame_idx").collect()
    src = bytes(media.where(F.col("media_id") == "doc:0").first().content)
    assert [r.frame_idx for r in pdf] == list(range(len(pdf)))
    step = max(len(src) // 4, 1)
    for r in pdf:
        off = r.frame_idx * step
        assert bytes(r.frame) == src[off : off + 64]


def test_decode_fn_injection(media):
    """A deployment's real decoder drops into the same mapInPandas
    slot: inject a custom batch fn + schema and get its output through
    identical plumbing (no module edits)."""
    import pandas as pd
    from pyspark.sql import types as T

    custom_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("first_byte", T.IntegerType(), True),
        ]
    )

    def first_byte_decoder(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "first_byte": pdf["content"].map(
                        lambda b: int(b[0]) if b else -1
                    ),
                }
            )

    out = extract_features(media, decode_fn=first_byte_decoder, schema=custom_schema)
    rows = {r.media_id: r.first_byte for r in out.collect()}
    src = {r.media_id: bytes(r.content) for r in media.collect()}
    assert rows.keys() == src.keys()
    assert all(rows[m] == src[m][0] for m in rows)
