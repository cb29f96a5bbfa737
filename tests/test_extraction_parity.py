"""Property-based parity: the Arrow pandas-UDF extractor and the
pure-Catalyst (regexp_extract_all + transform) extractor must agree on
ARBITRARY text — including nulls, empties, unicode, nested/malformed
markers — because the scaling bench runs the sql path while the gate's
flagship runs the pandas path (SURVEY §2.8)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfftoneo4j_spark.functions.extraction import (
    extract_mentions_sql,
    extract_mentions_udf,
)

# text fragments biased toward the mention grammar's edge cases
_FRAGMENTS = st.sampled_from(
    [
        "<<m:", ">>", "<<m:x>>", "<<m:UP.per-Case_1>>", "<<m:>>",
        "<<m:a>><<m:b>>", "<<m: spaced >>", "<m:not>", "<<m:tail",
        "plain words ", "ünïcødé ", "\t", "<<m:dot.dash-under_score>>",
        "<<<m:nested>>>", "m:x>>", "<<m:x>> trailing", "::", "🙂",
    ]
)
_TEXTS = st.lists(
    st.one_of(_FRAGMENTS, st.text(max_size=12)), max_size=8
).map("".join)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), _TEXTS), min_size=1, max_size=40))
def test_udf_and_sql_extractors_agree(spark_global, texts):
    spark = spark_global
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        T.StructType(
            [
                T.StructField("i", T.IntegerType(), False),
                T.StructField("text", T.StringType(), True),
            ]
        ),
    )
    udf_out = {
        (r["i"], tuple((m["pos"], m["alias"]) for m in r["ms"]))
        for r in df.select("i", extract_mentions_udf("text").alias("ms")).collect()
    }
    sql_out = {
        (r["i"], tuple((m["pos"], m["alias"]) for m in (r["ms"] or [])))
        for r in df.select("i", extract_mentions_sql(F.col("text")).alias("ms")).collect()
    }
    assert udf_out == sql_out


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
