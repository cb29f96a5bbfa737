"""Vectorized per-turn mention/triple extraction.

The reference parses each GFF line record-at-a-time with parser
combinators (GffParser.scala:17-22, 102-122). Here the analogous
text->mentions step runs as an Arrow-batched pandas UDF (the north_star's
"vectorized batch extraction"), with a pure-Catalyst relational variant
(`regexp_extract_all` + higher-order `transform`) used for cross-checking
and for plans where staying 100% JVM-side wins.

Both return, per turn, ``array<struct<pos:int, alias:string>>`` in text
encounter order (quirk Q4: encounter order is semantic).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MENTION_PATTERN = r"<<m:([A-Za-z0-9_.\-]+)>>"
_MENTION_RE = re.compile(MENTION_PATTERN)

MENTION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("alias", T.StringType(), False),
        ]
    )
)


@F.pandas_udf(MENTION_SCHEMA)
def extract_mentions_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched extraction: one regex sweep per batch via the
    vectorized ``str.findall``, then a cheap per-row struct build."""
    found = text.fillna("").str.findall(_MENTION_RE)
    return found.map(
        lambda aliases: [
            {"pos": i, "alias": a.lower()} for i, a in enumerate(aliases)
        ]
    )


def extract_mentions_sql(text: Column) -> Column:
    """Pure-JVM equivalent: regexp_extract_all + indexed transform.
    Stays inside whole-stage codegen; used to verify the UDF and as the
    fast path when the extraction grammar is regular."""
    arr = F.regexp_extract_all(text, F.lit(MENTION_PATTERN), F.lit(1))
    return F.transform(
        arr,
        lambda x, i: F.struct(
            i.cast("int").alias("pos"), F.lower(x).alias("alias")
        ),
    )
