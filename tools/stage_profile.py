"""Per-stage scaling profile: times isolated pipeline stages at one
parallelism level (run it twice, diff the levels) to find what refuses
to scale. Usage: python tools/stage_profile.py <cpus> [corpus_dir]"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gfftoneo4j_spark.functions.extraction import (  # noqa: E402
    extract_mentions_sql,
    extract_mentions_udf,
)
from gfftoneo4j_spark.operators.windows import stable_turn_order  # noqa: E402
from gfftoneo4j_spark.session import get_spark  # noqa: E402
from gfftoneo4j_spark.sources.transcripts import read_transcripts  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kg_scaling_corpus"
    spark = get_spark(
        app=f"profile-{cpus}",
        cpus=cpus,
        extra={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "256k",
        },
    )
    t = read_transcripts(spark, os.path.join(corpus, "transcripts.parquet"))
    t.limit(10_000).select(F.count(F.lit(1))).collect()  # warm-up

    out = {"cpus": cpus}

    def timeit(name, df):
        t0 = time.time()
        df.select(F.count(F.lit(1))).collect()
        out[name] = round(time.time() - t0, 2)

    timeit("scan_only", t)
    timeit(
        "extract_udf",
        t.select(F.explode(extract_mentions_udf(F.col("text"))).alias("m")),
    )
    timeit(
        "extract_sql",
        t.select(F.explode(extract_mentions_sql(F.col("text"))).alias("m")),
    )
    w = stable_turn_order()
    timeit(
        "window_lead",
        t.select("conv_id", F.lead("turn_idx").over(w).alias("nx")),
    )
    timeit(
        "dropdup_17m",
        t.select(
            F.col("conv_id").alias("src"),
            F.col("turn_idx").cast("string").alias("dst"),
            F.col("role").alias("type"),
        ).dropDuplicates(["src", "dst", "type"]),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
