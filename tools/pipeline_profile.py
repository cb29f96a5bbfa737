"""Attribute full-pipeline wall time to individual build_kg stages at a
given parallelism. Usage: python tools/pipeline_profile.py <cpus>"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gfftoneo4j_spark.plans.pipeline import build_kg  # noqa: E402
from gfftoneo4j_spark.session import get_spark  # noqa: E402
from gfftoneo4j_spark.sources.transcripts import (  # noqa: E402
    read_alias_dict,
    read_transcripts,
)


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kg_scaling_corpus"
    spark = get_spark(
        app=f"pprof-{cpus}",
        cpus=cpus,
        extra={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "256k",
        },
    )
    t = read_transcripts(spark, os.path.join(corpus, "transcripts.parquet"))
    d = read_alias_dict(spark, os.path.join(corpus, "alias_dict.parquet"))
    t.limit(10_000).select(F.count(F.lit(1))).collect()

    out = {"cpus": cpus}
    t_all0 = time.time()
    res = build_kg(spark, t, d, extraction="pandas")

    def timeit(name, df):
        t0 = time.time()
        n = df.select(F.count(F.lit(1))).collect()[0][0]
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}

    timeit("turns", res.turns)  # scan + filter + persist materialization
    timeit("mentions_linked", res.mentions_linked)  # UDF + link + persist
    timeit("edges", res.edges)  # windows + explode + union + dropdup
    timeit("triples", res.triples)  # reuses edges plan (not cached!)
    out["total_sec"] = round(time.time() - t_all0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
