"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is end-to-end KG-pipeline throughput in turns/sec
(the north_rule metric); per-query wall times cover the operator
families. Each query is forced with a cheap count-style action so the
full plan executes but nothing large lands on the driver.

Scaling protocol (BASELINE.md): run this twice, SPARK_GRAFT_CPUS=8 and
=32, same input; efficiency = (throughput_32 / throughput_8) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from gfftoneo4j_spark.queries import QUERIES  # noqa: E402
from gfftoneo4j_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "kg_triples",  # flagship: full extract->link->canonicalize->materialize
    "kg_transcripts",
    "cc_components",
    "broadcast_join",
    "hierarchy_rollup",
    "window_lead_pairs",
    "topk_per_group",
    "dedup_exact",
    "ngram_jaccard",
    "simhash_signatures",
    "embedding_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "duplicate_spans",
    # ngram_jaccard_banded is gate-only: the synthetic corpus is
    # near-dup-DENSE (tiny vocab), so its true pair set is ~quadratic
    # and the wall measures answer size, not operator efficiency
    "repetition_scores",
    "graph_khop",
    "graph_pagerank",
    "text_analysis",
    "hourly_rollup",
    "sessionize_events",
    "asof_join_events",
    "tfidf_topk",
]


def _force(df) -> int:
    """Execute the whole plan without collecting rows to the driver.

    A bare count(1) would let Catalyst prune every computed column, so
    pure-projection queries would "bench" a scan. Hash-aggregating the
    full row keeps every output expression live (and costs one xxhash64
    per row, negligible next to the work being measured)."""
    hashable = [c for c, t in df.dtypes if not t.startswith("map")]
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # xxhash64 over the output columns defeats column pruning; pmod
        # keeps the running sum far from ANSI LongType overflow
        F.sum(F.pmod(F.xxhash64(*hashable), F.lit(1_000_003))).alias("h"),
    ).collect()[0]
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app="gfftoneo4j-bench", cpus=cpus)

    # warm the JVM/Arrow paths so per-query numbers measure the plan,
    # not first-job initialization: the flagship pipeline compiles the
    # whole-stage-codegen classes (windows, joins, explodes) and spins
    # the Arrow python worker pool that most other queries reuse
    _force(QUERIES["kg_triples"](spark, sf_dir))

    n_turns = _force(QUERIES["kg_transcripts"](spark, sf_dir))

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _force(QUERIES[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)

    flagship = times["kg_triples"]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "n_turns": n_turns,
                "kg_turns_per_sec": round(n_turns / flagship, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
