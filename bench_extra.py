"""Extra benchmark harness (guide §1.4): isolate named queries with the
noop sink so the computation is timed, not the collect/driver path.

Usage: python bench_extra.py <query> [query ...]
Env: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     $SPARK_GRAFT_CPUS, $SPARK_GRAFT_BENCH_REPS (default 3).

Prints one JSON line {"queries": {name: [walls...]}, "sf_dir": ...}.
This file is NOT the driver bench contract — bench.py is frozen; this
exists for optimization-round measurement only (OPTIMIZATION_r06.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gfftoneo4j_spark.queries import QUERIES  # noqa: E402
from gfftoneo4j_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    names = sys.argv[1:]
    spark = get_spark(app="bench-extra", cpus=cpus)

    def drop_cached() -> None:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist()

    walls: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        ws = []
        for _ in range(reps):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ws.append(round(time.time() - t0, 3))
            drop_cached()
        walls[name] = ws
        print(f"{name}: {ws}", file=sys.stderr)
    print(json.dumps({"queries": walls, "sf_dir": sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
