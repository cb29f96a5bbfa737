"""Dump .explain("formatted") for named queries to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> <suffix> <query> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query.

$SPARK_GRAFT_SF_DIR selects the data dir (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfftoneo4j_spark.queries import QUERIES  # noqa: E402
from gfftoneo4j_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app="plan-dump")
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {n}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
