"""Per-stage scaling profile of the FULL pipeline at real executor
cluster sizes (north_rule diagnosis tool).

Runs build_kg -> triples count on local-cluster[W,8,8192] and, after the
measured execution, pulls per-stage metrics from Spark's status REST API:
wall, summed executor run/CPU time, shuffle read/write bytes, task count
and task-time quantiles (straggler/skew detection). Comparing the same
table at W=1 vs W=4 shows exactly which stage refuses to scale.

Usage:
  python tools/cluster_profile.py                     # orchestrate 1,4 x pandas
  python tools/cluster_profile.py --extraction sql    # JVM-only extraction
  python tools/cluster_profile.py --run --executors 4 --extraction pandas
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _get_json(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def _stage_rows(ui: str, app_id: str, after_ms: float) -> list[dict]:
    stages = _get_json(
        f"{ui}/api/v1/applications/{app_id}/stages"
        "?status=complete&withSummaries=true&quantiles=0.0,0.5,1.0"
    )
    rows = []
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if sub is None:
            continue
        sub_ms = time.mktime(
            time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")
        ) * 1000.0
        if sub_ms < after_ms:
            continue
        comp = s.get("completionTime")
        wall = None
        if comp:
            wall = (
                time.mktime(time.strptime(comp[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
                - sub_ms
            ) / 1000.0
        dist = (s.get("taskMetricsDistributions") or {}).get("executorRunTime")
        rows.append(
            {
                "stage": s["stageId"],
                "name": (s.get("name") or "")[:60],
                "tasks": s.get("numCompleteTasks"),
                "wall_s": wall,
                "run_s": round(s.get("executorRunTime", 0) / 1000.0, 1),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "shuf_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuf_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "gc_s": round(s.get("jvmGcTime", 0) / 1000.0, 1),
                "task_ms_min_med_max": [round(q) for q in dist] if dist else None,
            }
        )
    rows.sort(key=lambda r: r["stage"])
    return rows


def run_once(
    executors: int,
    corpus: str,
    extraction: str,
    measured: int,
    conf: list[str] | None = None,
) -> None:
    from pyspark.sql import functions as F

    from gfftoneo4j_spark.plans.pipeline import build_kg
    from gfftoneo4j_spark.session import get_spark
    from gfftoneo4j_spark.sources.transcripts import (
        read_alias_dict,
        read_transcripts,
    )

    os.environ["PYTHONPATH"] = REPO
    extra = {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "512k",
        "spark.executorEnv.PYTHONPATH": REPO,
        "spark.ui.enabled": "true",  # profiler reads the status REST API
    }
    for kv in conf or []:
        k, v = kv.split("=", 1)
        extra[k] = v
    spark = get_spark(
        app=f"profile-{executors}x8-{extraction}",
        master=f"local-cluster[{executors},8,8192]",
        extra=extra,
    )
    sc = spark.sparkContext
    t = read_transcripts(spark, os.path.join(corpus, "transcripts.parquet"))
    d = read_alias_dict(spark, os.path.join(corpus, "alias_dict.parquet"))
    def fresh_agg():
        # a NEW DataFrame per execution: re-collecting the same object
        # would reuse its RDD's shuffle map outputs (stage skipping) and
        # measure nothing
        res = build_kg(spark, t, d, extraction=extraction)
        return res.triples.select(F.count(F.lit(1)))

    fresh_agg().collect()  # warm-up (JIT + python worker pool spin-up)
    walls = []
    t_mark = time.time() * 1000.0
    for _ in range(measured):
        t0 = time.time()
        n = fresh_agg().collect()[0][0]
        walls.append(round(time.time() - t0, 2))
    rows = _stage_rows(sc.uiWebUrl, sc.applicationId, t_mark)
    print(
        json.dumps(
            {
                "executors": executors,
                "extraction": extraction,
                "walls": walls,
                "n_triples": n,
                "stages": rows,
            }
        )
    )


def orchestrate(corpus: str, extraction: str, executors_list: list[int], measured: int):
    results = {}
    for ex in executors_list:
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--run",
                "--executors",
                str(ex),
                "--corpus",
                corpus,
                "--extraction",
                extraction,
                "--measured",
                str(measured),
            ],
            capture_output=True,
            text=True,
            check=False,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-3000:], out.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"profile run at executors={ex} failed")
        results[ex] = json.loads(lines[-1])
        r = results[ex]
        print(f"\n== {ex} executors x 8 ({extraction}): walls={r['walls']} ==")
        hdr = f"{'stage':>5} {'tasks':>5} {'wall':>6} {'run_s':>8} {'cpu_s':>8} {'shR_MB':>8} {'shW_MB':>8} {'in_MB':>8}  {'task ms min/med/max':>22}  name"
        print(hdr)
        for s in r["stages"]:
            q = s["task_ms_min_med_max"]
            qs = "/".join(str(x) for x in q) if q else "-"
            print(
                f"{s['stage']:>5} {s['tasks']:>5} {s['wall_s'] if s['wall_s'] is not None else -1:>6} "
                f"{s['run_s']:>8} {s['cpu_s']:>8} {s['shuf_r_mb']:>8} {s['shuf_w_mb']:>8} {s['in_mb']:>8}  {qs:>22}  {s['name']}"
            )
    out_path = os.path.join(REPO, "BENCH", f"stage_profile_{extraction}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwrote {out_path}", file=sys.stderr)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--executors", type=int, default=1)
    p.add_argument("--corpus", default="/tmp/kg_scaling_corpus")
    p.add_argument("--extraction", default="pandas")
    p.add_argument("--measured", type=int, default=2)
    p.add_argument("--executors-list", default="1,4")
    p.add_argument("--conf", action="append", default=[])
    args = p.parse_args()
    if args.run:
        run_once(
            args.executors, args.corpus, args.extraction, args.measured, args.conf
        )
    else:
        orchestrate(
            args.corpus,
            args.extraction,
            [int(c) for c in args.executors_list.split(",")],
            args.measured,
        )


if __name__ == "__main__":
    main()
