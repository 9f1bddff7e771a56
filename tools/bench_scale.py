#!/usr/bin/env python
"""Scale / curvature bench with shuffle-byte capture (VERDICT r4 asks
#4 and #7): times registry queries at an arbitrary sf dir and records
per-query shuffle-read bytes from the Spark UI REST API — the
aggregate-pressure number a wall-clock-only sweep can't show.

Usage:
  python tools/bench_scale.py --sf-dir .scratch/sf0.5              # bench tag
  python tools/bench_scale.py --sf-dir .scratch/sf0.5 -q a -q b    # explicit
  python tools/bench_scale.py --runs 2 ...                         # best-of-n

Prints one JSON line per query:
  {"query": ..., "sec": ..., "rows": ..., "shuffle_read_mb": ...,
   "shuffle_write_mb": ..., "sf_dir": ...}
and a final totals line. Shuffle bytes are attributed by diffing the
completed-stage set before/after each query (runs=1 keeps the
attribution exact; with runs>1 bytes are per-run medians of identical
plans so the best-run attribution still holds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commodity_price_forecasting_spark.plans.registry import load_all
from commodity_price_forecasting_spark.session import get_spark


def _stages(ui_url: str, app_id: str) -> dict[tuple[int, int], dict]:
    url = f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        data = json.load(r)
    return {(s["stageId"], s["attemptId"]): s for s in data}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scratch/sf0.5")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("-q", "--query", action="append", default=[])
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--driver-mem",
        default="24g",
        help="local-mode JVM heap; the 1g default thrashes GC at sf>=0.5",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="cpf-bench-scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.driver.memory": args.driver_mem,
        },
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    registry = load_all()
    names = args.query or sorted(
        n for n, s in registry.items() if "bench" in s.tags
    )
    missing = [n for n in names if n not in registry]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    if os.path.isdir(args.warm_dir):
        for n in names:
            registry[n].fn(spark, args.warm_dir).count()

    total_sec, total_read = 0.0, 0
    for n in names:
        seen = _stages(ui, app_id) if ui else {}
        best, rows, read_b, write_b = float("inf"), 0, 0, 0
        for run in range(args.runs):
            t0 = time.perf_counter()
            rows = registry[n].fn(spark, args.sf_dir).count()
            dt = time.perf_counter() - t0
            if dt < best:
                best = dt
            if run == 0 and ui:
                now = _stages(ui, app_id)
                fresh = [s for k, s in now.items() if k not in seen]
                read_b = sum(s.get("shuffleReadBytes", 0) for s in fresh)
                write_b = sum(s.get("shuffleWriteBytes", 0) for s in fresh)
        total_sec += best
        total_read += read_b
        print(
            json.dumps(
                {
                    "query": n,
                    "sec": round(best, 3),
                    "rows": rows,
                    "shuffle_read_mb": round(read_b / 1e6, 2),
                    "shuffle_write_mb": round(write_b / 1e6, 2),
                    "sf_dir": args.sf_dir,
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "query": "_TOTAL",
                "sec": round(total_sec, 3),
                "n_queries": len(names),
                "shuffle_read_mb": round(total_read / 1e6, 2),
                "sf_dir": args.sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
