#!/usr/bin/env python
"""Run one registered query with Spark event logging on and print a
per-job wall/desc breakdown plus gaps (driver-side time between jobs)
— the guide §1 'where is the time going' instrument for lanes whose
interior is many small jobs rather than one big stage.

Usage: lane_jobs.py <query> [--runs=N]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commodity_price_forecasting_spark.plans.registry import load_all  # noqa: E402
from commodity_price_forecasting_spark.session import (  # noqa: E402
    ensure_package_shipped,
    get_spark,
)


def main() -> None:
    name = sys.argv[1]
    runs = 1
    for a in sys.argv[2:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = tempfile.mkdtemp(prefix="cpf-evlog-")
    spark = get_spark(
        app_name=f"cpf-lane-jobs-{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    ensure_package_shipped(spark)
    spec = load_all()[name]
    spec.fn(spark, "/root/testdata/sf0.001").count()  # classload warm
    spec.fn(spark, sf_dir).count()  # target-SF warm
    marks = []
    for i in range(runs):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"RUN{i}")
        spec.fn(spark, sf_dir).count()
        marks.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    print(f"wall per run: {[round(m, 3) for m in marks]}")
    log = os.path.join(evdir, app_id)
    if not os.path.exists(log):
        # Spark 4 rolling event-log layout
        v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        log = next(
            os.path.join(v2, f)
            for f in sorted(os.listdir(v2))
            if f.startswith("events_")
        )
    jobs = {}
    with open(log) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:90],
                    "stages": len(ev.get("Stage IDs", [])),
                    "tasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
    ordered = sorted(jobs.items())
    prev_end = None
    for jid, j in ordered:
        if "end" not in j:
            continue
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        dur = (j["end"] - j["start"]) / 1000.0
        if not j["desc"].startswith("RUN"):
            prev_end = j["end"]
            continue
        print(
            f"job {jid:4d} dur {dur:7.3f}s gap {gap:7.3f}s "
            f"stages {j['stages']:2d} tasks {j['tasks']:4d}  {j['desc']}"
        )
        prev_end = j["end"]


if __name__ == "__main__":
    main()
