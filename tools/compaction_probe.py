#!/usr/bin/env python
"""Compaction economics probe (r11 VERDICT ask #2's SCALE.md row):
build a dedup store, apply N small delta appends (the daily-ingest
cadence in miniature — each append lands a few small parquet files
per artifact), then time the RECURRING operation (a fresh
``dedup_delta`` probe, append=False) against the fragmented store vs
the compacted store. Prints one JSON line.

Usage:
    python tools/compaction_probe.py [--sf-dir /root/testdata/sf0.1]
        [--appends 20] [--runs 3] [--semantic]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from commodity_price_forecasting_spark.session import get_spark  # noqa: E402
from commodity_price_forecasting_spark.sources.readers import load_table  # noqa: E402


def _best(fn, runs):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return {"best": round(min(times), 3), "med": round(sorted(times)[len(times) // 2], 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--appends", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--semantic", action="store_true")
    ap.add_argument("--workdir", default="/tmp/compaction_probe")
    ap.add_argument("--driver-mem", default="24g")
    args = ap.parse_args()

    spark = get_spark(app_name="compaction-probe", master="local[32]",
                      shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": args.driver_mem})
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)
    out = {"sf_dir": args.sf_dir, "appends": args.appends}

    if args.semantic:
        from commodity_price_forecasting_spark.operators.semantic_store import (
            semantic_dedup_delta,
            semantic_store_build,
        )
        from commodity_price_forecasting_spark.operators.store_maintenance import (
            semantic_store_compact,
            semantic_store_health,
        )

        emb = load_table(spark, args.sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        max_id = emb.agg(F.max("vec_id")).first()[0]
        cut = (max_id * 3) // 5
        path = os.path.join(args.workdir, "sem_store")
        semantic_store_build(emb.filter(F.col("vec_id") < cut), path,
                             k=16, threshold=0.3, assign="blas")
        # N appends over the next 20%, sliced evenly
        hi = (max_id * 4) // 5
        step = max(1, (hi - cut) // args.appends)
        for i in range(args.appends):
            lo = cut + i * step
            semantic_dedup_delta(
                spark, path,
                emb.filter(F.col("vec_id").between(lo, lo + step - 1)),
                assign="blas",
            )
        probe = emb.filter(F.col("vec_id") > hi)
        run = lambda: semantic_dedup_delta(  # noqa: E731
            spark, path, probe, append=False, assign="blas"
        )["verdicts"].count()
        run()  # warm
        h0 = semantic_store_health(spark, path)
        out["files_before"] = h0["artifacts"]["cells"]["n_files"]
        out["probe_fragmented"] = _best(run, args.runs)
        t0 = time.perf_counter()
        semantic_store_compact(spark, path)
        out["compact_sec"] = round(time.perf_counter() - t0, 3)
        out["files_after"] = semantic_store_health(spark, path)["artifacts"][
            "cells"
        ]["n_files"]
        run()  # rewarm post-compaction plans
        out["probe_compacted"] = _best(run, args.runs)
    else:
        from commodity_price_forecasting_spark.operators.dedup_store import (
            dedup_delta,
            dedup_store_build,
        )
        from commodity_price_forecasting_spark.operators.store_maintenance import (
            dedup_store_compact,
            dedup_store_health,
        )

        docs = load_table(spark, args.sf_dir, "documents")
        max_id = docs.agg(F.max("doc_id")).first()[0]
        cut = (max_id * 3) // 5
        path = os.path.join(args.workdir, "dedup_store")
        dedup_store_build(docs.filter(F.col("doc_id") < cut), path)
        hi = (max_id * 4) // 5
        step = max(1, (hi - cut) // args.appends)
        for i in range(args.appends):
            lo = cut + i * step
            dedup_delta(
                spark, path,
                docs.filter(F.col("doc_id").between(lo, lo + step - 1)),
            )
        probe = docs.filter(F.col("doc_id") > hi)
        run = lambda: dedup_delta(  # noqa: E731
            spark, path, probe, append=False
        )["verdicts"].count()
        run()  # warm
        h0 = dedup_store_health(spark, path)
        out["files_before"] = {
            k: v["n_files"] for k, v in h0["artifacts"].items()
        }
        out["compact_recommended"] = h0["compact_recommended"]
        out["probe_fragmented"] = _best(run, args.runs)
        t0 = time.perf_counter()
        dedup_store_compact(spark, path)
        out["compact_sec"] = round(time.perf_counter() - t0, 3)
        h1 = dedup_store_health(spark, path)
        out["files_after"] = {
            k: v["n_files"] for k, v in h1["artifacts"].items()
        }
        run()  # rewarm post-compaction plans
        out["probe_compacted"] = _best(run, args.runs)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
