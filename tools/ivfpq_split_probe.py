#!/usr/bin/env python
"""IVF-PQ build-vs-probe cost split (r8 VERDICT ask #2).

The registered ``sim_ivfpq_adc_topk`` bench row times index BUILD +
probe in ONE plan — reproducible, but at 100 TB the build is a
one-off amortized cost and the probe is the recurring per-query
latency. This tool measures them separately, the way a deployment
runs them:

1. BUILD: ``ivf_pq_index`` over the embeddings table, all three index
   frames (codes / cells / cb) written to parquet — timed including
   the writes (the materialization IS part of the build).
2. PROBE: reload the index frames from parquet, run ``ivf_pq_probe``
   for the query vector, collect top-k — timed alone, best-of-N after
   one warm-up (codegen/JIT discipline per SCALE.md).

Usage:
  python tools/ivfpq_split_probe.py --sf-dir /root/testdata/sf0.1
  python tools/ivfpq_split_probe.py --sf-dir .scratch/sf1 --runs 3

Prints one JSON line: {"sf_dir":..., "n_vectors":..., "build_sec":...,
"probe_sec":..., "probe_runs": [...], "rows": k}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commodity_price_forecasting_spark.operators.similarity import (
    ivf_pq_index,
    ivf_pq_index_load,
    ivf_pq_index_write,
    ivf_pq_probe,
)
from commodity_price_forecasting_spark.session import get_spark
from commodity_price_forecasting_spark.sources.readers import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--query-id", type=int, default=0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-probe", type=int, default=2)
    ap.add_argument("--driver-mem", default="24g")
    args = ap.parse_args()

    spark = get_spark(
        app_name="cpf-ivfpq-split",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={"spark.driver.memory": args.driver_mem},
    )
    emb = load_table(spark, args.sf_dir, "embeddings")
    n = emb.count()
    q = [
        float(x)
        for x in emb.filter(f"vec_id = {args.query_id}")
        .select("embedding")
        .first()[0]
    ]

    out_dir = tempfile.mkdtemp(prefix="ivfpq-index-")
    try:
        # --- BUILD (timed once: a deployment builds once) ---------------
        # flat layout (r8 shape: three plain parquet dirs)
        t0 = time.perf_counter()
        idx = ivf_pq_index(emb, exclude_id=args.query_id)
        for part in ("codes", "cells", "cb"):
            idx[part].write.mode("overwrite").parquet(
                os.path.join(out_dir, part)
            )
        build_sec = time.perf_counter() - t0
        # cell-partitioned layout (r9: codes ⋈ cells partitionBy cell —
        # probes become static partition-pruned scans). Timed apart so
        # the layout's extra join+write cost is visible.
        t0 = time.perf_counter()
        ivf_pq_index_write(idx, os.path.join(out_dir, "part"))
        build_part_sec = time.perf_counter() - t0
        idx["res"].unpersist()

        # --- PROBE (reloaded index; warm-up + best-of-N) ----------------
        flat = dict(
            idx,
            codes=spark.read.parquet(os.path.join(out_dir, "codes")),
            cells=spark.read.parquet(os.path.join(out_dir, "cells")),
            cb=spark.read.parquet(os.path.join(out_dir, "cb")),
        )
        pruned = ivf_pq_index_load(spark, os.path.join(out_dir, "part"))

        def one_probe(index: dict) -> tuple[float, int]:
            t = time.perf_counter()
            rows = ivf_pq_probe(
                index, q, k=args.k, n_probe=args.n_probe
            ).collect()
            return time.perf_counter() - t, len(rows)

        results = {}
        n_rows = 0
        for name, index in (("flat", flat), ("pruned", pruned)):
            one_probe(index)  # warm-up (codegen/JIT)
            runs = []
            for _ in range(args.runs):
                sec, n_rows = one_probe(index)
                runs.append(round(sec, 4))
            results[name] = runs
        print(
            json.dumps(
                {
                    "sf_dir": args.sf_dir,
                    "n_vectors": n,
                    "build_sec": round(build_sec, 3),
                    "build_partitioned_sec": round(build_part_sec, 3),
                    "probe_sec": min(results["flat"]),
                    "probe_pruned_sec": min(results["pruned"]),
                    "probe_runs": results["flat"],
                    "probe_pruned_runs": results["pruned"],
                    "rows": n_rows,
                }
            )
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
