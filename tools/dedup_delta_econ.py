#!/usr/bin/env python
"""Delta-dedup economics (r10 VERDICT #2, the dedup sibling of the
``ivf_pq_index_append`` economics table): a growing corpus can either
(a) rerun full dedup over old ∪ delta every ingest, or (b) keep a
persisted signature store and dedup only the delta against it
(``operators/dedup_store.dedup_delta``). This tool measures both at
two delta shapes so the rebuild-vs-append decision is a measured one:

- 10% delta — the daily-ingest shape the store exists for;
- 100% delta (corpus doubles) — the stress shape where the delta
  itself is corpus-sized and the store's advantage should shrink.

Per cell it reports wall seconds for:
- ``full_rebuild``  — dedup_store_build over old ∪ delta (what a
  storeless pipeline pays every run);
- ``delta``         — dedup_delta against the pre-built store
  (the recurring incremental cost; the store build is the amortized
  one-off, timed separately as ``store_build``).

plus verdict-set equality vs the full rebuild (the correctness gate
run inline so a fast-but-wrong cell can't enter SCALE.md).

Usage:
  python tools/dedup_delta_econ.py [--sf-dir /root/testdata/sf0.1]
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

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--driver-mem",
        default="24g",
        help="local-mode JVM heap; the 1g default dies at sf>=1 corpora",
    )
    args = ap.parse_args()

    from commodity_price_forecasting_spark.operators.dedup import (
        content_fingerprint,
    )
    from commodity_price_forecasting_spark.operators.dedup_store import (
        dedup_delta,
        dedup_store_build,
        dedup_store_load,
    )
    from commodity_price_forecasting_spark.session import get_spark

    spark = get_spark(
        app_name="dedup-delta-econ",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.driver.memory": args.driver_mem},
    )
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    max_id = docs.agg(F.max("doc_id")).first()[0]

    results = []
    for label, frac_old in (("10pct_delta", 10, ), ("100pct_delta", 2)):
        cut = (max_id * (frac_old - 1)) // frac_old
        old = docs.filter(F.col("doc_id") < cut)
        delta = docs.filter(F.col("doc_id") >= cut)
        n_old, n_delta = old.count(), delta.count()
        work = tempfile.mkdtemp(prefix="dedup_econ_")
        try:
            t0 = time.perf_counter()
            dedup_store_build(old, os.path.join(work, "store"))
            t_store = time.perf_counter() - t0

            t0 = time.perf_counter()
            res = dedup_delta(
                spark, os.path.join(work, "store"), delta, append=True
            )
            verdicts = {
                (r["doc_id"], r["status"], r["dup_of"])
                for r in res["verdicts"].collect()
            }
            t_delta = time.perf_counter() - t0

            t0 = time.perf_counter()
            dedup_store_build(docs, os.path.join(work, "full"))
            t_full = time.perf_counter() - t0

            # inline correctness: delta verdicts == full-rebuild decision
            full = dedup_store_load(spark, os.path.join(work, "full"))
            fp = delta.select(
                "doc_id", content_fingerprint(F.col("text")).alias("fp")
            )
            ref = fp.join(
                full["fingerprints"].select(
                    "fp",
                    F.col("doc_id").alias("_h"),
                    F.col("canon_id").alias("_c"),
                ),
                "fp",
            ).select(
                "doc_id",
                F.when(F.col("_h") < F.col("doc_id"), F.lit("exact_dup"))
                .when(F.col("_c") < F.col("doc_id"), F.lit("near_dup"))
                .otherwise(F.lit("kept"))
                .alias("status"),
                F.when(
                    (F.col("_h") < F.col("doc_id"))
                    | (F.col("_c") < F.col("doc_id")),
                    F.col("_c"),
                ).alias("dup_of"),
            )
            want = {
                (r["doc_id"], r["status"], r["dup_of"]) for r in ref.collect()
            }
            n_bridges = res["bridges"].count()
            equal = verdicts == want
            results.append(
                {
                    "cell": label,
                    "n_old": n_old,
                    "n_delta": n_delta,
                    "store_build_s": round(t_store, 3),
                    "delta_s": round(t_delta, 3),
                    "full_rebuild_s": round(t_full, 3),
                    "speedup_vs_rebuild": round(t_full / t_delta, 2),
                    "verdicts_equal_full": equal,
                    "n_bridges": n_bridges,
                }
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(results, indent=2))
    if not all(r["verdicts_equal_full"] for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
