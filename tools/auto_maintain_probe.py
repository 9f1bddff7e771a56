#!/usr/bin/env python
"""Sustained auto-maintenance probe (r12 VERDICT "what's missing" #4
/ r13 ask #6): run MANY availableNow drains of the curation ingest —
each drain lands one feed file and, on the maintained twin, ends with
the post-drain health + compact-if-recommended hook
(``run_curation_stream(auto_maintain=True)``). Records per-drain wall
and live-partition / file counts for the maintained twin vs the
unmaintained (fragmenting) twin, so the hook's claim is a measured
curve, not an assertion: bounded file counts and flat drain latency
vs unbounded growth.

Feed: slices of the sf documents table, ``docs-<i>.parquet`` per
drain, ids monotone (the synthetic clock's contract). Prints one JSON
line with the two per-drain series.

Usage:
    python tools/auto_maintain_probe.py [--sf-dir /root/testdata/sf0.1]
        [--drains 12] [--docs-per-drain 500]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from commodity_price_forecasting_spark.operators.store_maintenance import (  # noqa: E402
    curation_store_health,
    read_curated_corpus,
)
from commodity_price_forecasting_spark.session import get_spark  # noqa: E402
from commodity_price_forecasting_spark.sources.readers import load_table  # noqa: E402
from commodity_price_forecasting_spark.streaming.curation_stream import (  # noqa: E402
    run_curation_stream,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--drains", type=int, default=12)
    ap.add_argument("--docs-per-drain", type=int, default=500)
    ap.add_argument(
        "--base-docs", type=int, default=0,
        help="ingest this many docs as one initial drain before the "
        "loop — the mature-store shape where tiered (minor) "
        "compaction pays: small drains against a big base",
    )
    ap.add_argument("--workdir", default="/tmp/auto_maintain_probe")
    args = ap.parse_args()

    spark = get_spark(
        app_name="auto-maintain-probe", master="local[32]",
        shuffle_partitions=32,
    )
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)

    docs = (
        load_table(spark, args.sf_dir, "documents")
        .orderBy("doc_id")
        .limit(args.base_docs + args.drains * args.docs_per_drain)
        .collect()
    )
    base_docs, docs = docs[: args.base_docs], docs[args.base_docs :]
    twins = {}
    for name in ("auto", "raw"):
        d = os.path.join(args.workdir, name)
        twins[name] = {
            "feed": os.path.join(d, "feed"),
            "store": os.path.join(d, "store"),
            "corpus": os.path.join(d, "corpus"),
            "ck": os.path.join(d, "ck"),
            "wall": [],
            "live_parts": [],
            "n_files": [],
            "rewritten": [],  # bytes the hook's compactions rewrote
            "corpus_bytes": [],
            "n_commit_files": [],  # r14: marker rollup keeps this O(live)
        }
        os.makedirs(twins[name]["feed"])

    if base_docs:
        tbl0 = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in base_docs], pa.int64()),
                "text": [r["text"] for r in base_docs],
                "lang": [r["lang"] for r in base_docs],
                "source": [r["source"] for r in base_docs],
                "n_chars": pa.array(
                    [len(r["text"]) for r in base_docs], pa.int64()
                ),
            }
        )
        for name, t in twins.items():
            pq.write_table(tbl0, os.path.join(t["feed"], "docs-base.parquet"))
            run_curation_stream(
                spark, t["feed"], t["store"], t["corpus"], t["ck"],
                feed_glob="*.parquet", auto_maintain=(name == "auto"),
            )

    for i in range(args.drains):
        chunk = docs[i * args.docs_per_drain : (i + 1) * args.docs_per_drain]
        tbl = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                "text": [r["text"] for r in chunk],
                "lang": [r["lang"] for r in chunk],
                "source": [r["source"] for r in chunk],
                "n_chars": pa.array(
                    [len(r["text"]) for r in chunk], pa.int64()
                ),
            }
        )
        for name, t in twins.items():
            pq.write_table(tbl, os.path.join(t["feed"], f"docs-{i}.parquet"))
            t0 = time.perf_counter()
            rep = run_curation_stream(
                spark, t["feed"], t["store"], t["corpus"], t["ck"],
                feed_glob="*.parquet", auto_maintain=(name == "auto"),
            )
            t["wall"].append(round(time.perf_counter() - t0, 2))
            h = curation_store_health(spark, t["store"], t["corpus"])
            t["live_parts"].append(h["roots"]["corpus"]["n_live_partitions"])
            t["n_files"].append(
                h["roots"]["corpus"]["n_files"]
                + h["roots"]["fingerprints"]["n_files"]
            )
            # write-amplification ledger (r13 tiered compaction): what
            # the hook's compactions actually rewrote this drain, vs
            # the corpus size an always-major policy would rewrite
            rw = 0
            if rep and "curation_compact" in rep:
                rw = sum(
                    r.get("bytes_rewritten", 0)
                    for r in rep["curation_compact"].values()
                )
            t["rewritten"].append(rw)
            t["corpus_bytes"].append(
                h["roots"]["corpus"]["n_bytes"]
                + h["roots"]["fingerprints"]["n_bytes"]
            )
            cdir = os.path.join(t["store"], "commits")
            t["n_commit_files"].append(
                len([x for x in os.listdir(cdir)
                     if not x.startswith(("_", "."))])
                if os.path.isdir(cdir) else 0
            )
        print(
            f"# drain {i}: auto {twins['auto']['wall'][-1]}s "
            f"({twins['auto']['n_files'][-1]} files, "
            f"{twins['auto']['live_parts'][-1]} parts) | raw "
            f"{twins['raw']['wall'][-1]}s "
            f"({twins['raw']['n_files'][-1]} files, "
            f"{twins['raw']['live_parts'][-1]} parts)",
            file=sys.stderr,
        )

    # the twins must agree on content — maintenance is housekeeping
    rows = {
        name: sorted(
            (r["doc_id"], r["fp"])
            for r in read_curated_corpus(spark, t["store"], t["corpus"])
            .select("doc_id", "fp")
            .collect()
        )
        for name, t in twins.items()
    }
    auto = twins["auto"]
    # counterfactual: an always-major policy rewrites the whole store
    # every time a compaction fires
    naive = sum(
        cb for cb, rw in zip(auto["corpus_bytes"], auto["rewritten"]) if rw
    )
    out = {
        "metric": "auto_maintain_probe",
        "drains": args.drains,
        "docs_per_drain": args.docs_per_drain,
        "content_equal": rows["auto"] == rows["raw"],
        "auto": {k: auto[k] for k in ("wall", "live_parts", "n_files",
                                      "rewritten", "n_commit_files")},
        "raw": {k: twins["raw"][k] for k in ("wall", "live_parts", "n_files")},
        "last3_wall_auto": round(sum(auto["wall"][-3:]) / 3, 2),
        "last3_wall_raw": round(sum(twins["raw"]["wall"][-3:]) / 3, 2),
        "rewritten_total": sum(auto["rewritten"]),
        "rewritten_always_major": naive,
        "final_store_bytes": auto["corpus_bytes"][-1],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
