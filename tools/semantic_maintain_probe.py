#!/usr/bin/env python
"""Sustained SEMANTIC-store maintenance probe (r14 margin: marker
rollup): run many availableNow drains of the embeddings ingest —
each drain lands one feed file and, on the maintained twin, ends
with the post-drain health + compact-if-recommended hook
(``run_semantic_ingest_stream(auto_maintain=True)``), whose
compaction now rolls every per-batch commit marker into
``commits/_rolled.json``. Records the marker-file count per drain on
both twins so the bound is a measured curve, not an assertion: the
raw twin grows one marker file per drain forever; the maintained
twin's count saws between 0 and the health threshold. Ledger
partitions are counted too (retention default: kept — the audit
policy; ``gc_ledgers`` is the explicit mechanism). Ends with the
twins' cell-content equality check: maintenance is housekeeping.

Usage:
    python tools/semantic_maintain_probe.py
        [--sf-dir /root/testdata/sf0.1] [--drains 30]
        [--vecs-per-drain 100] [--base-vecs 500]
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

from commodity_price_forecasting_spark.operators.semantic_store import (  # noqa: E402
    semantic_store_build,
)
from commodity_price_forecasting_spark.operators.store_maintenance import (  # noqa: E402
    _marker_file_count,
    _read_committed,
)
from commodity_price_forecasting_spark.session import get_spark  # noqa: E402
from commodity_price_forecasting_spark.sources.readers import load_table  # noqa: E402
from commodity_price_forecasting_spark.streaming.semantic_stream import (  # noqa: E402
    run_semantic_ingest_stream,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--drains", type=int, default=30)
    ap.add_argument("--vecs-per-drain", type=int, default=100)
    ap.add_argument("--base-vecs", type=int, default=500)
    ap.add_argument("--workdir", default="/tmp/semantic_maintain_probe")
    args = ap.parse_args()

    spark = get_spark(
        app_name="semantic-maintain-probe", master="local[32]",
        shuffle_partitions=32,
    )
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)

    embs = (
        load_table(spark, args.sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(args.base_vecs + args.drains * args.vecs_per_drain)
        .collect()
    )
    base, feedrows = embs[: args.base_vecs], embs[args.base_vecs :]

    twins = {}
    for name in ("auto", "raw"):
        d = os.path.join(args.workdir, name)
        twins[name] = {
            "feed": os.path.join(d, "feed"),
            "store": os.path.join(d, "store"),
            "ck": os.path.join(d, "ck"),
            "wall": [],
            "n_marker_files": [],
            "n_committed": [],  # files ∪ rolled manifest — must be drain-monotone
            "n_ledger_parts": [],
            "cells_files": [],
        }
        os.makedirs(twins[name]["feed"])
        semantic_store_build(
            spark.createDataFrame(base, "vec_id long, embedding array<float>"),
            twins[name]["store"], k=16,
        )

    for i in range(args.drains):
        chunk = feedrows[i * args.vecs_per_drain : (i + 1) * args.vecs_per_drain]
        tbl = pa.table(
            {
                "vec_id": pa.array([r["vec_id"] for r in chunk], pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in r["embedding"]] for r in chunk],
                    pa.list_(pa.float32()),
                ),
            }
        )
        for name, t in twins.items():
            pq.write_table(tbl, os.path.join(t["feed"], f"embs-{i}.parquet"))
            t0 = time.perf_counter()
            run_semantic_ingest_stream(
                spark, t["feed"], t["store"], t["ck"],
                feed_glob="*.parquet", auto_maintain=(name == "auto"),
            )
            t["wall"].append(round(time.perf_counter() - t0, 2))
            cdir = os.path.join(t["store"], "commits")
            t["n_marker_files"].append(_marker_file_count(cdir))
            t["n_committed"].append(len(_read_committed(cdir)))
            ldir = os.path.join(t["store"], "ingest_verdicts")
            t["n_ledger_parts"].append(
                len(os.listdir(ldir)) if os.path.isdir(ldir) else 0
            )
            t["cells_files"].append(
                sum(
                    len(fs)
                    for _, _, fs in os.walk(os.path.join(t["store"], "cells"))
                )
            )
        print(
            f"# drain {i}: auto markers={twins['auto']['n_marker_files'][-1]} "
            f"committed={twins['auto']['n_committed'][-1]} "
            f"cells_files={twins['auto']['cells_files'][-1]} | raw "
            f"markers={twins['raw']['n_marker_files'][-1]} "
            f"cells_files={twins['raw']['cells_files'][-1]}",
            file=sys.stderr,
        )

    rows = {
        name: sorted(
            r["vec_id"]
            for r in spark.read.parquet(
                os.path.join(t["store"], "cells")
            ).collect()
        )
        for name, t in twins.items()
    }
    out = {
        "drains": args.drains,
        "vecs_per_drain": args.vecs_per_drain,
        "content_equal": rows["auto"] == rows["raw"],
        # every token ever committed must be drain-monotone on BOTH
        # twins (rollup must never lose a committed token)
        "committed_monotone": all(
            a <= b
            for t in twins.values()
            for a, b in zip(t["n_committed"], t["n_committed"][1:])
        ),
        "auto": {k: v for k, v in twins["auto"].items()
                 if isinstance(v, list)},
        "raw": {k: v for k, v in twins["raw"].items()
                if isinstance(v, list)},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
