#!/usr/bin/env python
"""Dump .explain("formatted") for bench-tagged queries into
plans/r15/<query>_<suffix>.txt (suffix = before|after, argv[1]).

Queries whose registered fn executes eagerly and returns a re-wrapped
local frame (the curation stage-count lanes) get the plan of the frame
they return — which is a LocalTableScan by design; their meaningful
stage plans are captured by tools/profile_r15.py instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commodity_price_forecasting_spark.plans.registry import load_all  # noqa: E402
from commodity_price_forecasting_spark.session import (  # noqa: E402
    ensure_package_shipped,
    get_spark,
)


def explain_str(spark, df, mode="formatted"):
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])  # optional query-name filter
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="cpf-explain-r15",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    ensure_package_shipped(spark)
    reg = load_all()
    for name, spec in sorted(reg.items()):
        if "bench" not in spec.tags:
            continue
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            txt = explain_str(spark, df)
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            txt = f"EXPLAIN FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
