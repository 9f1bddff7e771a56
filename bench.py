#!/usr/bin/env python
"""Benchmark harness: runs the headline queries (tag "bench" in the
registry) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute + collect-count) and
run $SPARK_GRAFT_BENCH_RUNS times (default 3); the BEST run is
reported. Warm-up discipline (r7 VERDICT ask #3, SCALE.md
"first-in-session penalty"): each query gets ONE unmeasured
execution AT THE TARGET SF immediately before its timed runs — the
first execution of a heavy query in a fresh session costs 3-4x its
steady state (codegen/JIT), and the old smallest-fixture warm-up did
not compile the same plans AQE picks at the target SF, leaving +-34%
swings on untouched queries in BENCH_r07. Best-of-n then suppresses
co-tenant / GC noise on top (round 3 showed a uniform ~1.4x slowdown
across untouched plans that single-run timing could not distinguish
from a real regression — see SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from commodity_price_forecasting_spark.plans.registry import load_all
from commodity_price_forecasting_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(
        app_name="cpf-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    registry = load_all()
    bench = {name: spec for name, spec in registry.items() if "bench" in spec.tags}

    # JVM classloading warm-up on the smoke fixture (not timed); the
    # per-query target-SF warm-up below handles codegen for the
    # actual plans.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for spec in bench.values():
            spec.fn(spark, warm_dir).count()

    # prior-round per-query timings (regression visibility at a
    # glance: the stderr tail prints the delta vs the newest
    # BENCH_r{N}.json found alongside this script)
    priors: list[tuple[str, dict[str, float]]] = []
    here = os.path.dirname(os.path.abspath(__file__))
    for fname in sorted(os.listdir(here), reverse=True):
        if fname.startswith("BENCH_r") and fname.endswith(".json"):
            try:
                with open(os.path.join(here, fname)) as fh:
                    rec = json.load(fh)
                # the driver nests this script's JSON line under "parsed"
                inner = rec.get("parsed", rec)
                if rec.get("sf") == sf and isinstance(inner.get("queries"), dict):
                    priors.append((fname, inner["queries"]))
                    if len(priors) == 2:
                        break
            except (OSError, ValueError):
                continue

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for name, spec in sorted(bench.items()):
        # one unmeasured execution at the TARGET SF: compiles/JITs the
        # exact plans (incl. AQE re-plans) the timed runs will use
        spec.fn(spark, sf_dir).count()
        best, n = float("inf"), 0
        for _ in range(n_runs):
            t0 = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        delta = "".join(
            f" [{100.0 * (timings[name] - p[name]) / p[name]:+.0f}% vs {tag}]"
            for tag, p in priors
            if name in p and p[name]
        )
        print(
            f"# {name}: {timings[name]:.3f}s best-of-{n_runs} ({n} rows){delta}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # Compact ALL-query delta block, emitted LAST so it survives the
    # driver's fixed-size output tail (r4's verbose per-query lines
    # were truncated from the front, losing the earliest queries'
    # comparisons — VERDICT r4 ask #6). One line, newest prior only.
    if priors:
        tag, prior = priors[0]
        parts = [
            f"{q} {100.0 * (timings[q] - prior[q]) / prior[q]:+.0f}%"
            if q in prior and prior[q]
            else f"{q} new"
            for q in sorted(timings)
        ]
        print(f"# deltas vs {tag}: " + ", ".join(parts), file=sys.stderr)
    if "sim_ivfpq_adc_topk" in timings:
        # r8 ask #2 / r9 ask #3: say which cost each ANN row is
        print(
            "# note: sim_ivfpq_adc_topk times index BUILD + probe in one "
            "plan (the amortized one-off, kept as its own tracked row); "
            "sim_ivfpq_probe_only (r10) times the RECURRING per-query "
            "probe over the persisted shared index — round-over-round "
            "deltas should move with the probe row",
            file=sys.stderr,
        )
    for prior_tag, prior in priors:
        shared = [q for q in timings if q in prior]
        if not shared:
            continue
        now_s = sum(timings[q] for q in shared)
        then_s = sum(prior[q] for q in shared)
        print(
            f"# shared {len(shared)}-query subtotal: {now_s:.2f}s vs "
            f"{then_s:.2f}s in {prior_tag} ({now_s / then_s:.2f}x)",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
