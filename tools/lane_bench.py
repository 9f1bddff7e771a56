#!/usr/bin/env python
"""Single-lane bench: bench.py's warm-up + best-of-n discipline for a
named subset of registered queries, with the same tree-CPU and sgemm
calibration instruments, so an optimization A/B can be read off
cpu_sec even when the host regime swings (SCALE.md: wall moved ±15%
both ways on unchanged plans while cpu_sec stayed inside ±10%).

Usage: lane_bench.py <query> [<query> ...] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commodity_price_forecasting_spark.plans.registry import load_all  # noqa: E402
from commodity_price_forecasting_spark.session import get_spark  # noqa: E402

_cpu_seen: dict[int, int] = {}
_cpu_lost = [0]


def _tree_cpu_seconds() -> float:
    hz = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    procs: dict[int, tuple[int, int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat", "rb") as fh:
                data = fh.read().decode("latin-1")
        except OSError:
            continue
        rp = data.rindex(")")
        f = data[rp + 2 :].split()
        procs[int(p)] = (int(f[1]), int(f[11]) + int(f[12]))
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _t) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    live: dict[int, int] = {}
    stack = [me]
    while stack:
        pid = stack.pop()
        if pid in procs:
            live[pid] = procs[pid][1]
            stack.extend(kids.get(pid, ()))
    for pid, last in list(_cpu_seen.items()):
        if pid not in live:
            _cpu_lost[0] += last
            del _cpu_seen[pid]
    for pid, t in live.items():
        if t < _cpu_seen.get(pid, 0):
            _cpu_lost[0] += _cpu_seen[pid]
        _cpu_seen[pid] = t
    return (_cpu_lost[0] + sum(live.values())) / hz


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="cpf-lane-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    import numpy as np

    rng = np.random.default_rng(1)
    ga = rng.standard_normal((1024, 1024), dtype=np.float32)
    gb = rng.standard_normal((1024, 1024), dtype=np.float32)
    ga @ gb

    def gflops():
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            ga @ gb
            best = max(best, 2 * 1024**3 / (time.perf_counter() - t0) / 1e9)
        return round(best, 1)

    reg = load_all()
    warm_dir = "/root/testdata/sf0.001"
    for name in args:
        spec = reg[name]
        if os.path.isdir(warm_dir):
            spec.fn(spark, warm_dir).count()
        spec.fn(spark, sf_dir).count()  # target-SF warm-up
        gf = gflops()
        samples = []
        cpu0 = _tree_cpu_seconds()
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        cpu = (_tree_cpu_seconds() - cpu0) / runs
        samples.sort()
        print(
            f"{name}: best {samples[0]:.3f}s med {samples[len(samples)//2]:.3f}s "
            f"max {samples[-1]:.3f}s n={runs} cpu {cpu:.2f}s {gf:.0f} GF/s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
