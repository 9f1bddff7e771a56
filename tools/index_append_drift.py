#!/usr/bin/env python
"""Incremental-index recall drift (r9 VERDICT ask #2): when a corpus
grows AFTER the IVF-PQ index was trained, ``ivf_pq_index_append``
encodes the new vectors with the FROZEN coarse seeds + codebook. How
much recall does that staleness cost vs a full retrain — and when is
a rebuild actually warranted?

Protocol, per geometry (the r9 three-geometry fixtures: isotropic /
clustered / low-rank) x growth mode:

- ``stationary``: growth drawn from the SAME distribution as the
  pre-growth corpus (new docs, old topics).
- ``shifted``: growth drawn from a MOVED distribution (clustered:
  brand-new cluster centers; low-rank: rotated subspace; isotropic:
  mean shift) — the codebook has never seen this region.

For each cell: build the trained index (kmeans coarse + 256-entry
trained residual codebooks — the deployment shape) on the PRE-GROWTH
half, persist, ``ivf_pq_index_append`` the growth half, and measure
recall@10 (vs exact squared-L2 over the FULL grown corpus, queries
sampled from BOTH halves) for

- ``append``  — stale index: frozen quantizers, appended codes;
- ``rebuild`` — retrained index over the grown corpus.

``rebuild − append`` is the recall a retrain buys; the SCALE.md r10
drift table records it per geometry so the rebuild cadence is a
measured decision, not a guess. All probes go through
``ivf_pq_probe_batch`` — one plan per (cell, lane), no driver loop.

Usage:
  python tools/index_append_drift.py [--n 2000] [--dim 64] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def make_geometry(
    rng: np.ndarray, geometry: str, n: int, dim: int, shifted: bool
) -> np.ndarray:
    """Pre-growth half uses the base distribution; the growth half is
    either more of the same or the shifted variant."""
    if geometry == "isotropic":
        base = rng.standard_normal((n, dim))
        return base + (3.0 if shifted else 0.0)
    if geometry == "clustered":
        k_cl = 16
        # shifted growth = 16 BRAND-NEW cluster centers (seeded apart)
        centers = rng.standard_normal((k_cl, dim)) * (4.0 if shifted else 1.0)
        if shifted:
            centers += 6.0
        labels = rng.integers(0, k_cl, size=n)
        return centers[labels] * 3.0 + rng.standard_normal((n, dim)) * 0.5
    if geometry == "lowrank":
        r = 8
        proj = rng.standard_normal((r, dim))
        if shifted:
            # rotate the manifold: a different random subspace
            proj = rng.standard_normal((r, dim))
            proj[0] += 2.0
        z = rng.standard_normal((n, r))
        return z @ proj + rng.standard_normal((n, dim)) * 0.05
    raise ValueError(geometry)


def exact_l2_topk(mat: np.ndarray, ids: np.ndarray, qi: int, k: int) -> set:
    q = mat[ids == qi][0]
    d2 = ((mat - q) ** 2).sum(axis=1)
    order = sorted((float(d), int(i)) for d, i in zip(d2, ids) if i != qi)
    return {i for _, i in order[:k]}


def run_cell(
    spark, geometry: str, mode: str, n_half: int, dim: int, k: int, n_q: int
) -> list[dict]:
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_index_append,
        ivf_pq_index_write,
        ivf_pq_probe_batch,
    )

    rng = np.random.default_rng(11)
    pre = make_geometry(rng, geometry, n_half, dim, shifted=False)
    rng_g = np.random.default_rng(23)
    grow = make_geometry(rng_g, geometry, n_half, dim, mode == "shifted")
    full = np.vstack([pre, grow])
    ids = np.arange(len(full))

    def to_df(m, offset=0):
        return spark.createDataFrame(
            [(int(i + offset), [float(x) for x in v]) for i, v in enumerate(m)],
            "vec_id long, embedding array<double>",
        )

    pre_df = to_df(pre).cache()
    grow_df = to_df(grow, offset=n_half).cache()
    full_df = pre_df.unionAll(grow_df).cache()
    full_df.count()

    # queries: half from the old corpus, half from the growth
    qids = [int(ids[(i * len(ids)) // n_q]) for i in range(n_q)]
    gt = {qi: exact_l2_topk(full, ids, qi, k) for qi in qids}
    queries = full_df.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    out = []
    n_cb = 256 if n_half >= 512 else 16
    for lane in ("append", "rebuild"):
        tmp = tempfile.mkdtemp(prefix=f"drift_{geometry}_{mode}_{lane}_")
        try:
            if lane == "append":
                idx = ivf_pq_index(
                    pre_df, codebook="kmeans", coarse="kmeans", n_centroids=n_cb
                )
                ivf_pq_index_write(idx, tmp)
                idx["res"].unpersist()
                ivf_pq_index_append(spark, tmp, grow_df)
            else:
                idx = ivf_pq_index(
                    full_df, codebook="kmeans", coarse="kmeans", n_centroids=n_cb
                )
                ivf_pq_index_write(idx, tmp)
                idx["res"].unpersist()
            from commodity_price_forecasting_spark.operators.similarity import (
                ivf_pq_index_load,
            )

            loaded = ivf_pq_index_load(spark, tmp)
            got = ivf_pq_probe_batch(
                loaded, queries, k=k, n_probe=4, exclude_self=True
            ).collect()
            by_q: dict[int, set] = {}
            for r in got:
                by_q.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
            recs = [len(by_q.get(qi, set()) & gt[qi]) / k for qi in qids]
            out.append(
                {
                    "geometry": geometry,
                    "mode": mode,
                    "lane": lane,
                    "recall_at_k": round(float(np.mean(recs)), 4),
                    "min_query_recall": round(float(np.min(recs)), 4),
                    "k": k,
                    "n_pre": n_half,
                    "n_grow": n_half,
                    "n_queries": n_q,
                }
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    pre_df.unpersist()
    grow_df.unpersist()
    full_df.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000, help="per-half size")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=16)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from commodity_price_forecasting_spark.session import get_spark

    spark = get_spark(
        app_name="cpf-append-drift",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    for geometry in ("isotropic", "clustered", "lowrank"):
        for mode in ("stationary", "shifted"):
            for row in run_cell(
                spark, geometry, mode, args.n, args.dim, args.k, args.n_queries
            ):
                print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
