#!/usr/bin/env python
"""Deterministic CLUSTERED embeddings fixture for the ANN recall table.

The driver's synthetic `embeddings.parquet` is near-isotropic — the
hardest possible case for product quantization (residuals carry no
low-dimensional structure, so 8-byte codes drown true-neighbor gaps
in quantization noise; measured collapse in SCALE.md r9's recall
tables). Real embedding corpora are nothing like that: they live
near a union of low-dimensional clusters. This tool writes a
deterministic clustered fixture so the recall table can measure the
lanes on BOTH geometries instead of extrapolating from the worst one.

Model (all public, textbook): `n_clusters` centers drawn from a
seeded standard normal scaled by `spread`, each vector = its center
+ isotropic noise of scale `noise` (signal-to-noise per dim =
spread/noise, default 4:1). Schema matches the driver's table:
``vec_id bigint, embedding array<float>`` — drop-in for
``tools/ann_recall.py --sf-dir``.

With ``--latent-dim r`` the fixture is instead drawn from an
r-dimensional LINEAR manifold (v = z·P + noise, z ∈ R^r, P a fixed
r×dim projection): the low-intrinsic-dimension geometry that real
embedding models produce and that product quantization exploits —
subvector coordinates become correlated, so per-subspace codebooks
capture real variance instead of isotropic noise. ``--clusters`` is
ignored in that mode.

Usage:
  python tools/make_clustered_embeddings.py --out .scratch/clustered \
      [--n 20000] [--dim 64] [--clusters 64] [--seed 7]
  python tools/make_clustered_embeddings.py --out .scratch/lowrank \
      --latent-dim 8
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--spread", type=float, default=1.0)
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--latent-dim", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    if args.latent_dim > 0:
        proj = rng.standard_normal((args.latent_dim, args.dim))
        z = rng.standard_normal((args.n, args.latent_dim)) * args.spread
        vecs = (
            z @ proj
            + rng.standard_normal((args.n, args.dim)) * args.noise
        ).astype(np.float32)
    else:
        centers = rng.standard_normal((args.clusters, args.dim)) * args.spread
        labels = rng.integers(0, args.clusters, size=args.n)
        vecs = (
            centers[labels]
            + rng.standard_normal((args.n, args.dim)) * args.noise
        ).astype(np.float32)

    os.makedirs(args.out, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(args.n, dtype=np.int64)),
            "embedding": pa.array(
                list(vecs), type=pa.list_(pa.float32())
            ),
        }
    )
    path = os.path.join(args.out, "embeddings.parquet")
    pq.write_table(table, path)
    shape = (
        f"latent_dim={args.latent_dim}"
        if args.latent_dim > 0
        else f"clusters={args.clusters}"
    )
    print(
        f"wrote {path}: n={args.n} dim={args.dim} {shape} "
        f"snr={args.spread / args.noise:.1f}"
    )


if __name__ == "__main__":
    main()
