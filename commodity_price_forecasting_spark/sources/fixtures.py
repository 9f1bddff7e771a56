"""Deterministic reference-shaped fixtures (FIXTURES.md §1–§3).

Generates the three input tables of the reference's pipeline —
``train`` (wide daily market matrix), ``train_labels`` (wide target
matrix), ``target_pairs`` (target↔instrument mapping) — at a reduced
scale, seed-fixed (42), mirroring the documented shapes and null
patterns:

- train: `date_id` + market columns named `{MARKET}_{INSTRUMENT}_{FIELD}`
  (reference: Data/df_transformed.csv header), ~5 columns ~87 % null
  (late-listed instrument, MC:56305 (cell 26)), most others 2–10 %
  null runs, a few dense.
- train_labels: `date_id` + `target_k` columns, 4–19 % null per
  column (MC:24463 (cell 15)).
- target_pairs: one row per target with lag cycling 1–4 and pair
  expressions `"A - B"` (plus a couple of single-instrument pairs),
  legs drawn from train's columns (Data/target_pairs.csv shape).

Used by ML/pipeline tests; the driver's TPC-H-ish fixtures cover
operator correctness, these cover reference-pipeline fidelity.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

MARKETS = (
    [f"US_Stock_S{i}_adj_close" for i in range(25)]
    + [f"FX_P{i}" for i in range(8)]
    + [f"LME_M{i}_Close" for i in range(5)]
    + ["JPX_Gold_Futures_Close", "JPX_Platinum_Futures_Close"]
)


def make_reference_fixtures(
    spark: SparkSession,
    n_days: int = 200,
    n_targets: int = 24,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Build {train, train_labels, target_pairs} as Spark DataFrames."""
    rng = np.random.default_rng(seed)
    cols = list(MARKETS)
    n_cols = len(cols)

    # random-walk prices so ffill/ranking behave like market data
    base = rng.uniform(10, 500, size=n_cols)
    steps = rng.normal(0, 0.02, size=(n_days, n_cols))
    prices = base * np.exp(np.cumsum(steps, axis=0))

    # null pattern: first 3 columns late-listed (~87% null at the head);
    # the rest get random 2-10% null runs.
    mask = np.zeros((n_days, n_cols), dtype=bool)
    for j in range(3):
        mask[: int(n_days * 0.87), j] = True
    for j in range(3, n_cols):
        frac = rng.uniform(0.02, 0.10)
        idx = rng.choice(n_days, size=int(n_days * frac), replace=False)
        mask[idx, j] = True
    prices = prices.copy()
    prices[mask] = np.nan

    train_rows = [
        tuple([int(d)] + [None if np.isnan(v) else float(v) for v in prices[d]])
        for d in range(n_days)
    ]
    train = spark.createDataFrame(train_rows, ["date_id"] + cols)

    # targets: log-return-like, 4-19% null per column
    labels = rng.normal(0, 0.03, size=(n_days, n_targets))
    lmask = np.zeros((n_days, n_targets), dtype=bool)
    for j in range(n_targets):
        frac = rng.uniform(0.04, 0.19)
        idx = rng.choice(n_days, size=int(n_days * frac), replace=False)
        lmask[idx, j] = True
    labels[lmask] = np.nan
    label_cols = [f"target_{j}" for j in range(n_targets)]
    label_rows = [
        tuple([int(d)] + [None if np.isnan(v) else float(v) for v in labels[d]])
        for d in range(n_days)
    ]
    train_labels = spark.createDataFrame(label_rows, ["date_id"] + label_cols)

    # mapping: lag cycles 1-4; two single-instrument pairs; legs from train
    dense_cols = cols[3:]  # avoid the late-listed columns as legs
    pair_rows = []
    for j in range(n_targets):
        lag = (j % 4) + 1
        if j < 2:
            pair = dense_cols[j]
        else:
            a = dense_cols[(2 * j) % len(dense_cols)]
            b = dense_cols[(2 * j + 1) % len(dense_cols)]
            pair = f"{a} - {b}"
        pair_rows.append((f"target_{j}", lag, pair))
    target_pairs = spark.createDataFrame(pair_rows, ["target", "lag", "pair"])

    return {"train": train, "train_labels": train_labels, "target_pairs": target_pairs}
