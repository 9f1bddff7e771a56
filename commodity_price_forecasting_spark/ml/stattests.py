"""Stationarity tests (SURVEY.md §2.9 M11): Augmented Dickey-Fuller
per series, distributed with ``applyInPandas``.

The reference imports statsmodels' ``adfuller``/``kpss`` (MC:34
cell 1; README.md:29). statsmodels is not a dependency here, so the
ADF regression is computed directly with numpy least squares —
Δy_t = α + βy_{t-1} + Σ γᵢΔy_{t-i} + ε, test statistic β̂/SE(β̂)
(equivalent to adfuller's 'c' regression without autolag).

Each instrument's series is one pandas group — embarrassingly
parallel across the cluster; the Python boundary is per-group (Arrow
batches), not per-row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: approximate 5% critical value for the constant-only ADF test
ADF_CRIT_5PCT = -2.86


def _adf_stat(y: np.ndarray, max_lag: int) -> float:
    y = y[~np.isnan(y)]
    if len(y) < max_lag + 10:
        return float("nan")
    dy = np.diff(y)
    ylag = y[:-1]
    rows = len(dy) - max_lag
    X = [np.ones(rows), ylag[max_lag:]]
    for i in range(1, max_lag + 1):
        X.append(dy[max_lag - i : len(dy) - i])
    X = np.column_stack(X)
    t = dy[max_lag:]
    beta, res, rank, _ = np.linalg.lstsq(X, t, rcond=None)
    resid = t - X @ beta
    dof = rows - X.shape[1]
    if dof <= 0:
        return float("nan")
    s2 = resid @ resid / dof
    cov = s2 * np.linalg.inv(X.T @ X)
    return float(beta[1] / np.sqrt(cov[1, 1]))


def adf_by_group(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    max_lag: int = 4,
) -> DataFrame:
    """ADF test statistic per key: ``(key, adf_stat, n, stationary)``
    where ``stationary`` uses the 5 % critical value."""

    def _per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        stat = _adf_stat(pdf[value_col].to_numpy(dtype=float), max_lag)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "adf_stat": [stat],
                "n": [len(pdf)],
                "stationary": [bool(stat < ADF_CRIT_5PCT) if stat == stat else False],
            }
        )

    schema = f"{key_col} long, adf_stat double, n long, stationary boolean"
    return df.select(key_col, time_col, value_col).groupBy(key_col).applyInPandas(
        _per_group, schema=schema
    )
