"""Walk-forward (expanding-window) evaluation (SURVEY.md §2.9 M9).

The reference evaluates with walk-forward splits (README.md:36;
``TimeSeriesSplit`` import MC:34 (cell 1)); MLlib's CrossValidator
only does random folds, so the splitter is a deterministic driver
loop over ``date_id`` boundaries — each fold is a pair of cheap
filters on the SAME cached DataFrame, so the data is scanned, not
copied, per fold.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Fold:
    train_end: int    # train: time <= train_end
    test_end: int     # test: train_end < time <= test_end


def expanding_folds(min_time: int, max_time: int, n_folds: int, min_train_frac: float = 0.5) -> list[Fold]:
    """Deterministic expanding-window folds: the first
    ``min_train_frac`` of the timeline is always training; the
    remainder splits into ``n_folds`` equal test horizons."""
    span = max_time - min_time
    first_end = min_time + int(span * min_train_frac)
    step = (max_time - first_end) // n_folds
    folds = []
    for i in range(n_folds):
        tr = first_end + i * step
        te = max_time if i == n_folds - 1 else tr + step
        folds.append(Fold(train_end=tr, test_end=te))
    return folds


def walk_forward(
    df: DataFrame,
    time_col: str,
    fit_eval: Callable[[DataFrame, DataFrame], dict],
    n_folds: int = 3,
    min_train_frac: float = 0.5,
) -> list[dict]:
    """Run ``fit_eval(train_df, test_df) -> metrics`` over expanding
    folds; returns one metrics dict per fold (with fold bounds)."""
    df = df.cache()
    bounds = df.agg(
        F.min(time_col).alias("lo"), F.max(time_col).alias("hi")
    ).first()
    results = []
    for fold in expanding_folds(bounds["lo"], bounds["hi"], n_folds, min_train_frac):
        tr = df.filter(F.col(time_col) <= fold.train_end)
        te = df.filter(
            (F.col(time_col) > fold.train_end) & (F.col(time_col) <= fold.test_end)
        )
        m = fit_eval(tr, te)
        m["train_end"] = fold.train_end
        m["test_end"] = fold.test_end
        results.append(m)
    return results
