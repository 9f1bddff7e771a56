"""Metric expressions (SURVEY.md §2.9 M7–M8) as plain aggregates.

MAE/RMSE/R² exist in MLlib's RegressionEvaluator; directional
accuracy, MAPE and SMAPE (reference: README.md:44-46) do not — they
are one-line aggregate expressions here, computable over any
``(label, prediction)`` DataFrame in a single map-side-combinable
pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mae(label: Column, pred: Column) -> Column:
    return F.avg(F.abs(label - pred))


def rmse(label: Column, pred: Column) -> Column:
    return F.sqrt(F.avg(F.pow(label - pred, 2)))


def r2(label: Column, pred: Column) -> Column:
    """R² from sufficient statistics — all plain aggregates, so the
    whole expression stays in one map-side-combinable pass:
    ``1 - SS_res / (Σy² - (Σy)²/n)``."""
    ss_res = F.sum(F.pow(label - pred, 2))
    ss_tot = F.sum(F.pow(label, 2)) - F.pow(F.sum(label), 2) / F.count(label)
    return 1 - ss_res / ss_tot


def directional_accuracy(label: Column, pred: Column) -> Column:
    """share of rows where sign(pred) == sign(label)."""
    return F.avg((F.signum(pred) == F.signum(label)).cast("double"))


def mape(label: Column, pred: Column) -> Column:
    return F.avg(F.abs((label - pred) / label))


def smape(label: Column, pred: Column) -> Column:
    return F.avg(2 * F.abs(pred - label) / (F.abs(pred) + F.abs(label)))


def regression_metrics(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """All reference metrics in one aggregate pass; R² computed from
    sufficient statistics (no window needed)."""
    y, p = F.col(label_col), F.col(pred_col)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        mae(y, p).alias("mae"),
        rmse(y, p).alias("rmse"),
        F.sum(F.pow(y - p, 2)).alias("_ss_res"),
        F.sum(F.pow(y, 2)).alias("_ss_y"),
        F.sum(y).alias("_sum_y"),
        directional_accuracy(y, p).alias("dir_acc"),
        smape(y, p).alias("smape"),
    )
    ss_tot = F.col("_ss_y") - F.pow(F.col("_sum_y"), 2) / F.col("n")
    return agg.select(
        "n",
        "mae",
        "rmse",
        (1 - F.col("_ss_res") / ss_tot).alias("r2"),
        "dir_acc",
        "smape",
    )
