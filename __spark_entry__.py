"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in
``commodity_price_forecasting_spark.plans`` (registry pattern); this
module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from commodity_price_forecasting_spark.plans.registry import load_all  # noqa: E402
from commodity_price_forecasting_spark.session import ensure_package_shipped  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3 E1 spine — impute → spreads →
    heterogeneous-lag targets → variance top-k) on sf0.001."""
    from commodity_price_forecasting_spark.plans.e1_pipeline import e1_flagship

    ensure_package_shipped(spark)
    return e1_flagship(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    """Ship the package to executors before running a query — needed
    for Python-closure operators (mapInPandas) when the driver's cwd
    isn't the repo root."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data-pipeline extensions."""
    return {name: _wrap(spec.fn) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver does rows-only checks)."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
