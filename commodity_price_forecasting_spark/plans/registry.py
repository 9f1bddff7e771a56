"""Named-query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``tests/`` (oracle
comparison) and ``bench.py`` (headline timings).

Each entry pairs a Spark DataFrame program with the ANSI-SQL oracle
DuckDB runs on the same parquet fixtures. Column names/aliases MUST
match between the two (the driver's comparator sorts columns by name
before hashing). Doubles that pass through aggregation are rounded
(6 decimal places by default) on BOTH sides so engine-order
floating-point noise cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect registration) and return
    the populated registry."""
    import commodity_price_forecasting_spark.plans.queries_relational  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_timeseries  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_profiling  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_datapipe  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_streaming  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_multimodal  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_coverage  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_tpch_extra  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_signals  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_quality  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_behavior  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_retrieval  # noqa: F401
    import commodity_price_forecasting_spark.plans.queries_stats  # noqa: F401

    return REGISTRY
