from commodity_price_forecasting_spark.plans.registry import REGISTRY, QuerySpec, register  # noqa: F401
