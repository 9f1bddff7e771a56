"""commodity_price_forecasting_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference project
``Marilyn2961/Commodity-Price-Forecasting`` (a pandas/sklearn
commodity-spread forecasting pipeline; see ``SURVEY.md``), built
Spark-first:

- DataFrame / Spark SQL for every relational operator (Catalyst
  handles pushdown, pruning, join selection).
- Window functions for the time-series core (ffill/bfill imputation,
  heterogeneous-lag lead shifts, rolling stats).
- MLlib pipelines for the modeling layer (linear/ridge/lasso, random
  forest, GBT, weighted ensembles, walk-forward evaluation).
- Structured Streaming for incremental market-event processing
  (extension beyond the batch-only reference).
- Large-scale training-data-pipeline operators (exact/MinHash-LSH
  dedup, similarity search, text analysis) as first-class citizens.

Every operator is designed for a multi-executor cluster at ~100 TB
scale (long/tidy layouts, per-key window partitioning, broadcast
dimension joins, AQE) even though tests run on ``local[*]``.
"""

__version__ = "0.1.0"

from commodity_price_forecasting_spark.session import get_spark  # noqa: F401
