"""Tests for operators/distributed.prefix_sum — the range-partition +
prefix-offset exact running sum (the scale-safe replacement for a
single-partition ``Window.orderBy``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.distributed import prefix_sum


def test_prefix_sum_matches_sequential(spark):
    # 1000 rows, values chosen so every prefix is distinct; 8 range
    # partitions forces real cross-partition offsets.
    rows = [(i, (i * 7 + 3) % 11) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = prefix_sum(df, "k", "v", out_col="cum", num_partitions=8)
    got = {r["k"]: r["cum"] for r in out.collect()}
    run = 0
    for k, v in rows:
        run += v
        assert got[k] == run, f"k={k}"


def test_prefix_sum_no_single_partition_exchange(spark):
    # The executed plan must not contain a SinglePartition exchange —
    # that is exactly the anti-pattern prefix_sum exists to avoid.
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    out = prefix_sum(df, "k", "v", num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
