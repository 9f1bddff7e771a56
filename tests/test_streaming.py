"""Structured Streaming tests: every batch/stream-agnostic transform
must produce identical results when executed incrementally
(file-source stream + availableNow trigger) as on the batch scan.
Also covers watermarked dedup and the custom stateful operator.
"""

from __future__ import annotations

import pytest

from commodity_price_forecasting_spark.sources.readers import load_table
from commodity_price_forecasting_spark.streaming.events_stream import (
    dedup_events,
    read_events_stream,
    run_stream_to_memory,
    running_user_stats,
    session_stats,
    sliding_stats,
    tumbling_stats,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_DIR, "events").cache()


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize(
    "transform,cols",
    [
        (tumbling_stats, ["window_start", "event_type", "n_events", "sum_value", "avg_value"]),
        (sliding_stats, ["window_start", "event_type", "n_events", "avg_value"]),
        (session_stats, ["session_start", "user_id", "n_events", "sum_value"]),
    ],
    ids=["tumbling", "sliding", "session"],
)
def test_stream_equals_batch(spark, events_batch, transform, cols):
    name = f"mem_{transform.__name__}"
    run_stream_to_memory(
        transform(read_events_stream(spark, SF_DIR)), name, output_mode="complete"
    )
    got = _rows(spark.table(name), cols)
    want = _rows(transform(events_batch), cols)
    assert got == want and len(got) > 0


def test_streaming_dedup_within_watermark(spark):
    stream = read_events_stream(spark, SF_DIR)
    # duplicate every event in the same micro-batch: union stream with itself
    dup = stream.union(stream)
    run_stream_to_memory(dedup_events(dup), "mem_dedup", output_mode="append")
    out = spark.table("mem_dedup")
    n_batch = load_table(spark, SF_DIR, "events").count()
    assert out.count() == n_batch
    assert out.select("event_id").distinct().count() == n_batch


def test_stateful_running_stats_matches_batch(spark, events_batch):
    run_stream_to_memory(
        running_user_stats(read_events_stream(spark, SF_DIR)),
        "mem_running",
        output_mode="update",
    )
    # update mode emits one row per user per micro-batch; the LAST
    # emission per user is the final state == the batch aggregate.
    import pandas as pd

    got = spark.table("mem_running").toPandas()
    # availableNow on one parquet file → micro-batches in order; take
    # the max-n_events row per user (running count is monotone).
    final = got.sort_values("n_events").groupby("user_id").last().reset_index()
    want = running_user_stats(events_batch).toPandas()
    merged = final.merge(want, on="user_id", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    pd.testing.assert_series_equal(
        merged["n_events_got"],
        merged["n_events_want"],
        check_names=False,
    )
    assert (merged["total_value_got"] - merged["total_value_want"]).abs().max() < 1e-9
