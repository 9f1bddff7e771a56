"""Source-layer tests: defensive serving validation (the reference's
app.py:99-111 semantics) and the bucketed-table co-located join that
SCALE.md promises (bucket both sides on the join key → zero exchange
in the join plan).
"""

from __future__ import annotations

import pytest

from commodity_price_forecasting_spark.sources.readers import load_table
from commodity_price_forecasting_spark.sources.validation import (
    EmptyDatasetError,
    MissingTargetColumnsError,
    classify_columns,
    validate_serving_frame,
)

SF_DIR = "/root/testdata/sf0.001"


def test_validate_serving_frame_happy_path(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 3.0, -1.0)],
        ["date_id", "LME_CA_Close", "US_Stock_HL_adj_close", "LME_CA_Close - US_Stock_HL_adj_close"],
    )
    _, features, targets = validate_serving_frame(df)
    assert features == ["LME_CA_Close", "US_Stock_HL_adj_close"]
    assert targets == ["LME_CA_Close - US_Stock_HL_adj_close"]


def test_validate_rejects_empty(spark):
    df = spark.createDataFrame([], "date_id INT, `A - B` DOUBLE")
    with pytest.raises(EmptyDatasetError):
        validate_serving_frame(df)


def test_validate_rejects_missing_targets(spark):
    df = spark.createDataFrame([(1, 2.0)], ["date_id", "LME_CA_Close"])
    with pytest.raises(MissingTargetColumnsError):
        validate_serving_frame(df)


def test_classify_ignores_string_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0, 0.5)], ["date_id", "note", "LME_CA_Close", "A - B"]
    )
    features, targets = classify_columns(df)
    assert features == ["LME_CA_Close"]
    assert targets == ["A - B"]


def test_bucketed_tables_join_without_exchange(spark, tmp_path_factory):
    """Write orders and lineitem bucketed by the join key: the join
    plan must contain NO shuffle exchange — the co-located join
    SCALE.md relies on for repeated fact-to-fact joins at 100 TB."""
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast

    try:
        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        o = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
            "path", f"{wh}/b_lineitem"
        ).saveAsTable("b_lineitem")
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
            "path", f"{wh}/b_orders"
        ).saveAsTable("b_orders")

        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        # and the join still computes the right thing
        n = joined.count()
        li2 = load_table(spark, SF_DIR, "lineitem")
        o2 = load_table(spark, SF_DIR, "orders")
        want = li2.join(o2, li2.l_orderkey == o2.o_orderkey).count()
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_sink_prunes_partitions(spark):
    """s7: the rescan of one event_type must read ONE hive partition —
    PartitionFilters in the scan, and the other event_type directories
    absent from the selected partitions count."""
    from commodity_price_forecasting_spark.plans.queries_coverage import (
        s7_partitioned_parquet_sink,
    )

    df = s7_partitioned_parquet_sink(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    # value sanity: counts equal the unpartitioned path
    ev = load_table(spark, SF_DIR, "events").filter("event_type = 'purchase'")
    assert df.agg({"n_events": "sum"}).first()[0] == ev.count()


def test_s8_query_joins_from_buckets(spark):
    """s8_bucketed_join (registry form): sort-merge join fed straight
    from bucketed scans — no Exchange between the scans and the join;
    the only shuffle in the whole plan is the final segment rollup."""
    from commodity_price_forecasting_spark.plans.queries_coverage import (
        s8_bucketed_join,
    )

    df = s8_bucketed_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Bucketed: true" in plan


def test_schema_evolution_merge_read(spark, tmp_path_factory):
    """Schema evolution at the lake layer: two parquet batches with
    drifted schemas (a column added later) must read back as ONE
    frame under mergeSchema, old rows null-filled — the append-only
    ingestion reality at 100 TB, where producers upgrade schemas
    without rewriting history."""
    base = str(tmp_path_factory.mktemp("evolve"))
    v1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, px double")
    v2 = spark.createDataFrame(
        [(3, 30.0, "eur"), (4, 40.0, "usd")], "id long, px double, ccy string"
    )
    v1.write.parquet(f"{base}/b=1")
    v2.write.parquet(f"{base}/b=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "px", "ccy", "b"}
    rows = {r["id"]: r["ccy"] for r in merged.collect()}
    assert rows[1] is None and rows[3] == "eur"


def test_events_ts_is_timestamp_under_both_readers(spark):
    """Fixture-drift guard: the driver's parquet encoding of
    ``events.ts`` has changed across rounds (TIMESTAMP(NANOS) →
    TIMESTAMP(MICROS)/NTZ). Whatever the physical unit, BOTH readers
    must surface a session-zone TIMESTAMP — a future drift should
    fail loudly here, at the reader, not as scattered watermark /
    cast errors downstream."""
    from commodity_price_forecasting_spark.sources.readers import load_table
    from commodity_price_forecasting_spark.streaming.events_stream import (
        read_events_stream,
    )

    batch = load_table(spark, SF_DIR, "events")
    assert dict(batch.dtypes)["ts"] == "timestamp", batch.dtypes
    stream = read_events_stream(spark, SF_DIR)
    assert dict(stream.dtypes)["ts"] == "timestamp", stream.dtypes
    # and the normalized values are sane calendar-era event times,
    # not 1970-epoch artifacts of a wrong unit conversion
    from pyspark.sql import functions as F

    yr = batch.agg(
        F.min(F.year("ts")).alias("lo"), F.max(F.year("ts")).alias("hi")
    ).collect()[0]
    assert yr["lo"] >= 2000, f"events.ts decoded into the past: {yr}"
    assert yr["hi"] <= 2100, f"events.ts decoded into the future: {yr}"


def test_aqe_splits_skewed_join(spark):
    """SCALE.md's skew claim, proven at plan level: a join where 90%
    of fact rows share one key must come out of AQE with the skewed
    side split (SortMergeJoin(skew=true)). Broadcast is disabled for
    the test so the join actually sort-merges, and the skew
    thresholds are lowered to fire on test-sized data — the MECHANISM
    under test is the same one that fires at 100 TB defaults."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # 90% of 200k fact rows land on key 0; dim has 1k distinct keys
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.rand(seed=7).alias("v"),
        )
        dim = spark.range(1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k").groupBy().agg(F.sum("v"), F.sum("w"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_csv_corrupt_record_handling(spark, tmp_path):
    """Malformed-input robustness at the source layer: PERMISSIVE mode
    must capture unparseable rows in the corrupt-record column while
    keeping every valid row, DROPMALFORMED must silently skip them,
    and FAILFAST must raise — the three production postures for a
    100 TB CSV ingest where a handful of bad lines must not kill (or
    silently poison) the job."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,name\n"
        "1,10,alpha\n"
        "2,notanumber,beta\n"  # qty fails to parse
        "3,30,gamma\n"
        "4,oops,delta\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("qty", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    permissive = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()
    )
    assert permissive.count() == 4
    bad = permissive.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["id"] for r in bad.collect()) == [2, 4]
    assert permissive.filter(F.col("qty").isNotNull()).count() == 2

    dropped = (
        spark.read.schema(StructType(schema.fields[:3]))
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]

    failfast = (
        spark.read.schema(StructType(schema.fields[:3]))
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(str(p))
    )
    with pytest.raises(Exception):
        failfast.collect()


def test_dynamic_partition_overwrite_is_surgical(spark, tmp_path):
    """Backfill posture: with partitionOverwriteMode=dynamic, an
    INSERT OVERWRITE touching one day must replace ONLY that day's
    partition and leave every other partition byte-identical — the
    idempotent-backfill contract; static mode would wipe the whole
    table root."""
    from pyspark.sql import functions as F

    key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(key, None)
    path = str(tmp_path / "ev_backfill")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    before = {
        r["day"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    target_day = sorted(before)[2]
    try:
        spark.conf.set(key, "dynamic")
        patch = (
            ev.filter(F.col("day") == F.lit(target_day))
            .limit(5)
            .withColumn("value", F.lit(0.0))
        )
        patch.write.partitionBy("day").mode("overwrite").parquet(path)
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
    after = {
        r["day"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert after[target_day] == 5
    for d, n in before.items():
        if d != target_day:
            assert after[d] == n, d


def test_max_records_per_file_bounds_file_sizes(spark, tmp_path):
    """Small-files / giant-files control at the sink: maxRecordsPerFile
    must cap every output file — the knob that keeps 100 TB writes
    from producing unsplittable monoliths (its absence) or a million
    tiny files (fixed by coalesce before write)."""
    import glob

    path = str(tmp_path / "ev_bounded")
    ev = load_table(spark, SF_DIR, "events")
    n = ev.count()
    ev.coalesce(1).write.option("maxRecordsPerFile", 200).mode(
        "overwrite"
    ).parquet(path)
    files = glob.glob(path + "/*.parquet")
    assert len(files) >= n // 200
    total = 0
    for f in files:
        c = spark.read.parquet(f).count()
        assert c <= 200
        total += c
    assert total == n
