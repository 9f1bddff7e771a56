"""Streaming SEMANTIC ingest — the third and last dedup tier on the
stream (r12): the curation gate already runs the exact tier
(`dropDuplicatesWithinWatermark` + fingerprint store) and the
MinHash near tier (`dedup_delta` per micro-batch) in
``streaming/curation_stream.py``; this module streams an EMBEDDING
feed through ``semantic_dedup_delta`` against the persisted cell
store, so a growing corpus gets all three tiers without a batch
window:

- each micro-batch is assigned through the store's FROZEN seeds,
  compared with exact cosines against stored cell-mates (store
  scanned once, batch broadcast — the delta lane's shape), verdicts
  land in a per-batch audit ledger, kept vectors append into the
  cell partitions, inversions append into the store's rebuild
  ledger (where ``semantic_store_health`` reads them).

Delivery semantics: commit-token skip for fully-processed batches
(the curation gate's device), and the semantic tier is additionally
SELF-HEALING under partial redelivery — a replayed vector whose
earlier attempt already appended is its own stored cell-mate at
cosine 1.0 ≥ any threshold, so the replay verdicts it
``semantic_dup`` and appends nothing (pinned in
tests/test_streaming_semantic.py). That is stronger than the near
tier's boundary (dedup_store enforces id monotonicity with a named
error instead, because MinHash signatures of a re-seen id WOULD
double-append).

Scale shape: per batch, one map-side assignment pass (BLAS lane),
one scan of the touched cell partitions against the broadcast batch,
one cell-partitioned append. State lives entirely in the store —
no watermark state, so the trigger cadence is a pure
latency/amortization dial (the near-tier probe's measured rule
applies here too: fixed per-batch job cost wants minutes-level
triggers or availableNow).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.semantic_store import (
    semantic_dedup_delta,
)


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the embeddings parquet (the local
    stand-in for an embedding-pipeline output queue)."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def _ingest_batch(
    batch_df: DataFrame,
    store_path: str,
    commit_token: str,
    assign: str,
) -> None:
    marker = os.path.join(store_path, "commits", commit_token)
    if os.path.exists(marker):
        return  # fully committed — redelivery skip
    res = semantic_dedup_delta(
        batch_df.sparkSession,
        store_path,
        batch_df.select("vec_id", "embedding"),
        assign=assign,
    )
    res["verdicts"].write.mode("overwrite").parquet(
        os.path.join(
            store_path, "ingest_verdicts", f"ingest_batch={commit_token}"
        )
    )
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as fh:
        fh.write("committed\n")


def run_semantic_ingest_stream(
    spark: SparkSession,
    sf_dir: str,
    store_path: str,
    checkpoint_dir: str,
    assign: str = "blas",
) -> None:
    """Drain the embeddings stream through the semantic tier into the
    persisted cell store (built by the caller with
    ``semantic_store_build``) with availableNow. Per-batch audit
    ledger under ``<store>/ingest_verdicts/ingest_batch=<token>``;
    commit token = md5(checkpoint path) + batch id, the curation
    gate's replay-determinism unit."""
    run_key = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]
    stream = read_embeddings_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: _ingest_batch(
                bdf, store_path, f"{run_key}-{bid}", assign
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
