#!/usr/bin/env python
"""Sustained micro-batch latency/throughput probe for the streaming
extension (VERDICT r7 ask #8): every prior streaming number is
availableNow replay EQUALITY — correct, but silent on latency. This
tool runs a real sustained micro-batch stream and records what the
equality tests cannot: per-trigger latency, sustained rows/s, and
state-store size, from StreamingQueryProgress.

Method:
  1. stage the events table as N time-ordered parquet chunks (so
     watermarks advance across micro-batches like a live source);
  2. file-stream them with maxFilesPerTrigger=1 -> one chunk per
     micro-batch = a sustained run of N triggers;
  3. run the chosen pipeline (windowed_psi: TWO chained stateful
     aggregations + a stream-static broadcast join — the repo's most
     state-heavy registered stream; or funnel: the
     applyInPandasWithState custom operator) into a memory sink;
  4. report per-batch progress JSON and a one-line summary
     (mean/p95/max trigger ms, sustained rows/s, state rows/bytes).

Usage:
  python tools/stream_latency_probe.py [--sf-dir .scratch/sf1]
      [--chunks 50] [--pipeline psi|funnel] [--out FILE.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.session import get_spark
from commodity_price_forecasting_spark.sources.readers import (
    load_table,
    normalize_event_ts,
)


def stage_chunks(
    spark,
    sf_dir: str,
    n_chunks: int,
    stage_dir: str,
    table: str = "events",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    filter_expr: str | None = None,
) -> int:
    """Write a table as n_chunks time-ordered parquet files: chunk i
    holds the i-th slice of the order, one file each, so
    maxFilesPerTrigger=1 replays history in event-time order (for
    documents the order is doc_id — the synthetic arrival ts is
    monotone in it). ``filter_expr`` restricts the staged slice (the
    near-dup probe streams only ids ABOVE the persisted store's max —
    the dedup_delta monotonicity contract)."""
    ev = load_table(spark, sf_dir, table)
    if filter_expr:
        ev = ev.filter(filter_expr)
    total = ev.count()
    per = (total + n_chunks - 1) // n_chunks
    ranked = ev.select(
        F.floor(
            (F.row_number().over(Window.orderBy(*order_cols)) - 1) / per
        ).alias("_chunk"),
        "*",
    )
    # one file per chunk value; write sequentially to keep file mtimes
    # (and therefore file-source pickup order) aligned with event time
    for i in range(n_chunks):
        (
            ranked.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .coalesce(1)
            .write.mode("append")
            .parquet(stage_dir)
        )
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scratch/sf1")
    ap.add_argument("--chunks", type=int, default=50)
    ap.add_argument(
        "--pipeline", choices=("psi", "funnel", "curation"), default="psi"
    )
    ap.add_argument(
        "--near-dup",
        action="store_true",
        help="curation only (r11 ask #3): persist a MinHash band store "
        "from the FIRST HALF of the corpus, then stream the second "
        "half through the exact + near-dup tiers — the sustained "
        "latency of the full streaming gate",
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions (default: "
        "state-sized via state_sized_partitions — the r9 sweep's "
        "measured-better cell; pass a value to sweep the knob)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="cpf-stream-latency",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    if args.shuffle_partitions is None:
        # r10 default (r9 VERDICT ask #6): size the stateful query's
        # partitions to its STATE cardinality, not the core count —
        # the r9 sweep measured 32→8 cutting the trigger ~2.2x at 126
        # window×bin state keys. The batch face of each pipeline
        # yields the state-key count in one cheap pre-pass.
        from commodity_price_forecasting_spark.streaming.events_stream import (
            state_sized_partitions,
        )

        ev_batch = load_table(spark, args.sf_dir, "events")
        rows_per_trigger = None
        if args.pipeline == "curation":
            # dedup state = fingerprints alive within the watermark.
            # The synthetic arrival clock ticks 1 doc/second, so the
            # alive horizon is the trailing <watermark> seconds of
            # doc_ids; at fixture SFs the whole corpus fits inside it
            # and the honest count is every gated unique fingerprint.
            from commodity_price_forecasting_spark.streaming.curation_stream import (
                curate_docs,
                with_arrival_ts,
            )

            n_state = (
                curate_docs(
                    with_arrival_ts(load_table(spark, args.sf_dir, "documents"))
                )
                .select("fp")
                .distinct()
                .count()
            )
            # maxFilesPerTrigger=1 over --chunks files: per-trigger
            # input is corpus/chunks — the r11 second bound (tiny
            # triggers want narrow partitions however big the store)
            n_docs = load_table(spark, args.sf_dir, "documents").count()
            rows_per_trigger = -(-n_docs // args.chunks)
        elif args.pipeline == "psi":
            # steady-state state cardinality = WATERMARK-ALIVE keys,
            # not all-history windows (watermark evicts the rest):
            # (window, bin) pairs + windows inside the last
            # window+watermark horizon. The r10 sweep: all-history
            # windows derived 19 partitions (867 ms trigger); this
            # alive-horizon count derives 3 (531 ms) — monotone better
            # than the r9 best cell of 8 (614 ms rerun).
            mx = ev_batch.agg(F.max("ts").alias("m")).first()["m"]
            alive = ev_batch.filter(
                F.col("ts") >= F.lit(mx) - F.expr("INTERVAL 2 DAYS")
            )
            wb = (
                alive.select(
                    F.window("ts", "1 day").alias("w"),
                    F.floor(F.col("value") / 25.0).alias("bin"),
                )
                .distinct()
                .count()
            )
            wn = alive.select(F.window("ts", "1 day")).distinct().count()
            n_state = wb + wn
        else:
            n_state = ev_batch.select("user_id").distinct().count()
        args.shuffle_partitions = state_sized_partitions(
            spark, n_state, rows_per_trigger=rows_per_trigger
        )
        print(
            f"# state-sized default: {n_state} state keys"
            + (f", {rows_per_trigger} rows/trigger" if rows_per_trigger else "")
            + f" -> {args.shuffle_partitions} shuffle partitions",
            file=sys.stderr,
        )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
    )
    stage_dir = tempfile.mkdtemp(prefix="cpf_stream_stage_")
    sink_dir = tempfile.mkdtemp(prefix="cpf_stream_sink_")
    try:
        near_path = None
        doc_filter = None
        if args.pipeline == "curation" and args.near_dup:
            from commodity_price_forecasting_spark.operators.dedup_store import (
                dedup_store_build,
            )
            from commodity_price_forecasting_spark.streaming.curation_stream import (
                curate_docs as _cd,
                with_arrival_ts as _wts,
            )

            docs_all = load_table(spark, args.sf_dir, "documents")
            cut = docs_all.agg(F.max("doc_id")).first()[0] // 2
            base = _cd(_wts(docs_all.filter(F.col("doc_id") < cut)))
            near_path = os.path.join(sink_dir, "near_store")
            built = dedup_store_build(
                base.select("doc_id", "text"), near_path
            )
            doc_filter = f"doc_id >= {cut}"
            print(
                f"# near-dup store: {built['n_unique']} uniques from "
                f"doc_id < {cut}; streaming doc_id >= {cut}",
                file=sys.stderr,
            )
        if args.pipeline == "curation":
            total_rows = stage_chunks(
                spark,
                args.sf_dir,
                args.chunks,
                stage_dir,
                table="documents",
                order_cols=("doc_id",),
                filter_expr=doc_filter,
            )
        else:
            total_rows = stage_chunks(spark, args.sf_dir, args.chunks, stage_dir)
        schema = spark.read.parquet(stage_dir).schema
        if args.pipeline == "curation":
            src = None  # curation builds its own source below
        else:
            src = normalize_event_ts(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage_dir)
            )
        if args.pipeline == "curation":
            from commodity_price_forecasting_spark.streaming.curation_stream import (
                _append_batch,
                curate_docs,
                with_arrival_ts,
            )

            doc_src = with_arrival_ts(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage_dir)
            )
            out_df = curate_docs(doc_src)
            mode = "append"
            sink = lambda w: w.foreachBatch(  # noqa: E731
                lambda bdf, _bid: _append_batch(
                    bdf,
                    os.path.join(sink_dir, "store"),
                    os.path.join(sink_dir, "corpus"),
                    near_dup_store=near_path,
                )
            )
        elif args.pipeline == "psi":
            from commodity_price_forecasting_spark.streaming.events_stream import (
                value_bin_baseline,
                windowed_psi,
            )

            baseline = value_bin_baseline(load_table(spark, args.sf_dir, "events"))
            out_df = windowed_psi(src, baseline)
            mode = "append"
            sink = None
        else:
            from commodity_price_forecasting_spark.streaming.events_stream import (
                funnel_stage,
            )

            out_df = funnel_stage(src)
            mode = "update"
            sink = None

        t0 = time.perf_counter()
        writer = out_df.writeStream.outputMode(mode)
        if sink is not None:
            writer = sink(writer)
        else:
            writer = writer.format("memory").queryName("latency_probe")
        q = writer.start()
        # drain: once every staged chunk is consumed the engine runs
        # ONE no-data micro-batch (watermark advance) and then goes
        # idle — lastProgress stops changing. Done = the newest batch
        # is EMPTY and no new batchId has appeared for >= 3 s. This
        # fixes both prior bugs: the r8 ADVICE early-exit (a single
        # mid-stream zero-row batch lingering as lastProgress for a
        # few 0.2 s polls — mid-stream, the next data batch arrives
        # well inside 3 s because files are already staged) and the
        # r9 first-fix hang (waiting for three DISTINCT empty batches
        # that a drained file source never emits). A 120 s
        # no-progress cap guards a wedged source either way.
        seen_batches: dict[int, dict] = {}
        last_new = time.monotonic()
        last_empty = False
        while True:
            time.sleep(0.2)
            p = q.lastProgress
            if p is None:
                continue
            if p["batchId"] not in seen_batches:
                last_new = time.monotonic()
                last_empty = p["numInputRows"] == 0
            seen_batches[p["batchId"]] = p
            idle = time.monotonic() - last_new
            if last_empty and idle >= 3.0:
                break
            if idle >= 120.0:
                print(
                    "# drain: no new micro-batch for 120s with data "
                    "pending — treating the source as wedged",
                    file=sys.stderr,
                )
                break
        wall = time.perf_counter() - t0
        q.stop()
        q.awaitTermination(30)

        progresses = [seen_batches[b] for b in sorted(seen_batches)]
        data_batches = [p for p in progresses if p["numInputRows"] > 0]
        trig_ms = sorted(
            p["durationMs"]["triggerExecution"] for p in data_batches
        )
        state_rows = state_bytes = 0
        if data_batches and data_batches[-1].get("stateOperators"):
            last = data_batches[-1]["stateOperators"]
            state_rows = sum(s.get("numRowsTotal", 0) for s in last)
            state_bytes = sum(s.get("memoryUsedBytes", 0) for s in last)
        rows_in = sum(p["numInputRows"] for p in data_batches)
        summary = {
            "pipeline": args.pipeline,
            "sf_dir": args.sf_dir,
            "chunks": args.chunks,
            "shuffle_partitions": args.shuffle_partitions or int(args.cpus),
            "rows_staged": total_rows,
            "rows_processed": rows_in,
            "micro_batches": len(data_batches),
            "wall_sec": round(wall, 2),
            "sustained_rows_per_sec": round(rows_in / wall, 1),
            "trigger_ms_mean": round(sum(trig_ms) / max(len(trig_ms), 1), 1),
            "trigger_ms_p95": trig_ms[
                min(len(trig_ms) - 1, max(0, -(-95 * len(trig_ms) // 100) - 1))
            ]
            if trig_ms
            else None,
            "trigger_ms_max": trig_ms[-1] if trig_ms else None,
            "state_rows_total": state_rows,
            "state_memory_bytes": state_bytes,
        }
        # default=str: progress dicts carry UUID ids in Spark 4.x
        lines = [json.dumps(p, default=str) for p in data_batches] + [
            json.dumps(summary)
        ]
        if args.out:
            with open(args.out, "w") as fh:
                fh.write("\n".join(lines) + "\n")
        print(json.dumps(summary))
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
        shutil.rmtree(sink_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
