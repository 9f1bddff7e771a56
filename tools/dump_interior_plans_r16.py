#!/usr/bin/env python
"""Dump the r15-touched INTERIOR plans that the registered lanes hide
behind eager localCheckpoints: the SemDeDup pair/drop stage (now
carrying an explicit cell-keyed Exchange) and the fold assignment
(now carrying the hoisted ``_nv`` norm column and literal seed
norms). Written to plans/r16/interior_*_{suffix}.txt."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from commodity_price_forecasting_spark.session import (  # noqa: E402
    ensure_package_shipped,
    get_spark,
)


def explain_str(spark, df, mode="formatted"):
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    spark = get_spark(
        app_name="cpf-interior-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    ensure_package_shipped(spark)

    from commodity_price_forecasting_spark.operators.similarity import (
        _dot,
        _norm,
        _semdedup_seeds,
        assign_cells_fold,
    )
    from commodity_price_forecasting_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = _semdedup_seeds(emb, 45, "embedding", "vec_id")

    # 1. the fold assignment (hoisted-norm form after r15)
    assigned = assign_cells_fold(emb, seeds)
    with open(
        os.path.join(out_dir, f"interior_assign_fold_{suffix}.txt"), "w"
    ) as fh:
        fh.write(explain_str(spark, assigned))

    # 2. the SemDeDup pair/drop stage UP TO the aggregation (the frame
    # _drops_from_assigned materializes into its localCheckpoint) —
    # rebuilt here exactly as the operator builds it so the Exchange
    # story is visible in a plan the registered lanes truncate.
    par = spark.sparkContext.defaultParallelism
    ap = assigned.repartition(par, F.col("cell"))
    a = ap.select(
        F.col("_vid").alias("_ida"),
        F.col("_emb").alias("_ea"),
        "cell",
        F.col("_cent").alias("_ca"),
    )
    b = ap.select(
        F.col("_vid").alias("_idb"),
        F.col("_emb").alias("_eb"),
        F.col("cell").alias("_cellb"),
        F.col("_cent").alias("_cb"),
    )
    keeper_precedes = (F.col("_ca") < F.col("_cb")) | (
        (F.col("_ca") == F.col("_cb")) & (F.col("_ida") < F.col("_idb"))
    )
    pair_cos = F.round(
        _dot(F.col("_ea"), F.col("_eb"))
        / (_norm(F.col("_ea")) * _norm(F.col("_eb"))),
        6,
    )
    dominated = a.join(
        b, (F.col("cell") == F.col("_cellb")) & keeper_precedes
    ).filter(pair_cos >= 0.3)
    result = dominated.groupBy("_idb", "_cellb", "_cb").agg(
        F.count(F.lit(1)).alias("n_dominators"),
        F.min("_ida").alias("first_keeper"),
    )
    with open(
        os.path.join(out_dir, f"interior_semdedup_pairs_{suffix}.txt"), "w"
    ) as fh:
        fh.write(explain_str(spark, result))
    print("wrote interior plans", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
