#!/usr/bin/env python
"""r15 optimization-round profiler: per-stage wall clock of the two
hottest bench lanes (curation_pipeline_full, dedup_delta_verdicts) so
the optimization targets the measured stage, not a guess (guide §1).

Each stage is materialized with the noop sink (guide §1.4) in
dependency order; the printed number is the INCREMENTAL cost of that
stage given its inputs are already cached/materialized exactly as the
real query leaves them.  Run AFTER the baseline bench, never
concurrently with it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from commodity_price_forecasting_spark.session import get_spark  # noqa: E402


def timed(spark, label, df=None, action=None, runs=1):
    best = None
    for _ in range(runs):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        if action is not None:
            action()
        else:
            df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:55s} {best:7.3f}s", flush=True)
    return best


def profile_curation(spark, sf_dir):
    from pyspark.sql import Window as W

    from commodity_price_forecasting_spark.operators.dedup import (
        band_signatures,
        char_shingles,
        connected_components,
        estimated_jaccard,
        lsh_star_pairs,
        minhash_wide,
    )
    from commodity_price_forecasting_spark.operators.similarity import (
        semantic_dedup,
    )
    from commodity_price_forecasting_spark.operators.textops import (
        pii_redact,
        quality_score,
    )
    from commodity_price_forecasting_spark.plans.queries_datapipe import (
        load_table,
    )

    print("== curation_pipeline_full stages ==", flush=True)
    t_all0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    from commodity_price_forecasting_spark.operators.textops import (
        quality_score_rowwise,
    )

    red = (
        quality_score_rowwise(
            pii_redact(docs), text_col="redacted", keep=("redacted",)
        )
        .select("doc_id", F.col("redacted").alias("text"), "quality")
        .cache()
    )
    timed(spark, "s1 pii_redact+quality rowwise (cache fill)", red)
    q = red.select(F.col("doc_id").alias("q_doc"), "quality")
    s2 = red.filter(F.col("quality") >= 0.7).select("doc_id", "text").cache()
    timed(spark, "s2 quality gate filter (cache fill)", s2)
    s3_ids = (
        s2.groupBy(F.md5(F.col("text").cast("binary")).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .cache()
    )
    timed(spark, "s3 exact dedup (cache fill)", s3_ids)
    s3d = s2.join(s3_ids, "doc_id")
    sh = char_shingles(s3d, k=5, distinct=False)
    timed(spark, "s4a char_shingles (noop)", sh)
    wide = minhash_wide(sh, num_hashes=12).cache()
    timed(spark, "s4b minhash_wide (cache fill)", wide)
    bands = band_signatures(wide, num_hashes=12, rows_per_band=3)
    cand = lsh_star_pairs(bands)
    timed(spark, "s4c band+star candidates (noop)", cand)
    edges = estimated_jaccard(wide, cand, num_hashes=12).filter(
        F.col("est_jaccard") >= 0.5
    )
    timed(spark, "s4d estimated_jaccard edges (noop)", edges)
    comp = connected_components(edges, "doc_a", "doc_b")
    timed(spark, "s4e connected_components (build+noop)", comp)
    ranked = comp.join(q, comp.node == F.col("q_doc")).select(
        "component",
        F.col("node").alias("doc_id"),
        F.row_number()
        .over(W.partitionBy("component").orderBy(F.desc("quality"), F.asc("node")))
        .alias("rk"),
    )
    dropped = ranked.filter(F.col("rk") > 1).select("doc_id")
    s4 = s3_ids.join(dropped, "doc_id", "left_anti").cache()
    timed(spark, "s4f canonical pick (cache fill)", s4)
    embs = (
        load_table(spark, sf_dir, "embeddings")
        .join(s4, F.col("vec_id") == F.col("doc_id"))
        .select("vec_id", "embedding")
    )
    t0 = time.perf_counter()
    drops = semantic_dedup(embs).select(F.col("vec_id").alias("doc_id"))
    print(f"{'s5a semantic_dedup plan-build (driver)':55s} {time.perf_counter()-t0:7.3f}s", flush=True)
    s5 = s4.join(drops, "doc_id", "left_anti")
    timed(spark, "s5b semantic stage materialize (noop)", s5)
    pct = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    split = s5.select(
        "doc_id",
        F.when(pct < 80, "split_train")
        .when(pct < 90, "split_val")
        .otherwise("split_test")
        .alias("split"),
    )
    timed(spark, "s6 split counts (noop)", split.groupBy("split").count())
    print(f"{'TOTAL stage-by-stage':55s} {time.perf_counter()-t_all0:7.3f}s", flush=True)
    for fr in (red, s2, s3_ids, wide, s4):
        fr.unpersist()


def profile_dedup_delta(spark, sf_dir):
    from commodity_price_forecasting_spark.plans.queries_datapipe import (
        _shared_dedup_store_path,
        load_table,
    )

    print("== dedup_delta_verdicts ==", flush=True)
    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    max_id = docs.agg(F.max("doc_id")).first()[0]
    print(f"{'d0 max_id agg':55s} {time.perf_counter()-t0:7.3f}s", flush=True)
    cut = (max_id * 4) // 5
    t0 = time.perf_counter()
    path = _shared_dedup_store_path(spark, sf_dir, cut)
    print(f"{'d1 store build/memo':55s} {time.perf_counter()-t0:7.3f}s", flush=True)

    from commodity_price_forecasting_spark.operators.dedup_store import dedup_delta

    delta = docs.filter(F.col("doc_id") >= cut)
    for run in range(2):
        t0 = time.perf_counter()
        res = dedup_delta(spark, path, delta, append=False)
        t1 = time.perf_counter()
        res["verdicts"].write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(
            f"{'d2 dedup_delta eager part (run %d)' % run:55s} {t1-t0:7.3f}s",
            flush=True,
        )
        print(
            f"{'d3 verdicts materialize (run %d)' % run:55s} {t2-t1:7.3f}s",
            flush=True,
        )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="cpf-profile-r15",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from commodity_price_forecasting_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # warm-up pass (JIT/codegen) mirroring bench discipline
    from commodity_price_forecasting_spark.plans.registry import load_all

    reg = load_all()
    if which in ("all", "curation"):
        reg["curation_pipeline_full"].fn(spark, sf_dir).count()  # warm
        profile_curation(spark, sf_dir)
    if which in ("all", "delta"):
        reg["dedup_delta_verdicts"].fn(spark, sf_dir).count()  # warm
        profile_dedup_delta(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
