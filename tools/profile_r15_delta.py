#!/usr/bin/env python
"""Step-level timing of dedup_delta's interior (r15 guide §1): a copy
of the operator body with a perf counter after every eager action, so
the 6.8 s measured for the whole call is attributed to specific jobs.
Read-only: append=False, no store mutation."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from commodity_price_forecasting_spark.session import (  # noqa: E402
    ensure_package_shipped,
    get_spark,
)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="cpf-profile-r15-delta",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    ensure_package_shipped(spark)

    from commodity_price_forecasting_spark.operators.dedup import (
        band_signatures,
        char_shingles,
        connected_components,
        content_fingerprint,
        estimated_jaccard,
        lsh_candidate_pairs,
        minhash_wide,
    )
    from commodity_price_forecasting_spark.operators.dedup_store import (
        _mh_cols,
        dedup_store_load,
    )
    from commodity_price_forecasting_spark.plans.queries_datapipe import (
        _shared_dedup_store_path,
        load_table,
    )
    from commodity_price_forecasting_spark.plans.registry import load_all

    reg = load_all()
    reg["dedup_delta_verdicts"].fn(spark, sf_dir).count()  # warm

    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    cut = (max_id * 4) // 5
    path = _shared_dedup_store_path(spark, sf_dir, cut)
    new_docs = docs.filter(F.col("doc_id") >= cut)

    marks = []
    t0 = time.perf_counter()

    def mark(label):
        nonlocal t0
        t1 = time.perf_counter()
        marks.append((label, t1 - t0))
        t0 = t1

    store = dedup_store_load(spark, path)
    m = store["meta"]
    k, num_hashes, rows_per_band, threshold = (
        int(m["k"]), int(m["num_hashes"]), int(m["rows_per_band"]),
        float(m["threshold"]),
    )
    max_store_id = int(m["max_doc_id"])
    mh = _mh_cols(num_hashes)
    mark("store_load (meta first())")

    d = new_docs.select("doc_id", "text")
    lim = d.agg(F.min("doc_id").alias("_lo"), F.count(F.lit(1)).alias("_n")).first()
    mark("lim agg first()")
    bcast = F.broadcast

    dfp = d.select("doc_id", content_fingerprint(F.col("text")).alias("fp")).cache()
    d_holders = dfp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    store_hit = (
        store["fingerprints"]
        .join(bcast(d_holders.select("fp")), "fp")
        .select("fp", F.col("canon_id").alias("_store_canon"))
        .localCheckpoint(eager=True)
    )
    mark("store_hit localCheckpoint")

    new_fp_holders = d_holders.join(bcast(store_hit.select("fp")), "fp", "left_anti")
    duniq = d.join(new_fp_holders.select("doc_id"), "doc_id")
    sh = char_shingles(duniq, k=k, distinct=False)
    dwide = minhash_wide(sh, num_hashes=num_hashes).cache()
    dbands = band_signatures(dwide, num_hashes=num_hashes, rows_per_band=rows_per_band)
    cand_dd = lsh_candidate_pairs(dbands)
    edges_dd = estimated_jaccard(dwide, cand_dd, num_hashes=num_hashes).filter(
        F.col("est_jaccard") >= threshold
    )
    mark("delta minhash plan build (lazy)")

    cand_ds = (
        store["bands"]
        .join(
            bcast(dbands.select("band", "sig", F.col("doc_id").alias("doc_b"))),
            ["band", "sig"],
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    mark("cand_ds localCheckpoint (store bands scan + delta minhash)")

    s_sigs = store["signatures"].join(
        bcast(cand_ds.select(F.col("doc_a").alias("doc_id")).distinct()), "doc_id"
    )
    pair_sigs = s_sigs.select("doc_id", *mh).unionByName(dwide.select("doc_id", *mh))
    edges_ds = estimated_jaccard(pair_sigs, cand_ds, num_hashes=num_hashes).filter(
        F.col("est_jaccard") >= threshold
    )
    canon_map = store["signatures"].select(
        F.col("doc_id").alias("doc_a"), F.col("canon_id").alias("_ca")
    )
    edges_ds_c = (
        edges_ds.join(canon_map, "doc_a")
        .select(F.col("_ca").alias("doc_a"), "doc_b")
        .distinct()
    )
    all_edges = edges_dd.select("doc_a", "doc_b").unionByName(
        edges_ds_c.select("doc_a", "doc_b")
    )
    mark("edge plan build (lazy)")

    comp = connected_components(all_edges, "doc_a", "doc_b")
    mark("connected_components call (eager fast path)")
    comp = comp.localCheckpoint(eager=True)
    mark("comp localCheckpoint")

    node_canon = comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("_canon")
    )
    holder_v = (
        d_holders.join(bcast(store_hit), "fp", "left")
        .join(node_canon, "doc_id", "left")
        .select(
            "doc_id",
            "fp",
            F.when(F.col("_store_canon").isNotNull(), F.lit("exact_dup"))
            .when(
                F.col("_canon").isNotNull() & (F.col("_canon") < F.col("doc_id")),
                F.lit("near_dup"),
            )
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce(
                F.col("_store_canon"),
                F.when(F.col("_canon") < F.col("doc_id"), F.col("_canon")),
            ).alias("_dup0"),
        )
    )
    bridge_chase = node_canon.filter(F.col("doc_id") <= max_store_id).select(
        F.col("doc_id").alias("_dup0"), F.col("_canon").alias("_chased")
    )
    holder_v = (
        holder_v.join(bcast(bridge_chase), "_dup0", "left")
        .select(
            "doc_id", "fp", "status",
            F.when(
                F.col("status") != "kept", F.coalesce("_chased", "_dup0")
            ).alias("dup_of"),
        )
        .localCheckpoint(eager=True)
    )
    mark("holder_v localCheckpoint")

    holder_final = holder_v.select(
        "fp", F.col("doc_id").alias("_h"),
        F.coalesce("dup_of", "doc_id").alias("_final"),
    )
    nonholder_v = (
        dfp.join(bcast(holder_final), "fp")
        .filter(F.col("doc_id") != F.col("_h"))
        .select(
            "doc_id", F.lit("exact_dup").alias("status"),
            F.col("_final").alias("dup_of"),
        )
    )
    verdicts = holder_v.select("doc_id", "status", "dup_of").unionByName(nonholder_v)
    verdicts.write.format("noop").mode("overwrite").save()
    mark("verdicts noop materialize")

    store_members = comp.filter(F.col("node") <= max_store_id)
    bridges = (
        store_members.alias("x")
        .join(store_members.alias("y"), "component")
        .filter(F.col("x.node") < F.col("y.node"))
        .select(F.col("x.node").alias("canon_a"), F.col("y.node").alias("canon_b"))
        .distinct()
    )
    bridges.write.format("noop").mode("overwrite").save()
    mark("bridges noop materialize")
    dfp.unpersist()
    dwide.unpersist()

    for label, dt in marks:
        print(f"{label:55s} {dt:7.3f}s", flush=True)
    print(f"{'SUM':55s} {sum(dt for _, dt in marks):7.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
