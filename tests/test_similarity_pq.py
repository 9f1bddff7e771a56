"""Product-quantization ANN: the ADC estimate must (a) collapse to the
EXACT squared-L2 ranking when every corpus vector is its own codebook
entry (codebook = corpus ⇒ per-subspace quantization error = 0), and
(b) keep useful recall at the real 16-entry codebook."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.similarity import (
    pq_adc_topk,
    pq_distances,
    pq_encode,
)
from commodity_price_forecasting_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _exact_l2_topk(emb_rows, query_id: int, k: int) -> list[int]:
    ids = np.array([r["vec_id"] for r in emb_rows])
    mat = np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
    q = mat[ids == query_id][0]
    d2 = ((mat - q) ** 2).sum(axis=1)
    order = sorted(
        (float(d), int(i)) for d, i in zip(d2, ids) if i != query_id
    )
    return [i for _, i in order[:k]]


def test_pq_adc_exact_when_codebook_is_corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n = emb.count()
    rows = emb.collect()
    exact = _exact_l2_topk(rows, query_id=0, k=10)
    adc = pq_adc_topk(emb, query_id=0, k=10, n_centroids=n, m_sub=8).collect()
    assert [r["vec_id"] for r in adc] == exact
    # and the reported distances ARE the exact squared L2 distances
    ids = {r["vec_id"]: r["adc_dist"] for r in adc}
    mat = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = mat[0]
    for vid, d in ids.items():
        assert abs(d - ((mat[vid] - q) ** 2).sum()) < 1e-5


def test_pq_recall_at_16_centroids(spark):
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    exact = set(_exact_l2_topk(emb.collect(), query_id=0, k=10))
    adc = {
        r["vec_id"]
        for r in pq_adc_topk(emb, query_id=0, k=10, n_centroids=16, m_sub=8).collect()
    }
    # crude 16-entry codebook on random-ish vectors: require real signal,
    # not perfection (recall@10 >= 0.3 measured ~stable on the fixture)
    assert len(adc & exact) >= 3


def test_pq_codes_cover_corpus_once(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    codes = pq_encode(pq_distances(emb, n_centroids=16, m_sub=8))
    per_vec = codes.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n_sub"))
    assert per_vec.filter(F.col("n_sub") != 8).count() == 0
    assert per_vec.count() == n
    seed_ids = {r["vec_id"] for r in emb.orderBy("vec_id").limit(16).collect()}
    bad = codes.filter(~F.col("code").isin(*seed_ids)).count()
    assert bad == 0


def test_ivfpq_numpy_twin_and_probe_containment(spark):
    """r8 IVF-PQ: the full two-level index (coarse assignment ->
    residual -> codebook -> codes -> probe -> LUT sum) must match a
    whole-corpus numpy twin of the same rules EXACTLY, and every
    returned candidate must come from a probed cell."""
    import math

    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_adc_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = mat[ids == 0][0]
    cids = ids[ids != 0]
    cmat = mat[ids != 0]

    # coarse seeds: md5-min 16 of the corpus (query excluded)
    import hashlib

    order = sorted(
        range(len(cids)),
        key=lambda i: (hashlib.md5(str(cids[i]).encode()).hexdigest(), cids[i]),
    )[:16]
    sids = cids[order]
    S = cmat[order]

    def r6(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def cell_of(M):
        C = r6(
            (M / np.linalg.norm(M, axis=1, keepdims=True))
            @ (S / np.linalg.norm(S, axis=1, keepdims=True)).T
        )
        # argmax with ties to the smallest seed id: seeds sorted by id
        by_id = np.argsort(sids)
        Cs = C[:, by_id]
        return sids[by_id][np.argmax(Cs, axis=1)]

    cells = cell_of(cmat)
    seed_by_id = {int(s): S[i] for i, s in enumerate(sids)}
    res = cmat - np.array([seed_by_id[int(c)] for c in cells])

    # codebook: residuals of the 16 smallest corpus ids
    cb_idx = np.argsort(cids)[:16]
    cb = res[cb_idx]
    cb_ids = cids[cb_idx]

    def codes_of(R):
        out = np.empty((len(R), 8), dtype=np.int64)
        for m in range(8):
            sub = R[:, m * 8 : (m + 1) * 8]
            csub = cb[:, m * 8 : (m + 1) * 8]
            d2 = ((sub[:, None, :] - csub[None, :, :]) ** 2).sum(axis=2)
            # argmin with ties to the smallest codebook id: sort the
            # codebook by id so np.argmin's first-min is the tie rule
            ordc = np.argsort(cb_ids)
            out[:, m] = cb_ids[ordc][np.argmin(d2[:, ordc], axis=1)]
        return out

    codes = codes_of(res)

    # probe: 2 nearest seeds to q by round6 cosine (python-round rule)
    def pycos(a, b):
        dot = float(np.dot(a, b))
        return dot / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b)))

    probe = sorted(
        zip(sids, S), key=lambda s: (-round(pycos(s[1], q), 6), s[0])
    )[:2]
    probe_ids = [int(c) for c, _ in probe]
    dists = {}
    for c, sv in probe:
        qr = q - sv
        mask = cells == c
        for vid, code_row in zip(cids[mask], codes[mask]):
            d = 0.0
            for m in range(8):
                entry = cb[np.argwhere(cb_ids == code_row[m])[0][0]]
                d += float(
                    ((qr[m * 8 : (m + 1) * 8] - entry[m * 8 : (m + 1) * 8]) ** 2).sum()
                )
            dists[int(vid)] = d
    want = sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:10]

    got = ivf_pq_adc_topk(emb, query_id=0, k=10).collect()
    assert [r["vec_id"] for r in got] == [v for v, _ in want]
    assert all(r["cell"] in probe_ids for r in got)
    for r, (_, d) in zip(got, want):
        assert abs(r["adc_dist"] - round(d, 6)) < 1e-9


def test_ivfpq_threads_custom_id_col_and_guards_missing_query(spark):
    """r8 ADVICE (medium): ivf_pq_adc_topk advertised id_col but the
    PQ helpers hard-coded 'vec_id', so any renamed id column raised
    AnalysisException. The renamed frame must now return EXACTLY the
    default-named result (modulo the id column name), and a missing
    query_id must raise a NAMED ValueError, not TypeError on None."""
    import pytest as _pytest

    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_adc_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    base = ivf_pq_adc_topk(emb, query_id=0, k=5).collect()
    renamed = emb.withColumnRenamed("vec_id", "doc_id")
    got = ivf_pq_adc_topk(renamed, query_id=0, k=5, id_col="doc_id").collect()
    assert [r["doc_id"] for r in got] == [r["vec_id"] for r in base]
    assert [r["adc_dist"] for r in got] == [r["adc_dist"] for r in base]
    assert got[0].__fields__ == ["doc_id", "cell", "adc_dist"]

    with _pytest.raises(ValueError, match="query vec_id=-12345 not found"):
        ivf_pq_adc_topk(emb, query_id=-12345, k=5).collect()

    # pq_adc_topk gets the same threading (shared helpers)
    got_pq = pq_adc_topk(renamed, query_id=0, k=5, id_col="doc_id").collect()
    base_pq = pq_adc_topk(emb, query_id=0, k=5).collect()
    assert [r["doc_id"] for r in got_pq] == [r["vec_id"] for r in base_pq]


def test_ivfpq_split_build_probe_equals_single_plan(spark, tmp_path):
    """r8 VERDICT ask #2: the split form — materialize the index once
    (codes/cells/cb to parquet, the deployment shape), then run the
    probe-only plan — must return EXACTLY the single-plan
    ivf_pq_adc_topk result. This is what makes the separate
    build-vs-probe timings in SCALE.md claims about the SAME
    computation."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_adc_topk,
        ivf_pq_index,
        ivf_pq_probe,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    base = ivf_pq_adc_topk(emb, query_id=0, k=10).collect()

    q = [
        float(x)
        for x in emb.filter("vec_id = 0").select("embedding").first()[0]
    ]
    idx = ivf_pq_index(emb, exclude_id=0)
    for part in ("codes", "cells", "cb"):
        idx[part].write.mode("overwrite").parquet(str(tmp_path / part))
    idx["res"].unpersist()
    reloaded = dict(
        idx,
        codes=spark.read.parquet(str(tmp_path / "codes")),
        cells=spark.read.parquet(str(tmp_path / "cells")),
        cb=spark.read.parquet(str(tmp_path / "cb")),
    )
    got = ivf_pq_probe(reloaded, q, k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in base]


def test_ivfpq_partitioned_layout_prunes_and_matches(spark, tmp_path):
    """r9: the cell-partitioned persisted layout
    (ivf_pq_index_write/_load). Three claims, each checked:
    (1) the loaded-index probe returns EXACTLY the single-plan
    ivf_pq_adc_topk rows; (2) the probe plan carries the probed cells
    as PartitionFilters on the coded scan (static partition pruning —
    the scan reads n_probe of k_coarse directories, the 100 TB claim
    SCALE.md r8 asserted and r9 measures); (3) the on-disk layout has
    one directory per coarse cell."""
    import os as _os
    import re

    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_adc_topk,
        ivf_pq_index,
        ivf_pq_index_load,
        ivf_pq_index_write,
        ivf_pq_probe,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    base = ivf_pq_adc_topk(emb, query_id=0, k=10).collect()
    q = [
        float(x)
        for x in emb.filter("vec_id = 0").select("embedding").first()[0]
    ]
    idx = ivf_pq_index(emb, exclude_id=0)
    ivf_pq_index_write(idx, str(tmp_path))
    idx["res"].unpersist()

    # (3) one parquet directory per coarse cell that has members
    cell_dirs = [
        d
        for d in _os.listdir(str(tmp_path / "coded"))
        if d.startswith("cell=")
    ]
    n_cells = idx["cells"].select("cell").distinct().count()
    assert len(cell_dirs) == n_cells

    loaded = ivf_pq_index_load(spark, str(tmp_path))
    probe_df = ivf_pq_probe(loaded, q, k=10)

    # (2) static partition pruning: the scan node lists the probed
    # cells as PartitionFilters (not a post-scan Filter)
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[.*cell.*\]", plan)
    assert m, plan
    assert "dynamicpruning" not in m.group(0)

    # (1) exact equality with the single-plan form
    got = probe_df.collect()
    assert [
        (r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in got
    ] == [(r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in base]


def test_ann_recall_floors_and_monotonicity(spark):
    """r8 VERDICT ask #3: the cross-lane recall@10 table exists as a
    measured artifact (tools/ann_recall.py, SCALE.md r9); this pins
    its floors at sf0.001 so a regression in any lane's routing or
    scoring shows up as a recall drop, not a silent quality loss.
    Floors are the r9-measured values minus slack; brute is 1.0 by
    definition; IVF recall must be monotone in n_probe."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.ann_recall import recall_table

    rows = recall_table(spark, SF_DIR, k=10, n_queries=8)
    by = {(r["lane"], r["n_probe"]): r["recall_at_k"] for r in rows}
    assert by[("brute", None)] == 1.0
    # measured r9 at sf0.001 (8 queries): ivf 0.1875/0.325/0.4875,
    # ivf_kmeans 0.2125/0.3125/0.475, pq_adc 0.2125,
    # ivf_pq 0.10/0.1375/0.1375 — floors at measured − ~0.05 slack
    assert by[("ivf", 2)] >= 0.27
    assert by[("ivf", 4)] >= 0.43
    assert by[("ivf_kmeans", 2)] >= 0.26
    assert by[("pq_adc", None)] >= 0.16
    assert by[("ivf_pq", 2)] >= 0.09
    # IVF scores candidates EXACTLY, so any candidate displacing a
    # true neighbor is itself a true neighbor — recall is provably
    # monotone in n_probe. (NOT asserted for ivf_pq: its approximate
    # ADC scoring can let a mis-scored newcomer displace a true
    # neighbor, so monotonicity is typical but not guaranteed.)
    assert by[("ivf", 1)] <= by[("ivf", 2)] <= by[("ivf", 4)]


def test_trained_codebook_shape_and_determinism(spark):
    """r9 trained PQ codebook (pq_codebook_kmeans): n_centroids rows
    per subspace with d_sub-dim centroids; seeded KMeans -> the same
    codebook (and therefore the same ADC top-k) across two fits; the
    codebook= parameter threads through pq_distances/pq_adc_topk
    without changing the result SCHEMA (values differ from the
    deterministic codebook by design)."""
    from commodity_price_forecasting_spark.operators.similarity import (
        pq_codebook_kmeans,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cb1 = pq_codebook_kmeans(emb, n_centroids=8, m_sub=8)
    assert cb1.count() == 8 * 8
    assert cb1.select(F.size("cv")).distinct().collect()[0][0] == 8
    top1 = pq_adc_topk(
        emb, query_id=0, k=10, n_centroids=8, m_sub=8, codebook=cb1
    ).collect()
    cb2 = pq_codebook_kmeans(emb, n_centroids=8, m_sub=8)
    top2 = pq_adc_topk(
        emb, query_id=0, k=10, n_centroids=8, m_sub=8, codebook=cb2
    ).collect()
    assert [tuple(r) for r in top1] == [tuple(r) for r in top2]
    assert len(top1) == 10
    assert top1[0].__fields__ == ["vec_id", "adc_dist"]

    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_probe,
    )

    q = [
        float(x)
        for x in emb.filter("vec_id = 0").select("embedding").first()[0]
    ]
    idx = ivf_pq_index(emb, codebook="kmeans")
    got = ivf_pq_probe(idx, q, k=10, exclude_id=0).collect()
    assert len(got) == 10
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seed|kmeans"):
        ivf_pq_index(emb, codebook="bogus")


def test_ann_topk_front_door_dispatch(spark, tmp_path):
    """r9: the ANN front door. auto with no index == brute (exact
    cosine rows); auto with a persisted index == the single-plan
    ivf_pq_adc_topk rows (leave-one-out index); forced ivf_pq with no
    index also == the single-plan form; bad lane and missing query
    raise named errors."""
    import pytest as _pytest

    from commodity_price_forecasting_spark.operators.similarity import (
        ann_topk,
        cosine_topk,
        ivf_pq_adc_topk,
        ivf_pq_index,
        ivf_pq_index_write,
    )

    emb = load_table(spark, SF_DIR, "embeddings")

    brute = cosine_topk(emb, 0, k=10).collect()
    got = ann_topk(emb, 0, k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in brute]

    single = ivf_pq_adc_topk(emb, query_id=0, k=10).collect()
    forced = ann_topk(emb, 0, k=10, lane="ivf_pq").collect()
    assert [tuple(r) for r in forced] == [tuple(r) for r in single]

    idx = ivf_pq_index(emb, exclude_id=0)
    ivf_pq_index_write(idx, str(tmp_path))
    idx["res"].unpersist()
    via_path = ann_topk(emb, 0, k=10, index=str(tmp_path)).collect()
    assert [
        (r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in via_path
    ] == [(r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in single]

    with _pytest.raises(ValueError, match="lane"):
        ann_topk(emb, 0, lane="bogus")
    with _pytest.raises(ValueError, match="not found"):
        ann_topk(emb, 10**9, index=str(tmp_path))


def test_ivfpq_batch_probe_equals_per_query(spark):
    """r9: the batch probe (one plan, N queries) must return, for
    every query id, EXACTLY the rows of the driver-routed single
    probe over the SAME shared index — same cells probed (column
    sort_array routing == driver HALF_UP sort), same LUT sums, same
    top-k order."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_probe,
        ivf_pq_probe_batch,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_pq_index(emb)  # shared full-corpus index, no exclusion
    qids = [0, 7, 111, 333]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = ivf_pq_probe_batch(
        idx, queries, k=5, n_probe=2, exclude_self=True
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], int(r["cell"]), r["adc_dist"])
        )
    for qi in qids:
        q = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qi)
            .select("embedding")
            .first()[0]
        ]
        single = ivf_pq_probe(idx, q, k=5, n_probe=2, exclude_id=qi).collect()
        assert by_q[qi] == [
            (r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in single
        ], f"query {qi} diverged"
    idx["res"].unpersist()


def test_ivfpq_batch_probe_loaded_index_prunes_and_matches(spark, tmp_path):
    """r10 (r9 ADVICE): the batch probe over a PERSISTED index must
    (1) return exactly the in-memory batch result per query, and
    (2) filter the cell-partitioned scan to the union of probed cells
    (PartitionFilters in the scan node) instead of reading the whole
    index — the pruning the layout exists for."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_index_load,
        ivf_pq_index_write,
        ivf_pq_probe_batch,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_pq_index(emb)
    ivf_pq_index_write(idx, str(tmp_path))
    loaded = ivf_pq_index_load(spark, str(tmp_path))
    qids = [0, 7, 111]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch_df = ivf_pq_probe_batch(loaded, queries, k=5, n_probe=2, exclude_self=True)
    plan = batch_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_window = plan.split("PartitionFilters", 1)[1][:200]
    assert "cell" in pf_window and "IN" in pf_window
    mem = ivf_pq_probe_batch(idx, queries, k=5, n_probe=2, exclude_self=True).collect()
    got = batch_df.collect()
    assert sorted(
        ((r["query_id"], r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in got)
    ) == sorted(
        ((r["query_id"], r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in mem)
    )
    idx["res"].unpersist()


def test_ann_topk_ivf_lane_and_index(spark, tmp_path):
    """r9: the full-precision IVF half of the front door. A persisted
    ivf_index_write layout must (1) auto-route to the exact-scoring
    probe, (2) prune partitions (PartitionFilters on the corpus
    scan), (3) match a driver-composed ivf_seed_topk over the same
    shared assignment with self-exclusion; lane='ivf' with no index
    must equal the registered sim_ivf_topk composition
    (leave-one-out); handing the wrong index kind raises."""
    import re

    import pytest as _pytest

    from commodity_price_forecasting_spark.operators.similarity import (
        ann_topk,
        ivf_index_load,
        ivf_index_write,
        ivf_pq_index,
        ivf_seed_assign,
        ivf_seed_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = [
        float(x)
        for x in emb.filter("vec_id = 0").select("embedding").first()[0]
    ]

    # in-plan lane == registered sim_ivf_topk composition
    assigned, seeds = ivf_seed_assign(emb.filter(F.col("vec_id") != 0), k=16)
    want = ivf_seed_topk(assigned, seeds, q, k=10, n_probe=2).collect()
    got = ann_topk(emb, 0, k=10, lane="ivf").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # persisted shared index: auto-routes to ivf, prunes, matches
    ivf_index_write(emb, str(tmp_path), k=16)
    loaded = ivf_index_load(spark, str(tmp_path))
    want2 = ivf_seed_topk(
        loaded["assigned"], loaded["seeds"], q, k=10, n_probe=2, exclude_id=0
    ).collect()
    probe_df = ann_topk(emb, 0, k=10, index=str(tmp_path))
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*cell.*\]", plan), plan
    got2 = probe_df.collect()
    assert [
        (r["vec_id"], int(r["cell"]), r["cosine"]) for r in got2
    ] == [(r["vec_id"], int(r["cell"]), r["cosine"]) for r in want2]
    assert got2[0].__fields__ == ["vec_id", "cell", "cosine"]

    # wrong index kind is a named error both ways
    with _pytest.raises(ValueError, match="lane='ivf_pq'"):
        ann_topk(emb, 0, index=str(tmp_path), lane="ivf_pq").collect()
    pq_idx = ivf_pq_index(emb)
    with _pytest.raises(ValueError, match="lane='ivf'"):
        ann_topk(emb, 0, index=pq_idx, lane="ivf").collect()
    pq_idx["res"].unpersist()


def test_clustered_geometry_recall_floors(spark, tmp_path):
    """r9 recall v3: on CLUSTERED data (the geometry real embedding
    corpora approximate, vs the driver fixture's isotropic worst
    case) the trained coarse quantizer must route essentially
    perfectly — recall is then bounded by scoring, not routing. Pins
    the v3 table's claims at n=2000/16 clusters/SNR 4:1 (measured:
    ivf_kmeans 1.0 at every n_probe; ivf_pq_trained256 0.50–0.525,
    the in-cell ADC noise floor on structured data). Floors are
    measured − slack so silent routing or scoring regressions
    surface."""
    import os as _os
    import sys as _sys

    import pyarrow as pa
    import pyarrow.parquet as pq_

    _sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    from tools.ann_recall import recall_table

    rng = np.random.default_rng(7)
    n, dim, k_cl = 2000, 64, 16
    centers = rng.standard_normal((k_cl, dim))
    labels = rng.integers(0, k_cl, size=n)
    vecs = (
        centers[labels] + rng.standard_normal((n, dim)) * 0.25
    ).astype(np.float32)
    fixture = str(tmp_path / "clustered")
    _os.makedirs(fixture, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    list(vecs), type=pa.list_(pa.float32())
                ),
            }
        ),
        _os.path.join(fixture, "embeddings.parquet"),
    )
    rows = recall_table(
        spark,
        fixture,
        k=10,
        n_queries=8,
        lanes=["ivf_kmeans", "ivf_pq_trained256"],
    )
    by = {(r["lane"], r["n_probe"]): r["recall_at_k"] for r in rows}
    # trained coarse quantizer routes perfectly on clustered data
    assert by[("ivf_kmeans", 1)] >= 0.95
    assert by[("ivf_kmeans", 4)] >= 0.95
    # in-cell ADC with 256-entry trained codebooks keeps real signal
    # on structured data (vs ~0.1 on the isotropic fixture)
    assert by[("ivf_pq_trained256", 2)] >= 0.35


def test_ann_topk_external_query_vector(spark, tmp_path):
    """r9: the q= form (external query vector, the real retrieval
    shape). Brute with q == the literal-scored exact ranking with no
    self-exclusion (a corpus member passed as q must surface ITSELF
    at cosine 1.0); index lanes accept q and skip exclusion; passing
    both or neither of query_id/q raises."""
    import pytest as _pytest

    from commodity_price_forecasting_spark.operators.similarity import (
        ann_topk,
        ivf_pq_index,
        ivf_pq_index_write,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    v0 = [
        float(x)
        for x in emb.filter("vec_id = 0").select("embedding").first()[0]
    ]

    got = ann_topk(emb, q=v0, k=5).collect()
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == 1.0
    # the rest of the ranking == the self-excluding form's top-4
    excl = ann_topk(emb, 0, k=4).collect()
    assert [tuple(r) for r in got[1:]] == [tuple(r) for r in excl]

    idx = ivf_pq_index(emb)
    ivf_pq_index_write(idx, str(tmp_path))
    idx["res"].unpersist()
    via_idx = ann_topk(emb, q=v0, k=5, index=str(tmp_path)).collect()
    assert via_idx[0]["vec_id"] == 0 and via_idx[0]["adc_dist"] == 0.0

    with _pytest.raises(ValueError, match="exactly one"):
        ann_topk(emb, 0, q=v0)
    with _pytest.raises(ValueError, match="exactly one"):
        ann_topk(emb)


def test_lowrank_geometry_pq_recall_floors(spark, tmp_path):
    """r9 recall v4: on LOW-INTRINSIC-DIMENSION data (v = z·P + noise,
    the geometry real embedding models produce) product quantization
    must work — subvector coordinates correlate, so per-subspace
    codebooks capture real variance. Pins the v4 table's claims at
    n=2000/latent 8 (measured: pq_adc untrained 0.325, trained-16
    0.45, trained-256 0.75): the training and codebook-size dials
    must each pay, unlike on the isotropic fixture where all PQ lanes
    sit near noise."""
    import os as _os
    import sys as _sys

    import pyarrow as pa
    import pyarrow.parquet as pq_

    _sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    from tools.ann_recall import recall_table

    rng = np.random.default_rng(7)
    n, dim, r = 2000, 64, 8
    proj = rng.standard_normal((r, dim))
    z = rng.standard_normal((n, r))
    vecs = (
        z @ proj + rng.standard_normal((n, dim)) * 0.05
    ).astype(np.float32)
    fixture = str(tmp_path / "lowrank")
    _os.makedirs(fixture, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    list(vecs), type=pa.list_(pa.float32())
                ),
            }
        ),
        _os.path.join(fixture, "embeddings.parquet"),
    )
    rows = recall_table(spark, fixture, k=10, n_queries=8, lanes=["pq_adc"])
    by = {r_["lane"]: r_["recall_at_k"] for r_ in rows}
    assert by["pq_adc"] >= 0.2
    assert by["pq_adc_trained256"] >= 0.6
    # the dials must actually pay on this geometry
    assert by["pq_adc_trained256"] > by["pq_adc_trained"] > by["pq_adc"]


def test_ivfpq_index_append_equals_monolithic_encode(spark, tmp_path):
    """r9 VERDICT ask #2: appending new vectors to a persisted IVF-PQ
    index must produce EXACTLY the codes/cells a from-scratch encode
    of the union under the SAME (frozen) seeds + codebook would — and
    probes over the appended index must equal probes over that
    monolithic reference."""
    from commodity_price_forecasting_spark.operators.similarity import (
        assign_to_seeds,
        ivf_pq_index,
        ivf_pq_index_append,
        ivf_pq_index_load,
        ivf_pq_index_write,
        ivf_pq_probe,
        pq_distances,
        pq_encode,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    n_new = new.count()
    assert n_new > 0
    idx = ivf_pq_index(old)
    ivf_pq_index_write(idx, str(tmp_path))
    appended = ivf_pq_index_append(spark, str(tmp_path), new)
    assert appended == n_new

    # monolithic reference: encode the UNION under old's seeds/cb
    loaded = ivf_pq_index_load(spark, str(tmp_path))
    seed_df = spark.createDataFrame(
        [(int(s), [float(x) for x in v]) for s, v in idx["seeds"]],
        "_sid long, _svec array<double>",
    )
    assigned = assign_to_seeds(emb.select("vec_id", "embedding"), idx["seeds"])
    res = assigned.join(F.broadcast(seed_df), F.col("cell") == F.col("_sid")).select(
        "vec_id",
        "cell",
        F.zip_with(
            F.col("embedding"), F.col("_svec"), lambda a, b: a.cast("double") - b
        ).alias("embedding"),
    )
    ref_codes = pq_encode(
        pq_distances(res.select("vec_id", "embedding"), m_sub=8, codebook=idx["cb"])
    )
    ref = ref_codes.join(res.select("vec_id", "cell"), "vec_id")

    got = sorted(
        (r["vec_id"], r["m"], r["code"], int(r["cell"]))
        for r in loaded["coded"].collect()
    )
    want = sorted(
        (r["vec_id"], r["m"], r["code"], int(r["cell"])) for r in ref.collect()
    )
    assert got == want

    # probe equivalence: appended-on-disk index vs in-memory reference
    q = [float(x) for x in emb.filter(F.col("vec_id") == 450).first()["embedding"]]
    ref_idx = {
        "coded": ref,
        "codes": ref,
        "cells": None,
        "cb": idx["cb"],
        "seeds": idx["seeds"],
        "m_sub": 8,
        "dim": loaded["dim"],
    }
    got_p = ivf_pq_probe(loaded, q, k=10, n_probe=2, exclude_id=450).collect()
    want_p = ivf_pq_probe(ref_idx, q, k=10, n_probe=2, exclude_id=450).collect()
    assert [
        (r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in got_p
    ] == [(r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in want_p]
    # new vectors are actually reachable through the appended index
    assert any(r["vec_id"] >= 400 for r in got_p)
    idx["res"].unpersist()


def test_semantic_dedup_drop_quality_on_planted_duplicates(spark):
    """r9 VERDICT ask #7: the curation pipeline's semantic stage was
    equality-pinned but never QUALITY-measured. On a low-rank fixture
    with planted near-copies (cos ~0.99 to their source):

    - PRECISION is exact by construction — every dropped vector's
      dominator IS a same-cell partner with pair-cosine >= threshold,
      so no dropped vector may lack a true >=0.3 neighbor (0
      violations, both lanes);
    - planted-pair RECALL: a near-copy and its source must never BOTH
      survive (measured 1.0 on both lanes at this size; the hier
      lane's floor carries routing-approximation slack)."""
    from commodity_price_forecasting_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(13)
    n_base, dim, r_rank, n_dup = 500, 64, 8, 60
    proj = rng.standard_normal((r_rank, dim))
    z = rng.standard_normal((n_base, r_rank))
    base = z @ proj + rng.standard_normal((n_base, dim)) * 0.05
    dup_src = rng.choice(n_base, size=n_dup, replace=False)
    dups = base[dup_src] + rng.standard_normal((n_dup, dim)) * 0.01
    full = np.vstack([base, dups])
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(full)],
        "vec_id long, embedding array<double>",
    )
    norm = full / np.linalg.norm(full, axis=1, keepdims=True)
    C = norm @ norm.T
    np.fill_diagonal(C, -1)
    has_nbr = (np.round(C, 6) >= 0.3).any(axis=1)

    for lane, recall_floor in (("blas", 1.0), ("hier", 0.95)):
        drops = {r2["vec_id"] for r2 in semantic_dedup(df, lane=lane).collect()}
        assert [int(i) for i in drops if not has_nbr[i]] == []
        both_kept = sum(
            1
            for j, src in enumerate(dup_src)
            if src not in drops and (n_base + j) not in drops
        )
        assert 1 - both_kept / n_dup >= recall_floor, (lane, both_kept)


def test_ivf_index_append_equals_monolithic_assignment(spark, tmp_path):
    """Full-precision sibling of the PQ append: appended rows must
    carry EXACTLY the cells a monolithic assignment under the same
    seeds would give, and the probe over the appended index must
    return them when they are true neighbors."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ann_topk,
        assign_to_seeds,
        ivf_index_append,
        ivf_index_load,
        ivf_index_write,
        ivf_seed_assign,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    ivf_index_write(old, str(tmp_path))
    n = ivf_index_append(spark, str(tmp_path), new)
    assert n == new.count()
    loaded = ivf_index_load(spark, str(tmp_path))
    _, seeds = ivf_seed_assign(old)
    ref = assign_to_seeds(emb, seeds)
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in loaded["assigned"].select("vec_id", "cell").collect()
    )
    want = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in ref.select("vec_id", "cell").collect()
    )
    assert got == want
    # the appended rows are probe-reachable through the front door
    res = ann_topk(emb, query_id=450, k=10, index=str(tmp_path)).collect()
    assert len(res) == 10 and all(r["vec_id"] != 450 for r in res)

    # r10 ADVICE guards: extra delta columns must not widen the
    # persisted schema (append selects only id+vec)
    corpus_cols = loaded["assigned"].columns
    assert sorted(corpus_cols) == sorted(["vec_id", "embedding", "cell"])
    # wrong-dim delta raises a NAMED error before any write
    import pytest as _pytest

    bad = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    with _pytest.raises(ValueError, match=r"dims in \[16, 16\]"):
        ivf_index_append(spark, str(tmp_path), bad)
    # empty delta is a no-op returning 0
    assert ivf_index_append(spark, str(tmp_path), emb.limit(0)) == 0


def test_ivfpq_index_append_rejects_dim_mismatch(spark, tmp_path):
    """A delta at the wrong dimensionality must raise a NAMED error
    before any write — subvector slices would shift and mis-encode
    silently otherwise."""
    import pytest as _pytest

    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_index_append,
        ivf_pq_index_write,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_pq_index(emb)
    ivf_pq_index_write(idx, str(tmp_path))
    idx["res"].unpersist()
    bad = emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    with _pytest.raises(ValueError, match=r"dims in \[32, 32\][\s\S]*dim 64"):
        ivf_pq_index_append(spark, str(tmp_path), bad)

    # empty delta: no-op returning 0, never a misleading dim error
    assert ivf_pq_index_append(spark, str(tmp_path), emb.limit(0)) == 0


def test_refine_rerank_hits_ivf_exact_ceiling_and_lifts_recall(spark):
    """PQ refine (r10 VERDICT #3): re-ranking the top-C ADC candidates
    with exact cosines must (a) with C = corpus size, EQUAL the
    IVF-exact probe over the same cells (the ceiling refine is
    documented to approach), and (b) at moderate C, reach recall@10
    (vs global brute force) at least as high as the unrefined probe."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ann_topk,
        cosine_topk,
        ivf_pq_index,
        ivf_pq_probe,
        ivf_pq_refine_topk,
        ivf_seed_assign,
        ivf_seed_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    qid = 7
    q_row = emb.filter(F.col("vec_id") == qid).first()
    qvec = [float(x) for x in q_row["embedding"]]
    corpus = emb.filter(F.col("vec_id") != qid)

    idx = ivf_pq_index(corpus)

    # (a) ceiling: C >= |corpus| makes refine == IVF-exact probe
    assigned, seeds = ivf_seed_assign(corpus)
    ceiling = ivf_seed_topk(assigned, seeds, qvec, k=10, n_probe=2)
    refined_full = ivf_pq_refine_topk(
        idx, corpus, qvec, k=10, refine=10_000, n_probe=2
    )
    want = [(r["vec_id"], r["cosine"]) for r in ceiling.collect()]
    got = [(r["vec_id"], r["cosine"]) for r in refined_full.collect()]
    assert got == want

    # (b) recall lift at moderate C
    exact = {r["vec_id"] for r in cosine_topk(emb, qid, k=10).collect()}
    plain = {
        r["vec_id"]
        for r in ivf_pq_probe(idx, qvec, k=10, n_probe=2).collect()
    }
    refined = {
        r["vec_id"]
        for r in ivf_pq_refine_topk(
            idx, corpus, qvec, k=10, refine=100, n_probe=2
        ).collect()
    }
    assert len(refined & exact) >= len(plain & exact)

    # front door: ann_topk(refine=) routes here and returns cosines
    via_door = {
        r["vec_id"]
        for r in ann_topk(emb, query_id=qid, k=10, refine=100).collect()
    }
    assert via_door == refined
    idx["res"].unpersist()

    # refine on a non-PQ lane is a named error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="only applies to"):
        ann_topk(emb, query_id=qid, k=10, lane="brute", refine=50)


def test_refine_cell_pruned_fetch_matches_frame_fetch(spark, tmp_path):
    """Refine fetching from a persisted ivf_index_write layout (cell-
    pruned scan) must return exactly what the corpus-frame fetch
    returns — and refuse a layout whose seeds differ from the PQ
    index's (pruning with foreign cells would drop true candidates)."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_index_write,
        ivf_pq_index,
        ivf_pq_refine_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    qid = 3
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]
    ]
    corpus = emb.filter(F.col("vec_id") != qid)

    idx = ivf_pq_index(corpus)
    ivf_index_write(corpus, str(tmp_path / "full"))

    a = ivf_pq_refine_topk(idx, corpus, qvec, k=10, refine=80, n_probe=2)
    b = ivf_pq_refine_topk(
        idx,
        corpus,
        qvec,
        k=10,
        refine=80,
        n_probe=2,
        full_index_path=str(tmp_path / "full"),
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]

    # a layout built over a DIFFERENT corpus has different seeds
    ivf_index_write(
        emb.filter(F.col("vec_id") > 100), str(tmp_path / "other")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seeds differ"):
        ivf_pq_refine_topk(
            idx,
            corpus,
            qvec,
            k=10,
            refine=80,
            full_index_path=str(tmp_path / "other"),
        ).collect()
    idx["res"].unpersist()


def test_opq_rotation_orthogonal_and_rotate_vectors_matmul(spark):
    """OPQ rotation (r11 VERDICT ask #5): R must be orthogonal (L2
    preserved exactly — the property that makes rotated ADC estimate
    the SAME metric), rotate_vectors must equal the numpy matmul, and
    training must be deterministic run-to-run (6-dp covariance +
    sign-normalized eigenvectors)."""
    from commodity_price_forecasting_spark.operators.similarity import (
        opq_rotation,
        rotate_vectors,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    R = opq_rotation(emb, m_sub=8)
    Rm = np.asarray(R)
    d = Rm.shape[0]
    assert Rm.shape == (d, d) and d % 8 == 0
    assert np.allclose(Rm @ Rm.T, np.eye(d), atol=1e-8)

    sample = emb.filter(F.col("vec_id") < 5)
    got = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in rotate_vectors(sample, R, keep=("vec_id",)).collect()
    }
    for r in sample.collect():
        want = Rm @ np.asarray(r["embedding"], dtype=np.float64)
        assert np.allclose(got[r["vec_id"]], want, atol=1e-9)
    # L2 between two rotated vectors == L2 between the originals
    a, b = (np.asarray(r["embedding"], dtype=np.float64)
            for r in sample.limit(2).collect())
    assert abs(
        np.linalg.norm(Rm @ a - Rm @ b) - np.linalg.norm(a - b)
    ) < 1e-9

    assert R == opq_rotation(emb, m_sub=8)


def test_opq_index_roundtrip_append_and_probe_equality(spark, tmp_path):
    """The OPQ index's rotation is part of its identity: it must
    survive write→load bit-exactly, probes over the loaded index must
    equal probes over the in-memory one, and the APPEND path must
    encode the delta under the persisted R so appended codes equal a
    from-scratch encode of the union (the frozen-quantizer contract,
    now including R)."""
    from commodity_price_forecasting_spark.operators.similarity import (
        assign_to_seeds,
        ivf_pq_index,
        ivf_pq_index_append,
        ivf_pq_index_load,
        ivf_pq_index_write,
        ivf_pq_probe,
        rotate_vectors,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    n_new = new.count()
    idx = ivf_pq_index(old, rotation="opq")
    assert idx["rotation"] is not None
    ivf_pq_index_write(idx, str(tmp_path))
    loaded = ivf_pq_index_load(spark, str(tmp_path))
    assert loaded["rotation"] == idx["rotation"]  # doubles roundtrip exactly

    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    probe_df = ivf_pq_probe(loaded, q, k=10, n_probe=2, exclude_id=7)
    # rotation must not cost the pruned scan: the rotate happens on
    # the QUERY-side LUT, the coded scan keeps its PartitionFilters
    import re as _re

    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"PartitionFilters: \[.*cell.*\]", plan), plan
    got_p = probe_df.collect()
    want_p = ivf_pq_probe(idx, q, k=10, n_probe=2, exclude_id=7).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in got_p] == [
        (r["vec_id"], r["adc_dist"]) for r in want_p
    ]

    assert ivf_pq_index_append(spark, str(tmp_path), new) == n_new
    # monolithic reference: union encoded under old's seeds/cb AND R
    seed_df = spark.createDataFrame(
        [(int(s), [float(x) for x in v]) for s, v in idx["seeds"]],
        "_sid long, _svec array<double>",
    )
    assigned = assign_to_seeds(emb, idx["seeds"])
    res = assigned.join(
        F.broadcast(seed_df), F.col("cell") == F.col("_sid")
    ).select(
        "vec_id",
        "cell",
        F.zip_with(
            F.col("embedding"), F.col("_svec"), lambda a, b: a.cast("double") - b
        ).alias("embedding"),
    )
    res_rot = rotate_vectors(
        res, idx["rotation"], vec_col="embedding", keep=("vec_id", "cell")
    )
    ref_codes = pq_encode(
        pq_distances(
            res_rot.select("vec_id", "embedding"), m_sub=8, codebook=idx["cb"]
        )
    )
    ref = ref_codes.join(res_rot.select("vec_id", "cell"), "vec_id")
    reloaded = ivf_pq_index_load(spark, str(tmp_path))
    got = sorted(
        (r["vec_id"], r["m"], r["code"], int(r["cell"]))
        for r in reloaded["coded"].collect()
    )
    want = sorted(
        (r["vec_id"], r["m"], r["code"], int(r["cell"])) for r in ref.collect()
    )
    assert got == want
    # appended vectors reachable through a probe on the grown index
    q2 = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 450).first()["embedding"]
    ]
    got2 = ivf_pq_probe(reloaded, q2, k=10, n_probe=2, exclude_id=450).collect()
    assert any(r["vec_id"] >= 400 for r in got2)
    idx["res"].unpersist()
    idx["res_rot"].unpersist()


def test_opq_batch_probe_equals_per_query_on_rotated_index(spark, tmp_path):
    """The batch probe's in-plan LUT must rotate the query residuals
    with the same R the single-query probe uses — per-query equality
    over a rotated persisted index."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_index_load,
        ivf_pq_index_write,
        ivf_pq_probe,
        ivf_pq_probe_batch,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    idx = ivf_pq_index(emb, rotation="opq")
    ivf_pq_index_write(idx, str(tmp_path))
    loaded = ivf_pq_index_load(spark, str(tmp_path))

    qids = [3, 111, 222]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = ivf_pq_probe_batch(
        loaded, queries, k=5, n_probe=2, exclude_self=True
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], int(r["cell"]), r["adc_dist"])
        )
    for qi in qids:
        q = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qi).first()["embedding"]
        ]
        want = [
            (r["vec_id"], int(r["cell"]), r["adc_dist"])
            for r in ivf_pq_probe(
                loaded, q, k=5, n_probe=2, exclude_id=qi
            ).collect()
        ]
        assert by_q[qi] == want, f"query {qi}"
    idx["res"].unpersist()
    idx["res_rot"].unpersist()


def test_normalized_adc_ranks_by_cosine_exactly(spark):
    """r12 VERDICT ask #4 (cosine-consistent ADC): with
    ``normalize=True``, zero quantization error (codebook = corpus,
    one coarse cell) makes the ADC ordering EQUAL the exact cosine
    ordering — on unit vectors ‖a−b‖² = 2(1−cosθ). The same
    construction WITHOUT normalize ranks by raw L2, which diverges
    from cosine on this fixture — proving the flag changes the metric,
    not just the scale."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_probe,
    )

    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    # inject norm SPREAD (scale by 1 + vec_id % 5): cosine is scale-
    # invariant so the cosine ranking is the fixture's, while raw L2
    # ranking now genuinely diverges — the divergence normalize closes
    emb = base.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: x.cast("double")
            * (F.lit(1.0) + (F.col("vec_id") % 5).cast("double")),
        ).alias("embedding"),
    ).cache()
    rows = emb.collect()
    n = len(rows)
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qi = 0
    q = mat[ids == qi][0]
    cosim = (mat @ q) / (
        np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
    )
    want_cos = [
        int(i)
        for _, i in sorted(
            (float(-c), int(i)) for c, i in zip(cosim, ids) if i != qi
        )
    ][:10]

    idx = ivf_pq_index(
        emb, exclude_id=qi, k_coarse=1, n_centroids=n, m_sub=8,
        normalize=True,
    )
    got = ivf_pq_probe(idx, [float(x) for x in q], k=10, n_probe=1)
    got_ids = [r["vec_id"] for r in got.collect()]
    assert got_ids == want_cos
    idx["res"].unpersist()

    # the unnormalized twin ranks by raw L2 — a DIFFERENT order under
    # norm spread (the divergence the flag exists to close)
    want_l2 = _exact_l2_topk(rows, query_id=qi, k=10)
    assert want_l2 != want_cos
    idx_raw = ivf_pq_index(
        emb, exclude_id=qi, k_coarse=1, n_centroids=n, m_sub=8,
    )
    got_raw = [
        r["vec_id"]
        for r in ivf_pq_probe(
            idx_raw, [float(x) for x in q], k=10, n_probe=1
        ).collect()
    ]
    assert got_raw == want_l2
    idx_raw["res"].unpersist()
    emb.unpersist()


def test_normalized_index_roundtrip_append_batch_equality(spark, tmp_path):
    """The ``normalized`` flag is index identity: survives write→load,
    the loaded probe equals the in-memory probe on a RAW query (both
    normalize internally), the append path normalizes the delta so
    appended codes equal a from-scratch encode of the normalized
    union under the frozen seeds/codebook, the batch probe equals the
    single probe, and partition pruning survives."""
    from commodity_price_forecasting_spark.operators.similarity import (
        assign_to_seeds,
        ivf_pq_index,
        ivf_pq_index_append,
        ivf_pq_index_load,
        ivf_pq_index_write,
        ivf_pq_probe,
        ivf_pq_probe_batch,
        l2_normalize,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    n_new = new.count()
    idx = ivf_pq_index(old, normalize=True)
    assert idx["normalized"] is True
    ivf_pq_index_write(idx, str(tmp_path))
    loaded = ivf_pq_index_load(spark, str(tmp_path))
    assert loaded["normalized"] is True

    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    probe_df = ivf_pq_probe(loaded, q, k=10, n_probe=2, exclude_id=7)
    import re as _re

    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"PartitionFilters: \[.*cell.*\]", plan), plan
    got_p = [(r["vec_id"], r["adc_dist"]) for r in probe_df.collect()]
    want_p = [
        (r["vec_id"], r["adc_dist"])
        for r in ivf_pq_probe(idx, q, k=10, n_probe=2, exclude_id=7).collect()
    ]
    assert got_p == want_p

    assert ivf_pq_index_append(spark, str(tmp_path), new) == n_new
    # monolithic reference: NORMALIZED union encoded under old's
    # frozen seeds + codebook
    emb_n = l2_normalize(emb)
    seed_df = spark.createDataFrame(
        [(int(s), [float(x) for x in v]) for s, v in idx["seeds"]],
        "_sid long, _svec array<double>",
    )
    assigned = assign_to_seeds(emb_n, idx["seeds"])
    res = assigned.join(
        F.broadcast(seed_df), F.col("cell") == F.col("_sid")
    ).select(
        "vec_id",
        "cell",
        F.zip_with(
            F.col("embedding"), F.col("_svec"), lambda a, b: a.cast("double") - b
        ).alias("embedding"),
    )
    ref_codes = pq_encode(
        pq_distances(res.select("vec_id", "embedding"), m_sub=8, codebook=idx["cb"])
    )
    ref = ref_codes.join(res.select("vec_id", "cell"), "vec_id")
    reloaded = ivf_pq_index_load(spark, str(tmp_path))
    got = sorted(
        (r["vec_id"], r["m"], r["code"], int(r["cell"]))
        for r in reloaded["coded"].collect()
    )
    want = sorted(
        (r["vec_id"], r["m"], r["code"], int(r["cell"])) for r in ref.collect()
    )
    assert got == want

    # batch probe == single probe over the normalized loaded index
    qids = [3, 111, 450]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = ivf_pq_probe_batch(
        reloaded, queries, k=5, n_probe=2, exclude_self=True
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], int(r["cell"]), r["adc_dist"])
        )
    for qi in qids:
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qi).first()["embedding"]
        ]
        want_b = [
            (r["vec_id"], int(r["cell"]), r["adc_dist"])
            for r in ivf_pq_probe(
                reloaded, qv, k=5, n_probe=2, exclude_id=qi
            ).collect()
        ]
        assert by_q[qi] == want_b, f"query {qi}"
    idx["res"].unpersist()


def test_opq_iterative_orthogonal_deterministic_and_probes(spark):
    """Non-parametric OPQ (r13): the alternation's R must stay
    orthogonal (L2 preserved exactly — the ADC-estimator contract),
    be deterministic across calls (index identity must be
    re-derivable), and plug into the index/probe machinery like the
    closed-form R."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_probe,
        opq_rotation_iterative,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    small = emb.filter(F.col("vec_id") < 300)
    r1 = opq_rotation_iterative(small, m_sub=8, iters=2, sample=300)
    r2 = opq_rotation_iterative(small, m_sub=8, iters=2, sample=300)
    assert r1 == r2  # seeded end-to-end
    R = np.asarray(r1)
    assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-9)

    idx = ivf_pq_index(small, rotation="opq_np")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    got = ivf_pq_probe(idx, q, k=5, n_probe=2, exclude_id=7).collect()
    assert len(got) == 5
    idx["res"].unpersist()
    idx["res_rot"].unpersist()


def test_ann_topk_normalize_dispatch_and_guards(spark, tmp_path):
    """The front door's normalize= (r13): equals the direct
    normalized single-plan lane; composes with refine=; raises by
    name for a prebuilt index (flag is index identity) and for
    non-PQ lanes (already exact cosine)."""
    import pytest as _pytest

    from commodity_price_forecasting_spark.operators.similarity import (
        ann_topk,
        ivf_pq_adc_topk,
        ivf_pq_index,
        ivf_pq_index_write,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    got = ann_topk(emb, query_id=0, lane="ivf_pq", normalize=True).collect()
    want = ivf_pq_adc_topk(emb, query_id=0, k=10, normalize=True).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    refined = ann_topk(
        emb, query_id=0, lane="ivf_pq", normalize=True, refine=50
    ).collect()
    assert len(refined) == 10 and refined[0].__fields__ == ["vec_id", "cosine"]

    with _pytest.raises(ValueError, match="fixed at index build time"):
        idx = ivf_pq_index(emb)
        ivf_pq_index_write(idx, str(tmp_path))
        idx["res"].unpersist()
        ann_topk(emb, query_id=0, index=str(tmp_path), normalize=True)
    with _pytest.raises(ValueError, match="only\\s+applies to the ivf_pq"):
        ann_topk(emb, query_id=0, lane="brute", normalize=True)


def test_ann_topk_auto_lane_resolves_normalize_to_pq(spark):
    """r13 ADVICE #3: lane='auto' with normalize=True must resolve to
    the PQ pipeline (mirroring the refine= rule) — the documented
    cosine deployment shape is reachable through the front door
    without also passing lane= or refine=."""
    from commodity_price_forecasting_spark.operators.similarity import (
        ann_topk,
        ivf_pq_adc_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    got = ann_topk(emb, query_id=0, normalize=True).collect()
    want = ivf_pq_adc_topk(emb, query_id=0, k=10, normalize=True).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # and composed with refine (auto already resolved PQ via refine)
    refined = ann_topk(emb, query_id=0, normalize=True, refine=50).collect()
    assert len(refined) == 10


def test_ivfpq_index_overwrite_atomic_and_drops_stale_identity(
    spark, tmp_path
):
    """r13 ADVICE #1 (medium): overwriting an EXISTING complete layout
    must not leave a mixed layout. Two checks: (a) a NORMALIZED layout
    overwritten by a plain rebuild loads as plain — the stale idxmeta
    (and any rotation) from the old layout must be gone, not merely
    shadowed; (b) a crashed rewrite (forged as the __building tmp dir
    left behind) leaves the OLD layout fully loadable and the next
    write cleans the tmp up."""
    import os as _os
    import shutil as _shutil

    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_index_load,
        ivf_pq_index_write,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "idx")
    norm = ivf_pq_index(emb, normalize=True)
    ivf_pq_index_write(norm, path)
    norm["res"].unpersist()
    assert ivf_pq_index_load(spark, path)["normalized"] is True

    # (b) forge a crashed rewrite: a half-built __building next to the
    # complete old layout — load must still see the OLD index intact
    _os.makedirs(path + "__building/coded", exist_ok=True)
    assert ivf_pq_index_load(spark, path)["normalized"] is True

    # (a) plain rebuild over the same path: stale idxmeta must vanish
    plain = ivf_pq_index(emb)
    ivf_pq_index_write(plain, path)
    plain["res"].unpersist()
    loaded = ivf_pq_index_load(spark, path)
    assert loaded["normalized"] is False
    assert not _os.path.isdir(path + "__building")  # crashed tmp cleaned
    assert not _os.path.isdir(_os.path.join(path, "idxmeta"))
    _shutil.rmtree(path)
