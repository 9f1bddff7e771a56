"""Incremental semantic dedup against the persisted cell store
(operators/semantic_store): delta == frozen-seed full re-run modulo
detected inversions, exact equality on an inversion-free corpus,
append idempotency, and the guard rails.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.semantic_store import (
    semantic_dedup_delta,
    semantic_store_build,
    semantic_store_load,
)
from commodity_price_forecasting_spark.operators.similarity import (
    _drops_from_assigned,
    assign_cells_fold,
)
from commodity_price_forecasting_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"
THR = 0.3


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_delta_matches_frozen_seed_rerun_modulo_inversions(spark, tmp_path):
    """On the real fixture: every frozen-seed re-run drop among the
    delta is a delta-lane drop, any extra delta-lane drop is explained
    by a detected inversion, and first_keeper agrees wherever the
    re-run decided the same way."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "store")
    semantic_store_build(old, path, k=16, threshold=THR)

    res = semantic_dedup_delta(spark, path, new, append=False)
    got = {
        r["vec_id"]: (r["status"], r["dup_of"])
        for r in res["verdicts"].collect()
    }
    assert set(got) == {r["vec_id"] for r in new.collect()}

    # frozen-seed full re-run over STORE SURVIVORS ∪ delta — the
    # store's corpus is its kept set (SemDeDup domination is
    # non-transitive, so dropped vectors are gone, not glue — unlike
    # dedup_store's MinHash signatures)
    store = semantic_store_load(spark, path)
    kept_ids = store["cells"].select("vec_id")
    ref = emb.join(kept_ids, "vec_id").unionByName(new)
    assigned_all = assign_cells_fold(ref, store["seeds"])
    rerun = {
        r["vec_id"]: r["first_keeper"]
        for r in _drops_from_assigned(assigned_all, THR, "vec_id").collect()
        if r["vec_id"] >= 400
    }
    delta_drops = {v: d for v, (s, d) in got.items() if s == "semantic_dup"}
    inverted_delta = {
        r["delta_vec_id"] for r in res["inversions"].collect()
    }
    # re-run drops ⊆ delta-lane drops
    assert set(rerun) <= set(delta_drops)
    # extras are exactly the inversion-affected vectors
    assert set(delta_drops) - set(rerun) <= inverted_delta
    # keeper agreement wherever no inversion is involved: a delta
    # vector with NO inversion partner has no store-mate following it
    # (cosine is symmetric), so its dominator set — and hence the min
    # dominator id — equals the re-run's
    for vid, keeper in rerun.items():
        if vid not in inverted_delta:
            assert delta_drops[vid] == keeper
    assert any(vid not in inverted_delta for vid in rerun)  # non-vacuous


def test_exact_equality_on_inversion_free_corpus(spark, tmp_path):
    """Synthetic corpus constructed so no delta vector precedes a
    stored survivor it dominates: delta verdicts == frozen-seed
    re-run EXACTLY, inversions empty."""
    rng = np.random.default_rng(11)
    old_rows = [(i, rng.normal(size=16)) for i in range(50)]
    old = _emb_df(spark, old_rows)
    path = str(tmp_path / "store")
    stats = semantic_store_build(old, path, k=4, threshold=THR)
    kept = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in semantic_store_load(spark, path)["cells"].collect()
    }
    assert stats["n_kept"] == len(kept)

    # delta: exact copies of three stored survivors (same cent_cos,
    # HIGHER ids -> the store precedes them; cos = 1.0 dominates)
    copied = sorted(kept)[:3]
    delta_rows = [(1000 + j, kept[vid]) for j, vid in enumerate(copied)]
    res = semantic_dedup_delta(spark, path, _emb_df(spark, delta_rows), append=False)
    got = {r["vec_id"]: (r["status"], r["dup_of"]) for r in res["verdicts"].collect()}
    assert res["inversions"].count() == 0
    for j, vid in enumerate(copied):
        status, dup_of = got[1000 + j]
        assert status == "semantic_dup"
        # the copied original is A dominator; first_keeper is the min
        # dominator id, which can only be <= it
        assert dup_of <= vid


def test_append_makes_second_ingest_all_dups(spark, tmp_path):
    """Kept delta vectors append into the store cells; re-ingesting
    the same vectors under new ids is then fully dominated and
    appends nothing."""
    rng = np.random.default_rng(5)
    old = _emb_df(spark, [(i, rng.normal(size=16)) for i in range(40)])
    path = str(tmp_path / "store")
    semantic_store_build(old, path, k=4, threshold=THR)
    n_cells_0 = semantic_store_load(spark, path)["cells"].count()

    fresh = [(100 + i, rng.normal(size=16)) for i in range(10)]
    res1 = semantic_dedup_delta(spark, path, _emb_df(spark, fresh))
    n_kept1 = res1["verdicts"].filter(F.col("status") == "kept").count()
    assert res1["n_appended"] == n_kept1
    assert (
        semantic_store_load(spark, path)["cells"].count()
        == n_cells_0 + n_kept1
    )

    replay = [(200 + i, v) for i, (_, v) in enumerate(fresh)]
    res2 = semantic_dedup_delta(spark, path, _emb_df(spark, replay))
    verd2 = {r["vec_id"]: r["status"] for r in res2["verdicts"].collect()}
    # every replayed vector whose original was KEPT is now a dup of
    # the store; ones whose original was dropped are dominated by the
    # same keeper that dominated the original
    assert all(s == "semantic_dup" for s in verd2.values())
    assert res2["n_appended"] == 0


def test_rerun_ingest_agrees_with_delta_lane_off_inversions(spark, tmp_path):
    """The two store-backed ingest lanes must decide identically on
    every delta vector not involved in an inversion (where they
    differ BY DESIGN: the rerun uses global order, the delta lane
    treats all store survivors as preceding). Also: the rerun lane's
    appended survivors re-ingest as all-dups (idempotency)."""
    from commodity_price_forecasting_spark.operators.semantic_store import (
        semantic_rerun_ingest,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "store")
    semantic_store_build(old, path, k=16, threshold=THR)

    delta_res = semantic_dedup_delta(spark, path, new, append=False)
    rerun_res = semantic_rerun_ingest(spark, path, new, append=False)
    inv = {r["delta_vec_id"] for r in delta_res["inversions"].collect()}
    v_delta = {
        r["vec_id"]: (r["status"], r["dup_of"])
        for r in delta_res["verdicts"].collect()
    }
    v_rerun = {
        r["vec_id"]: (r["status"], r["dup_of"])
        for r in rerun_res["verdicts"].collect()
    }
    assert set(v_delta) == set(v_rerun)
    agree = {v for v in v_delta if v not in inv}
    assert len(agree) > 0
    for v in agree:
        assert v_delta[v] == v_rerun[v]


def test_blas_lane_matches_fold_verdicts(spark, tmp_path):
    """The production (blas) assignment lane yields the same delta
    verdicts as the fold lane away from 6-dp rounding ties (random
    normals — ties vanishingly rare at this size)."""
    rng = np.random.default_rng(17)
    old = _emb_df(spark, [(i, rng.normal(size=16)) for i in range(40)])
    delta = _emb_df(spark, [(100 + i, rng.normal(size=16)) for i in range(15)])
    p_fold = str(tmp_path / "fold")
    p_blas = str(tmp_path / "blas")
    semantic_store_build(old, p_fold, k=4, threshold=THR, assign="fold")
    semantic_store_build(old, p_blas, k=4, threshold=THR, assign="blas")
    v_fold = {
        r["vec_id"]: (r["status"], r["dup_of"], r["cell"])
        for r in semantic_dedup_delta(
            spark, p_fold, delta, append=False, assign="fold"
        )["verdicts"].collect()
    }
    v_blas = {
        r["vec_id"]: (r["status"], r["dup_of"], r["cell"])
        for r in semantic_dedup_delta(
            spark, p_blas, delta, append=False, assign="blas"
        )["verdicts"].collect()
    }
    assert v_fold == v_blas and len(v_fold) == 15


def test_empty_delta_and_dim_guard(spark, tmp_path):
    rng = np.random.default_rng(3)
    old = _emb_df(spark, [(i, rng.normal(size=16)) for i in range(20)])
    path = str(tmp_path / "store")
    semantic_store_build(old, path, k=4, threshold=THR)

    empty = _emb_df(spark, [])
    res = semantic_dedup_delta(spark, path, empty)
    assert res["n_appended"] == 0 and res["verdicts"].count() == 0

    bad = _emb_df(spark, [(999, rng.normal(size=8))])
    with pytest.raises(ValueError, match="dim"):
        semantic_dedup_delta(spark, path, bad)
