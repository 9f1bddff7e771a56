"""r16 optimization-round equality pins: the codegen'd UNROLLED
dot/norm/sq-L2/residual expressions must be BIT-identical to the
interpreted higher-order folds they replace (same products, same
left-to-right accumulation, correctly-rounded IEEE ops on both
paths), and the hot-cell salted pair join must produce the exact
same drop set as the unsalted join (each (a, b) pair matches at
exactly one salt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _emb(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
    )


def test_unrolled_dot_norm_bit_equal_fold(spark):
    from commodity_price_forecasting_spark.operators.similarity import (
        _dot,
        _dot_cols_sql,
        _norm,
        _norm_sql,
    )

    emb = _emb(spark)
    dim = len(emb.first()["embedding"])
    pairs = emb.select(
        F.col("vec_id").alias("_ida"), F.col("embedding").alias("_ea")
    ).crossJoin(
        emb.limit(7).select(
            F.col("vec_id").alias("_idb"), F.col("embedding").alias("_eb")
        )
    )
    old = (
        _dot(F.col("_ea"), F.col("_eb"))
        / (_norm(F.col("_ea")) * _norm(F.col("_eb")))
    )
    new = F.expr(_dot_cols_sql("_ea", "_eb", dim)) / (
        F.expr(_norm_sql("_ea", dim)) * F.expr(_norm_sql("_eb", dim))
    )
    # bitwise: compare the raw doubles, not rounded values
    diff = pairs.select(
        "_ida", "_idb", old.alias("o"), new.alias("n")
    ).filter("o <> n OR (o IS NULL) <> (n IS NULL)")
    assert diff.count() == 0


def test_unrolled_sq_l2_bit_equal_fold(spark):
    from commodity_price_forecasting_spark.operators.similarity import (
        _sq_l2,
        _sq_l2_cols,
    )

    emb = _emb(spark)
    dim = len(emb.first()["embedding"])
    pairs = emb.select(F.col("embedding").alias("_a")).crossJoin(
        emb.limit(5).select(F.col("embedding").alias("_b"))
    )
    diff = pairs.select(
        _sq_l2(F.col("_a"), F.col("_b")).alias("o"),
        _sq_l2_cols("_a", "_b", dim).alias("n"),
    ).filter("o <> n")
    assert diff.count() == 0
    # unknown dim falls back to the fold itself
    fb = pairs.select(
        _sq_l2(F.col("_a"), F.col("_b")).alias("o"),
        _sq_l2_cols("_a", "_b", None).alias("n"),
    ).filter("o <> n")
    assert fb.count() == 0


def test_unrolled_residual_equal_zipwith(spark):
    from commodity_price_forecasting_spark.operators.similarity import (
        _residual_cols,
    )

    emb = _emb(spark)
    dim = len(emb.first()["embedding"])
    seed = [float(x) for x in emb.first()["embedding"]]
    df = emb.withColumn("_svec", F.lit(seed))
    old = F.zip_with(
        F.col("embedding"), F.col("_svec"), lambda a, b: a.cast("double") - b
    )
    new = _residual_cols("embedding", "_svec", dim)
    diff = df.select(old.alias("o"), new.alias("n")).filter("o <> n")
    assert diff.count() == 0


def test_cosine_to_query_bit_equal_fold(spark):
    from commodity_price_forecasting_spark.operators.similarity import (
        _cosine_to_query,
        _dot,
        _norm,
    )

    emb = _emb(spark)
    q = [float(x) for x in emb.first()["embedding"]]
    qcol = F.array(*[F.lit(float(x)) for x in q])
    old = _dot(F.col("embedding"), qcol) / (
        _norm(F.col("embedding")) * _norm(qcol)
    )
    new = _cosine_to_query("embedding", q)
    diff = emb.select(old.alias("o"), new.alias("n")).filter("o <> n")
    assert diff.count() == 0


def test_hot_cell_salting_same_drop_set(spark, monkeypatch):
    """Forge a pathological assignment (ONE cell holds every row —
    the skew case repartition(n, cell) cannot split) and pin that the
    salted pair join returns the exact same drop rows as the unsalted
    one (forced by a huge per-task cap)."""
    import commodity_price_forecasting_spark.operators.similarity as sim

    emb = _emb(spark).limit(300)
    dim = len(emb.first()["embedding"])
    assigned = emb.select(
        F.col("vec_id").alias("_vid"),
        F.col("embedding").alias("_emb"),
        F.lit(0).cast("long").alias("cell"),
        (F.col("vec_id").cast("double") / 1e6).alias("_cent"),
    )
    thr = 0.1

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    salted = rows(sim._drops_from_assigned(assigned, thr, "vec_id", dim=dim))
    monkeypatch.setattr(sim, "_PAIR_SALT_MIN_CELL", 10**9)
    unsalted = rows(
        sim._drops_from_assigned(assigned, thr, "vec_id", dim=dim)
    )
    assert salted == unsalted
    assert len(salted) > 0  # the fixture must actually exercise pairs


def test_k_coarse_auto_resolves_to_sqrt_n(spark):
    from commodity_price_forecasting_spark.operators.similarity import (
        ivf_pq_index,
    )

    emb = _emb(spark)
    n = emb.count()
    import math

    idx = ivf_pq_index(emb, k_coarse="auto")
    assert len(idx["seeds"]) == max(16, math.isqrt(n))
    idx["res"].unpersist()
    with pytest.raises(ValueError, match="auto"):
        ivf_pq_index(emb, k_coarse="bogus")


def test_store_write_lock_block_secs(tmp_path):
    import time

    from commodity_price_forecasting_spark.operators.store_maintenance import (
        StoreLockError,
        _flock_file,
        store_write_lock,
    )

    store = str(tmp_path / "store")
    with store_write_lock(store, "holder"):
        t0 = time.monotonic()
        with pytest.raises(StoreLockError):
            with store_write_lock(store, "contender", block_secs=0.4):
                pass
        assert time.monotonic() - t0 >= 0.35  # it actually waited
    # once released, a blocking contender gets in
    with store_write_lock(store, "after", block_secs=0.4):
        pass
    assert _flock_file is not None  # referenced: shared impl
