"""Exact Tree SHAP (ml/treeshap): additivity, dummy-feature nulls,
base-value semantics, and the registry query (M13 tree path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GBTRegressor, RandomForestRegressor

from commodity_price_forecasting_spark.ml.treeshap import extract_trees, tree_shap
from commodity_price_forecasting_spark.session import ensure_package_shipped

SF_DIR = "/root/testdata/sf0.001"
FEATS = ["f1", "f2", "f3", "f4"]


@pytest.fixture(scope="module")
def supervised(spark):
    rng = np.random.RandomState(7)
    n = 1500
    X = rng.randn(n, 4)
    y = 3 * X[:, 0] + np.sin(2 * X[:, 1]) + X[:, 2] * X[:, 3] + 0.1 * rng.randn(n)
    pdf = pd.DataFrame(X, columns=FEATS)
    pdf["label"] = y
    pdf["rid"] = range(n)
    df = spark.createDataFrame(pdf)
    return VectorAssembler(inputCols=FEATS, outputCol="features").transform(df).cache()


def _fit_rf(assembled):
    return RandomForestRegressor(
        featuresCol="features", labelCol="label", numTrees=12, maxDepth=4, seed=42
    ).fit(assembled)


def test_additivity_matches_spark_prediction(spark, supervised):
    """Shapley efficiency: base + Σφ must reconstruct the RF's own
    prediction to machine precision for EVERY row."""
    ensure_package_shipped(spark)
    model = _fit_rf(supervised)
    out = (
        tree_shap(supervised, model, FEATS, keep_cols=["rid"])
        .toPandas()
        .set_index("rid")
        .sort_index()
    )
    pred = (
        model.transform(supervised)
        .select("rid", "prediction")
        .toPandas()
        .set_index("rid")
        .sort_index()
    )
    assert (out["prediction"] - pred["prediction"]).abs().max() < 1e-9
    # and base + sum(phi) literally equals the emitted prediction
    recon = out["base_value"] + sum(out[f"phi_{c}"] for c in FEATS)
    assert (recon - out["prediction"]).abs().max() < 1e-12


def test_informative_feature_dominates(spark, supervised):
    """f1 (coefficient 3) must carry the largest attribution mass;
    and the base value is the cover-weighted mean prediction, i.e.
    close to the label mean on an in-sample explanation."""
    ensure_package_shipped(spark)
    model = _fit_rf(supervised)
    out = tree_shap(supervised, model, FEATS).toPandas()
    mass = {c: out[f"phi_{c}"].abs().mean() for c in FEATS}
    assert max(mass, key=mass.get) == "f1"
    assert abs(out["base_value"].iloc[0] - out["prediction"].mean()) < 0.2


def test_dummy_feature_gets_zero_phi(spark):
    """A feature no tree splits on is a Shapley dummy player: φ = 0
    exactly, not approximately."""
    ensure_package_shipped(spark)
    rng = np.random.RandomState(3)
    n = 800
    X = rng.randn(n, 3)
    pdf = pd.DataFrame(X, columns=["a", "b", "dummy"])
    pdf["label"] = 2 * pdf["a"] - pdf["b"]
    pdf["dummy"] = 0.0  # constant → never split on
    df = spark.createDataFrame(pdf)
    assembled = VectorAssembler(
        inputCols=["a", "b", "dummy"], outputCol="features"
    ).transform(df)
    model = RandomForestRegressor(
        featuresCol="features", labelCol="label", numTrees=5, maxDepth=3, seed=1
    ).fit(assembled)
    out = tree_shap(df, model, ["a", "b", "dummy"]).toPandas()
    assert (out["phi_dummy"] == 0.0).all()


def test_gbt_single_weighting_additivity(spark, supervised):
    """GBT additivity needs tree weights; extract_trees exposes the
    raw trees, and reconstruction with Spark's treeWeights matches
    the model's prediction (GBT sums weighted trees, no averaging)."""
    from commodity_price_forecasting_spark.ml.treeshap import shap_values_pandas

    model = GBTRegressor(
        featuresCol="features", labelCol="label", maxIter=5, maxDepth=3, seed=2
    ).fit(supervised)
    trees = extract_trees(model)
    weights = list(model.treeWeights)
    pdf = supervised.select(*FEATS, "rid").toPandas().set_index("rid").sort_index()
    X = pdf[FEATS].to_numpy(dtype=np.float64)
    phi = np.zeros((len(X), len(FEATS)))
    base = 0.0
    for t, w in zip(trees, weights):
        p, b = shap_values_pandas([t], X, len(FEATS), w)
        phi += p
        base += b
    pred = (
        model.transform(supervised)
        .select("rid", "prediction")
        .toPandas()
        .set_index("rid")
        .sort_index()["prediction"]
        .to_numpy()
    )
    assert np.abs(base + phi.sum(axis=1) - pred).max() < 1e-9


def test_tree_shap_gbt_end_to_end_additivity(spark, supervised):
    """tree_shap must handle GBT models directly: combination weights
    come from model.treeWeights (weighted SUM), not 1/n averaging —
    base + Σφ reconstructs the GBT's own prediction exactly."""
    ensure_package_shipped(spark)
    model = GBTRegressor(
        featuresCol="features", labelCol="label", maxIter=6, maxDepth=3, seed=9
    ).fit(supervised)
    out = (
        tree_shap(supervised, model, FEATS, keep_cols=["rid"])
        .toPandas()
        .set_index("rid")
        .sort_index()
    )
    pred = (
        model.transform(supervised)
        .select("rid", "prediction")
        .toPandas()
        .set_index("rid")
        .sort_index()
    )
    assert (out["prediction"] - pred["prediction"]).abs().max() < 1e-9
    # Shapley efficiency asserted from the raw output columns (not the
    # precomputed prediction): base_value + Σ phi_j == GBT weighted-sum
    # prediction, row by row
    recon = out["base_value"] + out[[f"phi_{c}" for c in FEATS]].sum(axis=1)
    assert (recon - pred["prediction"]).abs().max() < 1e-9
    assert len(model.treeWeights) > 1


def test_ensemble_tree_weights_dispatch(spark, supervised):
    """RF → uniform 1/n (its treeWeights are all 1.0 and must not be
    summed); GBT → its treeWeights verbatim; single tree → [1.0]."""
    from pyspark.ml.regression import DecisionTreeRegressor

    from commodity_price_forecasting_spark.ml.treeshap import (
        ensemble_tree_weights,
    )

    rf = _fit_rf(supervised)
    assert ensemble_tree_weights(rf, 12) == [1.0 / 12] * 12
    gbt = GBTRegressor(
        featuresCol="features", labelCol="label", maxIter=4, maxDepth=2, seed=3
    ).fit(supervised)
    assert ensemble_tree_weights(gbt, 4) == [float(w) for w in gbt.treeWeights]
    dt = DecisionTreeRegressor(
        featuresCol="features", labelCol="label", maxDepth=2, seed=3
    ).fit(supervised)
    assert ensemble_tree_weights(dt, 1) == [1.0]


def test_m13_shap_tree_query_shape(spark):
    from commodity_price_forecasting_spark.plans.queries_coverage import (
        m13_shap_tree,
    )

    out = m13_shap_tree(spark, SF_DIR).toPandas()
    assert list(out["feature"]) == ["f_lag1", "f_lag2", "f_ma5"]
    assert (out["mean_abs_shap"] >= 0).all()
    assert out["base_value"].nunique() == 1
    # lag-1 price is by far the strongest predictor of price
    assert out.set_index("feature")["mean_abs_shap"].idxmax() == "f_lag1"


def test_leaf_only_trees_constant_label(spark):
    """Degenerate case: constant label → every tree is a single leaf
    (no splits, zero unique features). All φ must be exactly 0 and
    base == the constant == the prediction."""
    ensure_package_shipped(spark)
    pdf = pd.DataFrame(
        {"a": np.arange(100.0), "b": np.arange(100.0)[::-1], "label": 7.5}
    )
    df = spark.createDataFrame(pdf)
    assembled = VectorAssembler(inputCols=["a", "b"], outputCol="features").transform(df)
    model = RandomForestRegressor(
        featuresCol="features", labelCol="label", numTrees=3, maxDepth=3, seed=5
    ).fit(assembled)
    out = tree_shap(df, model, ["a", "b"]).toPandas()
    assert (out["phi_a"] == 0.0).all() and (out["phi_b"] == 0.0).all()
    assert np.allclose(out["base_value"], 7.5)
    assert np.allclose(out["prediction"], 7.5)


def test_tree_phi_matches_permutation_definition():
    """Implementation-independent exactness check (no Spark): _tree_phi
    (subset-enumeration with factorial weights) must equal the raw
    Shapley definition — average marginal contribution over ALL
    orderings of the unique features — on random small trees."""
    from itertools import permutations

    from commodity_price_forecasting_spark.ml.treeshap import (
        _expectation,
        _tree_phi,
    )

    rng = np.random.RandomState(11)
    for trial in range(5):
        # random binary tree of depth 3 over 3 features, stored in the
        # same DFS-preorder arrays extract_trees produces
        n_feat = 3
        nodes = {"feature": [], "threshold": [], "left": [], "right": [], "value": [], "cover": []}

        def build(depth):
            idx = len(nodes["feature"])
            for k in nodes:
                nodes[k].append(0.0)
            if depth == 0 or rng.rand() < 0.25:
                nodes["feature"][idx] = -1
                nodes["value"][idx] = float(rng.randn())
                nodes["cover"][idx] = float(rng.randint(1, 50))
                return idx
            nodes["feature"][idx] = int(rng.randint(0, n_feat))
            nodes["threshold"][idx] = float(rng.randn())
            li = build(depth - 1)
            ri = build(depth - 1)
            nodes["left"][idx] = li
            nodes["right"][idx] = ri
            nodes["cover"][idx] = nodes["cover"][li] + nodes["cover"][ri]
            return idx

        build(3)
        tree = {k: np.asarray(v, dtype=(np.int64 if k in ("feature", "left", "right") else np.float64)) for k, v in nodes.items()}
        X = rng.randn(7, n_feat)
        phi, base = _tree_phi(tree, X, n_feat)

        uniq = sorted({int(f) for f in tree["feature"] if f >= 0})
        if not uniq:
            assert np.allclose(phi, 0.0)
            continue
        # brute force: average marginal contribution over all orderings
        brute = np.zeros((len(X), n_feat))
        perms = list(permutations(uniq))
        in_s = np.zeros(n_feat, dtype=bool)

        def v(subset):
            in_s[:] = False
            for f in subset:
                in_s[f] = True
            return _expectation(tree, X, in_s)

        for order in perms:
            cur: list = []
            prev = v(cur)
            for f in order:
                cur.append(f)
                nxt = v(cur)
                brute[:, f] += nxt - prev
                prev = nxt
        brute /= len(perms)
        assert np.allclose(phi, brute, atol=1e-10), f"trial {trial}"
        assert np.allclose(base, v([])[0])
