"""Exact path-dependent Tree SHAP for Spark ML tree ensembles
(SURVEY.md §2.9 M13 — the reference ran a SHAP analysis over its tree
models: README.md:53 cites a SHAP notebook and requirements-dev.txt.txt
lists ``shap``; the notebook itself is absent from the repo, so the
contract here is the published algorithm, not a file).

Method (all public): Lundberg & Lee 2017 define SHAP values as Shapley
values of the conditional-expectation game v(S) = E[f(x) | x_S]; for
trees, Lundberg, Erion & Lee 2018 (arXiv:1802.03888) evaluate v(S) by
tree traversal — follow the split when its feature ∈ S, otherwise take
the cover-weighted average of both children. This module computes that
game EXACTLY from the Shapley definition:

- v(S) depends only on S ∩ U where U = the unique features the tree
  actually splits on, and features ∉ U are dummy players (φ = 0), so
  the enumeration is over 2^|U| subsets per tree, NOT 2^M — for the
  shallow trees used in explanation work (|U| ≤ ~10) this is small,
  and each subset evaluation is ONE vectorized bottom-up pass over the
  node arrays for a whole Arrow batch of rows at once.
- Efficiency (Σφ + base = prediction) holds bit-exactly by
  construction, which the test suite asserts.

Distribution: tree structure is extracted once on the driver (trees
are KB-sized), captured in the ``mapInPandas`` closure (broadcast by
pickling), and every row-side operation is numpy over Arrow batches —
no per-row Python, no driver collect of row data.
"""

from __future__ import annotations

from itertools import combinations
from math import factorial

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "extract_trees",
    "ensemble_tree_weights",
    "tree_shap",
    "shap_values_pandas",
]

#: refuse subset enumeration past this many unique features per tree —
#: 2^12 vectorized traversals is the sane ceiling for an exact method;
#: cap tree depth (explanation models are shallow) rather than raise it.
MAX_UNIQUE_FEATURES = 12


def _walk(jnode, arrs: dict) -> int:
    """DFS-preorder flatten of one Spark ML tree (py4j node API:
    InternalNode.split/leftChild/rightChild, Node.prediction,
    Node.impurityStats.count — the cover). Returns this node's index."""
    idx = len(arrs["feature"])
    for k in ("feature", "threshold", "left", "right", "value", "cover"):
        arrs[k].append(0.0)
    arrs["value"][idx] = float(jnode.prediction())
    arrs["cover"][idx] = float(jnode.impurityStats().count())
    if jnode.getClass().getSimpleName() == "InternalNode":
        split = jnode.split()
        if split.getClass().getSimpleName() != "ContinuousSplit":
            raise NotImplementedError(
                "tree_shap supports continuous splits only; one-hot or "
                "index-encode categorical features upstream"
            )
        arrs["feature"][idx] = int(split.featureIndex())
        arrs["threshold"][idx] = float(split.threshold())
        arrs["left"][idx] = _walk(jnode.leftChild(), arrs)
        arrs["right"][idx] = _walk(jnode.rightChild(), arrs)
    else:
        arrs["feature"][idx] = -1
    return idx


def extract_trees(model) -> list[dict]:
    """Driver-side extraction of a RandomForest/GBT/DecisionTree
    regression model into plain numpy arrays (pickle-friendly for the
    executor closure). One dict per tree: feature (−1 = leaf),
    threshold, left/right child index, leaf value, node cover."""
    trees = getattr(model, "trees", None)
    tree_models = trees if trees is not None else [model]
    out = []
    for tm in tree_models:
        arrs = {k: [] for k in ("feature", "threshold", "left", "right", "value", "cover")}
        _walk(tm._call_java("rootNode"), arrs)
        out.append(
            {
                "feature": np.asarray(arrs["feature"], dtype=np.int64),
                "threshold": np.asarray(arrs["threshold"], dtype=np.float64),
                "left": np.asarray(arrs["left"], dtype=np.int64),
                "right": np.asarray(arrs["right"], dtype=np.int64),
                "value": np.asarray(arrs["value"], dtype=np.float64),
                "cover": np.asarray(arrs["cover"], dtype=np.float64),
            }
        )
    return out


def _expectation(tree: dict, X: np.ndarray, in_s: np.ndarray) -> np.ndarray:
    """v(S) for every row at once: one bottom-up pass over the node
    arrays. DFS preorder ⇒ children always have larger indices than
    their parent, so a reversed sweep resolves dependencies."""
    n_nodes = len(tree["feature"])
    E = np.empty((n_nodes, X.shape[0]))
    feat, thr = tree["feature"], tree["threshold"]
    left, right, val, cov = tree["left"], tree["right"], tree["value"], tree["cover"]
    for i in range(n_nodes - 1, -1, -1):
        f = feat[i]
        if f < 0:
            E[i] = val[i]
        elif in_s[f]:
            E[i] = np.where(X[:, f] <= thr[i], E[left[i]], E[right[i]])
        else:
            E[i] = (cov[left[i]] * E[left[i]] + cov[right[i]] * E[right[i]]) / cov[i]
    return E[0]


def _tree_phi(tree: dict, X: np.ndarray, n_features: int) -> tuple[np.ndarray, float]:
    """(phi matrix [rows × n_features], base value) for ONE tree —
    exact Shapley over the tree's unique split features."""
    uniq = sorted({int(f) for f in tree["feature"] if f >= 0})
    u = len(uniq)
    if u > MAX_UNIQUE_FEATURES:
        raise ValueError(
            f"tree splits on {u} unique features > {MAX_UNIQUE_FEATURES}; "
            "cap maxDepth on the explanation model"
        )
    # v for every subset of the unique features, keyed by bitmask
    v: dict[int, np.ndarray] = {}
    in_s = np.zeros(max(n_features, 1), dtype=bool)
    for mask in range(1 << u):
        in_s[:] = False
        for b, f in enumerate(uniq):
            if mask >> b & 1:
                in_s[f] = True
        v[mask] = _expectation(tree, X, in_s)
    phi = np.zeros((X.shape[0], n_features))
    fact = [factorial(k) for k in range(u + 1)]
    denom = fact[u]
    for b, f in enumerate(uniq):
        bit = 1 << b
        others = [1 << j for j in range(u) if j != b]
        for k in range(u):
            w = fact[k] * fact[u - k - 1] / denom
            for combo in combinations(others, k):
                mask = 0
                for c in combo:
                    mask |= c
                phi[:, f] += w * (v[mask | bit] - v[mask])
    base = float(v[0][0])  # v(∅) is row-independent: cover-weighted mean
    return phi, base


def ensemble_tree_weights(model, n_trees: int) -> list[float]:
    """Per-tree combination weights matching how the fitted model
    actually combines its trees: Spark's RandomForestRegressionModel
    predicts the tree AVERAGE (its ``treeWeights`` are all 1.0 and
    must NOT be used as-is), while GBTRegressionModel predicts the
    ``treeWeights``-weighted SUM (learning-rate-scaled). A single
    DecisionTreeRegressionModel is weight 1."""
    cls = type(model).__name__
    if cls.startswith("GBT"):
        w = list(getattr(model, "treeWeights"))
        if len(w) != n_trees:
            raise ValueError(f"treeWeights len {len(w)} != n_trees {n_trees}")
        return [float(x) for x in w]
    if n_trees == 1:
        return [1.0]
    return [1.0 / n_trees] * n_trees


def shap_values_pandas(
    trees: list[dict], X: np.ndarray, n_features: int, tree_weight
) -> tuple[np.ndarray, float]:
    """Ensemble SHAP for a numpy batch: Σ_t w_t·φ_t. ``tree_weight``
    is either a scalar applied to every tree (RandomForest: 1/n —
    prediction is the tree average) or a per-tree sequence (GBT:
    ``model.treeWeights`` — prediction is the weighted sum)."""
    weights = (
        [float(tree_weight)] * len(trees)
        if np.isscalar(tree_weight)
        else [float(w) for w in tree_weight]
    )
    if len(weights) != len(trees):
        raise ValueError(f"{len(weights)} weights for {len(trees)} trees")
    phi = np.zeros((X.shape[0], n_features))
    base = 0.0
    for tree, w in zip(trees, weights):
        p, b = _tree_phi(tree, X, n_features)
        phi += w * p
        base += w * b
    return phi, base


def tree_shap(
    df: DataFrame,
    model,
    feature_cols: list[str],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row SHAP attribution columns ``phi_<feature>`` plus
    ``base_value`` and the reconstructed ``prediction`` (= base + Σφ,
    exact by Shapley efficiency) for a fitted Spark ML tree-ensemble
    regression model. Arrow-batched ``mapInPandas``; the extracted
    tree arrays ship via ``sc.broadcast`` — once per executor, not
    once per task as closure capture would (a 100-tree forest's
    arrays are MBs; at 10k tasks that difference is real)."""
    extracted = extract_trees(model)
    trees_bc = df.sparkSession.sparkContext.broadcast(extracted)
    weight = ensemble_tree_weights(model, len(extracted))
    n_features = len(feature_cols)
    keep = list(keep_cols or [])
    in_schema = df.select(*(keep + feature_cols)).schema
    out_fields = [in_schema[c] for c in keep] + [
        T.StructField(f"phi_{c}", T.DoubleType(), False) for c in feature_cols
    ] + [
        T.StructField("base_value", T.DoubleType(), False),
        T.StructField("prediction", T.DoubleType(), False),
    ]
    out_schema = T.StructType(out_fields)

    def compute(batches):
        trees = trees_bc.value
        for pdf in batches:
            X = pdf[feature_cols].to_numpy(dtype=np.float64)
            phi, base = shap_values_pandas(trees, X, n_features, weight)
            out = pdf[keep].copy() if keep else pd.DataFrame(index=pdf.index)
            for j, c in enumerate(feature_cols):
                out[f"phi_{c}"] = phi[:, j]
            out["base_value"] = base
            out["prediction"] = base + phi.sum(axis=1)
            yield out

    return df.select(*(keep + feature_cols)).mapInPandas(compute, out_schema)
