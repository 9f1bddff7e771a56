"""End-to-end facade test: the reference user's workflow
(load_data → run_ensemble → trade_suggestion) against the reference's
own serving artifact when present, else a synthetic equivalent.
"""

from __future__ import annotations

import os

import pytest

from commodity_price_forecasting_spark import api

REFERENCE_ARTIFACT = "/root/reference/Data/df_transformed.csv"


@pytest.fixture(scope="module")
def artifact(spark, tmp_path_factory):
    if os.path.exists(REFERENCE_ARTIFACT):
        return REFERENCE_ARTIFACT
    # synthetic df_transformed-shaped CSV fallback
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1)
    n = 200
    a = rng.normal(size=n).cumsum() + 50
    b = rng.normal(size=n).cumsum() + 30
    pdf = pd.DataFrame(
        {
            "date_id": range(n),
            "LME_CA_Close": a,
            "US_Stock_HL_adj_close": b,
            "LME_CA_Close - US_Stock_HL_adj_close": a - b + rng.normal(scale=0.1, size=n),
        }
    )
    p = tmp_path_factory.mktemp("art") / "df_transformed.csv"
    pdf.to_csv(p, index=False)
    return str(p)


def test_reference_user_workflow(spark, artifact):
    df, features, targets = api.load_data(spark, artifact)
    assert features and targets
    target = targets[0]

    ens = api.run_ensemble(df, features, target)
    assert set(ens.weights) == {"linear", "ridge", "random_forest"}
    assert abs(sum(ens.weights.values()) - 1.0) < 1e-9
    assert ens.ensemble_metrics["r2"] > 0  # in-sample protocol

    row = api.trade_suggestion(spark, ens, features, target, df=df).first()
    assert row["target"] == target
    assert row["signal"] in ("WAIT", "BUY_A_SELL_B", "SELL_A_BUY_B")
    assert row["confidence"] in ("High", "Medium", "Low")
    assert 0.0 <= row["strength"] <= 1.0
    assert row["generated_at"] is not None
