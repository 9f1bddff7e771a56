"""Interactive-prediction serving semantics (SURVEY.md §3 E3,
Phase 5): the reference's Streamlit path (app.py:192-645) as a thin
Spark-native API — no UI, same contract.

Flow parity with ``main()``:
- defaults: latest value of each feature (app.py:242 ``iloc[-1]``)
- X_input: defaults + user overrides (sidebar state)
- ensemble prediction on the one-row frame (app.py:115-148)
- signal rules: threshold/confidence CASE logic (app.py:159-189,
  279-296) as column expressions — Catalyst-visible
- results row: timestamped, CSV-able (app.py:629-645)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from commodity_price_forecasting_spark.functions.signals import trade_signal
from commodity_price_forecasting_spark.functions.spreads import SEPARATOR
from commodity_price_forecasting_spark.ml.ensemble import EnsembleResult


def default_inputs(df: DataFrame, feature_cols: list[str], time_col: str = "date_id") -> dict:
    """Latest observed value per feature — the app's slider defaults
    (app.py:242): one ordered-window last() pass, K scalars to the
    driver."""
    row = (
        df.orderBy(F.desc(time_col))
        .select(*feature_cols)
        .first()
    )
    return {c: float(row[c]) for c in feature_cols}


def predict_signal(
    spark: SparkSession,
    ens: EnsembleResult,
    feature_cols: list[str],
    target: str,
    inputs: dict,
    threshold: float = 0.6,
    min_confidence: float = 0.6,
) -> DataFrame:
    """One-row prediction + trade signal for a spread target.

    Scores the input through every fitted pipeline, combines with the
    ensemble weights, and applies the deployed signal rules. Returns a
    one-row DataFrame (the app's results table, app.py:629-645)."""
    x = spark.createDataFrame([Row(**{c: float(inputs[c]) for c in feature_cols})])
    preds = {}
    for name, model in ens.fitted.items():
        scored = model.transform(x)
        preds[name] = float(scored.select("prediction").first()[0])
    pred = sum(ens.weights[n] * p for n, p in preds.items())

    legs = target.split(SEPARATOR)
    leg_a = legs[0].strip()
    leg_b = legs[1].strip() if len(legs) > 1 else None

    # Explicit schema: leg_b is None for single-instrument targets and
    # would otherwise break schema inference (NullType).
    schema = T.StructType(
        [
            T.StructField("target", T.StringType(), False),
            T.StructField("leg_a", T.StringType(), False),
            T.StructField("leg_b", T.StringType(), True),
            T.StructField("prediction", T.DoubleType(), False),
            T.StructField("avg_r2", T.DoubleType(), False),
            *[T.StructField(f"pred_{n}", T.DoubleType(), False) for n in preds],
        ]
    )
    out = spark.createDataFrame(
        [(target, leg_a, leg_b, float(pred), float(ens.avg_r2), *preds.values())],
        schema,
    )
    sig = trade_signal(
        F.col("prediction"), F.col("avg_r2"), threshold=threshold, min_confidence=min_confidence
    )
    return out.select(
        "*",
        sig["signal"].alias("signal"),
        sig["confidence"].alias("confidence"),
        sig["strength"].alias("strength"),
        F.current_timestamp().alias("generated_at"),
    )
