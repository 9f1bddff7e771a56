"""Checklist-completion queries: dedicated named queries for SURVEY.md
§2 ✦ rows whose semantics were so far only exercised inside larger
pipelines — explicit joins (J1/J2/J5), ordered ranking (W4/T-group),
set difference (SO1), pair parsing (F1), the regression-metric surface
(M7/M8) over a deterministic naive forecast, CSV source/sink
round-trip (S1–S6), and the MLlib ensemble weight surface (M1/M2/M6,
rows-only).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.functions.stats import regression_metrics
from commodity_price_forecasting_spark.plans.e1_pipeline import (
    daily_bars,
    hourly_as_daily,
    pair_mapping,
    spreads,
)
from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table

_DAILY_CTE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
)
"""

# hourly bars bound to the same (daily, day, px) aliases the shared
# oracle bodies use: an underpowered statistical lane moves to the
# hourly grain by swapping this ONE prefix (r11 VERDICT ask #8 — the
# daily grain tops out at 23-24 obs/instrument at sf0.001, under the
# n >= 30 floor; hourly yields 46-82). Spark twin: e1_pipeline
# .hourly_as_daily.
_HOURLY_AS_DAILY_CTE = """
WITH daily AS (
  SELECT user_id AS instrument, date_trunc('hour', ts) AS day,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
)
"""


# --- J1: inner equi-join on the time key (MC:59845 cell 67) -------------

_J1_ORACLE = (
    _DAILY_CTE
    + """
SELECT a.instrument, a.day,
       ROUND(a.px, 6) AS px_today,
       ROUND(b.px, 6) AS px_next
FROM daily a
JOIN daily b ON a.instrument = b.instrument AND a.day + 1 = b.day
"""
)


@register("j1_time_align_join", oracle=_J1_ORACLE, tags=("join",))
def j1_time_align_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Features-at-t ⋈ values-at-t+1 on the (instrument, day) key —
    the reference's X⋈Y time alignment (J1). Both sides hash on the
    same keys: one co-partitioned shuffle, no broadcast needed."""
    daily = daily_bars(spark, sf_dir)
    nxt = daily.select(
        F.col("instrument").alias("_i"),
        F.date_sub(F.col("day"), 1).alias("_d"),
        F.col("px").alias("_px_next"),
    )
    return daily.join(
        nxt, (F.col("instrument") == F.col("_i")) & (F.col("day") == F.col("_d")), "inner"
    ).select(
        "instrument",
        "day",
        F.round("px", 6).alias("px_today"),
        F.round("_px_next", 6).alias("px_next"),
    )


# --- J2: left enrichment join against a broadcast dimension -------------

_J2_ORACLE = """
SELECT n.n_name, r.r_name AS region_name, count(c.c_custkey) AS n_customers,
       ROUND(sum(c.c_acctbal), 6) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


@register("j2_enrichment_join", oracle=_J2_ORACLE, tags=("join",))
def j2_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left enrichment join of facts against small dimensions
    (MC:59373 cell 64's mapping join) — both dims broadcast, so the
    fact table never shuffles."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "inner")
        .join(r, n.n_regionkey == r.r_regionkey, "left")
        .groupBy("n_name", F.col("r_name").alias("region_name"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 6).alias("total_acctbal"),
        )
    )


# --- J5: spread construction self-join (README.md:30) -------------------

_J5_ORACLE = (
    _DAILY_CTE
    + """
, gapped AS (
  SELECT instrument, day,
         CASE WHEN EXTRACT(day FROM day) % 7 = 0 THEN NULL ELSE px END AS px_raw
  FROM daily
), filled AS (
  SELECT instrument, day,
         COALESCE(
           LAST_VALUE(px_raw IGNORE NULLS) OVER (
             PARTITION BY instrument ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           FIRST_VALUE(px_raw IGNORE NULLS) OVER (
             PARTITION BY instrument ORDER BY day
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         ) AS px
  FROM gapped
), mapping AS (
  SELECT a.instrument AS leg_a, b.instrument AS leg_b,
         CAST((a.instrument % 4) + 1 AS INTEGER) AS lag,
         CAST(a.instrument AS VARCHAR) || ' - ' || CAST(b.instrument AS VARCHAR) AS pair
  FROM (SELECT DISTINCT instrument FROM daily) a
  JOIN (SELECT DISTINCT instrument FROM daily) b ON a.instrument + 1 = b.instrument
)
SELECT m.pair, count(*) AS n_days,
       CAST(ROUND(SUM(CAST(a.px - b.px AS DECIMAL(28,10))), 6) AS DOUBLE) AS sum_spread
FROM mapping m
JOIN filled a ON m.leg_a = a.instrument
JOIN filled b ON m.leg_b = b.instrument AND a.day = b.day
GROUP BY m.pair
"""
)


@register("j5_spread_self_join", oracle=_J5_ORACLE, tags=("join", "timeseries"))
def j5_spread_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spread construction as an equi self-join of the imputed series
    on (pair legs, day) — J5 standalone (its E1 usage feeds targets)."""
    from commodity_price_forecasting_spark.plans.e1_pipeline import imputed, with_gaps

    daily = daily_bars(spark, sf_dir)
    filled = imputed(with_gaps(daily))
    # round_to=None + DECIMAL aggregation: avg(double) here can land
    # EXACTLY on a 6dp rounding midpoint (the pxs are averages of
    # 2dp-ish values — small-denominator rationals), where Spark's
    # HALF_UP and DuckDB's float rounding legitimately disagree and
    # ~1e-16 summation noise flips the hash. Casting each spread to
    # DECIMAL(28,10) absorbs the float noise, and a decimal SUM is
    # exact and order-independent in both engines.
    sp = spreads(filled, pair_mapping(daily), round_to=None)
    return sp.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.sum(F.col("spread").cast("decimal(28,10)")), 6
        ).cast("double").alias("sum_spread"),
    )


# --- W4/T2: global time order expressed as a per-key rank ---------------

_W4_ORACLE = (
    _DAILY_CTE
    + """
SELECT instrument, day,
       ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day) AS seq,
       ROUND(px, 6) AS px
FROM daily
"""
)


@register("w4_ordered_rank", oracle=_W4_ORACLE, tags=("window", "sort"))
def w4_ordered_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time ordering (W4) made verifiable: per-instrument sequence
    numbers via a partitioned window — the scalable form of the
    reference's global sort_values(date_id)."""
    w = Window.partitionBy("instrument").orderBy("day")
    return daily_bars(spark, sf_dir).select(
        "instrument",
        "day",
        F.row_number().over(w).alias("seq"),
        F.round("px", 6).alias("px"),
    )


# --- SO1: set difference ------------------------------------------------

_SO1_ORACLE = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register("so1_except", oracle=_SO1_ORACLE, tags=("setop",))
def so1_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (SO1): customers with no FINISHED order —
    ``except`` ≡ distinct + left-anti, the reference's column-set
    completeness check generalized to rows. r11: the original
    "customers who never ordered" form returned 0 rows at every
    fixture SF (every customer orders), so Spark and the oracle had
    compared EMPTY SETS since r1 — the second silent-vacuity case the
    mirror's 0-rows gate caught (m11_ljung_box was the first); the
    status filter keeps the set-op semantics and yields 5/71/511 rows
    at sf0.001/0.01/0.1."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.exceptAll(o.distinct()).distinct()


# --- F1: pair-expression parsing ----------------------------------------

_F1_ORACLE = (
    _DAILY_CTE
    + """
, mapping AS (
  SELECT CAST(a.instrument AS VARCHAR) || ' - ' || CAST(b.instrument AS VARCHAR) AS pair
  FROM (SELECT DISTINCT instrument FROM daily) a
  JOIN (SELECT DISTINCT instrument FROM daily) b ON a.instrument + 1 = b.instrument
)
SELECT pair,
       trim(split_part(pair, ' - ', 1)) AS leg_a,
       trim(split_part(pair, ' - ', 2)) AS leg_b
FROM mapping
"""
)


@register("f1_pair_parse", oracle=_F1_ORACLE, tags=("scalar",))
def f1_pair_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the name-embedded spread expression "A - B" into legs
    (MC:57130 cell 35; APP:272) — split/trim column expressions."""
    mapping = pair_mapping(daily_bars(spark, sf_dir)).select("pair")
    parts = F.split(F.col("pair"), " - ")
    return mapping.select(
        "pair",
        F.trim(F.element_at(parts, 1)).alias("leg_a"),
        F.trim(F.element_at(parts, 2)).alias("leg_b"),
    )


# --- M7/M8: regression metric surface over a naive forecast -------------

_M7_ORACLE = (
    _DAILY_CTE
    + """
, scored AS (
  SELECT px AS label,
         LAG(px) OVER (PARTITION BY instrument ORDER BY day) AS pred
  FROM daily
)
SELECT count(*) AS n,
       ROUND(avg(abs(label - pred)), 6) AS mae,
       ROUND(sqrt(avg((label - pred) * (label - pred))), 6) AS rmse,
       ROUND(1 - sum((label - pred) * (label - pred))
               / (sum(label * label) - sum(label) * sum(label) / count(*)), 6) AS r2,
       ROUND(avg(CASE WHEN sign(label) = sign(pred) THEN 1.0 ELSE 0.0 END), 6) AS dir_acc,
       ROUND(avg(2 * abs(pred - label) / (abs(pred) + abs(label))), 6) AS smape
FROM scored WHERE pred IS NOT NULL
"""
)


@register("m7_forecast_metrics", oracle=_M7_ORACLE, tags=("ml", "metrics", "bench"))
def m7_forecast_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full metric surface (M7 MAE/RMSE/R², M8 directional
    accuracy/SMAPE) over a deterministic naive (lag-1) forecast — one
    map-side-combinable aggregate pass, no MLlib evaluator loop."""
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    scored = (
        daily.select(
            F.col("px").alias("label"), F.lag("px").over(w).alias("pred")
        ).where(F.col("pred").isNotNull())
    )
    m = regression_metrics(scored, "label", "pred")
    return m.select(
        "n",
        *[F.round(c, 6).alias(c) for c in ("mae", "rmse", "r2", "dir_acc", "smape")],
    )


# --- S1–S6: CSV source/sink round-trip ----------------------------------

_S1_ORACLE = (
    _DAILY_CTE
    + """
SELECT instrument, count(*) AS n_days,
       CAST(ROUND(SUM(CAST(px AS DECIMAL(28,10))), 6) AS DOUBLE) AS sum_px
FROM daily GROUP BY instrument
"""
)


@register("s1_csv_roundtrip", oracle=_S1_ORACLE, tags=("source", "sink"))
def s1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + scan (S1–S6): write the daily series to CSV
    (header, partitioned files — not coalesce(1)) and aggregate the
    re-scanned copy with an explicit schema. Java's double formatting
    is round-trippable, so the oracle over the parquet source must
    match exactly."""
    # per-application path: concurrent driver/test sessions must not
    # overwrite each other's round-trip output mid-read
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_csv_roundtrip_{spark.sparkContext.applicationId}",
    )
    daily_bars(spark, sf_dir).write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).schema(
        "instrument BIGINT, day DATE, px DOUBLE"
    ).csv(out)
    # DECIMAL sum rather than rounded avg/min/max of doubles: at
    # larger SFs some px values land exactly on 6dp rounding
    # midpoints where the engines' rounding disagrees (see
    # j5_spread_self_join) — decimal sums are exact on both sides.
    return back.groupBy("instrument").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.sum(F.col("px").cast("decimal(28,10)")), 6)
        .cast("double")
        .alias("sum_px"),
    )


_S10_ORACLE = _DAILY_CTE + """
SELECT instrument,
       COUNT(*) AS n_days,
       CAST(ROUND(SUM(CAST(px AS DECIMAL(28,10))), 6) AS DOUBLE) AS sum_px
FROM daily
GROUP BY instrument
"""


@register("s10_orc_roundtrip", oracle=_S10_ORACLE, tags=("source", "sink"))
def s10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan: the columnar-format sibling of
    s1_csv_roundtrip — ORC ships with Spark, carries types natively
    (no schema re-declaration on read, unlike CSV), and supports the
    same predicate-pushdown/column-pruning path as parquet. The
    round-trip is exact (typed columns, no text formatting), so the
    oracle over the parquet source matches bit-for-bit."""
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_orc_roundtrip_{spark.sparkContext.applicationId}",
    )
    daily_bars(spark, sf_dir).write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("instrument").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.sum(F.col("px").cast("decimal(28,10)")), 6)
        .cast("double")
        .alias("sum_px"),
    )


# --- M1/M2/M6: MLlib model + ensemble weight surface (rows-only) --------


@register("m6_ensemble_weights", oracle=None, tags=("ml",))
def m6_ensemble_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the deployed trio (Linear, Ridge α=1, RF 100 trees seed 42
    — app.py:120-123) on a supervised frame from the daily series and
    return each model's in-sample metrics + normalized R² weight
    (app.py:137-140). Not SQL-expressible → rows-only driver check;
    value-level tests live in tests/test_ml.py.

    The forest is depth-bounded here: sklearn-parity depth (20) on a
    10×-reference-sized frame inflates the fitted model past a
    default 1 GiB driver heap; depth 10 keeps the model ~1000 nodes/
    tree while exercising the identical pipeline."""
    from pyspark.ml.regression import RandomForestRegressor

    from commodity_price_forecasting_spark.ml.ensemble import (
        default_models,
        run_ensemble,
    )

    # Deterministic instrument cap: the supervised frame grows with
    # |users| × |days| across scale factors; an unbounded frame at
    # sf0.1+ inflates the 100-tree forest past a 1 GiB driver heap.
    # 150 instruments ≈ the sf0.01 frame at every SF.
    daily = daily_bars(spark, sf_dir).filter(F.col("instrument") <= 150)
    w = Window.partitionBy("instrument").orderBy("day")
    sup = (
        daily.select(
            "instrument",
            F.col("px").alias("label"),
            F.lag("px", 1).over(w).alias("f_lag1"),
            F.lag("px", 2).over(w).alias("f_lag2"),
            F.avg("px").over(w.rowsBetween(-5, -1)).alias("f_ma5"),
        )
        .dropna()
    )
    stats = sup.agg(F.count(F.lit(1)).alias("n"), F.stddev_pop("label").alias("sy")).first()
    models = default_models(n_rows=stats["n"], label_std=stats["sy"])
    models["random_forest"] = RandomForestRegressor(
        featuresCol="features",
        labelCol="label",
        numTrees=100,
        seed=42,
        maxDepth=10,
        featureSubsetStrategy="all",
    )
    res = run_ensemble(sup, ["f_lag1", "f_lag2", "f_ma5"], "label", models=models)
    rows = [
        (
            name,
            round(res.weights[name], 6),
            round(res.model_metrics[name]["r2"], 6),
            round(res.model_metrics[name]["mae"], 6),
        )
        for name in sorted(res.weights)
    ]
    return spark.createDataFrame(
        rows, "model STRING, weight DOUBLE, r2 DOUBLE, mae DOUBLE"
    )


@register("m11_stationarity_tests", oracle=None, tags=("ml", "stats"))
def m11_stationarity_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADF + KPSS per instrument over the daily series (M11,
    MC:34 cell 1 / README.md:29) — statsmodels-free numpy math
    distributed per-group with applyInPandas; joined into one
    verdict table. Not SQL-expressible → rows-only driver check;
    statistical-power tests live in tests/test_ml.py."""
    from commodity_price_forecasting_spark.ml.stattests import (
        adf_by_group,
        kpss_by_group,
    )

    # hourly grain (r11 ask #8): daily topped out at 23-24 obs per
    # instrument at sf0.001 — under the tests' n >= 30 floor
    daily = hourly_as_daily(spark, sf_dir).select(
        F.col("instrument"), F.col("day"), F.col("px")
    )
    adf = adf_by_group(daily, "instrument", "day", "px").select(
        "instrument",
        F.round("adf_stat", 6).alias("adf_stat"),
        F.col("stationary").alias("adf_stationary"),
    )
    kpss = kpss_by_group(daily, "instrument", "day", "px").select(
        F.col("instrument").alias("_i"),
        F.round("kpss_stat", 6).alias("kpss_stat"),
        F.col("stationary").alias("kpss_stationary"),
    )
    return adf.join(kpss, adf.instrument == kpss._i, "inner").drop("_i")


_KPSS_ORACLE = (
    _HOURLY_AS_DAILY_CTE
    + """
, d AS (
  SELECT instrument, px,
         ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day) AS rn
  FROM daily
), m AS (
  SELECT instrument, AVG(px) AS mu, COUNT(*) AS n FROM daily GROUP BY 1
), e AS (
  SELECT d.instrument, d.rn, d.px - m.mu AS e, m.n,
         CAST(CEIL(12 * POWER(m.n / 100.0, 0.25)) AS BIGINT) AS big_l
  FROM d JOIN m ON d.instrument = m.instrument
), s AS (
  SELECT instrument, rn, e, n, big_l,
         SUM(e) OVER (PARTITION BY instrument ORDER BY rn
                      ROWS UNBOUNDED PRECEDING) AS sp
  FROM e
), base AS (
  SELECT instrument, MAX(n) AS n, MAX(big_l) AS big_l,
         SUM(e * e) AS gamma0, SUM(sp * sp) AS ss
  FROM s GROUP BY 1
), cx AS (
  SELECT a.instrument,
         SUM(2.0 * (1.0 - (a.rn - b.rn) * 1.0 / (a.big_l + 1)) * a.e * b.e)
           AS cross_sum
  FROM s a JOIN s b
    ON a.instrument = b.instrument
   AND a.rn - b.rn BETWEEN 1 AND a.big_l
  GROUP BY 1
)
SELECT base.instrument, base.n,
       ROUND(base.ss / (base.n * base.n
             * ((base.gamma0 + COALESCE(cx.cross_sum, 0)) / base.n)), 6)
         AS kpss_stat
FROM base LEFT JOIN cx ON base.instrument = cx.instrument
"""
)


@register("m11_kpss_level", oracle=_KPSS_ORACLE, tags=("ml", "stats", "bench"))
def m11_kpss_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic per instrument (M11,
    README.md:29) computed ENTIRELY with JVM-side DataFrame ops —
    no Python in the path, unlike the numpy ``kpss_by_group`` twin
    (whose equality with this form is asserted in tests/test_ml.py):

    η = Σ_t S_t² / (n²·σ̂²_lr), with S_t the partial sums of the
    demeaned series and σ̂²_lr the Bartlett long-run variance at the
    Schwert lag L = ⌈12·(n/100)^0.25⌉.

    The lagged autocovariances come from ``explode(sequence(1, L))``
    + an equi-join on (instrument, rn−lag): O(n·L) rows, hash-
    partitioned on the series key — at 100 TB that is a co-partitioned
    self-join per series, never a per-group collect. Oracle: the same
    algebra in ANSI SQL (a bounded range self-join), hash-checked.
    Hourly grain since r12 (r11 ask #8): daily gave n = 23-24 at
    sf0.001, under the n >= 30 floor; hourly gives 46-82 everywhere."""
    daily = hourly_as_daily(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    d = daily.withColumn("rn", F.row_number().over(w))
    m = daily.groupBy("instrument").agg(
        F.avg("px").alias("mu"), F.count("*").alias("n")
    )
    e = d.join(m, "instrument").select(
        "instrument",
        "rn",
        (F.col("px") - F.col("mu")).alias("e"),
        "n",
        F.ceil(12 * F.pow(F.col("n") / 100.0, 0.25)).cast("long").alias("big_l"),
    )
    ws = Window.partitionBy("instrument").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = e.withColumn("sp", F.sum("e").over(ws))
    base = s.groupBy("instrument").agg(
        F.max("n").alias("n"),
        F.max("big_l").alias("big_l"),
        F.sum(F.col("e") * F.col("e")).alias("gamma0"),
        F.sum(F.col("sp") * F.col("sp")).alias("ss"),
    )
    pairs = (
        s.withColumn("lag", F.explode(F.sequence(F.lit(1), F.col("big_l"))))
        .withColumn("rn_from", F.col("rn") - F.col("lag"))
        .filter(F.col("rn_from") >= 1)
        .join(
            s.select(
                F.col("instrument").alias("_i"),
                F.col("rn").alias("_rn"),
                F.col("e").alias("e_from"),
            ),
            (F.col("instrument") == F.col("_i"))
            & (F.col("rn_from") == F.col("_rn")),
        )
    )
    cx = pairs.groupBy("instrument").agg(
        F.sum(
            2.0
            * (1.0 - F.col("lag") / (F.col("big_l") + 1))
            * F.col("e")
            * F.col("e_from")
        ).alias("cross_sum")
    )
    lrv = (F.col("gamma0") + F.coalesce(F.col("cross_sum"), F.lit(0.0))) / F.col("n")
    return (
        base.join(cx, "instrument", "left")
        .select(
            "instrument",
            "n",
            F.round(F.col("ss") / (F.col("n") * F.col("n") * lrv), 6).alias(
                "kpss_stat"
            ),
        )
    )


_DF_ORACLE = (
    _HOURLY_AS_DAILY_CTE
    + """
, pairs AS (
  SELECT instrument,
         LAG(px) OVER (PARTITION BY instrument ORDER BY day) AS x,
         px - LAG(px) OVER (PARTITION BY instrument ORDER BY day) AS d
  FROM daily
), s AS (
  SELECT instrument, COUNT(*) AS n,
         SUM(x) AS sx, SUM(d) AS sd,
         SUM(x*x) AS sxx, SUM(x*d) AS sxd, SUM(d*d) AS sdd
  FROM pairs WHERE x IS NOT NULL
  GROUP BY instrument HAVING COUNT(*) > 10
), beta AS (
  SELECT instrument, n,
         (n*sxd - sx*sd) / (n*sxx - sx*sx) AS b,
         (n*sxx - sx*sx) / n AS cxx,
         (sdd - sd*sd/n) - ((n*sxd - sx*sd) / (n*sxx - sx*sx))
           * (sxd - sx*sd/n) AS sse
  FROM s
)
SELECT instrument, CAST(n AS BIGINT) AS n,
       ROUND(b / SQRT((sse / (n - 2)) / cxx), 6) AS df_stat
FROM beta
"""
)


@register("m11_df_test", oracle=_DF_ORACLE, tags=("ml", "stats"))
def m11_df_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple (non-augmented) Dickey-Fuller unit-root statistic per
    instrument — the lag-0 member of the M11 family, entirely JVM
    aggregates: regress Δy_t on (const, y_{t-1}) via the closed-form
    simple-regression t-statistic t = β̂ / √(s²/Sxx),
    s² = SSE/(n−2). One groupBy after one lag window — two shuffles
    total, no Python. Equality with ml/stattests._adf_stat at
    max_lag=0 is asserted in tests/test_ml.py; the AUGMENTED variant
    (lagged Δy regressors) remains the applyInPandas
    ``m11_stationarity_tests``. Oracle: the identical sufficient-
    statistics algebra in ANSI SQL. Hourly grain since r12 (r11
    ask #8): same floor argument as m11_kpss_level."""
    daily = hourly_as_daily(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    pairs = daily.select(
        "instrument",
        F.lag("px").over(w).alias("x"),
        (F.col("px") - F.lag("px").over(w)).alias("d"),
    ).filter(F.col("x").isNotNull())
    s = pairs.groupBy("instrument").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("d").alias("sd"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("d")).alias("sxd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    ).filter(F.col("n") > 10)
    b = (F.col("n") * F.col("sxd") - F.col("sx") * F.col("sd")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    cxx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) / F.col("n")
    sse = (F.col("sdd") - F.col("sd") * F.col("sd") / F.col("n")) - b * (
        F.col("sxd") - F.col("sx") * F.col("sd") / F.col("n")
    )
    return s.select(
        "instrument",
        F.col("n").cast("long").alias("n"),
        F.round(b / F.sqrt((sse / (F.col("n") - 2)) / cxx), 6).alias("df_stat"),
    )


_M5_AR_ORACLE = (
    _DAILY_CTE
    + """
, lagged AS (
  SELECT instrument, px AS y,
         LAG(px, 1) OVER (PARTITION BY instrument ORDER BY day) AS x1,
         LAG(px, 2) OVER (PARTITION BY instrument ORDER BY day) AS x2
  FROM daily
), reg AS (
  SELECT instrument,
         COUNT(*) AS n, SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
         SUM(x1*x1) AS s11, SUM(x2*x2) AS s22, SUM(x1*x2) AS s12,
         SUM(x1*y) AS s1y, SUM(x2*y) AS s2y
  FROM lagged WHERE x1 IS NOT NULL AND x2 IS NOT NULL
  GROUP BY instrument
  HAVING COUNT(*) + 2 >= 7
), tail AS (
  SELECT instrument,
         MAX(CASE WHEN rn = 1 THEN px END) AS y_n,
         MAX(CASE WHEN rn = 2 THEN px END) AS y_n1
  FROM (
    SELECT instrument, px,
           ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day DESC) AS rn
    FROM daily
  ) z WHERE rn <= 2 GROUP BY instrument
), coef AS (
  SELECT r.instrument, t.y_n, t.y_n1,
         (r.sy*(r.s11*r.s22 - r.s12*r.s12)
          - r.s1*(r.s1y*r.s22 - r.s12*r.s2y)
          + r.s2*(r.s1y*r.s12 - r.s11*r.s2y))
         / (r.n*(r.s11*r.s22 - r.s12*r.s12)
            - r.s1*(r.s1*r.s22 - r.s12*r.s2)
            + r.s2*(r.s1*r.s12 - r.s11*r.s2)) AS c,
         (r.n*(r.s1y*r.s22 - r.s12*r.s2y)
          - r.sy*(r.s1*r.s22 - r.s12*r.s2)
          + r.s2*(r.s1*r.s2y - r.s1y*r.s2))
         / (r.n*(r.s11*r.s22 - r.s12*r.s12)
            - r.s1*(r.s1*r.s22 - r.s12*r.s2)
            + r.s2*(r.s1*r.s12 - r.s11*r.s2)) AS p1,
         (r.n*(r.s11*r.s2y - r.s1y*r.s12)
          - r.s1*(r.s1*r.s2y - r.s1y*r.s2)
          + r.sy*(r.s1*r.s12 - r.s11*r.s2))
         / (r.n*(r.s11*r.s22 - r.s12*r.s12)
            - r.s1*(r.s1*r.s22 - r.s12*r.s2)
            + r.s2*(r.s1*r.s12 - r.s11*r.s2)) AS p2
  FROM reg r JOIN tail t ON r.instrument = t.instrument
), fc AS (
  SELECT instrument,
         c + p1*y_n + p2*y_n1 AS f1,
         c + p1*(c + p1*y_n + p2*y_n1) + p2*y_n AS f2,
         c + p1*(c + p1*(c + p1*y_n + p2*y_n1) + p2*y_n)
           + p2*(c + p1*y_n + p2*y_n1) AS f3
  FROM coef
)
SELECT instrument, CAST(1 AS BIGINT) AS step, ROUND(f1, 5) AS forecast FROM fc
UNION ALL
SELECT instrument, 2, ROUND(f2, 5) FROM fc
UNION ALL
SELECT instrument, 3, ROUND(f3, 5) FROM fc
"""
)


@register("m5_ar_forecast", oracle=_M5_AR_ORACLE, tags=("ml", "timeseries"))
def m5_ar_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-instrument AR(2) 3-step forecast (M5 SARIMAX stand-in,
    slides 21-22) — deterministic numpy OLS per series via
    applyInPandas. Oracle: the SAME normal equations solved by
    Cramer's rule in SQL (the m13 SHAP precedent) plus the closed-form
    3-step recursion; numpy lstsq (SVD) agrees with the Cramer solve
    to ~1e-12 on these well-conditioned 3×3 systems, so the 5dp
    output rounding is far outside the disagreement band."""
    from commodity_price_forecasting_spark.ml.stattests import ar_forecast_by_group

    daily = daily_bars(spark, sf_dir)
    return ar_forecast_by_group(
        daily, "instrument", "day", "px", order=2, horizon=3
    ).select("instrument", "step", F.round("forecast", 5).alias("forecast"))


_M5_SARIMA_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority AS pri,
         date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / 1000000.0 AS rev
  FROM orders GROUP BY 1, 2
), y AS (
  SELECT pri, rev, ROW_NUMBER() OVER (PARTITION BY pri ORDER BY month) AS t
  FROM monthly
), u0 AS (
  SELECT pri, t, rev - LAG(rev) OVER (PARTITION BY pri ORDER BY t) AS v FROM y
), u AS (
  SELECT pri, t - 1 AS t, v FROM u0 WHERE v IS NOT NULL
), w0 AS (
  SELECT pri, t, v - LAG(v, 12) OVER (PARTITION BY pri ORDER BY t) AS w FROM u
), w AS (
  SELECT pri, t - 12 AS t, w FROM w0 WHERE w IS NOT NULL
), lw AS (
  SELECT pri, t, w,
         LAG(w, 1)  OVER (PARTITION BY pri ORDER BY t) AS w1,
         LAG(w, 12) OVER (PARTITION BY pri ORDER BY t) AS w12
  FROM w
), s1 AS (
  SELECT pri, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(w1) AS s1_, SUM(w12) AS s2_, SUM(w) AS sy,
         SUM(w1*w1) AS s11, SUM(w1*w12) AS s12_, SUM(w12*w12) AS s22,
         SUM(w1*w) AS s1y, SUM(w12*w) AS s2y
  FROM lw WHERE t >= 13
  GROUP BY pri HAVING COUNT(*) >= 15
), st1 AS (
  SELECT pri,
         n*(s11*s22 - s12_*s12_) - s1_*(s1_*s22 - s12_*s2_)
           + s2_*(s1_*s12_ - s11*s2_) AS det,
         (sy*(s11*s22 - s12_*s12_) - s1_*(s1y*s22 - s12_*s2y)
           + s2_*(s1y*s12_ - s11*s2y)) / det AS a0,
         (n*(s1y*s22 - s12_*s2y) - sy*(s1_*s22 - s12_*s2_)
           + s2_*(s1_*s2y - s1y*s2_)) / det AS a1,
         (n*(s11*s2y - s1y*s12_) - s1_*(s1_*s2y - s1y*s2_)
           + sy*(s1_*s12_ - s11*s2_)) / det AS a2
  FROM s1
), eps AS (
  SELECT l.pri, l.t, l.w, l.w1, l.w12,
         CASE WHEN l.t <= 12 THEN 0.0
              ELSE l.w - (a.a0 + a.a1*l.w1 + a.a2*l.w12) END AS e
  FROM lw l JOIN st1 a ON l.pri = a.pri
), le AS (
  SELECT pri, t, w, w1, w12, e,
         LAG(e, 1)  OVER (PARTITION BY pri ORDER BY t) AS e1,
         LAG(e, 12) OVER (PARTITION BY pri ORDER BY t) AS e12
  FROM eps
), g AS (
  SELECT pri, CAST(COUNT(*) AS DOUBLE) AS g11,
         SUM(w1) AS g12, SUM(w12) AS g13, SUM(e1) AS g14, SUM(e12) AS g15,
         SUM(w1*w1) AS g22, SUM(w1*w12) AS g23, SUM(w1*e1) AS g24,
         SUM(w1*e12) AS g25,
         SUM(w12*w12) AS g33, SUM(w12*e1) AS g34, SUM(w12*e12) AS g35,
         SUM(e1*e1) AS g44, SUM(e1*e12) AS g45, SUM(e12*e12) AS g55,
         SUM(w) AS b1, SUM(w1*w) AS b2, SUM(w12*w) AS b3,
         SUM(e1*w) AS b4, SUM(e12*w) AS b5
  FROM le WHERE t >= 13 GROUP BY pri
), el AS (
  SELECT pri, g11, g12, g13, g14, g15, b1,
         g22 - g12*g12/g11 AS h22, g23 - g12*g13/g11 AS h23,
         g24 - g12*g14/g11 AS h24, g25 - g12*g15/g11 AS h25,
         g33 - g13*g13/g11 AS h33, g34 - g13*g14/g11 AS h34,
         g35 - g13*g15/g11 AS h35,
         g44 - g14*g14/g11 AS h44, g45 - g14*g15/g11 AS h45,
         g55 - g15*g15/g11 AS h55,
         b2 - g12*b1/g11 AS r2, b3 - g13*b1/g11 AS r3,
         b4 - g14*b1/g11 AS r4, b5 - g15*b1/g11 AS r5,
         h33 - h23*h23/h22 AS i33, h34 - h23*h24/h22 AS i34,
         h35 - h23*h25/h22 AS i35,
         h44 - h24*h24/h22 AS i44, h45 - h24*h25/h22 AS i45,
         h55 - h25*h25/h22 AS i55,
         r3 - h23*r2/h22 AS s3, r4 - h24*r2/h22 AS s4,
         r5 - h25*r2/h22 AS s5,
         i44 - i34*i34/i33 AS j44, i45 - i34*i35/i33 AS j45,
         i55 - i35*i35/i33 AS j55,
         s4 - i34*s3/i33 AS t4, s5 - i35*s3/i33 AS t5,
         j55 - j45*j45/j44 AS k55, t5 - j45*t4/j44 AS q5,
         q5 / k55 AS x5,
         (t4 - j45*x5) / j44 AS x4,
         (s3 - i34*x4 - i35*x5) / i33 AS x3,
         (r2 - h23*x3 - h24*x4 - h25*x5) / h22 AS x2,
         (b1 - g12*x2 - g13*x3 - g14*x4 - g15*x5) / g11 AS x1
  FROM g
), e2 AS (
  SELECT l.pri, l.t,
         CASE WHEN l.t <= 12 THEN 0.0
              ELSE l.w - (c.x1 + c.x2*l.w1 + c.x3*l.w12
                          + c.x4*l.e1 + c.x5*l.e12) END AS e
  FROM le l JOIN el c ON l.pri = c.pri
), nm AS (
  SELECT pri, MAX(t) AS n FROM w GROUP BY pri
), wt AS (
  SELECT w.pri,
         MAX(CASE WHEN w.t = m.n THEN w.w END) AS wn,
         MAX(CASE WHEN w.t = m.n - 11 THEN w.w END) AS wl1,
         MAX(CASE WHEN w.t = m.n - 10 THEN w.w END) AS wl2,
         MAX(CASE WHEN w.t = m.n - 9 THEN w.w END) AS wl3,
         MAX(CASE WHEN w.t = m.n - 8 THEN w.w END) AS wl4,
         MAX(CASE WHEN w.t = m.n - 7 THEN w.w END) AS wl5,
         MAX(CASE WHEN w.t = m.n - 6 THEN w.w END) AS wl6
  FROM w JOIN nm m ON w.pri = m.pri GROUP BY w.pri
), et AS (
  SELECT e2.pri,
         MAX(CASE WHEN e2.t = m.n THEN e2.e END) AS en,
         MAX(CASE WHEN e2.t = m.n - 11 THEN e2.e END) AS el1,
         MAX(CASE WHEN e2.t = m.n - 10 THEN e2.e END) AS el2,
         MAX(CASE WHEN e2.t = m.n - 9 THEN e2.e END) AS el3,
         MAX(CASE WHEN e2.t = m.n - 8 THEN e2.e END) AS el4,
         MAX(CASE WHEN e2.t = m.n - 7 THEN e2.e END) AS el5,
         MAX(CASE WHEN e2.t = m.n - 6 THEN e2.e END) AS el6
  FROM e2 JOIN nm m ON e2.pri = m.pri GROUP BY e2.pri
), ut AS (
  SELECT u.pri,
         MAX(CASE WHEN u.t = m.nu - 11 THEN u.v END) AS ul1,
         MAX(CASE WHEN u.t = m.nu - 10 THEN u.v END) AS ul2,
         MAX(CASE WHEN u.t = m.nu - 9 THEN u.v END) AS ul3,
         MAX(CASE WHEN u.t = m.nu - 8 THEN u.v END) AS ul4,
         MAX(CASE WHEN u.t = m.nu - 7 THEN u.v END) AS ul5,
         MAX(CASE WHEN u.t = m.nu - 6 THEN u.v END) AS ul6
  FROM u JOIN (SELECT pri, MAX(t) AS nu FROM u GROUP BY pri) m
    ON u.pri = m.pri GROUP BY u.pri
), yt AS (
  SELECT y.pri, MAX(CASE WHEN y.t = m.ny THEN y.rev END) AS ylast
  FROM y JOIN (SELECT pri, MAX(t) AS ny FROM y GROUP BY pri) m
    ON y.pri = m.pri GROUP BY y.pri
), fc AS (
  SELECT c.pri, c.x1, c.x2, c.x3, c.x4, c.x5,
         c.x1 + c.x2*w.wn + c.x3*w.wl1 + c.x4*e.en + c.x5*e.el1 AS f1,
         c.x1 + c.x2*f1 + c.x3*w.wl2 + c.x5*e.el2 AS f2,
         c.x1 + c.x2*f2 + c.x3*w.wl3 + c.x5*e.el3 AS f3,
         c.x1 + c.x2*f3 + c.x3*w.wl4 + c.x5*e.el4 AS f4,
         c.x1 + c.x2*f4 + c.x3*w.wl5 + c.x5*e.el5 AS f5,
         c.x1 + c.x2*f5 + c.x3*w.wl6 + c.x5*e.el6 AS f6,
         f1 + u.ul1 AS uf1, f2 + u.ul2 AS uf2, f3 + u.ul3 AS uf3,
         f4 + u.ul4 AS uf4, f5 + u.ul5 AS uf5, f6 + u.ul6 AS uf6,
         yy.ylast + uf1 AS yf1, yf1 + uf2 AS yf2, yf2 + uf3 AS yf3,
         yf3 + uf4 AS yf4, yf4 + uf5 AS yf5, yf5 + uf6 AS yf6
  FROM el c JOIN wt w ON c.pri = w.pri JOIN et e ON c.pri = e.pri
       JOIN ut u ON c.pri = u.pri JOIN yt yy ON c.pri = yy.pri
)
SELECT pri AS o_orderpriority,
       st.step,
       ROUND(CASE st.step WHEN 1 THEN yf1 WHEN 2 THEN yf2 WHEN 3 THEN yf3
                          WHEN 4 THEN yf4 WHEN 5 THEN yf5 ELSE yf6 END
             * 1000000.0, 0) AS forecast,
       ROUND(x1, 6) AS c, ROUND(x2, 6) AS ar1, ROUND(x3, 6) AS sar12,
       ROUND(x4, 6) AS ma1, ROUND(x5, 6) AS sma12
FROM fc, (SELECT UNNEST(range(1, 7)) AS step) st
"""


@register("m5_sarima_forecast", oracle=_M5_SARIMA_ORACLE, tags=("ml", "timeseries"))
def m5_sarima_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full seasonal SARIMA(1,1,1)(1,1,1,12) per order-priority over
    MONTHLY revenue (M5 — the reference's statsmodels SARIMAX hybrid,
    slides 21-22; README.md:29), fit with the Durbin-style two-stage
    least squares (ml/sarima.sarima_durbin_fit_forecast): stage 1 =
    seasonal-AR submodel whose residuals proxy the MA innovations,
    stage 2 = OLS on [1, w1, w12, e1, e12]. Emits the fitted
    coefficients alongside the 6-step forecast, and the ENTIRE fit is
    replicated in the DuckDB oracle (VERDICT r3 ask #2): stage 1 via
    Cramer 3x3, stage 2 via unpivoted symmetric Gaussian elimination
    on the 5x5 Gram (SPD => stable without pivoting), then the
    forecast recursion and d=1/D=1 undifferencing in closed form.
    Monthly revenue aggregates through DECIMAL(18,2) (exact,
    order-independent) and is scaled to millions before the fit so
    the Gram stays well-conditioned; the forecast is rounded to whole
    dollars — cross-engine float noise is ~1e-4 dollars, 4 orders
    inside the rounding grid. One applyInPandas group per series;
    monthly pre-aggregation is JVM-side, so Python sees ~80 rows per
    key."""
    from commodity_price_forecasting_spark.ml.sarima import (
        sarima_durbin_forecast_by_group,
    )

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority", F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / 1e6
        ).alias("revenue")
    )
    fit = sarima_durbin_forecast_by_group(
        monthly, "o_orderpriority", "month", "revenue",
        horizon=6, s=12, key_type="string",
    )
    return fit.select(
        "o_orderpriority",
        "step",
        F.round(F.col("forecast") * 1e6, 0).alias("forecast"),
        F.round("c", 6).alias("c"),
        F.round("ar1", 6).alias("ar1"),
        F.round("sar12", 6).alias("sar12"),
        F.round("ma1", 6).alias("ma1"),
        F.round("sma12", 6).alias("sma12"),
    )


# --- A3 quartiles: exact percentiles with a DuckDB oracle ----------------

_QUANTILE_ORACLE = """
SELECT 'l_quantity' AS col_name,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75
FROM lineitem
UNION ALL
SELECT 'l_extendedprice',
       ROUND(quantile_cont(l_extendedprice, 0.25), 6),
       ROUND(quantile_cont(l_extendedprice, 0.50), 6),
       ROUND(quantile_cont(l_extendedprice, 0.75), 6)
FROM lineitem
"""


@register("a3_quantile_summary", oracle=_QUANTILE_ORACLE, tags=("profiling",))
def a3_quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles per column (pandas describe()'s
    25/50/75%, MC:24031 cell 6) via Spark's exact ``percentile``
    aggregate — matches DuckDB quantile_cont bit-for-bit. The
    approximate one-pass variant (percentile_approx / t-digest) is
    the 100 TB path (operators/profiling.quantile_summary); exact
    percentile is the oracle-checkable fidelity form."""
    li = load_table(spark, sf_dir, "lineitem")
    pieces = []
    for c in ("l_quantity", "l_extendedprice"):
        qs = F.percentile(F.col(c), F.lit([0.25, 0.5, 0.75]))
        pieces.append(
            li.agg(
                F.lit(c).alias("col_name"),
                F.round(qs.getItem(0), 6).alias("p25"),
                F.round(qs.getItem(1), 6).alias("p50"),
                F.round(qs.getItem(2), 6).alias("p75"),
            )
        )
    return pieces[0].unionAll(pieces[1])


_A6_ORACLE = """
SELECT CASE data_type
         WHEN 'BIGINT' THEN 'bigint'
         WHEN 'INTEGER' THEN 'int'
         WHEN 'SMALLINT' THEN 'smallint'
         WHEN 'DOUBLE' THEN 'double'
         WHEN 'FLOAT' THEN 'float'
         WHEN 'VARCHAR' THEN 'string'
         WHEN 'DATE' THEN 'date'
         WHEN 'BOOLEAN' THEN 'boolean'
         -- parquet timestamp[us] without UTC adjustment surfaces as
         -- TIMESTAMP in DuckDB and timestamp_ntz in Spark
         WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
         ELSE lower(data_type) END AS dtype,
       CAST(count(*) AS INT) AS n_columns
FROM information_schema.columns
WHERE table_name = 'lineitem'
GROUP BY 1
"""


@register("a6_dtype_histogram", oracle=_A6_ORACLE, tags=("profiling", "metadata"))
def a6_dtype_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dtype histogram (A6, MC:57490 cell 55): counts per Spark type
    over the lineitem schema. A metadata operation — computed from
    ``df.schema`` on the driver, zero data scanned (the reference's
    ``df.dtypes.value_counts()``). Oracle: DuckDB's
    information_schema over the same registered view, with the
    engine-to-engine type-name mapping spelled out in SQL — metadata
    parity is now hash-checked, not rows-only."""
    from collections import Counter

    li = load_table(spark, sf_dir, "lineitem")
    counts = Counter(f.dataType.simpleString() for f in li.schema.fields)
    return spark.createDataFrame(
        sorted(counts.items()), "dtype STRING, n_columns INT"
    )


# --- E2: the EDA fan-out as one long profile table ----------------------

_E2_ORACLE = (
    _DAILY_CTE
    + """
, gapped AS (
  SELECT instrument, day,
         CASE WHEN EXTRACT(day FROM day) % 7 = 0 THEN NULL ELSE px END AS px_raw
  FROM daily
), lagged AS (
  SELECT px, LAG(px) OVER (PARTITION BY instrument ORDER BY day) AS px_prev
  FROM daily
)
SELECT 'shape' AS section, 'n_rows' AS key, CAST(count(*) AS DOUBLE) AS value FROM daily
UNION ALL
SELECT 'shape', 'n_instruments', CAST(count(DISTINCT instrument) AS DOUBLE) FROM daily
UNION ALL
SELECT 'describe', 'mean_px', ROUND(avg(px), 6) FROM daily
UNION ALL
SELECT 'describe', 'std_px', ROUND(stddev_samp(px), 6) FROM daily
UNION ALL
SELECT 'describe', 'min_px', ROUND(min(px), 6) FROM daily
UNION ALL
SELECT 'describe', 'max_px', ROUND(max(px), 6) FROM daily
UNION ALL
SELECT 'nulls', 'n_null_px_raw', CAST(count(*) FILTER (WHERE px_raw IS NULL) AS DOUBLE) FROM gapped
UNION ALL
SELECT 'corr', 'autocorr_lag1', ROUND(corr(px, px_prev), 6) FROM lagged
"""
)


@register("e2_eda_profile", oracle=_E2_ORACLE, tags=("profiling", "eda"))
def e2_eda_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EDA pipeline (SURVEY.md §3 E2, SE cells 71-86) as a
    fan-out of independent aggregates over ONE cached frame, unioned
    into a long (section, key, value) profile — shape, describe,
    null census, lag-1 autocorrelation. Each branch is a separate
    job over the shared cache, the E2 execution shape."""
    from commodity_price_forecasting_spark.plans.e1_pipeline import with_gaps

    daily = daily_bars(spark, sf_dir).cache()
    gapped = with_gaps(daily)
    w = Window.partitionBy("instrument").orderBy("day")
    lagged = daily.select("px", F.lag("px").over(w).alias("px_prev"))

    def row(section: str, key: str, value):
        return F.struct(
            F.lit(section).alias("section"), F.lit(key).alias("key"), value.alias("value")
        )

    shape = daily.agg(
        row("shape", "n_rows", F.count(F.lit(1)).cast("double")).alias("r1"),
        row(
            "shape", "n_instruments", F.countDistinct("instrument").cast("double")
        ).alias("r2"),
        row("describe", "mean_px", F.round(F.avg("px"), 6)).alias("r3"),
        row("describe", "std_px", F.round(F.stddev_samp("px"), 6)).alias("r4"),
        row("describe", "min_px", F.round(F.min("px"), 6)).alias("r5"),
        row("describe", "max_px", F.round(F.max("px"), 6)).alias("r6"),
    )
    shape_long = shape.select(
        F.explode(F.array(*[F.col(f"r{i}") for i in range(1, 7)])).alias("s")
    ).select("s.section", "s.key", "s.value")
    nulls = gapped.agg(
        F.sum(F.col("px_raw").isNull().cast("double")).alias("value")
    ).select(F.lit("nulls").alias("section"), F.lit("n_null_px_raw").alias("key"), "value")
    corr = lagged.agg(F.round(F.corr("px", "px_prev"), 6).alias("value")).select(
        F.lit("corr").alias("section"), F.lit("autocorr_lag1").alias("key"), "value"
    )
    return shape_long.unionAll(nulls).unionAll(corr)


# --- layout bridge: wide → long unpivot (SURVEY.md §1.4) ----------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT l_orderkey,
         ROUND(SUM(l_quantity), 6) AS qty,
         ROUND(SUM(l_extendedprice), 6) AS price,
         ROUND(SUM(l_discount), 6) AS disc
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, field, value
FROM wide
UNPIVOT (value FOR field IN (qty, price, disc))
"""


@register("layout_unpivot", oracle=_UNPIVOT_ORACLE, tags=("layout", "bench"))
def layout_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) — the layout bridge between the
    reference's wide frames and this engine's scalable long form
    (SURVEY.md §1.4): native ``DataFrame.unpivot`` (codegen'd stack,
    no shuffle beyond the source aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 6).alias("qty"),
        F.round(F.sum("l_extendedprice"), 6).alias("price"),
        F.round(F.sum("l_discount"), 6).alias("disc"),
    )
    return wide.unpivot(
        ids=["l_orderkey"],
        values=["qty", "price", "disc"],
        variableColumnName="field",
        valueColumnName="value",
    )


# --- layout bridge: long → wide pivot (SURVEY.md §1.4) ------------------

_PIVOT_WIDE_ORACLE = (
    _DAILY_CTE
    + """
SELECT day,
       ROUND(MAX(CASE WHEN instrument = 1 THEN px END), 6) AS i1,
       ROUND(MAX(CASE WHEN instrument = 2 THEN px END), 6) AS i2,
       ROUND(MAX(CASE WHEN instrument = 3 THEN px END), 6) AS i3,
       ROUND(MAX(CASE WHEN instrument = 4 THEN px END), 6) AS i4
FROM daily
WHERE instrument IN (1, 2, 3, 4)
GROUP BY day
"""
)


@register("layout_pivot_wide", oracle=_PIVOT_WIDE_ORACLE, tags=("layout",))
def layout_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot — the model-assembly step (SURVEY.md §1.4:
    "wide layout produced by groupBy(date_id).pivot(...) only at
    model-assembly time"). The pivot VALUES ARE DECLARED, so Spark
    skips the extra distinct-scan and the output schema is static."""
    daily = daily_bars(spark, sf_dir).filter(F.col("instrument").isin(1, 2, 3, 4))
    return (
        daily.groupBy("day")
        .pivot("instrument", [1, 2, 3, 4])
        .agg(F.round(F.max("px"), 6))
        .select(
            "day",
            *[F.col(str(i)).alias(f"i{i}") for i in (1, 2, 3, 4)],
        )
    )


# --- CDC upsert: last-writer-wins merge ---------------------------------

_UPSERT_ORACLE = """
WITH base AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ts, value
  FROM events WHERE event_type <> 'error'
), updates AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ts, value * 2 AS value
  FROM events WHERE event_type = 'purchase'
), unioned AS (
  SELECT *, 0 AS src FROM base
  UNION ALL
  SELECT *, 1 AS src FROM updates
), ranked AS (
  SELECT user_id, day, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, day
                            ORDER BY ts DESC, src DESC) AS rn
  FROM unioned
)
SELECT user_id, day, ROUND(value, 6) AS value
FROM ranked WHERE rn = 1
"""


@register("cdc_upsert_latest", oracle=_UPSERT_ORACLE, tags=("pipeline", "dedup", "bench"))
def cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins upsert of an updates feed onto a base table
    keyed by (user, day), versioned by event time — the MERGE pattern
    without a table format (operators/cleaning.upsert_latest)."""
    from commodity_price_forecasting_spark.operators.cleaning import upsert_latest

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") != "error").select(
        "user_id", F.to_date("ts").alias("day"), "ts", "value"
    )
    updates = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("day"), "ts", (F.col("value") * 2).alias("value")
    )
    merged = upsert_latest(base, updates, ["user_id", "day"], "ts")
    return merged.select("user_id", "day", F.round("value", 6).alias("value"))


# --- M13: exact SHAP for a linear model (closed form) -------------------

_SHAP_LINEAR_ORACLE = (
    _DAILY_CTE
    + """
, sup AS (
  SELECT label, f_lag1, f_lag2, f_ma5 FROM (
    SELECT px AS label,
           LAG(px, 1) OVER w AS f_lag1,
           LAG(px, 2) OVER w AS f_lag2,
           AVG(px) OVER (w ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS f_ma5
    FROM daily
    WINDOW w AS (PARTITION BY instrument ORDER BY day)
  ) WHERE f_lag1 IS NOT NULL AND f_lag2 IS NOT NULL AND f_ma5 IS NOT NULL
), m AS (
  SELECT AVG(f_lag1) AS m1, AVG(f_lag2) AS m2, AVG(f_ma5) AS m3,
         AVG(label) AS my
  FROM sup
), d AS (
  SELECT f_lag1 - m1 AS a1, f_lag2 - m2 AS a2, f_ma5 - m3 AS a3,
         label - my AS ay
  FROM sup, m
), s AS (
  SELECT SUM(a1*a1) AS s11, SUM(a1*a2) AS s12, SUM(a1*a3) AS s13,
         SUM(a2*a2) AS s22, SUM(a2*a3) AS s23, SUM(a3*a3) AS s33,
         SUM(a1*ay) AS c1, SUM(a2*ay) AS c2, SUM(a3*ay) AS c3,
         AVG(ABS(a1)) AS mad1, AVG(ABS(a2)) AS mad2, AVG(ABS(a3)) AS mad3
  FROM d
), b AS (
  -- OLS on centered data via Cramer's rule on the 3x3 normal equations
  SELECT
    (s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s23*s13)
       + s13*(s12*s23 - s22*s13)) AS det,
    (c1*(s22*s33 - s23*s23) - s12*(c2*s33 - s23*c3)
       + s13*(c2*s23 - s22*c3)) AS det1,
    (s11*(c2*s33 - s23*c3) - c1*(s12*s33 - s23*s13)
       + s13*(s12*c3 - c2*s13)) AS det2,
    (s11*(s22*c3 - c2*s23) - s12*(s12*c3 - c2*s13)
       + c1*(s12*s23 - s22*s13)) AS det3,
    mad1, mad2, mad3
  FROM s
)
SELECT 'f_lag1' AS feature, ROUND(det1/det, 6) AS beta,
       ROUND(ABS(det1/det) * mad1, 6) AS mean_abs_shap FROM b
UNION ALL
SELECT 'f_lag2', ROUND(det2/det, 6), ROUND(ABS(det2/det) * mad2, 6) FROM b
UNION ALL
SELECT 'f_ma5', ROUND(det3/det, 6), ROUND(ABS(det3/det) * mad3, 6) FROM b
"""
)


_LINEAR_ENSEMBLE_ORACLE = (
    _DAILY_CTE
    + """
, sup AS (
  SELECT label, f_lag1, f_lag2, f_ma5 FROM (
    SELECT px AS label,
           LAG(px, 1) OVER w AS f_lag1,
           LAG(px, 2) OVER w AS f_lag2,
           AVG(px) OVER (w ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS f_ma5
    FROM daily
    WINDOW w AS (PARTITION BY instrument ORDER BY day)
  ) WHERE f_lag1 IS NOT NULL AND f_lag2 IS NOT NULL AND f_ma5 IS NOT NULL
), m AS (
  SELECT AVG(f_lag1) AS m1, AVG(f_lag2) AS m2, AVG(f_ma5) AS m3,
         AVG(label) AS my
  FROM sup
), d AS (
  SELECT f_lag1 - m1 AS a1, f_lag2 - m2 AS a2, f_ma5 - m3 AS a3,
         label - my AS ay
  FROM sup, m
), s AS (
  SELECT SUM(a1*a1) AS s11, SUM(a1*a2) AS s12, SUM(a1*a3) AS s13,
         SUM(a2*a2) AS s22, SUM(a2*a3) AS s23, SUM(a3*a3) AS s33,
         SUM(a1*ay) AS c1, SUM(a2*ay) AS c2, SUM(a3*ay) AS c3,
         SUM(ay*ay) AS syy
  FROM d
), ols AS (
  -- OLS by Cramer on the centered 3x3 normal equations. In-sample
  -- SSE = Syy - beta.c, so R^2 needs no second pass over the rows
  SELECT syy,
    (c1*(s22*s33 - s23*s23) - s12*(c2*s33 - s23*c3)
       + s13*(c2*s23 - s22*c3))
    / (s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s23*s13)
       + s13*(s12*s23 - s22*s13)) AS b1,
    (s11*(c2*s33 - s23*c3) - c1*(s12*s33 - s23*s13)
       + s13*(s12*c3 - c2*s13))
    / (s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s23*s13)
       + s13*(s12*s23 - s22*s13)) AS b2,
    (s11*(s22*c3 - c2*s23) - s12*(s12*c3 - c2*s13)
       + c1*(s12*s23 - s22*s13))
    / (s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s23*s13)
       + s13*(s12*s23 - s22*s13)) AS b3,
    c1, c2, c3
  FROM s
), ridge AS (
  -- sklearn Ridge(alpha=1): (S + I) beta = c, and SSE = Syy - beta.c
  -- - alpha*||beta||^2 (since beta'S beta = beta.c - alpha*||beta||^2)
  SELECT syy, c1, c2, c3,
    (c1*((s22+1)*(s33+1) - s23*s23) - s12*(c2*(s33+1) - s23*c3)
       + s13*(c2*s23 - (s22+1)*c3))
    / ((s11+1)*((s22+1)*(s33+1) - s23*s23) - s12*(s12*(s33+1) - s23*s13)
       + s13*(s12*s23 - (s22+1)*s13)) AS b1,
    ((s11+1)*(c2*(s33+1) - s23*c3) - c1*(s12*(s33+1) - s23*s13)
       + s13*(s12*c3 - c2*s13))
    / ((s11+1)*((s22+1)*(s33+1) - s23*s23) - s12*(s12*(s33+1) - s23*s13)
       + s13*(s12*s23 - (s22+1)*s13)) AS b2,
    ((s11+1)*((s22+1)*c3 - c2*s23) - s12*(s12*c3 - c2*s13)
       + c1*(s12*s23 - (s22+1)*s13))
    / ((s11+1)*((s22+1)*(s33+1) - s23*s23) - s12*(s12*(s33+1) - s23*s13)
       + s13*(s12*s23 - (s22+1)*s13)) AS b3
  FROM s
), r2s AS (
  SELECT 'linear' AS model,
         1 - (syy - (b1*c1 + b2*c2 + b3*c3)) / syy AS r2
  FROM ols
  UNION ALL
  SELECT 'ridge',
         1 - (syy - (b1*c1 + b2*c2 + b3*c3) - (b1*b1 + b2*b2 + b3*b3)) / syy
  FROM ridge
)
SELECT model, ROUND(r2, 6) AS r2,
       ROUND(GREATEST(r2, 0.001) / SUM(GREATEST(r2, 0.001)) OVER (), 6)
         AS weight
FROM r2s
"""
)


@register("m6_linear_ensemble_weights", oracle=_LINEAR_ENSEMBLE_ORACLE, tags=("ml",))
def m6_linear_ensemble_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's R²-weighting rule (app.py:115-148:
    w = max(R², 0.001) normalized) on the LINEAR half of the trio —
    OLS + sklearn-objective-exact Ridge(α=1) fit with MLlib on the
    lag-feature frame. Unlike the RF-bearing ``m6_ensemble_weights``
    (rows-only by necessity), every quantity here is closed-form, so
    the oracle recomputes the fits by Cramer's rule and the in-sample
    R² from the normal-equation algebra (SSE = Syy − βᵀc for OLS;
    Syy − βᵀc − α‖β‖² for Ridge) — the WEIGHTING surface itself is
    hash-checked end-to-end."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    feats = ["f_lag1", "f_lag2", "f_ma5"]
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    sup = (
        daily.select(
            F.col("px").alias("label"),
            F.lag("px", 1).over(w).alias("f_lag1"),
            F.lag("px", 2).over(w).alias("f_lag2"),
            F.avg("px").over(w.rowsBetween(-5, -1)).alias("f_ma5"),
        )
        .dropna()
        .cache()
    )
    stats = sup.agg(
        F.count(F.lit(1)).alias("n"), F.stddev_pop("label").alias("sd")
    ).first()
    assembled = VectorAssembler(inputCols=feats, outputCol="features").transform(sup)
    models = {
        "linear": LinearRegression(featuresCol="features", labelCol="label"),
        "ridge": LinearRegression(
            featuresCol="features",
            labelCol="label",
            regParam=1.0 * float(stats["sd"]) / int(stats["n"]),
            elasticNetParam=0.0,
            standardization=False,
        ),
    }
    r2s = {}
    for name, est in models.items():
        scored = est.fit(assembled).transform(assembled)
        r2s[name] = float(
            regression_metrics(scored, "label", "prediction").first()["r2"]
        )
    total = sum(max(r, 0.001) for r in r2s.values())
    rows = [
        (name, round(r2s[name], 6), round(max(r2s[name], 0.001) / total, 6))
        for name in ("linear", "ridge")
    ]
    return spark.createDataFrame(rows, "model STRING, r2 DOUBLE, weight DOUBLE")


@register("m13_shap_linear", oracle=_SHAP_LINEAR_ORACLE, tags=("ml", "shap"))
def m13_shap_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True SHAP for the linear model (M13, README.md:53's missing
    SHAP notebook): for OLS, Shapley values are closed-form
    φⱼ = βⱼ·(xⱼ − E[xⱼ]) — computed as column expressions over the
    lag-feature frame (ml/importance.linear_shap), reported as global
    attribution mean|φⱼ| per feature. Oracle solves the same 3-feature
    OLS in ANSI SQL via Cramer's rule on the centered normal
    equations, so beta AND attribution are hash-checked; additivity
    (base + Σφ = prediction) is asserted in tests/test_ml.py."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from commodity_price_forecasting_spark.ml.importance import linear_shap

    feats = ["f_lag1", "f_lag2", "f_ma5"]
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    sup = (
        daily.select(
            F.col("px").alias("label"),
            F.lag("px", 1).over(w).alias("f_lag1"),
            F.lag("px", 2).over(w).alias("f_lag2"),
            F.avg("px").over(w.rowsBetween(-5, -1)).alias("f_ma5"),
        )
        .dropna()
        .cache()
    )
    assembled = VectorAssembler(inputCols=feats, outputCol="features").transform(sup)
    model = LinearRegression(featuresCol="features", labelCol="label").fit(assembled)
    coefs = {c: float(model.coefficients[i]) for i, c in enumerate(feats)}
    shap = linear_shap(sup, feats, coefs, float(model.intercept))
    agg = shap.agg(
        *[F.avg(F.abs(F.col(f"phi_{c}"))).alias(c) for c in feats]
    ).first()
    rows = [(c, round(coefs[c], 6), round(float(agg[c]), 6)) for c in feats]
    return spark.createDataFrame(
        rows, "feature STRING, beta DOUBLE, mean_abs_shap DOUBLE"
    )


@register("m13_shap_tree", oracle=None, tags=("ml", "shap"))
def m13_shap_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact path-dependent Tree SHAP for the RandomForest (M13 —
    the reference's SHAP analysis targeted its tree models:
    README.md:53, shap in requirements-dev.txt.txt). Trains the RF on
    the lag-feature frame, extracts the trees driver-side, and
    computes exact Shapley values of the cover-weighted
    conditional-expectation game per row via Arrow-batched
    ``mapInPandas`` (ml/treeshap). Output: global attribution per
    feature (mean|φ|, mean φ) + the shared base value. RF training
    is not SQL-expressible → rows-only driver check; exactness
    (additivity base + Σφ = prediction, machine precision) is
    asserted in tests/test_treeshap.py."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    from commodity_price_forecasting_spark.ml.treeshap import tree_shap
    from commodity_price_forecasting_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    feats = ["f_lag1", "f_lag2", "f_ma5"]
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    sup = (
        daily.select(
            F.col("px").alias("label"),
            F.lag("px", 1).over(w).alias("f_lag1"),
            F.lag("px", 2).over(w).alias("f_lag2"),
            F.avg("px").over(w.rowsBetween(-5, -1)).alias("f_ma5"),
        )
        .dropna()
        .cache()
    )
    assembled = VectorAssembler(inputCols=feats, outputCol="features").transform(sup)
    model = RandomForestRegressor(
        featuresCol="features", labelCol="label", numTrees=20, maxDepth=4, seed=42
    ).fit(assembled)
    shap = tree_shap(sup, model, feats)
    # returned LAZY (r5): the driver's rows-only check now executes
    # the distributed mapInPandas SHAP pass + aggregate itself, not a
    # driver-precomputed literal frame (closes the r4 verdict note
    # that the rows-only ML checks couldn't catch a regression in the
    # distributed part). The 1-row aggregate unpivots via stack.
    agg = shap.agg(
        F.round(F.first("base_value"), 6).alias("base"),
        *[
            F.round(F.avg(F.abs(F.col(f"phi_{c}"))), 6).alias(f"a_{c}")
            for c in feats
        ],
        *[F.round(F.avg(F.col(f"phi_{c}")), 6).alias(f"m_{c}") for c in feats],
    )
    stack = ", ".join(f"'{c}', a_{c}, m_{c}" for c in feats)
    return agg.select(
        F.expr(
            f"stack({len(feats)}, {stack}) AS (feature, mean_abs_shap, mean_shap)"
        ),
        F.col("base").alias("base_value"),
    )


@register("m4_svr_mlp", oracle=None, tags=("ml",))
def m4_svr_mlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: SVR + MLPRegressor (MC:34 cell 1 imports, slide 20) fit
    per instrument over the lag-feature frame — numpy estimators
    (sklearn absent here; ml/extra_models mirrors the defaults),
    distributed one-model-per-group via applyInPandas, in-sample
    R²/MAE per (instrument, model). Iterative fits are not
    SQL-expressible → rows-only driver check; determinism and
    better-than-linear fit quality are asserted in tests/test_ml.py."""
    from commodity_price_forecasting_spark.ml.extra_models import (
        NumpyMLP,
        NumpySVR,
        fit_predict_by_group,
    )

    feats = ["f_lag1", "f_lag2", "f_ma5"]
    daily = daily_bars(spark, sf_dir).filter(F.col("instrument") <= 150)
    w = Window.partitionBy("instrument").orderBy("day")
    sup = daily.select(
        "instrument",
        F.col("px").alias("label"),
        F.lag("px", 1).over(w).alias("f_lag1"),
        F.lag("px", 2).over(w).alias("f_lag2"),
        F.avg("px").over(w.rowsBetween(-5, -1)).alias("f_ma5"),
    ).dropna()
    out = []
    for name, make in (
        ("svr", lambda: NumpySVR()),
        ("mlp", lambda: NumpyMLP(epochs=100, seed=42)),
    ):
        scored = fit_predict_by_group(sup, "instrument", feats, "label", make)
        out.append(scored.withColumn("model", F.lit(name)))
    return (
        out[0]
        .unionAll(out[1])
        .select(
            "instrument",
            "model",
            "n",
            F.round("r2", 6).alias("r2"),
            F.round("mae", 6).alias("mae"),
        )
    )


# --- S6+: partitioned parquet sink with partition-pruned rescan ---------

_PARTITIONED_SINK_ORACLE = """
SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("s7_partitioned_parquet_sink", oracle=_PARTITIONED_SINK_ORACLE, tags=("source", "sink"))
def s7_partitioned_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-PRUNED rescan (the 100 TB
    layout pattern: hive-partition the lake by a low-cardinality
    column so per-slice consumers touch one directory). Writes events
    partitioned by event_type, re-reads ONLY the 'purchase' partition
    (partition pruning: the other directories are never opened —
    asserted in tests/test_sources_scale.py), and aggregates per day.
    Oracle computes the same from the raw parquet."""
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_part_sink_{spark.sparkContext.applicationId}",
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return back.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- S8: bucketed tables → shuffle-free co-located join -----------------

_BUCKETED_JOIN_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 6) AS sum_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@register("s8_bucketed_join", oracle=_BUCKETED_JOIN_ORACLE, tags=("source", "sink", "join"))
def s8_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join — the 100 TB pattern for a join
    both of whose sides are too big to broadcast: write each side
    ``bucketBy(k, join_key)`` + ``sortBy`` once at ingest, and every
    later join on that key is exchange-free (each task streams one
    pre-hashed, pre-sorted bucket pair). Writes orders and customer
    bucketed by custkey (8 buckets), re-reads via the catalog, and
    sort-merge-joins them — tests/test_sources_scale.py asserts the
    executed plan contains NO Exchange below the join. Oracle runs
    the plain join on the raw parquet."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_bucketed_{spark.sparkContext.applicationId}",
    )
    t_orders, t_cust = "s8_orders_bucketed", "s8_customer_bucketed"
    for tbl, df, key in (
        (t_orders, load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"), "o_custkey"),
        (t_cust, load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"), "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.mode("overwrite")
            .option("path", os.path.join(base, tbl))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    joined = (
        spark.table(t_orders)
        .hint("merge")  # keep SMJ: the demo is bucket co-location, not broadcast
        .join(spark.table(t_cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return joined.groupBy(F.col("c_mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 6).alias("sum_price"),
    )


# --- S9: JSON-lines source roundtrip ------------------------------------

_JSONL_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 6) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
"""


@register("s9_jsonl_roundtrip", oracle=_JSONL_ORACLE, tags=("source", "sink"))
def s9_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema-explicit rescan — the interchange
    format for event feeds that aren't parquet yet. Writes events as
    JSONL, re-reads with an EXPLICIT schema (never schema inference
    at scale: inference is a second full pass over 100 TB), and
    aggregates; the oracle reads the original parquet, so any
    fidelity loss in the JSON roundtrip (timestamp precision, float
    text form) would break the hash. Values aggregate through
    DECIMAL so the text→double→sum path stays order-independent."""
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_jsonl_{spark.sparkContext.applicationId}",
    )
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.write.mode("overwrite").json(out)
    schema = "event_id BIGINT, event_type STRING, value DOUBLE"
    back = spark.read.schema(schema).json(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(28,10)")), 6)
        .cast("double")
        .alias("sum_value"),
    )


# --- Z-order (Morton) layout clustering (r4) ----------------------------

def _morton_sql(x: str, y: str, bits: int = 16) -> str:
    """Bit-interleave SQL identical in Spark and DuckDB: integer
    shifts/masks only, fully parenthesized."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
WITH q AS (
  SELECT o_orderkey,
         o_custkey % 65536 AS xk,
         date_diff('day', DATE '1995-01-01', o_orderdate) % 65536 AS yk
  FROM orders
), z AS (
  SELECT o_orderkey, xk, yk,
         ({_morton_sql('xk', 'yk')}) AS morton
  FROM q
)
SELECT CAST(morton >> 16 AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(xk) AS BIGINT) AS min_cust,
       CAST(MAX(xk) AS BIGINT) AS max_cust,
       CAST(MIN(yk) AS BIGINT) AS min_day,
       CAST(MAX(yk) AS BIGINT) AS max_day
FROM z GROUP BY 1
"""


@register("layout_zorder", oracle=_ZORDER_ORACLE, tags=("layout",))
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering stats — the public technique behind
    Delta/Iceberg `OPTIMIZE ZORDER` (Morton 1966; multi-dimensional
    data clustering): interleave the bits of (customer key, order
    day) into one sort key, bucket by its bits above the low 16, and report
    each bucket's bounding box on BOTH dimensions. Writing files in
    zbucket order makes parquet min/max footer stats selective on
    customer AND date simultaneously — the 100 TB scan-pruning win a
    single-column sort cannot give. Pure integer shift/mask
    arithmetic, bit-identical in any engine; the only shuffle is the
    final per-bucket aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    q = orders.select(
        (F.col("o_custkey") % 65536).alias("xk"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            % 65536
        ).alias("yk"),
    )
    z = q.select("xk", "yk", F.expr(_morton_sql("xk", "yk")).alias("morton"))
    return (
        z.groupBy(F.shiftright("morton", 16).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("xk").cast("long").alias("min_cust"),
            F.max("xk").cast("long").alias("max_cust"),
            F.min("yk").cast("long").alias("min_day"),
            F.max("yk").cast("long").alias("max_day"),
        )
    )


# --- M7 extensions: pinball loss + Diebold-Mariano (r4) -----------------

_PINBALL_ORACLE = (
    _DAILY_CTE
    + """
, scored AS (
  SELECT px AS label,
         LAG(px) OVER (PARTITION BY instrument ORDER BY day) AS pred
  FROM daily
), taus AS (
  SELECT UNNEST([0.1, 0.5, 0.9]) AS tau
)
SELECT t.tau,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CASE WHEN s.label >= s.pred
                      THEN t.tau * (s.label - s.pred)
                      ELSE (t.tau - 1) * (s.label - s.pred) END), 6)
         AS pinball_loss
FROM scored s JOIN taus t ON TRUE
WHERE s.pred IS NOT NULL
GROUP BY t.tau
"""
)


@register("m7_pinball_loss", oracle=_PINBALL_ORACLE, tags=("ml", "metrics"))
def m7_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the naive lag-1 forecast at
    τ ∈ {0.1, 0.5, 0.9} — the metric that scores probabilistic /
    quantile forecasts (τ=0.5 is half the MAE by construction, an
    internal consistency check). The τ grid rides along as an
    in-row exploded literal array, so the whole thing stays one
    map-side-combinable aggregate pass keyed on τ."""
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    scored = (
        daily.select(F.col("px").alias("label"), F.lag("px").over(w).alias("pred"))
        .where(F.col("pred").isNotNull())
        .select(
            "label",
            "pred",
            F.explode(F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9))).alias("tau"),
        )
    )
    err = F.col("label") - F.col("pred")
    loss = F.when(err >= 0, F.col("tau") * err).otherwise((F.col("tau") - 1) * err)
    return scored.groupBy("tau").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(loss), 6).alias("pinball_loss"),
    )


_DM_ORACLE = (
    _DAILY_CTE
    + """
, scored AS (
  SELECT instrument, px AS label,
         LAG(px) OVER w AS naive,
         AVG(px) OVER (PARTITION BY instrument ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS roll3
  FROM daily WINDOW w AS (PARTITION BY instrument ORDER BY day)
), diffs AS (
  SELECT instrument,
         (label - naive) * (label - naive)
           - (label - roll3) * (label - roll3) AS d
  FROM scored WHERE naive IS NOT NULL AND roll3 IS NOT NULL
)
SELECT instrument,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(d), 6) AS mean_loss_diff,
       ROUND(AVG(d) / SQRT((AVG(d * d) - AVG(d) * AVG(d)) / COUNT(*)), 6)
         AS dm_stat,
       CASE WHEN ABS(AVG(d) / SQRT((AVG(d * d) - AVG(d) * AVG(d)) / COUNT(*)))
                 > 1.96
            THEN 1 ELSE 0 END AS significant
FROM diffs
GROUP BY instrument
HAVING (AVG(d * d) - AVG(d) * AVG(d)) > 0
"""
)


@register("m7_diebold_mariano", oracle=_DM_ORACLE, tags=("ml", "metrics"))
def m7_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano forecast-comparison test (Diebold & Mariano
    1995 — public) per instrument: is the naive lag-1 forecast's
    squared-error loss significantly different from a 3-day
    rolling-mean forecast's? DM = mean(d) / sqrt(var_pop(d)/n) with
    d = e₁² − e₂² (h=1, lag-0 variance), |DM| > 1.96 flagged. The
    whole test is two ordered windows plus one per-instrument
    aggregate — model comparison as a single scan, no Python, no
    iteration; the statistic's variance guard drops degenerate
    constant-d groups identically in both engines."""
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    w3 = w.rowsBetween(-3, -1)
    scored = daily.select(
        "instrument",
        F.col("px").alias("label"),
        F.lag("px").over(w).alias("naive"),
        F.avg("px").over(w3).alias("roll3"),
    ).where(F.col("naive").isNotNull() & F.col("roll3").isNotNull())
    e1 = F.col("label") - F.col("naive")
    e2 = F.col("label") - F.col("roll3")
    d = e1 * e1 - e2 * e2
    agg = scored.select("instrument", d.alias("d")).groupBy("instrument").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("d").alias("md"),
        (F.avg(F.col("d") * F.col("d")) - F.avg("d") * F.avg("d")).alias("vd"),
    )
    dm = F.col("md") / F.sqrt(F.col("vd") / F.col("n"))
    return agg.filter(F.col("vd") > 0).select(
        "instrument",
        "n",
        F.round("md", 6).alias("mean_loss_diff"),
        F.round(dm, 6).alias("dm_stat"),
        F.when(F.abs(dm) > 1.96, F.lit(1)).otherwise(F.lit(0)).alias("significant"),
    )


_TICKS_ORACLE = """
WITH g AS (
  SELECT i.i AS instrument, s.s AS seq,
         100.0 + i.i / 2.0 + ((s.s * 9973) % 1000) / 100.0 AS px
  FROM (SELECT UNNEST(range(8)) AS i) i
  CROSS JOIN (SELECT UNNEST(range(500)) AS s) s
)
SELECT CAST(instrument AS INT) AS instrument,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       ROUND(AVG(px), 6) AS avg_px,
       ROUND(MIN(px), 6) AS min_px,
       ROUND(MAX(px), 6) AS max_px
FROM g GROUP BY instrument
"""


@register("s11_python_datasource", oracle=_TICKS_ORACLE, tags=("source", "coverage"))
def s11_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource end-to-end (Spark 4
    ``pyspark.sql.datasource``): the ``ticks`` format generates a
    deterministic synthetic feed with ONE InputPartition per
    instrument — the planner runs 8 parallel read tasks here, 1000 on
    a 1000-instrument feed — then a per-instrument aggregate. The
    arithmetic feed is regenerated row-for-row by the DuckDB oracle
    from ``range()``, so the source's partitioning, schema, and value
    path are all hash-checked. See ``sources/ticksource.py`` for the
    by-value-pickled source classes (works on executors without the
    package on PYTHONPATH)."""
    from commodity_price_forecasting_spark.sources.ticksource import (
        register_tick_source,
    )

    register_tick_source(spark)
    t = (
        spark.read.format("ticks")
        .option("instruments", "8")
        .option("rows", "500")
        .load()
    )
    return t.groupBy("instrument").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.round(F.avg("px"), 6).alias("avg_px"),
        F.round(F.min("px"), 6).alias("min_px"),
        F.round(F.max("px"), 6).alias("max_px"),
    )


_SQLUDF_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), r AS (
  SELECT instrument,
         px / LAG(px) OVER (PARTITION BY instrument ORDER BY day) - 1 AS ret
  FROM daily
)
SELECT instrument,
       CAST(COUNT(ret) AS BIGINT) AS n,
       ROUND(AVG(LEAST(GREATEST(ret, -0.05), 0.05)), 6) + 0 AS mean_clipped,
       CAST(SUM(CASE WHEN ret < -0.05 OR ret > 0.05 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped
FROM r WHERE ret IS NOT NULL GROUP BY instrument
"""


@register("sql_scalar_udf_clip", oracle=_SQLUDF_ORACLE, tags=("sql", "coverage"))
def sql_scalar_udf_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF surface (Spark 4 ``CREATE FUNCTION ... RETURN
    expr``): a ``clip(x, lo, hi)`` function DEFINED IN SQL — not a
    Python UDF — applied to winsorize daily returns per instrument.
    SQL UDFs inline into the plan at analysis time (Catalyst sees
    LEAST/GREATEST, not a black box), so pushdown/codegen survive —
    THE reason to prefer them over Python UDFs for scalar rules at
    100 TB; the oracle states the same expression inline."""
    from commodity_price_forecasting_spark.plans.e1_pipeline import daily_bars
    from pyspark.sql import Window as W

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION clip(x DOUBLE, lo DOUBLE, "
        "hi DOUBLE) RETURNS DOUBLE RETURN LEAST(GREATEST(x, lo), hi)"
    )
    daily = daily_bars(spark, sf_dir)
    w = W.partitionBy("instrument").orderBy("day")
    r = daily.withColumn(
        "ret", F.col("px") / F.lag("px").over(w) - 1
    ).filter(F.col("ret").isNotNull())
    r.createOrReplaceTempView("_clip_rets")
    return spark.sql(
        """
        SELECT instrument,
               CAST(COUNT(ret) AS BIGINT) AS n,
               ROUND(AVG(clip(ret, -0.05, 0.05)), 6) + 0 AS mean_clipped,
               CAST(SUM(CASE WHEN ret < -0.05 OR ret > 0.05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped
        FROM _clip_rets GROUP BY instrument
        """
    )


# --- isotonic calibration (exact PAV via the minimax formula) -----------

_ISO_ORACLE = """
WITH pts AS (
  SELECT CAST(FLOOR(value / 4) AS BIGINT) AS bin,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), bins AS (
  SELECT bin, COUNT(*) AS n, SUM(y) AS sy FROM pts GROUP BY bin
), pre AS (
  SELECT bin, n, sy,
         SUM(n) OVER (ORDER BY bin) AS pn,
         SUM(sy) OVER (ORDER BY bin) AS py
  FROM bins
), pairs AS (
  SELECT j.bin AS j, k.bin AS k,
         CAST(k.py - (j.py - j.sy) AS DOUBLE)
           / (k.pn - (j.pn - j.n)) AS a
  FROM pre j JOIN pre k ON j.bin <= k.bin
), inner_ AS (
  SELECT p.j, i.bin AS i, MIN(p.a) AS mn
  FROM pairs p JOIN bins i ON p.j <= i.bin AND i.bin <= p.k
  GROUP BY p.j, i.bin
), fit AS (
  SELECT i AS bin, MAX(mn) AS iso FROM inner_ GROUP BY i
)
SELECT b.bin, CAST(b.n AS BIGINT) AS n,
       ROUND(CAST(b.sy AS DOUBLE) / b.n, 6) AS raw_rate,
       ROUND(f.iso, 6) AS iso_rate
FROM bins b JOIN fit f ON f.bin = b.bin
"""


@register("m14_isotonic_calibration", oracle=_ISO_ORACLE, tags=("ml", "stats"))
def m14_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact isotonic (PAV) calibration of P(purchase | value-bin),
    computed RELATIONALLY through the minimax characterization
    f(i) = max_{j≤i} min_{k≥i} mean(y over bins j..k) — no iterative
    pool-adjacent-violators loop, so the fit is SQL-expressible and
    oracle-checkable, and `tests/test_ml.py` additionally asserts
    equality with Spark ML's distributed IsotonicRegression on the
    same weighted bins (two independent algorithms, one answer).
    Every intermediate is a ratio of INTEGER prefix sums, so both
    engines agree bit-for-bit before the single edge rounding.

    Scale shape: the corpus scan collapses to ≤26 calibration bins in
    one map-side-combinable aggregate; the j≤i≤k triple frame is
    bin-count-bounded (26³/6 rows — constant, independent of data
    volume), so at 100 TB this is one aggregate plus a broadcast-
    scale fit, the right split for any calibration curve."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.floor(F.col("value") / 4).cast("long").alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    bins = pts.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    wo = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "n",
        "sy",
        F.sum("n").over(wo).alias("pn"),
        F.sum("sy").over(wo).alias("py"),
    )
    j = pre.select(
        F.col("bin").alias("j"),
        (F.col("py") - F.col("sy")).alias("py0"),
        (F.col("pn") - F.col("n")).alias("pn0"),
    )
    k = pre.select(
        F.col("bin").alias("k"), F.col("py").alias("pyk"), F.col("pn").alias("pnk")
    )
    pairs = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("pyk") - F.col("py0")).cast("double")
            / (F.col("pnk") - F.col("pn0"))
        ).alias("a"),
    )
    i = bins.select(F.col("bin").alias("i"))
    inner = (
        pairs.join(i, (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k")))
        .groupBy("j", "i")
        .agg(F.min("a").alias("mn"))
    )
    fit = inner.groupBy("i").agg(F.max("mn").alias("iso"))
    return (
        bins.join(fit, bins["bin"] == fit["i"])
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sy").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            F.round("iso", 6).alias("iso_rate"),
        )
    )


# --- MASE: mean absolute scaled error (r5) ------------------------------

_MASE_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(28, 10))) AS DOUBLE) / COUNT(*)
           AS px
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT instrument, px,
         LAG(px, 1) OVER (PARTITION BY instrument ORDER BY day) AS l1,
         LAG(px, 2) OVER (PARTITION BY instrument ORDER BY day) AS l2
  FROM daily
)
SELECT instrument,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(ABS(2 * l1 - l2 - px) AS DECIMAL(28, 10))), 6)
            AS DOUBLE) AS sae_drift,
       CAST(ROUND(SUM(CAST(ABS(l1 - px) AS DECIMAL(28, 10))), 6)
            AS DOUBLE) AS sae_naive,
       ROUND(CAST(SUM(CAST(ABS(2 * l1 - l2 - px) AS DECIMAL(28, 10)))
                  AS DOUBLE)
             / CAST(SUM(CAST(ABS(l1 - px) AS DECIMAL(28, 10)))
                    AS DOUBLE), 6) AS mase
FROM lagged WHERE l2 IS NOT NULL
GROUP BY instrument
"""


@register("m7_mase", oracle=_MASE_ORACLE, tags=("ml", "metrics"))
def m7_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (Hyndman–Koehler 2006): the drift forecast's MAE scaled
    by the in-sample naive (lag-1) MAE — the scale-free forecast
    metric that lets instruments with different price levels share
    one leaderboard (MASE < 1 ⇔ beats naive), completing the m7
    metric family beside MAE/RMSE/SMAPE/pinball/Diebold–Mariano.
    Drift forecast 2·lag1 − lag2 vs naive lag1 on the identical
    scoring window so the ratio is well-defined per instrument; the
    error columns are 6-dp SUMS (exact decimal arithmetic end-to-end
    — midpoint-proof across engines), with n alongside for the mean. One
    window pass + one aggregate, both on the instrument partitioning."""
    # px built with a DECIMAL-sum mean (not daily_bars' double AVG):
    # the double sum's order differs per engine at the last ulp, and
    # at sf0.01 instrument 14's naive MAE lands exactly on a 6-dp
    # rounding midpoint — decimal accumulation makes px bit-identical
    # on both engines, so every downstream error term is too
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").alias("instrument"), F.to_date("ts").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("px")
    )
    w = Window.partitionBy("instrument").orderBy("day")
    lagged = daily.select(
        "instrument",
        "px",
        F.lag("px", 1).over(w).alias("l1"),
        F.lag("px", 2).over(w).alias("l2"),
    ).where(F.col("l2").isNotNull())
    drift_err = F.abs(2 * F.col("l1") - F.col("l2") - F.col("px"))
    naive_err = F.abs(F.col("l1") - F.col("px"))
    # DECIMAL sums: order-independent accumulation (sf0.01 exposed a
    # 6th-dp sum-order divergence in the plain double AVG)
    # SUMS, not means, in the value columns: the decimal sums round
    # HALF_UP identically on both engines (exact arithmetic, no
    # double anywhere), where a mean's /n division re-introduced a
    # 6-dp midpoint that Spark's BigDecimal round and DuckDB's
    # double round resolve differently (observed: instrument 14 at
    # sf0.01). n is in the output, so the mean is derivable.
    sdd = F.sum(drift_err.cast("decimal(28,10)"))
    snd = F.sum(naive_err.cast("decimal(28,10)"))
    return lagged.groupBy("instrument").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(sdd, 6).cast("double").alias("sae_drift"),
        F.round(snd, 6).cast("double").alias("sae_naive"),
        F.round(sdd.cast("double") / snd.cast("double"), 6).alias("mase"),
    )
