"""Technical-analysis signal queries over the ``events`` daily-bar
series (instrument=user_id, day=date(ts), px=daily mean value).

The reference forecasts commodity prices and derives trade signals
from engineered features (SURVEY.md §2.8 F2–F8; slides 13–14 build
rolling volatility / momentum features before modeling). This module
widens that surface with the standard desk indicators — RSI,
Bollinger bands, MACD, autocorrelation, Sharpe, cross-sectional
momentum, seasonal decomposition — each as a per-instrument window
program (no global sort; every frame partitions on the series key,
so at 100 TB each instrument's indicator computes independently
across executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.plans.e1_pipeline import (
    daily_bars,
    hourly_as_daily,
)
from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table

_DAILY = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
)
"""


# --- W13: Cutler's RSI (simple-average gains/losses) --------------------

_RSI_N = 7

_RSI_ORACLE = (
    _DAILY
    + f"""
, d AS (
  SELECT instrument, day, px,
         px - LAG(px) OVER (PARTITION BY instrument ORDER BY day) AS diff
  FROM daily
), nn AS (
  SELECT * FROM d WHERE diff IS NOT NULL
), r AS (
  SELECT instrument, day,
         AVG(CASE WHEN diff > 0 THEN diff ELSE 0 END) OVER w AS g,
         AVG(CASE WHEN diff < 0 THEN -diff ELSE 0 END) OVER w AS l,
         COUNT(*) OVER w AS cnt
  FROM nn
  WINDOW w AS (PARTITION BY instrument ORDER BY day
               ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT instrument, day,
       ROUND(CASE WHEN l = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + g / l) END, 6) AS rsi
FROM r WHERE cnt = {_RSI_N}
"""
)


@register("w13_rsi", oracle=_RSI_ORACLE, tags=("signals", "window"))
def w13_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI (7-day simple average of gains vs losses) per
    instrument — the momentum oscillator the reference's trade-signal
    rules (F7, `functions/signals.py`) would consume. One day-ordered
    window per instrument; null first-diffs are filtered before the
    frame so both engines average exactly _RSI_N real diffs."""
    w_ord = Window.partitionBy("instrument").orderBy("day")
    w_frame = w_ord.rowsBetween(-(_RSI_N - 1), 0)
    d = (
        daily_bars(spark, sf_dir)
        .withColumn("diff", F.col("px") - F.lag("px").over(w_ord))
        .filter(F.col("diff").isNotNull())
    )
    r = d.select(
        "instrument",
        "day",
        F.avg(F.when(F.col("diff") > 0, F.col("diff")).otherwise(F.lit(0.0)))
        .over(w_frame)
        .alias("g"),
        F.avg(F.when(F.col("diff") < 0, -F.col("diff")).otherwise(F.lit(0.0)))
        .over(w_frame)
        .alias("l"),
        F.count(F.lit(1)).over(w_frame).alias("cnt"),
    ).filter(F.col("cnt") == _RSI_N)
    return r.select(
        "instrument",
        "day",
        F.round(
            F.when(F.col("l") == 0, F.lit(100.0)).otherwise(
                F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + F.col("g") / F.col("l"))
            ),
            6,
        ).alias("rsi"),
    )


# --- W14: Bollinger bands + breakout classification ---------------------

_BOLL_N = 10

_BOLL_ORACLE = (
    _DAILY
    + f"""
, b AS (
  SELECT instrument, day, px,
         AVG(px) OVER w AS mid,
         STDDEV_SAMP(px) OVER w AS sd,
         COUNT(*) OVER w AS cnt
  FROM daily
  WINDOW w AS (PARTITION BY instrument ORDER BY day
               ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT instrument, day, ROUND(px, 6) AS px,
       ROUND(mid, 6) AS mid,
       ROUND(mid + 2 * sd, 6) AS upper_band,
       ROUND(mid - 2 * sd, 6) AS lower_band,
       CASE WHEN px > mid + 2 * sd THEN 'breakout_up'
            WHEN px < mid - 2 * sd THEN 'breakout_down'
            ELSE 'in_band' END AS band_signal
FROM b WHERE cnt = {_BOLL_N}
"""
)


@register("w14_bollinger", oracle=_BOLL_ORACLE, tags=("signals", "window"))
def w14_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (10-day mean ± 2·sample-stddev) with a
    CASE-rule breakout label — mean-reversion counterpart to the
    reference's threshold trade signals (F7). Only full windows are
    emitted, so band math never runs on a warm-up frame."""
    w_frame = (
        Window.partitionBy("instrument").orderBy("day").rowsBetween(-(_BOLL_N - 1), 0)
    )
    b = daily_bars(spark, sf_dir).select(
        "instrument",
        "day",
        "px",
        F.avg("px").over(w_frame).alias("mid"),
        F.stddev_samp("px").over(w_frame).alias("sd"),
        F.count(F.lit(1)).over(w_frame).alias("cnt"),
    ).filter(F.col("cnt") == _BOLL_N)
    upper = F.col("mid") + 2 * F.col("sd")
    lower = F.col("mid") - 2 * F.col("sd")
    return b.select(
        "instrument",
        "day",
        F.round("px", 6).alias("px"),
        F.round("mid", 6).alias("mid"),
        F.round(upper, 6).alias("upper_band"),
        F.round(lower, 6).alias("lower_band"),
        F.when(F.col("px") > upper, F.lit("breakout_up"))
        .when(F.col("px") < lower, F.lit("breakout_down"))
        .otherwise(F.lit("in_band"))
        .alias("band_signal"),
    )


# --- W15: MACD (EWM fast/slow + signal line) ----------------------------

_MACD_FAST, _MACD_SLOW, _MACD_SIG = 5, 10, 4
_A_FAST = 2.0 / (_MACD_FAST + 1)
_A_SLOW = 2.0 / (_MACD_SLOW + 1)
_A_SIG = 2.0 / (_MACD_SIG + 1)

# pandas ewm(adjust=True) has the closed weighted form
# s_t = Σ_i (1-α)^(t-i)·x_i / Σ_i (1-α)^(t-i); the signal line is the
# same form applied to the macd series — two O(n²)-per-series
# self-joins, exact (same precedent as the w9 EWMA oracle).
_MACD_ORACLE = (
    _DAILY
    + f"""
, d AS (
  SELECT instrument, day, px,
         ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day) AS rn
  FROM daily
), ema AS (
  SELECT a.instrument, a.day, a.rn,
         SUM(POWER(1 - {_A_FAST}, a.rn - b.rn) * b.px)
           / SUM(POWER(1 - {_A_FAST}, a.rn - b.rn)) AS ema_fast,
         SUM(POWER(1 - {_A_SLOW}, a.rn - b.rn) * b.px)
           / SUM(POWER(1 - {_A_SLOW}, a.rn - b.rn)) AS ema_slow
  FROM d a JOIN d b ON a.instrument = b.instrument AND b.rn <= a.rn
  GROUP BY a.instrument, a.day, a.rn
), macd AS (
  SELECT instrument, day, rn, ema_fast - ema_slow AS macd FROM ema
), sig AS (
  SELECT a.instrument, a.day, a.macd,
         SUM(POWER(1 - {_A_SIG}, a.rn - b.rn) * b.macd)
           / SUM(POWER(1 - {_A_SIG}, a.rn - b.rn)) AS signal_line
  FROM macd a JOIN macd b ON a.instrument = b.instrument AND b.rn <= a.rn
  GROUP BY a.instrument, a.day, a.macd
)
SELECT s.instrument, s.day, ROUND(s.macd, 6) AS macd,
       ROUND(s.signal_line, 6) AS signal_line,
       ROUND(s.macd - s.signal_line, 6) AS histogram
FROM sig s JOIN d ON d.instrument = s.instrument AND d.day = s.day
WHERE d.rn > {_MACD_SLOW}
"""
)


@register("w15_macd", oracle=_MACD_ORACLE, tags=("signals", "timeseries"))
def w15_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(5,10) with a 4-period signal line per instrument. The EWM
    recursion is not window-expressible, so each series runs as one
    Arrow batch via applyInPandas (pandas ewm(adjust=True), same
    engine as operators/timeseries.ewma_by_group) — per-instrument
    parallel, deterministic. The first ``slow``(=10) rows are
    discarded: standard MACD warm-up, and those rows' dyadic EWM
    weights put values exactly on 6dp rounding midpoints where
    engines legitimately disagree."""
    import pandas as pd

    def _per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        fast = pdf["px"].ewm(alpha=_A_FAST, adjust=True).mean()
        slow = pdf["px"].ewm(alpha=_A_SLOW, adjust=True).mean()
        macd = fast - slow
        sig = macd.ewm(alpha=_A_SIG, adjust=True).mean()
        out = pdf[["instrument", "day"]].copy()
        out["macd"] = macd
        out["signal_line"] = sig
        out["histogram"] = macd - sig
        return out.iloc[_MACD_SLOW:]

    schema = "instrument long, day date, macd double, signal_line double, histogram double"
    out = (
        daily_bars(spark, sf_dir)
        .select("instrument", "day", "px")
        .groupBy("instrument")
        .applyInPandas(_per_group, schema=schema)
    )
    return out.select(
        "instrument",
        "day",
        F.round("macd", 6).alias("macd"),
        F.round("signal_line", 6).alias("signal_line"),
        F.round("histogram", 6).alias("histogram"),
    )


# --- W16: autocorrelation function (lags 1..5) per instrument -----------

_ACF_ORACLE = (
    _DAILY
    + """
, lagged AS (
  SELECT instrument, day, px,
         LAG(px, 1) OVER w AS l1, LAG(px, 2) OVER w AS l2,
         LAG(px, 3) OVER w AS l3, LAG(px, 4) OVER w AS l4,
         LAG(px, 5) OVER w AS l5
  FROM daily WINDOW w AS (PARTITION BY instrument ORDER BY day)
)
SELECT instrument, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CORR(px, l1), 6) AS acf1, ROUND(CORR(px, l2), 6) AS acf2,
       ROUND(CORR(px, l3), 6) AS acf3, ROUND(CORR(px, l4), 6) AS acf4,
       ROUND(CORR(px, l5), 6) AS acf5
FROM lagged GROUP BY instrument HAVING COUNT(*) >= 15
"""
)


@register("w16_acf", oracle=_ACF_ORACLE, tags=("signals", "window"))
def w16_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation at lags 1–5 per instrument — the
    pre-modeling diagnostic behind the reference's AR/SARIMA order
    choice (M5, slides 21–22). Five lag columns from ONE window pass,
    then a single grouped CORR aggregate; both engines ignore
    null-lag warm-up pairs identically."""
    w = Window.partitionBy("instrument").orderBy("day")
    lagged = daily_bars(spark, sf_dir).select(
        "instrument",
        "day",
        "px",
        *[F.lag("px", k).over(w).alias(f"l{k}") for k in range(1, 6)],
    )
    return (
        lagged.groupBy("instrument")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            *[F.round(F.corr("px", f"l{k}"), 6).alias(f"acf{k}") for k in range(1, 6)],
        )
        .filter(F.col("n_days") >= 15)
    )


# --- W17: annualized Sharpe ratio on log returns ------------------------

_SHARPE_ORACLE = (
    _DAILY
    + """
, r AS (
  SELECT instrument,
         LN(px / LAG(px) OVER (PARTITION BY instrument ORDER BY day)) AS ret
  FROM daily
)
SELECT instrument, CAST(COUNT(ret) AS BIGINT) AS n_rets,
       ROUND(AVG(ret), 6) AS mean_ret,
       ROUND(STDDEV_SAMP(ret), 6) AS vol,
       ROUND(AVG(ret) / NULLIF(STDDEV_SAMP(ret), 0) * SQRT(252), 6) AS sharpe
FROM r WHERE ret IS NOT NULL
GROUP BY instrument
"""
)


@register("w17_sharpe", oracle=_SHARPE_ORACLE, tags=("signals",))
def w17_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe ratio per instrument from daily log returns
    (√252 convention) — the risk-adjusted companion to w10's max
    drawdown. One window for the return, one grouped aggregate."""
    w = Window.partitionBy("instrument").orderBy("day")
    r = (
        daily_bars(spark, sf_dir)
        .select(
            "instrument",
            F.log(F.col("px") / F.lag("px").over(w)).alias("ret"),
        )
        .filter(F.col("ret").isNotNull())
    )
    vol = F.stddev_samp("ret")
    return r.groupBy("instrument").agg(
        F.count("ret").alias("n_rets"),
        F.round(F.avg("ret"), 6).alias("mean_ret"),
        F.round(vol, 6).alias("vol"),
        F.round(F.avg("ret") / F.nullif(vol, F.lit(0.0)) * F.sqrt(F.lit(252.0)), 6).alias(
            "sharpe"
        ),
    )


# --- CS1: cross-sectional momentum ranks --------------------------------

_MOM_LAG = 5
_MOM_TOPK = 3

_MOM_ORACLE = (
    _DAILY
    + f"""
, t AS (
  SELECT instrument, day,
         px / LAG(px, {_MOM_LAG}) OVER (PARTITION BY instrument ORDER BY day) - 1
           AS trail_ret
  FROM daily
), ranked AS (
  SELECT day, instrument, ROUND(trail_ret, 6) AS trail_ret,
         ROW_NUMBER() OVER (PARTITION BY day
                            ORDER BY ROUND(trail_ret, 6) DESC, instrument ASC)
           AS mom_rank
  FROM t WHERE trail_ret IS NOT NULL
)
SELECT day, CAST(mom_rank AS BIGINT) AS mom_rank, instrument, trail_ret
FROM ranked WHERE mom_rank <= {_MOM_TOPK}
"""
)


@register("cs_momentum_rank", oracle=_MOM_ORACLE, tags=("signals", "topk"))
def cs_momentum_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional momentum: each day, rank instruments by
    trailing 5-day return and keep the top 3 — the winners leg of a
    momentum portfolio. The per-day ranking window re-partitions the
    (tiny, post-window) frame by day; ties break on the 6dp-rounded
    metric + instrument id so both engines rank identically."""
    w_series = Window.partitionBy("instrument").orderBy("day")
    t = (
        daily_bars(spark, sf_dir)
        .select(
            "instrument",
            "day",
            (F.col("px") / F.lag("px", _MOM_LAG).over(w_series) - 1).alias("trail_ret"),
        )
        .filter(F.col("trail_ret").isNotNull())
        .withColumn("trail_ret", F.round("trail_ret", 6))
    )
    w_day = Window.partitionBy("day").orderBy(F.desc("trail_ret"), F.asc("instrument"))
    return (
        t.withColumn("mom_rank", F.row_number().over(w_day).cast("long"))
        .filter(F.col("mom_rank") <= _MOM_TOPK)
        .select("day", "mom_rank", "instrument", "trail_ret")
    )


# --- SD1: classical seasonal decomposition on monthly order revenue -----

_SEASONAL_ORACLE = """
WITH monthly AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100
              + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS moy,
         SUM(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
), trend AS (
  SELECT ym, moy, rev,
         AVG(rev) OVER w AS trend, COUNT(*) OVER w AS cnt
  FROM monthly
  WINDOW w AS (ORDER BY ym ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
)
SELECT moy AS month_of_year,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(AVG(rev / trend), 6) AS seasonal_index
FROM trend WHERE cnt = 12
GROUP BY moy
"""


@register("sd_seasonal_index", oracle=_SEASONAL_ORACLE, tags=("signals", "timeseries"))
def sd_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative seasonal decomposition of monthly
    order revenue: 12-month moving-average trend, ratio-to-trend,
    then the seasonal index per month-of-year — the decomposition
    SARIMA's seasonal terms (M5) model implicitly. The unpartitioned
    trend window runs AFTER aggregation on the ~80-row monthly
    series (same post-agg-tiny-sort pattern as rollup_qty), so no
    raw-data global sort exists in the plan."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long").alias("ym"),
        F.month("o_orderdate").cast("int").alias("moy"),
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("ym").rowsBetween(-5, 6)
    trend = monthly.select(
        "ym",
        "moy",
        "rev",
        F.avg("rev").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    ).filter(F.col("cnt") == 12)
    return trend.groupBy(F.col("moy").alias("month_of_year")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.avg(F.col("rev") / F.col("trend")), 6).alias("seasonal_index"),
    )


# --- W18: trailing rolling correlation vs the market --------------------

_ROLLING_CORR_ORACLE = (
    _DAILY
    + """
, rets AS (
  SELECT instrument, day,
         LN(px / LAG(px) OVER (PARTITION BY instrument ORDER BY day)) AS r
  FROM daily
), mkt AS (
  SELECT day, AVG(r) AS rm FROM rets WHERE r IS NOT NULL GROUP BY day
), joined AS (
  SELECT re.instrument, re.day, re.r, m.rm
  FROM rets re JOIN mkt m ON re.day = m.day
  WHERE re.r IS NOT NULL
)
SELECT instrument, day,
       ROUND(covar_samp(r, rm) OVER w
             / (stddev_samp(r) OVER w * stddev_samp(rm) OVER w), 6) AS corr_10d
FROM joined
WINDOW w AS (PARTITION BY instrument ORDER BY day
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
QUALIFY count(*) OVER w = 10 AND stddev_samp(r) OVER w > 0
    AND stddev_samp(rm) OVER w > 0
"""
)


@register("w18_rolling_corr", oracle=_ROLLING_CORR_ORACLE, tags=("signals", "window"))
def w18_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-day Pearson correlation of each instrument's
    return against the equal-weight market return — the
    diversification monitor next to w12's beta. Computed as
    cov/(σ·σ) from the same window aggregates in BOTH engines
    (rather than each engine's native corr()) so the floating-point
    path is identical; degenerate zero-variance windows are
    excluded on both sides."""
    w_ord = Window.partitionBy("instrument").orderBy("day")
    rets = (
        daily_bars(spark, sf_dir)
        .select(
            "instrument",
            "day",
            F.log(F.col("px") / F.lag("px").over(w_ord)).alias("r"),
        )
        .filter(F.col("r").isNotNull())
    )
    mkt = rets.groupBy(F.col("day").alias("_d")).agg(F.avg("r").alias("rm"))
    joined = rets.join(F.broadcast(mkt), rets.day == F.col("_d")).select(
        "instrument", "day", "r", "rm"
    )
    w = w_ord.rowsBetween(-9, 0)
    return (
        joined.select(
            "instrument",
            "day",
            F.covar_samp("r", "rm").over(w).alias("_cov"),
            F.stddev_samp("r").over(w).alias("_sr"),
            F.stddev_samp("rm").over(w).alias("_sm"),
            F.count(F.lit(1)).over(w).alias("_n"),
        )
        .filter((F.col("_n") == 10) & (F.col("_sr") > 0) & (F.col("_sm") > 0))
        .select(
            "instrument",
            "day",
            F.round(F.col("_cov") / (F.col("_sr") * F.col("_sm")), 6).alias("corr_10d"),
        )
    )


_SEASONAL_DECOMP_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE)
              AS DOUBLE) AS v
  FROM orders GROUP BY 1, 2
), tr AS (
  SELECT priority, month, v,
         CASE WHEN LAG(v, 6) OVER w IS NOT NULL
                   AND LEAD(v, 6) OVER w IS NOT NULL
              THEN (SUM(v) OVER (w ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
                    + 0.5 * LAG(v, 6) OVER w + 0.5 * LEAD(v, 6) OVER w) / 12
         END AS trend
  FROM monthly WINDOW w AS (PARTITION BY priority ORDER BY month)
), detr AS (
  SELECT priority, month, v, trend, v - trend AS d,
         EXTRACT(month FROM month) AS moy
  FROM tr WHERE trend IS NOT NULL
), seas_raw AS (
  SELECT priority, moy, AVG(d) AS s_raw
  FROM detr GROUP BY 1, 2
), seas AS (
  SELECT priority, moy,
         s_raw - AVG(s_raw) OVER (PARTITION BY priority) AS s
  FROM seas_raw
)
SELECT d.priority, d.month,
       ROUND(d.trend, 4) AS trend,
       ROUND(s.s, 4) AS seasonal,
       ROUND(d.d - s.s, 4) AS residual
FROM detr d JOIN seas s ON d.priority = s.priority AND d.moy = s.moy
"""


@register("m5_seasonal_decompose", oracle=_SEASONAL_DECOMP_ORACLE, tags=("timeseries", "ml"))
def m5_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of monthly revenue per order
    priority — statsmodels ``seasonal_decompose`` re-expressed as
    windows (the diagnostic that precedes the reference's SARIMA
    fits): trend = centered MA(12) (half-weighted endpoints for the
    even period), seasonal = month-of-year mean of the detrended
    series re-centered to sum to zero, residual = the rest. Three
    window/aggregate passes, all partitioned by the series key; no
    Python anywhere."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,10)"))
        .cast("double")
        .alias("v")
    )
    w = W.partitionBy("priority").orderBy("month")
    lag6, lead6 = F.lag("v", 6).over(w), F.lead("v", 6).over(w)
    trend = F.when(
        lag6.isNotNull() & lead6.isNotNull(),
        (
            F.sum("v").over(w.rowsBetween(-5, 5)) + 0.5 * lag6 + 0.5 * lead6
        )
        / 12,
    )
    detr = (
        monthly.withColumn("trend", trend)
        .filter(F.col("trend").isNotNull())
        .withColumn("d", F.col("v") - F.col("trend"))
        .withColumn("moy", F.month("month"))
    )
    seas_raw = detr.groupBy("priority", "moy").agg(F.avg("d").alias("s_raw"))
    seas = seas_raw.withColumn(
        "s", F.col("s_raw") - F.avg("s_raw").over(W.partitionBy("priority"))
    )
    return (
        detr.join(F.broadcast(seas.select("priority", "moy", "s")), ["priority", "moy"])
        .select(
            "priority",
            "month",
            F.round("trend", 4).alias("trend"),
            F.round("s", 4).alias("seasonal"),
            F.round(F.col("d") - F.col("s"), 4).alias("residual"),
        )
    )


_HALFLIFE_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), sp AS (
  SELECT a.instrument AS leg_a, a.day, a.px - b.px AS s
  FROM daily a JOIN daily b
    ON a.instrument + 1 = b.instrument AND a.day = b.day
), pairs AS (
  SELECT leg_a, day, s,
         LAG(s) OVER (PARTITION BY leg_a ORDER BY day) AS x
  FROM sp
), reg AS (
  SELECT leg_a, COUNT(*) AS n,
         SUM(x) AS sx, SUM(s - x) AS sd,
         SUM(x*x) AS sxx, SUM(x*(s - x)) AS sxd
  FROM pairs WHERE x IS NOT NULL
  GROUP BY leg_a HAVING COUNT(*) >= 20
), lam AS (
  SELECT leg_a, n,
         (n*sxd - sx*sd) / (n*sxx - sx*sx) AS lambda
  FROM reg
)
SELECT leg_a, CAST(n AS BIGINT) AS n,
       ROUND(lambda, 6) AS lambda,
       ROUND(CASE WHEN lambda < 0 AND lambda > -1
                  THEN -ln(2) / ln(1 + lambda) END, 4) AS halflife_days
FROM lam
"""


@register("ts_halflife_meanreversion", oracle=_HALFLIFE_ORACLE, tags=("timeseries", "signals"))
def ts_halflife_meanreversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reversion half-life per adjacent-instrument spread — the
    pair-trading holding-period estimate: regress Δs_t on s_{t−1}
    (discrete Ornstein-Uhlenbeck), λ = slope, half-life =
    −ln2 / ln(1+λ) when the formula is defined (−1 < λ < 0; an
    oscillatory λ ≤ −1 makes ln(1+λ) undefined, so NULL marks both
    non-reverting and over-shooting pairs rather than fabricating a
    horizon). Closed-form simple-regression sufficient statistics —
    one lag window + one aggregate per pair, the m11_df_test algebra
    on the spread series."""
    from pyspark.sql import Window as W

    daily = daily_bars(spark, sf_dir)
    b = daily.select(
        F.col("instrument").alias("_ib"),
        F.col("day").alias("_db"),
        F.col("px").alias("_pxb"),
    )
    sp = daily.join(
        b,
        (F.col("instrument") + 1 == F.col("_ib")) & (F.col("day") == F.col("_db")),
    ).select(
        F.col("instrument").alias("leg_a"),
        "day",
        (F.col("px") - F.col("_pxb")).alias("s"),
    )
    w = W.partitionBy("leg_a").orderBy("day")
    pairs = sp.withColumn("x", F.lag("s").over(w)).filter(F.col("x").isNotNull())
    d = F.col("s") - F.col("x")
    reg = pairs.groupBy("leg_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(d).alias("sd"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * d).alias("sxd"),
    ).filter(F.col("n") >= 20)
    lam = (F.col("n") * F.col("sxd") - F.col("sx") * F.col("sd")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    out = reg.withColumn("lambda", lam)
    return out.select(
        "leg_a",
        F.col("n").cast("long").alias("n"),
        F.round("lambda", 6).alias("lambda"),
        F.round(
            F.when(
                (F.col("lambda") < 0) & (F.col("lambda") > -1),
                -F.log(F.lit(2.0)) / F.log(1 + F.col("lambda")),
            ),
            4,
        ).alias("halflife_days"),
    )


_BT_ZSCORE_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), sp AS (
  SELECT a.instrument AS leg_a, a.day, a.px - b.px AS s
  FROM daily a JOIN daily b
    ON a.instrument + 1 = b.instrument AND a.day = b.day
), z AS (
  SELECT leg_a, day, s,
         (s - AVG(s) OVER w10) / NULLIF(STDDEV_SAMP(s) OVER w10, 0) AS z,
         COUNT(*) OVER w10 AS n10,
         LEAD(s) OVER (PARTITION BY leg_a ORDER BY day) AS s_next
  FROM sp
  WINDOW w10 AS (PARTITION BY leg_a ORDER BY day
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
), pos AS (
  SELECT leg_a,
         CASE WHEN z > 1 THEN -1.0 WHEN z < -1 THEN 1.0 ELSE 0.0 END
           * (s_next - s) AS pnl,
         CASE WHEN ABS(z) > 1 THEN 1 ELSE 0 END AS in_pos
  FROM z WHERE n10 = 10 AND s_next IS NOT NULL AND z IS NOT NULL
)
SELECT leg_a,
       CAST(SUM(in_pos) AS BIGINT) AS n_position_days,
       ROUND(SUM(pnl), 6) AS total_pnl,
       ROUND(SUM(CASE WHEN in_pos = 1 AND pnl > 0 THEN 1 ELSE 0 END) * 1.0
             / NULLIF(SUM(in_pos), 0), 6) AS hit_rate
FROM pos
GROUP BY leg_a
HAVING SUM(in_pos) >= 5
"""


@register("bt_zscore_pnl", oracle=_BT_ZSCORE_ORACLE, tags=("signals", "backtest"))
def bt_zscore_pnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized mean-reversion backtest per spread pair: enter
    short (long) one unit when the 10-day z-score exceeds +1 (−1),
    mark to the NEXT day's spread move — the distributed version of
    the event-loop backtest every signals notebook hand-rolls.
    Leakage-safe by construction (position from data ≤ t, PnL from
    t→t+1), and entirely windows + one aggregate — a 1000-pair
    universe backtests in one pass, no per-pair loop."""
    from pyspark.sql import Window as W

    daily = daily_bars(spark, sf_dir)
    b = daily.select(
        F.col("instrument").alias("_ib"),
        F.col("day").alias("_db"),
        F.col("px").alias("_pxb"),
    )
    sp = daily.join(
        b,
        (F.col("instrument") + 1 == F.col("_ib")) & (F.col("day") == F.col("_db")),
    ).select(
        F.col("instrument").alias("leg_a"),
        "day",
        (F.col("px") - F.col("_pxb")).alias("s"),
    )
    wo = W.partitionBy("leg_a").orderBy("day")
    w10 = wo.rowsBetween(-9, 0)
    z = sp.select(
        "leg_a",
        "s",
        (
            (F.col("s") - F.avg("s").over(w10))
            / F.nullif(F.stddev_samp("s").over(w10), F.lit(0))
        ).alias("z"),
        F.count(F.lit(1)).over(w10).alias("n10"),
        F.lead("s").over(wo).alias("s_next"),
    ).filter(
        (F.col("n10") == 10) & F.col("s_next").isNotNull() & F.col("z").isNotNull()
    )
    pnl = (
        F.when(F.col("z") > 1, F.lit(-1.0))
        .when(F.col("z") < -1, F.lit(1.0))
        .otherwise(F.lit(0.0))
    ) * (F.col("s_next") - F.col("s"))
    in_pos = (F.abs(F.col("z")) > 1).cast("int")
    return (
        z.select("leg_a", pnl.alias("pnl"), in_pos.alias("in_pos"))
        .groupBy("leg_a")
        .agg(
            F.sum("in_pos").cast("long").alias("n_position_days"),
            F.round(F.sum("pnl"), 6).alias("total_pnl"),
            F.round(
                F.sum(
                    ((F.col("in_pos") == 1) & (F.col("pnl") > 0)).cast("int")
                )
                * 1.0
                / F.nullif(F.sum("in_pos"), F.lit(0)),
                6,
            ).alias("hit_rate"),
        )
        .filter(F.col("n_position_days") >= 5)
    )


_CUSUM_ORACLE = """
WITH daily AS (
  -- hourly bars under the daily alias (r11 ask #8): daily gave
  -- n = 20-24 obs/instrument at sf0.001, under the n >= 30 floor
  SELECT user_id AS instrument, date_trunc('hour', ts) AS day,
         AVG(value) AS px
  FROM events GROUP BY user_id, date_trunc('hour', ts)
), m AS (
  -- ordered full-frame sum for the mean (not a bare partition AVG):
  -- both engines sum the same doubles in day order -> bit-identical
  -- mu, so 6dp midpoints on s_range cannot flip (r12 gate flake)
  SELECT instrument, day, px,
         SUM(px) OVER (PARTITION BY instrument ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)
           / COUNT(*) OVER (PARTITION BY instrument ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS mu,
         COUNT(*) OVER (PARTITION BY instrument) AS n
  FROM daily
), s AS (
  SELECT instrument, day, n,
         SUM(px - mu) OVER (PARTITION BY instrument ORDER BY day) AS cusum
  FROM m
), ranked AS (
  SELECT instrument, day, n, cusum,
         MAX(cusum) OVER (PARTITION BY instrument) AS s_max,
         MIN(cusum) OVER (PARTITION BY instrument) AS s_min,
         ROW_NUMBER() OVER (PARTITION BY instrument
           ORDER BY ROUND(ABS(cusum), 6) DESC, day) AS rk
  FROM s
)
SELECT instrument, day AS cp_day, CAST(n AS BIGINT) AS n,
       ROUND(ABS(cusum), 6) AS s_max_abs,
       ROUND(s_max - s_min, 6) AS s_range
FROM ranked WHERE rk = 1
"""


@register("ts_cusum_changepoint", oracle=_CUSUM_ORACLE, tags=("timeseries", "stats"))
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point locator per instrument (Page 1954 /
    Taylor's cumulative-sum charting): Sᵢ = Σ(pxⱼ − mean), the most
    likely level-shift day is argmax |Sᵢ| (earliest day on 6dp ties),
    reported with the CUSUM range max(S)−min(S) whose magnitude a
    bootstrap would threshold (the resampling stage is a separate
    concern; the detector itself is one pass).

    Plan shape: everything is windows PARTITIONED BY instrument —
    per-series mean, cumulative sum, extrema, and the argmax
    row_number all share one hash-partitioned sort; no global sort,
    no driver loop, no second scan. Hourly grain since r12 (r11 ask
    #8: daily gave n = 24 at sf0.001, under the n >= 30 floor)."""
    daily = hourly_as_daily(spark, sf_dir)
    wall = Window.partitionBy("instrument")
    wcum = Window.partitionBy("instrument").orderBy("day")
    # ORDERED full-frame sum for the mean, not avg().over(partition):
    # an unordered partition aggregate sums in partial-merge order,
    # whose last-ulp jitter flipped a 6dp ROUND midpoint on s_range at
    # the hourly grain (sf0.01 gate flake, r12) — both engines summing
    # the SAME doubles in the SAME (day) order agree bit-for-bit, so
    # the rounding agrees no matter where midpoints fall
    wfull = wcum.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s = (
        daily.withColumn("mu", F.sum("px").over(wfull) / F.count(F.lit(1)).over(wfull))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("cusum", F.sum(F.col("px") - F.col("mu")).over(wcum))
    )
    ranked = (
        s.withColumn("s_max", F.max("cusum").over(wall))
        .withColumn("s_min", F.min("cusum").over(wall))
        .withColumn(
            "rk",
            F.row_number().over(
                wall.orderBy(F.round(F.abs("cusum"), 6).desc(), F.asc("day"))
            ),
        )
    )
    return ranked.filter(F.col("rk") == 1).select(
        "instrument",
        F.col("day").alias("cp_day"),
        F.col("n").cast("long").alias("n"),
        F.round(F.abs("cusum"), 6).alias("s_max_abs"),
        F.round(F.col("s_max") - F.col("s_min"), 6).alias("s_range"),
    )


_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), pairs AS (
  SELECT a.instrument,
         (b.px - a.px) / (b.day - a.day) AS slope
  FROM daily a JOIN daily b
    ON a.instrument = b.instrument AND a.day < b.day
)
SELECT instrument,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(quantile_cont(slope, 0.5), 6) AS ts_slope,
       ROUND(AVG(slope), 6) AS mean_pair_slope
FROM pairs GROUP BY instrument
"""


@register("ts_theilsen_trend", oracle=_THEILSEN_ORACLE, tags=("timeseries", "stats"))
def ts_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per instrument: the MEDIAN of all
    pairwise slopes (pxᵦ−pxₐ)/(dayᵦ−dayₐ) — the outlier-immune
    (29% breakdown point) alternative to the OLS slope the m11/df
    family fits; reported next to the mean pair slope for a
    skew-at-a-glance comparison.

    Plan shape: the pair join is an EQUI-join on instrument (Σ per-
    series n² pairs — bounded by series length, ~30 days here; long
    series at 100 TB take the standard samples-of-pairs estimator,
    same query over a sampled frame) followed by one exact per-group
    percentile aggregate. Day subtraction is date-diff in days on
    both engines."""
    daily = daily_bars(spark, sf_dir)
    a = daily.select(
        "instrument", F.col("day").alias("_da"), F.col("px").alias("_pa")
    )
    b = daily.select(
        F.col("instrument").alias("_ib"),
        F.col("day").alias("_db"),
        F.col("px").alias("_pb"),
    )
    pairs = a.join(
        b,
        (F.col("instrument") == F.col("_ib")) & (F.col("_da") < F.col("_db")),
    ).select(
        "instrument",
        (
            (F.col("_pb") - F.col("_pa"))
            / F.datediff(F.col("_db"), F.col("_da"))
        ).alias("slope"),
    )
    return pairs.groupBy("instrument").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile("slope", 0.5), 6).alias("ts_slope"),
        F.round(F.avg("slope"), 6).alias("mean_pair_slope"),
    )


_GRANGER_ORACLE = """
WITH bars AS (
  -- 6-hour buckets (r11 ask #8 / r12): the raw-hour equi-join between
  -- neighbour instruments is near-empty, so the legs align on a
  -- shared LOCF grid over the pair's common span instead
  SELECT user_id AS instrument,
         CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) AS slot,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), span AS (
  SELECT instrument, MIN(slot) AS lo, MAX(slot) AS hi FROM bars GROUP BY 1
), pspan AS (
  SELECT a.instrument AS leg_a,
         GREATEST(a.lo, b.lo) AS glo, LEAST(a.hi, b.hi) AS ghi
  FROM span a JOIN span b ON a.instrument + 1 = b.instrument
  WHERE LEAST(a.hi, b.hi) > GREATEST(a.lo, b.lo)
), grid AS (
  SELECT leg_a, UNNEST(range(glo, ghi + 1)) AS slot FROM pspan
), filled AS (
  SELECT g.leg_a, g.slot AS day,
         LAST_VALUE(a.px IGNORE NULLS) OVER (
           PARTITION BY g.leg_a ORDER BY g.slot
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pa,
         LAST_VALUE(b.px IGNORE NULLS) OVER (
           PARTITION BY g.leg_a ORDER BY g.slot
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb
  FROM grid g
  LEFT JOIN bars a ON a.instrument = g.leg_a AND a.slot = g.slot
  LEFT JOIN bars b ON b.instrument = g.leg_a + 1 AND b.slot = g.slot
), pair AS (
  SELECT leg_a, day, pa, pb FROM filled
  WHERE pa IS NOT NULL AND pb IS NOT NULL
), lagged AS (
  SELECT leg_a, pa AS y,
         LAG(pa) OVER (PARTITION BY leg_a ORDER BY day) AS a1,
         LAG(pb) OVER (PARTITION BY leg_a ORDER BY day) AS b1
  FROM pair
), ok AS (
  SELECT leg_a, y, a1, b1 FROM lagged WHERE a1 IS NOT NULL
), mu AS (
  SELECT leg_a, y, a1, b1,
         AVG(y) OVER (PARTITION BY leg_a) AS my,
         AVG(a1) OVER (PARTITION BY leg_a) AS ma,
         AVG(b1) OVER (PARTITION BY leg_a) AS mb,
         COUNT(*) OVER (PARTITION BY leg_a) AS n
  FROM ok
), s AS (
  SELECT leg_a, MAX(n) AS n,
         SUM((a1 - ma) * (a1 - ma)) AS saa,
         SUM((b1 - mb) * (b1 - mb)) AS sbb,
         SUM((a1 - ma) * (b1 - mb)) AS sab,
         SUM((a1 - ma) * (y - my)) AS say,
         SUM((b1 - mb) * (y - my)) AS sby,
         SUM((y - my) * (y - my)) AS syy
  FROM mu GROUP BY leg_a HAVING MAX(n) >= 20
), f AS (
  SELECT leg_a, n, syy, say, saa, sby,
         (saa * sby - sab * say) / (saa * sbb - sab * sab) AS gamma,
         (sbb * say - sab * sby) / (saa * sbb - sab * sab) AS beta
  FROM s
), rss AS (
  SELECT leg_a, n, beta, gamma,
         syy - say * say / saa AS rss_r,
         syy - beta * say - gamma * sby AS rss_u
  FROM f
)
SELECT leg_a, CAST(n AS BIGINT) AS n,
       ROUND(beta, 6) AS beta_own,
       ROUND(gamma, 6) AS gamma_cross,
       ROUND((rss_r - rss_u) * (n - 3) / rss_u, 6) AS f_stat,
       (rss_r - rss_u) * (n - 3) / rss_u > 4.0 AS causal_05
FROM rss
"""


@register("ts_granger_causality", oracle=_GRANGER_ORACLE, tags=("timeseries", "stats", "signals"))
def ts_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality (lag-1) from the neighbour instrument onto
    each leg: does yesterday's b price improve today's a forecast
    beyond a's own lag — F = (RSS_restricted − RSS_unrestricted)·
    (n−3)/RSS_unrestricted for the nested OLS pair a_t ~ a_{t−1} vs
    a_t ~ a_{t−1} + b_{t−1}, both solved CLOSED-FORM from centered
    sufficient statistics (demeaning removes the intercept, so the
    unrestricted fit is one 2×2 Cramer solve — no iteration, no
    cancellation-prone raw moments). causal_05 uses the F(1, n−3)
    ≈ 4.0 critical value (a nominal flag; the F statistic itself is
    the oracle-checked surface).

    Alignment (r12, r11 ask #8): the old per-day equi-join gave only
    n = 20-26 co-observed days at sf0.001 (under the n ≥ 30 floor),
    and neighbour instruments rarely share a raw HOUR at all (2-11
    shared hourly bars — a vacuity trap the r12 grain audit caught).
    Cross-series econometrics on irregularly-observed data aligns on
    a shared grid with last-observation-carried-forward, so both legs
    sample at 6-HOUR slots over the PAIR's common observed span, each
    side forward-filled (the W1 ffill device). n becomes the
    common-span slot count (~90-115 at sf0.001, growing with the
    span). Stated plainly: LOCF repeats flatten variance on sparse
    stretches, so the nominal F df is optimistic there — the flag is
    nominal, the statistic is the surface.

    Plan shape: one 6h-bucket aggregate, per-pair span intersection
    (|instruments| rows), sequence-explode grid, two LOCF windows,
    one lag window, then the same closed-form sufficient-statistics
    aggregate — the m11/halflife regression lane with one extra
    regressor."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("user_id").alias("instrument"),
        F.floor(F.unix_timestamp("ts") / 21600).alias("slot"),
    ).agg(F.avg("value").alias("px"))
    span = bars.groupBy("instrument").agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    sb = span.select(
        (F.col("instrument") - 1).alias("leg_a"),
        F.col("lo").alias("_lob"),
        F.col("hi").alias("_hib"),
    )
    pspan = (
        span.select(F.col("instrument").alias("leg_a"), "lo", "hi")
        .join(sb, "leg_a")
        .select(
            "leg_a",
            F.greatest("lo", "_lob").alias("glo"),
            F.least("hi", "_hib").alias("ghi"),
        )
        .filter(F.col("ghi") > F.col("glo"))
    )
    grid = pspan.select(
        "leg_a", F.explode(F.sequence("glo", "ghi")).alias("slot")
    )
    ba = bars.select(
        F.col("instrument").alias("leg_a"), "slot", F.col("px").alias("_pa")
    )
    bb = bars.select(
        (F.col("instrument") - 1).alias("leg_a"),
        "slot",
        F.col("px").alias("_pb"),
    )
    wf = (
        Window.partitionBy("leg_a")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pair = (
        grid.join(ba, ["leg_a", "slot"], "left")
        .join(bb, ["leg_a", "slot"], "left")
        .select(
            "leg_a",
            F.col("slot").alias("day"),
            F.last("_pa", ignorenulls=True).over(wf).alias("pa"),
            F.last("_pb", ignorenulls=True).over(wf).alias("pb"),
        )
        .filter(F.col("pa").isNotNull() & F.col("pb").isNotNull())
    )
    w = Window.partitionBy("leg_a").orderBy("day")
    lagged = (
        pair.withColumn("a1", F.lag("pa").over(w))
        .withColumn("b1", F.lag("pb").over(w))
        .filter(F.col("a1").isNotNull())
        .select("leg_a", F.col("pa").alias("y"), "a1", "b1")
    )
    wg = Window.partitionBy("leg_a")
    mu = (
        lagged.withColumn("my", F.avg("y").over(wg))
        .withColumn("ma", F.avg("a1").over(wg))
        .withColumn("mb", F.avg("b1").over(wg))
    )
    ca, cb, cy = (
        F.col("a1") - F.col("ma"),
        F.col("b1") - F.col("mb"),
        F.col("y") - F.col("my"),
    )
    s = (
        mu.groupBy("leg_a")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(ca * ca).alias("saa"),
            F.sum(cb * cb).alias("sbb"),
            F.sum(ca * cb).alias("sab"),
            F.sum(ca * cy).alias("say"),
            F.sum(cb * cy).alias("sby"),
            F.sum(cy * cy).alias("syy"),
        )
        .filter(F.col("n") >= 20)
    )
    det = F.col("saa") * F.col("sbb") - F.col("sab") * F.col("sab")
    gamma = (F.col("saa") * F.col("sby") - F.col("sab") * F.col("say")) / det
    beta = (F.col("sbb") * F.col("say") - F.col("sab") * F.col("sby")) / det
    rss_r = F.col("syy") - F.col("say") * F.col("say") / F.col("saa")
    rss_u = F.col("syy") - beta * F.col("say") - gamma * F.col("sby")
    fstat = (rss_r - rss_u) * (F.col("n") - 3) / rss_u
    return s.select(
        "leg_a",
        F.col("n").cast("long").alias("n"),
        F.round(beta, 6).alias("beta_own"),
        F.round(gamma, 6).alias("gamma_cross"),
        F.round(fstat, 6).alias("f_stat"),
        (fstat > 4.0).alias("causal_05"),
    )


_VAR_ES_ORACLE = """
WITH daily AS (
  -- hourly bars under the daily alias (r11 ask #8): daily gave
  -- n = 20-24 obs/instrument at sf0.001, under the n >= 30 floor
  SELECT user_id AS instrument, date_trunc('hour', ts) AS day,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), r AS (
  SELECT instrument,
         px / LAG(px) OVER (PARTITION BY instrument ORDER BY day) - 1
           AS ret
  FROM daily
), ok AS (
  SELECT instrument, ret FROM r WHERE ret IS NOT NULL
), v AS (
  SELECT instrument, COUNT(*) AS n,
         quantile_cont(ret, 0.05) AS var95
  FROM ok GROUP BY instrument
), es AS (
  SELECT o.instrument,
         AVG(o.ret) AS es95,
         COUNT(*) AS n_viol
  FROM ok o JOIN v ON v.instrument = o.instrument
  WHERE o.ret <= v.var95
  GROUP BY o.instrument
)
SELECT v.instrument, CAST(v.n AS BIGINT) AS n,
       ROUND(v.var95, 6) AS var95,
       ROUND(e.es95, 6) AS es95,
       CAST(e.n_viol AS BIGINT) AS n_viol,
       ROUND(-2 * (e.n_viol * ln(0.05 * v.n / e.n_viol)
                   + (v.n - e.n_viol)
                     * ln(0.95 * v.n / (v.n - e.n_viol))), 6) + 0.0
         AS kupiec_lr
FROM v JOIN es e ON e.instrument = v.instrument
"""


@register("w19_var_es", oracle=_VAR_ES_ORACLE, tags=("timeseries", "signals", "stats"))
def w19_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% Value-at-Risk, Expected Shortfall, and the
    Kupiec proportion-of-failures backtest per instrument: VaR is the
    exact 5th return percentile, ES the mean of returns at-or-below
    it, and the Kupiec LR = −2·ln(L₀/L₁) checks the realized
    violation count against the nominal 5% rate (the regulatory
    coverage test; in-sample here, so violations ≈ nominal by
    construction and LR is small — the surface is the point).

    One exact per-group percentile aggregate, then the violation
    aggregate joins the per-instrument VaR back (broadcast — the VaR
    table is |instruments| rows). Hourly grain since r12 (r11 ask #8:
    daily gave n = 24 returns — a 5% VaR estimated from ~1 violation;
    hourly gives 46-82)."""
    daily = hourly_as_daily(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    ok = (
        daily.withColumn("ret", F.col("px") / F.lag("px").over(w) - 1)
        .filter(F.col("ret").isNotNull())
        .select("instrument", "ret")
    )
    v = ok.groupBy("instrument").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("ret", 0.05).alias("var95"),
    )
    es = (
        ok.join(F.broadcast(v), "instrument")
        .filter(F.col("ret") <= F.col("var95"))
        .groupBy("instrument")
        .agg(F.avg("ret").alias("es95"), F.count(F.lit(1)).alias("n_viol"))
    )
    j = v.join(es, "instrument")
    lr = -2 * (
        F.col("n_viol") * F.log(0.05 * F.col("n") / F.col("n_viol"))
        + (F.col("n") - F.col("n_viol"))
        * F.log(0.95 * F.col("n") / (F.col("n") - F.col("n_viol")))
    )
    return j.select(
        "instrument",
        F.col("n").cast("long").alias("n"),
        F.round("var95", 6).alias("var95"),
        F.round("es95", 6).alias("es95"),
        F.col("n_viol").cast("long").alias("n_viol"),
        # + 0.0 collapses IEEE -0.0 (the covariance-oracle precedent:
        # at hourly n the LR hits exact 0 when violations == nominal)
        (F.round(lr, 6) + F.lit(0.0)).alias("kupiec_lr"),
    )


_UNDERWATER_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), m AS (
  SELECT instrument, day, px,
         MAX(px) OVER (PARTITION BY instrument ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS peak
  FROM daily
), f AS (
  SELECT instrument, day,
         CASE WHEN peak IS NOT NULL AND px < peak THEN 1 ELSE 0 END AS uw
  FROM m
), grp AS (
  SELECT instrument, day, uw,
         ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day)
           - ROW_NUMBER() OVER (PARTITION BY instrument, uw ORDER BY day)
           AS island
  FROM f
), spells AS (
  SELECT instrument, island, COUNT(*) AS len_days, MIN(day) AS spell_start
  FROM grp WHERE uw = 1 GROUP BY instrument, island
), best AS (
  SELECT instrument, len_days, spell_start,
         ROW_NUMBER() OVER (PARTITION BY instrument
                            ORDER BY len_days DESC, spell_start) AS rk,
         COUNT(*) OVER (PARTITION BY instrument) AS n_spells
  FROM spells
)
SELECT instrument, CAST(len_days AS BIGINT) AS max_underwater_days,
       spell_start AS longest_spell_start,
       CAST(n_spells AS BIGINT) AS n_spells
FROM best WHERE rk = 1
"""


@register("w20_underwater_duration", oracle=_UNDERWATER_ORACLE, tags=("timeseries", "signals"))
def w20_underwater_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest underwater spell per instrument — the DURATION half of
    drawdown risk (w10 gives depth): consecutive days below the
    prior running peak, found with the gaps-and-islands double
    row_number (rn_total − rn_within_state = island id, the same
    trick as ``sessionize_events``), then the longest island with its
    start date and the spell count.

    Three windows and one aggregate, all instrument-partitioned; the
    strictly-BEFORE peak frame (UNBOUNDED..1 PRECEDING) makes day one
    never underwater by definition."""
    daily = daily_bars(spark, sf_dir)
    wd = Window.partitionBy("instrument").orderBy("day")
    m = daily.withColumn(
        "peak",
        F.max("px").over(wd.rowsBetween(Window.unboundedPreceding, -1)),
    )
    f = m.withColumn(
        "uw",
        F.when(
            F.col("peak").isNotNull() & (F.col("px") < F.col("peak")), 1
        ).otherwise(0),
    )
    grp = f.withColumn(
        "island",
        F.row_number().over(wd)
        - F.row_number().over(
            Window.partitionBy("instrument", "uw").orderBy("day")
        ),
    )
    spells = (
        grp.filter(F.col("uw") == 1)
        .groupBy("instrument", "island")
        .agg(
            F.count(F.lit(1)).alias("len_days"),
            F.min("day").alias("spell_start"),
        )
    )
    best = spells.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("instrument").orderBy(
                F.desc("len_days"), F.asc("spell_start")
            )
        ),
    ).withColumn(
        "n_spells",
        F.count(F.lit(1)).over(Window.partitionBy("instrument")),
    )
    return best.filter(F.col("rk") == 1).select(
        "instrument",
        F.col("len_days").cast("long").alias("max_underwater_days"),
        F.col("spell_start").alias("longest_spell_start"),
        F.col("n_spells").cast("long").alias("n_spells"),
    )
