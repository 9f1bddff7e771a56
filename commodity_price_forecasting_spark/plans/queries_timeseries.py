"""Time-series operator queries (SURVEY.md §2.5 W1–W6, §2.2 P7–P8,
§2.8 F7) over the ``events`` fixture in long layout
(instrument=user_id, day=date(ts)).

Every window partitions by instrument — the scale-critical departure
from the reference's single global pandas sort (SURVEY.md §4): at
100 TB each instrument's series fills/shifts/rolls independently
across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.functions.signals import trade_signal
from commodity_price_forecasting_spark.operators.cleaning import ffill_bfill_long
from commodity_price_forecasting_spark.operators.timeseries import (
    is_monotonic_increasing,
    lag_features,
    rolling_stats,
)
from commodity_price_forecasting_spark.plans.e1_pipeline import (
    E1_ORACLE,
    daily_bars,
    hourly_as_daily,
    e1_flagship,
    imputed,
    with_gaps,
)
from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table

register("e1_spread_pipeline", oracle=E1_ORACLE, tags=("bench", "flagship"))(e1_flagship)


_DAILY_CTE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), gapped AS (
  SELECT instrument, day,
         CASE WHEN EXTRACT(day FROM day) % 7 = 0 THEN NULL ELSE px END AS px_raw
  FROM daily
)
"""


_W1_ORACLE = (
    _DAILY_CTE
    + """
SELECT instrument, day, ROUND(px_raw, 6) AS px_raw,
       ROUND(COALESCE(
         LAST_VALUE(px_raw IGNORE NULLS) OVER (
           PARTITION BY instrument ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         FIRST_VALUE(px_raw IGNORE NULLS) OVER (
           PARTITION BY instrument ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       ), 6) AS px_filled
FROM gapped
"""
)


@register("w1_ffill_bfill", oracle=_W1_ORACLE, tags=("window",))
def w1_ffill_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill + back-fill imputation per instrument — the
    reference's ``sort_values.ffill().bfill()`` (MC:57401 (cell 50))
    as per-key windows (W1)."""
    gapped = with_gaps(daily_bars(spark, sf_dir))
    return ffill_bfill_long(
        gapped,
        value_col="px_raw",
        order_cols=("day",),
        partition_cols=("instrument",),
        out_col="px_filled",
    ).select(
        "instrument",
        "day",
        F.round("px_raw", 6).alias("px_raw"),
        F.round("px_filled", 6).alias("px_filled"),
    )


_W2_ORACLE = (
    _DAILY_CTE
    + """
, lagged AS (
  SELECT instrument, day, px_raw AS px,
         CAST((instrument % 4) + 1 AS INTEGER) AS lag
  FROM gapped WHERE px_raw IS NOT NULL
)
SELECT l.instrument, l.day, ROUND(l.px, 6) AS px, l.lag, ROUND(f.px, 6) AS future_px
FROM lagged l
JOIN lagged f ON l.instrument = f.instrument AND l.day + l.lag = f.day
"""
)


@register("w2_heterogeneous_lead", oracle=_W2_ORACLE, tags=("window", "join", "bench"))
def w2_heterogeneous_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row heterogeneous lead — the reference's per-target
    ``shift(-lag)`` with lag from a mapping row (MC:59845 (cell 67),
    W2). ``lead(col, k)`` needs constant k, so the scalable form is a
    self-equi-join on ``(instrument, day + lag)``; the inner join
    reproduces the post-shift ``dropna``."""
    gapped = with_gaps(daily_bars(spark, sf_dir))
    lagged = (
        gapped.filter(F.col("px_raw").isNotNull())
        .select(
            "instrument",
            "day",
            F.col("px_raw").alias("px"),
            ((F.col("instrument") % 4) + 1).cast("int").alias("lag"),
        )
    )
    fut = lagged.select(
        F.col("instrument").alias("_fi"), F.col("day").alias("_fd"), F.col("px").alias("future_px")
    )
    return lagged.join(
        fut,
        (F.col("instrument") == F.col("_fi"))
        & (F.date_add(F.col("day"), F.col("lag")) == F.col("_fd")),
        "inner",
    ).select(
        "instrument",
        "day",
        F.round("px", 6).alias("px"),
        "lag",
        F.round("future_px", 6).alias("future_px"),
    )


_W3_ORACLE = (
    _DAILY_CTE
    + """
, steps AS (
  SELECT instrument,
         CASE WHEN LAG(day) OVER (PARTITION BY instrument ORDER BY day) IS NULL
                   OR day > LAG(day) OVER (PARTITION BY instrument ORDER BY day)
              THEN 1 ELSE 0 END AS step_ok
  FROM daily
)
SELECT instrument, CAST(MIN(step_ok) AS BOOLEAN) AS monotonic, COUNT(*) AS n_rows
FROM steps GROUP BY instrument
"""
)


@register("w3_monotonic_check", oracle=_W3_ORACLE, tags=("window", "invariant"))
def w3_monotonic_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict time-monotonicity invariant per instrument — the
    reference's ``is_monotonic_increasing`` check (MC:57552
    (cell 58), W3), one of its four standing data invariants."""
    daily = daily_bars(spark, sf_dir).select("instrument", "day")
    return is_monotonic_increasing(daily, "day", partition_cols=("instrument",))


_W5_ORACLE = (
    _DAILY_CTE
    + """
SELECT instrument, day, ROUND(px, 6) AS px,
       ROUND(LAG(px, 1) OVER w, 6) AS px_lag1,
       ROUND(LAG(px, 2) OVER w, 6) AS px_lag2,
       ROUND(LAG(px, 3) OVER w, 6) AS px_lag3
FROM daily
WINDOW w AS (PARTITION BY instrument ORDER BY day)
"""
)


@register("w5_lag_features", oracle=_W5_ORACLE, tags=("window", "features"))
def w5_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe lag-feature engineering (README.md:31, W5): k
    trailing values per instrument as feature columns — one window
    spec shared by all three lags, single shuffle on instrument."""
    daily = daily_bars(spark, sf_dir)
    out = lag_features(
        daily, "px", order_cols=("day",), partition_cols=("instrument",), lags=(1, 2, 3)
    )
    return out.select(
        "instrument",
        "day",
        F.round("px", 6).alias("px"),
        *[F.round(f"px_lag{k}", 6).alias(f"px_lag{k}") for k in (1, 2, 3)],
    )


_W6_ORACLE = (
    _DAILY_CTE
    + """
SELECT instrument, day, ROUND(px, 6) AS px,
       ROUND(AVG(px) OVER w, 6)         AS roll_avg,
       ROUND(STDDEV_SAMP(px) OVER w, 6) AS roll_std,
       ROUND(MIN(px) OVER w, 6)         AS roll_min,
       ROUND(MAX(px) OVER w, 6)         AS roll_max
FROM daily
WINDOW w AS (PARTITION BY instrument ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""
)


@register("w6_rolling_stats", oracle=_W6_ORACLE, tags=("window", "features"))
def w6_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day mean/volatility per instrument (Presentation
    slide 13, W6) — frame-bounded windows, map-side per key."""
    daily = daily_bars(spark, sf_dir)
    out = rolling_stats(
        daily, "px", order_cols=("day",), partition_cols=("instrument",), window_rows=7
    )
    return out.select(
        "instrument",
        "day",
        F.round("px", 6).alias("px"),
        F.round("roll_avg", 6).alias("roll_avg"),
        F.round("roll_std", 6).alias("roll_std"),
        F.round("roll_min", 6).alias("roll_min"),
        F.round("roll_max", 6).alias("roll_max"),
    )


_P7_ORACLE = (
    _DAILY_CTE
    + """
SELECT instrument, day, ROUND(px, 6) AS px FROM (
  SELECT instrument, day, px,
         ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day DESC) AS rn
  FROM daily) t
WHERE rn <= 5
"""
)


@register("p7_tail_slice", oracle=_P7_ORACLE, tags=("window",))
def p7_tail_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-5-days history slice per instrument (app.py:481-491, P7)
    — rank-descending row_number, not a global sort."""
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy(F.desc("day"))
    return (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("instrument", "day", F.round("px", 6).alias("px"))
    )


_P8_ORACLE = (
    _DAILY_CTE
    + """
SELECT instrument, day AS last_day, ROUND(px, 6) AS last_px FROM (
  SELECT instrument, day, px,
         ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day DESC) AS rn
  FROM daily) t
WHERE rn = 1
"""
)


@register("p8_last_value", oracle=_P8_ORACLE, tags=("window",))
def p8_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-instrument latest price — the reference's
    ``df[f].iloc[-1]`` default-input lookup (app.py:242, P8)."""
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy(F.desc("day"))
    return (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "instrument",
            F.col("day").alias("last_day"),
            F.round("px", 6).alias("last_px"),
        )
    )


_F7_ORACLE = (
    _DAILY_CTE
    + """
, pred AS (
  SELECT instrument,
         ROUND(AVG(px) FILTER (WHERE EXTRACT(day FROM day) > 15)
               - AVG(px) FILTER (WHERE EXTRACT(day FROM day) <= 15), 6) AS pred,
         ROUND(1.0 / (1 + instrument % 10), 6) AS r2
  FROM daily GROUP BY instrument
)
SELECT instrument, pred, r2,
       CASE WHEN ABS(pred) < 0.3 OR r2 < 0.2 THEN 'WAIT'
            WHEN pred > 0 THEN 'BUY_A_SELL_B'
            ELSE 'SELL_A_BUY_B' END AS signal,
       CASE WHEN r2 >= 0.7 THEN 'High'
            WHEN r2 >= 0.4 THEN 'Medium'
            ELSE 'Low' END AS confidence,
       ROUND(LEAST(ABS(pred) / 0.3, 1.0), 6) AS strength
FROM pred
"""
)


@register("f7_trade_signals", oracle=_F7_ORACLE, tags=("scalar", "serving"))
def f7_trade_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deployed signal rule-set (app.py:150-189, F7/F8) as pure
    CASE expressions over a synthetic month-over-month prediction:
    WAIT/BUY/SELL + High/Medium/Low confidence + capped strength.
    Catalyst-visible end to end — no Python UDF."""
    daily = daily_bars(spark, sf_dir)
    pred_df = daily.groupBy("instrument").agg(
        F.round(
            F.avg(F.when(F.dayofmonth("day") > 15, F.col("px")))
            - F.avg(F.when(F.dayofmonth("day") <= 15, F.col("px"))),
            6,
        ).alias("pred"),
    ).withColumn("r2", F.round(F.lit(1.0) / (1 + F.col("instrument") % 10), 6))
    sig = trade_signal(F.col("pred"), F.col("r2"), threshold=0.3, min_confidence=0.2)
    return pred_df.select(
        "instrument",
        "pred",
        "r2",
        sig["signal"].alias("signal"),
        sig["confidence"].alias("confidence"),
        sig["strength"].alias("strength"),
    )


_ASOF_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), purchases AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS day, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       ROUND(d.px, 6) AS asof_px
FROM purchases p
ASOF JOIN daily d
  ON p.user_id = d.instrument AND p.day >= d.day
"""


@register("ts_asof_join", oracle=_ASOF_ORACLE, tags=("timeseries", "join", "bench"))
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (trades-to-quotes): each purchase event gets the
    most recent daily bar px of its user at or before the event's
    day — operators/timeseries.asof_join (union + one partitioned
    window pass, single shuffle), checked against DuckDB's native
    ASOF JOIN. Inner-ASOF semantics: rows with no earlier bar drop."""
    from commodity_price_forecasting_spark.operators.timeseries import asof_join
    from commodity_price_forecasting_spark.plans.e1_pipeline import daily_bars

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = daily_bars(spark, sf_dir).withColumnRenamed("instrument", "user_id")
    joined = asof_join(purchases, daily, "user_id", "day", "px", out_col="asof_px")
    return joined.filter(F.col("asof_px").isNotNull()).select(
        "event_id", "user_id", F.round("asof_px", 6).alias("asof_px")
    )


_ASOF_TOL_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), purchases AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS day, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       ROUND(d.px, 6) AS asof_px
FROM purchases p
ASOF JOIN daily d
  ON p.user_id = d.instrument AND p.day >= d.day
WHERE p.day - d.day <= 3
"""


@register("ts_asof_tolerance", oracle=_ASOF_TOL_ORACLE, tags=("timeseries", "join"))
def ts_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with a 3-day staleness tolerance (pandas
    ``merge_asof(tolerance=...)``): a purchase whose latest daily bar
    is older than 3 days gets NO price instead of a stale one — the
    risk-control variant of ``ts_asof_join``. Same single-shuffle
    union+window operator; the tolerance is one carried-time column
    comparison, and a too-stale latest match implies no
    within-tolerance match exists (the matches are a suffix of the
    backward scan), so the filter IS the tolerance semantics."""
    from commodity_price_forecasting_spark.operators.timeseries import asof_join
    from commodity_price_forecasting_spark.plans.e1_pipeline import daily_bars

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = daily_bars(spark, sf_dir).withColumnRenamed("instrument", "user_id")
    joined = asof_join(
        purchases,
        daily,
        "user_id",
        "day",
        "px",
        out_col="asof_px",
        tolerance_days=3,
    )
    return joined.filter(F.col("asof_px").isNotNull()).select(
        "event_id", "user_id", F.round("asof_px", 6).alias("asof_px")
    )


_ASOF_FWD_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), purchases AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS day, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       ROUND(d.px, 6) AS next_px
FROM purchases p
ASOF JOIN daily d
  ON p.user_id = d.instrument AND p.day <= d.day
"""


@register("ts_asof_forward", oracle=_ASOF_FWD_ORACLE, tags=("timeseries", "join"))
def ts_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas ``merge_asof(direction=
    "forward")``): each purchase gets the NEXT daily bar at or after
    its day — the label-construction direction (future outcome
    aligned to a present event) that backward as-of must never be
    confused with. Identical union+window plan with the time order
    reversed; ties stay inclusive because right rows still sort
    before left rows at equal (reversed) timestamps."""
    from commodity_price_forecasting_spark.operators.timeseries import asof_join
    from commodity_price_forecasting_spark.plans.e1_pipeline import daily_bars

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = daily_bars(spark, sf_dir).withColumnRenamed("instrument", "user_id")
    joined = asof_join(
        purchases,
        daily,
        "user_id",
        "day",
        "px",
        out_col="next_px",
        direction="forward",
    )
    return joined.filter(F.col("next_px").isNotNull()).select(
        "event_id", "user_id", F.round("next_px", 6).alias("next_px")
    )


_INTERVAL_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sessions AS (
  SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
  FROM numbered GROUP BY 1, 2
)
SELECT s.user_id, s.s_start,
       count(*) AS n_purchases,
       ROUND(sum(e.value), 6) AS purchase_value
FROM sessions s
JOIN events e
  ON e.user_id = s.user_id
 AND e.ts >= s.s_start AND e.ts <= s.s_end
 AND e.event_type = 'purchase'
GROUP BY 1, 2
"""


@register("ts_interval_join", oracle=_INTERVAL_ORACLE, tags=("timeseries", "join"))
def ts_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join: purchases matched into their user's
    session windows. The SCALABLE form — equi-join on the key
    (hash-partitioned) with the range predicate as a post-join
    filter — never a nested-loop range join; per-user interval
    counts stay bounded so the filter is cheap."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    # Timestamp-interval arithmetic (exact to the microsecond, no
    # second-truncating casts) — the identical expression the oracle
    # runs, so boundary events land on the same side bit-for-bit.
    gap = F.col("ts") - F.lag("ts").over(w)
    numbered = ev.withColumn(
        "session_id",
        F.sum(
            F.when(gap <= F.expr("INTERVAL 30 MINUTES"), F.lit(0)).otherwise(F.lit(1))
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("_u"), F.col("ts").alias("_t"), "value"
    )
    return (
        sessions.join(
            purchases,
            (F.col("user_id") == F.col("_u"))
            & (F.col("_t") >= F.col("s_start"))
            & (F.col("_t") <= F.col("s_end")),
            "inner",
        )
        .groupBy("user_id", "s_start")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 6).alias("purchase_value"),
        )
    )


_LOG_RETURNS_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
)
SELECT instrument, day,
       ROUND(ln(px / lag(px) OVER (PARTITION BY instrument ORDER BY day)), 6)
         AS log_return
FROM daily
QUALIFY lag(px) OVER (PARTITION BY instrument ORDER BY day) IS NOT NULL
"""


@register("w7_log_returns", oracle=_LOG_RETURNS_ORACLE, tags=("timeseries", "window"))
def w7_log_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily log returns per instrument — ln(px_t / px_{t-1}), the
    reference's target unit (its labels are log returns / spread
    log-returns, MC:24008 cell 4). Partitioned lag window + ln."""
    from pyspark.sql import Window as W

    from commodity_price_forecasting_spark.plans.e1_pipeline import daily_bars

    w = W.partitionBy("instrument").orderBy("day")
    daily = daily_bars(spark, sf_dir)
    prev = F.lag("px").over(w)
    return (
        daily.withColumn("_prev", prev)
        .filter(F.col("_prev").isNotNull())
        .select(
            "instrument",
            "day",
            F.round(F.log(F.col("px") / F.col("_prev")), 6).alias("log_return"),
        )
    )


_ROLLING_CORR_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events WHERE user_id IN (1, 2) GROUP BY 1, 2
), paired AS (
  SELECT a.day, a.px AS px_a, b.px AS px_b
  FROM daily a JOIN daily b ON a.day = b.day
  WHERE a.instrument = 1 AND b.instrument = 2
)
SELECT day,
       ROUND(corr(px_a, px_b) OVER (
         ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6)
         AS rolling_corr_10d,
       count(*) OVER (
         ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS n_obs
FROM paired
"""


@register("w8_rolling_corr", oracle=_ROLLING_CORR_ORACLE, tags=("timeseries", "window"))
def w8_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-day rolling Pearson correlation between two instruments'
    prices — the cross-asset co-movement monitor behind spread
    selection (A7's rolling form). corr as a frame-bounded window
    aggregate; per-pair windows partition naturally when run over the
    full pair universe."""
    from pyspark.sql import Window as W

    from commodity_price_forecasting_spark.plans.e1_pipeline import daily_bars

    daily = daily_bars(spark, sf_dir).filter(F.col("instrument").isin(1, 2))
    a = daily.filter(F.col("instrument") == 1).select("day", F.col("px").alias("px_a"))
    b = daily.filter(F.col("instrument") == 2).select(
        F.col("day").alias("_d"), F.col("px").alias("px_b")
    )
    paired = a.join(b, F.col("day") == F.col("_d"), "inner")
    w = W.orderBy("day").rowsBetween(-9, 0)
    return paired.select(
        "day",
        F.round(F.corr("px_a", "px_b").over(w), 6).alias("rolling_corr_10d"),
        F.count(F.lit(1)).over(w).alias("n_obs"),
    )


_EWMA_ORACLE = (
    _DAILY_CTE
    + """
, ranked AS (
  SELECT instrument, day, px,
         ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day) AS rn
  FROM daily
), agg AS (
  SELECT a.instrument, a.day, a.px, a.rn,
         SUM(POWER(0.8, a.rn - b.rn)) AS sw,
         SUM(POWER(0.8, 2 * (a.rn - b.rn))) AS sw2,
         SUM(POWER(0.8, a.rn - b.rn) * b.px) AS swx
  FROM ranked a JOIN ranked b
    ON a.instrument = b.instrument AND b.rn <= a.rn
  GROUP BY a.instrument, a.day, a.px, a.rn
), dev AS (
  SELECT m.instrument, m.day, m.px, m.rn, m.sw, m.sw2, m.swx / m.sw AS ew_mean,
         SUM(POWER(0.8, m.rn - b.rn)
             * (b.px - m.swx / m.sw) * (b.px - m.swx / m.sw)) AS swd
  FROM agg m JOIN ranked b
    ON m.instrument = b.instrument AND b.rn <= m.rn
  GROUP BY m.instrument, m.day, m.px, m.rn, m.sw, m.sw2, m.swx
)
SELECT instrument, day,
       ROUND(px, 6) AS px,
       ROUND(ew_mean, 6) AS ewma,
       CASE WHEN rn = 1 THEN NULL
            ELSE ROUND(SQRT(sw * sw / (sw * sw - sw2) * swd / sw), 6)
       END AS ew_vol
FROM dev
"""
)


@register("w9_ewma_volatility", oracle=_EWMA_ORACLE, tags=("timeseries", "window"))
def w9_ewma_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA price + exponentially weighted volatility per instrument
    (operators/timeseries.ewma_by_group, pandas ewm(adjust=True)
    semantics). Oracle: adjust=True has a closed weighted form
    (no recursion) — w_i = (1-α)^(t-i), mean = Σw·x/Σw, var debiased
    by (Σw)²/((Σw)²-Σw²) — expressible as an O(n²)-per-series
    self-join in DuckDB; exact agreement with pandas ewm is also
    tested in tests/test_edge_cases.py."""
    from commodity_price_forecasting_spark.operators.timeseries import ewma_by_group
    from commodity_price_forecasting_spark.plans.e1_pipeline import daily_bars

    out = ewma_by_group(daily_bars(spark, sf_dir), "instrument", "day", "px", alpha=0.2)
    ew_vol = F.round("ew_vol", 6)
    return out.select(
        "instrument",
        "day",
        F.round("px", 6).alias("px"),
        F.round("ewma", 6).alias("ewma"),
        # pandas emits NaN for the first observation's std; surface it
        # as SQL NULL so the result is engine-comparable
        F.when(F.isnan("ew_vol"), F.lit(None)).otherwise(ew_vol).alias("ew_vol"),
    )


# --- W10: running peak and maximum drawdown per instrument --------------

_DRAWDOWN_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), dd AS (
  SELECT instrument, day, px,
         MAX(px) OVER (PARTITION BY instrument ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak
  FROM daily
)
SELECT instrument,
       ROUND(MIN(px / peak - 1), 6) AS max_drawdown,
       COUNT(*) AS n_days
FROM dd
GROUP BY instrument
"""


@register("w10_max_drawdown", oracle=_DRAWDOWN_ORACLE, tags=("window", "timeseries"))
def w10_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per instrument: running peak (cumulative max
    over the per-instrument time window) then the worst px/peak - 1 —
    the risk metric every commodity desk tracks next to volatility.
    Window is partitioned per instrument (no global sort); one
    follow-up aggregate on the same key, so the window's shuffle is
    reused."""
    daily = daily_bars(spark, sf_dir)
    w = (
        Window.partitionBy("instrument")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.select(
        "instrument", "px", F.max("px").over(w).alias("peak")
    )
    return dd.groupBy("instrument").agg(
        F.round(F.min(F.col("px") / F.col("peak") - 1), 6).alias("max_drawdown"),
        F.count(F.lit(1)).alias("n_days"),
    )


# --- W11: per-instrument z-score normalization --------------------------

_ZSCORE_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT instrument, AVG(px) AS mu, STDDEV_SAMP(px) AS sd, COUNT(*) AS n
  FROM daily GROUP BY instrument
)
SELECT d.instrument, d.day,
       ROUND((d.px - s.mu) / s.sd, 6) AS z
FROM daily d JOIN stats s ON d.instrument = s.instrument
WHERE s.n >= 2 AND s.sd > 0
"""


@register("w11_zscore_normalize", oracle=_ZSCORE_ORACLE, tags=("window", "timeseries"))
def w11_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-score normalization (the distributed form of
    StandardScaler per group, M10/W family): group stats joined back
    to the series. Expressed as an aggregate + same-key join rather
    than two whole-partition window passes — the agg output is
    |instruments| rows (broadcastable at any scale), and the join
    reuses the daily frame's hash partitioning."""
    daily = daily_bars(spark, sf_dir)
    stats = daily.groupBy(F.col("instrument").alias("_i")).agg(
        F.avg("px").alias("mu"),
        F.stddev_samp("px").alias("sd"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        daily.join(F.broadcast(stats), daily.instrument == F.col("_i"))
        .filter((F.col("n") >= 2) & (F.col("sd") > 0))
        .select(
            "instrument",
            "day",
            F.round((F.col("px") - F.col("mu")) / F.col("sd"), 6).alias("z"),
        )
    )


# --- T5: calendar resampling to weekly OHLC bars ------------------------

_OHLC_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
)
SELECT instrument,
       CAST(date_trunc('week', day) AS TIMESTAMP) AS week,
       ROUND(arg_min(px, day), 6) AS open,
       ROUND(MAX(px), 6) AS high,
       ROUND(MIN(px), 6) AS low,
       ROUND(arg_max(px, day), 6) AS close,
       COUNT(*) AS n_days
FROM daily
GROUP BY 1, 2
"""


@register("ts_resample_ohlc", oracle=_OHLC_ORACLE, tags=("timeseries", "agg"))
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar resampling daily → weekly OHLC bars (open = first px
    of the week, close = last, high/low = extrema) — pandas
    ``resample('W').ohlc()`` re-expressed as ONE hash aggregate with
    ``min_by``/``max_by`` ordered selectors: no window, no sort, one
    shuffle on (instrument, week). The group-by key count is
    |instruments|·|weeks|, so partial aggregation collapses almost
    everything map-side."""
    daily = daily_bars(spark, sf_dir)
    return daily.groupBy(
        "instrument", F.date_trunc("week", "day").alias("week")
    ).agg(
        F.round(F.min_by("px", "day"), 6).alias("open"),
        F.round(F.max("px"), 6).alias("high"),
        F.round(F.min("px"), 6).alias("low"),
        F.round(F.max_by("px", "day"), 6).alias("close"),
        F.count(F.lit(1)).alias("n_days"),
    )


# --- W12: rolling market beta per instrument ----------------------------

_ROLLING_BETA_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), rets AS (
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
       ROUND(covar_samp(r, rm) OVER w / var_samp(rm) OVER w, 6) AS beta_10d
FROM joined
WINDOW w AS (PARTITION BY instrument ORDER BY day
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
QUALIFY count(*) OVER w = 10
"""


@register("w12_rolling_beta", oracle=_ROLLING_BETA_ORACLE, tags=("timeseries", "window"))
def w12_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-day market beta per instrument: cov(rᵢ, r_m)/var(r_m)
    over a per-instrument window, with the market return (equal-weight
    cross-instrument mean) joined back as a broadcast of |days| rows.
    Emitted only for full windows so the statistic is well-defined."""
    from pyspark.sql import Window as W

    daily = daily_bars(spark, sf_dir)
    wo = W.partitionBy("instrument").orderBy("day")
    rets = daily.select(
        "instrument", "day", F.log(F.col("px") / F.lag("px").over(wo)).alias("r")
    ).filter(F.col("r").isNotNull())
    mkt = rets.groupBy(F.col("day").alias("_d")).agg(F.avg("r").alias("rm"))
    joined = rets.join(F.broadcast(mkt), rets.day == F.col("_d")).select(
        "instrument", "day", "r", "rm"
    )
    w = wo.rowsBetween(-9, 0)
    return (
        joined.select(
            "instrument",
            "day",
            (F.covar_samp("r", "rm").over(w) / F.var_samp("rm").over(w)).alias("_b"),
            F.count(F.lit(1)).over(w).alias("_n"),
        )
        .filter(F.col("_n") == 10)
        .select("instrument", "day", F.round("_b", 6).alias("beta_10d"))
    )


_W16_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), gapped AS (
  SELECT instrument, day, px FROM daily
  WHERE EXTRACT(day FROM day) % 5 <> 0
)
SELECT instrument, day,
       ROUND(AVG(px) OVER (
         PARTITION BY instrument ORDER BY day
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ), 6) AS avg_7cal_days,
       CAST(COUNT(*) OVER (
         PARTITION BY instrument ORDER BY day
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_in_window
FROM gapped
"""


@register("w16_range_frame_7d", oracle=_W16_ORACLE, tags=("timeseries", "window"))
def w16_range_frame_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame over an IRREGULAR series: trailing
    7-calendar-day average where the frame is defined by the time
    AXIS, not row count — on a gappy series (every 5th calendar day
    dropped here to force gaps) ROWS BETWEEN 6 PRECEDING would
    silently reach back further than a week; RANGE frames stay
    correct. Spark expresses the interval frame as epoch-day
    ``rangeBetween`` on the ordered day number — identical semantics
    to the oracle's ``RANGE BETWEEN INTERVAL 6 DAY PRECEDING``; the
    per-frame row count is emitted so the gap handling itself is
    hash-checked. Same shuffle shape as any partitioned window."""
    from pyspark.sql import Window as W

    daily = daily_bars(spark, sf_dir).filter(
        F.dayofmonth("day") % 5 != 0
    )
    d = daily.withColumn("_dn", F.datediff("day", F.lit("1970-01-01")))
    w = (
        W.partitionBy("instrument")
        .orderBy("_dn")
        .rangeBetween(-6, 0)
    )
    return d.select(
        "instrument",
        "day",
        F.round(F.avg("px").over(w), 6).alias("avg_7cal_days"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_window"),
    )


_TWAP_ORACLE = """
WITH ticks AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, ts, value,
         LEAD(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                        ORDER BY ts, event_id) AS nxt
  FROM events
), weighted AS (
  SELECT instrument, day, value,
         date_diff('microsecond', ts, nxt) AS dt_us
  FROM ticks WHERE nxt IS NOT NULL
)
SELECT instrument, day,
       ROUND(SUM(value * dt_us) / SUM(dt_us), 6) AS twap,
       COUNT(*) AS n_intervals
FROM weighted
GROUP BY 1, 2
HAVING SUM(dt_us) > 0
"""


@register("ts_twap_daily", oracle=_TWAP_ORACLE, tags=("timeseries", "window", "agg"))
def ts_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (instrument, day): each tick's
    value is weighted by how long it REMAINED the latest observation
    (microseconds to the next tick that day) — the standard TWAP
    execution benchmark, which an event-count average gets wrong
    whenever ticks arrive unevenly. One LEAD window partitioned by
    (instrument, day) + one aggregate on the same key: the window's
    partitioning is reused by the groupBy, so Catalyst plans a single
    shuffle. Deterministic tie-break on (ts, event_id)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("instrument"),
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    w = W.partitionBy("instrument", "day").orderBy("ts", "event_id")
    ticks = ev.withColumn("nxt", F.lead("ts").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    dt_us = F.unix_micros("nxt") - F.unix_micros("ts")
    return (
        ticks.select("instrument", "day", "value", dt_us.alias("dt_us"))
        .groupBy("instrument", "day")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
            ).alias("twap"),
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt_us").alias("_total_us"),
        )
        .filter(F.col("_total_us") > 0)
        .drop("_total_us")
    )


_XCORR_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.instrument AS leg_a, b.instrument AS leg_b
  FROM (SELECT DISTINCT instrument FROM daily) a
  JOIN (SELECT DISTINCT instrument FROM daily) b
    ON a.instrument + 1 = b.instrument
), lags(k) AS (SELECT UNNEST([-2, -1, 0, 1, 2]))
SELECT p.leg_a, p.leg_b, l.k,
       ROUND(corr(da.px, db.px), 6) AS xcorr,
       COUNT(*) AS n_days
FROM pairs p
CROSS JOIN lags l
JOIN daily da ON da.instrument = p.leg_a
JOIN daily db ON db.instrument = p.leg_b AND db.day = da.day + l.k
GROUP BY 1, 2, 3
HAVING COUNT(*) >= 10
"""


@register("ts_leadlag_xcorr", oracle=_XCORR_ORACLE, tags=("timeseries", "join", "agg"))
def ts_leadlag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation for each adjacent-instrument pair:
    corr(a_t, b_{t+k}) for k ∈ {−2..2} — the signal-discovery scan
    behind spread trading (which leg LEADS?). The lag axis is an
    explode over 5 constants; each (pair, k) correlation is one
    equi-join on (leg_b, day + k) — hash-partitioned, no window, no
    per-series collect; corr is Spark's built-in distributed
    ``corr`` aggregate (identical to DuckDB's)."""
    daily = daily_bars(spark, sf_dir)
    insts = daily.select("instrument").distinct()
    pairs = insts.alias("a").join(
        insts.selectExpr("instrument + 1 AS _next").alias("b"),
        F.col("a.instrument") + 1 == F.col("_next"),
    ).select(
        F.col("a.instrument").alias("leg_a"), F.col("_next").alias("leg_b")
    )
    lagged = pairs.withColumn("k", F.explode(F.array(*[F.lit(i) for i in (-2, -1, 0, 1, 2)])))
    da = daily.select(
        F.col("instrument").alias("leg_a"), F.col("day"), F.col("px").alias("px_a")
    )
    db = daily.select(
        F.col("instrument").alias("_ib"), F.col("day").alias("_db"), F.col("px").alias("px_b")
    )
    return (
        lagged.join(da, "leg_a")
        .join(
            db,
            (F.col("leg_b") == F.col("_ib"))
            & (F.expr("date_add(day, k)") == F.col("_db")),
        )
        .groupBy("leg_a", "leg_b", "k")
        .agg(
            F.round(F.corr("px_a", "px_b"), 6).alias("xcorr"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .filter(F.col("n_days") >= 10)
    )


_ACF_ORACLE = """
WITH daily AS (
  -- hourly bars under the daily alias (r11 ask #8): the daily grain
  -- gave n = 23-24 obs/instrument at sf0.001, under the n >= 30 floor
  SELECT user_id AS instrument, date_trunc('hour', ts) AS day,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT instrument, px,
         LAG(px, 1) OVER w AS l1, LAG(px, 2) OVER w AS l2,
         LAG(px, 3) OVER w AS l3, LAG(px, 4) OVER w AS l4,
         LAG(px, 5) OVER w AS l5
  FROM daily WINDOW w AS (PARTITION BY instrument ORDER BY day)
)
SELECT instrument, k.k,
       ROUND(CASE k.k WHEN 1 THEN corr(px, l1) WHEN 2 THEN corr(px, l2)
                      WHEN 3 THEN corr(px, l3) WHEN 4 THEN corr(px, l4)
                      ELSE corr(px, l5) END, 6) AS acf
FROM lagged, (SELECT UNNEST([1, 2, 3, 4, 5]) AS k) k
GROUP BY instrument, k.k
HAVING COUNT(px) >= 20
"""


@register("ts_acf", oracle=_ACF_ORACLE, tags=("timeseries", "stats"))
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1–5 per instrument — the
    Box-Jenkins order-selection diagnostic behind the reference's
    SARIMA workflow (statsmodels ACF/PACF plots, slides 21-22),
    computed as corr(px_t, px_{t−k}): one multi-lag window pass then
    five corr aggregates unpivoted on a constant lag axis. (This is
    the sample Pearson ACF — pairwise-complete, like
    ``pandas.Series.autocorr`` — not the Bartlett single-σ² variant;
    the oracle pins the same convention.)"""
    from pyspark.sql import Window as W

    daily = hourly_as_daily(spark, sf_dir)
    w = W.partitionBy("instrument").orderBy("day")
    lagged = daily.select(
        "instrument",
        "px",
        *[F.lag("px", k).over(w).alias(f"l{k}") for k in range(1, 6)],
    )
    per_lag = [
        lagged.groupBy("instrument")
        .agg(
            F.round(F.corr("px", f"l{k}"), 6).alias("acf"),
            F.count("px").alias("_n"),
        )
        .select("instrument", F.lit(k).alias("k"), "acf", "_n")
        for k in range(1, 6)
    ]
    out = per_lag[0]
    for p in per_lag[1:]:
        out = out.unionAll(p)
    return out.filter(F.col("_n") >= 20).select("instrument", "k", "acf")


_RS_ORACLE = """
WITH daily AS (
  -- hourly bars under the daily alias (r11 ask #8): the daily grain
  -- gave n = 23-24 obs/instrument at sf0.001, under the n >= 30 floor
  SELECT user_id AS instrument, date_trunc('hour', ts) AS day,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), e AS (
  -- ordered full-frame mean (not a bare partition AVG): both engines
  -- demean with a DETERMINISTIC sum order, so 6dp midpoints on
  -- rs_stat cannot flip run-to-run (the r12 cusum gate flake's class)
  SELECT instrument, day,
         px - SUM(px) OVER (PARTITION BY instrument ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
              / COUNT(*) OVER (PARTITION BY instrument) AS e
  FROM daily
), s AS (
  SELECT instrument, day, e,
         SUM(e) OVER (PARTITION BY instrument ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS sp,
         SUM(e * e) OVER (PARTITION BY instrument ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS ssq,
         COUNT(*) OVER (PARTITION BY instrument) AS n
  FROM e
)
SELECT instrument, COUNT(*) AS n,
       ROUND((MAX(sp) - MIN(sp)) / SQRT(MAX(ssq) / MAX(n)), 6) AS rs_stat
FROM s GROUP BY instrument
HAVING COUNT(*) >= 20 AND MAX(ssq) > 0
"""


@register("ts_rescaled_range", oracle=_RS_ORACLE, tags=("timeseries", "stats"))
def ts_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) statistic per instrument — the Hurst
    analysis building block (R/S ≈ c·n^H): range of the cumulative
    demeaned series over its population σ. Same partial-sum algebra
    family as the KPSS query — one demeaning window, one running-sum
    window, one aggregate; everything partition-local per series."""
    from pyspark.sql import Window as W

    daily = hourly_as_daily(spark, sf_dir)
    # ordered full-frame mean + ordered Σe² instead of avg/stddev_pop
    # over the bare partition: unordered partition aggregates sum in
    # partial-merge order, whose last-ulp jitter can flip a 6dp ROUND
    # midpoint (the r12 cusum gate flake's class) — the ordered frame
    # makes both engines' arithmetic deterministic
    wfull = (
        W.partitionBy("instrument")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    e = daily.select(
        "instrument",
        "day",
        (
            F.col("px")
            - F.sum("px").over(wfull) / F.count(F.lit(1)).over(wfull)
        ).alias("e"),
    )
    ws = W.partitionBy("instrument").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = e.withColumn("sp", F.sum("e").over(ws)).withColumn(
        "ssq", F.sum(F.col("e") * F.col("e")).over(wfull)
    )
    return (
        s.groupBy("instrument")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("sp").alias("_mx"),
            F.min("sp").alias("_mn"),
            F.max("ssq").alias("_ssq"),
        )
        .filter((F.col("n") >= 20) & (F.col("_ssq") > 0))
        .select(
            "instrument",
            "n",
            F.round(
                (F.col("_mx") - F.col("_mn"))
                / F.sqrt(F.col("_ssq") / F.col("n")),
                6,
            ).alias("rs_stat"),
        )
    )


_PACF_ORACLE = """
WITH daily AS (
  -- hourly bars under the daily alias (r11 ask #8): the daily grain
  -- gave n = 23-24 obs/instrument at sf0.001, under the n >= 30 floor
  SELECT user_id AS instrument, date_trunc('hour', ts) AS day,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), e AS (
  SELECT instrument, day, px - AVG(px) OVER (PARTITION BY instrument) AS e
  FROM daily
), l AS (
  SELECT instrument, e,
         LAG(e, 1) OVER w AS e1, LAG(e, 2) OVER w AS e2, LAG(e, 3) OVER w AS e3
  FROM e WINDOW w AS (PARTITION BY instrument ORDER BY day)
), r AS (
  SELECT instrument,
         SUM(e * e1) / SUM(e * e) AS r1,
         SUM(e * e2) / SUM(e * e) AS r2,
         SUM(e * e3) / SUM(e * e) AS r3,
         COUNT(*) AS n
  FROM l GROUP BY instrument HAVING COUNT(*) >= 20 AND SUM(e * e) > 0
), dl AS (
  SELECT instrument, n, r1, r2, r3,
         (r2 - r1 * r1) / (1 - r1 * r1) AS p22
  FROM r
)
SELECT instrument,
       ROUND(r1, 6) AS pacf1,
       ROUND(p22, 6) AS pacf2,
       ROUND((r3 - (r1 * (1 - p22)) * r2 - p22 * r1)
             / (1 - (r1 * (1 - p22)) * r1 - p22 * r2), 6) AS pacf3
FROM dl
"""


@register("ts_pacf", oracle=_PACF_ORACLE, tags=("timeseries", "stats"))
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lags 1–3 per instrument — the other
    half of Box-Jenkins order selection (ACF tails ⇒ AR order from
    where the PACF cuts off). Bartlett-convention autocorrelations
    (lag products over the series' own Σe², global demeaning) fed
    through the Durbin-Levinson recursion, which for 3 lags is
    closed-form arithmetic: φ11 = r1, φ22 = (r2−r1²)/(1−r1²),
    φ33 = (r3 − φ21 r2 − φ22 r1)/(1 − φ21 r1 − φ22 r2) with
    φ21 = r1(1−φ22). One demeaning window, one multi-lag window, one
    aggregate — everything partition-local per series. Hourly grain
    since r12 (r11 ask #8: daily gave n = 24 at sf0.001, under the
    n >= 30 floor)."""
    from pyspark.sql import Window as W

    daily = hourly_as_daily(spark, sf_dir)
    wp = W.partitionBy("instrument")
    e = daily.select(
        "instrument",
        "day",
        (F.col("px") - F.avg("px").over(wp)).alias("e"),
    )
    wo = W.partitionBy("instrument").orderBy("day")
    l = e.select(
        "instrument",
        "e",
        *[F.lag("e", k).over(wo).alias(f"e{k}") for k in (1, 2, 3)],
    )
    r = (
        l.groupBy("instrument")
        .agg(
            (F.sum(F.col("e") * F.col("e1")) / F.sum(F.col("e") * F.col("e"))).alias("r1"),
            (F.sum(F.col("e") * F.col("e2")) / F.sum(F.col("e") * F.col("e"))).alias("r2"),
            (F.sum(F.col("e") * F.col("e3")) / F.sum(F.col("e") * F.col("e"))).alias("r3"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("e") * F.col("e")).alias("_ss"),
        )
        .filter((F.col("n") >= 20) & (F.col("_ss") > 0))
    )
    p22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    dl = r.withColumn("p22", p22)
    p21 = F.col("r1") * (1 - F.col("p22"))
    return dl.select(
        "instrument",
        F.round("r1", 6).alias("pacf1"),
        F.round("p22", 6).alias("pacf2"),
        F.round(
            (F.col("r3") - p21 * F.col("r2") - F.col("p22") * F.col("r1"))
            / (1 - p21 * F.col("r1") - F.col("p22") * F.col("r2")),
            6,
        ).alias("pacf3"),
    )


_LJUNG_BOX_ORACLE = """
WITH hourly AS (
  SELECT user_id AS instrument, date_trunc('hour', ts) AS hr,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), ret AS (
  SELECT instrument, hr,
         px - LAG(px) OVER (PARTITION BY instrument ORDER BY hr) AS r
  FROM hourly
), e AS (
  SELECT instrument, hr, r - AVG(r) OVER (PARTITION BY instrument) AS e
  FROM ret WHERE r IS NOT NULL
), l AS (
  SELECT instrument, e,
         LAG(e, 1) OVER w AS e1, LAG(e, 2) OVER w AS e2,
         LAG(e, 3) OVER w AS e3, LAG(e, 4) OVER w AS e4,
         LAG(e, 5) OVER w AS e5
  FROM e WINDOW w AS (PARTITION BY instrument ORDER BY hr)
), r AS (
  SELECT instrument, COUNT(*) AS n,
         SUM(e * e1) / SUM(e * e) AS r1, SUM(e * e2) / SUM(e * e) AS r2,
         SUM(e * e3) / SUM(e * e) AS r3, SUM(e * e4) / SUM(e * e) AS r4,
         SUM(e * e5) / SUM(e * e) AS r5
  FROM l GROUP BY instrument HAVING COUNT(*) >= 30 AND SUM(e * e) > 0
)
SELECT instrument, CAST(n AS BIGINT) AS n,
       ROUND(n * (n + 2) * (r1*r1/(n-1) + r2*r2/(n-2) + r3*r3/(n-3)
                            + r4*r4/(n-4) + r5*r5/(n-5)), 6) AS lb_q,
       CAST(n * (n + 2) * (r1*r1/(n-1) + r2*r2/(n-2) + r3*r3/(n-3)
                           + r4*r4/(n-4) + r5*r5/(n-5)) > 11.0705
            AS BOOLEAN) AS reject_white_noise
FROM r
"""


@register("m11_ljung_box", oracle=_LJUNG_BOX_ORACLE, tags=("timeseries", "stats", "ml"))
def m11_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau Q at h=5 over HOURLY returns per
    instrument — the white-noise residual diagnostic of the SARIMA
    workflow (statsmodels ``acorr_ljungbox``):
    Q = n(n+2)·Σ_{k≤h} r_k²/(n−k), rejected at the χ²(5) 95%
    critical value 11.0705. Same Bartlett-autocorrelation machinery
    as ts_pacf, over first differences — all windows partition-local,
    one aggregate per series. Hourly grain (not daily) because the
    fixture's daily series never reach the statistic's n ≥ 30 floor
    at ANY SF, which left this query comparing empty sets for 8
    rounds (r10 VERDICT #1); hourly yields n ≈ 46-82 returns per
    instrument everywhere, so the Q arithmetic is actually
    exercised — value-mirrored against statsmodels in
    tests/test_stats.py."""
    from pyspark.sql import Window as W

    from commodity_price_forecasting_spark.plans.e1_pipeline import hourly_bars

    hourly = hourly_bars(spark, sf_dir)
    wo = W.partitionBy("instrument").orderBy("hr")
    ret = hourly.select(
        "instrument", "hr", (F.col("px") - F.lag("px").over(wo)).alias("r")
    ).filter(F.col("r").isNotNull())
    wp = W.partitionBy("instrument")
    e = ret.select(
        "instrument", "hr", (F.col("r") - F.avg("r").over(wp)).alias("e")
    )
    l = e.select(
        "instrument",
        "e",
        *[F.lag("e", k).over(wo.orderBy("hr")).alias(f"e{k}") for k in range(1, 6)],
    )
    ss = F.sum(F.col("e") * F.col("e"))
    agg = l.groupBy("instrument").agg(
        F.count(F.lit(1)).alias("n"),
        *[(F.sum(F.col("e") * F.col(f"e{k}")) / ss).alias(f"r{k}") for k in range(1, 6)],
        ss.alias("_ss"),
    ).filter((F.col("n") >= 30) & (F.col("_ss") > 0))
    q = (
        F.col("n")
        * (F.col("n") + 2)
        * sum(
            (F.col(f"r{k}") * F.col(f"r{k}")) / (F.col("n") - k) for k in range(1, 6)
        )
    )
    return agg.select(
        "instrument",
        F.col("n").cast("long").alias("n"),
        F.round(q, 6).alias("lb_q"),
        (q > 11.0705).alias("reject_white_noise"),
    )


_QNORM_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), r AS (
  SELECT instrument, day, px,
         ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY px, day) AS rn,
         COUNT(*) OVER (PARTITION BY instrument) AS n
  FROM daily
)
SELECT instrument, day, ROUND(px, 6) AS px,
       ROUND((rn - 1.0) / (n - 1.0), 6) AS pctl_rank
FROM r
"""


@register("ml_quantile_normalize", oracle=_QNORM_ORACLE, tags=("ml", "timeseries"))
def ml_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-instrument quantile (rank) normalization of the price
    level — the distribution-free feature transform that makes
    heavy-tailed levels comparable across instruments: each value
    maps to its within-group percentile rank (rn−1)/(n−1) ∈ [0,1],
    day as the deterministic tie-break. One partitioned sort window —
    the per-group lane; cross-corpus normalization at 100 TB uses the
    GK sketch (``sketch_quantile_approx``) as the rank source
    instead."""
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("px", "day")
    wn = Window.partitionBy("instrument")
    return daily.select(
        "instrument",
        "day",
        F.round("px", 6).alias("px"),
        F.round(
            (F.row_number().over(w) - 1.0)
            / (F.count(F.lit(1)).over(wn) - 1.0),
            6,
        ).alias("pctl_rank"),
    )


_PIECEWISE_ORACLE = """
WITH daily AS (
  -- hourly bars under the daily alias (r11 ask #8): the daily grain
  -- gave n = 23-24 obs/instrument at sf0.001, under the n >= 30 floor
  SELECT user_id AS instrument, date_trunc('hour', ts) AS day,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT instrument, day, px,
         CAST(ROW_NUMBER() OVER (PARTITION BY instrument ORDER BY day) - 1
              AS DOUBLE) AS t
  FROM daily
), cum AS (
  SELECT instrument, day, t, px,
         SUM(1.0)   OVER w AS nl,
         SUM(t)     OVER w AS sxl,
         SUM(px)    OVER w AS syl,
         SUM(t*t)   OVER w AS sxxl,
         SUM(t*px)  OVER w AS sxyl,
         SUM(px*px) OVER w AS syyl,
         SUM(1.0)   OVER p AS n,
         SUM(t)     OVER p AS sx,
         SUM(px)    OVER p AS sy,
         SUM(t*t)   OVER p AS sxx,
         SUM(t*px)  OVER p AS sxy,
         SUM(px*px) OVER p AS syy
  FROM idx
  WINDOW w AS (PARTITION BY instrument ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         p AS (PARTITION BY instrument)
), rss AS (
  SELECT instrument, day, n,
         (syyl - syl*syl/nl)
           - POWER(sxyl - sxl*syl/nl, 2) / NULLIF(sxxl - sxl*sxl/nl, 0)
           AS rss_l,
         ((syy-syyl) - (sy-syl)*(sy-syl)/(n-nl))
           - POWER((sxy-sxyl) - (sx-sxl)*(sy-syl)/(n-nl), 2)
             / NULLIF((sxx-sxxl) - (sx-sxl)*(sx-sxl)/(n-nl), 0) AS rss_r,
         (syy - sy*sy/n)
           - POWER(sxy - sx*sy/n, 2) / NULLIF(sxx - sx*sx/n, 0) AS rss_t,
         nl
  FROM cum
  WHERE nl >= 2 AND n - nl >= 2
), best AS (
  SELECT instrument, day, n, rss_t, rss_l + rss_r AS rss_split,
         ROW_NUMBER() OVER (PARTITION BY instrument
           ORDER BY ROUND(rss_l + rss_r, 6), day) AS rk
  FROM rss
)
SELECT instrument, CAST(n AS BIGINT) AS n, day AS break_day,
       ROUND(rss_t, 6) AS rss_single,
       ROUND(rss_split, 6) AS rss_split,
       ROUND(1 - rss_split / NULLIF(rss_t, 0), 6) AS improvement
FROM best WHERE rk = 1
"""


@register("ts_piecewise_trend", oracle=_PIECEWISE_ORACLE, tags=("timeseries", "stats"))
def ts_piecewise_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal 2-segment piecewise-linear trend per instrument — the
    structural-break locator (a one-knot segmented regression): for
    EVERY candidate split the left/right OLS residual sums come from
    CUMULATIVE sufficient statistics (6 prefix sums; right side =
    totals − prefix), so the whole n-candidate search is O(n) inside
    one ordered window — no per-candidate refit, no driver loop. The
    reported break minimizes the 6dp-rounded combined RSS (earliest
    day on ties), with the single-line RSS and the fractional
    improvement beside it (CUSUM locates a LEVEL shift;
    this locates a SLOPE change)."""
    daily = hourly_as_daily(spark, sf_dir)
    wd = Window.partitionBy("instrument").orderBy("day")
    idx = daily.withColumn(
        "t", (F.row_number().over(wd) - 1).cast("double")
    )
    wc = Window.partitionBy("instrument").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wp = Window.partitionBy("instrument")
    c = idx
    for name, col in [
        ("nl", F.lit(1.0)),
        ("sxl", F.col("t")),
        ("syl", F.col("px")),
        ("sxxl", F.col("t") * F.col("t")),
        ("sxyl", F.col("t") * F.col("px")),
        ("syyl", F.col("px") * F.col("px")),
    ]:
        c = c.withColumn(name, F.sum(col).over(wc))
    for name, col in [
        ("n", F.lit(1.0)),
        ("sx", F.col("t")),
        ("sy", F.col("px")),
        ("sxx", F.col("t") * F.col("t")),
        ("sxy", F.col("t") * F.col("px")),
        ("syy", F.col("px") * F.col("px")),
    ]:
        c = c.withColumn(name, F.sum(col).over(wp))

    def _rss(syy, sy, n, sxy, sx, sxx):
        return (syy - sy * sy / n) - F.pow(sxy - sx * sy / n, 2) / F.nullif(
            sxx - sx * sx / n, F.lit(0.0)
        )

    nl, nr = F.col("nl"), F.col("n") - F.col("nl")
    rss_l = _rss(
        F.col("syyl"), F.col("syl"), nl, F.col("sxyl"), F.col("sxl"), F.col("sxxl")
    )
    rss_r = _rss(
        F.col("syy") - F.col("syyl"),
        F.col("sy") - F.col("syl"),
        nr,
        F.col("sxy") - F.col("sxyl"),
        F.col("sx") - F.col("sxl"),
        F.col("sxx") - F.col("sxxl"),
    )
    rss_t = _rss(
        F.col("syy"), F.col("sy"), F.col("n"), F.col("sxy"), F.col("sx"), F.col("sxx")
    )
    rss = c.filter((nl >= 2) & (nr >= 2)).select(
        "instrument",
        "day",
        F.col("n"),
        rss_t.alias("rss_t"),
        (rss_l + rss_r).alias("rss_split"),
    )
    best = rss.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("instrument").orderBy(
                F.round("rss_split", 6), F.asc("day")
            )
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "instrument",
        F.col("n").cast("long").alias("n"),
        F.col("day").alias("break_day"),
        F.round("rss_t", 6).alias("rss_single"),
        F.round("rss_split", 6).alias("rss_split"),
        F.round(
            1 - F.col("rss_split") / F.nullif(F.col("rss_t"), F.lit(0.0)), 6
        ).alias("improvement"),
    )


_TRAINMATRIX_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
), r AS (
  SELECT instrument, day,
         px / LAG(px) OVER w - 1 AS ret
  FROM daily WINDOW w AS (PARTITION BY instrument ORDER BY day)
), f AS (
  SELECT instrument, day, ret,
         AVG(ret) OVER (PARTITION BY instrument ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS mom_3d,
         STDDEV_SAMP(ret) OVER (PARTITION BY instrument ORDER BY day
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS vol_7d,
         SUM(CASE WHEN ret > 0 THEN ret ELSE 0 END)
           OVER (PARTITION BY instrument ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS gains_7d,
         SUM(CASE WHEN ret < 0 THEN -ret ELSE 0 END)
           OVER (PARTITION BY instrument ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS losses_7d,
         COUNT(ret) OVER (PARTITION BY instrument ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_hist,
         LEAD(ret) OVER (PARTITION BY instrument ORDER BY day) AS target
  FROM r
)
SELECT instrument, day,
       ROUND(ret, 6) AS ret_1d,
       ROUND(mom_3d, 6) AS mom_3d,
       ROUND(vol_7d, 6) AS vol_7d,
       ROUND(gains_7d / NULLIF(gains_7d + losses_7d, 0), 6) AS rsi_7,
       ROUND(target, 6) AS target_next_ret
FROM f
WHERE ret IS NOT NULL AND mom_3d IS NOT NULL AND vol_7d IS NOT NULL
  AND target IS NOT NULL AND n_hist >= 7
"""


@register("e2_training_matrix", oracle=_TRAINMATRIX_ORACLE, tags=("timeseries", "ml", "bench"))
def e2_training_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe supervised training matrix — the frame the m1-m6
    model tier actually consumes, assembled in ONE multi-window pass:
    yesterday-ending feature windows (1-day return, 3-day momentum,
    7-day volatility, 7-day RSI ratio — every frame ends at ROW t−1 or
    uses information available at t's close) against the t+1 return
    target, rows kept only with a full 7-day history. The temporal
    contract IS the query: no feature frame reaches past the label
    boundary, the structural guarantee a feature store calls
    point-in-time correctness.

    All six windows share one (instrument, day) sort — Catalyst
    evaluates them in a single Window operator chain on one
    hash-partitioned sort, no joins at all."""
    daily = daily_bars(spark, sf_dir)
    w = Window.partitionBy("instrument").orderBy("day")
    r = daily.withColumn("ret", F.col("px") / F.lag("px").over(w) - 1)
    past3 = w.rowsBetween(-3, -1)
    past7 = w.rowsBetween(-7, -1)
    f = (
        r.withColumn("mom_3d", F.avg("ret").over(past3))
        .withColumn("vol_7d", F.stddev_samp("ret").over(past7))
        .withColumn(
            "gains_7d",
            F.sum(F.when(F.col("ret") > 0, F.col("ret")).otherwise(0.0)).over(
                past7
            ),
        )
        .withColumn(
            "losses_7d",
            F.sum(
                F.when(F.col("ret") < 0, -F.col("ret")).otherwise(0.0)
            ).over(past7),
        )
        .withColumn("n_hist", F.count("ret").over(past7))
        .withColumn("target", F.lead("ret").over(w))
    )
    return f.filter(
        F.col("ret").isNotNull()
        & F.col("mom_3d").isNotNull()
        & F.col("vol_7d").isNotNull()
        & F.col("target").isNotNull()
        & (F.col("n_hist") >= 7)
    ).select(
        "instrument",
        "day",
        F.round("ret", 6).alias("ret_1d"),
        F.round("mom_3d", 6).alias("mom_3d"),
        F.round("vol_7d", 6).alias("vol_7d"),
        F.round(
            F.col("gains_7d")
            / F.nullif(F.col("gains_7d") + F.col("losses_7d"), F.lit(0.0)),
            6,
        ).alias("rsi_7"),
        F.round("target", 6).alias("target_next_ret"),
    )
