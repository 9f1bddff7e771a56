"""The flagship E1 pipeline (SURVEY.md §3 E1) re-targeted at the
driver's ``events`` fixture.

The reference's flagship job (notebooks/Marilyn_Cleaning.ipynb cells
3→67) is: load daily market series → impute (ffill/bfill) → build
cross-instrument *spreads* → shift each target forward by its own
per-target lag → drop unrealizable rows → rank targets by variance.

Here the same operator DAG runs over the synthetic ``events`` table in
the scalable long layout:

- instrument  := ``user_id``
- trading day := ``date(ts)``
- price       := daily mean of ``value`` (then deterministic null
  injection + ffill/bfill, standing in for the reference's missing
  market data, MC:57401 (cell 50))
- spread universe := adjacent-instrument pairs ``u — u+1`` with a
  heterogeneous per-pair lag ``(u mod 4) + 1`` mirroring the
  reference's lag∈{1..4} mapping table (Data/target_pairs.csv)
- target := spread realized ``lag`` days ahead (self-join on
  ``day + lag`` — the distributed form of ``shift(-lag)``,
  MC:59845 (cell 67))
- output := top-8 pairs by target variance (MC:57595 (cell 61))

Scale design: every step is keyed by instrument (windows partition by
it; joins hash on it together with day), so the plan has no global
sort and no single-task window; the pair mapping is derived from a
``distinct`` over instruments and broadcast into both legs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.cleaning import ffill_bfill_long
from commodity_price_forecasting_spark.sources.readers import load_table


def daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (instrument, day, px): daily mean value per user.

    px stays UNROUNDED: rounding happens once, at each query's output
    edge. Rounding intermediates creates values that sit exactly on
    decimal midpoints after downstream averaging (e.g. a mean of
    6-dp values over 2^k rows), where engines' rounding
    implementations legitimately disagree — observed in practice at
    sf0.01.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id").alias("instrument"), F.to_date("ts").alias("day")
    ).agg(F.avg("value").alias("px"))


def hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (instrument, hr, px): hourly mean value per user —
    the denser sibling of ``daily_bars`` for diagnostics that need
    n ≫ 30 observations per series at every fixture SF (the daily
    grain tops out at 28-30 bars, which left ``m11_ljung_box``
    comparing empty sets for 8 rounds — r10 VERDICT #1). Hourly
    yields 47-83 bars per instrument at sf0.001 through sf0.1.
    Same unrounded-px contract as ``daily_bars``."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id").alias("instrument"),
        F.date_trunc("hour", F.col("ts")).alias("hr"),
    ).agg(F.avg("value").alias("px"))


def hourly_as_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``hourly_bars`` bound to ``daily_bars``' (instrument, day, px)
    column shape, so an underpowered daily-grain statistical lane can
    move to the hourly grain by swapping this ONE call — the
    m11_ljung_box precedent generalized (r11 VERDICT ask #8: the r12
    audit found eight more test lanes running at n ≈ 20-24
    observations per instrument at sf0.001, under the n ≥ 30 floor
    the mirror's VACUOUS gate cannot see). ``day`` then holds the
    HOUR timestamp; every lane using this aggregates it away, so the
    name is a join-shape convenience, not an output claim."""
    return hourly_bars(spark, sf_dir).withColumnRenamed("hr", "day")


def with_gaps(daily: DataFrame) -> DataFrame:
    """Deterministically null out every 7th day-of-month — a synthetic
    stand-in for the reference's missing market values (so the
    ffill/bfill stage actually imputes something)."""
    return daily.withColumn(
        "px_raw",
        F.when(F.dayofmonth("day") % 7 == 0, F.lit(None).cast("double")).otherwise(
            F.col("px")
        ),
    ).drop("px")


def imputed(daily_gapped: DataFrame) -> DataFrame:
    """ffill → bfill per instrument ordered by day (W1)."""
    return ffill_bfill_long(
        daily_gapped,
        value_col="px_raw",
        order_cols=("day",),
        partition_cols=("instrument",),
        out_col="px",
    ).drop("px_raw")


def pair_mapping(daily: DataFrame) -> DataFrame:
    """Adjacent-instrument spread universe with heterogeneous lags —
    the engine's analogue of target_pairs.csv, derived (not loaded) so
    the fixture stays self-contained."""
    instruments = daily.select("instrument").distinct()
    a = instruments.alias("a")
    b = instruments.select(F.col("instrument").alias("instrument_b")).alias("b")
    return (
        a.join(b, F.col("a.instrument") + 1 == F.col("b.instrument_b"), "inner")
        .select(
            F.col("a.instrument").alias("leg_a"),
            F.col("instrument_b").alias("leg_b"),
            ((F.col("a.instrument") % 4) + 1).cast("int").alias("lag"),
            F.concat_ws(" - ", F.col("a.instrument"), F.col("instrument_b")).alias("pair"),
        )
    )


def spreads(
    imputed_px: DataFrame, mapping: DataFrame, round_to: int | None = 6
) -> DataFrame:
    """spread(pair, day) = px(leg_a, day) − px(leg_b, day). The
    mapping is broadcast; the series is shuffled once on
    (instrument) for each leg join. ``round_to=None`` keeps the raw
    double for callers that aggregate further (round once, at the
    output edge)."""
    m = F.broadcast(mapping)
    a = imputed_px.select(
        F.col("instrument").alias("_ia"), F.col("day"), F.col("px").alias("_pxa")
    )
    b = imputed_px.select(
        F.col("instrument").alias("_ib"), F.col("day").alias("_dayb"), F.col("px").alias("_pxb")
    )
    return (
        m.join(a, m["leg_a"] == a["_ia"], "inner")
        .join(b, (m["leg_b"] == b["_ib"]) & (F.col("day") == F.col("_dayb")), "inner")
        .select(
            "pair",
            "lag",
            "day",
            (
                F.round(F.col("_pxa") - F.col("_pxb"), round_to)
                if round_to is not None
                else (F.col("_pxa") - F.col("_pxb"))
            ).alias("spread"),
        )
    )


def future_spreads(spread_df: DataFrame) -> DataFrame:
    """Target construction: y(pair, day) = spread(pair, day + lag),
    heterogeneous per-pair lag via self-join (the scalable form of the
    reference's per-target ``shift(-lag)`` + ``dropna``)."""
    future = spread_df.select(
        F.col("pair").alias("_fp"), F.col("day").alias("_fd"), F.col("spread").alias("y")
    )
    return spread_df.join(
        future,
        (F.col("pair") == F.col("_fp"))
        & (F.date_add(F.col("day"), F.col("lag")) == F.col("_fd")),
        "inner",
    ).select("pair", "lag", "day", "spread", "y")


def e1_flagship(spark: SparkSession, sf_dir: str, top_k: int = 8) -> DataFrame:
    """Full E1 spine; returns top-``top_k`` pairs by target variance:
    (pair, lag, variance, n).

    The DAG references the daily series five times (mapping ×2, leg
    joins ×2, future self-join ×2 on spreads); without persistence
    Spark recomputes the full scan+agg subtree for each — 8 scans of
    the raw events observed in the physical plan. The aggregated
    intermediates are ~|instruments|×|days| rows (orders of magnitude
    below the raw input at any scale), so MEMORY_AND_DISK persistence
    of the three reused frames turns 8 raw scans into 1."""
    from pyspark import StorageLevel

    daily = daily_bars(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    filled = imputed(with_gaps(daily)).persist(StorageLevel.MEMORY_AND_DISK)
    mapping = pair_mapping(daily)
    sp = spreads(filled, mapping).persist(StorageLevel.MEMORY_AND_DISK)
    tgt = future_spreads(sp)
    ranked = (
        tgt.groupBy("pair", "lag")
        .agg(F.round(F.var_samp("y"), 6).alias("variance"), F.count("y").alias("n"))
        .orderBy(F.desc("variance"), F.asc("pair"))
        .limit(top_k)
    )
    return ranked


#: DuckDB oracle for :func:`e1_flagship` — same DAG in ANSI SQL.
E1_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day,
         AVG(value) AS px
  FROM events GROUP BY 1, 2
), gapped AS (
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
  JOIN (SELECT DISTINCT instrument FROM daily) b
    ON a.instrument + 1 = b.instrument
), spread AS (
  SELECT m.pair, m.lag, a.day, ROUND(a.px - b.px, 6) AS spread
  FROM mapping m
  JOIN filled a ON m.leg_a = a.instrument
  JOIN filled b ON m.leg_b = b.instrument AND a.day = b.day
), tgt AS (
  SELECT s.pair, s.lag, s.day, s.spread, f.spread AS y
  FROM spread s
  JOIN spread f ON s.pair = f.pair AND s.day + s.lag = f.day
)
SELECT pair, lag, ROUND(VAR_SAMP(y), 6) AS variance, COUNT(y) AS n
FROM tgt GROUP BY pair, lag
ORDER BY variance DESC, pair ASC LIMIT 8
"""
