"""Profiling / cleaning / statistics queries (SURVEY.md §2.4 A1–A7,
§2.6 T1, §2.7 SO3–SO4, §2.8 F9, §2.3 J4) — the reference's data-QA
surface re-expressed as single-pass distributed aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.cleaning import drop_any_null_rows
from commodity_price_forecasting_spark.operators.profiling import (
    corr_pairs,
    describe_long,
    duplicate_row_count,
    histogram_fixed,
    null_profile,
    variance_by_group,
)
from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table


def _events_nullified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``value`` deterministically nulled on 'error' rows —
    the fixture stand-in for the reference's missing market data."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "value", F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    )


_NULLIFIED_CTE = """
WITH ev AS (
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
         props
  FROM events
)
"""


_A1_ORACLE = (
    _NULLIFIED_CTE
    + """
, t AS (SELECT COUNT(*) AS total,
               COUNT(*) FILTER (WHERE value IS NULL)   AS n_value,
               COUNT(*) FILTER (WHERE user_id IS NULL) AS n_user,
               COUNT(*) FILTER (WHERE props IS NULL)   AS n_props
        FROM ev)
SELECT 'value' AS col_name, n_value AS n_null, ROUND(n_value * 1.0 / total, 6) AS null_frac FROM t
UNION ALL
SELECT 'user_id', n_user, ROUND(n_user * 1.0 / total, 6) FROM t
UNION ALL
SELECT 'props', n_props, ROUND(n_props * 1.0 / total, 6) FROM t
"""
)


@register("a1_null_profile", oracle=_A1_ORACLE, tags=("profiling",))
def a1_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null count/fraction (MC:24124 (cell 9), A1/A2) —
    one wide aggregate pass, unpivoted to long form."""
    return null_profile(_events_nullified(spark, sf_dir), ["value", "user_id", "props"])


_A3_ORACLE = """
SELECT 'l_quantity' AS col_name, COUNT(l_quantity) AS n,
       ROUND(AVG(l_quantity), 6) AS mean, ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev,
       ROUND(MIN(l_quantity), 6) AS min, ROUND(MAX(l_quantity), 6) AS max
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(l_extendedprice),
       ROUND(AVG(l_extendedprice), 6), ROUND(STDDEV_SAMP(l_extendedprice), 6),
       ROUND(MIN(l_extendedprice), 6), ROUND(MAX(l_extendedprice), 6)
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(l_discount),
       ROUND(AVG(l_discount), 6), ROUND(STDDEV_SAMP(l_discount), 6),
       ROUND(MIN(l_discount), 6), ROUND(MAX(l_discount), 6)
FROM lineitem
"""


@register("a3_describe_stats", oracle=_A3_ORACLE, tags=("profiling",))
def a3_describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact describe() per numeric column (MC:24031 (cell 6), A3) as
    a long stats table; Catalyst collapses the per-column branches
    over one cached scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return describe_long(li, ["l_quantity", "l_extendedprice", "l_discount"])


_A4_ORACLE = """
WITH daily AS (
  SELECT user_id AS instrument, CAST(ts AS DATE) AS day, AVG(value) AS px
  FROM events GROUP BY 1, 2
)
SELECT instrument, ROUND(VAR_SAMP(px), 6) AS variance, COUNT(px) AS n
FROM daily GROUP BY instrument
ORDER BY variance DESC, instrument LIMIT 20
"""


@register("a4_variance_topk", oracle=_A4_ORACLE, tags=("profiling", "topk"))
def a4_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-based target ranking, top-20 (MC:57595 (cell 61),
    A4+T1) — the reference's target-selection step: group variance
    then a 20-row takeOrdered (no global sort materialization)."""
    from commodity_price_forecasting_spark.plans.e1_pipeline import daily_bars

    daily = daily_bars(spark, sf_dir)
    return (
        variance_by_group(daily, ["instrument"], "px")
        .orderBy(F.desc("variance"), F.asc("instrument"))
        .limit(20)
    )


_A5_ORACLE = """
SELECT COUNT(*) AS n_rows,
       (SELECT COUNT(*) FROM (SELECT DISTINCT l_suppkey, l_returnflag, l_linestatus
                              FROM lineitem)) AS n_distinct,
       COUNT(*) - (SELECT COUNT(*) FROM (SELECT DISTINCT l_suppkey, l_returnflag,
                                         l_linestatus FROM lineitem)) AS n_duplicates
FROM lineitem
"""


@register("a5_duplicate_count", oracle=_A5_ORACLE, tags=("profiling", "invariant"))
def a5_duplicate_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-row census over a key projection (MC:57490
    (cell 55), A5): total − distinct, two shuffle-free-merged
    aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    return duplicate_row_count(li, ["l_suppkey", "l_returnflag", "l_linestatus"])


_A7_ORACLE = """
SELECT * FROM (
  SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b,
         ROUND(CORR(l_discount, l_extendedprice), 6) AS corr FROM lineitem
  UNION ALL
  SELECT 'l_discount', 'l_quantity', ROUND(CORR(l_discount, l_quantity), 6) FROM lineitem
  UNION ALL
  SELECT 'l_discount', 'l_tax', ROUND(CORR(l_discount, l_tax), 6) FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', 'l_quantity', ROUND(CORR(l_extendedprice, l_quantity), 6) FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', 'l_tax', ROUND(CORR(l_extendedprice, l_tax), 6) FROM lineitem
  UNION ALL
  SELECT 'l_quantity', 'l_tax', ROUND(CORR(l_quantity, l_tax), 6) FROM lineitem
) t
"""


@register("a7_corr_pairs", oracle=_A7_ORACLE, tags=("profiling", "stats"))
def a7_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation long table (SE:62738 (cell 77),
    A7): all C(4,2) pairs as fused aggregates in ONE pass over the
    scan (vs the reference's O(n²) Python loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    return corr_pairs(
        li, ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    )


_F9_ORACLE = """
SELECT CAST(LEAST(FLOOR((l_extendedprice - 0.0) / (120000.0 / 30)), 29) AS INTEGER) AS bucket,
       COUNT(*) AS n
FROM lineitem
WHERE l_extendedprice >= 0.0 AND l_extendedprice <= 120000.0
GROUP BY 1
"""


@register("f9_histogram", oracle=_F9_ORACLE, tags=("profiling",))
def f9_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-bin fixed-range histogram of extended price (SE:62820
    (cell 80), F9) — bucket arithmetic + groupBy count, one
    map-combinable stage."""
    li = load_table(spark, sf_dir, "lineitem")
    return histogram_fixed(li, "l_extendedprice", 0.0, 120000.0, 30)


_SO3_ORACLE = (
    _NULLIFIED_CTE
    + """
SELECT event_type, COUNT(*) AS n
FROM ev
WHERE value IS NOT NULL AND props IS NOT NULL
GROUP BY event_type
"""
)


@register("so3_dropna", oracle=_SO3_ORACLE, tags=("cleaning",))
def so3_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-null row drop (MC:57311 (cell 44), SO3) then survivor
    census — null-predicate filters push down to the scan."""
    ev = _events_nullified(spark, sf_dir).select("event_type", "value", "props")
    return drop_any_null_rows(ev).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


_SO4_ORACLE = (
    _NULLIFIED_CTE
    + """
, t AS (SELECT COUNT(*) AS total FROM ev)
SELECT col AS col_name, ROUND(nf, 6) AS null_frac,
       CASE WHEN nf > 0.5 THEN 0 ELSE 1 END AS kept
FROM (
  SELECT 'value' AS col,
         (SELECT COUNT(*) FILTER (WHERE value IS NULL) * 1.0 FROM ev) / (SELECT total FROM t) AS nf
  UNION ALL
  SELECT 'user_id',
         (SELECT COUNT(*) FILTER (WHERE user_id IS NULL) * 1.0 FROM ev) / (SELECT total FROM t)
  UNION ALL
  SELECT 'props',
         (SELECT COUNT(*) FILTER (WHERE props IS NULL) * 1.0 FROM ev) / (SELECT total FROM t)
) s
"""
)


@register("so4_sparse_columns", oracle=_SO4_ORACLE, tags=("cleaning",))
def so4_sparse_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """>50 %-missing column-drop decision (MC:57354 (cell 47), SO4):
    the null-fraction aggregate plus the keep/drop verdict as data —
    the driver-side ``df.drop`` consumes this single-pass profile."""
    prof = null_profile(_events_nullified(spark, sf_dir), ["value", "user_id", "props"])
    return prof.select(
        "col_name",
        "null_frac",
        F.when(F.col("null_frac") > 0.5, F.lit(0)).otherwise(F.lit(1)).alias("kept"),
    )


_J4_ORACLE = """
WITH legs AS (
  SELECT DISTINCT UNNEST(STRING_SPLIT(p_type, ' ')) AS leg FROM part
), known AS (
  SELECT DISTINCT p_brand AS name FROM part
)
SELECT leg FROM legs
WHERE NOT EXISTS (SELECT 1 FROM known k WHERE k.name = legs.leg)
"""


@register("j4_parse_explode_anti", oracle=_J4_ORACLE, tags=("join", "scalar"))
def j4_parse_explode_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split→explode→distinct→anti-join — the reference's pair-leg
    completeness check (MC:57130 (cell 35), J4/F1): parse compound
    string expressions into legs, verify each against a known-name
    dimension, report the unmatched."""
    part = load_table(spark, sf_dir, "part")
    legs = (
        part.select(F.explode(F.split("p_type", " ")).alias("leg")).distinct()
    )
    known = part.select(F.col("p_brand").alias("name")).distinct()
    return legs.join(known, legs["leg"] == known["name"], "left_anti").select("leg")
