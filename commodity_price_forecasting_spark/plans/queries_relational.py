"""Relational operator queries (SURVEY.md §2.2 P1–P8, §2.3 J1–J4,
§2.4, §2.6 T1, §2.7 SO1–SO2) over the driver's TPC-H-ish fixtures.

These are the engine's headline scan/filter/join/aggregate surface.
Each query is written DataFrame-first so Catalyst handles predicate
pushdown into parquet, column pruning, and join-strategy selection;
dimension tables get explicit ``broadcast`` hints (they are tiny at
every scale factor — nation/region/supplier are bounded dimensions).

Floating-point policy: aggregate sums are rounded to 2 dp and means
to 6 dp on BOTH engines, so summation-order noise (~1e-8 relative)
sits far from any rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table


_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
       ROUND(AVG(l_discount), 6)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("bench", "agg"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan + pushed-down timestamp
    filter + 8-aggregate hash aggregation (map-side partial combine;
    one shuffle of 6 groups). The reference's closest analogue is its
    global describe()/sum profiling (SURVEY.md §2.4 A3)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT o.o_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("bench", "join", "topk"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dimension filter → two equi-joins →
    hash agg → top-10. Catalyst broadcasts the filtered customer side
    (small after the segment filter); AQE re-plans if not. Exercises
    the reference's J1 inner time-key join shape at warehouse scale."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        F.broadcast(c)
        .join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("bench", "join"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style six-table join. All dimensions
    (supplier/nation/region) are broadcast — only the
    orders⋈lineitem join shuffles, hashed on orderkey. At 100 TB the
    same plan holds: dimensions stay broadcast-able, and AQE handles
    fact-side skew."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, F.col("l_orderkey") == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("bench", "filter"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style pure filter + global aggregate — the canonical
    predicate-pushdown probe: every predicate reaches the parquet
    row-group level; no shuffle at all beyond the final 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_SEMI_ORACLE = """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey
    AND l.l_shipdate > TIMESTAMP '2001-06-01 00:00:00')
"""


@register("p4_semi_join_filter", oracle=_SEMI_ORACLE, tags=("join",))
def p4_semi_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join filter — the reference's ``isin`` membership filter
    (MC:57595 (cell 61), SURVEY.md P4) as a distributed left-semi
    join (no row duplication, probe side never materialized)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2001-06-01 00:00:00").cast("timestamp")
    )
    return s.join(li, s["s_suppkey"] == li["l_suppkey"], "left_semi").select(
        "s_suppkey", "s_name"
    )


_ANTI_ORACLE = """
SELECT p_partkey, p_name FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey
    AND l.l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
"""


@register("j3_anti_join_completeness", oracle=_ANTI_ORACLE, tags=("join",))
def j3_anti_join_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join completeness check — the reference's set-difference
    mapping validation (MC:57088 (cell 32), SURVEY.md J3/SO1): parts
    with no recent shipment, as a left-anti join."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return p.join(li, p["p_partkey"] == li["l_partkey"], "left_anti").select(
        "p_partkey", "p_name"
    )


_DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("so2_distinct", oracle=_DISTINCT_ORACLE, tags=("setop",))
def so2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection (SURVEY.md SO2) — shuffle on the composite
    key with map-side pre-dedup."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register("rollup_qty", oracle=_ROLLUP_ORACLE, tags=("agg",))
def rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregate — free from Spark SQL (SURVEY.md
    §2.4 note: beyond-parity but natural for multi-market rollups)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


_PIVOT_ORACLE = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
FROM lineitem GROUP BY l_returnflag
"""


@register("pivot_status_qty", oracle=_PIVOT_ORACLE, tags=("agg",))
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) — the engine's bridge between the scalable
    long layout and the reference's wide layout (SURVEY.md §1.4):
    explicit value list so the plan is a single hash aggregate (no
    discovery pass)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )


_TOPK_GROUP_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
"""


@register("topk_per_group", oracle=_TOPK_GROUP_ORACLE, tags=("window", "topk"))
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority class — the distributed
    top-k-per-group pattern behind the reference's T1/T2 sorted heads
    (SURVEY.md §2.6): rank inside each hash partition, no global
    sort."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


_JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
FROM events GROUP BY event_type
"""


@register("json_props_agg", oracle=_JSON_ORACLE, tags=("scalar",))
def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON path into the ``props`` string
    column, then aggregate — JVM-side ``get_json_object`` (no Python
    in the row path)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"), F.round(F.avg(k), 6).alias("avg_k")
    )


# --- ANSI SQL front-end: the same engine through spark.sql() ------------

_SQL_API_TEXT = """
SELECT r.r_name AS region, CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
HAVING COUNT(DISTINCT o.o_orderkey) >= 5
"""


@register("sql_api_region_revenue", oracle=_SQL_API_TEXT, tags=("sql", "join", "agg"))
def sql_api_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI front door: register the fixture tables as temp views
    and run ONE SQL text through ``spark.sql`` — the exact string the
    DuckDB oracle runs, proving the engine's SQL surface (not just
    the DataFrame API) is usable and engine-portable. Catalyst plans
    this identically to the DataFrame form: dimension joins broadcast,
    fact join shuffles on the key."""
    from commodity_price_forecasting_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_API_TEXT)


# --- J6: FULL OUTER reconciliation --------------------------------------

_FULL_OUTER_ORACLE = """
WITH p AS (
  SELECT CAST(ts AS DATE) AS day, ROUND(SUM(value), 6) AS purchase_value
  FROM events WHERE event_type = 'purchase' AND value > 150 GROUP BY 1
), e AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error' AND value > 150 GROUP BY 1
)
SELECT COALESCE(p.day, e.day) AS day, p.purchase_value, e.n_errors,
       CASE WHEN p.day IS NULL THEN 'errors_only'
            WHEN e.day IS NULL THEN 'purchases_only'
            ELSE 'both' END AS presence
FROM p FULL OUTER JOIN e ON p.day = e.day
"""


@register("j6_full_outer_reconcile", oracle=_FULL_OUTER_ORACLE, tags=("join",))
def j6_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two sparse daily aggregates
    (high-value purchases vs high-value errors): days present on
    either side survive, with a presence label for one-sided rows —
    the audit-join shape (ledger-vs-ledger) the inner/left/anti
    family can't express. Both inputs pre-aggregate to |days| rows
    before the join, so the full-outer shuffle is tiny regardless of
    raw volume."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    p = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .groupBy(F.to_date("ts").alias("p_day"))
        .agg(F.round(F.sum("value"), 6).alias("purchase_value"))
    )
    e = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 150))
        .groupBy(F.to_date("ts").alias("e_day"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    joined = p.join(e, p.p_day == e.e_day, "full_outer")
    return joined.select(
        F.coalesce("p_day", "e_day").alias("day"),
        "purchase_value",
        "n_errors",
        F.when(F.col("p_day").isNull(), "errors_only")
        .when(F.col("e_day").isNull(), "purchases_only")
        .otherwise("both")
        .alias("presence"),
    )


_VARIANT_ORACLE = """
SELECT event_type,
       CAST(FLOOR(CAST(props->>'$.k' AS BIGINT) / 20) AS BIGINT) AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE props IS NOT NULL AND CAST(props->>'$.k' AS BIGINT) IS NOT NULL
GROUP BY 1, 2
"""


@register("props_variant_buckets", oracle=_VARIANT_ORACLE, tags=("scalar", "semi-structured"))
def props_variant_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured processing through Spark 4's VARIANT type:
    ``parse_json`` decodes each ``props`` payload ONCE into the
    binary variant encoding, then ``try_variant_get`` extracts typed
    fields without re-parsing — at 100 TB this beats per-extraction
    string parsing (``get_json_object``, the json_props_agg path)
    whenever a payload is probed more than once, and tolerates
    missing/mistyped fields with NULL instead of a crash. Output:
    count + sum per (event_type, k div 20) bucket. Oracle: DuckDB's
    JSON arrow path over the same strings."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "bigint")
    return (
        v.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(
            "event_type", F.floor(F.col("k") / 20).cast("bigint").alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


_RECURSIVE_CAL_TEXT = """
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
  FROM orders
), cal(m) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM cal, bounds
  WHERE m < hi
), monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2)
           AS revenue
  FROM orders GROUP BY 1
)
SELECT cal.m AS month,
       COALESCE(monthly.n_orders, 0) AS n_orders,
       COALESCE(monthly.revenue, 0.0) AS revenue
FROM cal LEFT JOIN monthly ON cal.m = monthly.m
"""


@register("sql_recursive_calendar", oracle=_RECURSIVE_CAL_TEXT, tags=("sql", "recursive"))
def sql_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): generate the
    min→max monthly calendar scaffold by recursion and left-join the
    monthly order rollup onto it — the canonical gap-filling shape
    (every month present, zero-filled), previously only expressible
    via sequence()/explode. ONE SQL text runs verbatim on Spark and
    DuckDB (the sql_api pattern), so the recursion semantics are
    engine-portable and hash-checked. Recursion depth = number of
    distinct months — driver-coordinated like any iterative plan, and
    bounded by the data's time span, not its row count."""
    from commodity_price_forecasting_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_CAL_TEXT)


_SCD2_ORACLE = """
SELECT user_id,
       ROW_NUMBER() OVER w AS version,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current,
       ROUND(value, 6) AS value
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("scd2_user_versions", oracle=_SCD2_ORACLE, tags=("relational", "window", "temporal"))
def scd2_user_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from an event log: each
    purchase becomes a versioned dimension row with a validity
    interval — valid_from = its event time, valid_to = the user's
    next purchase time (NULL ⇒ current row). The standard
    warehouse temporal-versioning op, one LEAD window per user key
    (hash-partitioned on user_id, no self-join); an as-of lookup over
    the result is then a plain range predicate. Deterministic
    ordering tie-break on (ts, event_id)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
        F.round("value", 6).alias("value"),
    )


_GROUPING_SETS_TEXT = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS INTEGER), -1) AS o_year,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2)
         AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority),
                        (o_orderstatus),
                        (o_orderpriority, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)))
"""


@register("grouping_sets_order_stats", oracle=_GROUPING_SETS_TEXT, tags=("sql", "agg"))
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom GROUPING SETS — the general form CUBE/ROLLUP are sugar
    for: three hand-picked grouping sets (priority, status,
    priority×year) computed in ONE aggregate pass. Spark expands the
    sets map-side and partially aggregates before the single shuffle —
    at 100 TB that is 3× less scan I/O than three separate rollups.
    ONE SQL text runs verbatim on both engines (the sql_api pattern);
    DECIMAL-summed revenue per the midpoint-rounding rule."""
    from commodity_price_forecasting_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_TEXT)
