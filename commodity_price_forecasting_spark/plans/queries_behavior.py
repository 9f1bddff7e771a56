"""Behavioral / cohort analytics over the ``events`` stream plus
multidimensional OLAP shapes over ``orders`` — the product-analytics
surface a serving layer on top of this engine would expose (funnel
conversion, weekly cohort retention, decile segmentation, CUBE
rollups, IQR outlier screens).

The reference's pipeline stops at per-instrument forecasting
(SURVEY.md §2.7–2.8); these queries widen the same event fixtures to
the standard user-journey analytics, each as a shuffle-minimal Spark
plan with an exact DuckDB oracle:

* funnel — ONE window pass per user (running conditional minima) in
  place of the naive 4-join stage chain; the oracle keeps the join
  form, so the driver cross-checks the two formulations.
* retention — two aggregates on the same ``user_id`` key.
* deciles — exact global NTILE via the distributed prefix-sum
  operator (``operators/distributed.py``): range-partition + local
  scan, never a single-partition ``Window.orderBy``.
* CUBE — Spark's native multi-dimensional aggregate (one shuffle,
  partial aggregation on the map side, 4 grouping sets at once).
* IQR screen — exact per-group quartiles (5 groups) broadcast back
  against the raw stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.distributed import prefix_sum
from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table

# --- B1: strict ordered funnel (signup → view → click → purchase) -------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s2.t2 GROUP BY 1
), s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s3.t3 GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
       (SELECT COUNT(*) FROM s2) AS n_view,
       (SELECT COUNT(*) FROM s3) AS n_click,
       (SELECT COUNT(*) FROM s4) AS n_purchase
"""


@register("funnel_conversion", oracle=_FUNNEL_ORACLE, tags=("behavior", "window", "bench"))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel signup→view→click→purchase: a user
    reaches stage k+1 only with an event of that type at-or-after
    their stage-k timestamp. The naive form is a chain of 4
    groupBy+join stages (the oracle keeps that form as the
    cross-check); here each user's journey folds in ONE window pass:
    the default RANGE frame's running conditional minima mark, per
    event, whether every earlier stage has completed — so the whole
    funnel costs one shuffle on ``user_id`` plus a per-user
    aggregate, and scales as events/user, not stages×events."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # Default frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW: ties on
    # ts are included, matching the oracle's `ts >= t` exactly.
    w = Window.partitionBy("user_id").orderBy("ts")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    ev = ev.withColumn("f2", (F.col("event_type") == "view") & t1.isNotNull())
    t2 = F.min(F.when(F.col("f2"), F.col("ts"))).over(w)
    ev = ev.withColumn("f3", (F.col("event_type") == "click") & t2.isNotNull())
    t3 = F.min(F.when(F.col("f3"), F.col("ts"))).over(w)
    ev = ev.withColumn("f4", (F.col("event_type") == "purchase") & t3.isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "signup").cast("long")).alias("s1"),
        F.max(F.col("f2").cast("long")).alias("s2"),
        F.max(F.col("f3").cast("long")).alias("s3"),
        F.max(F.col("f4").cast("long")).alias("s4"),
    )
    return per_user.agg(
        F.sum("s1").alias("n_signup"),
        F.sum("s2").alias("n_view"),
        F.sum("s3").alias("n_click"),
        F.sum("s4").alias("n_purchase"),
    )


# --- B2: weekly cohort retention ----------------------------------------

_RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INTEGER) AS week_offset,
       COUNT(*) AS active_users
FROM activity a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
"""


@register("cohort_retention", oracle=_RETENTION_ORACLE, tags=("behavior", "agg"))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by the
    Monday-start week of their first event; one output row per
    (cohort_week, week_offset) with the count of cohort members
    active that week. Two aggregates on the same ``user_id`` key —
    the cohort map joins back on the key it was built on, so at
    scale the join co-partitions with no extra exchange on the
    already-aggregated side."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


# --- B3: exact decile segmentation without a global sort ----------------

_DECILE_ORACLE = """
WITH ranked AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 6) AS min_price,
       ROUND(MAX(o_totalprice), 6) AS max_price,
       ROUND(SUM(o_totalprice), 6) AS sum_price
FROM ranked GROUP BY decile
"""

_N_BUCKETS = 10


@register("ntile_decile_stats", oracle=_DECILE_ORACLE, tags=("behavior", "window", "bench"))
def ntile_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value deciles WITHOUT ``Window.orderBy`` on the
    whole table (the single-task anti-pattern NTILE normally
    implies). Global rank comes from the distributed prefix-sum
    operator (range-partition → per-partition scan, Blelloch-style);
    the SQL-standard NTILE distribution (first N%10 buckets take one
    extra row) is then integer arithmetic on (rank, N). N itself is
    a 1-row aggregate broadcast into the rank frame. All-integer
    bucket math, so the oracle's native NTILE matches exactly."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = prefix_sum(
        orders.withColumn("_ord", F.struct("o_totalprice", "o_orderkey")).withColumn(
            "_one", F.lit(1)
        ),
        order_col="_ord",
        value_col="_one",
        out_col="rank",
    )
    total = orders.agg(F.count(F.lit(1)).alias("_n"))
    small = F.floor(F.col("_n") / _N_BUCKETS).cast("long")
    extras = (F.col("_n") % _N_BUCKETS).cast("long")
    cut = extras * (small + 1)
    r0 = F.col("rank") - 1
    decile = (
        F.when(F.col("rank") <= cut, F.floor(r0 / (small + 1)) + 1)
        .otherwise(extras + F.floor((r0 - cut) / small) + 1)
        .cast("int")
        .alias("decile")
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select("o_totalprice", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("min_price"),
            F.round(F.max("o_totalprice"), 6).alias("max_price"),
            F.round(F.sum("o_totalprice"), 6).alias("sum_price"),
        )
    )


# --- B4: CUBE over (priority, status) -----------------------------------

_CUBE_ORACLE = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INTEGER) AS gid,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 6) AS sum_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@register("cube_order_stats", oracle=_CUBE_ORACLE, tags=("behavior", "agg"))
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional CUBE over (priority, status): all 4 grouping
    sets — full detail, each single-dim rollup, grand total — in ONE
    aggregate. Spark expands grouping sets map-side and partially
    aggregates before the single shuffle; at 100 TB that beats 4
    separate scans by 4× I/O. ``grouping_id`` disambiguates genuine
    NULL keys from rollup rows (none here, but the oracle carries the
    same bit layout: first cube column = high bit)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 6).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n",
            "sum_price",
        )
    )


# --- B5 / A14: IQR outlier screen per event_type ------------------------

_IQR_ORACLE = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                       OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(MIN(q.q1 - 1.5 * (q.q3 - q.q1)), 6) AS fence_lo,
       ROUND(MIN(q.q3 + 1.5 * (q.q3 - q.q1)), 6) AS fence_hi
FROM events e JOIN q USING (event_type)
GROUP BY 1
"""


@register("a14_iqr_outliers", oracle=_IQR_ORACLE, tags=("profiling", "behavior"))
def a14_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier screen per event_type (the robust
    complement to the reference's z-score-style profiling, SURVEY §2.5
    A3/A4): exact quartiles per group, 1.5·IQR fences, and the count
    of values outside them. The quartile frame is 5 rows —
    broadcast back against the raw stream, so the screen costs one
    aggregate plus one map-side join. Exact ``percentile`` matches
    DuckDB ``quantile_cont`` bit-for-bit (same linear interpolation),
    and the fence arithmetic is identical IEEE ops on identical
    inputs, so the comparison threshold is cross-engine stable."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(((F.col("value") < lo) | (F.col("value") > hi)).cast("long")).alias(
                "n_outliers"
            ),
            F.round(F.min(lo), 6).alias("fence_lo"),
            F.round(F.min(hi), 6).alias("fence_hi"),
        )
    )


# --- B6: daily new + cumulative distinct users --------------------------

_CUMULATIVE_USERS_ORACLE = """
WITH fs AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1
), d AS (
  SELECT first_day AS day, COUNT(*) AS new_users FROM fs GROUP BY 1
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
FROM d
"""


@register("daily_cumulative_users", oracle=_CUMULATIVE_USERS_ORACLE, tags=("behavior", "window"))
def daily_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts and the running total of distinct users
    ever seen — the growth curve. Cumulative COUNT(DISTINCT) over raw
    events is exactly the first-touch trick: reduce each user to
    their first day (one aggregate), count per day, then a running
    sum over the per-DAY frame — which has calendar-many rows, so
    the final ordered window is over a trivially small aggregate,
    not the event stream (the same pattern at 100 TB: the global
    window only ever sees |days| rows)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    daily = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day")  # |days| rows only — see docstring
    return daily.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cumulative_users")
    )


# --- B7 / A15: MAD robust outlier screen per event_type -----------------

_MAD_ORACLE = """
WITH m AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
), d AS (
  SELECT e.event_type, e.value, m.med
  FROM events e JOIN m USING (event_type)
), m2 AS (
  SELECT event_type, quantile_cont(ABS(value - med), 0.5) AS mad FROM d GROUP BY 1
)
SELECT d.event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN ABS(d.value - d.med) > 3 * 1.4826 * m2.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(MIN(d.med), 6) AS median_value,
       ROUND(MIN(m2.mad), 6) AS mad
FROM d JOIN m2 USING (event_type)
GROUP BY 1
"""


@register("a15_mad_outliers", oracle=_MAD_ORACLE, tags=("profiling", "behavior"))
def a15_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen per event_type — the
    breakdown-point-0.5 robust alternative to the IQR fence (A14):
    |x − median| > 3·1.4826·MAD. Two exact-median passes (group
    medians, then medians of absolute deviations), each producing a
    5-row frame that broadcasts back against the stream — so the
    whole screen is two aggregates and two map-side joins, no
    global sort."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    d = ev.join(F.broadcast(med), "event_type")
    mad = d.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
            F.round(F.min("med"), 6).alias("median_value"),
            F.round(F.min("mad"), 6).alias("mad"),
        )
    )


# --- B8: cross-sectional percentile position ----------------------------

_PCT_RANK_ORACLE = """
WITH t AS (
  SELECT event_type, user_id AS instrument,
         SUM(CAST(value AS DECIMAL(28,10))) AS total
  FROM events GROUP BY 1, 2
)
SELECT event_type, instrument,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY total, instrument)
"""


@register("cs_value_percentile", oracle=_PCT_RANK_ORACLE, tags=("behavior", "window"))
def cs_value_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each instrument's percentile position (PERCENT_RANK and
    CUME_DIST) within its event_type by total value — the
    cross-sectional standing the momentum rank (cs_momentum_rank)
    truncates to top-k. Totals aggregate through DECIMAL so the
    ranking key is exact and the two engines order identically
    (instrument id breaks exact ties); the window partitions on
    event_type, so no global sort."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    t = ev.groupBy("event_type", F.col("user_id").alias("instrument")).agg(
        F.sum(F.col("value").cast("decimal(28,10)")).alias("total")
    )
    w = Window.partitionBy("event_type").orderBy("total", "instrument")
    return t.select(
        "event_type",
        "instrument",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# --- B9: batch sessionization (30-min inactivity gap) -------------------

_SESSIONIZE_ORACLE = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN date_diff('microsecond',
                             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts),
                             ts) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
)
SELECT user_id,
       CAST(1 + SUM(new_s) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events,
       ROUND(COUNT(*) * 1.0 / (1 + SUM(new_s)), 6) AS events_per_session
FROM d GROUP BY 1
"""


@register("sessionize_events", oracle=_SESSIONIZE_ORACLE, tags=("behavior", "window"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gaps-and-islands partner to the
    streaming session window (st_session_30m): a >30-minute silence
    starts a new session; per user, the session count and
    events-per-session density. One per-user ordered pass (session
    boundaries are a LAG comparison, session count a SUM of
    boundaries) — no self-join, no state store. The gap compares
    epoch MICROSECONDS on both engines, so boundary events land on
    the same side of the 30-minute line bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    d = ev.withColumn(
        "new_s", F.when(gap_us > 1_800_000_000, 1).otherwise(0)
    )
    return d.groupBy("user_id").agg(
        (1 + F.sum("new_s")).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.count(F.lit(1)) * 1.0 / (1 + F.sum("new_s")), 6
        ).alias("events_per_session"),
    )


_PMI_ORACLE = """
WITH pres AS (
  SELECT DISTINCT user_id, event_type FROM events
), nu AS (
  SELECT COUNT(DISTINCT user_id) AS n_users FROM events
), tcnt AS (
  SELECT event_type, COUNT(*) AS n_t FROM pres GROUP BY event_type
), pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_ab
  FROM pres a JOIN pres b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b,
       CAST(p.n_ab AS BIGINT) AS n_users_both,
       ROUND(ln((CAST(p.n_ab AS DOUBLE) / u.n_users)
                / ((CAST(ta.n_t AS DOUBLE) / u.n_users)
                   * (CAST(tb.n_t AS DOUBLE) / u.n_users))), 6) AS pmi,
       ROUND(CAST(p.n_ab AS DOUBLE)
             / (ta.n_t + tb.n_t - p.n_ab), 6) AS jaccard
FROM pair p
JOIN tcnt ta ON ta.event_type = p.type_a
JOIN tcnt tb ON tb.event_type = p.type_b
CROSS JOIN nu u
"""


@register("behavior_event_pmi", oracle=_PMI_ORACLE, tags=("behavior", "stats"))
def behavior_event_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types at the USER
    level — which behaviors co-occur beyond chance (PMI > 0) vs
    repel (PMI < 0): PMI(a,b) = ln(p(a,b)/(p(a)p(b))) over per-user
    presence sets, with the presence-Jaccard beside it (the
    ``basket_item_pairs`` support counts, normalized two ways).

    Plan shape: distinct (user, type) presence first — the ONLY pass
    over raw events — then a self-equi-join on user_id whose fanout
    is bounded by |event_types|² per user (5 types → ≤10 pairs), two
    broadcast dimension joins, and the 1-row user-count broadcast
    (allowlisted single-row pattern)."""
    ev = load_table(spark, sf_dir, "events")
    pres = ev.select("user_id", "event_type").distinct()
    nu = ev.agg(F.countDistinct("user_id").alias("n_users"))
    tcnt = pres.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    b = pres.select(
        F.col("user_id").alias("_uid"), F.col("event_type").alias("type_b")
    )
    pair = (
        pres.select(F.col("user_id"), F.col("event_type").alias("type_a"))
        .join(
            b,
            (F.col("user_id") == F.col("_uid"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ta = tcnt.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    tb = tcnt.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    j = (
        pair.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(nu))
    )
    pmi = F.log(
        (F.col("n_ab").cast("double") / F.col("n_users"))
        / (
            (F.col("n_a").cast("double") / F.col("n_users"))
            * (F.col("n_b").cast("double") / F.col("n_users"))
        )
    )
    jac = F.col("n_ab").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_ab")
    )
    return j.select(
        "type_a",
        "type_b",
        F.col("n_ab").cast("long").alias("n_users_both"),
        F.round(pmi, 6).alias("pmi"),
        F.round(jac, 6).alias("jaccard"),
    )


# --- first-order Markov transition matrix --------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type
  FROM seq WHERE next_type IS NOT NULL
), c AS (
  SELECT from_type, to_type, COUNT(*) AS n FROM pairs GROUP BY 1, 2
), tot AS (
  SELECT from_type, SUM(n) AS row_n FROM c GROUP BY 1
)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       ROUND(CAST(c.n AS DOUBLE) / t.row_n, 6) AS prob
FROM c JOIN tot t USING (from_type)
"""


@register("behavior_markov_transitions", oracle=_MARKOV_ORACLE, tags=("behavior", "stats"))
def behavior_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    P(next event type | current type), estimated from per-user
    consecutive pairs (ties broken by event_id so the sequence is
    deterministic on both engines). The behavioral fingerprint behind
    next-action prediction and journey anomaly detection — a bot
    shows up immediately as a near-degenerate row.

    One window pass partitioned by user (the same shuffle the
    sessionizer uses), a |types|²-bounded aggregate, and a row-
    normalizing broadcast join — nothing scales with anything but
    user-partition width."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    c = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (
        c.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias(
                "prob"
            ),
        )
    )


# --- RFM segmentation ----------------------------------------------------

_RFM_ORACLE = """
WITH mx AS (
  SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events
), per AS (
  SELECT e.user_id,
         MAX(CAST(e.ts AS DATE)) AS last_day,
         COUNT(*) AS frequency,
         ROUND(SUM(e.value), 6) AS monetary
  FROM events e WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
), rfm AS (
  SELECT p.user_id,
         CAST(m.max_day - p.last_day AS BIGINT) AS recency_days,
         CAST(p.frequency AS BIGINT) AS frequency,
         p.monetary
  FROM per p CROSS JOIN mx m
), br AS (
  SELECT PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY recency_days) AS r25,
         PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY recency_days) AS r50,
         PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY recency_days) AS r75,
         PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY frequency) AS f25,
         PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY frequency) AS f50,
         PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY frequency) AS f75,
         PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY monetary) AS m25,
         PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY monetary) AS m50,
         PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY monetary) AS m75
  FROM rfm
), scored AS (
  SELECT r.user_id, r.recency_days, r.frequency, r.monetary,
         CASE WHEN r.recency_days <= b.r25 THEN 4
              WHEN r.recency_days <= b.r50 THEN 3
              WHEN r.recency_days <= b.r75 THEN 2 ELSE 1 END AS r_score,
         CASE WHEN r.frequency <= b.f25 THEN 1
              WHEN r.frequency <= b.f50 THEN 2
              WHEN r.frequency <= b.f75 THEN 3 ELSE 4 END AS f_score,
         CASE WHEN r.monetary <= b.m25 THEN 1
              WHEN r.monetary <= b.m50 THEN 2
              WHEN r.monetary <= b.m75 THEN 3 ELSE 4 END AS m_score
  FROM rfm r CROSS JOIN br b
)
SELECT user_id, recency_days, frequency, monetary,
       CAST(r_score AS INT) AS r_score,
       CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3
              THEN 'champion'
            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
            WHEN r_score >= 3 AND f_score <= 2 THEN 'new_or_light'
            ELSE 'hibernating' END AS segment
FROM scored
"""


@register("behavior_rfm_segments", oracle=_RFM_ORACLE, tags=("behavior", "agg"))
def behavior_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartile
    scores + named segments) of purchasing users — the classic
    customer-value stratification, built scale-safe: per-user stats
    in one map-side-combinable aggregate, EXACT quartile boundaries
    via percentile_disc over the |users|-row frame collapsed to ONE
    broadcast row, scoring a pure CASE projection. percentile_DISC
    (not cont) so every boundary is an actual data value — integer/
    decimal-exact on both engines, no interpolation midpoints.
    Segments: champion (high R,F,M), at_risk (stale but frequent),
    new_or_light (fresh, infrequent), hibernating."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    # "as of" day = latest day over ALL events (matches the oracle's
    # mx CTE) — NOT the latest purchase: if the newest day in the feed
    # has no purchase, recency must still be measured from it, or every
    # recency/quartile/segment shifts by the gap
    mx = ev.agg(F.max(F.to_date("ts")).alias("max_day"))
    per = p.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 6).alias("monetary"),
    )
    rfm = per.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.datediff("max_day", "last_day").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
    )
    def q(col: str, p_: float) -> F.Column:
        return F.expr(f"percentile_disc({p_}) WITHIN GROUP (ORDER BY {col})")

    br = rfm.agg(
        *[
            q(c, pp).alias(f"{c[0]}{int(pp * 100)}")
            for c in ("recency_days", "frequency", "monetary")
            for pp in (0.25, 0.50, 0.75)
        ]
    )
    s = rfm.crossJoin(F.broadcast(br))
    r_score = (
        F.when(F.col("recency_days") <= F.col("r25"), 4)
        .when(F.col("recency_days") <= F.col("r50"), 3)
        .when(F.col("recency_days") <= F.col("r75"), 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("frequency") <= F.col("f25"), 1)
        .when(F.col("frequency") <= F.col("f50"), 2)
        .when(F.col("frequency") <= F.col("f75"), 3)
        .otherwise(4)
    )
    m_score = (
        F.when(F.col("monetary") <= F.col("m25"), 1)
        .when(F.col("monetary") <= F.col("m50"), 2)
        .when(F.col("monetary") <= F.col("m75"), 3)
        .otherwise(4)
    )
    seg = (
        F.when((r_score >= 3) & (f_score >= 3) & (m_score >= 3), "champion")
        .when((r_score <= 2) & (f_score >= 3), "at_risk")
        .when((r_score >= 3) & (f_score <= 2), "new_or_light")
        .otherwise("hibernating")
    )
    return s.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r_score.cast("int").alias("r_score"),
        f_score.cast("int").alias("f_score"),
        m_score.cast("int").alias("m_score"),
        seg.alias("segment"),
    )
