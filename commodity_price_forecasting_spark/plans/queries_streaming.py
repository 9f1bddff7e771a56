"""Streaming-surface queries (SURVEY.md §2.10 extension). Each named
query runs the SAME batch/stream-agnostic transformation from
``streaming/events_stream.py`` on a batch scan, so the DuckDB oracle
checks the logic; ``tests/test_streaming.py`` separately proves the
streaming execution (availableNow) produces identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table
from commodity_price_forecasting_spark.streaming.events_stream import (
    dedup_events,
    running_user_stats,
    session_stats,
    sliding_stats,
    tumbling_stats,
)

_TUMBLING_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


@register("st_tumbling_daily", oracle=_TUMBLING_ORACLE, tags=("streaming", "window", "bench"))
def st_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window stats per event_type — the incremental
    daily-returns rollup (streaming/events_stream.tumbling_stats)."""
    return tumbling_stats(load_table(spark, sf_dir, "events"))


# Each event falls into the 2-day windows starting at date_trunc(ts)
# and date_trunc(ts) - 1 day (width 2d, slide 1d).
_SLIDING_ORACLE = """
SELECT w.window_start,
       w.event_type,
       count(*) AS n_events,
       round(avg(w.value), 6) AS avg_value
FROM (
  SELECT date_trunc('day', ts) - to_days(CAST(g.i AS INTEGER)) AS window_start,
         event_type, value
  FROM events
  CROSS JOIN (SELECT UNNEST(range(2)) AS i) g
) w
GROUP BY 1, 2
"""


@register("st_sliding_2d_1d", oracle=_SLIDING_ORACLE, tags=("streaming", "window"))
def st_sliding_2d_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-day/1-day window stats per event_type."""
    return sliding_stats(load_table(spark, sf_dir, "events"))


# Gaps-and-islands: a new session starts when the previous event of
# the same user is more than 30 minutes older.
_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT min(ts) AS session_start,
       user_id,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


@register("st_session_30m", oracle=_SESSION_ORACLE, tags=("streaming", "window"))
def st_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap session windows (native session_window)."""
    return session_stats(load_table(spark, sf_dir, "events"))


_DEDUP_ORACLE = """
SELECT count(*) AS n_events, count(DISTINCT event_id) AS n_distinct
FROM (SELECT DISTINCT ON (event_id) * FROM events ORDER BY event_id)
"""


@register("st_dedup_events", oracle=_DEDUP_ORACLE, tags=("streaming", "dedup"))
def st_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact event dedup (bounded-state dropDuplicatesWithinWatermark
    on streams); asserted via count == distinct-count."""
    from pyspark.sql import functions as F

    deduped = dedup_events(load_table(spark, sf_dir, "events"))
    return deduped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_id").alias("n_distinct"),
    )


# Row-wise quality (same arithmetic as _QUALITY_ORACLE in
# queries_datapipe — proven engine-portable there), gate >= 0.7,
# exact dedup to the min-id holder, content-addressed split on
# md5(fp). The fixture text carries no digits/'@' (verified r11), so
# pii_redact is byte-identity here and the oracle reads raw text;
# redaction itself is byte-level-oracled by quality_pii_redact.
_CURATION_GATE_ORACLE = """
WITH t AS (
  SELECT d.doc_id, UNNEST(string_split(trim(d.text), ' ')) AS token
  FROM documents d
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_distinct,
         SUM(CASE WHEN token IN ('the','a','of','and','in') THEN 1 ELSE 0 END)
           AS n_stop
  FROM t WHERE token <> '' GROUP BY doc_id
), scored AS (
  SELECT d.doc_id, md5(d.text) AS fp, p.n_tokens,
         ROUND(0.4 * LEAST(p.n_tokens / 50.0, 1.0)
             + 0.3 * (p.n_distinct * 1.0 / p.n_tokens)
             + 0.3 * (1 - ABS(p.n_stop * 1.0 / p.n_tokens - 0.10) / 0.9), 6)
           AS quality
  FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
), gated AS (
  SELECT * FROM scored WHERE quality >= 0.7
), holders AS (
  SELECT fp, MIN(doc_id) AS doc_id FROM gated GROUP BY fp
)
SELECT g.doc_id, g.fp, g.n_tokens, g.quality,
       CASE WHEN CAST(('0x' || substr(md5(g.fp), 1, 8)) AS BIGINT) % 100 < 80
              THEN 'split_train'
            WHEN CAST(('0x' || substr(md5(g.fp), 1, 8)) AS BIGINT) % 100 < 90
              THEN 'split_val'
            ELSE 'split_test' END AS split
FROM gated g JOIN holders h ON g.doc_id = h.doc_id AND g.fp = h.fp
"""


@register(
    "st_curation_gate",
    oracle=_CURATION_GATE_ORACLE,
    tags=("streaming", "datapipe", "quality"),
)
def st_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the streaming curation ingest
    (streaming/curation_stream.curate_docs): PII redaction →
    ZERO-SHUFFLE row-wise quality gate (quality_score_rowwise, the
    streaming-legal twin of quality_score) → content fingerprint →
    exact dedup → content-addressed 80/10/10 split. On a stream the
    dedup is bounded-state dropDuplicatesWithinWatermark on the
    fingerprint and the survivors append into the persisted curated
    store via foreachBatch; stream == batch is pinned in
    tests/test_streaming_curation.py."""
    from commodity_price_forecasting_spark.streaming.curation_stream import (
        curate_docs,
        with_arrival_ts,
    )

    docs = with_arrival_ts(load_table(spark, sf_dir, "documents"))
    return curate_docs(docs).select("doc_id", "fp", "n_tokens", "quality", "split")


_RUNNING_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       round(coalesce(sum(value), 0), 6) AS total_value,
       round(coalesce(sum(value), 0) / count(*), 6) AS mean_value
FROM events
GROUP BY user_id
"""


@register("st_running_user_stats", oracle=_RUNNING_ORACLE, tags=("streaming", "stateful"))
def st_running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of the custom stateful per-user running aggregate
    (applyInPandasWithState on streams == this batch aggregate)."""
    from pyspark.sql import functions as F

    out = running_user_stats(load_table(spark, sf_dir, "events"))
    return out.select(
        "user_id",
        "n_events",
        F.round("total_value", 6).alias("total_value"),
        F.round("mean_value", 6).alias("mean_value"),
    )


_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(first_signup) AS n_signed_up,
       count(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted,
       ROUND(count(CASE WHEN first_purchase > first_signup THEN 1 END) * 1.0
             / count(first_signup), 6) AS conversion_rate
FROM firsts
"""


@register("funnel_signup_purchase", oracle=_FUNNEL_ORACLE, tags=("streaming", "funnel"))
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: users whose first purchase follows their first
    signup — two conditional MIN aggregates per user, then one
    funnel-ratio pass (no self-join, no window; the standard
    sequence-conversion shape over an event stream)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = (F.col("first_purchase") > F.col("first_signup")).cast("int")
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.sum(converted).alias("n_converted"),
        F.round(F.sum(converted) / F.count("first_signup"), 6).alias("conversion_rate"),
    )


_ATTRIBUTION_ORACLE = """
SELECT p.event_id AS purchase_id, v.event_id AS view_id,
       p.user_id AS user_id,
       ROUND(p.value, 6) AS purchase_value,
       CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_seconds
FROM events p
JOIN events v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL 12 HOUR AND v.ts < p.ts
"""


@register("st_view_purchase_attribution", oracle=_ATTRIBUTION_ORACLE, tags=("streaming", "join"))
def st_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view→purchase last-touch
    attribution, 12 h lookback) on the batch plan; the streaming
    replay of the SAME transform is proven equal in
    tests/test_streaming.py. Watermark + bounded time-range keeps
    join state finite on a real stream."""
    from commodity_price_forecasting_spark.streaming.events_stream import (
        view_purchase_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    return view_purchase_attribution(ev)


_FUNNEL_STAGE_ORACLE = """
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
SELECT u.user_id,
       CAST(CASE WHEN u.user_id IN (SELECT user_id FROM s4) THEN 4
                 WHEN u.user_id IN (SELECT user_id FROM s3) THEN 3
                 WHEN u.user_id IN (SELECT user_id FROM s2) THEN 2
                 WHEN u.user_id IN (SELECT user_id FROM s1) THEN 1
                 ELSE 0 END AS INTEGER) AS stage_reached
FROM (SELECT DISTINCT user_id FROM events) u
"""


@register("st_funnel_stage", oracle=_FUNNEL_STAGE_ORACLE, tags=("streaming", "behavior"))
def st_funnel_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user strict-funnel stage — the batch face of the second
    custom stateful operator (streaming/events_stream.funnel_stage:
    applyInPandasWithState accumulating per-type event times, exact
    under out-of-order arrival). tests/test_streaming.py proves the
    incremental execution converges to this batch result across
    micro-batches."""
    from commodity_price_forecasting_spark.streaming.events_stream import funnel_stage

    return funnel_stage(load_table(spark, sf_dir, "events"))


_SEGMENT_ORACLE = """
SELECT CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS window_start,
       c.c_mktsegment AS mktsegment,
       count(*) AS n_events,
       round(sum(e.value), 6) AS sum_value
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


@register("st_segment_value_stats", oracle=_SEGMENT_ORACLE, tags=("streaming", "join", "window"))
def st_segment_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment + windowed rollup (the canonical
    streaming ETL shape, streaming/events_stream.segment_value_stats):
    each event is enriched against the broadcast customer dimension
    (user_id = c_custkey), then aggregated per (day, market segment).
    On a stream the dimension re-broadcasts per micro-batch and the
    aggregate keeps watermark-bounded state; the identical plan on
    batch input is what the oracle checks. Stream==batch equality is
    asserted in tests/test_streaming.py."""
    from commodity_price_forecasting_spark.streaming.events_stream import (
        segment_value_stats,
    )

    return segment_value_stats(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )


_DRAWDOWN_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         COALESCE(value, 0.0) AS v,
         SUM(COALESCE(value, 0.0)) OVER w AS cum
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), stepped AS (
  SELECT user_id, v, cum,
         GREATEST(0.0, MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS peak
  FROM ordered
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(v), 6) AS final_cum,
       ROUND(MAX(peak), 6) AS peak_cum,
       ROUND(MAX(peak - cum), 6) AS max_drawdown
FROM stepped GROUP BY user_id
"""


@register("st_running_drawdown", oracle=_DRAWDOWN_ORACLE, tags=("streaming", "window"))
def st_running_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative-value max drawdown — the batch face of the
    third custom stateful operator
    (streaming/events_stream.running_drawdown), whose streaming form
    uses Spark 4's ``transformWithStateInPandas`` with a
    4-scalar ValueState per user. The batch plan is two ordered
    windows + one aggregate over the same (ts, event_id) order;
    tests/test_streaming.py asserts the streamed final state equals
    this. Doubles round once at the output edge."""
    from commodity_price_forecasting_spark.streaming.events_stream import (
        running_drawdown,
    )
    from pyspark.sql import functions as F

    dd = running_drawdown(load_table(spark, sf_dir, "events"))
    return dd.select(
        "user_id",
        "n_events",
        F.round("final_cum", 6).alias("final_cum"),
        F.round("peak_cum", 6).alias("peak_cum"),
        F.round("max_drawdown", 6).alias("max_drawdown"),
    )


_WINDOWED_PSI_ORACLE = """
WITH base AS (
  SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bin, COUNT(*) AS n_b
  FROM events GROUP BY 1
), basep AS (
  SELECT bin, CAST(n_b AS DOUBLE) / SUM(n_b) OVER () AS p_base,
         COUNT(*) OVER () AS k
  FROM base
), wb AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         CAST(FLOOR(value / 25) AS BIGINT) AS bin,
         COUNT(*) AS n_wb
  FROM events GROUP BY 1, 2
), j AS (
  SELECT w.window_start, w.n_wb, b.p_base, b.k
  FROM wb w JOIN basep b USING (bin)
), t AS (
  SELECT window_start, SUM(n_wb) AS n_w, COUNT(*) AS n_bins
  FROM j GROUP BY window_start
)
SELECT t.window_start,
       CAST(t.n_w AS BIGINT) AS n_events,
       ROUND(SUM(((j.n_wb + 0.5) / (t.n_w + 0.5 * j.k) - j.p_base)
                 * ln(((j.n_wb + 0.5) / (t.n_w + 0.5 * j.k)) / j.p_base)),
             6) AS psi,
       CAST(t.n_bins AS INT) AS n_bins_observed
FROM j JOIN t USING (window_start)
GROUP BY t.window_start, t.n_w, t.n_bins
"""


@register("st_windowed_psi", oracle=_WINDOWED_PSI_ORACLE, tags=("streaming", "window", "drift"))
def st_windowed_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day PSI drift of the value distribution vs the full-corpus
    baseline — the incremental drift monitor
    (streaming/events_stream.windowed_psi): TWO chained stateful
    aggregations with a stream-static baseline join between them;
    on this batch input the baseline is the same data, so per-window
    PSI measures day-vs-corpus variation plus smoothing mass."""
    from commodity_price_forecasting_spark.streaming.events_stream import (
        value_bin_baseline,
        windowed_psi,
    )

    ev = load_table(spark, sf_dir, "events")
    return windowed_psi(ev, value_bin_baseline(ev))
