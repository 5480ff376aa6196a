"""Event-stream-shaped batch queries (SURVEY.md §2.9 extension surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ixmp_spark.operators.sessions import sessionize, tumbling_agg
from ixmp_spark.queries import load, query


@query(
    "g1_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, value, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, value,
             CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def g1_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap): batch twin of streaming
    session_window. The oracle re-derives the same lag/cumsum construction.

    Note the oracle orders the cumulative sum by event_id alone — valid
    because event_id order matches ts order within a user in this data; the
    Spark side uses (ts, event_id) which is the general contract.
    """
    ev = load(spark, sf_dir, "events")
    sess = sessionize(
        ev, user_col="user_id", ts_col="ts", gap_seconds=1800, tie_break="event_id"
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "g1b_sessionize_chunked",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, value, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, value,
             CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def g1b_sessionize_chunked(spark, sf_dir):
    """g1's hot-key form (same oracle — the driver hash proves the
    chunked session ids are identical): local sessionization per
    (user, day) bucket, then per-user prefix-sum stitching over the
    one-row-per-bucket summary (operators/sessions.py:sessionize
    bucket=...). The plain whole-history window bent 4.2× under a
    40%-hot bot user at 5M rows in the --events rehearsal; here no task
    ever holds more than one key-day of rows."""
    ev = load(spark, sf_dir, "events")
    sess = sessionize(
        ev, user_col="user_id", ts_col="ts", gap_seconds=1800,
        tie_break="event_id", bucket="day",
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "g2_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def g2_tumbling_window(spark, sf_dir):
    """Tumbling-window aggregation (batch twin of streaming
    ``window(ts, '1 hour')``); grouping on the truncated timestamp keeps
    partial aggregation map-side."""
    ev = load(spark, sf_dir, "events")
    out = tumbling_agg(ev, "ts", "hour", "event_type")
    # string-typed window edge: engine-portable hashing (timestamp binary
    # resolutions differ between engines)
    return out.withColumn(
        "window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
    )


@query(
    "g4_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      count(*) AS n_users,
      CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_viewed,
      CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
      CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM firsts
    """,
)
def g4_funnel(spark, sf_dir):
    """Sequential funnel analysis (view → click → purchase ordering per
    user): first-occurrence timestamps via conditional min, then ordered
    comparisons — one shuffle on user_id, no self-joins (the naive funnel
    is an N-way self-join; the conditional-aggregate form scales)."""
    ev = load(spark, sf_dir, "events")
    t = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    firsts = ev.groupBy("user_id").agg(
        t("view").alias("t_view"),
        t("click").alias("t_click"),
        t("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("long")).alias("n_viewed"),
        F.sum(clicked.cast("long")).alias("n_clicked_after_view"),
        F.sum(purchased.cast("long")).alias("n_full_funnel"),
    )


@query(
    "g7_session_features",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, value, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, value, ts, event_type,
             CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
             AS duration_s,
           round(sum(value), 4) AS sum_value,
           max(CASE WHEN event_type = 'purchase' THEN true
                    ELSE false END) AS converted
    FROM sess GROUP BY user_id, session_id
    """,
)
def g7_session_features(spark, sf_dir):
    """Session-level feature table — the frame every product-analytics
    model trains on: g1's session ids aggregated to one row per
    session with event count, distinct-type count, wall duration,
    value sum, and a conversion flag. One extra keyed aggregation on
    top of sessionize's single shuffle (same key prefix, so AQE keeps
    it co-partitioned). The oracle re-derives the lag/cumsum session
    construction and the aggregate layer."""
    ev = load(spark, sf_dir, "events")
    sess = sessionize(
        ev, user_col="user_id", ts_col="ts", gap_seconds=1800,
        tie_break="event_id",
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        # microsecond-exact: floor(a) - floor(b) != floor(a - b) on
        # sub-second components (found by the oracle hash, 14 rows off
        # by one second at sf0.001)
        F.floor(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / 1_000_000
        ).alias("duration_s"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max(F.col("event_type") == "purchase").alias("converted"),
    )


@query(
    "g8_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'click' THEN ts END) AS c,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM events GROUP BY user_id
    ), d AS (
      SELECT (epoch_us(p) - epoch_us(c)) / 1000000.0 AS dt
      FROM firsts WHERE c IS NOT NULL AND p IS NOT NULL AND p >= c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(dt, 0.5), 4) AS p50_s,
           round(quantile_cont(dt, 0.9), 4) AS p90_s,
           round(quantile_cont(dt, 0.99), 4) AS p99_s,
           round(avg(dt), 4) AS mean_s
    FROM d
    """,
)
def g8_time_to_convert(spark, sf_dir):
    """Funnel latency distribution: per user, first click → first
    purchase delta; one summary row with converted count and p50 /
    p90 / p99 / mean seconds — the latency readout g4's step-count
    funnel doesn't give. One per-user conditional-min aggregation
    (map-side partials) then a 1-row percentile aggregate over
    user-count rows (bounded). Deltas computed microsecond-exactly
    (the g7 lesson); quantile interpolation rides the a8-certified
    pair, absorbed by the 4-decimal round."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts")))
        .alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("p"),
    )
    d = firsts.where(
        F.col("c").isNotNull() & F.col("p").isNotNull()
        & (F.col("p") >= F.col("c"))
    ).select(
        ((F.unix_micros("p") - F.unix_micros("c")) / 1_000_000.0)
        .alias("dt")
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("dt", F.lit(0.5)), 4).alias("p50_s"),
        F.round(F.percentile("dt", F.lit(0.9)), 4).alias("p90_s"),
        F.round(F.percentile("dt", F.lit(0.99)), 4).alias("p99_s"),
        F.round(F.avg("dt"), 4).alias("mean_s"),
    )
