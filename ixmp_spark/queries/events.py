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
