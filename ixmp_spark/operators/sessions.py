"""Sessionization & time-window operators (batch form of SURVEY.md §2.9).

The reference has no streaming surface; these are the engine's extension
operators. The batch implementations here are gap-based sessionization
(lag + cumulative flag sum) and tumbling-window aggregation (date_trunc).
The streaming twins live in ixmp_spark/streaming/ (session_window +
watermarks over readStream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tie_break: str,
) -> DataFrame:
    """Assign a per-user session id: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``.

    lag + running sum of new-session flags — two window passes over the
    same (user) partitioning, so one shuffle total. Deterministic total
    order via (ts, tie_break).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_break)
    # cast("double") = epoch seconds incl. fractional part — matches
    # DuckDB's epoch(); an integer-seconds cast would truncate microseconds
    # and misclassify gaps right at the threshold.
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def tumbling_agg(
    df: DataFrame, ts_col: str, duration: str, *group_cols: str
) -> DataFrame:
    """Tumbling-window aggregation via date_trunc (batch twin of streaming
    ``window()``): count + sum(value) per (window_start, groups)."""
    return (
        df.withColumn("window_start", F.date_trunc(duration, F.col(ts_col)))
        .groupBy("window_start", *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_col: str = "event_id",
    k: int = 50,
) -> DataFrame:
    """Markov transition matrix over per-user event paths: for each
    observed (src → dst) consecutive pair, its count and the conditional
    probability P(dst | src) — the path-analysis primitive behind "what
    do users do after X" dashboards and behavioral-cloning datasets.

    Plan shape: ``lead`` over a per-user window (ONE shuffle on the
    user key — the natural partitioning, since paths never cross
    users), then a pair aggregation (second keyed shuffle with map-side
    partials) and a src-keyed window for the row-count normalizer. The
    global top-k is TakeOrderedAndProject — the pair table (|event
    types|²) is never globally sorted. ``order_col`` breaks same-
    timestamp ties so the path — and therefore the matrix — is a pure
    function of the data, not the partitioning."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    pairs = (
        df.select(
            F.col(event_col).alias("src"),
            F.lead(event_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    src_total = Window.partitionBy("src")
    return (
        pairs.withColumn(
            "prob", F.round(F.col("n") / F.sum("n").over(src_total), 6)
        )
        .orderBy(F.desc("n"), F.asc("src"), F.asc("dst"))
        .limit(k)
    )
