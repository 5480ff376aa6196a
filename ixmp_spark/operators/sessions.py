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
