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


def zscore_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    window: int = 5,
    threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection per key: each value is
    compared against the mean/stddev of the PREVIOUS ``window``
    observations of the same key (strictly preceding frame — the
    current value never contaminates its own baseline, the classic
    self-masking bug in rolling anomaly detectors).

    One shuffle on the key; the frame is O(window) rows of state per
    task. Rows without a computable baseline (fewer than 2 prior
    observations, or zero variance) get ``z = NULL`` and are never
    flagged — a constant series then alarms only via the caller's
    absolute-delta gates, not a 0/0."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(order_col))
        .rowsBetween(-window, -1)
    )
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.when(
        sd.isNotNull() & (sd > 0), (F.col(value_col) - mu) / sd
    )
    return df.select(
        order_col,
        key_col,
        value_col,
        F.round(mu, 6).alias("baseline_mean"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def top_paths(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_col: str = "event_id",
    length: int = 3,
    k: int = 20,
) -> DataFrame:
    """Most-frequent event paths of ``length`` consecutive steps per
    user (the journey-analysis companion to ``event_transitions``'
    single-step matrix): one ``lead`` per additional step over the same
    per-user window — one shuffle on the user key regardless of path
    length — then a path aggregation and a TakeOrdered top-k. Paths
    never cross users; rows whose window runs off the end of a user's
    history are excluded (complete paths only). Deterministic via the
    ``order_col`` tie-break."""
    if length < 2:
        raise ValueError("length must be >= 2")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_col))
    steps = [F.col(event_col)] + [
        F.lead(event_col, i).over(w) for i in range(1, length)
    ]
    return (
        df.select(F.concat_ws(" > ", *steps).alias("path"), steps[-1].alias("__last"))
        .where(F.col("__last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(k)
    )
