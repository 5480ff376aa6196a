"""Streaming ingest + windowed aggregation over event streams.

Design (SURVEY.md §2.9): ``ts_data``/events as a streaming source/sink —
``readStream`` → transforms → ``writeStream`` with watermarks for late
data. Batch twins of these operators live in operators/sessions.py; the
functions here build the *streaming* plans so the same logic runs
incrementally:

- ``stream_events``: file-source stream over a parquet directory (stands
  in for Kafka/Kinesis locally; swap ``format``+options on a cluster).
- ``tumbling_counts``: watermarked tumbling-window counts/sums
  (``window(ts, '1 hour')``) — late rows beyond the watermark dropped.
- ``session_aggregates``: native ``session_window`` gap sessionization —
  the streaming twin of operators/sessions.sessionize.
- ``dedup_stream``: ``dropDuplicatesWithinWatermark`` keyed dedup.
- ``interval_join_stream``: watermarked stream-stream interval join
  (click → purchase within N minutes) with derived per-side state bounds.
- ``write_ts_sink``: append stream into a run-partitioned parquet/Delta
  directory with checkpointing (exactly-once via the sink's commit log).

Tests drive these with availableNow triggers + memory sinks, which
exercises the identical incremental plans the always-on mode runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(
    spark: SparkSession, path: str, schema: str = EVENTS_SCHEMA
) -> DataFrame:
    """File-source stream (one file per micro-batch by default)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation: the streaming twin of
    operators/sessions.tumbling_agg. State is bounded by the watermark —
    windows older than (max event time − watermark) are finalized and
    evicted, so the operator runs indefinitely at stable memory.

    Late-data semantics AS MEASURED on Spark 4.1.2 (pinned by
    test_streaming_late_data_semantics_measured, because the folklore
    "older than watermark ⇒ dropped" is wrong in an important way):
    stragglers arriving in the same run as the data that advanced the
    watermark are still ABSORBED into their window — the late-events
    filter uses the watermark committed at query start — so replaying
    unordered history through a fresh query is lossless. Only once a
    window is finalized (watermark committed past it, e.g. across a
    restart) are late rows dropped — counted in
    numRowsDroppedByWatermark — and closed windows never revise."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_aggregates(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session_window sessionization (streaming twin of the batch
    lag+cumsum sessionize): per-user sessions close after ``gap`` of
    inactivity; watermark bounds state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful stream dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream–static enrichment join: decorate a stream with a
    codelist/dimension table (user → segment, region → canonical, …).

    The static side broadcasts into every micro-batch — no state store,
    no watermark needed (stream-STATIC joins are stateless; only
    stream-stream joins buffer). On a cluster the static side is
    re-resolved per batch for Delta tables, so slowly-changing dims pick
    up updates between micro-batches."""
    return events.join(F.broadcast(dim), on, how)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    interval: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join — the standard
    late-arriving-fact correlation: pair each left event with every
    right event of the same key whose timestamp falls in
    ``(left.ts, left.ts + interval]`` (e.g. click → purchase within 30
    minutes). Inner join, so matches emit as soon as both sides arrive;
    no waiting for watermark closure.

    State budget (why this runs indefinitely at stable memory): with a
    watermark on BOTH inputs plus the two-sided time-range condition,
    Spark derives per-side state retention — left rows are buffered
    until the right watermark passes ``left.ts + interval`` (they can
    no longer match), right rows until the left watermark passes
    ``right.ts`` — so each side's state is bounded by
    rate × (watermark + interval), independent of stream length. Without
    the range condition the state would grow forever; this operator
    makes the bound impossible to forget by constructing the condition
    from its arguments.

    Output: (key, left_ts, left_type, right_ts, right_type, value_sum,
    lag_s). The batch twin is the identical join on static frames
    (tested for multiset equality in tests)."""
    lw = left.withWatermark("ts", watermark).alias("l")
    rw = right.withWatermark("ts", watermark).alias("r")
    cond = F.expr(
        f"l.{on} = r.{on} AND r.ts > l.ts AND r.ts <= l.ts + interval {interval}"
    )
    return lw.join(rw, cond, "inner").select(
        F.col(f"l.{on}").alias(on),
        F.col("l.ts").alias("left_ts"),
        F.col("l.event_type").alias("left_type"),
        F.col("r.ts").alias("right_ts"),
        F.col("r.event_type").alias("right_type"),
        F.round(F.col("l.value") + F.col("r.value"), 4).alias("value_sum"),
        (
            F.unix_timestamp("r.ts") - F.unix_timestamp("l.ts")
        ).cast("long").alias("lag_s"),
    )


def write_ts_sink(
    df: DataFrame, path: str, checkpoint: str, partition_by: str = "event_type"
):
    """Append sink with checkpointed exactly-once semantics. On a cluster
    the format is 'delta' (transactional appends); parquet locally."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(partition_by)
        .trigger(availableNow=True)
        .start()
    )


def running_user_totals(
    events: DataFrame, timeout_minutes: int | None = None
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (the north-star
    construct for operators Structured Streaming lacks natively): per-user
    lifetime running totals that survive across micro-batches.

    State = (n_events, sum_value) per user; each micro-batch folds its
    rows into the state and emits the updated totals.

    ``timeout_minutes`` evicts state after processing-time inactivity,
    bounding memory for the long tail of one-visit users — use it for
    always-on streams only: with ``availableNow``/drain-and-stop triggers
    a processing-time timeout keeps scheduling state-cleanup batches after
    the input is exhausted and the query never terminates (observed on
    Spark 4.1), so the default is NoTimeout.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"
    use_timeout = timeout_minutes is not None

    def fold(key, pdfs, state: GroupState):
        if use_timeout and state.hasTimedOut:
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        if use_timeout:
            state.setTimeoutDuration(timeout_minutes * 60_000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)]}
        )

    # project to the two columns the fold reads BEFORE the Python
    # boundary (guide §4.1): Spark cannot see which columns the opaque
    # function touches and would otherwise ship every event column
    # through Arrow each micro-batch
    return events.select("user_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def zscore_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    window: int = 5,
    threshold: float = 2.0,
) -> DataFrame:
    """Streaming twin of ``sessions.zscore_anomalies`` (w10): per-key
    trailing-window z-score against the previous ``window`` observations,
    state carried across micro-batches via ``applyInPandasWithState``.

    Semantics match the batch operator exactly — strictly-preceding
    frame (a value never baselines itself), mean over up to ``window``
    prior values, z NULL (never flagged) below 2 priors or at zero
    variance — so the batch form IS the backfill path and this is the
    live path, like dedup vs dedup_stream_vs_index.

    State: the last ``window`` values per key — O(window · #keys)
    bounded regardless of stream length (8 B × window per key). Caller
    contract: per-key event-time order must hold ACROSS micro-batches
    (within a batch this operator sorts by (ts, order); across batches
    the state is a suffix, so an out-of-order replay would baseline
    against the wrong suffix — feed historical replays in time order,
    which file/Kafka sources do naturally for time-partitioned data)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{order_col} long, {key_col} {key_type}, {value_col} double, "
        "baseline_mean double, z double, is_anomaly boolean"
    )
    state_schema = "vals array<double>"

    def score(key, pdfs, state: GroupState):
        vals = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, order_col])
        out: dict[str, list] = {
            order_col: [], value_col: [],
            "baseline_mean": [], "z": [], "is_anomaly": [],
        }
        for r in rows.itertuples(index=False):
            v = float(getattr(r, value_col))
            base = vals[-window:]
            mu = float(np.mean(base)) if base else None
            sd = float(np.std(base, ddof=1)) if len(base) >= 2 else None
            z = (v - mu) / sd if sd is not None and sd > 0 else None
            out[order_col].append(int(getattr(r, order_col)))
            out[value_col].append(v)
            out["baseline_mean"].append(
                round(mu, 6) if mu is not None else None
            )
            out["z"].append(round(z, 6) if z is not None else None)
            out["is_anomaly"].append(
                bool(z is not None and abs(z) > threshold)
            )
            vals.append(v)
        state.update((vals[-window:],))
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(1, key_col, key[0])
        yield out_pdf

    # project to the columns the fold reads BEFORE the Python
    # boundary (guide §4.1) — the opaque function otherwise ships
    # every input column through Arrow each micro-batch
    return events.select(*[key_col, ts_col, order_col, value_col]).groupBy(key_col).applyInPandasWithState(
        score,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.5,
) -> DataFrame:
    """Streaming twin of ``sessions.ewma`` (w11): per-key exponentially
    weighted moving average, ``y_i = a·x_i + (1-a)·y_{i-1}``, the single
    running scalar carried across micro-batches via
    ``applyInPandasWithState``.

    The live path computes the recurrence LITERALLY — per key the state
    is one double (y) plus a seen flag, O(#keys) bounded regardless of
    stream length — while the batch blocked-scan operator is the
    backfill path; at dyadic alpha the two agree bit-exactly (the
    batch operator's docstring derives why). Same caller contract as
    zscore_stream: per-key event-time order must hold across
    micro-batches."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{order_col} long, {key_col} {key_type}, {value_col} double, "
        "ewma double"
    )
    state_schema = "y double, seen boolean"

    def fold(key, pdfs, state: GroupState):
        y, seen = (state.get if state.exists else (0.0, False))
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, order_col])
        out: dict[str, list] = {order_col: [], value_col: [], "ewma": []}
        for r in rows.itertuples(index=False):
            v = float(getattr(r, value_col))
            y = alpha * v + (1.0 - alpha) * (y if seen else 0.0)
            seen = True
            out[order_col].append(int(getattr(r, order_col)))
            out[value_col].append(v)
            out["ewma"].append(y)
        state.update((y, seen))
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(1, key_col, key[0])
        yield out_pdf

    # project to the columns the fold reads BEFORE the Python
    # boundary (guide §4.1) — the opaque function otherwise ships
    # every input column through Arrow each micro-batch
    return events.select(*[key_col, ts_col, order_col, value_col]).groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_stream(
    events: DataFrame,
    baseline: tuple[float, float],
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
) -> DataFrame:
    """Streaming twin of ``sessions.cusum_changepoints(baseline=…)``
    (the online monitoring form): per key the two Page statistics

        ``S_i = max(0, S_{i-1} + z_i - k)``,
        ``T_i = max(0, T_{i-1} - z_i - k)``

    with ``z_i = (x_i - mu)/sigma`` against the FIXED reference
    baseline, carried across micro-batches as two doubles of state via
    ``applyInPandasWithState`` — O(#keys) state regardless of stream
    length, the live drift monitor whose backfill path is the batch
    operator's window form. The recurrence computes LITERALLY here
    (sequential max/add per row); the batch side uses the prefix-sum /
    running-min identity — on dyadic inputs the two agree bit-exactly,
    on general doubles to ~1e-12 (identity exact in real arithmetic).
    Same caller contract as ewma_stream/zscore_stream: per-key
    event-time order must hold across micro-batches."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    mu, sigma = float(baseline[0]), float(baseline[1])
    if sigma <= 0:
        raise ValueError("baseline sigma must be positive")
    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{order_col} long, {key_col} {key_type}, {value_col} double, "
        "cusum_high double, cusum_low double, is_change boolean"
    )
    state_schema = "s double, t double"
    k, h = float(slack_k), float(threshold_h)

    def fold(key, pdfs, state: GroupState):
        s, t = (state.get if state.exists else (0.0, 0.0))
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, order_col])
        out: dict[str, list] = {
            order_col: [], value_col: [],
            "cusum_high": [], "cusum_low": [], "is_change": [],
        }
        for r in rows.itertuples(index=False):
            v = float(getattr(r, value_col))
            z = (v - mu) / sigma
            s = max(0.0, s + z - k)
            t = max(0.0, t - z - k)
            out[order_col].append(int(getattr(r, order_col)))
            out[value_col].append(v)
            out["cusum_high"].append(s)
            out["cusum_low"].append(t)
            out["is_change"].append(s > h or t > h)
        state.update((s, t))
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(1, key_col, key[0])
        yield out_pdf

    # project to the columns the fold reads BEFORE the Python
    # boundary (guide §4.1) — the opaque function otherwise ships
    # every input column through Arrow each micro-batch
    return events.select(*[key_col, ts_col, order_col, value_col]).groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def state_durations_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of ``sessions.state_durations`` (w22): per key,
    collapse consecutive same-state events into episodes, carrying the
    OPEN episode (state, start, last-seen, row count) as a few scalars
    of state via ``applyInPandasWithState``. An episode EMITS when the
    state flips to something else — append semantics: only CLOSED
    episodes leave the operator, the open tail stays in state until a
    later batch closes it (the batch operator is the backfill path
    that also reports open tails). O(#keys) state regardless of
    stream length; per-key event-time order across micro-batches is
    the usual caller contract.

    Output (closed episodes): (key, state, start_ts, end_ts,
    duration_s, n_rows) — duration microsecond-exact, matching the
    batch twin's rows for every episode the stream has closed."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    state_type = events.schema[state_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, state {state_type}, "
        "start_ts timestamp, end_ts timestamp, duration_s long, "
        "n_rows long"
    )
    # epoch-micros in state: timestamps round-trip exactly as longs
    state_schema = (
        "cur string, seen boolean, start_us long, end_us long, n long"
    )

    def fold(key, pdfs, state: GroupState):
        cur, seen, start_us, end_us, n = (
            state.get if state.exists else (None, False, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, order_col])
        out = []
        for r in rows.itertuples(index=False):
            st = getattr(r, state_col)
            st = None if pd.isna(st) else str(st)
            us = int(getattr(r, ts_col).value // 1_000)
            same = seen and (st == cur or (st is None and cur is None))
            if same:
                end_us, n = us, n + 1
            else:
                if seen:
                    out.append(
                        (key[0], cur, start_us, end_us,
                         (end_us - start_us) // 1_000_000, n)
                    )
                cur, seen, start_us, end_us, n = st, True, us, us, 1
        state.update((cur, seen, start_us, end_us, n))
        if out:
            pdf = pd.DataFrame(
                out,
                columns=[key_col, "state", "start_us", "end_us",
                         "duration_s", "n_rows"],
            )
            pdf["start_ts"] = pd.to_datetime(pdf.pop("start_us"), unit="us")
            pdf["end_ts"] = pd.to_datetime(pdf.pop("end_us"), unit="us")
            yield pdf[[key_col, "state", "start_ts", "end_ts",
                       "duration_s", "n_rows"]]

    # project to the columns the fold reads BEFORE the Python
    # boundary (guide §4.1) — the opaque function otherwise ships
    # every input column through Arrow each micro-batch
    return events.select(*[key_col, ts_col, order_col, state_col]).groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_timeseries_ingest(ts, stream_df: DataFrame, checkpoint: str):
    """Streaming ingest into the versioned store: each micro-batch becomes
    one check_out → add_timeseries_bulk → commit transaction (the
    warehouse's atomic snapshot swap), so readers only ever see complete
    batches — the streaming twin of the reference's transactional
    ``add_timeseries``. Exactly-once across restarts comes from the
    checkpointed source offsets + idempotent key upsert.

    ``stream_df`` must carry region/variable/unit/year/value (+ optional
    subannual) columns.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ts.check_out()
        try:
            ts.add_timeseries_bulk(batch_df)
            ts.commit(f"stream micro-batch {batch_id}")
        except Exception:
            ts.discard_changes()
            raise

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, mode: str = "append"
) -> DataFrame:
    """Execute a streaming plan over all currently-available input via a
    memory sink; returns the materialized result (test/driver helper).

    mode: 'append' for row streams; 'complete' for aggregations (with
    availableNow the final watermark never advances past the last window,
    so append mode would hold back unclosed windows)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def run_available_now_with_state(
    stream_df: DataFrame, query_name: str, mode: str = "append"
) -> tuple[DataFrame, list[dict]]:
    """Like :func:`run_available_now` but also returns the final
    micro-batch's ``stateOperators`` progress block (one dict per
    stateful operator: ``numRowsTotal``, ``memoryUsedBytes``, ...).

    This is how a state-bound CONTRACT becomes a state-bound
    MEASUREMENT: every stateful operator in this module documents its
    retention formula (≈ rate × (watermark + interval) for the interval
    joins, unique-novel-digests for dedup); tests drive a long
    availableNow run through this helper and assert the observed
    ``numRowsTotal`` stays inside the documented bound instead of
    trusting the docstring (VERDICT r5 #4)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    last = q.lastProgress or {}
    return spark.table(query_name), list(last.get("stateOperators") or [])


DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_documents(
    spark: SparkSession, path: str, schema: str = DOCS_SCHEMA
) -> DataFrame:
    """File-source stream over a documents directory — incremental
    ingestion of a crawl drop (locally parquet files; Kafka/Kinesis or
    auto-loader on a cluster)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def curate_documents_stream(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_quality: float = 0.0,
) -> DataFrame:
    """Streaming curation: per-document quality gates + STATEFUL exact
    dedup by normalized-content digest, the incremental twin of
    d1_exact_dedup + t1's quality filters.

    The dedup key is md5(normalized text) — 16 bytes of state per unique
    document seen, kept forever (``dropDuplicates`` without watermark:
    exact-dedup semantics require remembering every digest; the state
    store scales as O(unique docs · 16 B), which is the same budget the
    batch groupBy carries). For a bounded-state variant at ingest rates
    where that matters, key the stream by (digest, ingest-day) upstream
    and run the cross-day pass in batch — the standard lambda split.

    Stateless per-row gates run BEFORE the stateful operator so dropped
    rows never enter the state store.
    """
    from ixmp_spark.operators.dedup import normalize_text
    from ixmp_spark.operators.text import quality_score, token_count

    gated = (
        docs.withColumn("__toks", token_count(F.col("text")))
        .withColumn("__q", quality_score(F.col("text")))
        .where(
            (F.col("__toks") >= min_tokens)
            & (F.col("__toks") <= max_tokens)
            & (F.col("__q") >= min_quality)
        )
    )
    return (
        gated.withColumn("__digest", F.md5(normalize_text("text")))
        .dropDuplicates(["__digest"])
        # drop ALL helper columns so the curated stream's schema matches
        # its batch twin exactly (leaking __q diverged them before)
        .drop("__toks", "__q", "__digest")
    )


def strip_common_lines_stream(
    docs: DataFrame,
    templates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Streaming twin of ``text.strip_common_lines``: live documents are
    cleaned against a BATCH-BUILT template set — the same split as
    dedup_stream_vs_index (batch = the index/backfill path, stream = the
    live path). Template discovery needs the whole corpus (a line is
    chrome because it recurs across documents), so it cannot run inside
    an append-mode stream; what CAN run per micro-batch is the
    map-side cleanse against the known templates.

    ``templates``: (group, line) — e.g.
    ``strip_common_lines``'s counts stage, or its output re-derived as
    ``(group_col, template line)`` rows — a static frame. The stream
    joins it per group ONCE (stream-static joins re-read the static
    side per micro-batch; keep it parquet-backed and compact), collects
    the group's template lines into one array via a pre-aggregated
    static frame, and filters each document's lines with an array
    lambda — stateless, append-safe, no watermark needed.

    Output: (id, group, clean_text, n_lines_kept, n_lines_dropped) —
    the same schema as the batch operator."""
    tmpl = (
        templates.groupBy(F.col(group_col))
        .agg(F.collect_list("line").alias("__tmpl"))
    )
    lines = F.split(F.col(text_col), "\n")
    joined = docs.join(tmpl, group_col, "left")
    kept = F.transform(
        F.filter(
            lines,
            lambda x: ~F.coalesce(
                F.array_contains(F.col("__tmpl"), F.trim(x)), F.lit(False)
            ),
        ),
        lambda x: F.trim(x),
    )
    return joined.select(
        F.col(id_col),
        F.col(group_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_dropped"),
    )


def trending_ngrams_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    n: int = 2,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    min_count: int = 2,
) -> DataFrame:
    """Windowed corpus n-gram counts over a document ingest stream — the
    streaming twin of text.top_ngrams per event-time window (a trending
    boilerplate / contamination-gram monitor on a live crawl feed).

    Emits (window_start, gram, n) for grams reaching ``min_count``
    within a tumbling window. Deliberately NO global top-k inside the
    stream: ranking per trigger would need complete output mode — a
    single-partition global sort re-emitting every window on every
    micro-batch. The scale-correct split is count-in-stream (bounded
    state, append mode) + rank-in-batch (t11's TakeOrdered over the
    tiny emitted table). State budget: one counter per (window, distinct
    gram) inside the watermark horizon — windows older than (max event
    time − watermark) finalize and evict; gram explosion is map-side
    BEFORE the stateful aggregation, so the state store holds counters,
    never document text. ``min_count`` filters post-aggregation (it
    cannot reduce state, only output)."""
    from ixmp_spark.operators.text import word_ngrams

    return (
        docs.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(word_ngrams(text_col, n)).alias("gram"))
        .groupBy(F.window(ts_col, duration).alias("win"), "gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .select(F.col("win.start").alias("window_start"), "gram", "n")
    )


def dedup_stream_vs_index(
    docs: DataFrame,
    seen_digests: DataFrame,
    text_col: str = "text",
    digest_col: str = "digest",
) -> DataFrame:
    """Streaming twin of ``dedup.incremental_dedup``: drop incoming
    documents whose content digest is already in a STATIC history index,
    then stateful exact dedup among the survivors — the steady-state
    ingest path once a corpus is live (the batch operator handles
    backfills; this handles the live feed).

    Plan shape per micro-batch: map-side digest, stream-static LEFT ANTI
    join against the index (re-read per trigger — refresh the index
    table and running streams pick it up, the standard slowly-changing
    stream-static contract), then ``dropDuplicates`` on the digest for
    within-stream repeats (16 B of state per UNIQUE new document; the
    index handles everything historical, so state grows only with
    genuinely novel content).

    STATE-BOUND CONTRACT, stated precisely: ``dropDuplicates`` without a
    watermark retains every novel digest for the LIFE OF THE QUERY —
    refreshing the static index does NOT evict state already inside the
    running query; only a query RESTART does. The operational loop is
    therefore: periodically fold the sink's digests into the index and
    restart the stream, which resumes with empty dedup state because the
    anti-join now filters everything historical. Between restarts, state
    grows at (novel-doc rate × time-since-restart) × 16 B. When rows
    carry event time, ``dropDuplicatesWithinWatermark`` bounds state
    without restarts at the cost of admitting duplicates older than the
    watermark — the wrong trade for exact corpus dedup, where a repeat
    of last month's document must still be dropped (that is the index's
    job, which is why the restart loop is the recommended deployment).

    ``seen_digests``: 1-column static frame of md5 hex digests. Output:
    the surviving rows with ``digest_col`` attached (a foreachBatch sink
    appends them to the index)."""
    from ixmp_spark.operators.dedup import normalize_text

    seen = seen_digests.select(
        F.col(seen_digests.columns[0]).alias(digest_col)
    )
    return (
        docs.withColumn(digest_col, F.md5(normalize_text(text_col)))
        .join(seen, digest_col, "left_anti")
        .dropDuplicates([digest_col])
    )


def interval_join_stream_outer(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    interval: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant of ``interval_join_stream`` — the
    conversion-funnel shape where the ABSENCE of a match is the signal
    (click with no purchase within the interval). Same join condition
    and per-side state bounds, but different EMISSION semantics:
    matches emit as soon as both sides arrive, while a left row with no
    match emits (right columns NULL) only once the right watermark
    passes ``left.ts + interval`` — the earliest moment "no match" is a
    fact rather than "not yet". That makes null-row latency ≈ watermark
    + interval BY DESIGN; lowering the watermark trades late-data
    tolerance for fresher no-match signals. Outer stream-stream joins
    REQUIRE the watermark + range condition (Spark rejects the query
    otherwise) — the unbounded-state formulation is unplannable by
    construction.

    Output schema equals the inner variant's, with right-side fields
    NULL for unmatched left rows and ``matched`` boolean.

    CALLER CONTRACT (both variants): ``left`` and ``right`` must be
    built from SEPARATE ``readStream`` source instances, even when they
    read the same path. Filtering one shared source twice creates a
    stream self-join whose shared watermark/source node silently
    suppresses matches (observed: every left row finalized as no-match
    while its pair sat in the same directory)."""
    lw = left.withWatermark("ts", watermark).alias("l")
    rw = right.withWatermark("ts", watermark).alias("r")
    cond = F.expr(
        f"l.{on} = r.{on} AND r.ts > l.ts AND r.ts <= l.ts + interval {interval}"
    )
    return lw.join(rw, cond, "left_outer").select(
        F.col(f"l.{on}").alias(on),
        F.col("l.ts").alias("left_ts"),
        F.col("l.event_type").alias("left_type"),
        F.col("r.ts").alias("right_ts"),
        F.col("r.event_type").alias("right_type"),
        F.col("r.ts").isNotNull().alias("matched"),
    )


def seasonal_baseline_stream(
    events: DataFrame,
    profile: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    min_n: int = 2,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of ``sessions.seasonal_baseline``: live events are
    scored against a BATCH-BUILT seasonal profile — the same
    index/live split as dedup_stream_vs_index and
    strip_common_lines_stream. The profile (per-(key, slot) mean/
    stddev) inherently needs history, so it stays batch; what CAN run
    per micro-batch is the map-side scoring join — stateless,
    append-safe, no watermark needed, and the stream-static join
    re-reads the (keys×24)-row static side per micro-batch, which is
    exactly the broadcast the batch twin uses.

    ``profile``: the static frame ``seasonal_baseline``'s groupBy
    stage produces — (key, season_slot, _mu, _sd, _n) — typically
    re-derived nightly and parquet-backed. Column spelling matches the
    batch operator so a profile written by one feeds the other.

    Output: input + season_slot, expected, seasonal_z, is_spike (the
    batch twin's schema).
    """
    slot = F.hour(F.col(ts_col)).cast("long")
    v = F.col(value_col).cast("double")
    base = events.withColumn("season_slot", slot)
    joined = base.join(profile, [key_col, "season_slot"], "left")
    z = F.when(
        (F.col("_n") >= int(min_n)) & (F.col("_sd") > 0),
        (v - F.col("_mu")) / F.col("_sd"),
    )
    return (
        joined.withColumn("expected", F.col("_mu"))
        .withColumn("seasonal_z", z)
        .withColumn(
            "is_spike",
            F.coalesce(F.abs(z) > F.lit(float(threshold)), F.lit(False)),
        )
        .drop("_mu", "_sd", "_n")
    )


def attribution_stream(
    events: DataFrame,
    conversion_value: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    event_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of ``sessions.attribution``: live first/last-
    touch credit for every conversion as it happens. Per key the state
    is exactly three scalars — first touch, last touch, touch count —
    carried across micro-batches via ``applyInPandasWithState``
    (O(#keys) state regardless of stream length, same contract as
    cusum_stream: per-key event-time order across micro-batches). A
    conversion row emits with the state AS OF strictly before it (it
    never credits itself), matching the batch operator's
    strictly-preceding frame; touches only update state. Unbounded
    lookback by design — bound it with a state TTL in deployments
    where credit expires.

    Output per conversion: (order, key, first_touch, last_touch,
    n_touches) — the batch twin's schema.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{order_col} long, {key_col} {key_type}, first_touch string, "
        "last_touch string, n_touches long"
    )
    state_schema = "first string, last string, n long"

    def fold(key, pdfs, state: GroupState):
        first, last, n = (
            state.get if state.exists else (None, None, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, order_col])
        out: dict[str, list] = {
            order_col: [], "first_touch": [], "last_touch": [],
            "n_touches": [],
        }
        for r in rows.itertuples(index=False):
            ev = getattr(r, event_col)
            if ev == conversion_value:
                out[order_col].append(int(getattr(r, order_col)))
                out["first_touch"].append(first)
                out["last_touch"].append(last)
                out["n_touches"].append(int(n))
            else:
                if first is None:
                    first = ev
                last = ev
                n += 1
        state.update((first, last, n))
        if not out[order_col]:
            return
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(1, key_col, key[0])
        yield out_pdf

    # project to the columns the fold reads BEFORE the Python
    # boundary (guide §4.1) — the opaque function otherwise ships
    # every input column through Arrow each micro-batch
    return events.select(*[key_col, ts_col, order_col, event_col]).groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def gap_report_stream(
    events: DataFrame,
    min_gap_s: float = 3600.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``sessions.gap_report``: a silence longer
    than ``min_gap_s`` is reported the moment the key's NEXT event
    arrives — the live "sensor went dark" alert whose backfill path
    is the batch operator. State is ONE timestamp per key (the last
    observation), carried via ``applyInPandasWithState`` — O(#keys)
    regardless of stream length, same per-key event-time-order
    contract as cusum_stream. A still-dark key emits nothing (no
    event, no trigger) — pair with a state-timeout watchdog when
    open-ended silence itself must alert; that variant needs a
    timeout clock, not history, which is why the batch twin doesn't
    have it either.

    Output per detected gap: (key, gap_start, gap_end, gap_s) — the
    batch schema.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, gap_start timestamp, "
        "gap_end timestamp, gap_s double"
    )
    state_schema = "last_us long"
    thresh_us = float(min_gap_s) * 1_000_000.0

    def fold(key, pdfs, state: GroupState):
        last_us = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(ts_col)
        out: dict[str, list] = {
            "gap_start": [], "gap_end": [], "gap_s": [],
        }
        for ts in rows[ts_col]:
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and (us - last_us) > thresh_us:
                out["gap_start"].append(
                    pd.Timestamp(last_us * 1000)
                )
                out["gap_end"].append(pd.Timestamp(us * 1000))
                out["gap_s"].append((us - last_us) / 1_000_000.0)
            last_us = us
        state.update((last_us,))
        if not out["gap_s"]:
            return
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(0, key_col, key[0])
        yield out_pdf

    # project to the columns the fold reads BEFORE the Python
    # boundary (guide §4.1) — the opaque function otherwise ships
    # every input column through Arrow each micro-batch
    return events.select(*[key_col, ts_col]).groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sprt_stream(
    events: DataFrame,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    grain: str = "hour",
    key_col: str = "experiment",
    ts_col: str = "ts",
    y_col: str = "y",
) -> DataFrame:
    """Streaming twin of ``sampling.sprt_monitor`` (VERDICT r12 Next
    #6): Wald's group-sequential SPRT checked at time-grain
    checkpoints, live. A sequential test is the single most natural
    streaming operator in the catalog — the whole point is deciding
    DURING the experiment — and its state is tiny by construction:
    per key, the open checkpoint plus the cumulative (n, k) BEFORE it
    and the first-crossing marker (the w36 two-scalar pattern),
    carried via ``applyInPandasWithState``. O(#keys) state regardless
    of stream length.

    Checkpoint semantics match the batch twin: events truncate to
    ``grain``; a checkpoint EMITS when the key's first event of a
    LATER checkpoint arrives (closing it), carrying the cumulative
    llr/state/decided at that point. The still-open final checkpoint
    never emits (no later event closes it) — the batch-equality
    contract is therefore "stream output = batch trace minus each
    key's last checkpoint", exactly the gap_report_stream shape where
    a still-dark key emits nothing. ``decided`` marks the FIRST
    boundary crossing per key, remembered across micro-batches.

    Labels are Bernoulli 0/1 (NULLs excluded, as in the batch twin);
    per-key event-time order must hold across micro-batches (the
    cusum_stream caller contract)."""
    import math as _math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not (0.0 < p0 < 1.0 and 0.0 < p1 < 1.0 and p0 != p1):
        raise ValueError("p0 and p1 must be distinct probabilities in (0,1)")
    if not (0.0 < alpha < 1.0 and 0.0 < beta < 1.0):
        raise ValueError("alpha and beta must be in (0,1)")
    la = _math.log(p1 / p0)
    lb = _math.log((1.0 - p1) / (1.0 - p0))
    upper = _math.log((1.0 - beta) / alpha)
    lower = _math.log(beta / (1.0 - alpha))
    freq = {"minute": "min", "hour": "h", "day": "D"}.get(grain)
    if freq is None:
        raise ValueError(f"unsupported grain {grain!r}")

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, checkpoint timestamp, n_cum long, "
        "k_cum long, llr double, state string, decided boolean"
    )
    # open-checkpoint epoch seconds (-1 = none), counts inside it,
    # cumulative counts before it, first-crossing epoch (-1 = none)
    state_schema = (
        "cp long, n_in long, k_in long, n_bef long, k_bef long, dec long"
    )

    def fold(key, pdfs, state: GroupState):
        cp, n_in, k_in, n_bef, k_bef, dec = (
            state.get if state.exists else (-1, 0, 0, 0, 0, -1)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.dropna(subset=[ts_col, y_col])
        if rows.empty:
            state.update((cp, n_in, k_in, n_bef, k_bef, dec))
            return
        rows = rows.sort_values(ts_col)
        out: dict[str, list] = {
            "checkpoint": [], "n_cum": [], "k_cum": [],
            "llr": [], "state": [], "decided": [],
        }

        def close(cp_s: int):
            nonlocal n_bef, k_bef, n_in, k_in, dec
            n_cum, k_cum = n_bef + n_in, k_bef + k_in
            llr = k_cum * la + (n_cum - k_cum) * lb
            st = (
                "accept_h1" if llr >= upper
                else "accept_h0" if llr <= lower
                else "continue"
            )
            decided = st != "continue" and dec == -1
            if decided:
                dec = cp_s
            out["checkpoint"].append(pd.Timestamp(cp_s * 1_000_000_000))
            out["n_cum"].append(n_cum)
            out["k_cum"].append(k_cum)
            out["llr"].append(round(llr, 6))
            out["state"].append(st)
            out["decided"].append(decided)
            n_bef, k_bef, n_in, k_in = n_cum, k_cum, 0, 0

        cps = rows[ts_col].dt.floor(freq)
        for cp_ts, grp in rows.groupby(cps, sort=True):
            e = int(pd.Timestamp(cp_ts).value // 1_000_000_000)
            if cp != -1 and e != cp:
                close(cp)
            cp = e
            n_in += len(grp)
            k_in += int(round(float(grp[y_col].sum())))
        state.update((cp, n_in, k_in, n_bef, k_bef, dec))
        if not out["checkpoint"]:
            return
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(0, key_col, key[0])
        yield out_pdf

    # project to the columns the fold reads BEFORE the Python
    # boundary (guide §4.1) — the opaque function otherwise ships
    # every input column through Arrow each micro-batch
    return events.select(*[key_col, ts_col, y_col]).groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def confusion_cells_stream(
    events: DataFrame,
    key_col: str = "model",
    label_col: str = "label",
    pred_col: str = "pred",
    ts_col: str = "ts",
    grain: str = "hour",
) -> DataFrame:
    """Streaming twin of ``sampling.confusion_cells_trace`` (VERDICT
    r13 #6): the running multi-class confusion grid, live. State is
    keyed by the (model, label, pred) CELL — three longs per cell
    (open checkpoint, in-checkpoint count, cumulative-before count),
    so total state is O(|keys|·|classes|²) regardless of stream
    length, the sprt_stream flat-state discipline. A cell's checkpoint
    EMITS when that cell's first event of a LATER checkpoint arrives;
    the still-open final checkpoint never emits — batch-equality
    contract: stream output = trace minus each cell's last checkpoint
    (the sprt/gap_report shape). ``confusion_metrics``'s per-class
    report derives from any checkpoint's grid slice by bounded
    marginal algebra."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    freq = {"minute": "min", "hour": "h", "day": "D"}.get(grain)
    if freq is None:
        raise ValueError(f"unsupported grain {grain!r}")
    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, label string, pred string, "
        "checkpoint timestamp, n_cum long"
    )
    state_schema = "cp long, n_in long, n_bef long"
    src = events.select(
        F.col(key_col),
        F.col(label_col).cast("string").alias("label"),
        F.col(pred_col).cast("string").alias("pred"),
        F.col(ts_col).alias("__ts"),
    ).where(
        F.col("label").isNotNull()
        & F.col("pred").isNotNull()
        & F.col("__ts").isNotNull()
    )

    def fold(key, pdfs, state: GroupState):
        cp, n_in, n_bef = state.get if state.exists else (-1, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            state.update((cp, n_in, n_bef))
            return
        rows = rows.sort_values("__ts")
        out = {"checkpoint": [], "n_cum": []}

        def close(cp_s: int):
            nonlocal n_bef, n_in
            n_bef += n_in
            out["checkpoint"].append(pd.Timestamp(cp_s * 1_000_000_000))
            out["n_cum"].append(n_bef)
            n_in = 0

        cps = rows["__ts"].dt.floor(freq)
        for cp_ts, grp in rows.groupby(cps, sort=True):
            e = int(pd.Timestamp(cp_ts).value // 1_000_000_000)
            if cp != -1 and e != cp:
                close(cp)
            cp = e
            n_in += len(grp)
        state.update((cp, n_in, n_bef))
        if not out["checkpoint"]:
            return
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(0, "pred", key[2])
        out_pdf.insert(0, "label", key[1])
        out_pdf.insert(0, key_col, key[0])
        yield out_pdf

    return src.groupBy(key_col, "label", "pred").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def brier_bins_stream(
    events: DataFrame,
    key_col: str = "experiment",
    p_col: str = "p",
    y_col: str = "y",
    ts_col: str = "ts",
    grain: str = "hour",
    n_bins: int = 10,
) -> DataFrame:
    """Streaming twin of ``sampling.brier_bins_trace`` (VERDICT r13
    #6): cumulative per-probability-bin calibration sufficient
    statistics (n, Σp, Σy, Σ(p−y)²), live. State is keyed by the
    (key, bin) cell — eight scalars per cell, O(|keys|·n_bins) total.
    Bin assignment (round(p·n_bins − 0.5) clamped, computed JVM-side
    BEFORE the stateful fold) and the 6-dp emit rounding match the
    batch twin exactly; checkpoint-close semantics are the
    sprt_stream contract (final open checkpoint never emits)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    freq = {"minute": "min", "hour": "h", "day": "D"}.get(grain)
    if freq is None:
        raise ValueError(f"unsupported grain {grain!r}")
    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, bin int, checkpoint timestamp, "
        "n_cum long, sum_p double, sum_y double, sse double"
    )
    state_schema = (
        "cp long, n_in long, sp_in double, sy_in double, sse_in double, "
        "n_bef long, sp_bef double, sy_bef double, sse_bef double"
    )
    p = F.col(p_col).cast("double")
    y = F.col(y_col).cast("double")
    bin_ = F.least(
        F.greatest(F.round(p * n_bins - 0.5, 0).cast("int"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    src = events.where(
        p.isNotNull() & y.isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col),
        bin_.alias("bin"),
        F.col(ts_col).alias("__ts"),
        p.alias("_p"),
        y.alias("_y"),
        ((p - y) * (p - y)).alias("_se"),
    )

    def fold(key, pdfs, state: GroupState):
        (cp, n_in, sp_in, sy_in, sse_in, n_bef, sp_bef, sy_bef, sse_bef) = (
            state.get if state.exists
            else (-1, 0, 0.0, 0.0, 0.0, 0, 0.0, 0.0, 0.0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            state.update(
                (cp, n_in, sp_in, sy_in, sse_in, n_bef, sp_bef, sy_bef,
                 sse_bef)
            )
            return
        rows = rows.sort_values("__ts")
        out = {"checkpoint": [], "n_cum": [], "sum_p": [], "sum_y": [],
               "sse": []}

        def close(cp_s: int):
            nonlocal n_bef, sp_bef, sy_bef, sse_bef
            nonlocal n_in, sp_in, sy_in, sse_in
            n_bef += n_in
            sp_bef += sp_in
            sy_bef += sy_in
            sse_bef += sse_in
            out["checkpoint"].append(pd.Timestamp(cp_s * 1_000_000_000))
            out["n_cum"].append(n_bef)
            out["sum_p"].append(round(sp_bef, 6))
            out["sum_y"].append(round(sy_bef, 6))
            out["sse"].append(round(sse_bef, 6))
            n_in, sp_in, sy_in, sse_in = 0, 0.0, 0.0, 0.0

        cps = rows["__ts"].dt.floor(freq)
        for cp_ts, grp in rows.groupby(cps, sort=True):
            e = int(pd.Timestamp(cp_ts).value // 1_000_000_000)
            if cp != -1 and e != cp:
                close(cp)
            cp = e
            n_in += len(grp)
            sp_in += float(grp["_p"].sum())
            sy_in += float(grp["_y"].sum())
            sse_in += float(grp["_se"].sum())
        state.update(
            (cp, n_in, sp_in, sy_in, sse_in, n_bef, sp_bef, sy_bef, sse_bef)
        )
        if not out["checkpoint"]:
            return
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(0, "bin", key[1])
        out_pdf.insert(0, key_col, key[0])
        yield out_pdf

    return src.groupBy(key_col, "bin").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def category_mix_stream(
    events: DataFrame,
    cat_col: str = "event_type",
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed category counts over a live stream — the stream half of
    the distribution-drift monitor (x29's JSD applied per window
    against a reference mix). Follows trending_ngrams_stream's honest
    split: COUNT in the stream (one watermarked aggregation — Spark
    streaming forbids chained aggregations in append mode, and the
    JSD fold needs the window's complete category row set anyway),
    DIVERGE in batch over the tiny emitted table
    (:func:`jsd_drift_report`). State budget: one counter per
    (window, category) inside the watermark horizon — category-domain
    × windows, never events. NULL categories carry no mix mass and
    are dropped at the map side (the x22/x29 contract).

    Output: (window_start, category, n).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .where(F.col(cat_col).isNotNull())
        .groupBy(
            F.window(ts_col, duration).alias("win"),
            F.col(cat_col).alias("category"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "category", "n")
    )


def jsd_drift_report(
    mix: DataFrame,
    reference: DataFrame,
    threshold: float = 0.1,
) -> DataFrame:
    """Batch half of the drift monitor: per-window Jensen–Shannon
    divergence of the observed category mix against a reference
    distribution — run over :func:`category_mix_stream`'s emitted
    table (windows × categories rows, tiny by construction) or any
    batch table of the same shape.

    ``reference``: (category, ref_p) with ref_p summing to 1 (re-
    normalized defensively) — typically last month's mix, derived
    batch-side. The join is FULL outer per window: a reference
    category absent from a window contributes its exact
    ``q·ln 2 / 2`` one-sided term (p = 0), and an observed category
    missing from the reference contributes ``p·ln 2 / 2`` — the
    same no-epsilon zero-limit treatment as
    ``sampling.js_divergence``. Output one row per window:
    (window_start, n, jsd, jsd_norm, is_drift), jsd_norm in [0, 1].
    """
    import math

    ref_tot = reference.agg(F.sum("ref_p").alias("_t"))
    ref = reference.crossJoin(F.broadcast(ref_tot)).select(
        "category", (F.col("ref_p") / F.col("_t")).alias("_q")
    )
    totals = mix.groupBy("window_start").agg(F.sum("n").alias("_tot"))
    obs = mix.join(totals, "window_start").select(
        "window_start", "category",
        F.col("n").cast("double").alias("_n"),
        (F.col("n") / F.col("_tot")).alias("_p"),
    )
    # full outer on category WITHIN each window: build the window ×
    # ref-category grid, then left-join observations onto it
    wins = totals.select("window_start")
    grid = wins.crossJoin(F.broadcast(ref))
    joined = grid.join(
        obs, ["window_start", "category"], "full_outer"
    ).select(
        "window_start",
        F.coalesce(F.col("_p"), F.lit(0.0)).alias("_p"),
        F.coalesce(F.col("_q"), F.lit(0.0)).alias("_q"),
        F.coalesce(F.col("_n"), F.lit(0.0)).alias("_n"),
    )
    m = (F.col("_p") + F.col("_q")) / 2
    term = (
        F.when(F.col("_p") > 0, F.col("_p") * F.log(F.col("_p") / m))
        .otherwise(F.lit(0.0))
        + F.when(F.col("_q") > 0, F.col("_q") * F.log(F.col("_q") / m))
        .otherwise(F.lit(0.0))
    ) / 2
    agg = joined.groupBy("window_start").agg(
        F.sum("_n").cast("long").alias("n"),
        F.greatest(F.sum(term), F.lit(0.0)).alias("_jsd"),
    )
    return agg.select(
        "window_start", "n",
        F.round("_jsd", 6).alias("jsd"),
        F.round(F.col("_jsd") / math.log(2), 6).alias("jsd_norm"),
        (F.col("_jsd") / math.log(2) > threshold).alias("is_drift"),
    ).orderBy("window_start")


def active_time_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    horizon: int = 300,
) -> DataFrame:
    """Streaming twin of ``sessions.running_active_time``: per-key
    running union length of the fixed-horizon activity intervals —
    the live "seconds active so far" counter whose backfill path is
    the batch lag form. State is TWO scalars per key (last event
    epoch + running total): O(#keys) forever, the smallest state
    class in this module (cusum's shape). Same caller contract as
    ewma/zscore/cusum_stream: per-key event-time order must hold
    across micro-batches. Output per event:
    (order, key, active_s)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = f"{order_col} long, {key_col} {key_type}, active_s long"
    state_schema = "last_t long, total long"
    h = int(horizon)

    def fold(key, pdfs, state: GroupState):
        last_t, total = (state.get if state.exists else (None, 0))
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, order_col])
        out: dict[str, list] = {order_col: [], "active_s": []}
        for r in rows.itertuples(index=False):
            t = int(getattr(r, ts_col).value // 1_000_000_000)
            if last_t is None:
                total += h
            else:
                total += min(h, t - last_t)
            last_t = t
            out[order_col].append(int(getattr(r, order_col)))
            out["active_s"].append(int(total))
        state.update((last_t, total))
        out_pdf = pd.DataFrame(out)
        out_pdf.insert(1, key_col, key[0])
        yield out_pdf

    # project to the columns the fold reads BEFORE the Python
    # boundary (guide §4.1) — the opaque function otherwise ships
    # every input column through Arrow each micro-batch
    return events.select(*[key_col, ts_col, order_col]).groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
