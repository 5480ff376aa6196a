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


#: candidate granularities for choose_bucket, coarse → fine; date_trunc
#: accepts each of them. Coarser rungs mean fewer chunk boundaries to
#: heal (lower constant) at the cost of larger — but still cap-bounded —
#: tasks; the ladder search picks the coarsest that fits the cap.
_BUCKET_LADDER = ("month", "week", "day", "hour", "minute")


def choose_bucket(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    max_rows_per_task: int = 1_000_000,
    candidates: tuple[str, ...] = _BUCKET_LADDER,
    min_chunk_rows: int = 4_096,
    sample_fraction: float | None = None,
) -> str | None:
    """Pick the time bucket for the chunked window family
    (``bucket="auto"``) — the coarsest candidate whose hottest (key,
    bucket) partition stays under the TARGET chunk size, where

    ``target = min(max_rows_per_task, max(hottest_key / parallelism,
    min_chunk_rows))``

    The cap term is the memory bound (a task must fit); the
    ``hottest_key / parallelism`` term is the SPEED bound — the r8
    granularity probe at bot40-10M (one key = 40% of rows) measured
    plain 13.9 s, week 9.7, day 7.3, hour 6.4, minute 6.5: FINER beats
    coarser until chunks shrink to ~100 rows, because splitting the hot
    key across all cores buys more than the (cheap, window-sized)
    boundary healing costs. Coarsest-under-the-cap — the r7 policy —
    picked week here, the slowest chunked rung. ``min_chunk_rows``
    floors the target so a huge cluster (parallelism ≫ hot-key rows /
    useful chunk) doesn't shatter the key into constant-dominated
    fragments; at the floor the probe showed minute ≈ hour within 2%.

    **"Don't chunk" is on the ladder too**: if the hottest (key,
    ALL-time) partition — i.e. the plain single-window plan's biggest
    task — already fits the cap, the answer is ``None`` and the caller
    takes the plain path. Chunking exists to bound skewed tasks; on
    uniform data it only adds the boundary-healing constant (measured
    ~6× on the chunked z-score at 10M uniform rows, REHEARSAL_events_r7)
    — a regime ``bucket="auto"`` must never steer INTO.

    Cost — lazy drill-down (redesigned in r8; the r7 form built a
    (key, minute) aggregate of the WHOLE corpus up front, which at 10M
    uniform rows barely aggregates at all and cost ~7 s of persist +
    five rollup probes before answering the common-case "don't chunk"):

    1. ONE per-key count aggregation (massive map-side reduction —
       #keys rows out of #events in). No key over the cap → ``None``;
       this is the only pass uniform data ever pays.
    2. Only when hot keys exist: a (key, finest-bucket) count
       aggregation restricted to the HOT KEYS ONLY (broadcast
       semi-join). A non-hot key's whole history already fits the cap,
       so every one of its (key, bucket) slices is cap-bounded at ANY
       granularity — the memory guarantee never depends on them, and
       the speed target only concerns the hot keys being split. The
       restriction turns the fine aggregate from corpus-sized into
       skewed-keys-sized; per-candidate rollups over that small frame
       cost one scalar probe each.

    Falls back to the finest candidate when even it exceeds the cap
    (the structural guarantee is gone either way at that rate — rate ×
    1 minute > cap means a genuinely pathological key; the caller's
    window still runs, just with a hotter-than-target task).

    ``sample_fraction``: run both count passes on a Bernoulli sample and
    scale the estimates — the decision is a granularity heuristic, not
    an exact bound, and at cap ≥ ~100k a hot key contributes thousands
    of sampled rows per candidate bucket (relative error ≲ 1–2%). The
    default (None) auto-enables a 5% sample when ``max_rows_per_task ≥
    100_000`` — at that cap, any key that matters is huge — and stays
    exact below it (small-corpus calls, unit-scale caps). Pass 1.0 to
    force exact counting. Measured at bot40-10M: the exact decision
    cost ~3–5 s of the auto path; sampled ~0.5–1 s."""
    if not candidates:
        raise ValueError("candidates must be non-empty")
    finest = candidates[-1]
    if sample_fraction is None:
        sample_fraction = 0.05 if max_rows_per_task >= 100_000 else 1.0
    if not 0 < sample_fraction <= 1:
        raise ValueError("sample_fraction must be in (0, 1]")
    scale = 1.0 / sample_fraction
    if sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=7)
    keyed = (
        df.groupBy(F.col(key_col).alias("__k"))
        .agg((F.count(F.lit(1)) * scale).alias("__n"))
    )
    hot = keyed.where(F.col("__n") > max_rows_per_task)
    # hot-key cardinality is bounded by total_rows / cap, and the hottest
    # handful decide the answer; cap the broadcast defensively anyway
    hot_rows = hot.orderBy(F.desc("__n")).limit(10_001).collect()
    if not hot_rows:
        return None
    hot_keys = [r["__k"] for r in hot_rows]
    hottest_key = int(hot_rows[0]["__n"])
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    target = min(
        max_rows_per_task,
        max(hottest_key // max(parallelism, 1), min_chunk_rows),
    )
    base = (
        df.select(
            F.col(key_col).alias("__k"),
            F.date_trunc(finest, F.col(ts_col)).alias("__m"),
        )
    )
    if len(hot_keys) <= 10_000:
        base = base.where(F.col("__k").isin(hot_keys))
    base = (
        base.groupBy("__k", "__m")
        .agg((F.count(F.lit(1)) * scale).alias("__n"))
        .persist()
    )
    try:
        for cand in candidates:
            hottest = (
                base.groupBy(
                    "__k", F.date_trunc(cand, "__m").alias("__b")
                )
                .agg(F.sum("__n").alias("__n"))
                .agg(F.max("__n"))
                .collect()[0][0]
            )
            if hottest is not None and hottest <= target:
                return cand
        return finest
    finally:
        base.unpersist()


def _resolve_bucket(
    df: DataFrame, key_col: str, ts_col: str, bucket: str | None
) -> str | None:
    """``"auto"`` → :func:`choose_bucket` (which may answer ``None`` =
    take the plain, unchunked path); anything else passes through."""
    if bucket == "auto":
        return choose_bucket(df, key_col, ts_col)
    return bucket


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tie_break: str,
    bucket: str | None = None,
) -> DataFrame:
    """Assign a per-user session id: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``.

    lag + running sum of new-session flags — two window passes over the
    same (user) partitioning, so one shuffle total. Deterministic total
    order via (ts, tie_break).

    ``bucket`` (e.g. ``"day"``): the hot-key form — identical session
    ids (same oracle) with BOUNDED window partitions. A session id is a
    running count, so it chunks by prefix-sum decomposition rather than
    row carries: (1) sessionize each (user, time-bucket) partition
    locally; (2) per user, over the per-BUCKET summary rows (first/last
    event ts, local session count — one row per non-empty bucket, so
    this window is bounded by the time range, not the event rate),
    decide whether each bucket's first local session continues the
    previous bucket's last session (boundary gap ≤ ``gap_seconds``) and
    prefix-sum the global session-count offsets; (3) join the offsets
    back on (user, bucket) and shift:
    ``session_id = offset + local_id - merged``. Measured in the
    --events rehearsal: the plain plan bends 4.2× when one bot user
    holds 40% of 5M rows; this form caps every task at rate × bucket.
    ``bucket="auto"`` delegates the granularity to
    :func:`choose_bucket` (rate-adaptive; may resolve to the plain
    path on uniform data).

    .. note:: The bucketed form is NOT a pure plan-builder: it runs an
       eager Spark job here (persist + count of the locally-sessionized
       frame — required to pin the (user, bucket) partitioning for the
       stitch join, see inline comment) and leaves that frame persisted.
       The returned DataFrame carries the cache handle; call
       ``ixmp_spark.operators.release_cache(result)`` once the result
       has been materialized/written, or the executor memory stays
       held. ``bucket=None`` (the default) builds a plan lazily like
       every other operator."""
    bucket = _resolve_bucket(df, user_col, ts_col, bucket)
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_break)
    if bucket is not None:
        w = Window.partitionBy(user_col, "__b").orderBy(ts_col, tie_break)
        df = df.withColumn("__b", F.date_trunc(bucket, F.col(ts_col)))
    # cast("double") = epoch seconds incl. fractional part — matches
    # DuckDB's epoch(); an integer-seconds cast would truncate microseconds
    # and misclassify gaps right at the threshold.
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    local = df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    if bucket is None:
        return local
    # two consumers (summary → offsets, and the final stitch join):
    # persist + EAGER materialize — not localCheckpoint, whose
    # ExistingRDD scan drops the partitioning. A lazily-cached plan
    # also reports unknown partitioning (its shuffle is still
    # AQE-coalescible at that point); once materialized — with the
    # default canChangeCachedPlanOutputPartitioning=false pinning it —
    # the cache serves the window's (user, bucket) partitioning, so the
    # summary groupBy collapses to a single-stage agg and the stitch
    # join re-shuffles NEITHER side's big frame. Measured COLD (cache
    # handles released between reps — CacheManager otherwise serves
    # rep 2 from rep 1's cache and the number becomes a cache-read) at
    # a 40%-hot key: 3.2–4.5 s vs the lineage form's 4.5 s at 5M rows,
    # 5.2 s vs 6.3 s at 10M, vs plain 5.3/11.2 s. Handle attached to
    # the result per the cache protocol.
    local = local.persist()
    local.count()
    summary = local.groupBy(user_col, "__b").agg(
        F.max("session_id").alias("__n_local"),
        F.min(F.col(ts_col).cast("double")).alias("__first"),
        F.max(F.col(ts_col).cast("double")).alias("__last"),
    )
    wu = Window.partitionBy(user_col).orderBy("__b")
    merged = F.when(
        F.col("__first") - F.lag("__last").over(wu) <= gap_seconds, 1
    ).otherwise(0)
    offsets = summary.withColumn("__merged", merged).select(
        user_col,
        "__b",
        "__merged",
        F.coalesce(
            F.sum(F.col("__n_local") - F.col("__merged")).over(
                wu.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__offset"),
    )
    # shuffled-hash build on the one-row-per-(user, bucket) offsets side;
    # the big side keeps the window's (user, bucket) partitioning through
    # the persisted frame — no re-shuffle, no sort-merge re-sort
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        local.join(offsets.hint("shuffle_hash"), [user_col, "__b"])
        .withColumn(
            "session_id",
            F.col("__offset") + F.col("session_id") - F.col("__merged"),
        )
        .drop("__b", "__offset", "__merged"),
        local,
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


def _lead_steps_chunked(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    order_col: str,
    length: int,
    bucket: str,
) -> DataFrame:
    """Exact decomposition of ``[event, lead(event,1..length-1)]`` over a
    per-user window into BOUNDED partitions — the hot-key mitigation for
    the event family's only skew axis (measured in the --events
    rehearsal: one bot user holding 40% of 5M rows made the plain
    single-window plan 4.6–5.7× slower; at 100 TB that task never
    finishes).

    Plain plan: ``Window.partitionBy(user)`` puts a user's WHOLE history
    in one task — partition size scales with data volume. Chunked plan:
    partition by ``(user, time-bucket)``, so each task is bounded by the
    key's event RATE × bucket span, which no amount of retained history
    changes.

    Bucket boundaries are healed exactly with head-row carries: a row's
    forward chain needs at most ``length-1`` events past its bucket's
    end, and any such event is necessarily among the first ``length-1``
    rows of ITS OWN bucket (if it were later, the rows before it in its
    bucket would fill the chain first). So: take each bucket's first
    ``length-1`` rows ("heads"), order heads per user (a window whose
    partitions hold ≤ (length-1) × #buckets rows — bounded by the TIME
    RANGE, not the data rate), and lag their bucket ids to find, for
    every head, up to ``length-1`` EARLIER buckets whose chains need it.
    Replicate the head into each such bucket as a context-only carry
    row: within the (user, bucket) partition the original rows plus
    carries, in time order, reproduce the user's true event sequence as
    far as any in-bucket row's chain reaches. Carries contribute lead
    CONTEXT but emit no output rows (extra, later-than-needed carries
    sort past the reachable horizon and are never read). Exactness —
    chunked ≡ plain row-for-row, sparse single-row buckets included —
    is pinned by tests and by the g5b/g6b catalog entries sharing
    g5/g6's oracles."""
    b = F.date_trunc(bucket, F.col(ts_col))
    base = df.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__t"),
        F.col(order_col).alias("__o"),
        F.col(event_col).alias("__e"),
        b.alias("__b"),
    )
    wb = Window.partitionBy("__u", "__b").orderBy("__t", "__o")
    heads = (
        base.withColumn("__rn", F.row_number().over(wb))
        .where(F.col("__rn") < length)
        .drop("__rn")
    )
    wu = Window.partitionBy("__u").orderBy("__t", "__o")
    prev_buckets = F.array(
        *[F.lag("__b", i).over(wu) for i in range(1, length)]
    )
    carries = (
        heads.withColumn(
            "__tgts",
            F.array_distinct(
                F.filter(
                    prev_buckets,
                    lambda x: x.isNotNull() & (x < F.col("__b")),
                )
            ),
        )
        .select(
            "__u", "__t", "__o", "__e",
            F.explode("__tgts").alias("__b"),
            F.lit(True).alias("__carry"),
        )
    )
    allr = base.withColumn("__carry", F.lit(False)).unionByName(carries)
    steps = [F.col("__e")] + [
        F.lead("__e", i).over(wb) for i in range(1, length)
    ]
    return (
        allr.select(
            "__carry",
            *[s.alias(f"step_{i}") for i, s in enumerate(steps)],
        )
        .where(~F.col("__carry"))
        .drop("__carry")
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_col: str = "event_id",
    k: int = 50,
    bucket: str | None = None,
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
    function of the data, not the partitioning.

    ``bucket`` (e.g. ``"day"``, ``"hour"``): compute the SAME matrix via
    :func:`_lead_steps_chunked` — identical output (same oracle), but
    window partitions bounded by per-key rate × bucket instead of
    whole-key history. Use it when any single key can hold an unbounded
    share of the stream (bot traffic, service accounts);
    ``bucket="auto"`` picks the granularity via :func:`choose_bucket`."""
    bucket = _resolve_bucket(df, user_col, ts_col, bucket)
    if bucket is not None:
        stepped = _lead_steps_chunked(
            df, user_col, ts_col, event_col, order_col, 2, bucket
        )
        pairs = (
            stepped.select(
                F.col("step_0").alias("src"), F.col("step_1").alias("dst")
            )
            .where(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    else:
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
    out = (
        pairs.withColumn(
            "prob", F.round(F.col("n") / F.sum("n").over(src_total), 6)
        )
        .orderBy(F.desc("n"), F.asc("src"), F.asc("dst"))
        .limit(k)
    )
    return out


def zscore_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    window: int = 5,
    threshold: float = 2.0,
    bucket: str | None = None,
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
    absolute-delta gates, not a 0/0.

    ``bucket``: hot-key form — identical output with (key, time-bucket)
    window partitions, via a two-phase aggregate decomposition that
    shuffles + sorts the full data exactly ONCE (the r6 carry-row design
    paid two full shuffle-sorts — a reverse row_number pass to find
    bucket tails, then the union-with-carries window pass — so its
    constant ate the skew win at local parallelism):

    1. One window pass per (key, bucket): row_number, a lead-based
       last-rows flag (shares the ordered WindowExec — no second window
       node), and the trailing-frame avg/stddev — exact for every row
       whose frame is fully inside its bucket (``rn > window``). Lazily
       local-checkpointed: both downstream consumers (summary and the
       fused join) must not re-run the shuffle (the j12 /
       iterative-lineage lesson).
    2. A groupBy on the same (key, bucket) key collapses each bucket to
       one summary row carrying its first/last ``window`` values as
       sorted arrays (≤ 2·window elements per group buffer — memory
       does NOT scale with bucket size); a per-key window over these
       summary rows (bounded by the TIME RANGE, not the event rate)
       prefix-combines the previous ``window`` buckets' tails into each
       bucket's cross-boundary context — the last ``window`` values
       before the bucket, exactly (every non-empty bucket contributes
       ≥1 value, so ``window`` summary rows always cover the frame).
    3. One fused shuffled-hash join of the checkpoint against that
       one-row-per-bucket context (no carry rows, no explode). Only the
       ≤ ``window`` HEAD rows per bucket assemble a frame and recompute
       mean/stddev via staged array folds replaying the builtins'
       arithmetic exactly; body rows pass through with their phase-1
       results. The checkpoint scan re-exchanges for the groupBy and
       the join, but those shuffles move already-BOUNDED (key, bucket)
       partitions — skew-safe; max task ∝ rate × bucket throughout.
       (A persist+eager-count variant that pins the cached partitioning
       and makes both downstream steps genuinely exchange-free was
       built and measured COLD — cache handles released between reps,
       since CacheManager otherwise serves rep 2 from rep 1's cache and
       the number silently becomes a cache-read: 6.5 s vs 4.8 s at 5M,
       9.5 vs 8.8 at 10M bot40. The columnar cache build costs more
       than the bounded re-exchanges at local[32], so checkpoint
       stays; on a real cluster, where those two exchanges are network
       shuffles, the cache variant is the one to revisit.)

    Measured at a 40%-hot key (40% of all rows), cold, best-of-2 with
    per-rep cache release, local[32]: the committed artifact
    (REHEARSAL_events_r7.json, one long-lived session) shows 5.4 s vs
    plain 7.8 s at 5M rows and 10.2 s vs 14.0 s at 10M; standalone
    probe sessions measured 4.8 vs 7.3 and 8.8 vs 17.2 — session cache
    pressure and host drift move both sides, the chunked form stays
    ahead, and the gap widens with scale because plain's hot task
    grows with history while chunked tasks stay rate × bucket.
    """
    bucket = _resolve_bucket(df, key_col, ts_col, bucket)
    if bucket is not None:
        return _zscore_chunked(
            df, key_col, ts_col, order_col, value_col, window, threshold,
            bucket,
        )
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


def _zscore_chunked(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    window: int,
    threshold: float,
    bucket: str,
) -> DataFrame:
    """The bucketed decomposition behind :func:`zscore_anomalies`
    (``bucket=...``) — see that docstring for the three-phase design."""
    b = F.date_trunc(bucket, F.col(ts_col))
    wb = Window.partitionBy(key_col, "__b").orderBy(
        F.col(ts_col), F.col(order_col)
    )
    frame = wb.rowsBetween(-window, -1)
    # __tail: fewer than `window` rows after this one in its bucket —
    # lead of a constant is NULL only off the partition end, and unlike
    # count() OVER (PARTITION BY …) it shares this ordered spec's
    # WindowExec, so phase 1 stays ONE window node, one pass
    # ts is dropped from the checkpoint: __rn already encodes the
    # (ts, order) ordering within each bucket, so downstream sorts go
    # by __rn and the materialized frame stays one column narrower.
    # The checkpoint scans back as an ExistingRDD whose partitioning
    # Catalyst no longer trusts, so the groupBy and the fused join each
    # re-exchange — but those shuffles move bounded (key, bucket)
    # partitions, and the measured-cold persist+eager alternative that
    # eliminates them costs MORE locally (see the zscore_anomalies
    # docstring, phase 3 note).
    local = (
        df.select(order_col, key_col, value_col, ts_col, b.alias("__b"))
        .select(
            order_col,
            key_col,
            value_col,
            "__b",
            F.row_number().over(wb).alias("__rn"),
            F.lead(F.lit(1), window).over(wb).isNull().alias("__tail"),
            F.avg(value_col).over(frame).alias("__mu"),
            F.stddev_samp(value_col).over(frame).alias("__sd"),
        )
        .localCheckpoint(eager=False)
    )

    srt = F.struct(
        F.col("__rn").alias("r"),
        F.col(value_col).cast("double").alias("v"),
    )
    # groupBy on the window's own partitioning — no second shuffle of
    # the data; each bucket collapses to ≤ 2·window values
    summary = local.groupBy(key_col, "__b").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.when(F.col("__tail"), srt))
            ),
            lambda s: s["v"],
        ).alias("__tailv"),
        F.transform(
            F.sort_array(
                F.collect_list(F.when(F.col("__rn") <= window, srt))
            ),
            lambda s: s["v"],
        ).alias("__headv"),
    )
    # per-key prefix combine over ONE ROW PER NON-EMPTY BUCKET: the last
    # `window` values before bucket B live in the tails of the previous
    # `window` non-empty buckets (each contributes >= 1 value)
    wk = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(-window, -1)
    )
    ctxall = F.flatten(F.collect_list("__tailv").over(wk))
    ctx = summary.select(
        key_col,
        "__b",
        "__headv",
        _last_n(ctxall, window).alias("__ctx"),
    )

    # head rows: frame = last `window` of (cross-bucket context ++ local
    # prefix). Every expensive expression is STAGED into its own column
    # — one select per step, each later step referencing only cheap
    # attributes — so it evaluates ONCE per row. Building mean/stddev as
    # one nested expression tree re-evaluated the array assembly and the
    # folds per reference in interpreted HOF mode (~75 evaluations/row,
    # measured as a 60× slowdown at 10M rows before this staging;
    # SPARK-36718 keeps the optimizer from re-collapsing multi-
    # referenced expensive projections). The sum fold runs in frame
    # order, so the mean matches the builtin window avg bit-for-bit;
    # stddev replays Spark's own CentralMomentAgg (Welford) recurrence
    # over the frame in order, so m2 — and therefore sd — is
    # bit-identical to the builtin stddev_samp. BIT-identical matters,
    # not just close: a two-pass Σ(x−μ)² form was caught by a property
    # test on a frame whose two values differ by one ulp — sd lands at
    # ~4e-16 either way, but the ulp-sized disagreement between the two
    # formulas is AMPLIFIED by the division into z values that differ
    # in the integer digits. Welford also yields m2 = 0.0 exactly on
    # constant frames (delta underflows to exact 0), so z goes NULL
    # precisely when the builtin's does, with no min==max guard.
    prefix = F.when(
        F.col("__rn") > 1, F.slice("__headv", 1, F.col("__rn") - 1)
    ).otherwise(F.array().cast("array<double>"))
    # ONE fused pass over the checkpoint: shuffled-hash build on the ctx
    # side (one row per (key, bucket), so the per-partition hash build
    # is bounded by the bucket count, not the event rate) while the big
    # side keeps phase 1's (key, bucket) partitioning — no shuffle, no
    # sort, no body/heads union re-scan. __fr is NULL for body rows
    # (rn > window), so the folds below short-circuit to NULL for them
    # and the final projection picks the phase-1 builtin results.
    fused = (
        local.join(ctx.hint("shuffle_hash"), [key_col, "__b"])
        .select(
            order_col,
            key_col,
            value_col,
            "__rn",
            "__mu",
            "__sd",
            F.when(
                F.col("__rn") <= window,
                _last_n(F.concat("__ctx", prefix), window),
            ).alias("__fr"),
        )
        .select(
            "*",
            F.size("__fr").alias("__fn"),
            F.aggregate(
                "__fr", F.lit(0.0), lambda a, x: a + x
            ).alias("__sum"),
            # Welford, exactly as Spark's CentralMomentAgg updates it:
            # newN = n+1; delta = x−avg; deltaN = delta/newN;
            # newAvg = avg + deltaN; newM2 = m2 + delta·(delta − deltaN).
            # The m2 term MUST be the delta·(delta−deltaN) form — it is
            # x−newAvg evaluated BEFORE newAvg is rounded to a double,
            # and on ulp-separated frames the rounded form gives a
            # different (even exactly-zero) m2 while the builtin does not
            F.aggregate(
                "__fr",
                F.struct(
                    F.lit(0.0).alias("n"),
                    F.lit(0.0).alias("avg"),
                    F.lit(0.0).alias("m2"),
                ),
                lambda a, x: F.struct(
                    (a["n"] + 1.0).alias("n"),
                    (a["avg"] + (x - a["avg"]) / (a["n"] + 1.0)).alias(
                        "avg"
                    ),
                    (
                        a["m2"]
                        + (x - a["avg"])
                        * (
                            (x - a["avg"])
                            - (x - a["avg"]) / (a["n"] + 1.0)
                        )
                    ).alias("m2"),
                ),
            )["m2"].alias("__m2"),
        )
        .select(
            "*",
            F.when(
                F.col("__fn") > 0, F.col("__sum") / F.col("__fn")
            ).alias("__muh"),
        )
        .select(
            order_col,
            key_col,
            value_col,
            F.when(F.col("__rn") > window, F.col("__mu"))
            .otherwise(F.col("__muh"))
            .alias("__muf"),
            F.when(F.col("__rn") > window, F.col("__sd"))
            .otherwise(
                F.when(
                    F.col("__fn") >= 2,
                    F.sqrt(F.col("__m2") / (F.col("__fn") - 1)),
                )
            )
            .alias("__sdf"),
        )
    )
    mu, sd = F.col("__muf"), F.col("__sdf")
    z = F.when(sd.isNotNull() & (sd > 0), (F.col(value_col) - mu) / sd)
    return fused.select(
        order_col,
        key_col,
        value_col,
        F.round(mu, 6).alias("baseline_mean"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def _last_n(arr, n: int):
    """Last ``n`` elements of an array column (the whole array when it
    is shorter) — ``slice`` with a negative start raises when |start|
    exceeds the array length, so guard explicitly."""
    return F.when(
        F.size(arr) > n, F.slice(arr, F.size(arr) - n + 1, n)
    ).otherwise(arr)


def top_paths(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_col: str = "event_id",
    length: int = 3,
    k: int = 20,
    bucket: str | None = None,
) -> DataFrame:
    """Most-frequent event paths of ``length`` consecutive steps per
    user (the journey-analysis companion to ``event_transitions``'
    single-step matrix): one ``lead`` per additional step over the same
    per-user window — one shuffle on the user key regardless of path
    length — then a path aggregation and a TakeOrdered top-k. Paths
    never cross users; rows whose window runs off the end of a user's
    history are excluded (complete paths only). Deterministic via the
    ``order_col`` tie-break.

    ``bucket``: hot-key form via :func:`_lead_steps_chunked` — identical
    output with rate-bounded window partitions (see event_transitions);
    ``bucket="auto"`` picks the granularity via :func:`choose_bucket`."""
    if length < 2:
        raise ValueError("length must be >= 2")
    bucket = _resolve_bucket(df, user_col, ts_col, bucket)
    if bucket is not None:
        stepped = _lead_steps_chunked(
            df, user_col, ts_col, event_col, order_col, length, bucket
        )
        cols = [F.col(f"step_{i}") for i in range(length)]
        paths = stepped.select(
            F.concat_ws(" > ", *cols).alias("path"),
            cols[-1].alias("__last"),
        )
    else:
        w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_col))
        steps = [F.col(event_col)] + [
            F.lead(event_col, i).over(w) for i in range(1, length)
        ]
        paths = df.select(
            F.concat_ws(" > ", *steps).alias("path"), steps[-1].alias("__last")
        )
    out = (
        paths.where(F.col("__last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(k)
    )
    return out


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    alpha: float,
) -> DataFrame:
    """Exponentially-weighted moving average per key (pandas
    ``ewm(alpha=..., adjust=False)`` semantics: ``y_i = a·x_i +
    (1-a)·y_{i-1}``, ``y_1 = a·x_1`` — an extension operator Spark has
    no builtin for, and the naive "scaled prefix sum" rewrite
    ``y_i = d^i · Σ a·x_j·d^{-j}`` overflows d^-j after a few hundred
    rows for any real decay.

    Blocked-scan plan, exact in double precision and fully JVM-side:

    1. rows get a per-key block of ``K = ceil(120 / -log10(d))`` rows,
       chosen so both ``d^{-(K-1)}`` (the in-block scale factor) and
       ``d^K`` (the carry factor) stay within double range;
    2. the in-block scan is the scaled prefix sum — safe now, the
       exponent never exceeds K — via one running-sum window over
       (key, block);
    3. cross-block carry: the recurrence folded over whole blocks is
       ``Y_b = y_end(b-1) + d^{L}·y_end(b-2) + d^{2L}·y_end(b-3)…``,
       and because ``d^L ≤ 1e-120`` by construction, terms beyond THREE
       lags are below the subnormal floor — exactly 0.0 in double, not
       an approximation. Three ``lag()`` calls over the per-(key,
       block) summary frame (one row per block) replace an unbounded
       sequential dependency.

    Cost: one shuffle on the key for the row windows, one keyed
    aggregation + join for the block summaries (block-summary rows =
    rows/K — negligible). A hot key's tasks stay bounded the same way
    the chunked family's do: the expensive window partitions by (key,
    block), never whole-key history. Output: input + ``ewma`` column —
    the RAW double (pandas ewm parity); callers needing a rounded
    display value must round with explicitly-shared arithmetic, because
    EWMA of round-decimal inputs at dyadic alpha lands on exact
    decimal-rounding boundaries constantly (52/10k rows at sf0.01) and
    engines disagree there (Spark rounds the shortest repr via
    BigDecimal.valueOf, Python/DuckDB the binary value).
    """
    import math

    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    d = 1.0 - alpha
    out_cols = [*df.columns, F.col("__y").alias("ewma")]
    if d == 0.0:
        return df.select(
            *df.columns, F.col(value_col).cast("double").alias("ewma")
        )
    K = max(2, math.ceil(120.0 / -math.log10(d)))
    wk = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    rn = F.row_number().over(wk) - 1
    base = df.withColumn("__t", (rn % K)).withColumn("__b", (rn / K).cast("long"))
    wb = (
        Window.partitionBy(key_col, "__b")
        .orderBy(F.col(ts_col), F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # in-block scaled prefix sum: u_j = a·x_j·d^{-t_j};  y_local = d^t·Σu
    u = F.lit(alpha) * F.col(value_col).cast("double") * F.pow(F.lit(d), -F.col("__t"))
    local = base.withColumn(
        "__y_local", F.pow(F.lit(d), F.col("__t")) * F.sum(u).over(wb)
    )
    summary = local.groupBy(key_col, "__b").agg(
        F.max(F.struct(F.col("__t"), F.col("__y_local"))).alias("__last"),
        F.count(F.lit(1)).alias("__len"),
    ).select(
        key_col,
        "__b",
        F.col("__last.__y_local").alias("__y_end"),
        "__len",
    )
    ws = Window.partitionBy(key_col).orderBy("__b")
    # carry INTO block b, folded at b's first row (t = 0): three lag
    # terms — everything older is < d^{3K} = 0.0 in double, exactly
    carry = (
        F.coalesce(F.lag("__y_end", 1).over(ws), F.lit(0.0))
        + F.pow(F.lit(d), F.coalesce(F.lag("__len", 1).over(ws), F.lit(0)))
        * (
            F.coalesce(F.lag("__y_end", 2).over(ws), F.lit(0.0))
            + F.pow(F.lit(d), F.coalesce(F.lag("__len", 2).over(ws), F.lit(0)))
            * F.coalesce(F.lag("__y_end", 3).over(ws), F.lit(0.0))
        )
    )
    offsets = summary.select(
        key_col, "__b", carry.alias("__carry")
    )
    joined = local.join(offsets.hint("shuffle_hash"), [key_col, "__b"])
    y = F.col("__y_local") + F.pow(F.lit(d), F.col("__t") + 1) * F.col("__carry")
    return joined.withColumn("__y", y).select(*out_cols)


def key_trends(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    min_points: int = 3,
) -> DataFrame:
    """Per-key linear trend of a value over time — OLS slope/intercept/
    R² via Spark's built-in ``regr_*`` aggregates (JVM-side, map-side
    partial aggregation, ONE keyed shuffle; DuckDB implements the same
    ANSI aggregates, which is what makes the oracle a literal
    restatement). x is epoch seconds; slope is value-units per second.

    The entity-drift screen of the event family: a fleet of sensors /
    users / services ranked by how fast their metric is moving, with R²
    separating genuine drift from noise. Keys with fewer than
    ``min_points`` events are dropped (a 2-point fit is always perfect
    and always meaningless).

    Output: (key, n_points, slope, intercept, r2) — rounded to 8/6/6.
    """
    x = F.col(ts_col).cast("double")
    y = F.col(value_col).cast("double")
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.regr_slope(y, x), 8).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
        .where(F.col("n_points") >= min_points)
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    order_cols: tuple[str, ...] = (),
    baseline: tuple[float, float] | None = None,
    bucket: str | None = None,
    hot_rows_threshold: int = 1_000_000,
) -> DataFrame:
    """Two-sided CUSUM changepoint screen per key (Page 1954) — the
    classic sequential drift detector, here in its retrospective batch
    form: standardize each value against the key's own mean/stddev,
    then accumulate ``S_i = max(0, S_{i-1} + z_i - k)`` (high side) and
    ``T_i = max(0, T_{i-1} - z_i - k)`` (low side); a sustained shift
    of more than ``k`` standard deviations ramps the statistic past
    ``threshold_h`` while zero-mean noise keeps resetting it to 0.
    ``key_trends`` answers "is this key drifting linearly"; this
    answers "WHERE did its level change" — the complementary per-row
    signal for corpus snapshot monitoring and sensor fleets.

    The recurrence looks inherently sequential, but the standard
    max-drawdown identity turns it into pure window SQL:

        ``S_i = P_i - min(0, min_{j<=i} P_j)``,  ``P_i = Σ_{j<=i} y_j``

    with ``y_i = z_i - k`` (low side: ``y_i = -z_i - k``) — a prefix
    sum plus a running min over that prefix sum. Every window here
    partitions by the SAME key, so the whole operator is ONE keyed
    shuffle + one sort; per-row state in each task is O(1) (running
    aggregates over UNBOUNDED PRECEDING frames), so a hot key degrades
    to a long sequential scan, never to memory pressure. Both engines
    implement the identical windows, which is what lets the oracle be
    a literal restatement (driver-hash-certified arithmetic).

    Keys with zero or undefined stddev produce NULL statistics and
    ``is_change = false`` (no computable baseline — same convention as
    ``zscore_anomalies``).

    ``baseline=(mu, sigma)`` switches to the ONLINE form: standardize
    against the given fixed parameters (typically fit on a reference
    window) instead of the key's own retrospective mean/std — the
    monitoring deployment shape, and the exact semantics
    ``streaming.cusum_stream`` computes live (its batch twin). With a
    baseline the whole-key window disappears; the operator is one
    ordered window pass.

    ``bucket`` (e.g. ``"day"``, or ``"auto"`` → :func:`choose_bucket`):
    the hot-key form — identical statistics (same oracle; the driver
    hash certifies chunked ≡ plain at the 6-decimal round) with
    (key, time-bucket)-BOUNDED window partitions. Unlike the trailing
    z-score, an unbounded prefix can't carry rows across chunks; it
    carries AGGREGATES, by the same two identities the plain form
    uses: within each bucket compute the local prefix sum p and local
    running min m; per bucket keep (Y = Σy, M = min p); across the
    per-key bucket summaries (a #buckets-row frame) compute the
    exclusive prefixes C_b = Σ_{b'<b} Y and D_b = min_{b'<b} (C + M);
    then ``P_i = C_b + p_i`` and the global running min is
    ``min(D_b, C_b + m_i)`` — so ``S_i = P_i − min(0, …)`` exactly as
    before. Float association differs from the sequential form by
    ulps (documented; the 6-decimal round absorbs it — the dyadic
    property test asserts BIT equality where arithmetic is exact).
    The retrospective baseline also switches from a whole-key window
    to a groupBy + keyed join, so no stage partitions by bare key
    over raw rows.

    **Only keys with ≥ ``hot_rows_threshold`` rows actually chunk**;
    the rest route through the plain path and the two halves union.
    Measured reason (REHEARSAL_cusum_r8.json, 10M rows): chunking
    EVERY key at hour granularity turned ~1-row-per-bucket cold keys
    into a summary frame the size of the data — 48.3 s on uniform
    data (plain: 4.6 s) and 26.7 s even at bot40 (plain: 20.9 s).
    Routing confines the decomposition to the keys whose whole-key
    sort is the actual bottleneck — exactly the hot-keys-only
    restriction ``choose_bucket``'s decision pass already uses. The
    router is ONE per-key count aggregate plus a broadcast semi/anti
    split; with no hot keys the union degenerates to plain + empty.

    Cost model, measured honestly (same probe session, bot40-10M on
    local[32]): plain 15.5 s, chunked day 18.2 / hour 16.0 / minute
    15.2 — a WASH locally, unlike the z-score family's 2× (w10b),
    because plain CUSUM evaluates just two running aggregates per row
    where the trailing z-score pays four frame aggregates; the hot
    partition's sort alone isn't the bottleneck at this scale. The
    chunked form's regime is therefore STRUCTURAL, not wall-clock:
    when one key's rows exceed what a single task can sort/spill
    (the 100 TB hot-entity case), the plain form has no viable task
    boundary and this decomposition is the only shape that runs —
    which is why it ships opt-in with the 1M default rather than
    auto-on.

    Output: input key/order/value columns + ``cusum_high``,
    ``cusum_low`` (rounded to 6), ``is_change``.
    """
    bucket = _resolve_bucket(df, key_col, ts_col, bucket)
    if bucket is not None:
        return _cusum_chunked(
            df, key_col, ts_col, value_col, slack_k, threshold_h,
            order_cols, baseline, bucket, hot_rows_threshold,
        )
    wo = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    if baseline is not None:
        mu, sigma = float(baseline[0]), float(baseline[1])
        if sigma <= 0:
            raise ValueError("baseline sigma must be positive")
        zexpr = (v - mu) / sigma
    else:
        wk = Window.partitionBy(key_col)
        std = F.stddev_samp(v).over(wk)
        zexpr = F.when(std > 0, (v - F.avg(v).over(wk)) / std)
    # materialize z ONCE: deriving _yh/_yl from the expression would
    # inline the whole-key mean/std windows twice in the plan
    z = F.col("_z")
    base = (
        df.withColumn("_z", zexpr)
        .withColumn("_yh", z - F.lit(float(slack_k)))
        .withColumn("_yl", -z - F.lit(float(slack_k)))
    )
    pre = base.withColumn("_ph", F.sum("_yh").over(wo)).withColumn(
        "_pl", F.sum("_yl").over(wo)
    )
    sh = F.col("_ph") - F.least(F.lit(0.0), F.min("_ph").over(wo))
    sl = F.col("_pl") - F.least(F.lit(0.0), F.min("_pl").over(wo))
    h = F.lit(float(threshold_h))
    return (
        pre.withColumn("cusum_high", F.round(sh, 6))
        .withColumn("cusum_low", F.round(sl, 6))
        .withColumn(
            "is_change",
            F.coalesce((sh > h) | (sl > h), F.lit(False)),
        )
        .drop("_z", "_yh", "_yl", "_ph", "_pl")
    )


def _cusum_chunked(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    slack_k: float,
    threshold_h: float,
    order_cols: tuple[str, ...],
    baseline: tuple[float, float] | None,
    bucket: str,
    hot_rows_threshold: int,
) -> DataFrame:
    """Hot/cold router for cusum_changepoints(bucket=...): keys with
    ≥ hot_rows_threshold rows take the bucket-chunked decomposition,
    the rest the plain path (see the operator docstring for the
    measured rationale)."""
    # persist (r15, the p15/x33 multi-consumer class): the key-bounded
    # hot-key list feeds BOTH the semi and the anti join — unpersisted,
    # the data-sized count aggregation ran twice.
    hot_keys = (
        df.groupBy(F.col(key_col))
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= hot_rows_threshold)
        .select(key_col)
        .persist()
    )
    # NO forced broadcast (r13): hot_keys is a keyed aggregate (usually
    # a handful of rows, but unbounded in adversarial data); AQE turns
    # the semi/anti joins into broadcasts at runtime when it IS small
    hot = df.join(hot_keys, key_col, "semi")
    cold = df.join(hot_keys, key_col, "anti")
    cold_out = cusum_changepoints(
        cold, key_col, ts_col, value_col, slack_k, threshold_h,
        order_cols, baseline, bucket=None,
    )
    hot_out = _cusum_chunked_core(
        hot, key_col, ts_col, value_col, slack_k, threshold_h,
        order_cols, baseline, bucket,
    )
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        cold_out.unionByName(hot_out.select(*cold_out.columns)), hot_keys
    )


def _cusum_chunked_core(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    slack_k: float,
    threshold_h: float,
    order_cols: tuple[str, ...],
    baseline: tuple[float, float] | None,
    bucket: str,
) -> DataFrame:
    """Bucket-bounded CUSUM (see cusum_changepoints(bucket=...)):
    local prefix sums/mins per (key, bucket) + exclusive aggregate
    carries over the per-key bucket-summary frame."""
    v = F.col(value_col).cast("double")
    if baseline is not None:
        mu, sigma = float(baseline[0]), float(baseline[1])
        if sigma <= 0:
            raise ValueError("baseline sigma must be positive")
        based = df.withColumn("_z", (v - mu) / sigma)
    else:
        stats = df.groupBy(F.col(key_col)).agg(
            F.avg(v).alias("__mu"), F.stddev_samp(v).alias("__sd")
        )
        based = df.join(stats, key_col).withColumn(
            "_z",
            F.when(F.col("__sd") > 0, (v - F.col("__mu")) / F.col("__sd")),
        ).drop("__mu", "__sd")
    base = (
        based.withColumn("_yh", F.col("_z") - F.lit(float(slack_k)))
        .withColumn("_yl", -F.col("_z") - F.lit(float(slack_k)))
        .withColumn("_bkt", F.date_trunc(bucket, F.col(ts_col)))
    )
    w_in = (
        Window.partitionBy(key_col, "_bkt")
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        base.withColumn("_ph", F.sum("_yh").over(w_in))
        .withColumn("_pl", F.sum("_yl").over(w_in))
        .withColumn("_mh", F.min("_ph").over(w_in))
        .withColumn("_ml", F.min("_pl").over(w_in))
        # two consumers (summaries + the carry join-back): cut lineage
        # once, per the repo's multi-reference discipline
        .localCheckpoint(eager=False)
    )
    summ = local.groupBy(key_col, "_bkt").agg(
        F.sum("_yh").alias("_Yh"),
        F.min("_ph").alias("_Mh"),
        F.sum("_yl").alias("_Yl"),
        F.min("_pl").alias("_Ml"),
    )
    w_b = (
        Window.partitionBy(key_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = (
        summ.withColumn("_Ch", F.coalesce(F.sum("_Yh").over(w_b), F.lit(0.0)))
        .withColumn("_Cl", F.coalesce(F.sum("_Yl").over(w_b), F.lit(0.0)))
        .withColumn("_CMh", F.col("_Ch") + F.col("_Mh"))
        .withColumn("_CMl", F.col("_Cl") + F.col("_Ml"))
    )
    carried = (
        carried.withColumn("_Dh", F.min("_CMh").over(w_b))
        .withColumn("_Dl", F.min("_CMl").over(w_b))
        .select(key_col, "_bkt", "_Ch", "_Cl", "_Dh", "_Dl")
    )
    j = local.join(carried, [key_col, "_bkt"])
    ph = F.col("_Ch") + F.col("_ph")
    pl = F.col("_Cl") + F.col("_pl")
    # F.least skips NULLs: a NULL _Dh (first bucket of a key) means
    # "no previous buckets", which is exactly the semantics needed
    gh = F.least(F.col("_Dh"), F.col("_Ch") + F.col("_mh"))
    gl = F.least(F.col("_Dl"), F.col("_Cl") + F.col("_ml"))
    sh = ph - F.least(F.lit(0.0), gh)
    sl = pl - F.least(F.lit(0.0), gl)
    h = F.lit(float(threshold_h))
    return (
        j.withColumn("cusum_high", F.round(sh, 6))
        .withColumn("cusum_low", F.round(sl, 6))
        .withColumn(
            "is_change",
            F.coalesce((sh > h) | (sl > h), F.lit(False)),
        )
        .drop(
            "_z", "_yh", "_yl", "_bkt", "_ph", "_pl", "_mh", "_ml",
            "_Ch", "_Cl", "_Dh", "_Dl",
        )
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier screen per key via the modified z-score
    (Iglewicz & Hoaglin): ``M_i = (x_i - median) / (1.4826 · MAD)``
    with ``MAD = median(|x - median|)``. The mean/stddev z-score
    (``zscore_anomalies``) breaks down exactly when it matters — a few
    extreme points inflate sigma until nothing flags — while median
    and MAD have a 50% breakdown point; this is the screen to run
    FIRST on contaminated telemetry.

    Both medians are per-key window aggregates over the SAME
    partitioning (the inner one materializes before the outer — two
    Window nodes, ONE keyed shuffle); 1.4826 ≈ 1/Φ⁻¹(3/4) scales MAD
    to sigma-equivalents under normality. Keys with ``MAD = 0`` (a
    majority-constant key: any deviation is infinitely many MADs out)
    yield NULL scores and ``is_outlier = false`` — same no-baseline
    convention as the z-score family.

    Output: input columns + ``key_median``, ``mad``, ``mod_z``
    (rounded to 6) and ``is_outlier``.
    """
    wk = Window.partitionBy(key_col)
    v = F.col(value_col).cast("double")
    med = df.withColumn("_med", F.median(v).over(wk))
    madded = med.withColumn(
        "_mad", F.median(F.abs(v - F.col("_med"))).over(wk)
    )
    mz = F.when(
        F.col("_mad") > 0,
        (v - F.col("_med")) / (F.lit(1.4826) * F.col("_mad")),
    )
    return (
        madded.withColumn("key_median", F.round(F.col("_med"), 6))
        .withColumn("mad", F.round(F.col("_mad"), 6))
        .withColumn("mod_z", F.round(mz, 6))
        .withColumn(
            "is_outlier",
            F.coalesce(
                F.abs(mz) > F.lit(float(threshold)), F.lit(False)
            ),
        )
        .drop("_med", "_mad")
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-key winsorization: clip values into the key's own
    [``lower``, ``upper``] percentile band — the standard robust
    preprocessing before means/regressions on heavy-tailed telemetry
    (cap the tails, keep the rows; dropping them is trimming, a
    different tool). Complements ``mad_outliers``: that one FLAGS,
    this one REPAIRS.

    Both bounds are interpolated-percentile window aggregates over the
    same unordered per-key frame — one keyed shuffle, no sort. Keys
    too small for a stable band just clip to their own min/max (the
    percentile of a tiny set). NULL values pass through unclipped.

    Output: input columns + ``lo_bound``/``hi_bound`` (rounded to 6),
    ``value_winsorized`` (rounded to 6), ``was_clipped``.
    """
    if not 0 <= lower < upper <= 1:
        raise ValueError("need 0 <= lower < upper <= 1")
    wk = Window.partitionBy(key_col)
    v = F.col(value_col).cast("double")
    lo = F.percentile(v, F.lit(float(lower))).over(wk)
    hi = F.percentile(v, F.lit(float(upper))).over(wk)
    bounded = df.withColumn("_lo", lo).withColumn("_hi", hi)
    # explicit NULL guard: greatest/least SKIP nulls, so a NULL value
    # would otherwise "clip" to the lower bound
    clipped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    )
    return (
        bounded.withColumn("lo_bound", F.round(F.col("_lo"), 6))
        .withColumn("hi_bound", F.round(F.col("_hi"), 6))
        .withColumn("value_winsorized", F.round(clipped, 6))
        .withColumn(
            "was_clipped",
            F.coalesce(v.isNotNull() & (clipped != v), F.lit(False)),
        )
        .drop("_lo", "_hi")
    )


def cuped_adjust(
    units: DataFrame,
    arm_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance reduction for experiment readouts (Deng et al.
    2013): regress each unit's post-period metric on its own
    PRE-period metric and analyze the residualized

        ``adj = post − θ·(pre − mean(pre))``,  ``θ = cov(pre, post)
        / var(pre)``

    — same expectation per arm (pre-period is independent of
    assignment), strictly smaller variance whenever pre correlates
    with post, which is what turns a week of A/B traffic into the
    sensitivity of a month. The workhorse readout op for any
    event-pipeline engine.

    θ and ``mean(pre)`` come from ONE 1-row covariance aggregate over
    all units pooled (the standard single-θ form) cross-broadcast into
    the adjustment projection; per-arm summary is a second 1-row-per-
    arm aggregate. Everything is ANSI ``covar_samp``/``var_samp`` —
    oracle-restatable. Units with NULL pre or post are dropped.

    Input: ONE ROW PER UNIT (aggregate your events first — CUPED is
    defined on unit-level metrics). Output per arm: ``n``,
    ``mean_post``, ``mean_adj`` (equal in expectation, tighter in
    variance), ``var_post``, ``var_adj``, ``theta``.
    """
    pre = F.col(pre_col).cast("double")
    post = F.col(post_col).cast("double")
    # persist (r15, the p15/x33 multi-consumer class): the unit frame
    # feeds the θ/mean aggregate AND the adjustment projection —
    # unpersisted, the CALLER's unit-building lineage (typically a
    # data-sized groupBy) ran twice. Unit-cardinality cache;
    # float-identical (pure caching).
    u = units.where(pre.isNotNull() & post.isNotNull()).persist()
    stats = u.agg(
        (F.covar_samp(pre, post) / F.var_samp(pre)).alias("__theta"),
        F.avg(pre).alias("__mu_pre"),
    )
    adj = u.crossJoin(F.broadcast(stats)).withColumn(
        "__adj",
        post - F.col("__theta") * (pre - F.col("__mu_pre")),
    )
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        adj.groupBy(arm_col).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg(post), 6).alias("mean_post"),
            F.round(F.avg("__adj"), 6).alias("mean_adj"),
            F.round(F.var_samp(post), 6).alias("var_post"),
            F.round(F.var_samp("__adj"), 6).alias("var_adj"),
            F.round(F.max("__theta"), 6).alias("theta"),
        ),
        u,
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """Resample an irregular per-key time series onto a regular grid
    with forward fill — the missing-in-Spark primitive every telemetry
    consumer rebuilds (pandas ``resample().ffill()``): downstream
    joins, charts and models want one row per (key, bucket) even for
    silent periods, carrying the last observed aggregate.

    Three declarative stages, one keyed shuffle each, no UDF:

    1. bucket-align (``floor(epoch/interval)·interval``) + per-bucket
       aggregate — map-side partials;
    2. the per-key grid EXPLODES from one (min, max) row per key via
       ``sequence()`` — grid size is span/interval per key, never a
       cross join against a global calendar;
    3. left-join observations onto the grid (same key partitioning)
       and forward-fill with ``last(ignorenulls)`` over the keyed
       order.

    Leading grid cells before a key's first observation stay NULL
    (nothing to carry — ffill, not interpolation). ``agg``: any of
    avg/sum/min/max/count.

    Output: (key, bucket_ts, value, filled) where ``filled`` marks
    carried rows.
    """
    aggs = {
        "avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
        "count": lambda c: F.count(c).cast("double"),
    }
    if agg not in aggs:
        raise ValueError(f"unsupported agg {agg!r}")
    step = int(interval_seconds)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    bucket = F.timestamp_seconds((epoch / step).cast("long") * step)
    obs = (
        df.select(
            F.col(key_col).alias("__k"),
            bucket.alias("__b"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("__k", "__b")
        # persist (r15, the p15/x33 multi-consumer class): the
        # (key, bucket)-bounded observation grid feeds the per-key
        # span probe AND the fill join - unpersisted, the data-sized
        # bucket aggregation ran twice. Float-identical (pure caching).
        .agg(aggs[agg]("__v").alias("__v"))
        .persist()
    )
    grid = (
        obs.groupBy("__k")
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            "__k",
            F.explode(
                F.sequence(
                    F.col("__lo"),
                    F.col("__hi"),
                    F.expr(f"interval {step} seconds"),
                )
            ).alias("__b"),
        )
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(obs, ["__k", "__b"], "left")
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        joined.select(
            F.col("__k").alias(key_col),
            F.col("__b").alias("bucket_ts"),
            F.round(
                F.last("__v", ignorenulls=True).over(w), 6
            ).alias("value"),
            F.col("__v").isNull().alias("filled"),
        ),
        obs,
    )


def weighted_percentile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    weight_col: str,
    qs: tuple[float, ...] = (0.5,),
) -> DataFrame:
    """Weighted percentiles per key — the latency-engineering
    primitive Spark's ``percentile`` can't express: when each sample
    carries a weight (duration observed, rows represented, traffic
    share), the p99 must be the smallest value whose CUMULATIVE weight
    reaches 99% of the key's total (the type-1 / lower weighted
    quantile), not the row-count percentile.

    One ordered window pass builds cumulative weights, one groupBy
    takes ``min(value where cum ≥ q·total)`` for EVERY requested q —
    adding quantiles adds conditional aggregates, not passes. Equal
    values share a run, so the answer is order-independent under ties;
    zero-weight rows can never be selected unless they share a value
    with the crossing row. Rows with NULL/negative weight are dropped.

    Output: (key, total_weight, wp_<q>…).
    """
    wk = Window.partitionBy(key_col)
    wo = (
        Window.partitionBy(key_col)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    wt = F.col(weight_col).cast("double")
    base = (
        df.where(v.isNotNull() & wt.isNotNull() & (wt >= 0))
        .withColumn("__cum", F.sum(wt).over(wo))
        .withColumn("__tot", F.sum(wt).over(wk))
    )
    picks = [
        F.round(
            F.min(F.when(F.col("__cum") >= q * F.col("__tot"), v)), 6
        ).alias(f"wp_{str(q).replace('.', '_')}")
        for q in qs
    ]
    return base.groupBy(key_col).agg(
        F.round(F.max("__tot"), 6).alias("total_weight"), *picks
    )


def resample_interp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """Linear-interpolation twin of :func:`resample_ffill`
    (pandas ``resample().interpolate()``): empty grid cells take the
    value lerped between the key's PREVIOUS and NEXT observed buckets
    by time position — the resampling you want for physically
    continuous signals (ffill is for step-state signals).

    Same grid construction as ffill (bucket aggregate → per-key
    ``sequence()`` explode → left join), then TWO carry windows over
    the one keyed partitioning — last observation forward, next
    observation backward (both ``last(ignorenulls)``, the second over
    the descending order; Spark plans both under a single Exchange) —
    and the lerp is arithmetic on the carried (ts, value) structs.
    Cells before the first / after the last observation have only one
    side and stay NULL (interpolation, not extrapolation).

    Output: (key, bucket_ts, value, filled).
    """
    aggs = {
        "avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
        "count": lambda c: F.count(c).cast("double"),
    }
    if agg not in aggs:
        raise ValueError(f"unsupported agg {agg!r}")
    step = int(interval_seconds)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    bucket = F.timestamp_seconds((epoch / step).cast("long") * step)
    obs = (
        df.select(
            F.col(key_col).alias("__k"),
            bucket.alias("__b"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("__k", "__b")
        # persist (r15, the p15/x33 multi-consumer class): the
        # (key, bucket)-bounded observation grid feeds the per-key
        # span probe AND the fill join - unpersisted, the data-sized
        # bucket aggregation ran twice. Float-identical (pure caching).
        .agg(aggs[agg]("__v").alias("__v"))
        .persist()
    )
    grid = (
        obs.groupBy("__k")
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            "__k",
            F.explode(
                F.sequence(
                    F.col("__lo"),
                    F.col("__hi"),
                    F.expr(f"interval {step} seconds"),
                )
            ).alias("__b"),
        )
    )
    joined = grid.join(obs, ["__k", "__b"], "left")
    pt = F.when(
        F.col("__v").isNotNull(),
        F.struct(
            F.col("__b").cast("long").alias("t"),
            F.col("__v").alias("v"),
        ),
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__b").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = joined.withColumn(
        "__prev", F.last(pt, ignorenulls=True).over(wf)
    ).withColumn("__next", F.last(pt, ignorenulls=True).over(wb))
    t = F.col("__b").cast("long")
    p, nx = F.col("__prev"), F.col("__next")
    frac = (t - p["t"]) / F.when(nx["t"] != p["t"], nx["t"] - p["t"])
    interp = F.when(
        F.col("__v").isNotNull(), F.col("__v")
    ).otherwise(p["v"] + (nx["v"] - p["v"]) * frac)
    # raw double out: lerp at dyadic fractions lands on exact 1e-6
    # midpoints where the engines' round() disagree (the w11 class) —
    # callers canonicalize with floor(v*1e6 + 0.5)/1e6 when hashing
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        carried.select(
            F.col("__k").alias(key_col),
            F.col("__b").alias("bucket_ts"),
            interp.alias("value"),
            F.col("__v").isNull().alias("filled"),
        ),
        obs,
    )


def trend_residual_outliers(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Detrended outlier screen — the missing piece between
    ``key_trends`` (is this key drifting?) and the level-based screens
    (``zscore_anomalies``/``mad_outliers``, which flag every late
    point of a steadily-growing series simply because the level
    moved): fit the key's own OLS line over time, then flag points by
    their RESIDUAL z-score. A sensor ramping 2%/day stays quiet; the
    one reading off its own trend line flags.

    Both passes are per-key window aggregates over the same unordered
    frame — the ``regr_*`` fit, then mean/std of the residual —
    stacked Window nodes, ONE keyed shuffle. Keys with a degenerate
    fit (constant time axis) or zero residual variance (perfect line)
    yield NULL scores and never flag, same convention as the family.

    Output: input columns + ``trend`` (fitted value), ``residual``,
    ``resid_z`` (rounded to 6), ``is_outlier``.
    """
    wk = Window.partitionBy(key_col)
    x = F.col(ts_col).cast("timestamp").cast("double")
    y = F.col(value_col).cast("double")
    fitted = df.withColumn(
        "_trend",
        F.regr_intercept(y, x).over(wk) + F.regr_slope(y, x).over(wk) * x,
    ).withColumn("_resid", y - F.col("_trend"))
    rs = F.stddev_samp(F.col("_resid")).over(wk)
    rm = F.avg(F.col("_resid")).over(wk)
    z = F.when(rs > 0, (F.col("_resid") - rm) / rs)
    return (
        fitted.withColumn("trend", F.round(F.col("_trend"), 6))
        .withColumn("residual", F.round(F.col("_resid"), 6))
        .withColumn("resid_z", F.round(z, 6))
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(z) > F.lit(float(threshold)), F.lit(False)),
        )
        .drop("_trend", "_resid")
    )


def rolling_autocorr(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    window: int = 20,
    lag: int = 1,
) -> DataFrame:
    """Trailing lag-``lag`` autocorrelation per key — the
    self-similarity readout that separates genuinely periodic /
    momentum-driven series from noise (near +1: smooth trend or slow
    oscillation; near −1: alternation/ringing at the sampled rate;
    near 0: white noise). The seasonality screen to run before
    trusting ``resample_interp``'s lerp or a forecast on the key.

    One ordered keyed window pass: the lagged value via ``lag()``,
    then Pearson ``corr(x, x_lag)`` over the trailing ``window`` rows
    — both plain ANSI window aggregates, so the oracle restates them
    literally. Rows whose frame holds fewer than 2 complete pairs, or
    a zero-variance side, yield NULL (both engines' corr convention);
    no flag column — autocorrelation is a diagnostic, thresholds
    belong to the caller.

    Output: input columns + ``autocorr`` (rounded to 6).
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    wf = wo.rowsBetween(-(int(window) - 1), Window.currentRow)
    v = F.col(value_col).cast("double")
    lagged = df.withColumn("_lagv", F.lag(v, int(lag)).over(wo))
    return lagged.withColumn(
        "autocorr", F.round(F.corr(v, F.col("_lagv")).over(wf), 6)
    ).drop("_lagv")


def streaks(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    flag,
) -> DataFrame:
    """Gaps-and-islands streak detection per key: maximal runs of
    consecutive rows satisfying ``flag`` (a boolean Column) — uptime
    runs, losing streaks, consecutive-days-active, N-in-a-row alert
    rules; ``sessionize`` groups by TIME gaps, this by PREDICATE
    flips, the other classic islands construction.

    The textbook two-window identity: a running count of flag FLIPS
    (``lag`` ≠ current) assigns every row its island id, then one
    aggregation per (key, island) — both windows on the same keyed
    partitioning, ONE shuffle, O(1) task state. Only flag=true islands
    are returned.

    Output: (key, streak_id, n_rows, start_<order>, end_<order>) —
    one row per streak, ``streak_id`` ordinal per key by start order.
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    f = flag.cast("boolean")
    flip = (
        F.when(F.lag(f).over(wo).eqNullSafe(f), F.lit(0))
        .otherwise(F.lit(1))
    )
    run = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islanded = df.withColumn("_f", f).withColumn(
        "_isl", F.sum(flip).over(run)
    )
    grouped = (
        islanded.where(F.col("_f"))
        .groupBy(key_col, "_isl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(order_col).alias(f"start_{order_col}"),
            F.max(order_col).alias(f"end_{order_col}"),
        )
    )
    w_ord = Window.partitionBy(key_col).orderBy("_isl")
    return grouped.withColumn(
        "streak_id", F.row_number().over(w_ord).cast("long")
    ).drop("_isl")


def state_durations(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """State-timeline compression per key: collapse consecutive rows
    carrying the same state into one episode with start/end times and
    duration — ``streaks`` for VALUED states (device up/degraded/down
    timelines, subscription tiers, circuit-breaker phases), the
    run-length encoding every uptime/SLA report is built from.

    Same one-shuffle flip-count identity as ``streaks`` (null-safe,
    so NULL is a state too); episode duration is microsecond-exact
    (the g7 lesson) and measures first-to-last OBSERVATION of the
    episode — instantaneous single-row episodes have duration 0; gaps
    to the next episode belong to no state by construction.

    Output: (key, episode_id, state, start_ts, end_ts, duration_s,
    n_rows), episode_id ordinal per key.
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    s = F.col(state_col)
    flip = (
        F.when(F.lag(s).over(wo).eqNullSafe(s), F.lit(0))
        .otherwise(F.lit(1))
    )
    run = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islanded = df.withColumn("_ep", F.sum(flip).over(run))
    return (
        islanded.groupBy(key_col, "_ep")
        .agg(
            F.first(s).alias("state"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            F.floor(
                (
                    F.unix_micros(F.max(ts_col))
                    - F.unix_micros(F.min(ts_col))
                )
                / 1_000_000
            ).alias("duration_s"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .withColumnRenamed("_ep", "episode_id")
    )


def rolling_quantile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    window: int = 20,
    q: float = 0.5,
) -> DataFrame:
    """Trailing rolling quantile per key (median by default) — the
    robust twin of ``moving_avg``: a rolling median tracks the level of
    a series without a single spike dragging it (the breakdown point is
    50% vs 0% for the mean), which is why ops dashboards smooth with it
    before alerting.

    One ordered keyed window pass: ``percentile`` (Spark's exact
    interpolated aggregate, usable over a ROWS frame like any
    aggregate) over the trailing ``window`` rows — one shuffle on the
    key, O(window) heap state per row. The interpolation at q=0.5 is
    ``0.5·(a+b)``, which both Spark's symmetric weighted form and
    DuckDB's lerp evaluate to the same double (scaling by a power of
    two commutes with rounding), so the oracle can restate the window
    literally; at other q the engines' formulas may differ by one ulp
    (the a8 class) and callers should round the display value.

    Output: input columns + ``rolling_q`` (rounded to 6).
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    wf = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(-(int(window) - 1), Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    return df.withColumn(
        "rolling_q", F.round(F.percentile(v, F.lit(q)).over(wf), 6)
    )


def double_ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    alpha: float,
) -> DataFrame:
    """Brown's double exponential smoothing per key — the trend-aware
    upgrade of ``ewma``: a single EWMA lags behind a trending series by
    a constant; smoothing the smoothed series a second time measures
    that lag, and ``level = 2·s1 − s2`` cancels it while ``trend =
    α/(1−α)·(s1 − s2)`` estimates the per-step slope. ``forecast =
    level + trend`` is the one-step-ahead prediction (Brown 1959; the
    h-step form is level + h·trend).

    Two composed blocked-scan EWMA passes (each exact in double
    precision, see ``ewma``); both partition by the same key, so the
    second pass reuses the first's keyed layout and AQE coalesces the
    exchange. The combination arithmetic is three IEEE ops spelled
    identically in the oracle — at dyadic alpha the whole pipeline is
    bit-exact vs the sequential recurrence, so a hash can certify the
    decomposition, not a tolerance.

    Output: input columns + ``s1``, ``s2``, ``level``, ``trend``,
    ``forecast`` (raw doubles — display rounding is the caller's, see
    ``ewma`` on why).
    """
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1) for double smoothing")
    k = alpha / (1.0 - alpha)
    s1 = ewma(df, key_col, ts_col, order_col, value_col, alpha).withColumnRenamed(
        "ewma", "s1"
    )
    s2 = ewma(s1, key_col, ts_col, order_col, "s1", alpha).withColumnRenamed(
        "ewma", "s2"
    )
    out = (
        s2.withColumn("level", F.lit(2.0) * F.col("s1") - F.col("s2"))
        .withColumn("trend", F.lit(k) * (F.col("s1") - F.col("s2")))
        .withColumn("forecast", F.col("level") + F.col("trend"))
    )
    return out


def _season_slot(ts_col: str, period: str):
    extractors = {
        "hour": F.hour,
        "dayofweek": F.dayofweek,
        "dayofmonth": F.dayofmonth,
    }
    if period not in extractors:
        raise ValueError(f"period must be one of {sorted(extractors)}")
    return extractors[period](F.col(ts_col)).cast("long")


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: str = "hour",
) -> DataFrame:
    """The (key, slot) seasonal profile ``seasonal_baseline`` scores
    against — exposed separately so it can be built nightly from
    history, parquet-backed, and fed to BOTH the batch scorer and its
    streaming twin (``ts_stream.seasonal_baseline_stream``). One
    groupBy shuffle reduced to keys×slots rows.

    Output: (key, season_slot, _mu, _sd, _n).
    """
    slot = _season_slot(ts_col, period)
    v = F.col(value_col).cast("double")
    return df.withColumn("season_slot", slot).groupBy(
        key_col, "season_slot"
    ).agg(
        F.avg(v).alias("_mu"),
        F.stddev_samp(v).alias("_sd"),
        F.count(v).alias("_n"),
    )


def seasonal_baseline(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: str = "hour",
    min_n: int = 2,
    threshold: float = 3.0,
) -> DataFrame:
    """Seasonal-profile anomaly screen per key: score every value
    against the mean/stddev of its OWN seasonal slot (hour-of-day by
    default) — the "is 500 req/s at 3am weird?" detector that a global
    z-score cannot express, and the first seasonality model to try
    before anything stateful.

    Scale-first shape: a plain windowed z-score over ``(key, slot)``
    would put each slot's entire history in ONE task (slots are
    low-cardinality — 24 per key — so groups grow linearly with data).
    Instead: one ``groupBy(key, slot)`` aggregation (map-side partials,
    the shuffle moves keys×24 rows) builds the profile, then a join
    (AQE-broadcast when the profile is small) stamps it back — the
    scoring pass is map-only in that regime. Slots
    with fewer than ``min_n`` points or zero variance score NULL and
    never flag.

    Output: input + ``season_slot``, ``expected``, ``seasonal_z``,
    ``is_spike``.
    """
    slot = _season_slot(ts_col, period)
    v = F.col(value_col).cast("double")
    base = df.withColumn("season_slot", slot)
    profile = seasonal_profile(df, key_col, ts_col, value_col, period)
    # NO forced broadcast (r13): the profile is keys×slots — data-sized
    # for user keys; AQE broadcasts it at runtime when actually small
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


def attribution(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    event_col: str,
    is_conversion,
    is_touch=None,
) -> DataFrame:
    """First-touch / last-touch attribution: for every conversion
    event, which earlier event of the same key gets the credit — the
    marketing-analytics staple ("did the signup come from the ad click
    or the blog view?"), and generally the "what preceded this
    outcome" join that powers on-call timelines too.

    One ordered keyed window with a strictly-preceding frame (a
    conversion never attributes to itself, or to anything after it):
    ``first``/``last`` with ``ignorenulls`` over the touch-masked
    event column give both ends of the preceding touch history, a
    masked ``count`` gives the path length. Single shuffle on the key;
    O(1) running state per row. Conversions with NO preceding touch
    (organic) keep NULL touches and n_touches = 0 — they are a real
    segment, not an error.

    ``is_touch`` defaults to "anything that is not a conversion";
    pass a Column to restrict credit to specific channels.

    Output: the conversion rows only, + ``first_touch``,
    ``last_touch``, ``n_touches``.
    """
    conv = is_conversion.cast("boolean")
    touch = (~conv) if is_touch is None else is_touch.cast("boolean")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    masked = F.when(touch, F.col(event_col))
    return (
        df.withColumn(
            "first_touch", F.first(masked, ignorenulls=True).over(w)
        )
        .withColumn("last_touch", F.last(masked, ignorenulls=True).over(w))
        .withColumn("n_touches", F.count(masked).over(w).cast("long"))
        .where(conv)
    )


def theil_sen(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    max_points: int = 2000,
) -> DataFrame:
    """Theil–Sen robust trend per key: the median of all pairwise
    slopes — up to ~29% of the points can be arbitrarily corrupt
    before the estimate moves (OLS breaks at one outlier), which is
    why it's the fit of choice for sensor drift and SLO trends where
    spikes are data, not noise. ``key_trends`` (w12) is the OLS twin.

    The pair enumeration is one self-join keyed on the key with an
    ordinal inequality — O(n²) per key BY DEFINITION, so the operator
    fail-fasts (limit-5 probe naming offenders) on keys beyond
    ``max_points`` instead of silently exploding; sample hot keys
    down first, or raise the cap deliberately. Slopes of coincident
    timestamps are excluded (vertical). The intercept is the classic
    ``median(y − slope·x)`` second pass — one more keyed aggregation
    joined on the key, using the UNROUNDED slope.

    All arithmetic is engine-portable: epoch seconds via
    ``unix_micros/1e6``, pairwise differences/divisions, and median
    interpolation at 0.5 (exactly ``0.5·(a+b)`` in IEEE doubles), so
    an oracle can restate the whole estimator.

    Output: (key, n_points, n_pairs, slope, intercept), slope rounded
    to 8, intercept to 6.
    """
    x = (F.unix_micros(F.col(ts_col)) / F.lit(1000000.0)).alias("_x")
    v = F.col(value_col).cast("double").alias("_v")
    base = df.select(F.col(key_col), x, v).localCheckpoint(eager=False)
    # persist (r15, the p15/x33 multi-consumer class): counts feeds
    # the hot-key guard AND the output join — without the (key-bounded)
    # cache the aggregation over the checkpointed base ran twice.
    counts = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n")
    ).persist()
    hot = counts.where(F.col("_n") > int(max_points)).limit(5)
    try:
        offenders = [(r[key_col], r["_n"]) for r in hot.collect()]
    except BaseException:
        counts.unpersist()
        raise
    if offenders:
        counts.unpersist()
        raise ValueError(
            f"theil_sen: keys exceed max_points={max_points}: "
            f"{offenders} — pairwise slopes are O(n²); sample these "
            "keys down or raise the cap deliberately"
        )
    a, b = base.alias("a"), base.alias("b")
    pairs = (
        a.join(b, key_col)
        # strictly-increasing x enumerates each usable pair once AND
        # excludes vertical (coincident-timestamp) pairs in one shot
        .where(F.col("a._x") < F.col("b._x"))
        .select(
            F.col(key_col),
            (
                (F.col("b._v") - F.col("a._v"))
                / (F.col("b._x") - F.col("a._x"))
            ).alias("_s"),
        )
    )
    # persist (r15): slopes feeds the intercept pass AND the output
    # join — without the (key-bounded) cache the O(n²) pair
    # enumeration + median ran TWICE (the plan shows zero exchange
    # reuse across the two references). Pure caching, float-identical.
    slopes = pairs.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.percentile(F.col("_s"), F.lit(0.5)).alias("_slope"),
    ).persist()
    with_slope = base.join(slopes, key_col)
    inter = with_slope.groupBy(key_col).agg(
        F.percentile(
            F.col("_v") - F.col("_slope") * F.col("_x"), F.lit(0.5)
        ).alias("_icpt")
    )
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        counts.join(slopes, key_col)
        .join(inter, key_col)
        .select(
            key_col,
            F.col("_n").cast("long").alias("n_points"),
            "n_pairs",
            F.round(F.col("_slope"), 8).alias("slope"),
            F.round(F.col("_icpt"), 6).alias("intercept"),
        ),
        counts,
        slopes,
    )


def rolling_active(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling active-entity counts — DAU and trailing-window WAU/MAU,
    the engagement metrics every product dashboard opens with, and a
    window-DISTINCT aggregation Spark's frames cannot express (COUNT
    DISTINCT OVER a range frame is unsupported because per-frame set
    state is unbounded).

    The scale-correct decomposition: collapse to DISTINCT (entity,
    day) pairs FIRST (the only corpus-sized aggregation — everything
    after works on activity pairs, not events), then each pair votes
    map-side for the ``window_days`` window-end days it falls inside
    (one explode, replication = window size — this is the knob:
    MAU costs 30×pairs, not 30×events), dedup (entity, window_day),
    and count per day. Days beyond the last observed activity are
    clipped (they would report phantom windows).

    Output: (day, dau, wau) — wau counts entities active in the
    trailing ``window_days`` ending that day; the column is named wau
    for any window (rename at call site for MAU).
    """
    from ixmp_spark.operators import attach_caches

    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    # persist, not localCheckpoint: the operator is not iterative, so
    # lineage truncation buys nothing, while a checkpointed-RDD scan
    # has UnknownPartitioning and no size statistics — the planner
    # loses the stats that size the dau/wau join (the x5 class).
    pairs = (
        df.select(F.col(entity_col).alias("_e"), day.alias("_d"))
        .distinct()
        .persist()
    )
    # dau is day-sized (tiny); persisting it lets the clip bound
    # derive from dau instead of a third full pass over pairs — at
    # scale pairs is data-sized (distinct entity-days) and max(day)
    # over dau is the same value for the price of a |days|-row scan.
    dau = (
        pairs.groupBy(F.col("_d").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("dau"))
        .persist()
    )
    votes = pairs.select(
        "_e",
        F.explode(
            F.sequence(
                F.col("_d"),
                F.date_add(F.col("_d"), int(window_days) - 1),
            )
        ).alias("day"),
    ).distinct()
    max_day = dau.agg(F.max("day").alias("_max"))
    wau = (
        votes.crossJoin(F.broadcast(max_day))
        .where(F.col("day") <= F.col("_max"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    out = dau.join(wau, "day", "left").select("day", "dau", "wau")
    return attach_caches(out, pairs, dau)


def gap_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    min_gap_s: float = 3600.0,
) -> DataFrame:
    """Data-downtime detection per key: every silence longer than
    ``min_gap_s`` between CONSECUTIVE observations — the "sensor went
    dark / pipeline stalled" report, sessionize's complement (it
    returns the holes, not the islands).

    One ordered keyed window (lag + microsecond-exact delta, the g7
    lesson), then a filter — single shuffle, O(1) task state. The
    first observation of a key opens no gap (nothing precedes it);
    trailing silence after the last observation is undetectable
    without a corpus-end reference and is deliberately out of scope.

    Output: (key, gap_start, gap_end, gap_s), one row per gap.
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(wo)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    return (
        df.withColumn("_prev", prev)
        .withColumn("_gap_s", gap_us / 1_000_000.0)
        .where(F.col("_gap_s") > float(min_gap_s))
        .select(
            F.col(key_col),
            F.col("_prev").alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            F.round("_gap_s", 6).alias("gap_s"),
        )
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    period: str = "hour",
    trend_window: int = 24,
    round_digits: int | None = 6,
) -> DataFrame:
    """Classical additive decomposition per key: value = trend +
    seasonal + residual — the first model to fit a periodic series
    (Kendall's "classical decomposition"; STL's iterated-loess
    refinement starts from exactly this). The residual is what
    anomaly screens SHOULD score once a series has both drift and
    rhythm: w10's z-score flags every rush hour, w25 mistakes a
    slow ramp for anomalies; this removes both first.

    Three passes, all on the same key partitioning (ONE shuffle,
    AQE reuses the exchange): (1) trend = centered moving average
    over ``trend_window`` rows (the classical smoother — windowed
    mean, frame ±window/2); (2) seasonal = the per-(key, slot) mean
    of the DETRENDED series, stamped back via the w25 profile join
    (AQE-broadcast when small; slot windows would put a slot's
    history in one task);
    (3) residual = value − trend − seasonal. Edge rows whose trend
    frame is incomplete still decompose (partial-frame mean, the
    standard pragmatic choice; drop ``n_in_frame < trend_window``
    rows downstream for strictness).

    Output: input + ``trend``, ``seasonal``, ``residual`` (rounded
    to 6), ``season_slot``.
    """
    half = int(trend_window) // 2
    v = F.col(value_col).cast("double")
    wt = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(order_col))
        .rowsBetween(-half, half)
    )
    slot = _season_slot(ts_col, period)
    base = df.withColumn("trend", F.avg(v).over(wt)).withColumn(
        "season_slot", slot
    )
    detr = v - F.col("trend")
    prof = base.groupBy(key_col, "season_slot").agg(
        F.avg(detr).alias("seasonal")
    )
    # NO forced broadcast (r13): prof carries one row per (key, slot) —
    # data-sized for user keys; AQE broadcasts it at runtime when it
    # is actually small, which a hint would pin regardless of scale
    out = base.join(prof, [key_col, "season_slot"]).withColumn(
        "residual", detr - F.col("seasonal")
    )
    if round_digits is None:
        # raw doubles: detrended means land on exact round() midpoints
        # constantly (the w11 EWMA class) — callers needing a display
        # value must round with explicitly-shared arithmetic
        return out
    return (
        out.withColumn("trend", F.round("trend", round_digits))
        .withColumn("seasonal", F.round("seasonal", round_digits))
        .withColumn("residual", F.round("residual", round_digits))
    )


def cohort_ltv(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col,
    max_age_days: int = 30,
) -> DataFrame:
    """Cohort lifetime-value curves: entities grouped by FIRST-SEEN
    day, then each cohort's cumulative per-entity value tracked by
    age in days — the "is month-2 revenue per signup improving
    cohort over cohort" readout behind every retention/payback
    analysis (g3's retention matrix counts who comes back; this sums
    what they're worth).

    One window pass pins each entity's cohort day (min over the key
    partitioning — same single shuffle as the value rows), ages are
    integer day deltas, then one (cohort, age) aggregation and a
    cumulative window over the (small) cohort×age grid. Value rows
    beyond ``max_age_days`` are clipped (curves are only comparable
    over a shared horizon). ``cum_ltv_per_user`` divides by COHORT
    SIZE (entities who ever appeared), not by age-active entities —
    the standard definition, churned users keep dragging the average.

    Output: (cohort_day, age_days, cohort_size, value_sum, cum_value,
    cum_ltv_per_user).
    """
    v = (
        F.col(value_col).cast("double")
        if isinstance(value_col, str)
        else value_col.cast("double")
    )
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    wk = Window.partitionBy(key_col)
    base = df.withColumn("_day", day).withColumn(
        "_cohort", F.min("_day").over(wk)
    )
    aged = base.withColumn(
        "_age", F.datediff(F.col("_day"), F.col("_cohort"))
    ).where(F.col("_age") <= int(max_age_days))
    sizes = base.groupBy(F.col("_cohort").alias("cohort_day")).agg(
        F.size(F.collect_set(F.col(key_col))).cast("long").alias(
            "cohort_size"
        )
    )
    grid = aged.groupBy(
        F.col("_cohort").alias("cohort_day"),
        F.col("_age").cast("long").alias("age_days"),
    ).agg(F.round(F.sum(v), 6).alias("value_sum"))
    wc = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.withColumn("cum_value", F.round(F.sum("value_sum").over(wc), 6))
        .join(sizes, "cohort_day")
        .withColumn(
            "cum_ltv_per_user",
            F.round(F.col("cum_value") / F.col("cohort_size"), 6),
        )
        .select(
            "cohort_day", "age_days", "cohort_size", "value_sum",
            "cum_value", "cum_ltv_per_user",
        )
    )


def kaplan_meier(
    df: DataFrame,
    cohort_col: str,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival curves per cohort — time-to-event
    analysis done RIGHT under censoring: churn/failure/conversion
    studies always have subjects still alive at observation end, and
    both naive fixes bias the answer (dropping censored rows
    overstates the hazard, treating them as events understates
    survival). The product-limit estimator uses each censored subject
    exactly as long as it was observed.

    One (cohort, duration) aggregation collapses subjects to the
    distinct-time grid (the only subject-sized pass), then three
    windows on the cohort partitioning over that SMALL grid: the
    risk set ``n_t = total − Σ_{s<t}(events+censored)``, and the
    survival product via the log identity ``S_t = exp(Σ_{s≤t}
    ln(1 − d_s/n_s))`` — a running product as a running sum, the only
    window-safe spelling (censored-only times contribute ln(1) = 0
    and keep S flat, the defining KM behavior). A final risk set
    consumed entirely by events drives S to exactly 0 via ln(0) =
    −inf (IEEE, both engines).

    Output: (cohort, duration, n_at_risk, d_events, n_censored,
    survival), one row per distinct observed duration, survival
    rounded to 6 (per-term libm ln/exp ulps, the a8 class).
    """
    e = F.col(event_col).cast("long")
    g = df.groupBy(
        F.col(cohort_col).alias("cohort"),
        F.col(duration_col).alias("duration"),
    ).agg(
        F.sum(e).cast("long").alias("d_events"),
        F.sum(F.lit(1) - e).cast("long").alias("n_censored"),
    )
    wo = Window.partitionBy("cohort").orderBy("duration")
    prev = wo.rowsBetween(Window.unboundedPreceding, -1)
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy("cohort")
    leave = F.col("d_events") + F.col("n_censored")
    n_at_risk = F.sum(leave).over(whole) - F.coalesce(
        F.sum(leave).over(prev), F.lit(0)
    )
    based = g.withColumn("n_at_risk", n_at_risk.cast("long"))
    factor = F.when(
        (F.col("d_events") > 0) & (F.col("d_events") < F.col("n_at_risk")),
        F.log(
            F.lit(1.0)
            - F.col("d_events") * F.lit(1.0) / F.col("n_at_risk")
        ),
    ).otherwise(F.lit(0.0))
    # a risk set consumed entirely by events pins S to exactly 0 from
    # that time on — flagged explicitly because ln(0) is an ERROR in
    # some engines (DuckDB) and NULL in others (Spark), never the
    # -inf the math wants
    dead = F.max(
        (F.col("d_events") == F.col("n_at_risk")).cast("int")
    ).over(run)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(factor).over(run))
    )
    return based.withColumn("survival", F.round(surv, 6)).select(
        "cohort", "duration", "n_at_risk", "d_events", "n_censored",
        "survival",
    )


def max_drawdown(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key maximum drawdown of the cumulative value curve — the
    worst peak-to-trough fall of each key's running total (spend
    curves, score trajectories, battery/quota budgets). The classic
    three-window stack: running sum → running max → max gap, all over
    ONE (key, time) ordering, so Spark plans a single sort per key and
    zero extra shuffles after the keyed exchange.

    Cross-engine contract: the ordering must be TOTAL — ``tiebreak_col``
    breaks ts ties — so both engines add values in the identical
    sequence and the running sums are bit-identical floats (the w3
    running-total lesson); max/subtract preserve that exactness, so
    round(…, 4) certifies.

    Output per key: (key, n, final_value, peak_value, max_drawdown) —
    drawdown as a POSITIVE number, 0.0 for monotone-rising curves.
    """
    order = [F.col(ts_col), F.col(tiebreak_col)]
    wcum = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(key_col)
    # final row picked via row_number == count — NOT last()/max_by,
    # whose group-aggregate order is engine/plan-defined
    curve = (
        df.select(key_col, ts_col, tiebreak_col, value_col)
        .withColumn("_cum", F.sum(value_col).over(wcum))
        .withColumn("_peak", F.max("_cum").over(wcum))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key_col).orderBy(*order)
            ),
        )
        .withColumn("_nk", F.count(F.lit(1)).over(wall))
    )
    return curve.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.max(F.when(F.col("_rn") == F.col("_nk"), F.col("_cum"))), 4
        ).alias("final_value"),
        F.round(F.max("_peak"), 4).alias("peak_value"),
        F.round(F.max(F.col("_peak") - F.col("_cum")), 4).alias(
            "max_drawdown"
        ),
    )


def changepoint_single(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Single change-point detection per key (AMOC — at-most-one-change
    — via the CUSUM argmax identity): find the split that maximizes
    the scaled mean-shift statistic
    ``|S_k − (k/n)·S_n| / √(k·(n−k)/n)`` over candidate split points
    k = 1..n−1 — "WHEN did this series' level change", the localization
    companion to w13's CUSUM drift ALARM (w13 says "something
    changed"; this says where, retrospectively, per key). Standard
    binary-segmentation first step (Page/Hinkley lineage, public).

    Scale contract: candidate splits live on the per-(key, time) GRAIN
    frame — callers aggregate to a grain first (day/hour), so the
    windows run over grain-bounded key partitions, never raw rows
    (the w11/w12 time-series family contract). Two windows on ONE
    keyed sort: a cumulative sum/count and the per-key totals frame
    via unbounded window on the same partitioning. The argmax is a
    ``max_by`` over the exact-integer-weighted statistic; ties break
    to the EARLIEST split time (deterministic). Means divide once at
    the end. Keys with < 2 grain points emit nothing (no split
    exists).

    Output: (key, n_points, split_time, mean_before, mean_after,
    shift, cusum_stat), one row per key, rounded to 6/4.
    """
    grain = df.select(
        F.col(key_col).alias("_k"),
        F.col(time_col).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull())
    wc = (
        Window.partitionBy("_k")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = (
        Window.partitionBy("_k")
        .rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    cum = grain.select(
        "_k", "_t",
        F.sum("_v").over(wc).alias("_sk"),
        F.count(F.lit(1)).over(wc).cast("double").alias("_ck"),
        F.sum("_v").over(wall).alias("_sn"),
        F.count(F.lit(1)).over(wall).cast("double").alias("_n"),
    ).where(F.col("_ck") < F.col("_n"))  # k = 1..n-1
    g = F.col("_sk") - F.col("_ck") / F.col("_n") * F.col("_sn")
    stat = F.abs(g) / F.sqrt(
        F.col("_ck") * (F.col("_n") - F.col("_ck")) / F.col("_n")
    )
    scored = cum.select(
        "_k", "_t", "_sk", "_ck", "_sn", "_n", stat.alias("_q")
    )
    best = scored.groupBy(F.col("_k")).agg(
        F.max_by(
            F.struct("_t", "_sk", "_ck", "_q"),
            # earliest-time tie-break: negate a monotone time rank by
            # packing (_q, -epoch) lexicographically via struct order
            F.struct(
                F.col("_q"),
                (-F.col("_t").cast("timestamp").cast("double")).alias(
                    "_neg"
                ),
            ),
        ).alias("_b"),
        F.max("_n").alias("_n"),
        F.max("_sn").alias("_sn"),
    )
    mb = F.col("_b._sk") / F.col("_b._ck")
    ma = (F.col("_sn") - F.col("_b._sk")) / (F.col("_n") - F.col("_b._ck"))
    return best.select(
        F.col("_k").alias(key_col),
        F.col("_n").cast("long").alias("n_points"),
        F.col("_b._t").alias("split_time"),
        F.round(mb, 6).alias("mean_before"),
        F.round(ma, 6).alias("mean_after"),
        F.round(ma - mb, 6).alias("shift"),
        F.round(F.col("_b._q"), 4).alias("cusum_stat"),
    )


def transition_pmi(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_col: str = "event_id",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information over consecutive event pairs —
    "which follow-ups are SURPRISINGLY common given both events'
    base rates": PMI(src, dst) = ln(p(src,dst)/(p(src)·p(dst)))
    over the step distribution, the association score that separates
    a genuine funnel edge from two independently-popular events that
    merely co-occur (event_transitions' raw P(dst|src) conflates the
    two). The sequence-mining analogue of the t-family's token PMI.

    Plan shape: the same ONE user-keyed ``lead`` window as
    event_transitions (ties broken by ``order_col``), then a pair
    aggregation; the marginals and the step total are WINDOW sums over
    the pair grid itself — |event types|²-bounded, the adjudicated
    domain-bounded frame class — so the grid is scanned once with no
    joins and no recomputation of the lead stage. ``min_count`` drops
    pairs too rare for a stable estimate (their PMI is dominated by
    noise). NULL events carry no steps. Output per pair:
    (src, dst, n, pmi) — PMI in nats, rounded 6 — sorted by PMI
    descending then (src, dst).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    steps = (
        df.where(F.col(event_col).isNotNull())
        .withColumn("_dst", F.lead(event_col).over(w))
        .where(F.col("_dst").isNotNull())
        .select(F.col(event_col).alias("src"), F.col("_dst").alias("dst"))
    )
    pairs = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = (
        pairs.withColumn("_ns", F.sum("_n").over(Window.partitionBy("src")))
        .withColumn("_nd", F.sum("_n").over(Window.partitionBy("dst")))
        .withColumn("_t", F.sum("_n").over(wall))
        .where(F.col("_n") >= float(min_count))
    )
    pmi = F.log(
        (F.col("_n") * F.col("_t")) / (F.col("_ns") * F.col("_nd"))
    )
    return j.select(
        "src",
        "dst",
        F.col("_n").cast("long").alias("n"),
        F.round(pmi, 6).alias("pmi"),
    ).orderBy(F.desc("pmi"), "src", "dst")


def markov_stationary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_col: str = "event_id",
    teleport: float = 0.0,
    tol: float = 1e-12,
    max_iter: int = 10_000,
    max_states: int = 10_000,
    max_edges: int = 1_000_000,
) -> DataFrame:
    """Stationary distribution of the event-transition Markov chain —
    "where do user journeys SPEND their time in the long run", the
    eigenvector readout that completes the family (g5 = the matrix,
    g12 = edge surprise, this = node equilibrium; pagerank's cousin
    on the behavioral graph).

    Scale contract (the x27/x22 bounded-block class): the chain
    collapses to the |event types|² transition grid in one lead
    window + one aggregation; the grid collects (EDGE rows guarded by
    ``max_edges``, the derived STATE count by ``max_states`` — two
    honest bounds: edges cap the driver collect, states cap the dense
    n×n matrix; converge-or-raise) and the power iteration runs
    as exact numpy on the driver — zero per-round Spark jobs, the
    parameter-server lesson from bradley_terry applied at its
    natural (tiny) scale. Rows with no successor contribute no
    transition; states with NO outgoing edges (absorbing under the
    raw counts) redistribute uniformly (the standard dangling-node
    fix), and ``teleport`` > 0 adds the PageRank-style damping for
    chains that are otherwise periodic/reducible. Convergence is the
    L1 delta ≤ ``tol`` or raise. Output: (state, stationary_p)
    rounded 8, sorted descending.
    """
    import numpy as np

    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    steps = (
        df.where(F.col(event_col).isNotNull())
        .withColumn("_dst", F.lead(event_col).over(w))
        .where(F.col("_dst").isNotNull())
        .groupBy(F.col(event_col).alias("_s"), F.col("_dst").alias("_d"))
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
    )
    # persist + count + full collect, not a limit-probe: CollectLimit
    # stages the materialization in escalating partition waves
    # (sequential jobs), where count() on the persisted grid is one
    # fully-parallel job — the bradley_terry finding; the guard also
    # reports the true edge count.
    steps = steps.persist()
    n_edges = steps.count()
    if n_edges > max_edges:
        steps.unpersist()
        raise ValueError(
            f"markov_stationary: {n_edges} transition-grid (src,dst)"
            f" rows exceed max_edges={max_edges} — bucket the event"
            " domain first"
        )
    pdf = steps.toPandas()
    steps.unpersist()
    if pdf.empty:
        return df.sparkSession.createDataFrame(
            [], "state string, stationary_p double"
        )
    states = sorted(set(pdf["_s"]) | set(pdf["_d"]))
    if len(states) > max_states:
        raise ValueError(
            f"markov_stationary: {len(states)} states exceed max_states="
            f"{max_states} (dense n×n iteration) — bucket the event"
            " domain first"
        )
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    P = np.zeros((n, n), dtype=np.float64)
    for s, d, cnt in pdf[["_s", "_d", "_n"]].itertuples(
        index=False, name=None
    ):
        P[idx[s], idx[d]] = cnt
    out_mass = P.sum(axis=1)
    dangling = out_mass == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        P = np.where(out_mass[:, None] > 0, P / out_mass[:, None], 0.0)
    P[dangling] = 1.0 / n
    a = float(teleport)
    pi = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        nxt = (1 - a) * (pi @ P) + a / n
        if np.abs(nxt - pi).sum() <= tol:
            pi = nxt
            break
        pi = nxt
    else:
        raise RuntimeError(
            f"markov_stationary did not converge in {max_iter} rounds"
            " (periodic/reducible chain? set teleport > 0)"
        )
    pi = pi / pi.sum()
    rows = sorted(
        ((states[i], round(float(pi[i]), 8)) for i in range(n)),
        key=lambda t: (-t[1], t[0]),
    )
    return df.sparkSession.createDataFrame(
        rows, "state string, stationary_p double"
    )


def interval_union_length(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Total length of the UNION of half-open intervals [start, end)
    per key — merged overlaps counted once: the coverage/dwell measure
    behind "how long was this user actually active", machine uptime
    from overlapping leases, and effective campaign exposure, where
    naive sum(end − start) double-counts every overlap.

    The classic sweep line, distributed: each interval emits a +1
    boundary at start and a −1 at end; ONE per-key sort (starts before
    ends at equal time, so touching intervals merge) gives the running
    active count, and the union length is the sum of gaps to the next
    boundary while active > 0. One shuffle on the key, O(n log n) per
    key — no interval self-join whose overlap fan-out can explode
    (the j11 range-join trap for dense keys). Inputs are numeric
    (epoch seconds/integers — the caller quantizes, keeping the sums
    exact); rows with NULL or end ≤ start are excluded. Output per
    key: (key, n_intervals, union_len) sorted by key.
    """
    iv = df.where(
        F.col(key_col).isNotNull()
        & F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) > F.col(start_col))
    ).select(
        F.col(key_col).alias("_k"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    )
    # both boundary events from ONE scan of the unpersisted interval
    # projection (r15, the interval_union fix): the union's two
    # branches each re-read the source
    bounds = iv.select(
        "_k",
        F.explode(
            F.array(
                F.struct(F.col("_s").alias("_t"), F.lit(1).alias("_d")),
                F.struct(F.col("_e").alias("_t"), F.lit(-1).alias("_d")),
            )
        ).alias("__ev"),
    ).select("_k", "__ev._t", "__ev._d")
    w = Window.partitionBy("_k").orderBy(F.asc("_t"), F.desc("_d"))
    swept = bounds.withColumn(
        "_active", F.sum("_d").over(w)
    ).withColumn("_nxt", F.lead("_t").over(w))
    return (
        swept.groupBy("_k")
        .agg(
            (
                F.sum(F.when(F.col("_d") == 1, 1).otherwise(0))
            ).alias("n_intervals"),
            F.sum(
                F.when(
                    (F.col("_active") > 0) & F.col("_nxt").isNotNull(),
                    F.col("_nxt") - F.col("_t"),
                ).otherwise(F.lit(0))
            ).alias("union_len"),
        )
        .select(F.col("_k").alias(key_col), "n_intervals", "union_len")
        .orderBy(key_col)
    )


def running_active_time(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    horizon: int = 300,
) -> DataFrame:
    """Per-event RUNNING active time: after each event, the total union
    length of all the key's activity intervals [t, t+horizon) so far —
    the prefix form of ``interval_union_length`` for the fixed-length
    per-event interval case, where sortedness collapses the sweep line
    to one lag: each event contributes ``min(horizon, t − prev_t)``
    (the first contributes ``horizon``), because a gap longer than the
    horizon caps at it and an overlap counts only the uncovered part.

    One keyed sort (lag + running sum over the same window frame);
    exact integer epoch-second arithmetic. This is the batch/backfill
    twin of ``streaming.ts_stream.active_time_stream`` (two scalars of
    state per key there; pinned batch-equal). Output per event:
    (order, key, active_s) — the running total INCLUDING this event's
    interval.
    """
    df = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(order_col).isNotNull()
    )
    t = F.unix_timestamp(ts_col)
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    contrib = F.when(
        F.lag(ts_col).over(w).isNull(), F.lit(int(horizon))
    ).otherwise(
        F.least(F.lit(int(horizon)), t - F.unix_timestamp(F.lag(ts_col).over(w)))
    )
    run = Window.partitionBy(key_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.select(
        F.col(order_col),
        F.col(key_col),
        F.sum(contrib).over(run).cast("long").alias("active_s"),
    )


def interarrival_burstiness(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    min_gaps: int = 2,
) -> DataFrame:
    """Inter-arrival burstiness per key — "is this actor a steady
    clock, a Poisson stream, or a bursty human" from the gap
    distribution between consecutive events: B = (σ − μ)/(σ + μ) over
    the gaps (Goh & Barabási's burstiness parameter, public) — −1 for
    a periodic clock, 0 for Poisson, → +1 for heavy bursts. The
    bot-vs-human screen of the session family (g1 cuts sessions at a
    gap threshold; this reads the SHAPE of all gaps), and the feature
    a training pipeline uses to down-weight scripted traffic.

    One lag window per key (``order_col`` tiebreak — the w36/x29 NULL
    discipline: NULL key/ts rows are excluded before the window) +
    one aggregation. Timestamps convert via ``cast("double")`` —
    fractional epoch seconds, the g1 convention matching DuckDB's
    ``epoch()`` (integer-second truncation would corrupt sub-second
    gaps); μ and σ (population) come from Σgap and Σgap² in one pass
    and divide once (per-key gap counts are small, so round-6 absorbs
    float association order). Keys with fewer than ``min_gaps`` gaps
    emit NULL cv/burstiness (σ of one gap is 0/undefined signal, not
    evidence). Output: (key, n_gaps, mean_gap_s, cv, burstiness).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    sec = F.col(ts_col).cast("double")
    gaps = (
        df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("k"),
            (sec - F.lag(sec).over(w)).alias("_gap"),
        )
        .where(F.col("_gap").isNotNull())
    )
    n = F.count(F.lit(1))
    s1 = F.sum("_gap")
    s2 = F.sum(F.col("_gap") * F.col("_gap"))
    mu = s1 / n
    var = s2 / n - mu * mu  # population variance from exact int sums
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = n >= min_gaps
    return (
        gaps.groupBy("k")
        .agg(
            n.cast("long").alias("n_gaps"),
            F.round(mu, 6).alias("mean_gap_s"),
            F.round(F.when(ok & (mu > 0), sd / mu), 6).alias("cv"),
            F.round(
                F.when(ok & (sd + mu > 0), (sd - mu) / (sd + mu)), 6
            ).alias("burstiness"),
        )
        .orderBy("k")
    )


def path_entropy(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-user journey predictability: Shannon entropy of the user's
    OWN transition distribution (src→dst bigrams over their
    time-ordered events) — 0 bits for a user who always follows the
    same edge, log2(#distinct edges) for one spreading evenly. The
    per-actor member of the transition family (g5 = the corpus
    matrix, g12 = corpus edge surprise, g13 = global equilibrium;
    this = how deterministic is EACH actor), and the
    scripted-traffic screen that complements g14's timing-based
    burstiness with a structure-based readout.

    One lead window per user (NULL key/ts excluded first, order_col
    tiebreak) → one (user, src, dst) count aggregation → one per-user
    fold using the same one-pass identity as t21:
    H = log2(n) − Σ c·log2(c)/n. ``norm_entropy`` divides by
    log2(#distinct edges) (NULL when the user has one distinct edge —
    0/0 is "trivially deterministic", not a ratio). Users with no
    transitions (single event) emit no row.
    Output: (user, n_transitions, n_distinct_transitions,
    entropy_bits, norm_entropy) rounded 6, sorted by user.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    steps = (
        df.where(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(event_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("k"),
            F.col(event_col).alias("_s"),
            F.lead(event_col).over(w).alias("_d"),
        )
        .where(F.col("_d").isNotNull())
        .groupBy("k", "_s", "_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    n = F.sum("_c").cast("double")
    d = F.count(F.lit(1))
    ent = F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n
    return (
        steps.groupBy("k")
        .agg(
            F.sum("_c").cast("long").alias("n_transitions"),
            d.cast("long").alias("n_distinct_transitions"),
            F.round(ent, 6).alias("entropy_bits"),
            F.round(
                F.when(d >= 2, ent / F.log2(d.cast("double"))), 6
            ).alias("norm_entropy"),
        )
        .orderBy("k")
    )


def funnel_latency(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    steps: tuple = (
        ("view", "click"),
        ("click", "purchase"),
        ("view", "purchase"),
    ),
    quantiles: tuple = (0.5, 0.9),
) -> DataFrame:
    """Time-to-convert per funnel step pair — g4 counts WHO converts,
    this measures HOW LONG conversion takes: per user, the latency
    from their FIRST src event to their FIRST dst event (dst at or
    after src), summarized per step pair as conversion rate plus
    latency quantiles. The SLA/propensity readout every funnel
    dashboard pairs with the counts.

    Scale contract (the x28 value-domain-bounded discipline — the
    first draft ranked every converted user in one global window, a
    single-partition sort over an unbounded frame that the plan audit
    flagged): latencies quantize to WHOLE SECONDS, so the quantile
    frame is (step, lat_s) with cardinality bounded by steps × the
    corpus TIME SPAN in seconds, never the user count. One
    conditional-min aggregation per user builds the first-event frame;
    one melt (explode over step structs — a single pass, no per-pair
    recompute) emits the pair rows; ONE cumulative window partitioned
    by step computes every quantile as the cumulative-crossing value
    (smallest lat_s whose running count reaches ⌈q·n⌉ — the w17
    lower-quantile definition, exactly replayable cross-engine).
    Output per step: (step_src, step_dst, n_src_users, n_converted,
    conv_rate, p<q>_s ...), sorted by step.
    """
    sec = F.col(ts_col).cast("double")
    types = sorted({t for pair in steps for t in pair})
    firsts = (
        df.where(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(event_col).isin(types)
        )
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            *[
                F.min(F.when(F.col(event_col) == t, sec)).alias(f"_t_{t}")
                for t in types
            ]
        )
    )
    melted = firsts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{src}->{dst}").alias("_step"),
                        F.col(f"_t_{src}").alias("_ts"),
                        F.floor(
                            F.col(f"_t_{dst}") - F.col(f"_t_{src}")
                        ).cast("long").alias("_lat"),
                    )
                    for src, dst in steps
                ]
            )
        ).alias("p")
    ).select("p.*").where(F.col("_ts").isNotNull())
    srcs = melted.groupBy("_step").agg(
        F.count(F.lit(1)).cast("long").alias("n_src_users")
    )
    conv = (
        melted.where(F.col("_lat").isNotNull() & (F.col("_lat") >= 0))
        .groupBy("_step", "_lat")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wcum = (
        Window.partitionBy("_step")
        .orderBy("_lat")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("_step")
    ranked = conv.select(
        "_step",
        "_lat",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"),
    )
    qcols = [
        F.min(
            F.when(
                F.col("_cum") >= F.ceil(F.lit(float(q)) * F.col("_n")),
                F.col("_lat"),
            )
        ).alias(f"p{int(q * 100)}_s")
        for q in quantiles
    ]
    agg = ranked.groupBy("_step").agg(
        F.max("_n").cast("long").alias("n_converted"), *qcols
    )
    out = srcs.join(agg, "_step", "left")
    split = F.split("_step", "->")
    return out.select(
        split.getItem(0).alias("step_src"),
        split.getItem(1).alias("step_dst"),
        "n_src_users",
        F.coalesce(F.col("n_converted"), F.lit(0)).cast("long").alias(
            "n_converted"
        ),
        F.round(
            F.when(
                F.col("n_src_users") > 0,
                F.coalesce(F.col("n_converted"), F.lit(0))
                / F.col("n_src_users"),
            ),
            6,
        ).alias("conv_rate"),
        *[f"p{int(q * 100)}_s" for q in quantiles],
    ).orderBy("step_src", "step_dst")


def rfm_scores(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    buckets: int = 5,
) -> DataFrame:
    """Per-user RFM segmentation — Recency / Frequency / Monetary
    quintile scores, the classic behavioral-segmentation table every
    event pipeline ships (churn targeting, LTV tiers). Distinct from
    g11 (cohort LTV curves — time-indexed) and g7 (session features —
    per-session, not per-user lifetime).

    recency_s = corpus max event time − user's last event time
    (seconds, fractional-epoch per the g1 cast('double') convention);
    frequency = lifetime event count; monetary = lifetime Σ value.
    Each metric scores 1..``buckets`` by ntile over a TOTAL order
    (metric, then user id — deterministic under ties); recency orders
    ASCENDING so score 1 = most recent, matching the convention that
    low RFM digits are the best customers... inverted for F/M (score 1
    = highest frequency/spend) by ordering DESCENDING there.

    Plan: one groupBy(user) aggregation, a 1-row max broadcast via
    cross join, three ntile windows over the (small, user-cardinality)
    aggregate — never over raw events. Output (user, recency_s,
    frequency, monetary, r_score, f_score, m_score) sorted by user."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    ev = df.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("double").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    )
    agg = ev.groupBy("u").agg(
        F.max("_t").alias("_last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.coalesce(F.sum("_v"), F.lit(0.0)), 6).alias("monetary"),
    )
    # r15: the corpus max event time is the max of the per-user lasts
    # (max is order-insensitive and exact), so it rides an unbounded
    # window over the user-cardinality aggregate instead of a second
    # full scan of the events — the ntile windows below already
    # collapse this frame to a single partition, so the global window
    # adds no new exchange.
    base = agg.withColumn(
        "_mx", F.max("_last").over(Window.partitionBy())
    ).withColumn(
        "recency_s", F.round(F.col("_mx") - F.col("_last"), 6)
    )
    r_w = Window.orderBy(F.asc("recency_s"), F.asc("u"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("u"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("u"))
    return base.select(
        F.col("u").alias("user"),
        "recency_s",
        "frequency",
        "monetary",
        F.ntile(int(buckets)).over(r_w).alias("r_score"),
        F.ntile(int(buckets)).over(f_w).alias("f_score"),
        F.ntile(int(buckets)).over(m_w).alias("m_score"),
    ).orderBy("user")


def peak_concurrency(
    df: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Sweep-line peak overlap per group — "how many sessions were
    active at once" (capacity planning's rooms-needed classic): each
    interval emits (+1 at start, −1 at end), a running sum ordered by
    (time, start-before-end) gives the live concurrency, and the max
    is the peak. Intervals are CLOSED — starts sort before ends at
    equal timestamps, so a zero-length interval (single-event session)
    still registers and two intervals touching at a boundary instant
    count as concurrent. Complements j19/w35 (union LENGTH — how much
    time was covered) with the DEPTH dimension (how many at once).

    Output per group: (k, n_intervals, peak, peak_at) — ``peak_at``
    the EARLIEST timestamp attaining the peak. Inverted intervals
    (end < start) are FILTERED, not silently swept — their −1 delta
    would precede their +1 and corrupt the running sum (ADVICE r12);
    filtering keeps the operator lazy/distributed where a raise would
    force an eager count.

    Scale shape (VERDICT r12 #3): one 2n-row delta stream, TWO windows
    over the SAME partition key (running sum + unbounded-frame max →
    one exchange, the second window reuses the first's partitioning),
    and ONE aggregate whose conditional min recovers peak_at — NO join
    at all. The previous broadcast self-join carried one row per
    distinct key on the build side, a driver OOM for user-keyed calls
    at 100 TB scale."""
    s = F.col(start_col).cast("double")
    e = F.col(end_col).cast("double")
    base = (
        df.where(F.col(key_col).isNotNull() & s.isNotNull() & e.isNotNull())
        .select(F.col(key_col).alias("k"), s.alias("_s"), e.alias("_e"))
        .where(F.col("_e") >= F.col("_s"))
    )
    # ONE pass emits both deltas per interval (explode of a 2-struct
    # array) — a union of two projections would recompute the caller's
    # upstream interval chain once per branch
    pts = base.select(
        "k",
        F.explode(
            F.array(
                F.struct(
                    F.col("_s").alias("_t"), F.lit(1).alias("_d")
                ),
                F.struct(
                    F.col("_e").alias("_t"), F.lit(-1).alias("_d")
                ),
            )
        ).alias("_p"),
    ).select("k", F.col("_p._t").alias("_t"), F.col("_p._d").alias("_d"))
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc("_t"), F.desc("_d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-group peak via an unbounded-frame max over the SAME partition
    # key — reuses the running window's exchange; the conditional min
    # in the single aggregate recovers the earliest peak instant
    w_all = Window.partitionBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    runs = pts.withColumn("_run", F.sum("_d").over(w)).withColumn(
        "_peak", F.max("_run").over(w_all)
    )
    # ONE aggregate over the delta stream yields the peak, the interval
    # count (each interval contributes exactly one +1 delta), and the
    # earliest timestamp attaining the peak
    return (
        runs.groupBy("k")
        .agg(
            F.sum(F.when(F.col("_d") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_intervals"),
            F.max("_run").cast("long").alias("peak"),
            F.round(
                F.min(F.when(F.col("_run") == F.col("_peak"), F.col("_t"))),
                6,
            ).alias("peak_at"),
        )
        .orderBy("k")
    )
