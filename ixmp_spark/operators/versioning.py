"""Version-resolution window operators (SURVEY.md §2.5 W1–W4).

The reference resolves a (model, scenario) to its *default* version if one
is flagged, else the max version (base.py:566–569); clones get
max(version)+1 (scenario.py:879–884). Both are window queries here —
per-group, shuffle on the grouping key only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_default(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    default_flag: str | None = None,
) -> DataFrame:
    """W1: one row per key group — the flagged default if any, else the max
    version. Ordering: default flag desc, then version desc."""
    order = [F.col(version_col).desc()]
    if default_flag:
        order.insert(0, F.col(default_flag).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def next_version(df: DataFrame, keys: Sequence[str], version_col: str) -> DataFrame:
    """W2: per key group, the next free version number (max + 1)."""
    return df.groupBy(*keys).agg(
        (F.max(version_col) + F.lit(1)).alias("next_version")
    )


def chunk_index(
    df: DataFrame,
    order_by: Sequence[str],
    chunk_size: int,
    out_col: str = "chunk",
    num_partitions: int | None = None,
) -> DataFrame:
    """W4 (io.py:128–139 Excel sheet splitting): assign a 0-based chunk id
    every ``chunk_size`` rows in a global order — scale-safely.

    Global row_number would single-partition the data; instead this is
    the zipWithIndex-style composition, entirely declarative:

    1. ``repartitionByRange`` on the order keys — the range partitioner
       makes partition id itself globally ordered;
    2. per-partition local ``row_number`` (window keyed on the partition
       id — each partition's rows stay together, no single reducer);
    3. per-partition row counts → exclusive prefix-sum offsets (one row
       PER PARTITION, so the offset window is bounded by the partition
       count, not the data), broadcast back;
    4. global index = offset + local index, chunk = index div chunk_size.

    Ordering across equal keys is partitioner-dependent (same caveat as
    row_number on ties); with a unique key the result is deterministic.
    """
    ocols = [F.col(c) for c in order_by]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    tagged = df.repartitionByRange(n, *ocols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        tagged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)))
        .drop("__cnt")
    )
    w_loc = Window.partitionBy("__pid").orderBy(*ocols)
    return (
        tagged.withColumn("__loc", F.row_number().over(w_loc))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            F.floor((F.col("__off") + F.col("__loc") - 1) / F.lit(chunk_size)),
        )
        .drop("__pid", "__loc", "__off")
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge — the warehouse-history
    counterpart of this engine's run versioning (W1/W2 track versions
    of whole runs; SCD2 tracks attribute history per dimension row,
    the standard shape for `customer changed segment on date X`
    lineage). Given the accumulated ``history`` (one row per key per
    validity interval; current rows have NULL ``end_col`` and
    ``current_col = true``) and an ``updates`` batch carrying
    ``key_cols + tracked_cols + effective_col``, produce the new
    history:

    - a changed key's current row CLOSES (``end_col`` = update's
      effective date, ``current_col`` = false) and a new current row
      opens at that date;
    - an update equal on every tracked column (null-safe) is a no-op;
    - a key never seen before inserts as a fresh current row;
    - expired history rows pass through untouched.

    Plan shape: expired rows never join — only current rows meet the
    batch, in ONE keyed left-outer join (dimension updates are usually
    small: Catalyst/AQE broadcasts the batch side when its stats
    permit); changed keys fan out via an inline 2-element explode
    (close + reopen), never a second join. At 100 TB the dominant cost
    is rewriting the dimension — unavoidable under immutable-file
    storage and exactly what the reference's commit path does on every
    write (this repo's warehouse stages the same way).

    ``updates`` must be key-unique (one batch = one consistent
    snapshot slice; enforce upstream — e.g. keep the max-effective row
    per key — because two versions of one key in one batch have no
    well-defined close order).
    """
    keys = list(key_cols)
    tracked = list(tracked_cols)
    cur = history.where(F.col(current_col))
    expired = history.where(~F.col(current_col))
    up = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in keys + tracked],
        F.col(effective_col).alias("__u_eff"),
    )
    on = [F.col(k) == F.col(f"__u_{k}") for k in keys]
    j = cur.join(up, on, "full_outer")
    diffs = [~F.col(c).eqNullSafe(F.col(f"__u_{c}")) for c in tracked]
    any_diff = diffs[0]
    for d in diffs[1:]:
        any_diff = any_diff | d
    changed = F.col("__u_eff").isNotNull() & any_diff
    is_new = F.col(keys[0]).isNull()
    # per joined row: 1 output row (passthrough / no-op / fresh insert)
    # or 2 (close + reopen)
    out_cols = keys + tracked + [effective_col, end_col, current_col]
    base_row = F.struct(
        *[F.col(c).alias(c) for c in keys + tracked],
        F.col(effective_col).alias(effective_col),
        F.col(end_col).alias(end_col),
        F.col(current_col).alias(current_col),
    )
    closed_row = F.struct(
        *[F.col(c).alias(c) for c in keys + tracked],
        F.col(effective_col).alias(effective_col),
        F.col("__u_eff").alias(end_col),
        F.lit(False).alias(current_col),
    )
    fresh_row = F.struct(
        *[
            F.col(f"__u_{c}").alias(c)
            for c in keys + tracked
        ],
        F.col("__u_eff").alias(effective_col),
        F.lit(None).cast(dict(history.dtypes)[end_col]).alias(end_col),
        F.lit(True).alias(current_col),
    )
    rows = (
        F.when(is_new, F.array(fresh_row))
        .when(changed, F.array(closed_row, fresh_row))
        .otherwise(F.array(base_row))
    )
    merged = (
        j.select(F.explode(rows).alias("__r"))
        .select(*[F.col(f"__r.{c}").alias(c) for c in out_cols])
    )
    return expired.select(*out_cols).unionByName(merged)


def scd2_consistency(
    history: DataFrame,
    key_cols: Sequence[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD2 history audit — the invariant checker for what
    :func:`scd2_merge` maintains and :func:`~ixmp_spark.operators.
    joins.temporal_join` assumes: per key, version intervals must tile
    (no overlaps, no gaps), exactly one row may be open/current, and a
    closed row must have ``valid_from < valid_to``. Run it after every
    backfill — a hand-patched dimension with two open rows silently
    double-joins every downstream fact.

    One keyed window pass (ordered by ``effective_col``): each row
    compares against its predecessor's end. Violations are emitted
    per row with a reason, healthy history produces ZERO rows — the
    empty-result contract of the J3 validator family.

    Reasons: ``overlap`` (starts before predecessor ends), ``gap``
    (starts after predecessor ends), ``inverted`` (valid_to ≤
    valid_from), ``multiple_current`` (more than one open row),
    ``open_not_current`` / ``current_not_open`` (flag disagrees with
    the NULL end convention).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(effective_col))
    wk = Window.partitionBy(*keys)
    vf, vt = F.col(effective_col), F.col(end_col)
    cur = F.col(current_col)
    prev_end = F.lag(vt).over(w)
    n_open = F.sum(vt.isNull().cast("long")).over(wk)
    reason = F.array_compact(
        F.array(
            F.when(vt.isNotNull() & (vt <= vf), F.lit("inverted")),
            F.when(prev_end.isNotNull() & (vf < prev_end),
                   F.lit("overlap")),
            F.when(prev_end.isNotNull() & (vf > prev_end),
                   F.lit("gap")),
            F.when(vt.isNull() & (n_open > 1),
                   F.lit("multiple_current")),
            F.when(vt.isNull() & ~cur, F.lit("open_not_current")),
            F.when(vt.isNotNull() & cur, F.lit("current_not_open")),
        )
    )
    return (
        history.withColumn("reasons", reason)
        .where(F.size("reasons") > 0)
        .withColumn("reasons", F.array_join(F.array_sort("reasons"), ","))
    )
