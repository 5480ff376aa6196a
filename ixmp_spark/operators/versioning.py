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
