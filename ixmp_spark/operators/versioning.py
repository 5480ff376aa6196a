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
    df: DataFrame, order_by: Sequence[str], chunk_size: int, out_col: str = "chunk"
) -> DataFrame:
    """W4 (io.py:128–139 Excel sheet splitting): assign a 0-based chunk id
    every ``chunk_size`` rows in a global order.

    Scale note: a global row_number single-partitions the data — acceptable
    only for export-sized frames (the reference's use case is exactly the
    Excel writer). Large exports should chunk per partition key instead.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(
        out_col,
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(chunk_size)),
    )
