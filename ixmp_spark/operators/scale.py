"""Scale-out operators: skew mitigation and co-located (bucketed) joins.

These are the knobs SURVEY.md §4/§1.6 calls for at 100 TB beyond what AQE
does automatically:

- ``salted_join``: explicit key salting for joins whose hot keys exceed
  what AQE skew-splitting handles (AQE splits oversized *partitions*;
  a single key hotter than one partition still needs salting).
- ``bucket_table`` / ``bucketed_join_ready``: persist a fact table
  bucketed by its join key so repeated joins/aggregations on that key
  are exchange-free (the warehouse's par_data/ts_data strategy:
  partition by run_id, bucket by name/variable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (big, skewed) ``left`` gets a random salt
    in [0, salt); the (smaller) ``right`` is exploded ``salt``× so every
    salted left row finds its match. Shuffle load of the hottest key
    spreads across ``salt`` reducers at the cost of replicating the right
    side ``salt``×.

    Use when one key's row count exceeds a healthy partition; otherwise
    prefer a plain join + AQE (spark.sql.adaptive.skewJoin).

    Only ``inner`` and ``left`` are supported: with right/full outer the
    exploded right side would emit ``salt`` duplicate null-padded rows
    per unmatched right row.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', not {how!r}: the "
            "salt-exploded right side would duplicate unmatched rows "
            f"{salt}x under right/full outer joins"
        )
    lsalted = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    rexploded = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lsalted.join(rexploded, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def bucket_table(
    df: DataFrame,
    spark: SparkSession,
    table: str,
    key: str,
    buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table: later equi-joins and
    aggregations on ``key`` between tables bucketed the same way need no
    exchange (Catalyst recognizes the matching hash distribution)."""
    writer = df.write.bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle-exchange NODES in the physical plan (plan-quality
    metric used by tests; BroadcastExchange/ReusedExchange excluded).
    Counts each node once via its formatted-explain detail-block header —
    tree lines would double-count."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))


def sort_count(df: DataFrame) -> int:
    """Number of Sort NODES in the physical plan — the read-side price
    of an UNSORTED bucketed layout: co-partitioned sort-merge joins
    still elide the exchange but re-insert per-partition sorts that a
    SORTED BY snapshot would have pre-paid at write time (the
    write-once/diff-many trade the ``IXMP_SPARK_FACT_SORT`` knob
    controls). Same formatted-explain counting as exchange_count."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return len(re.findall(r"^\(\d+\) Sort\b", plan, re.M))
