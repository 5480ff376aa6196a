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


# -- provisioning rules (r14, VERDICT r13 #5) ------------------------
# The 10M-doc dedup rung measured ~3-6 GB of JVM heap per 1M documents
# through the full MinHash/LSH pipeline (NOTES_r13: the 16 GB default
# local driver OOMed at 10M; 64g completed with the PLAN unchanged).
# That rule lived in NOTES prose; the helpers below are the executable
# form, and the scale rehearsals assert their own runs against them so
# the constants can never silently rot. On a cluster the same numbers
# size EXECUTORS (local mode runs the whole pipeline in one JVM).

import math

#: measured GB of JVM heap per 1M rows through each pipeline, at the
#: CONSERVATIVE end of the observed band (provisioning must not sit at
#: the optimistic edge):
#: - dedup_pipeline: r13 10M-doc rung (NOTES_r13 §1) — 3–6 GB/1M docs
#:   observed; 6 recorded.
#: - ann: r14 2M/5M vector rehearsal (REHEARSAL_ann_r14_{2M,5M}) —
#:   64-dim double vectors are ~0.5 GB/1M raw; the rule's 4 GB/1M is
#:   the provisioning ASK (8× raw, covering the persisted corpus +
#:   banded frames + the budget-bounded verify join), not a measured
#:   peak: both rungs completed inside a 64 GB JVM, satisfying the
#:   rule's 16/20 GB recommendations with margin.
PER_MILLION_GB = {
    "dedup_pipeline": 6.0,
    "ann": 4.0,
}

#: no pipeline is provisioned under this (Spark's own overhead +
#: broadcast/code-cache floor)
MIN_HEAP_GB = 16


def recommended_resources(
    n_rows: int, pipeline: str = "dedup_pipeline", n_executors: int = 1
) -> dict:
    """Map (row count, pipeline) → recommended JVM provisioning.

    Returns ``{"heap_gb": per-JVM heap, "total_heap_gb": fleet total,
    "shuffle_partitions": ...}``. ``n_executors=1`` is local mode (the
    rehearsal boxes); on a cluster pass the executor count and read
    ``heap_gb`` as ``spark.executor.memory``.
    """
    if pipeline not in PER_MILLION_GB:
        raise KeyError(
            f"unknown pipeline {pipeline!r}; known: "
            f"{sorted(PER_MILLION_GB)}"
        )
    total = max(
        float(MIN_HEAP_GB),
        PER_MILLION_GB[pipeline] * n_rows / 1_000_000.0,
    )
    per_jvm = max(float(MIN_HEAP_GB), math.ceil(total / max(n_executors, 1)))
    # shuffle partitions: ~1M rows per partition through these
    # pipelines keeps partitions inside executor memory; floor at the
    # local default 32
    parts = max(32, math.ceil(n_rows / 1_000_000))
    return {
        "heap_gb": int(math.ceil(per_jvm)),
        "total_heap_gb": int(math.ceil(total)),
        "shuffle_partitions": int(parts),
    }


def assert_provisioned(
    n_rows: int, pipeline: str, configured_heap_gb: float, n_executors: int = 1
) -> dict:
    """Raise if the configured per-JVM heap is below the recommendation
    — called by the scale rehearsals on their OWN configuration, so an
    under-provisioned run fails loudly before it becomes a mystery OOM
    (the r13 10M finding, as code)."""
    rec = recommended_resources(n_rows, pipeline, n_executors)
    if configured_heap_gb < rec["heap_gb"]:
        raise RuntimeError(
            f"{pipeline} at {n_rows} rows needs ≥{rec['heap_gb']} GB "
            f"per JVM (measured {PER_MILLION_GB[pipeline]} GB/1M rows); "
            f"configured {configured_heap_gb} GB — raise "
            "IXMP_SPARK_DRIVER_MEM / spark.executor.memory"
        )
    return rec
