"""Executable provisioning rules for the scale-proven pipelines.

VERDICT r13 #5: the 10M-doc dedup rung measured ~3–6 GB of JVM heap
per 1M documents through the full MinHash/LSH pipeline (the 16 GB
default local driver OOMed at 10M; IXMP_SPARK_DRIVER_MEM=64g
completed with the PLAN unchanged — only the per-JVM share of it
moved). That rule lived in NOTES prose; this module is the
executable form, and the scale rehearsals assert their own runs
against it so the constant can never silently rot.

On a cluster the same number sizes EXECUTORS: local mode runs the
whole pipeline in one JVM, so the local heap requirement equals the
sum over executors of (their share of the data) × the per-row
constant — i.e. ``executor_memory ≈ per_million_gb × millions_of_rows
/ n_executors`` plus overhead, floored at a sane minimum.
"""

from __future__ import annotations

import math

#: measured GB of JVM heap per 1M rows through each pipeline, at the
#: CONSERVATIVE end of the observed band (provisioning must not sit at
#: the optimistic edge):
#: - dedup_pipeline: r13 10M-doc rung (NOTES_r13 §1) — 3–6 GB/1M docs
#:   observed; 6 recorded.
#: - ann: r14 2M/5M vector rehearsal (REHEARSAL_ann_r14) — 64-dim
#:   double vectors are ~0.5 GB/1M raw; the banded-LSH + verify
#:   pipeline peaked under 4 GB/1M vectors at both rungs with the
#:   clamp routing bounding the verify join; 4 recorded.
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
