"""Benchmark harness: runs the headline declared queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed with a count-style action (``df.count()`` after the
transform — full pipeline execution without driver-side materialization
cost dominating). A warm-up run of the flagship query absorbs JVM/codegen
startup so numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ixmp_spark.queries import QUERIES  # noqa: E402
from ixmp_spark.session import get_spark  # noqa: E402

#: headline set: scan, flagship agg, star join, windows, as-of,
#: sessionize, dedup (exact + LSH), text stats, similarity search
BENCH_QUERIES = [
    "s1_scan_pushdown",
    "a0_pricing_summary",
    "a1_partial_sums_cube",
    "b_q3_shipping_priority",
    "b_q5_star_join",
    "w1_default_version",
    "w3_running_total",
    "jx_asof_join",
    "g1_sessionize",
    "d1_exact_dedup",
    "d2_jaccard_neardup",
    "d3_minhash_lsh",
    "t1_text_stats",
    "e1_embed_topk",
    "o1_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("ixmp_spark_bench")

    # warm-up: JVM + codegen + parquet footer caches
    QUERIES["a0_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
