"""100×-scale smoke of the CORE warehouse path (VERDICT r8 #6): the §2
surface is parity-complete at sf0.01, but the actual ixmp workload —
bulk add_par, commit, filtered read, clone, diff — had never been
measured at a multi-GB run. This drives it at 1e8 parameter rows
(100× the bench's ingest_add_par_1e6) end to end on the REAL
Scenario/Platform code paths:

    python tools/warehouse_smoke.py [n_rows]     # default 1e8

Phases (each a wall-clock row in the emitted JSON):
- ingest_validate   — add_par_bulk: single-pass fused count+violation
                      validation, distributed merge plan (no driver rows)
- commit_write      — distributed parquet write of the fact table
- filtered_read     — par_spark with an IN-list filter + aggregate
                      (pushdown path; returns a 1-row sum)
- clone_distributed — Scenario.clone via the Spark INSERT-SELECT path
                      (spark_threshold forces distributed at this size)
- update_1pct       — add_par_bulk of a 1% value perturbation into the
                      clone through the REAL distributed merge
                      (anti-join + union + bucketed rewrite) + commit
- diff_spark        — Scenario.diff_par (raw-key full-outer + indicator)
                      of original vs the updated clone, aggregated by
                      _merge + changed-count. Both snapshots are
                      bucketed by ``key`` (r10 layout), so the join is
                      co-partitioned at scan time: ``diff_exchanges``
                      in the output records the physical plan's shuffle
                      count, which must be 0 — the r9 run paid a full
                      two-sided shuffle here (90.0 s of 115.5 s total).

The driver process must never materialize the 1e8 rows: every phase is
either a Spark job or a 1-row collect. Output: ONE compact JSON line —
committed as REHEARSAL_warehouse_100x_r{N}.json.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.emit import emit  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    from ixmp_spark.core import Platform, Scenario
    from ixmp_spark.operators.scale import exchange_count
    from ixmp_spark.session import get_spark

    spark = get_spark("warehouse_smoke")
    root = tempfile.mkdtemp(prefix="ixmp_smoke_")
    phases: dict[str, float] = {}
    out: dict = {"n_rows": n}
    try:
        mp = Platform(spark, root)
        # bucket sizing rule (warehouse.fact_buckets): ~1-3M rows per
        # bucket — at 1e8 run IXMP_SPARK_FACT_BUCKETS=128 (32 spilled
        # the write-side sort: 52.7 s vs 22.7 s commit)
        out["fact_buckets"] = mp.wh.n_buckets
        from ixmp_spark.sources.warehouse import fact_sort

        out["fact_sorted"] = fact_sort()
        mp.add_unit("GWa")
        scen = Scenario(mp, "perf", "smoke100x", version="new")
        dim = math.isqrt(n - 1) + 1
        out["grid_dim"] = dim
        scen.init_set("s0")
        scen.add_set("s0", [str(i) for i in range(dim)])
        scen.init_par("p", idx_sets=["s0", "s0"], idx_names=["a", "b"])
        src = spark.range(dim * dim).select(
            (F.col("id") % dim).cast("string").alias("a"),
            (F.col("id") / dim).cast("long").cast("string").alias("b"),
            F.rand(42).alias("value"),
        )

        t0 = time.perf_counter()
        scen.add_par_bulk("p", src, unit="GWa", assume_unique=True)
        phases["ingest_validate"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        scen.commit("bulk 100x")
        phases["commit_write"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        keys = [str(i) for i in range(100)]
        row = (
            scen.par_spark("p", filters={"a": keys})
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("s"),
            )
            .collect()[0]
        )
        out["filtered_rows"] = int(row["n"])
        phases["filtered_read"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        clone = scen.clone(scenario="smoke100x_clone")
        phases["clone_distributed"] = round(time.perf_counter() - t0, 2)

        # perturb ~1% of the clone through the real update path: the
        # distributed merge (anti-join against the bucketed snapshot +
        # union + bucketed rewrite), so the diff below compares two
        # COMMITTED bucketed snapshots, not a projection trick
        t0 = time.perf_counter()
        upd = src.where(F.col("a").cast("long") % 100 == 0).select(
            "a", "b", (F.col("value") + 1.0).alias("value")
        )
        clone.check_out()
        clone.add_par_bulk("p", upd, unit="GWa", distributed=True)
        clone.commit("perturb 1pct")
        phases["update_1pct"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        d = scen.diff_par(clone, "p", sort=False)
        out["diff_exchanges"] = exchange_count(d)
        from ixmp_spark.operators.scale import sort_count

        out["diff_sorts"] = sort_count(d)
        agg = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value_a") != F.col("value_b"), 1).otherwise(0)
            ).alias("changed"),
            F.sum(
                F.when(F.col("_merge") != "both", 1).otherwise(0)
            ).alias("unmatched"),
        ).collect()[0]
        out["diff_rows"] = int(agg["n"])
        out["diff_changed"] = int(agg["changed"])
        out["diff_unmatched"] = int(agg["unmatched"])
        phases["diff_spark"] = round(time.perf_counter() - t0, 2)

        out["phases"] = phases
        out["total_s"] = round(sum(phases.values()), 2)
        emit(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
