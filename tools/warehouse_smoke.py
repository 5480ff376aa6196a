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
- diff_spark        — operators.joins.diff (full-outer + indicator) of
                      original vs a value-perturbed view of the clone,
                      aggregated by _merge + changed-count

The driver process must never materialize the 1e8 rows: every phase is
either a Spark job or a 1-row collect. Output: ONE compact JSON line —
committed as REHEARSAL_warehouse_100x_r9.json.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    from ixmp_spark.core import Platform, Scenario
    from ixmp_spark.operators.joins import diff as spark_diff
    from ixmp_spark.session import get_spark

    spark = get_spark("warehouse_smoke")
    root = tempfile.mkdtemp(prefix="ixmp_smoke_")
    phases: dict[str, float] = {}
    out: dict = {"n_rows": n}
    try:
        mp = Platform(spark, root)
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

        t0 = time.perf_counter()
        a = scen.par_spark("p")
        # perturb ~1% of the clone's values so the diff has real work
        b = clone.par_spark("p").select(
            "a", "b",
            F.when(
                F.col("a").cast("long") % 100 == 0, F.col("value") + 1.0
            ).otherwise(F.col("value")).alias("value"),
        )
        d = spark_diff(
            a.select("a", "b", "value"), b, on=["a", "b"],
            value_cols=["value"],
        )
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
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
