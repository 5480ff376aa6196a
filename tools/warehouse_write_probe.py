"""Commit-write scaling probe (VERDICT r10 #1 — falsify-or-fix the
2e8-rung superlinearity): the r10 matrix measured commit_write 31.4 s at
1e8 rows/128 buckets and 113.9 s at 2e8/256 (3.6x for 2x rows) across
SEPARATE sessions hours apart, on a host whose own disk probe drifted
438 -> 1131 ms within one bench run. This probe removes both confounds:

- ONE Spark session, so JVM/codegen state is shared;
- A-B-A design: 1e8 -> 2e8 -> 1e8(repeat) — if the repeat matches the
  first run, the session was ambient-stable and the 2e8/1e8 ratio is a
  real scaling number; if the repeat drifts, the host moved and NO
  cross-rung ratio from this box is structural evidence;
- a raw 256 MiB write+fsync disk probe between phases, so the artifact
  carries the ambient story next to every number;
- both sort arms (IXMP_SPARK_FACT_SORT honored per phase via env), so
  the write-side sort cost is measured inside the same window.

    python tools/warehouse_write_probe.py [base_n]   # default 1e8

Each phase drives the REAL path: Scenario.add_par_bulk (assume_unique)
+ commit -> _write_bucketed (repartition + bucketBy [+ sortBy] through
the throwaway external table). Output: ONE JSON line — committed as
REHEARSAL_warehouse_write_r{N}.json.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.emit import emit  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def disk_probe(mb: int = 256) -> float:
    """Raw sequential write+fsync of ``mb`` MiB to tmp — the ambient
    witness (bench.py's probe, larger so page cache can't hide it)."""
    buf = b"\x00" * (1 << 20)
    t0 = time.perf_counter()
    with tempfile.NamedTemporaryFile(dir="/tmp") as f:
        for _ in range(mb):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    return round((time.perf_counter() - t0) * 1000, 1)


def one_commit(spark, n: int, buckets: int, sort: bool, tag: str) -> dict:
    os.environ["IXMP_SPARK_FACT_BUCKETS"] = str(buckets)
    os.environ["IXMP_SPARK_FACT_SORT"] = "1" if sort else "0"
    from ixmp_spark.core import Platform, Scenario

    root = tempfile.mkdtemp(prefix=f"ixmp_wprobe_{tag}_")
    try:
        mp = Platform(spark, root)
        mp.add_unit("GWa")
        scen = Scenario(mp, "perf", f"wprobe_{tag}", version="new")
        dim = math.isqrt(n - 1) + 1
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
        t_ingest = time.perf_counter()
        scen.commit("probe")
        t_commit = time.perf_counter()
        return {
            "tag": tag,
            "n": n,
            "buckets": buckets,
            "sorted": sort,
            "ingest_s": round(t_ingest - t0, 2),
            "commit_s": round(t_commit - t_ingest, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    base = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    from ixmp_spark.session import get_spark

    spark = get_spark("warehouse_write_probe")
    phases = [
        ("A1", base, 128, True),
        ("B", 2 * base, 256, True),
        # r12 (VERDICT r11 #2): the THIRD rung — does the 1.22x-per-row
        # sorted trend flatten or compound past 2e8?
        ("C", 4 * base, 512, True),
        ("A2", base, 128, True),       # the A-B-A stability witness
        ("A_nosort", base, 128, False),
        ("B_nosort", 2 * base, 256, False),
        ("C_nosort", 4 * base, 512, False),
    ]
    out: dict = {"base_n": base, "probe_ms": [], "phases": []}
    out["probe_ms"].append(disk_probe())
    for tag, n, buckets, sort in phases:
        row = one_commit(spark, n, buckets, sort, tag)
        out["phases"].append(row)
        out["probe_ms"].append(disk_probe())
        print(f"-- {row} probe={out['probe_ms'][-1]}ms", file=sys.stderr)
    by = {p["tag"]: p for p in out["phases"]}
    a1, a2, b = by["A1"]["commit_s"], by["A2"]["commit_s"], by["B"]["commit_s"]
    c = by["C"]["commit_s"]
    out["aba_stability"] = round(a2 / max(a1, 1e-9), 3)
    out["scaling_2x_sorted"] = round(2 * b / max(a1 + a2, 1e-9), 3)
    out["scaling_4x_sorted"] = round(c / max(b, 1e-9), 3)
    # per-row cost curve (ns/row), the trend the verdict asks to pin
    out["per_row_ns_sorted"] = [
        round(by[tag]["commit_s"] / by[tag]["n"] * 1e9, 2)
        for tag in ("A1", "B", "C")
    ]
    out["per_row_ns_nosort"] = [
        round(by[tag]["commit_s"] / by[tag]["n"] * 1e9, 2)
        for tag in ("A_nosort", "B_nosort", "C_nosort")
    ]
    out["scaling_2x_nosort"] = round(
        by["B_nosort"]["commit_s"] / max(by["A_nosort"]["commit_s"], 1e-9), 3
    )
    out["scaling_4x_nosort"] = round(
        by["C_nosort"]["commit_s"] / max(by["B_nosort"]["commit_s"], 1e-9), 3
    )
    emit(out)


if __name__ == "__main__":
    main()
