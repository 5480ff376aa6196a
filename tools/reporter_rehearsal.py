"""Reporter graph depth + CSE rehearsal (VERDICT r9 #4): the reporting
engine's persist-based common-subexpression sharing (SURVEY.md §4 P6 —
``Reporter.persist_key``, the one custom optimizer piece) has unit tests
but no scale artifact. This builds a from_scenario-shaped graph over a
multi-hundred-item scenario with one bulk (multi-million-row) parameter,
derives a shared intermediate (``cost = flow x price``, the J7
dim-aligned product), then requests SIX overlapping partial-sum keys
against it:

- WITHOUT persist_key: every request re-resolves the product thunk —
  re-scans flow, re-joins, re-probes units (the dask-graph behavior the
  reference gets implicitly from genno's key-level memoization,
  reporter.py:16 lineage);
- WITH persist_key on the full-dim intermediate: the join materializes
  ONCE into the block-manager; every request reuses it;
- WITH auto_cse (r11, VERDICT r10 #6): ZERO persist_key calls — the
  second overlapping request pins the shared intermediate itself; the
  arm must match manual persist+requests total within ~20%.

Recorded per arm: wall seconds, Spark JOB count (statusTracker job
groups), per-request seconds. Also recorded: graph build time and key
count for the n-item scenario — the registry is O(items), not the
reference's eager 2^d subset enumeration (reporter.py:64-69).

    python tools/reporter_rehearsal.py [n_small_items] [flow_rows]

Defaults: 300 items, 2M flow rows. Output: ONE compact JSON line —
committed as REHEARSAL_reporter_r10.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.emit import emit  # noqa: E402

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_scenario(spark, root: str, n_items: int, flow_rows: int):
    from ixmp_spark.core import Platform, Scenario

    mp = Platform(spark, root)
    mp.add_unit("GWa")
    mp.add_unit("USD")
    scen = Scenario(mp, "perf", "reporter_depth", version="new")
    na = 200
    nb = 100
    nc = max(1, flow_rows // (na * nb))
    scen.init_set("a")
    scen.add_set("a", [f"a{i}" for i in range(na)])
    scen.init_set("b")
    scen.add_set("b", [f"b{i}" for i in range(nb)])
    scen.init_set("c")
    scen.add_set("c", [f"c{i}" for i in range(nc)])
    # the multi-hundred-item surface: small 1-D pars (model-sized)
    labels = [f"a{i}" for i in range(50)]
    for i in range(n_items):
        scen.init_par(f"p{i:03d}", idx_sets=["a"])
        scen.add_par(
            f"p{i:03d}",
            pd.DataFrame(
                {"a": labels, "value": [float(j + i) for j in range(50)],
                 "unit": "GWa"}
            ),
        )
    # the bulk quantity: flow(a, b, c)
    scen.init_par("flow", idx_sets=["a", "b", "c"])
    src = spark.range(na * nb * nc).select(
        F.concat(F.lit("a"), (F.col("id") % na).cast("string")).alias("a"),
        F.concat(F.lit("b"), ((F.col("id") / na).cast("long") % nb)
                 .cast("string")).alias("b"),
        F.concat(F.lit("c"), (F.col("id") / (na * nb)).cast("long")
                 .cast("string")).alias("c"),
        (F.rand(7) * 10).alias("value"),
    )
    scen.add_par_bulk("flow", src, unit="GWa", assume_unique=True,
                      distributed=True)
    scen.init_par("price", idx_sets=["a"])
    scen.add_par(
        "price",
        pd.DataFrame(
            {"a": [f"a{i}" for i in range(na)],
             "value": [1.0 + i / na for i in range(na)], "unit": "USD"}
        ),
    )
    scen.commit("reporter depth fixture")
    return scen, na * nb * nc


def run_requests(spark, rep, requests, group: str) -> dict:
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    per = []
    t_all = time.perf_counter()
    checksum = 0.0
    for key in requests:
        t0 = time.perf_counter()
        pdf = rep.get(key).toPandas()
        per.append(round(time.perf_counter() - t0, 2))
        checksum += float(pdf["value"].sum())
    wall = round(time.perf_counter() - t_all, 2)
    sc.setJobGroup("idle", "idle")
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    return {
        "wall_s": wall, "jobs": jobs, "per_request_s": per,
        "checksum": round(checksum, 2),
    }


def main() -> None:
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    flow_rows = int(float(sys.argv[2])) if len(sys.argv) > 2 else 2_000_000
    from ixmp_spark.plans.reporter import Key, Reporter
    from ixmp_spark.session import get_spark

    spark = get_spark("reporter_rehearsal")
    root = tempfile.mkdtemp(prefix="ixmp_reporter_")
    out: dict = {"n_small_items": n_items}
    try:
        t0 = time.perf_counter()
        scen, n_flow = build_scenario(spark, root, n_items, flow_rows)
        out["fixture_s"] = round(time.perf_counter() - t0, 2)
        out["flow_rows"] = n_flow

        requests = [
            str(Key("cost", dims))
            for dims in (("a",), ("b",), ("c",), ("a", "b"), ("b", "c"), ())
        ]
        out["requests"] = requests

        def fresh() -> Reporter:
            t0 = time.perf_counter()
            rep = Reporter.from_scenario(scen)
            build = round(time.perf_counter() - t0, 3)
            rep.add_product("cost:a-b-c", str(rep.full_key("flow")),
                            str(rep.full_key("price")))
            return rep, build

        rep, build_s = fresh()
        out["graph_build_s"] = build_s
        out["graph_keys"] = len(rep.graph)

        rep.auto_cse = False  # arm 1: the dask-less worst case
        out["no_cse"] = run_requests(spark, rep, requests, "nocse")

        rep2, _ = fresh()
        sc = spark.sparkContext
        sc.setJobGroup("persist", "persist")
        t0 = time.perf_counter()
        cost_full = str(Key("cost", ("a", "b", "c")))
        rep2.persist_key(cost_full)
        # force the materialization inside the persist phase so the
        # request arm measures pure reuse
        rep2.get(cost_full).count()
        persist_s = round(time.perf_counter() - t0, 2)
        persist_jobs = len(sc.statusTracker().getJobIdsForGroup("persist"))
        out["cse"] = {"persist_s": persist_s, "persist_jobs": persist_jobs}
        out["cse"].update(run_requests(spark, rep2, requests, "cse"))
        out["speedup_requests"] = round(
            out["no_cse"]["wall_s"] / max(out["cse"]["wall_s"], 1e-9), 2
        )
        out["checksums_equal"] = (
            out["no_cse"]["checksum"] == out["cse"]["checksum"]
        )

        # arm 3 (VERDICT r10 #6): auto_cse — ZERO persist_key calls;
        # the second overlapping request pins the shared intermediate
        # transparently. rep2's cache must release first: Spark's
        # CacheManager plan-matches logically identical frames, so a
        # surviving manual pin would hand the auto arm free reuse.
        rep2.release()
        rep3, _ = fresh()
        assert rep3.auto_cse  # the default — no knobs, no persist_key
        out["auto_cse"] = run_requests(spark, rep3, requests, "autocse")
        rep3.release()
        manual_total = out["cse"]["persist_s"] + out["cse"]["wall_s"]
        out["auto_vs_manual_total"] = round(
            out["auto_cse"]["wall_s"] / max(manual_total, 1e-9), 2
        )
        out["auto_checksum_equal"] = (
            out["auto_cse"]["checksum"] == out["no_cse"]["checksum"]
        )

        # arm 4 (VERDICT r11 #5): auto-CSE beyond partial sums — a
        # mul/add graph sharing ONE input (cost) through two binary
        # ops. Off: every request re-resolves cost TWICE (one per
        # operand) plus the derived thunk. On: the second operand
        # resolution inside the FIRST request already pins cost; each
        # derived key pins on its own second request; later requests
        # are pure cache reads.
        def graph_arm(auto: bool, group: str) -> dict:
            repg, _ = fresh()
            repg.auto_cse = auto
            cost_full = str(Key("cost", ("a", "b", "c")))
            repg.add_product("sq:a-b-c", cost_full, cost_full)
            repg.add_sum("dbl:a-b-c", cost_full, cost_full)
            res = run_requests(spark, repg, g_requests, group)
            res["pinned_keys"] = sorted(repg._cache)
            repg.release()
            res["released"] = not repg._cache and not repg._hits
            return res

        g_requests = ["sq:a", "dbl:b", "sq:c", "dbl:a"]
        out["graph_requests"] = g_requests
        out["graph_no_cse"] = graph_arm(False, "gnocse")
        out["graph_auto_cse"] = graph_arm(True, "gautocse")
        out["graph_speedup"] = round(
            out["graph_no_cse"]["wall_s"]
            / max(out["graph_auto_cse"]["wall_s"], 1e-9), 2
        )
        out["graph_jobs"] = [
            out["graph_no_cse"]["jobs"], out["graph_auto_cse"]["jobs"]
        ]
        out["graph_checksums_equal"] = (
            out["graph_no_cse"]["checksum"]
            == out["graph_auto_cse"]["checksum"]
        )
        emit(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
