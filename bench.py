"""Benchmark harness: runs the headline declared queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed with a count-style action (``df.count()`` after the
transform — full pipeline execution without driver-side materialization
cost dominating). A warm-up run of the flagship query absorbs JVM/codegen
startup so numbers reflect steady-state throughput.

Determinism: every timed entry is the MEDIAN of ``REPS`` runs, and the
JSON carries a per-query ``spread`` ([min, max]) so a ±0.5 s noise band
can't masquerade as a regression (VERDICT r2 #8). The ingest path gets
its own untimed warm-up first: its validation expression (a
codelist-sized InSet per dimension) costs ~3 s of one-time codegen that
single-shot timing would otherwise book as throughput.

Methodology fix (round 5): persist-backed queries (d2/d3/t10) release
their caches between reps (blocking, so cleanup can't bleed into the
next timing). Before this, Spark's CacheManager matched the identical
logical plan of reps 2-3 against rep 1's persisted frames ("Asked to
cache already cached data" in earlier BENCH tails), so those medians
partly measured cache READS, understating the true one-pass cost —
which is what a real corpus run pays. Numbers from r5 on are cold per
rep; comparing d2/d3/t10 against r4 requires adding back ~35% (verified
by running both methodologies side-by-side, NOTES_r5).
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
    "b_q2_min_cost_supplier",
    "b_q3_shipping_priority",
    "b_q5_star_join",
    "b_q7_nation_volume",
    "b_q10_returned_items",
    "b_q14_promo_share",
    "b_q19_disjunctive",
    "w1_default_version",
    "w3_running_total",
    "jx_asof_join",
    "g1_sessionize",
    "g4_funnel",
    "d1_exact_dedup",
    "d2_jaccard_neardup",
    "d3_minhash_lsh",
    "t1_text_stats",
    "t9_tfidf_keywords",
    "t10_bigram_perplexity",
    "t11_top_ngrams",
    "p6_chunk_documents",
    "p7_shuffle_shards",
    "p8_domain_cap",
    "e1_embed_topk",
    "o1_topk",
    # round 6 additions: the no-equality-key hash range join and the
    # hot-key-safe chunked window form (its plain twin g1 stays too,
    # so the chunked constant is visible round-over-round)
    "j11_range_join",
    "g5b_transitions_chunked",
    # round 7 additions: URL-key dedup (map + one groupBy on the
    # canonical string) and DSIR importance scoring (two keyed
    # shuffles; the data-selection signal for targeted corpus mixes)
    "d8_url_dedup",
    "p12_dsir_logratio",
    # round 8 additions: line-level boilerplate stripping (map-only,
    # the cleaning pass between extraction and quality scoring) and
    # the nearest-direction as-of join (two carry windows over one
    # keyed exchange)
    "t18_strip_boilerplate",
    "jx3_asof_nearest",
    # round 8 continuation additions: the windowed CUSUM drift screen
    # (one keyed shuffle via the max-drawdown identity), the
    # degree-oriented triangle count (the lazy-checkpointed graph
    # pipeline), and the bucketed 2-D skyline (prefix-max reduction)
    "w13_cusum_drift",
    "x5_supplier_triangles",
    "p17_pareto_frontier",
    # round 8 third-session additions: the deterministic Poisson
    # bootstrap (one map-side ×100 replicate explode + a (group, rep)
    # keyed shuffle — the at-scale uncertainty pattern) and the
    # DAU/WAU rolling-active counts (distinct-pair collapse + window
    # vote explode)
    "x19_bootstrap_ci",
    "g10_rolling_active",
    # round 9 additions: the reworked Bradley-Terry (r8's 15.5 s
    # problem child — the numpy-fast-path constant must stay visible
    # round-over-round), the Gopher repetition rules (one
    # (doc, n, gram)-keyed shuffle over four gram sizes), and the
    # matryoshka truncation-recall sweep (probe-bounded rank windows
    # x 4 rank pipelines)
    "x27_bradley_terry",
    "t29_repetition",
    "e12_matryoshka_recall",
    # round 10 additions (VERDICT r9 #6): the two cheapest
    # representative shapes of the distribution-shape stat family get
    # round-over-round drift tracking — KS (value-domain-bounded
    # cumulative window) and Cohen's kappa (category-grid agreement)
    "x28_ks_test",
    "x33_cohens_kappa",
    # round 11 addition: the exact unblocked set-similarity join (the
    # AllPairs prefix filter — gram-frequency agg + rank window +
    # prefix-keyed self-join; the dedup triad's exact-unblocked member
    # whose candidate volume, not row count, is the cost driver)
    "d14_jaccard_prefix_join",
]
# NOT in the headline set: t12_bpe_merges — an iterative trainer whose
# cost is n_merges × per-iteration job latency (driver-loop bound, not
# data bound at sf0.1); it would dominate the total without measuring
# anything the per-iteration queries don't. Its medians are recorded in
# NOTES_r5 instead.
#
# Methodology blind spot, known and kept (VERDICT r14 #4): the count()
# action lets Catalyst prune columns and sometimes whole subtrees — for
# x5_supplier_triangles it eliminates the outer join and the entire
# triangle enumeration (~3 s count vs ~24 s noop at sf0.1), so the bench
# times the pruned plan. Changing the timed action would break
# round-over-round comparability; the true per-node cost is tracked via
# tools/opt_measure.py's noop sink instead.


def _ingest_bench(spark, n: int) -> tuple[float, dict[str, float]]:
    """Run the add_par-shaped bulk ingest once; returns (total_s, phases).

    Phase split (VERDICT r5 #1 — attribute drift, don't shrug at it):

    - ``plan_validate_collect`` — the ``add_par_bulk`` call: plan build,
      the fused count+violation Spark job, the Arrow ``toPandas``
      collect and pandas-side merge. CPU/executor-bound.
    - ``commit_write`` — the ``commit`` call: the pyarrow single-file
      parquet write of the merged table. tmp-DISK-bound.

    A swing confined to ``commit_write`` that tracks ``disk_probe_ms``
    in the emitted ``sys`` block is host storage drift; a swing in
    ``plan_validate_collect`` with stable load/disk context is a plan
    or code regression and must be chased to a commit."""
    import math
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ixmp_spark.core import Platform, Scenario

    root = tempfile.mkdtemp(prefix="ixmp_bench_")
    try:
        mp = Platform(spark, root)
        mp.add_unit("GWa")
        scen = Scenario(mp, "perf", "add_par", version="new")
        dim = math.isqrt(n - 1) + 1
        scen.init_set("s0")
        scen.add_set("s0", [str(i) for i in range(dim)])
        scen.init_par("p", idx_sets=["s0", "s0"], idx_names=["a", "b"])
        src = (
            spark.range(dim * dim)
            .select(
                (F.col("id") % dim).cast("string").alias("a"),
                (F.col("id") / dim).cast("long").cast("string").alias("b"),
                F.rand(42).alias("value"),
            )
        )
        t0 = time.perf_counter()
        # cross-product generator → keys unique by construction
        scen.add_par_bulk("p", src, unit="GWa", assume_unique=True)
        t1 = time.perf_counter()
        scen.commit("bulk add_par")
        t2 = time.perf_counter()
        return t2 - t0, {
            "plan_validate_collect": t1 - t0,
            "commit_write": t2 - t1,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _sys_context() -> dict:
    """Cheap host-drift witnesses recorded alongside the numbers: load
    average (competing work on a shared sandbox), tmp-disk free bytes,
    and a raw tmp-disk write+fsync probe (64 MiB) — the microbenchmark
    that moves when the host's storage is the thing that drifted."""
    import tempfile

    ctx: dict = {}
    try:
        ctx["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        st = os.statvfs(tempfile.gettempdir())
        ctx["tmp_free_gb"] = round(st.f_bavail * st.f_frsize / 2**30, 1)
    except OSError:
        pass
    try:
        # /dev/shm doubles as the Spark shuffle store on this rig and
        # is tmpfs (RAM): killed JVMs LEAK their shuffle dirs here, and
        # the fill level is the mechanism behind "ambient" drift — at
        # r11 close a forensic check found 107 GB of leaked spark-local
        # state from the session's killed runs, page cache squeezed to
        # ~17 GB, and the OOM killer taking healthy JVMs. Record it so
        # drift adjudication can SEE it (and clean stale spark-local
        # dirs before trusting any timing).
        st = os.statvfs("/dev/shm")
        ctx["shm_used_gb"] = round(
            (st.f_blocks - st.f_bavail) * st.f_frsize / 2**30, 1
        )
    except OSError:
        pass
    try:
        buf = os.urandom(1 << 20) * 64  # 64 MiB, incompressible
        t0 = time.perf_counter()
        with tempfile.NamedTemporaryFile(dir=tempfile.gettempdir()) as f:
            f.write(buf)
            f.flush()
            os.fsync(f.fileno())
            ctx["disk_probe_ms"] = round(
                (time.perf_counter() - t0) * 1000, 1
            )
    except OSError:
        pass
    return ctx


REPS = 3


def _median(ts: list[float]) -> float:
    return sorted(ts)[len(ts) // 2]


def _subtree_cpu_s() -> float | None:
    """Total CPU seconds (user+sys) consumed so far by this process and
    every live descendant (the local-mode JVM and its Python workers),
    read from /proc. Sampled before/after each timed query, the delta is
    the query's executor CPU-seconds — the witness that distinguishes
    "sub-second and overhead-dominated" from "serial" when the driver
    compares core counts (VERDICT r14: the 8-vs-32-core wall-clock
    ratios were ~1.0 because every query is fixed-cost-dominated at
    sf0.1, which a wall-clock-only artifact cannot prove). Diagnostic
    only — additions to BENCH_DETAIL, never the one-line contract."""
    try:
        tick = os.sysconf("SC_CLK_TCK")
        me = os.getpid()
        procs = {}  # pid -> (ppid, utime+stime ticks)
        for ent in os.listdir("/proc"):
            if not ent.isdigit():
                continue
            try:
                with open(f"/proc/{ent}/stat", "rb") as f:
                    st = f.read().split(b")", 1)[1].split()
                # post-comm fields: [0]=state [1]=ppid [11]=utime [12]=stime
                procs[int(ent)] = (int(st[1]), int(st[11]) + int(st[12]))
            except (OSError, IndexError, ValueError):
                continue
        kids: dict[int, list[int]] = {}
        for pid, (ppid, _) in procs.items():
            kids.setdefault(ppid, []).append(pid)
        total, stack, seen = 0, [me], set()
        while stack:
            pid = stack.pop()
            if pid in seen or pid not in procs:
                continue
            seen.add(pid)
            total += procs[pid][1]
            stack.extend(kids.get(pid, ()))
        return total / tick
    except (OSError, ValueError):
        return None


def _deltas_vs_prev(
    timings: dict, spread: dict, here: str | None = None
) -> dict | None:
    """Round-over-round drift table (VERDICT r7 #4): compare this run's
    per-query medians against the most recent committed ``BENCH_r*.json``
    and emit the ratios IN the artifact, so a slow creep (r7: six queries
    +4–11% with no implicated commit) is a machine-readable row, not a
    manual diff. ``spread_overlap`` marks pairs whose [min, max] bands
    intersect — those are drift-band, not regression signal;
    ``flagged_over_1p10`` lists queries >10% up with DISJOINT spreads,
    the ones the round notes must attribute to host or code."""
    import glob
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    cands = [
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    if not cands:
        return None
    prev_path = max(cands)[1]
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        return None
    # three shapes: bench.py's own output (queries at top level), the
    # driver's wrapper with a parsed block, and the driver's wrapper
    # with parsed=None (r6/r7 — the old long line outgrew the 2000-char
    # stdout capture) where the medians are still recoverable by regex
    # from the captured tail (spreads are not — overlap stays unknown)
    if "queries" not in prev and isinstance(prev.get("parsed"), dict):
        prev = prev["parsed"]
    if "queries" not in prev and isinstance(prev.get("tail"), str):
        prev = {
            "queries": {
                m.group(1): float(m.group(2))
                for m in re.finditer(
                    r'"([a-z][a-z0-9_]+)":\s*([0-9]+\.[0-9]+)', prev["tail"]
                )
                if m.group(1) in timings
            }
        }
    pq, ps = prev.get("queries", {}), prev.get("spread", {})
    # The committed BENCH_DETAIL's sys block is a valid previous-host
    # context ONLY if it records the same run as the ratio baseline
    # (ADVICE r11: a mid-round bench overwrites BENCH_DETAIL while the
    # baseline stays the previous round's BENCH_r*.json — comparing the
    # probe against a mismatched run can misclassify real drift as
    # ambient). Identical per-query medians are the run fingerprint;
    # on mismatch the adjudication runs without a previous reading.
    baseline_sys = None
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json")) as f:
            det = json.load(f)
        dq = det.get("queries") or {}
        if pq and all(
            abs(dq.get(n, -1.0) - v) < 1e-9 for n, v in pq.items()
        ):
            baseline_sys = det.get("sys")
    except (OSError, ValueError, TypeError):
        pass
    rows = {}
    for name, t in timings.items():
        p = pq.get(name)
        if not p:
            continue
        s_now, s_prev = spread.get(name), ps.get(name)
        rows[name] = {
            "prev": p,
            "ratio": round(t / p, 3),
            # None = prev spread unknown (tail-recovered baseline)
            "spread_overlap": (
                bool(s_now[0] <= s_prev[1] and s_prev[0] <= s_now[1])
                if s_now and s_prev
                else None
            ),
        }
    return {
        "baseline": os.path.basename(prev_path),
        "baseline_sys_matched": baseline_sys is not None,
        "baseline_sys": baseline_sys,
        "queries": rows,
        # flag >10% up unless the spread bands provably overlap
        "flagged_over_1p10": sorted(
            n for n, r in rows.items()
            if r["ratio"] > 1.10 and r["spread_overlap"] is not True
        ),
    }


def classify_drift(
    rows: dict,
    flagged: list[str],
    sys_now: dict | None = None,
    sys_prev: dict | None = None,
    probe_degrade: float = 1.5,
) -> dict:
    """Adjudicate the >1.10x drift flags the way check_parity's sweep
    already does for its own cold-plan suspects (VERDICT r10 #3): when
    the evidence says the HOST shifted under the run — the disk probe
    degraded materially vs the previous committed run or during this
    one, or the flag set is family-uniform INCLUDING the pure-scan
    probe s1 (no code path is shared by scan+join+dedup+text, so a
    uniform rise is ambient by construction) — emit ONE
    "uniform-ambient" verdict instead of N per-query flags nobody
    should chase. Queries rising well ABOVE the uniform shift
    (ratio > 1.15x the median ratio) still surface as
    ``per_query_flags`` — an ambient round must not mask a real
    regression riding on top of it.

    Classes: "quiet" (no flags), "per-query" (flags with no ambient
    evidence — chase each), "uniform-ambient" (evidence listed;
    chase only per_query_flags)."""
    import re
    import statistics

    if not flagged:
        return {"class": "quiet", "ambient_evidence": [], "per_query_flags": []}

    def probes(s):
        if not s:
            return []
        return [
            v
            for v in (
                (s.get("before") or {}).get("disk_probe_ms"),
                (s.get("after") or {}).get("disk_probe_ms"),
            )
            if v
        ]

    evidence = []
    pn, pp = probes(sys_now), probes(sys_prev)
    if pn and pp and min(pn) > probe_degrade * min(pp):
        evidence.append(
            f"disk probe min {min(pp)} -> {min(pn)} ms vs previous run"
        )
    if len(pn) == 2 and max(pn) > probe_degrade * min(pn):
        evidence.append(
            f"disk probe moved {pn[0]} -> {pn[1]} ms during this run"
        )

    def fam(n: str) -> str:
        m = re.match(r"[a-z]+", n)
        return m.group(0) if m else n

    flag_fams = {fam(n) for n in flagged}
    all_fams = {fam(n) for n in rows}
    if (
        "s1_scan_pushdown" in flagged
        and all_fams
        and len(flag_fams) >= max(3, (len(all_fams) + 1) // 2)
    ):
        evidence.append(
            f"flags span {len(flag_fams)}/{len(all_fams)} query families"
            " including the pure-scan probe s1"
        )
    if not evidence:
        return {
            "class": "per-query",
            "ambient_evidence": [],
            "per_query_flags": sorted(flagged),
        }
    ratios = [r["ratio"] for r in rows.values()]
    med = statistics.median(ratios) if ratios else 1.0
    return {
        "class": "uniform-ambient",
        "ambient_evidence": evidence,
        "uniform_shift": round(med, 3),
        "per_query_flags": sorted(
            n for n in flagged if rows[n]["ratio"] > 1.15 * max(med, 1.0)
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("ixmp_spark_bench")

    # Warm-up: JVM startup, per-query codegen/analysis, parquet footer
    # caches. Each bench query runs once at the smallest SF first (same
    # expressions → same generated code), so the timed loop measures
    # steady-state throughput at the target SF, not compiler latency —
    # on a real cluster these queries run hot over 100 TB, never cold
    # over one driver JVM.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    from ixmp_spark.operators import release_cache

    QUERIES["a0_pricing_summary"](spark, sf_dir).count()
    for name in BENCH_QUERIES:
        df = QUERIES[name](spark, warm_dir)
        df.count()
        release_cache(df)
    # Compiles the ingest validation codegen. The warm-up size matters:
    # InSet switches codegen strategy around 400 members, so warming with
    # a small set (dim=100) would not compile the code the 1e6 run
    # (dim=1000) executes — 250k rows ⇒ dim=500, same strategy.
    _ingest_bench(spark, 250_000)

    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    samples["ingest_add_par_1e6"] = []
    cpu_samples: dict[str, list[float]] = {}
    ingest_phases: dict[str, list[float]] = {}
    sys_ctx = [_sys_context()]  # before the timed loop
    for _ in range(REPS):
        for name in BENCH_QUERIES:
            c0 = _subtree_cpu_s()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.count()
            samples[name].append(time.perf_counter() - t0)
            # CPU sampled INSIDE the wall timestamps would perturb the
            # timing; outside, the /proc sweep (~ms) rides the untimed
            # gap. The delta includes the release_cache of the PREVIOUS
            # query's rep — negligible (blocking unpersist is driver
            # bookkeeping) and uniform across queries.
            c1 = _subtree_cpu_s()
            if c0 is not None and c1 is not None:
                cpu_samples.setdefault(name, []).append(c1 - c0)
            # persist-backed operators attach their cache handles; free
            # them between runs (blocking) so reps measure the true
            # one-pass cost instead of re-reading the previous rep's
            # plan-matched cache, and cleanup never overlaps a timing
            release_cache(df, blocking=True)
        # reference perf parity (BASELINE.md): add_par-shaped bulk ingest
        # of a random 2-D parameter (testing/data.py:293–319 shape:
        # ceil(sqrt(N))² cross product, U[0,1) values, unit GWa)
        tot, phases = _ingest_bench(spark, 1_000_000)
        samples["ingest_add_par_1e6"].append(tot)
        for ph, v in phases.items():
            ingest_phases.setdefault(ph, []).append(v)
    sys_ctx.append(_sys_context())  # after — did the host change under us?

    timings = {name: round(_median(ts), 4) for name, ts in samples.items()}
    spread = {
        name: [round(min(ts), 4), round(max(ts), 4)]
        for name, ts in samples.items()
    }
    total = round(sum(timings.values()), 4)
    # Two outputs (round 8 — the driver's stdout capture keeps only the
    # LAST 2000 chars, and once spread/sys/phases grew the line past
    # that, BENCH_r6/r7 recorded parsed=None, silently dropping the
    # machine-readable block from the driver artifact):
    # - stdout: ONE compact JSON line with exactly the contract keys
    #   (metric/value/unit/queries/sf) — stays well under the capture
    #   window so the driver can parse it again;
    # - BENCH_DETAIL.json (repo root, committed at round close): the
    #   full artifact — spread, ingest phase split, host context, and
    #   the round-over-round drift table (deltas_vs_prev).
    deltas = _deltas_vs_prev(timings, spread)
    if deltas:
        # previous host context resolved INSIDE _deltas_vs_prev, keyed
        # to the same artifact as the ratio baseline (ADVICE r11)
        deltas["drift_verdict"] = classify_drift(
            deltas["queries"],
            deltas["flagged_over_1p10"],
            {"before": sys_ctx[0], "after": sys_ctx[-1]},
            deltas.pop("baseline_sys"),
        )
    cpus = spark.sparkContext.defaultParallelism
    detail = {
        "metric": "declared_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        # executor CPU-seconds per query (median over reps; /proc subtree
        # sweep around each timed action): cpu/wall >> 1 = genuinely
        # parallel work, cpu/wall ~ 1 at sub-second wall = fixed-overhead
        # dominated — the evidence the driver's core-count comparison
        # needs to tell those apart (VERDICT r14 scaling false alarm)
        "cpu_seconds": {
            n: round(_median(ts), 4) for n, ts in cpu_samples.items()
        },
        # the parallelism the session actually runs with — proves
        # $SPARK_GRAFT_CPUS was honored without reading stage tails
        "cpus": cpus,
        "ingest_phases": {
            ph: {
                "median": round(_median(ts), 4),
                "spread": [round(min(ts), 4), round(max(ts), 4)],
            }
            for ph, ts in ingest_phases.items()
        },
        "sys": {"before": sys_ctx[0], "after": sys_ctx[-1]},
        "deltas_vs_prev": deltas,
        "reps": REPS,
        "sf": sf,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    # Per-core-count detail file ALWAYS; the legacy BENCH_DETAIL.json
    # only when this run matches the committed 32-core config — the
    # driver's extra lower-core-count arm no longer clobbers the
    # committed close-out artifact (VERDICT r14 "what's wrong" #3).
    with open(os.path.join(here, f"BENCH_DETAIL_c{cpus}.json"), "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    if cpus == 32:
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    print(
        json.dumps(
            {
                "metric": "declared_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # additions-only contract extension (VERDICT r14 next
                # round #2): the driver's scaling probe can now SEE that
                # $SPARK_GRAFT_CPUS was honored instead of inferring it
                # from flat wall-clock ratios on overhead-dominated
                # sub-second queries
                "cpus": cpus,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
