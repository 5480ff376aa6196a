"""Per-query isolation harness for the optimization rounds (guide §1).

For each named query: capture ``.explain('formatted')`` to
``plans/<tag>/<name>_<suffix>.txt``, then time the computation with the
noop sink (``df.write.format('noop')`` — computes every column, no
sink cost, no count()-style column pruning) for ``--reps`` repetitions,
releasing operator caches (blocking) between reps so each rep pays the
true one-pass cost. Jobs are labelled via setJobDescription so the UI
and event logs attribute stages to queries.

Usage:
  python tools/opt_measure.py [--sf DIR] [--reps N] [--tag r14]
                              [--suffix before|after] [--plans-only]
                              [query ...]

Prints one JSON line: {"queries": {name: median_sec}, "spread": {...}}.
This is a diagnosis tool; the driver-facing numbers stay bench.py's.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ixmp_spark.operators import release_cache  # noqa: E402
from ixmp_spark.queries import QUERIES  # noqa: E402
from ixmp_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    names = args.queries or []
    if not names:
        from bench import BENCH_QUERIES  # repo-root bench.py

        names = list(BENCH_QUERIES)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("ixmp_opt_measure")
    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf

    samples: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        # plan capture (on the target-SF frame: sizes drive join picks)
        from tools.audit_plans import formatted_plan

        df = fn(spark, args.sf)
        plan = formatted_plan(df)
        with open(
            os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w"
        ) as f:
            f.write(plan)
        release_cache(df, blocking=True)
        if args.plans_only:
            continue
        if not args.no_warm:
            wdf = fn(spark, warm_dir)
            wdf.write.format("noop").mode("overwrite").save()
            release_cache(wdf, blocking=True)
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.perf_counter()
            d = fn(spark, args.sf)
            d.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            release_cache(d, blocking=True)
        samples[name] = ts

    med = {n: round(sorted(t)[len(t) // 2], 4) for n, t in samples.items()}
    spread = {
        n: [round(min(t), 4), round(max(t), 4)] for n, t in samples.items()
    }
    print(json.dumps({"queries": med, "spread": spread}, separators=(",", ":")))


if __name__ == "__main__":
    main()
