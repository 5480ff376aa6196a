"""Local mirror of the driver's correctness gate: run every declared query
on Spark AND its DuckDB oracle over the same parquet, compare row count,
schema (sorted column names), and an order-insensitive value hash.

Also the catalog's only full-coverage TIMING sweep (VERDICT r5 #2): the
driver bench times 28 headline queries, leaving ~100 catalog queries
with no wall-clock signal — a 10× regression in, say, bpe_encode would
be invisible. Since this tool already executes every query, it records
per-query Spark wall time (plan build + execute + toPandas, one rep —
a regression tripwire, not a steady-state benchmark) into
``TIMINGS_CATALOG.json``, committed per round so round-over-round deltas
are diffable.

Usage: python tools/check_parity.py [sf_dir] [query ...]
(the timing JSON is only written on full-catalog runs)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

TIMINGS_PATH = os.path.join(os.path.dirname(__file__), "..", "TIMINGS_CATALOG.json")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


class NonScalarColumn(TypeError):
    """A result column holds list/map/struct cells.

    The external driver's canonicalizer (pandas ``sort_values`` over raw
    object columns) dies on unhashable cells, so declared queries must
    emit scalar columns only. Mirror that strictness here instead of
    silently stringifying — a locally-green query must be driver-green.
    """


def _reject_non_scalar(df: pd.DataFrame) -> None:
    import numpy as np

    for c in df.columns:
        s = df[c]
        if s.dtype != object:
            continue
        for v in s:
            if v is None:
                continue
            if isinstance(v, (list, tuple, set, dict, np.ndarray)):
                raise NonScalarColumn(
                    f"column {c!r} holds non-scalar cells "
                    f"({type(v).__name__}); declared queries must emit "
                    "driver-sortable scalar columns"
                )
            break


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — the
    order-insensitive comparable form.

    Raises :class:`NonScalarColumn` on array/map/struct-typed columns,
    matching the external driver comparator's (crash) behavior."""
    _reject_non_scalar(df)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            ser = pd.to_datetime(s)
            if getattr(ser.dt, "tz", None) is not None:
                ser = ser.dt.tz_localize(None)
            df[c] = ser.astype("datetime64[ns]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        else:
            df[c] = s.astype("string")
    return df.sort_values(list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    from pandas.util import hash_pandas_object

    return hex(int(hash_pandas_object(df, index=False).sum()) & (2**64 - 1))


def timing_regressions(
    timings: dict[str, float],
    committed: dict[str, float],
    factor: float = 3.0,
    floor_s: float = 1.0,
) -> list[str]:
    """Tripwire over the committed timing sweep (VERDICT r6 #5): any
    query slower than ``factor``× its committed TIMINGS_CATALOG time is
    a flag — the d4_simhash class of regression (36×, invisible to the
    headline bench, caught only because a human read the JSON). The
    ``floor_s`` guard keeps sub-second queries out: one-rep wall times
    jitter by tens of ms, and 3× of 0.1 s is noise, not a regression.
    New queries (no committed time yet) pass; they enter the sweep on
    the next committed run."""
    out = []
    for name, t in sorted(timings.items()):
        old = committed.get(name)
        if old is not None and t > floor_s and t > factor * old:
            out.append(
                f"{name}: {t:.2f}s vs committed {old:.2f}s (>{factor:g}x)"
            )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from ixmp_spark.operators import release_cache
    from ixmp_spark.queries import ORACLES, QUERIES
    from ixmp_spark.session import get_spark

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    timings: dict[str, float] = {}
    if not only:
        # warm the session (JVM, codegen, parquet footers) so the
        # alphabetically-first query doesn't book startup cost in the
        # timing sweep — the r6 sweep showed a0 at 4.6 s of which ~4 s
        # was first-query warmup
        try:
            next(iter(sorted(QUERIES.items())))[1](spark, sf_dir).count()
        except Exception:  # noqa: BLE001  (the timed loop will report it)
            pass
        # warm the PYTHON workers too: the first Arrow/pandas stage in
        # a session pays ~10 s of 32-worker pandas imports, which the
        # sweep otherwise books to whichever pandas_udf query sorts
        # first (the r14 t15 false >3x flag — 11.9 s cold vs 1.2 s
        # warm, no code change)
        try:
            from pyspark.sql import functions as F

            spark.range(64).repartition(64).select(
                F.pandas_udf(lambda s: s + 1, "long")("id")
            ).count()
        except Exception:  # noqa: BLE001
            pass
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        try:
            t0 = time.perf_counter()
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            timings[name] = round(time.perf_counter() - t0, 4)
            # free operator-attached persisted frames: without this the
            # sweep accumulates every query's internal caches for the
            # whole session (memory pressure + eviction timing noise)
            release_cache(sdf, blocking=True)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in ORACLES:
            print(f"ok*   {name}: rows-only ({len(spdf)} rows)")
            continue
        try:
            odf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        try:
            a, b = norm_frame(spdf), norm_frame(odf)
        except NonScalarColumn as e:
            failures.append(name)
            print(f"FAIL  {name}: non-scalar result column: {e}")
            continue
        problems = []
        if len(a) != len(b):
            problems.append(f"rows {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            problems.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        elif [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
            problems.append(
                f"dtypes {dict(zip(a.columns, map(str, a.dtypes)))} vs "
                f"{dict(zip(b.columns, map(str, b.dtypes)))}"
            )
        if not problems and value_hash(a) != value_hash(b):
            merged = a.merge(b, how="outer", indicator=True)
            bad = merged[merged["_merge"] != "both"]
            problems.append(f"value mismatch ({len(bad)} differing rows)")
            print(bad.head(6).to_string())
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(a)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    slow: list[str] = []
    if not only:  # full-catalog run → persist the timing sweep
        # tripwire BEFORE overwriting: compare against the committed
        # sweep when it measured the same sf_dir
        deltas: dict[str, float] = {}
        flagged: list[str] = []
        cold_flagged: dict[str, dict[str, float]] = {}
        if os.path.exists(TIMINGS_PATH):
            with open(TIMINGS_PATH) as f:
                prev = json.load(f)
            if prev.get("sf_dir") == sf_dir:
                # r8 verdict #7: the bench's deltas_vs_prev block, for
                # the FULL catalog sweep — per-query ratio vs the prior
                # committed sweep plus a flagged list, so a 15 s
                # newcomer or a 1.5x drift auto-surfaces in the diff of
                # TIMINGS_CATALOG.json instead of needing a human read
                prev_q = prev.get("queries", {})

                def compute_drift(ts):
                    slow = timing_regressions(ts, prev_q)
                    deltas = {
                        n: round(t / prev_q[n], 3)
                        for n, t in ts.items()
                        if prev_q.get(n)
                    }
                    flagged = sorted(
                        n for n, r in deltas.items()
                        if r > 1.5 and ts[n] > 1.0
                    )
                    flagged += [
                        f"NEW>{3.0:g}s:{n}"
                        for n in sorted(ts)
                        if n not in prev_q and ts[n] > 3.0
                    ]
                    return slow, deltas, flagged

                slow, deltas, flagged = compute_drift(timings)
                # r9 verdict #2: a one-rep sweep records COLD first-plan
                # times, so every jitter-flagged query (a8_percentiles
                # 3.95x, warm at baseline) leaves a phantom regression in
                # the committed artifact. Re-run each flagged query once
                # IN-PROCESS and keep min(cold, warm): genuine
                # regressions stay flagged (they are slow warm too),
                # first-plan jitter self-clears, and the cold_flagged
                # block records the adjudication.
                suspects = sorted(
                    {s.split(":", 1)[0] for s in slow}
                    | {
                        f.split(":", 1)[1] if f.startswith("NEW") else f
                        for f in flagged
                    }
                )
                for name in suspects:
                    if name not in QUERIES:
                        continue
                    t0 = time.perf_counter()
                    try:
                        QUERIES[name](spark, sf_dir).toPandas()
                    except Exception:  # noqa: BLE001  (already reported)
                        continue
                    warm = round(time.perf_counter() - t0, 4)
                    cold_flagged[name] = {
                        "cold": timings[name], "warm": warm,
                    }
                    timings[name] = min(timings[name], warm)
                if cold_flagged:
                    slow, deltas, flagged = compute_drift(timings)
                for s in slow:
                    print(f"SLOW  {s}")
                for fl in flagged:
                    print(f"DRIFT {fl}")
        top = sorted(timings.items(), key=lambda kv: -kv[1])[:20]
        with open(TIMINGS_PATH, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(timings),
                    "total_s": round(sum(timings.values()), 2),
                    "top20": dict(top),
                    "deltas_vs_prev": deltas,
                    "flagged": flagged,
                    "cold_flagged": cold_flagged,
                    "queries": timings,
                },
                f,
                indent=1,
                sort_keys=False,
            )
        print(f"timing sweep -> {os.path.normpath(TIMINGS_PATH)}; top-5: "
              + ", ".join(f"{n}={t:.2f}s" for n, t in top[:5]))
        # machine-generated headline counts (VERDICT r7 #5: NOTES prose
        # contradicted the tree because the counts were hand-written;
        # the close-out template reads THIS file instead)
        from ixmp_spark.queries import _CORE_50

        counts_path = os.path.join(
            os.path.dirname(TIMINGS_PATH), "COUNTS.json"
        )
        with open(counts_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "catalog_total": len(QUERIES),
                    "oracle_paired": len(
                        [q for q in QUERIES if q in ORACLES]
                    ),
                    "rows_only": len(
                        [q for q in QUERIES if q not in ORACLES]
                    ),
                    "core_50": len(_CORE_50),
                    "parity_failures": len(failures),
                    # the UNION the artifact reports (r9 verdict #3: two
                    # thresholds, two lists, ONE counter): >3x gate names
                    # + >1.5x / NEW-query drift flags, deduplicated
                    "timing_regressions": len(
                        {s.split(":", 1)[0] for s in slow}
                        | {
                            f.split(":", 1)[1]
                            if f.startswith("NEW")
                            else f
                            for f in flagged
                        }
                    ),
                },
                f,
                indent=1,
            )
            f.write("\n")
        print(f"counts -> {os.path.normpath(counts_path)}")
        if slow and not os.environ.get("IXMP_SPARK_NO_TIMING_GATE"):
            print(
                f"{len(slow)} timing regression(s) >3x committed sweep — "
                "investigate, or set IXMP_SPARK_NO_TIMING_GATE=1 for a "
                "known-contaminated host"
            )
            return 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
