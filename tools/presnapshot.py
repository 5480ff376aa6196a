"""Pre-snapshot guard (VERDICT r8 #2): refuse a close-out when the
committed artifacts disagree with the tree. The r8 failure mode: the
end-of-round snapshot commit swept in 7 registry additions while
COUNTS.json / TIMINGS_CATALOG.json / COVERAGE.md were last regenerated
at catalog 223 — so the newest (and slowest) queries had no committed
verification or timing row. This check makes that impossible to miss:

    python tools/presnapshot.py      # exit 0 = safe to snapshot

Checks (each one cheap — no Spark session):
1. COUNTS.json.catalog_total == len(QUERIES) (stale artifact OR
   swept-in registry addition — both the r8 classes).
2. COUNTS.json.parity_failures == 0 (never snapshot a red sweep).
3. TIMINGS_CATALOG.json covers every registered query (a query with no
   timing row is how a 15 s newcomer ships unnoticed).
4. Every rows-only query is named in tests/ directly or via an
   imported operator (same rule as
   tests/test_plans.py::test_rows_only_queries_have_tests).
"""

from __future__ import annotations

import inspect
import json
import os
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    sys.path.insert(0, str(ROOT))
    from ixmp_spark.queries import ORACLES, QUERIES

    problems: list[str] = []

    counts_p = ROOT / "COUNTS.json"
    if not counts_p.exists():
        problems.append("COUNTS.json missing — run tools/check_parity.py")
    else:
        counts = json.loads(counts_p.read_text())
        if counts.get("catalog_total") != len(QUERIES):
            problems.append(
                f"COUNTS.json catalog_total={counts.get('catalog_total')} "
                f"!= registry {len(QUERIES)} — stale artifact or swept-in "
                "registry addition; re-run tools/check_parity.py (full)"
            )
        if counts.get("parity_failures", 1) != 0:
            problems.append(
                f"COUNTS.json parity_failures="
                f"{counts.get('parity_failures')} — fix before snapshot"
            )

    timings_p = ROOT / "TIMINGS_CATALOG.json"
    if not timings_p.exists():
        problems.append("TIMINGS_CATALOG.json missing")
    else:
        timed = set(json.loads(timings_p.read_text()).get("queries", {}))
        untimed = sorted(set(QUERIES) - timed)
        if untimed:
            problems.append(
                f"{len(untimed)} queries have no committed timing row: "
                f"{untimed}"
            )

    # shadowed-definition check (Spark-free, mirrors
    # tests/test_plans.py::test_no_shadowed_operator_definitions):
    # the r9 round hit this class TWICE — an appended same-named def
    # silently replaces the original for every import site
    import ast

    for f in sorted((ROOT / "ixmp_spark").rglob("*.py")):
        tree = ast.parse(f.read_text())
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if node.name in seen:
                    problems.append(
                        f"shadowed definition: {f.name}:{node.name} at "
                        f"lines {seen[node.name]} and {node.lineno}"
                    )
                seen[node.name] = node.lineno

    tests_corpus = "\n".join(
        p.read_text() for p in sorted((ROOT / "tests").glob("*.py"))
    )
    untested = []
    for name in sorted(QUERIES):
        if name in ORACLES or name in tests_corpus:
            continue
        src = inspect.getsource(QUERIES[name])
        ops = re.findall(
            r"from ixmp_spark\.\S+ import \(([^)]+)\)", src
        ) + re.findall(r"from ixmp_spark\.\S+ import ([\w, ]+)", src)
        names = {n.strip() for g in ops for n in g.split(",")}
        names.add(name.split("_", 1)[1])
        if not any(n and n in tests_corpus for n in names):
            untested.append(name)
    if untested:
        problems.append(
            f"rows-only queries with no pinning test: {untested}"
        )

    if problems:
        print("PRESNAPSHOT: NOT safe to snapshot")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(
        f"PRESNAPSHOT: ok — {len(QUERIES)} queries, artifacts current, "
        "all rows-only queries test-named"
    )
    return 0


if __name__ == "__main__":
    os.chdir(ROOT)
    raise SystemExit(main())
