"""Interleaved A-B-A timing probe between two code trees (VERDICT r13
#7): the two driver-bench outliers (x27 +33%, d14 +26% in BENCH_r13,
both with UNCHANGED implementations) get one committed adjudication
each instead of leaning on the host-noise doctrine.

    python tools/aba_probe.py <query> <treeA> <treeB> [sf_dir] [reps]

Each arm is a fresh subprocess/JVM importing the named tree's package
(same box, back-to-back, interleaved A B A B ...), timing the query's
full collect. Arms on a quiet box should interleave within ~1.1x if
the movement was ambient; a consistent gap survives interleaving only
if the code actually differs. Emits one JSON line (tools/emit.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.emit import emit

_ARM = r"""
import json, sys, time
tree, name, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, tree)
from ixmp_spark.session import get_spark
from ixmp_spark.queries import QUERIES
spark = get_spark("aba_probe")
t0 = time.time()
rows = QUERIES[name](spark, sf_dir).collect()
wall = time.time() - t0
print(json.dumps({"wall_s": round(wall, 2), "rows": len(rows)}))
spark.stop()
"""


def run_arm(tree: str, name: str, sf_dir: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_ARM)
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, path, tree, name, sf_dir],
            capture_output=True, text=True, timeout=1800,
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith("{")
        ][-1]
        return json.loads(line)
    finally:
        os.unlink(path)


def main() -> None:
    name = sys.argv[1]
    tree_a, tree_b = sys.argv[2], sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    arms: list[dict] = []
    for i in range(reps):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            r = run_arm(tree, name, sf_dir)
            r.update({"arm": label, "rep": i})
            arms.append(r)
            print(f"-- {label}{i}: {r['wall_s']}s", file=sys.stderr)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    a = [r["wall_s"] for r in arms if r["arm"] == "A"]
    b = [r["wall_s"] for r in arms if r["arm"] == "B"]
    emit({
        "query": name, "sf_dir": sf_dir,
        "tree_a": tree_a, "tree_b": tree_b,
        "arms": arms,
        "median_a_s": med(a), "median_b_s": med(b),
        "b_over_a": round(med(b) / med(a), 3),
        "rows_equal": len({r["rows"] for r in arms}) == 1,
    })


if __name__ == "__main__":
    main()
