"""Plan-quality audit over the whole declared catalog: flags red-flag
physical operators (cartesian products, nested-loop joins on non-trivial
sides, Python evaluation, excess shuffles). Run after adding operators:

    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


#: queries whose plan legitimately contains a BroadcastNestedLoopJoin —
#: a broadcast 1-row probe crossJoin is the intended shape
BNLJ_OK = {"e1_embed_topk", "e2_embed_ann", "e3_embed_ivf", "j10_band_join"}

#: multi-stage pipelines where >6 shuffles are inherent (documented):
#: d3 = repartition + banded self-join + 2 candidate joins + distinct
SHUFFLE_OK = {"d3_minhash_lsh"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    from ixmp_spark.queries import QUERIES
    from ixmp_spark.session import get_spark

    spark = get_spark("plan_audit")
    bad = 0
    for name, fn in sorted(QUERIES.items()):
        plan = formatted_plan(fn(spark, sf_dir))
        issues = []
        if "CartesianProduct" in plan:
            issues.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            issues.append("BroadcastNestedLoopJoin")
        if "EvalPython" in plan:
            issues.append("Python UDF in plan")
        shuffles = sum(
            1
            for line in plan.splitlines()
            if "Exchange" in line
            and "Broadcast" not in line
            and "Reused" not in line
        )
        if shuffles > 6 and name not in SHUFFLE_OK:
            issues.append(f"{shuffles} shuffle exchanges")
        if issues:
            bad += 1
            print(f"FLAG  {name}: {', '.join(issues)}")
    print(f"\n{bad} flagged of {len(QUERIES)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
