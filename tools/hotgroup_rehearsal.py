"""r14 hot-group rehearsal for the ranking/eval-metric family
(VERDICT r13 #3): x51 (ndcg_at_k), x52 (mean_reciprocal_rank),
w8-style top-k-per-group, x47 (rank_biased_overlap) — none had been
exercised with a pathological group (one query group holding 10⁶–10⁷
candidate rows, the skewed-key analogue of the LSH hot bucket).

    REHEARSAL_OUT=REHEARSAL_hotgroup_r14.json \
        nohup python tools/hotgroup_rehearsal.py 5000000 &

Corpus: ONE hot group with n_hot rows + 1000 normal groups × 100 rows.
Measured per operator: wall seconds on the hot corpus. For MRR the
r13 window shape (unfiltered row_number over the whole group — the
single-task-sort hazard) is measured as the A arm against the r14
two-path shape (top-1-relevant WindowGroupLimit + ahead-count), and
their results are asserted EQUAL row-for-row — the restructure is
proven both faster-at-skew and semantics-preserving in one run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from ixmp_spark.session import get_spark
from tools.emit import emit


def build_corpus(spark, n_hot: int):
    """hot group 0 with n_hot rows; groups 1..1000 with 100 rows each.
    Deterministic hash scores; ~1% relevant."""
    hot = spark.range(n_hot).select(
        F.lit(0).alias("g"), F.col("id").alias("item")
    )
    normal = (
        spark.range(1000 * 100)
        .select(
            (F.col("id") % 1000 + 1).alias("g"),
            (F.col("id") + 10_000_000).alias("item"),
        )
    )
    df = hot.unionByName(normal)
    h = F.xxhash64("g", "item", F.lit(5))
    return df.select(
        "g",
        "item",
        (F.pmod(h, F.lit(1_000_000)) / 1_000_000.0).alias("s"),
        (F.pmod(F.xxhash64("item", F.lit(9)), F.lit(100)) == 0)
        .cast("int")
        .alias("rel"),
    )


def mrr_window_shape(df):
    """The r13 MRR plan — unfiltered row_number over every group (the
    hot-group single-task sort), kept here as the rehearsal's A arm."""
    w = Window.partitionBy("g").orderBy(F.desc("s"), F.asc("item"))
    ranked = df.select("g", "rel", F.row_number().over(w).alias("_r"))
    first_rel = F.min(F.when(F.col("rel") > 0, F.col("_r")))
    return ranked.groupBy("g").agg(
        first_rel.cast("long").alias("first_rel_rank"),
        F.round(
            F.coalesce(F.lit(1.0) / first_rel.cast("double"), F.lit(0.0)), 6
        ).alias("rr"),
    )


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    from ixmp_spark.operators.sampling import (
        mean_reciprocal_rank,
        ndcg_at_k,
        rank_biased_overlap,
    )

    spark = get_spark("hotgroup_rehearsal_r14")
    df = build_corpus(spark, n_hot).persist()
    n = df.count()
    out: dict = {"n_rows": n, "n_hot": n_hot, "n_groups": 1001}

    def run(name, frame):
        t0 = time.time()
        rows = frame.collect()
        out[f"{name}_wall_s"] = round(time.time() - t0, 2)
        out[f"{name}_rows"] = len(rows)
        print(
            f"-- {name}: {len(rows)} rows in {out[f'{name}_wall_s']}s",
            file=sys.stderr,
        )
        return rows

    # w8 shape: top-3 per group, conjunctive rank filter
    w = Window.partitionBy("g").orderBy(F.desc("s"), F.asc("item"))
    run(
        "topk_per_group",
        df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3),
    )

    run("ndcg", ndcg_at_k(df, "g", "s", "rel", "item", k=10))

    a = run("mrr_window_A", mrr_window_shape(df))
    b = run("mrr_twopath_B", mean_reciprocal_rank(df, "g", "s", "rel", "item"))
    cmp_a = sorted((r["g"], r["first_rel_rank"], r["rr"]) for r in a)
    cmp_b = sorted((r["g"], r["first_rel_rank"], r["rr"]) for r in b)
    assert cmp_a == cmp_b, "two-path MRR diverged from the window shape"
    out["mrr_equal"] = True
    out["mrr_speedup_at_skew"] = round(
        out["mrr_window_A_wall_s"] / max(out["mrr_twopath_B_wall_s"], 1e-9), 2
    )

    # RBO: the whole frame IS one (global) ranking group — depth-bounds
    # must hold against n_hot-scale inputs
    dfa = df.select("item", "s")
    dfb = df.select(
        "item",
        (F.col("s") + (F.pmod(F.xxhash64("item"), F.lit(100)) / 1000.0)).alias(
            "s"
        ),
    )
    run("rbo", rank_biased_overlap(dfa, dfb, "item", "s", p=0.9, depth=50))

    df.unpersist()
    emit(out)
    spark.stop()


if __name__ == "__main__":
    main()
