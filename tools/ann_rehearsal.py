"""r14 ANN-family scale rehearsal: 2M and 5M vectors (VERDICT r13 #1).

Each of the last two rounds found a REAL silent-failure class only when
the rehearsal crossed a new rung (r12: bits=4 empty at 200k; r13:
bits-independent bands·n·max_bucket/2 blowup at 500k). The proven
vector rung (5e5) lags the dedup pipeline's (10M docs); this tool
pushes it an order of magnitude:

    IXMP_SPARK_DRIVER_MEM=64g REHEARSAL_OUT=REHEARSAL_ann_r14_2M.json \
        nohup python tools/ann_rehearsal.py 2000000 &

Per rung it records:
- auto-bits values for the pairs (bands=4) and miner (bands=6) shapes;
- the REALIZED bucket-size distribution: Σ m(m−1)/2 (the exact raw
  candidate volume), the clamp cap volume_route='clamp' derives from
  it, and the realized/uniform ratio (the r13 heavy-tail factor);
- cosine_lsh_pairs wall + rows + planted-neighbor recall (200 planted
  near-dup pairs at cosine ≈ 0.99999 — recall must be 1.0: the per-band
  collision probability at that angle is ≥ 0.98^bits, and the planted
  buckets are avg-sized so the clamp cannot drop them);
- hard_negatives wall + rows + anchor count under the r14 clamp
  routing (the guard that FIRED at this scale in the r13 design is now
  routing — this run proves it end-to-end);
- the operators/scale.py provisioning cross-check (VERDICT r13 #5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ixmp_spark.session import get_spark
from tools.emit import emit

DIM = 64
N_PLANT = 200
PLANT_NOISE = 0.003  # relative radius → cosine ≈ 1 - 4.5e-6


def hash_gauss_corpus(spark, n: int, seed: int = 7):
    """i.i.d. gaussian corpus via hash-based Box-Muller — deterministic
    per (vec_id, coordinate), executor-side, no driver memory (the
    planted_corpus generator from scale_rehearsal.py, plant step
    separated)."""
    import math

    def unif(salt, x):
        h = F.xxhash64(F.col("vec_id"), x, F.lit(salt))
        return (F.pmod(h, F.lit(1_000_000)) + 0.5) / 1_000_000.0

    gauss = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda x: F.sqrt(-2.0 * F.log(unif(seed, x)))
        * F.cos(2.0 * math.pi * unif(seed + 1, x)),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), gauss.alias("embedding")
    )


def main() -> None:
    import numpy as np

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from ixmp_spark.operators.scale import assert_provisioned
    from ixmp_spark.operators.similarity import (
        _auto_bits,
        _sign_lsh_banded,
        cosine_lsh_pairs,
        hard_negatives,
    )

    spark = get_spark("ann_rehearsal_r14")
    heap = spark.conf.get("spark.driver.memory", "16g")
    heap_gb = float(heap.rstrip("g"))
    prov = assert_provisioned(n, "ann", heap_gb)
    out: dict = {"n_corpus": n, "n_plant_pairs": N_PLANT,
                 "heap_gb": heap_gb, "provisioning": prov}

    corpus = hash_gauss_corpus(spark, n)
    # plant near-dup PAIRS: copy N_PLANT evenly-spaced base rows with
    # tiny noise; planted ids start at n
    base_ids = [int(j * (n // N_PLANT) + 17) for j in range(N_PLANT)]
    base_rows = corpus.where(F.col("vec_id").isin(base_ids)).collect()
    rng = np.random.default_rng(13)
    planted, plant_pairs = [], []
    for j, row in enumerate(sorted(base_rows, key=lambda r: r["vec_id"])):
        v = np.asarray(row["embedding"])
        noise = rng.standard_normal(DIM)
        noise *= PLANT_NOISE * float(np.linalg.norm(v)) / float(
            np.linalg.norm(noise)
        )
        planted.append((n + j, [float(x) for x in v + noise]))
        plant_pairs.append((int(row["vec_id"]), n + j))
    vecs = corpus.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>")
    ).repartition(spark.sparkContext.defaultParallelism).persist()
    n_total = vecs.count()
    out["n_total"] = n_total

    # pairs = the near-dup volume-first profile (r14); hn = the miner
    # profile (min_bucket=8 + clamp routing) — mirror the operators'
    # own auto calls exactly
    bits_pairs = _auto_bits(
        n_total, 4, 2000, min_bucket=0.25, budget=25_000_000,
        tail_factor=6.0,
    )
    bits_hn = _auto_bits(n_total, 6, 2000)
    out["auto_bits_pairs"] = bits_pairs
    out["auto_bits_hn"] = bits_hn

    # -- realized bucket-size distributions, both shapes --------------
    # (same planes as cosine_lsh_pairs: seed 42) — exact Σ m(m−1)/2,
    # the heavy-tail factor vs the uniform estimate, and the clamp cap
    # volume_route='clamp' would derive (the budget re-check)
    import random

    def size_stats(bands, bits, budget_half):
        rng2 = random.Random(42)
        planes = [
            [[rng2.gauss(0, 1) for _ in range(DIM)] for _ in range(bits)]
            for _ in range(bands)
        ]
        t0 = time.time()
        sizes = (
            _sign_lsh_banded(
                vecs.select(F.col("vec_id").alias("__id"),
                            F.col("embedding").alias("__vec")),
                planes,
            )
            .groupBy("__band", "__bucket")
            .agg(F.count(F.lit(1)).alias("m"))
            .persist()
        )
        vol_expr = F.col("m").cast("double") * (F.col("m") - 1.0) / 2.0
        st = sizes.agg(
            F.count(F.lit(1)).alias("buckets"),
            F.max("m").alias("max_m"),
            F.expr("percentile_approx(m, 0.99)").alias("p99_m"),
            F.sum(vol_expr).alias("vol_total"),
            F.sum(F.when(F.col("m") <= 2000, vol_expr)).alias("vol_kept"),
        ).collect()[0]
        from pyspark.sql import Window as _W

        cum_w = _W.orderBy("m").rowsBetween(_W.unboundedPreceding, 0)
        fit = (
            sizes.groupBy("m")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                "m",
                F.sum(
                    F.col("c").cast("double") * F.col("m") * (F.col("m") - 1.0) / 2.0
                ).over(cum_w).alias("cum"),
            )
            .where(F.col("cum") <= budget_half)
            .agg(F.max("m"))
            .collect()[0][0]
        )
        sizes.unpersist()
        uniform = bands * n_total * (n_total / 2**bits) / 2
        return {
            "bands": bands, "bits": bits,
            "buckets": st["buckets"], "max_m": st["max_m"],
            "p99_m": st["p99_m"],
            "vol_total": float(st["vol_total"] or 0),
            "vol_kept_cap2000": float(st["vol_kept"] or 0),
            "uniform_estimate": uniform,
            "heavy_tail_factor": round(
                float(st["vol_total"] or 0) / max(uniform, 1), 2
            ),
            "clamp_cap_at_budget": fit,
            "budget_half": budget_half,
            "wall_s": round(time.time() - t0, 2),
        }

    out["realized_pairs_shape"] = size_stats(4, bits_pairs, 25_000_000)
    print(f"-- pairs shape: {out['realized_pairs_shape']}", file=sys.stderr)
    out["realized_hn_shape"] = size_stats(6, bits_hn, 10_000_000)
    print(f"-- hn shape: {out['realized_hn_shape']}", file=sys.stderr)

    # -- leg A: near-dup pairs, volume-first auto profile -------------
    # volume_route='raise' (the searcher default) ON PURPOSE: the rung
    # proves the r14 bit sizing keeps realized volume under the guard
    # with NO routing — recall 1.0 is exact, not clamped-away
    t0 = time.time()
    pairs = cosine_lsh_pairs(
        vecs, "vec_id", "embedding", threshold=0.9, bands=4,
        bits="auto", max_bucket=2000, on_hot="drop",
        volume_route="raise",
    ).persist()
    n_pairs = pairs.count()
    out["lsh_pairs_wall_s"] = round(time.time() - t0, 2)
    out["lsh_pairs_rows"] = n_pairs
    plant_df = spark.createDataFrame(plant_pairs, "id_a long, id_b long")
    hits = pairs.join(plant_df, ["id_a", "id_b"], "left_semi").count()
    out["planted_hits"] = hits
    out["planted_recall"] = round(hits / N_PLANT, 4)
    pairs.unpersist()
    print(
        f"-- pairs: {n_pairs} rows, recall {out['planted_recall']} "
        f"in {out['lsh_pairs_wall_s']}s",
        file=sys.stderr,
    )

    # -- leg B: hard negatives under the r14 clamp routing ------------
    t0 = time.time()
    hn = hard_negatives(
        vecs, "vec_id", "embedding", k=5, bits="auto"
    ).persist()
    n_hn = hn.count()
    out["hard_negatives_wall_s"] = round(time.time() - t0, 2)
    out["hard_negatives_rows"] = n_hn
    out["hard_negatives_anchors"] = hn.select("anchor_id").distinct().count()
    band_ok = hn.where(
        (F.col("cosine_sim") < 0.4) | (F.col("cosine_sim") >= 0.9)
    ).count()
    out["hard_negatives_band_violations"] = band_ok
    hn.unpersist()
    print(
        f"-- hard_negatives: {n_hn} rows / "
        f"{out['hard_negatives_anchors']} anchors in "
        f"{out['hard_negatives_wall_s']}s",
        file=sys.stderr,
    )

    vecs.unpersist()
    emit(out)
    spark.stop()


if __name__ == "__main__":
    main()
