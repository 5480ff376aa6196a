"""Bradley-Terry iterative-loop rehearsal (VERDICT r8 #5): the kcore
treatment for the brand-new MM loop — committed evidence that per-round
cost stays FLAT as the item count grows 10×, instead of a claim.

Synthesizes duel logs from planted strengths at growing item counts,
runs BOTH regimes of ``bradley_terry`` on each:

- the driver/numpy fast path (the path the catalog query x27 takes),
- the forced-distributed parameter-server loop (driver_max_pairs=0),
  recording per-round seconds from the operator's ``stats`` sink —
  the number that must stay flat as items grow (each round is one
  broadcast-join + aggregate job over the persisted pair grid).

Also cross-checks the two paths agree on every item to 1e-4 — the
equivalence leg of tests/test_scale.py at rehearsal scale.

    python tools/bt_rehearsal.py [item_counts...]   # default 1000 10000

Output: one JSON line -> commit as REHEARSAL_bt_r9.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.emit import emit  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from ixmp_spark.session import get_spark  # noqa: E402


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1000, 10_000]
    from ixmp_spark.operators.joins import bradley_terry

    spark = get_spark("bt_rehearsal")
    out = []
    for n_items in counts:
        # planted strengths p_i = 1 + (i % 97)/97; schedule: each item
        # duels 8 GEOMETRIC ring offsets (n^(1/9) … n^(8/9)) 6 times —
        # offsets spanning every scale keep the comparison graph's
        # diameter ~constant as n grows, so the MM fixpoint's round
        # count reflects the algorithm, not a lattice's O(diam²)
        # mixing (fixed small offsets at 10k items needed >1500
        # rounds); winner decided by a deterministic hash threshold
        # against the model probability — a realistic unbalanced
        # schedule at item-linear pair count
        offs = sorted(
            {max(1, int(round(n_items ** (i / 9.0))))
             for i in range(1, 9)}
        )
        off_arr = F.array(*[F.lit(o) for o in offs])
        duels = (
            spark.range(n_items * 8 * 6)
            .select(
                (F.col("id") % n_items).alias("i"),
                ((F.col("id") % n_items)
                 + F.element_at(
                     off_arr,
                     (((F.col("id") / n_items).cast("long") % len(offs))
                      + 1).cast("int"),
                 )).alias("jr"),
                F.col("id"),
            )
            .select(
                "i", (F.col("jr") % n_items).alias("j"), "id",
            )
            .where(F.col("i") != F.col("j"))
            .select(
                "i", "j",
                (1.0 + (F.col("i") % 97) / 97.0).alias("pi"),
                (1.0 + (F.col("j") % 97) / 97.0).alias("pj"),
                (F.abs(F.hash(F.col("id"), F.lit(42))) % 1_000_000
                 / 1_000_000.0).alias("u"),
            )
            .select(
                F.when(
                    F.col("u") < F.col("pi") / (F.col("pi") + F.col("pj")),
                    F.col("i"),
                ).otherwise(F.col("j")).alias("winner"),
                F.when(
                    F.col("u") < F.col("pi") / (F.col("pi") + F.col("pj")),
                    F.col("j"),
                ).otherwise(F.col("i")).alias("loser"),
            )
        )
        row: dict = {"n_items": n_items, "n_duels": n_items * 48}

        stats_d: dict = {}
        t0 = time.time()
        drv = bradley_terry(duels, tol=1e-5, max_iter=1500, stats=stats_d)
        drv_rows = {r["item"]: r["strength"] for r in drv.collect()}
        row["driver_s"] = round(time.time() - t0, 2)
        row["driver_rounds"] = stats_d.get("rounds")
        row["n_pairs"] = stats_d.get("n_pairs")

        stats_x: dict = {}
        t0 = time.time()
        dist = bradley_terry(
            duels, tol=1e-5, max_iter=1500, driver_max_pairs=0,
            stats=stats_x,
        )
        dist_rows = {r["item"]: r["strength"] for r in dist.collect()}
        row["dist_s"] = round(time.time() - t0, 2)
        row["dist_rounds"] = stats_x.get("rounds")
        rs = stats_x.get("round_seconds") or []
        row["dist_round_s_first3"] = rs[:3]
        row["dist_round_s_last3"] = rs[-3:]
        row["dist_round_s_mean"] = round(sum(rs) / len(rs), 3) if rs else None

        max_dev = max(
            abs(drv_rows[k] - dist_rows[k]) for k in drv_rows
        )
        row["max_path_deviation"] = round(max_dev, 8)
        out.append(row)
        print(f"-- {row}", file=sys.stderr)

    emit({"rehearsal": out})


if __name__ == "__main__":
    main()
