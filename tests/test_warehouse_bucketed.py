"""Bucketed fact layout (SURVEY.md §1.6 "partition by run_id, bucket by
key" — wired into Platform storage in r10 after the r9 100x smoke
measured the unbucketed diff join at 90 s of a 115.5 s total).

The claims pinned here:
- Spark-path snapshot writes land bucketed (marker + bucket-table scan).
- ``Scenario.diff_par`` — the raw-key diff — runs with ZERO shuffle
  exchanges when both runs' snapshots are bucketed.
- The layout is transparent to every other reader: pandas ``read_table``,
  ``par()``, clone, and mixed bucketed/plain diffs stay correct.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ixmp_spark.core import Platform, Scenario
from ixmp_spark.operators.scale import exchange_count
from ixmp_spark.sources.warehouse import BUCKET_MARKER, fact_buckets


def _bulk_scenario(spark, root, n=4000, scenario="s"):
    mp = Platform(spark, root)
    mp.add_unit("u")
    scen = Scenario(mp, "m", scenario, version="new")
    scen.init_set("k")
    scen.add_set("k", [str(i) for i in range(n)])
    scen.init_par("p", idx_sets=["k", "k"], idx_names=["a", "b"])
    src = spark.range(n).selectExpr(
        "cast(id as string) a",
        "cast(id % 7 as string) b",
        "cast(id as double) value",
    )
    scen.add_par_bulk("p", src, unit="u", assume_unique=True, distributed=True)
    scen.commit("bulk")
    return mp, scen


def test_bucketed_fact_layout_roundtrip(spark, tmp_path):
    """Distributed writes land bucketed: marker present, exactly
    fact_buckets() part files (the repartition-before-bucketBy rule),
    spark_fact returns the same rows as a plain path read, and the
    pandas read path is unaffected."""
    mp, scen = _bulk_scenario(spark, str(tmp_path / "wh"))
    path = mp.wh.table_path(scen.run_id, "par_data")
    assert os.path.isdir(path)
    assert os.path.exists(os.path.join(path, BUCKET_MARKER))
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(parts) == fact_buckets()
    spec = mp.wh.bucket_spec(scen.run_id, "par_data")
    assert spec == {
        "keys": ["key"], "buckets": fact_buckets(), "sorted": True,
    }

    fact = mp.wh.spark_fact(spark, scen.run_id, "par_data")
    assert fact.count() == 4000
    plain = spark.read.parquet(path)
    assert (
        fact.agg(F.sum("value")).collect()[0][0]
        == plain.agg(F.sum("value")).collect()[0][0]
    )
    # pandas path reads the bucketed directory transparently
    pdf = mp.wh.read_table(scen.run_id, "par_data")
    assert len(pdf) == 4000
    # the façade read too
    assert len(scen.par("p", filters={"a": ["1", "2"]})) == 2


def test_bucketed_diff_par_no_exchange(spark, tmp_path):
    """THE r9 verdict item: diff of two bucketed fact snapshots joins
    co-partitioned — 0 shuffle exchanges in the physical plan — and the
    result is exact on a planted 1% perturbation. The unbucketed diff
    this replaces shuffled both sides (90 s of the r9 100x smoke)."""
    n = 4000
    mp, scen = _bulk_scenario(spark, str(tmp_path / "wh"), n=n)
    clone = scen.clone(scenario="s_clone", spark_threshold=1000)
    # perturb 1% of the clone through the REAL update path (distributed
    # merge + bucketed rewrite), not a view
    clone.check_out()
    upd = spark.range(n).where(F.col("id") % 100 == 0).selectExpr(
        "cast(id as string) a",
        "cast(id % 7 as string) b",
        "cast(id as double) + 0.5 value",
    )
    clone.add_par_bulk("p", upd, unit="u", distributed=True)
    clone.commit("perturb 1%")

    d = scen.diff_par(clone, "p", sort=False)
    assert exchange_count(d) == 0

    agg = d.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(F.col("value_a") != F.col("value_b"), 1).otherwise(0)
        ).alias("changed"),
        F.sum(F.when(F.col("_merge") != "both", 1).otherwise(0)).alias(
            "unmatched"
        ),
    ).collect()[0]
    assert agg["rows"] == n
    assert agg["changed"] == n // 100
    assert agg["unmatched"] == 0
    # sorted presentation (O2) carries the dim columns
    head = scen.diff_par(clone, "p").limit(1).collect()[0]
    assert set(head.asDict()) == {
        "a", "b", "value_a", "value_b", "unit_a", "unit_b", "_merge",
    }


def test_diff_par_mixed_layout_correct(spark, tmp_path):
    """A bucketed run diffed against a pandas-path (single-file) run is
    still CORRECT — it just pays the shuffle the bucketed pair avoids."""
    mp, scen = _bulk_scenario(spark, str(tmp_path / "wh"), n=2000)
    small = Scenario(mp, "m", "small", version="new")
    small.init_set("k")
    small.add_set("k", [str(i) for i in range(2000)])
    small.init_par("p", idx_sets=["k", "k"], idx_names=["a", "b"])
    import pandas as pd

    small.add_par(
        "p",
        pd.DataFrame(
            {
                "a": [str(i) for i in range(10)],
                "b": [str(i % 7) for i in range(10)],
                "value": [float(i) for i in range(10)],
                "unit": "u",
            }
        ),
    )
    small.commit("small")
    assert mp.wh.bucket_spec(small.run_id, "par_data") is None

    d = scen.diff_par(small, "p", sort=False)
    agg = d.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("_merge") == "both", 1).otherwise(0)).alias(
            "both"
        ),
    ).collect()[0]
    assert agg["rows"] == 2000  # 10 shared keys + 1990 left_only
    assert agg["both"] == 10


def test_bucketing_disabled_by_env(spark, tmp_path, monkeypatch):
    """IXMP_SPARK_FACT_BUCKETS=0 is the kill switch: writes fall back to
    plain directory parquet, readers see no bucket spec."""
    monkeypatch.setenv("IXMP_SPARK_FACT_BUCKETS", "0")
    mp, scen = _bulk_scenario(spark, str(tmp_path / "wh"), n=2000)
    assert mp.wh.bucket_spec(scen.run_id, "par_data") is None
    assert not os.path.exists(
        os.path.join(mp.wh.table_path(scen.run_id, "par_data"), BUCKET_MARKER)
    )
    assert len(scen.par("p", filters={"a": ["7"]})) == 1


def test_diff_par_at_history_no_exchange(spark, tmp_path):
    """Time-travel diff: history snapshots hardlink the bucket marker
    with the files, so diff_par_at joins AS-OF-commit vs live with 0
    exchanges and recovers exactly the update's changed keys."""
    n = 3000
    mp, scen = _bulk_scenario(spark, str(tmp_path / "wh"), n=n)
    first_commit = scen.commit_history()[-1]
    scen.check_out()
    upd = spark.range(n).where(F.col("id") % 50 == 0).selectExpr(
        "cast(id as string) a",
        "cast(id % 7 as string) b",
        "cast(id as double) + 2.0 value",
    )
    scen.add_par_bulk("p", upd, unit="u", distributed=True)
    scen.commit("perturb 2%")

    d = scen.diff_par_at("p", first_commit, sort=False)
    assert exchange_count(d) == 0
    agg = d.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(F.col("value_a") != F.col("value_b"), 1).otherwise(0)
        ).alias("changed"),
    ).collect()[0]
    assert agg["rows"] == n
    assert agg["changed"] == n // 50
    # explicit two-commit form agrees with the as-of-vs-live form
    second = scen.commit_history()[-1]
    d2 = scen.diff_par_at("p", first_commit, second, sort=False)
    assert exchange_count(d2) == 0
    assert d2.where(F.col("value_a") != F.col("value_b")).count() == n // 50


def test_ts_bucketed_align_no_exchange(spark, tmp_path):
    """TS snapshots bucket by (region, variable) on the Spark write
    path; a cross-run alignment join on the full series key — a
    SUPERSET of the bucket key, co-partitioned under
    requireAllClusterKeysForCoPartition=false — runs with 0 shuffle
    exchanges and aligns values exactly."""
    mp = Platform(spark, str(tmp_path / "wh"))
    mp.add_unit("GWa")
    for i in range(40):
        mp.add_region(f"r{i}", "country")

    def mk(name, bump):
        scen = Scenario(mp, "m", name, version="new")
        src = spark.range(300_000).selectExpr(
            "concat('r', id % 40) region",
            "concat('v', id % 25) variable",
            "'GWa' unit",
            "cast(2000 + (id % 30) as int) year",
            f"cast(id as double) + {bump} value",
        )
        scen.add_timeseries_bulk(src)
        scen.commit("bulk ts")
        return scen

    a, b = mk("tsa", 0.0), mk("tsb", 0.5)
    assert mp.wh.bucket_spec(a.run_id, "ts_data") == {
        "keys": ["region", "variable"], "buckets": fact_buckets(),
        "sorted": True,
    }
    key = ["region", "variable", "subannual", "year"]
    fa = mp.wh.spark_fact(spark, a.run_id, "ts_data").select(
        *key, F.col("value").alias("va")
    )
    fb = mp.wh.spark_fact(spark, b.run_id, "ts_data").select(
        *key, F.col("value").alias("vb")
    )
    j = fa.join(fb, key)
    assert exchange_count(j) == 0
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("vb") - F.col("va")).alias("lo"),
        F.max(F.col("vb") - F.col("va")).alias("hi"),
    ).collect()[0]
    # distinct (id%40, id%25, id%30) triples = lcm(40,25,30) = 600
    # (the residues are CRT-coupled, not a full cross product);
    # upsert keeps last per key
    assert agg["n"] == 600
    assert (agg["lo"], agg["hi"]) == (0.5, 0.5)


def test_vacuum_drops_history_registrations(spark, tmp_path):
    """vacuum() must drop the ixwh_*_h<n> Spark-catalog registrations
    spark_fact_at created over the snapshots it deletes (the r10
    ADVICE item): a surviving external-table name over a deleted
    location would make a later read scan empty instead of raising."""
    import pytest

    n = 2000
    mp, scen = _bulk_scenario(spark, str(tmp_path / "wh"), n=n)
    first = scen.commit_history()[-1]
    scen.check_out()
    scen.add_par("p", [["0", "0"]], value=99.0, unit="u")
    scen.commit("second")

    # register the history snapshot (bucketed -> external table)
    fact = mp.wh.spark_fact_at(spark, scen.run_id, "par_data", first)
    assert fact.count() == n
    regs = mp.wh._hist_registered[(scen.run_id, first)]
    assert regs and all(spark.catalog.tableExists(t) for t in regs)

    dropped = mp.wh.vacuum(scen.run_id, keep_last=1)
    assert first in dropped
    # the catalog entries are gone with the files...
    assert all(not spark.catalog.tableExists(t) for t in regs)
    assert (scen.run_id, first) not in mp.wh._hist_registered
    # ...so a re-read raises instead of scanning a deleted location
    with pytest.raises(ValueError, match="no commit"):
        mp.wh.spark_fact_at(spark, scen.run_id, "par_data", first)


def test_unsorted_bucketed_layout(spark, tmp_path, monkeypatch):
    """IXMP_SPARK_FACT_SORT=0 (the r10 commit-write superlinearity
    knob): snapshots land CLUSTERED BY but not SORTED BY — the marker
    records it, the reader registers without SORTED BY, and diff_par
    still joins with ZERO exchanges (co-partitioning needs only the
    clustering; the sort moves to cheap per-partition read-side Sort
    nodes). Mixed sorted/unsorted diffs stay correct."""
    from ixmp_spark.operators.scale import sort_count

    monkeypatch.setenv("IXMP_SPARK_FACT_SORT", "0")
    n = 3000
    mp, scen = _bulk_scenario(spark, str(tmp_path / "wh"), n=n)
    spec = mp.wh.bucket_spec(scen.run_id, "par_data")
    assert spec == {
        "keys": ["key"], "buckets": fact_buckets(), "sorted": False,
    }
    clone = scen.clone(scenario="s_clone", spark_threshold=1000)
    clone.check_out()
    upd = spark.range(n).where(F.col("id") % 100 == 0).selectExpr(
        "cast(id as string) a",
        "cast(id % 7 as string) b",
        "cast(id as double) + 1.0 value",
    )
    clone.add_par_bulk("p", upd, unit="u", distributed=True)
    clone.commit("perturb")

    d = scen.diff_par(clone, "p", sort=False)
    assert exchange_count(d) == 0
    # read-side sorts ARE inserted (the trade the knob makes)
    assert sort_count(d) >= 2
    agg = d.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(F.col("value_a") != F.col("value_b"), 1).otherwise(0)
        ).alias("changed"),
    ).collect()[0]
    assert agg["rows"] == n and agg["changed"] == n // 100

    # mixed: a SORTED original diffed against the unsorted clone still
    # co-partitions (same CLUSTERED BY spec) and stays correct
    monkeypatch.setenv("IXMP_SPARK_FACT_SORT", "1")
    mp2, scen2 = _bulk_scenario(
        spark, str(tmp_path / "wh2"), n=n, scenario="sorted_side"
    )
    assert mp2.wh.bucket_spec(scen2.run_id, "par_data")["sorted"] is True
