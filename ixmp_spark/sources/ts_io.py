"""Time-series file I/O (SURVEY.md §2.1 S5/S6).

S5: IAMC CSV/Excel import → ``add_timeseries`` with year clamp
(reference backend/io.py:25–52, timeseries.py:665–692).
S6: multi-scenario bulk export with filters — a Spark job over every
run's ts_data joined to the runs dimension (reference platform.py:197–260
``export_timeseries_data``, columns MODEL…VALUE per common.py:35–46).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from ixmp_spark.core.platform import Platform
from ixmp_spark.core.timeseries import TimeSeries

EXPORT_COLS = ["MODEL", "SCENARIO", "VERSION", "REGION", "VARIABLE", "UNIT",
               "SUBANNUAL", "YEAR", "VALUE"]


def import_timeseries(
    ts: TimeSeries,
    path: str,
    firstyear: int | None = None,
    lastyear: int | None = None,
) -> None:
    """S5: read an IAMC (wide or long) CSV and store it; model/scenario
    columns in the file are ignored in favor of the TimeSeries identity
    (reference io.py:25–52)."""
    df = pd.read_csv(path)
    df.columns = [str(c).lower() for c in df.columns]
    df = df.drop(columns=[c for c in ("model", "scenario") if c in df.columns])
    ts.add_timeseries(df, year_lim=(firstyear, lastyear))


def export_timeseries_data(
    mp: Platform,
    path: str,
    model: str | None = None,
    scenario: str | None = None,
    variable=None,
    unit=None,
    region=None,
    default: bool = True,
    export_all_runs: bool = False,
) -> None:
    """S6: filtered bulk CSV export across runs.

    Spark plan: union of per-run ts_data parquet scans (partition per
    run — at cluster scale this is one partitioned table and the run
    filter is partition pruning), joined to the broadcast runs dim,
    IN-list filters pushed to the scans, single CSV output.
    """
    runs = mp.scenario_list(default=False)
    if not export_all_runs:
        if default:
            runs = runs[runs["is_default"]]
        if model:
            runs = runs[runs["model"] == model]
        if scenario:
            runs = runs[runs["scenario"] == scenario]
    frames = []
    for _, r in runs.iterrows():
        p = mp.wh.table_path(int(r["run_id"]), "ts_data")
        if not os.path.exists(p):
            continue
        sdf = mp.spark.read.parquet(p)
        frames.append(sdf)
    if not frames:
        pd.DataFrame(columns=EXPORT_COLS).to_csv(path, index=False)
        return
    data = frames[0]
    for f_ in frames[1:]:
        data = data.unionByName(f_)
    rdim = mp.spark.createDataFrame(
        runs[["run_id", "model", "scenario", "version"]]
    )
    out = data.join(F.broadcast(rdim), "run_id")
    for col, vals in (("variable", variable), ("unit", unit), ("region", region)):
        if vals:
            vals = [vals] if isinstance(vals, str) else list(vals)
            out = out.where(F.col(col).isin(vals))
    out = out.select(
        F.col("model").alias("MODEL"),
        F.col("scenario").alias("SCENARIO"),
        F.col("version").alias("VERSION"),
        F.col("region").alias("REGION"),
        F.col("variable").alias("VARIABLE"),
        F.col("unit").alias("UNIT"),
        F.col("subannual").alias("SUBANNUAL"),
        F.col("year").alias("YEAR"),
        F.col("value").alias("VALUE"),
    )
    tmp = path + ".sparkdir"
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.replace(part, path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
