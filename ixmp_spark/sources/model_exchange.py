"""Solver exchange files (S7/S8 — the GDX bridge, SURVEY.md §3.3).

The reference hands sets+pars to GAMS as a GDX file (jdbc.py:715–722
``toGDX``) and reads var/equ levels/marginals back
(``readSolutionFromGDX``, jdbc.py:603–672). Real GDX needs the GAMS
runtime (absent here, gated in core/model.GAMSModel); this module
implements the same contract over a portable parquet bundle so the
orchestration loop is fully exercisable:

    <dir>/manifest.json     items + idx metadata (+ scalar values)
    <dir>/set_<name>.parquet / par_<name>.parquet   one file per item
    solution dir: sol_<name>.parquet with idx cols + lvl + mrg

``write_model_input`` excludes var/equ (like toGDX); ``read_solution``
applies check/var_list/equ_list selection like readSolutionFromGDX.
Model data is model-sized, so pandas I/O at the driver matches the
reference's own design point.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from ixmp_spark.core.scenario import Scenario


def write_model_input(scen: Scenario, path: str) -> None:
    """S7: dump all sets + pars (never var/equ) for an external solver."""
    os.makedirs(path, exist_ok=True)
    manifest: dict[str, dict] = {}
    for name in scen.items("set"):
        item = scen._require_item(name)
        manifest[name] = {
            "ix_type": "set",
            "idx_sets": item["idx_sets"],
            "idx_names": item["idx_names"],
        }
        if item["idx_sets"]:
            df = scen.set(name)
        else:
            df = pd.DataFrame({name: list(scen.set(name))})
        df.to_parquet(os.path.join(path, f"set_{name}.parquet"))
    for name in scen.items("par"):
        item = scen._require_item(name)
        entry = {
            "ix_type": "par",
            "idx_sets": item["idx_sets"],
            "idx_names": item["idx_names"],
        }
        if not item["idx_sets"]:
            entry["scalar"] = scen.scalar(name)
        else:
            scen.par(name).to_parquet(os.path.join(path, f"par_{name}.parquet"))
        manifest[name] = entry
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def read_model_input(path: str) -> dict[str, object]:
    """Solver-side loader: item name → DataFrame / label list / scalar."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    out: dict[str, object] = {}
    for name, meta in manifest.items():
        if "scalar" in meta:
            out[name] = meta["scalar"]
            continue
        p = os.path.join(path, f"{meta['ix_type']}_{name}.parquet")
        df = pd.read_parquet(p)
        if meta["ix_type"] == "set" and not meta["idx_sets"]:
            out[name] = df[name].tolist()
        else:
            out[name] = df
    return out


def write_solution(path: str, solution: dict[str, pd.DataFrame | dict]) -> None:
    """Solver-side writer: var/equ name → (idx cols + lvl + mrg) frame or
    {'lvl','mrg'} scalar dict."""
    os.makedirs(path, exist_ok=True)
    meta = {}
    for name, data in solution.items():
        if isinstance(data, dict):
            meta[name] = {"scalar": {k: float(v) for k, v in data.items()}}
        else:
            meta[name] = {}
            data.to_parquet(os.path.join(path, f"sol_{name}.parquet"))
    with open(os.path.join(path, "solution.json"), "w") as f:
        json.dump(meta, f, indent=1)


def read_solution(
    scen: Scenario,
    path: str,
    check_solution: bool = True,
    var_list: list[str] | None = None,
    equ_list: list[str] | None = None,
    comment: str = "import solution",
) -> None:
    """S8: ingest solver output into the scenario (one commit).

    check_solution=True requires every declared var/equ to be present
    (reference readSolutionFromGDX's feasibility/consistency gate);
    var_list/equ_list restrict what is imported.
    """
    with open(os.path.join(path, "solution.json")) as f:
        meta = json.load(f)
    wanted = {
        "var": var_list if var_list is not None else scen.items("var"),
        "equ": equ_list if equ_list is not None else scen.items("equ"),
    }
    if check_solution:
        missing = [
            n for names in wanted.values() for n in names if n not in meta
        ]
        if missing:
            raise ValueError(f"solution file lacks {missing}")
    scen.check_out(timeseries_only=True)
    scen._ts_only = False
    try:
        for ix_type, names in wanted.items():
            for name in names:
                if name not in meta:
                    continue
                if "scalar" in meta[name]:
                    scen.add_solution(name, meta[name]["scalar"], ix_type)
                else:
                    df = pd.read_parquet(
                        os.path.join(path, f"sol_{name}.parquet")
                    )
                    scen.add_solution(name, df, ix_type)
        scen.commit(comment)
    except Exception:
        scen.discard_changes()
        raise
