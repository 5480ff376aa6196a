"""Scenario data file I/O (SURVEY.md §2.1 S3/S4).

Reference format (ixmp/backend/io.py:55–361; doc/file-io.rst:20–75):
- one sheet per item, plus an ``ix_type_mapping`` sheet (item → ix_type);
- simple set: one column named after the set; indexed set: idx_name
  columns; par: idx_names + value + unit; var/equ written but *ignored*
  on read (io.py:318–320);
- empty sets are written, empty par/var/equ omitted;
- items longer than ``max_row`` split across sheets ``name``,
  ``name(2)``, … (EXCEL_MAX_ROWS = 1,048,576; io.py:22, 128–139);
- read is a two-pass topological load: index sets first, indexed items
  once their index sets exist (queue at io.py:250–308), with optional
  ``init_items`` schema inference and ``add_units`` registration.

Workbook backend: real .xlsx always — written by the stdlib-only
SpreadsheetML writer (sources/xlsx_lite.py; inline strings, readable by
Excel/openpyxl/pandas) and read back by openpyxl when installed (full
fidelity for external files) or xlsx_lite otherwise. Directory paths
select the CSV-dir backend (same sheet semantics, handy for diffing).
"""

from __future__ import annotations

import json
import math
import os
import re
from collections import deque

import pandas as pd

from ixmp_spark.core.scenario import Scenario

EXCEL_MAX_ROWS = 1_048_576

try:  # optional dependency gate
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except ImportError:
    HAVE_OPENPYXL = False


class Workbook:
    """Ordered name → DataFrame mapping with xlsx or CSV-dir persistence."""

    def __init__(self):
        self.sheets: dict[str, pd.DataFrame] = {}

    def add(self, name: str, df: pd.DataFrame) -> None:
        self.sheets[name] = df.reset_index(drop=True)

    def write(self, path: str) -> None:
        if str(path).endswith(".xlsx"):
            # xlsx_lite writes standard SpreadsheetML (inline strings):
            # readable by Excel/openpyxl/pandas — no dependency needed
            from ixmp_spark.sources.xlsx_lite import write_xlsx

            write_xlsx(path, self.sheets)
            return
        os.makedirs(path, exist_ok=True)
        order = []
        for i, (name, df) in enumerate(self.sheets.items()):
            fname = f"sheet_{i:04d}.csv"
            df.to_csv(os.path.join(path, fname), index=False)
            order.append({"name": name, "file": fname})
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(order, f, indent=1)

    @classmethod
    def read(cls, path: str) -> "Workbook":
        wb = cls()
        if str(path).endswith(".xlsx"):
            if HAVE_OPENPYXL:  # full-fidelity reader for external files
                for name, df in pd.read_excel(path, sheet_name=None).items():
                    wb.add(name, df)
                return wb
            from ixmp_spark.sources.xlsx_lite import read_xlsx

            for name, df in read_xlsx(path).items():
                wb.add(name, df)
            return wb
        with open(os.path.join(path, "manifest.json")) as f:
            order = json.load(f)
        for ent in order:
            wb.add(
                ent["name"],
                pd.read_csv(os.path.join(path, ent["file"])),
            )
        return wb


def _sheet_chunks(name: str, df: pd.DataFrame, max_row: int):
    """W4: yield (sheet_name, chunk) pairs — ``name``, ``name(2)``, …"""
    n = max(1, math.ceil(len(df) / max_row)) if len(df) else 1
    for i in range(n):
        sheet = name if i == 0 else f"{name}({i + 1})"
        yield sheet, df.iloc[i * max_row : (i + 1) * max_row]


def write_scenario_data(
    scen: Scenario, path: str, items=None, filters=None,
    max_row: int = EXCEL_MAX_ROWS,
) -> None:
    """S3 (reference io.py:55–154): dump item data to a workbook.

    ``filters`` (reference cli.py:229–258 export, ``dim=val0,val1``)
    restrict the written rows of parameters ONLY (reference io.py:94–102:
    ``item_filters = None`` for every non-par type); keys are pruned per
    item to its dims (F9)."""
    wb = Workbook()
    mapping_rows = []
    names = items or (
        scen.items("set") + scen.items("par") + scen.items("var") + scen.items("equ")
    )

    def _rel(item) -> dict | None:
        if not filters:
            return None
        return {
            d: v for d, v in filters.items() if d in item["idx_names"]
        } or None

    for name in sorted(names):
        item = scen._require_item(name)
        ix_type = item["ix_type"]
        arity = len(item["idx_sets"])
        if ix_type == "set":
            if arity == 0:
                data = pd.DataFrame({name: list(scen.set(name))})
            else:
                data = scen.set(name)
        elif ix_type == "par":
            if arity == 0:
                s = scen.scalar(name)
                data = pd.DataFrame({"value": [s["value"]], "unit": [s["unit"]]})
            else:
                data = scen.par(name, filters=_rel(item))
        else:
            # var/equ: written for information, ignored on read
            try:
                d = scen._get_elements(ix_type, name)
            except KeyError:
                continue
            data = (
                pd.DataFrame([d]) if isinstance(d, dict) else d
            )
        if ix_type != "set" and len(data) == 0:
            continue  # empty par/var/equ omitted (io.py:84–90)
        for sheet, chunk in _sheet_chunks(name, data, max_row):
            wb.add(sheet, chunk)
            mapping_rows.append({"item": sheet, "ix_type": ix_type})
    wb.add("ix_type_mapping", pd.DataFrame(mapping_rows, columns=["item", "ix_type"]))
    wb.write(path)


_SPLIT_RE = re.compile(r"^(?P<base>.+)\((?P<n>\d+)\)$")


def _concat_split_sheets(wb: Workbook, mapping: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """U3 (io.py:236–248): re-join ``name``, ``name(2)``, … chunks."""
    groups: dict[str, list[tuple[int, pd.DataFrame]]] = {}
    for sheet in mapping["item"]:
        if sheet not in wb.sheets:
            continue
        m = _SPLIT_RE.match(sheet)
        base, n = (m.group("base"), int(m.group("n"))) if m else (sheet, 1)
        groups.setdefault(base, []).append((n, wb.sheets[sheet]))
    return {
        base: pd.concat(
            [df for _, df in sorted(chunks)], ignore_index=True
        )
        for base, chunks in groups.items()
    }


def read_scenario_data(
    scen: Scenario,
    path: str,
    add_units: bool = False,
    init_items: bool = False,
    commit_steps: bool = False,
) -> None:
    """S4 (reference io.py:206–361): two-pass topological load.

    Pass 1 queues every set/par; an item is loadable when all its index
    sets already exist in the scenario; the queue re-visits deferred items
    until no progress (cycle/missing-set → error). var/equ sheets are
    ignored. init_items infers schemas from sheet columns
    (maybe_init_item, io.py:157–202); add_units registers unseen units.
    """
    wb = Workbook.read(path)
    if "ix_type_mapping" not in wb.sheets:
        raise ValueError("missing ix_type_mapping sheet")
    mapping = wb.sheets["ix_type_mapping"]
    data = _concat_split_sheets(wb, mapping)
    ix_types = {}
    for _, row in mapping.iterrows():
        m = _SPLIT_RE.match(row["item"])
        ix_types[m.group("base") if m else row["item"]] = row["ix_type"]

    if add_units:
        known = set(scen.platform.units())
        for name, df in data.items():
            if ix_types[name] == "par" and "unit" in df.columns:
                for u in pd.unique(df["unit"].astype(str)):
                    if u not in known:
                        scen.platform.add_unit(u)
                        known.add(u)

    todo = deque(
        name for name in data if ix_types[name] in ("set", "par")
    )
    progress, deferred = True, []
    while todo:
        if not progress and set(todo) == set(deferred):
            raise ValueError(
                f"cannot load items {sorted(todo)}: missing index sets"
            )
        progress, deferred = False, list(todo)
        for _ in range(len(todo)):
            name = todo.popleft()
            df = data[name]
            ix_type = ix_types[name]
            dim_cols = [c for c in df.columns if c not in ("value", "unit")]
            if not scen.has_item(name):
                if not init_items:
                    raise KeyError(
                        f"item {name!r} not initialized (pass init_items=True)"
                    )
                simple_set = (
                    ix_type == "set" and list(df.columns) == [name]
                )
                idx_sets = [] if simple_set else dim_cols
                missing = [
                    s for s in idx_sets if not scen.has_set(s)
                ]
                if missing:
                    todo.append(name)
                    continue
                scen.init_item(ix_type, name, idx_sets=idx_sets)
            else:
                missing = [
                    s for s in scen.idx_sets(name) if not scen.has_set(s)
                ]
                if missing:
                    todo.append(name)
                    continue
            if ix_type == "set":
                if list(df.columns) == [name]:
                    scen.add_set(name, df[name].astype(str).tolist())
                elif len(df):
                    scen.add_set(
                        name, df.astype(str).values.tolist()
                    )
            else:
                if list(df.columns) == ["value", "unit"]:
                    scen.add_par(name, None, df["value"].iloc[0], df["unit"].iloc[0])
                elif len(df):
                    scen.add_par(name, df)
            progress = True
            if commit_steps:
                scen.commit(f"Loaded {ix_type} {name!r} from {path}")
                scen.check_out()
