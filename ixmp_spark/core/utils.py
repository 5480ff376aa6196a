"""Scenario-level utilities (reference ixmp/util/__init__.py surface)."""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from ixmp_spark.core.scenario import Scenario


def diff(a: Scenario, b: Scenario, filters=None) -> Iterator[tuple[str, pd.DataFrame]]:
    """J1 (reference util/__init__.py:136–204): iterate parameters of two
    scenarios in name order (merge-join over sorted item names); per par,
    full-outer merge on dim columns with _a/_b suffixes and a ``_merge``
    indicator, sorted."""
    names = sorted(set(a.items("par")) | set(b.items("par")))
    for name in names:
        has_a, has_b = a.has_par(name), b.has_par(name)
        dims_scen = a if has_a else b
        item = dims_scen._require_item(name, "par")
        dims = item["idx_names"]
        if not dims:
            continue  # scalars handled via scalar() comparison
        fa = (
            a.par(name, filters)
            if has_a
            else pd.DataFrame(columns=[*dims, "value", "unit"])
        )
        fb = (
            b.par(name, filters)
            if has_b
            else pd.DataFrame(columns=[*dims, "value", "unit"])
        )
        merged = fa.merge(
            fb,
            on=dims,
            how="outer",
            suffixes=("_a", "_b"),
            indicator=True,
            sort=True,
        )
        yield name, merged


def parse_url(url: str) -> tuple[str, dict]:
    """C4 (reference util/__init__.py:340–408):
    ``ixmp://platform/model/scenario#version`` → (platform, scenario info).
    """
    m = re.match(
        r"(?:(?P<scheme>ixmp)://)?(?P<platform>[^/]+)/"
        r"(?P<model>[^/]+)/(?P<scenario>[^#]+)(?:#(?P<version>\d+))?$",
        url,
    )
    if not m or (m.group("scheme") is None and "://" in url):
        raise ValueError(f"cannot parse URL {url!r}")
    g = m.groupdict()
    info = {"model": g["model"], "scenario": g["scenario"]}
    if g["version"]:
        info["version"] = int(g["version"])
    return g["platform"], info


def update_par(scen: Scenario, name: str, data: pd.DataFrame) -> None:
    """J2 (reference util/__init__.py:677–690): add only rows whose key
    tuple is not yet present in the parameter — "without overwriting".

    Both sides' dim columns are coerced to str before comparing (all
    keys are strings, §1.2; a caller passing int years must hit the same
    keys as the stored str form), and the existing key set is
    de-duplicated before the membership merge so row alignment cannot
    drift if the store ever held duplicate key rows."""
    item = scen._require_item(name, "par")
    dims = item["idx_names"]
    existing = scen.par(name)
    if not dims:
        if len(existing):
            return  # 0-d parameter already has its single value
        new_rows = data
    elif len(existing):
        data = data.copy()
        for d in dims:
            data[d] = data[d].astype(str)
        ex_keys = existing[dims].astype(str).drop_duplicates()
        merged = data.merge(ex_keys, on=dims, how="left", indicator=True)
        new_rows = data.loc[(merged["_merge"] == "left_only").to_numpy()]
    else:
        new_rows = data
    if len(new_rows):
        scen.add_par(name, new_rows)


from contextlib import contextmanager


@contextmanager
def discard_on_error(ts):
    """Reference util ``discard_on_error`` (util/__init__.py): run a block
    against a checked-out TimeSeries; discard staged changes if it
    raises."""
    try:
        yield ts
    except Exception:
        if getattr(ts, "_checked_out", False):
            ts.discard_changes()
        raise


def maybe_check_out(ts, state: bool | None = None) -> bool:
    """Check out ``ts`` depending on ``state`` (reference
    util/__init__.py:253–278): with explicit ``state`` (not None) return
    it unchanged and attempt NO checkout; with ``state=None``, check out
    and return True, or return False if already checked out."""
    if state is not None:
        return state
    if getattr(ts, "_checked_out", False):
        return False
    ts.check_out()
    return True


def maybe_commit(ts, condition: bool, message: str) -> bool:
    """Commit iff ``condition`` (reference maybe_commit); returns whether
    a commit happened."""
    if not condition:
        return False
    ts.commit(message)
    return True


def isscalar(x) -> bool:
    """Reference isscalar: True for non-string scalars."""
    return not isinstance(x, (str, bytes)) and not hasattr(x, "__len__")


def maybe_convert_scalar(obj) -> pd.DataFrame:
    """Reference maybe_convert_scalar: a scalar {'value','unit'} dict →
    1-row DataFrame; DataFrames pass through."""
    if isinstance(obj, pd.DataFrame):
        return obj
    return pd.DataFrame([obj])


def show_versions() -> str:
    """Reference show_versions: engine + dependency version report."""
    import pyarrow
    import pyspark

    import ixmp_spark

    lines = [
        f"ixmp_spark: {ixmp_spark.__version__}",
        f"pyspark: {pyspark.__version__}",
        f"pandas: {pd.__version__}",
        f"pyarrow: {pyarrow.__version__}",
    ]
    return "\n".join(lines)


def format_scenario_list(platform, match: str | None = None) -> pd.DataFrame:
    """A4/F10 (reference util/__init__.py:514–556): per (model, scenario)
    version stats, optionally regex-filtered on 'model/scenario'."""
    runs = platform.scenario_list(default=False)
    if match:
        pat = re.compile(match)
        key = runs["model"].str.cat(runs["scenario"], sep="/")
        runs = runs[key.map(lambda s: bool(pat.search(s)))]
    out = (
        runs.assign(
            default_version=runs["version"].where(runs["is_default"])
        )
        .groupby(["model", "scenario"], as_index=False)
        .agg(
            N=("version", "count"),
            min_version=("version", "min"),
            max_version=("version", "max"),
            default_version=("default_version", "max"),
        )
    )
    return out


def as_str_list(arg, **kwargs) -> list[str]:
    """C1 (reference util/__init__.py:86–110): convert `arg` to a list of
    str. dict + keyword args → formatted '{key}={value}' parts for string
    templates; scalars wrap; iterables map str()."""
    if arg is None:
        return []
    if isinstance(arg, str):
        return [arg.format(**kwargs)] if kwargs else [arg]
    if isinstance(arg, dict):
        return [f"{k}={v}" for k, v in arg.items()]
    try:
        return [str(x) for x in iter(arg)]
    except TypeError:
        return [str(arg)]


def is_dict_int_float(value: dict) -> bool:
    """Reference util/__init__.py:113: True iff every key is an int (type
    guard for year→value dicts)."""
    return all(isinstance(k, int) for k in value.keys())


def check_year(y, s) -> bool | None:
    """C3 (reference util/__init__.py:127–134): True if `y` is an int;
    ValueError naming `s` otherwise; None when `y` is None."""
    if y is not None:
        if not isinstance(y, int):
            raise ValueError(f"arg `{s}` must be an integer!")
        return True
    return None


def to_iamc_layout(df: pd.DataFrame) -> pd.DataFrame:
    """C2 (reference util/__init__.py:411–455): reset index; lower-case
    column names; node→region; require region/variable/unit; default
    subannual='Year'."""
    if not list(df.index.names) == [None]:
        df = df.reset_index()
    cols = {c: str(c).lower() for c in df.columns}
    cols.update(node="region")
    df = df.rename(columns=cols)
    missing = list({"region", "variable", "unit"} - set(df.columns))
    if missing:
        raise ValueError(f"missing required columns {missing!r}")
    if "subannual" not in df.columns:
        df = df.assign(subannual="Year")
    return df


def year_list(x) -> list:
    """C3 (reference util/__init__.py:455–464): elements of `x` castable
    to int (the year columns of a wide frame)."""
    out = []
    for i in x:
        try:
            int(i)
            out.append(i)
        except (ValueError, TypeError):
            pass
    return out


def filtered(df: pd.DataFrame, filters) -> pd.DataFrame:
    """F1's pandas twin (reference util/__init__.py:467–479): AND of
    per-column IN-list masks, values coerced through as_str_list."""
    if filters is None:
        return df
    mask = pd.Series(True, index=df.index)
    for k, v in filters.items():
        mask &= df[k].isin(as_str_list(v))
    return df[mask]
