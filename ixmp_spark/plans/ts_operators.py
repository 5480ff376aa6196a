"""TimeSeries ↔ reporting bridge operators.

Reference: ixmp/report/operator.py:166–360 (get_ts / remove_ts /
store_ts / update_scenario / from_url) — the operators that move data
between the computation graph and the versioned store. They are plain
callables (usable directly or registered as Reporter thunks); every
write goes through the normal check_out → commit transaction so the
store-side contract (validation, history snapshot, catalog bump) is
identical to interactive edits.
"""

from __future__ import annotations

import logging

import pandas as pd

log = logging.getLogger(__name__)


def get_ts(
    ts,
    filters: dict | None = None,
    iamc: bool = False,
    subannual: bool | str = "auto",
) -> pd.DataFrame:
    """Retrieve timeseries data from `ts` (reference operator.py:181–201;
    corresponds to :meth:`TimeSeries.timeseries`)."""
    return ts.timeseries(iamc=iamc, subannual=subannual, **(filters or {}))


def remove_ts(ts, data: pd.DataFrame | None = None, after: int | None = None) -> None:
    """Remove time series data from `ts` (reference operator.py:244–284).

    Without `data`, removes ALL (non-meta) series; `after` restricts the
    removal to year >= after. Runs as one transaction."""
    if data is None:
        data = ts.timeseries().drop(columns="value")
    n = len(data)
    count = f"{n}"
    if after is not None:
        data = data[data["year"] >= after]
        count = f"{len(data)} of {n} ({after} <= year)"
    log.info("Remove %s rows of time series data", count)
    ts.check_out(timeseries_only=True)
    try:
        ts.remove_timeseries(data)
    except Exception:
        ts.discard_changes()
        raise
    else:
        ts.commit(f"Remove time series data ({__name__}.remove_ts)")


def store_ts(scenario, *data: pd.DataFrame, strict: bool = False) -> None:
    """Store 1+ frames of time series data on `scenario` in one commit
    (reference operator.py:287–331). Frames pass through the engine's
    IAMC-layout normalization (add_timeseries handles wide/long, node→
    region, subannual default). With ``strict=False`` a failing frame is
    logged and skipped; the rest still commit."""
    scenario.check_out(timeseries_only=True)
    for df in data:
        try:
            scenario.add_timeseries(df)
        except Exception as e:
            log.error("Failed with %r:\n%s", e, df)
            if strict:
                scenario.discard_changes()
                raise
        else:
            log.info("  <- %d rows", len(df))
    scenario.commit(f"Data added using {__name__}")


def update_scenario(scenario, *quantities, params: list[str] = []) -> None:
    """Update `scenario` parameters with computed reporting data
    (reference operator.py:334–393): each element of `quantities` is a
    pandas DataFrame valid for :meth:`Scenario.add_par` (with the target
    parameter name at the same index of `params`), or a
    ``(name, Quantity)`` pair / reporting ``Quantity`` whose Spark frame
    is materialized and written. One transaction for all updates."""
    from ixmp_spark.plans.reporter import Quantity

    scenario.check_out()
    try:
        for i, qty in enumerate(quantities):
            if isinstance(qty, tuple):
                par_name, qty = qty
            elif i < len(params):
                par_name = params[i]
            else:
                raise ValueError(
                    f"no parameter name for quantities[{i}]; pass params= "
                    "or (name, quantity) pairs"
                )
            if isinstance(qty, Quantity):
                pdf = qty.df.toPandas()
                if "value" not in pdf.columns:
                    raise ValueError(f"quantity for {par_name!r} has no value")
                if "unit" not in pdf.columns and qty.unit is not None:
                    pdf["unit"] = qty.unit
                qty = pdf
            log.info("  %s <- %d rows", par_name, len(qty))
            scenario.add_par(par_name, qty)
    except Exception:
        scenario.discard_changes()
        raise
    else:
        scenario.commit(f"Data updated using {__name__}")


def from_url(url: str, spark, platforms: dict[str, str] | None = None, cls=None):
    """Instantiate a TimeSeries/Scenario from an ``ixmp://`` URL
    (reference operator.py:166–178 / TimeSeries.from_url).

    The URL's platform segment resolves through `platforms` (name →
    warehouse root); with no mapping it is taken as the warehouse root
    directory itself. Returns ``(ts, platform)``."""
    from ixmp_spark.core.platform import Platform
    from ixmp_spark.core.timeseries import TimeSeries
    from ixmp_spark.core.utils import parse_url

    cls = cls or TimeSeries
    platform_name, info = parse_url(url)
    root = (platforms or {}).get(platform_name, platform_name)
    mp = Platform(spark, root)
    return cls(mp, info["model"], info["scenario"],
               version=info.get("version")), mp
