"""Reporting engine: named, dimensioned quantities as a lazy DataFrame DAG
(SURVEY.md §2.10 X1–X3, §3.2), plus the TimeSeries ↔ report bridge
operators (reference report/operator.py:166–393)."""

from ixmp_spark.plans.reporter import Key, Reporter
from ixmp_spark.plans.ts_operators import (
    from_url,
    get_ts,
    remove_ts,
    store_ts,
    update_scenario,
)

__all__ = [
    "Key",
    "Reporter",
    "from_url",
    "get_ts",
    "remove_ts",
    "store_ts",
    "update_scenario",
]
