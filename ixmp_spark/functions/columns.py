"""Column-expression helpers (SURVEY.md §2.8 C1–C10).

All helpers return Catalyst Column expressions (JVM-side, codegen'd) —
never Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: C6 — dim renames applied on load (reference report/common.py:3 RENAME_DIMS)
RENAME_DIMS: dict[str, str] = {"node": "region", "node_loc": "region"}


def as_str(col) -> Column:
    """C1 ``as_str_list`` member: canonical string form of any key value
    (reference util/__init__.py:86–110 coerces all keys via str())."""
    return F.col(col).cast("string") if isinstance(col, str) else col.cast("string")


def iamc_key(*cols) -> Column:
    """C7 key-tuple assembly (scenario.py:719–724): canonical '|'-joined
    string key from dimension columns."""
    return F.concat_ws("|", *[as_str(c) for c in cols])


def key_array(*cols) -> Column:
    """C7 (array form): the engine's fact tables store keys as
    ``array<string>`` so any arity fits one schema."""
    return F.array(*[as_str(c) for c in cols])


def year_of(col) -> Column:
    """C3: integer year of a date/timestamp column."""
    return F.year(col)


def try_int(col) -> Column:
    """C3 ``check_year``: null-on-failure int cast (ANSI-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")


def finite(col) -> Column:
    """C10 numeric guards: true iff value is finite and not NaN
    (reference drops NaN on TS write, rejects ±inf for Oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return ~F.isnan(c) & ~c.isin(float("inf"), float("-inf")) & c.isNotNull()


def apply_renames(df, renames: dict[str, str] | None = None):
    """C6 dim-rename map applied on load."""
    for old, new in (renames or RENAME_DIMS).items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df
