"""IN-list filter contract (SURVEY.md §2.2).

Reference: ``item_get_elements(..., filters)`` (base.py:986–1024) — a
conjunction of per-column allowed-value lists with two pinned behaviors:

1. values not present in the column's domain are *silently ignored*
   (base.py:1001–1005) — ``isin`` gives this for free;
2. type-coerced equality: ``42`` and ``"42"`` filter identically — the
   reference coerces everything to str; we instead cast the *filter values*
   to the column's native type so predicates stay pushdown-eligible
   (a cast on the literal side keeps the column untouched in the scan).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_seq(v) -> Sequence:
    if isinstance(v, (str, bytes)) or not isinstance(v, Sequence):
        return [v]
    return list(v)


def in_list_predicate(df: DataFrame, filters: Mapping[str, object]) -> Column | None:
    """Build the conjunctive predicate; None when no effective filter.

    Empty-list filters are dropped (reference ixmp4.py:141–154 does the
    same — an empty allowed-list means "no constraint", not "match none").
    """
    dtypes = dict(df.dtypes)
    pred = None
    for name, values in filters.items():
        if name not in dtypes:
            continue  # filter keys that aren't dims are pruned (F9)
        vals = _as_seq(values)
        if not vals:
            continue
        lits = [F.lit(v).cast(dtypes[name]) for v in vals]
        clause = F.col(name).isin(*lits)
        pred = clause if pred is None else pred & clause
    return pred


def in_list_filter(df: DataFrame, filters: Mapping[str, object]) -> DataFrame:
    """Apply the item_get_elements filter contract to ``df``."""
    pred = in_list_predicate(df, filters)
    return df if pred is None else df.where(pred)
