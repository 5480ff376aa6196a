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


def profile_table(df, columns=None):
    """ANALYZE-style column profile — the first query anyone runs on
    an unfamiliar table, and the statistics every planner/quality
    decision downstream consumes: per column, row count, NULL count,
    exact distinct count, and (for numeric columns) min/max.

    ONE aggregation computes every statistic: counts and min/max are
    plain aggregates; the k exact ``count_distinct``s make Catalyst
    plan an EXPAND (k× row multiplication before partial aggregation)
    — the documented cost of exactness; swap to
    ``approx_count_distinct`` upstream when profiling petabytes. The
    single wide result row unpivots to one row per column with
    ``stack`` (driver never sees data, just the 1×(5k) row plan).

    Output: (column, n, n_null, n_distinct, min_numeric, max_numeric)
    — min/max NULL for non-numeric columns, rounded to 6.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = list(columns) if columns is not None else df.columns
    numeric = {
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            (
                F.round(F.min(F.col(c).cast("double")), 6)
                if c in numeric else F.lit(None).cast("double")
            ).alias(f"__mn_{c}"),
            (
                F.round(F.max(F.col(c).cast("double")), 6)
                if c in numeric else F.lit(None).cast("double")
            ).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `__n_{c}`, `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as "
        "(column, n, n_null, n_distinct, min_numeric, max_numeric)"
    )


def group_mode(df, group_cols, value_col):
    """Statistical mode per group with a deterministic tie-break (most
    frequent value; ties resolve to the smallest value) — the
    categorical "typical value" summary ``avg`` can't give, and the
    imputation default for categorical backfills.

    Two keyed aggregations on the same grouping prefix (AQE reuses the
    exchange): value counts per (group, value), then ``min_by(value,
    struct(-count, value))`` per group — struct ordering is
    lexicographic, so the minimal (−count, value) pair is exactly
    "highest count, smallest value among ties". No window, no
    driver-side top-1, and the second shuffle moves one row per
    DISTINCT value, not per input row.

    Output: group columns + ``mode_value``, ``mode_count``, ``n_values``
    (distinct values observed).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    counts = df.groupBy(*groups, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    rank = F.struct(
        (-F.col("_c")).alias("_neg"), F.col(value_col).alias("_v")
    )
    return counts.groupBy(*groups).agg(
        F.min_by(F.col(value_col), rank).alias("mode_value"),
        F.max("_c").cast("long").alias("mode_count"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
    )


def json_profile(df, json_col: str):
    """Semi-structured column profiler: per JSON KEY, how often it
    appears, how many distinct values it takes, and whether it is
    numerically typed (with min/max when so) — the first question
    against any landed event-properties / API-payload column
    ("which fields exist, how full are they, which are numbers"),
    and the schema-inference evidence for promoting hot keys to real
    columns.

    One ``from_json`` to ``map<string,string>`` + a map explode
    (no per-key literal paths — dynamic keys profile too), then a
    single per-key aggregation. Distinct counts are over the value
    TEXT (quoting-insensitive: distinctness survives any injective
    re-encoding); numeric typing via ``try_cast`` so one malformed
    value never aborts ANSI-mode scans. Rows whose column fails to
    parse contribute nothing (NULL map explodes to no rows) — count
    them upstream if parse-rate matters.

    Output: (key, n_present, n_distinct, n_numeric, min_numeric,
    max_numeric), one row per key ever seen.
    """
    kv = df.select(
        F.explode(
            F.from_json(F.col(json_col), "map<string,string>")
        ).alias("key", "val")
    )
    num = F.col("val").try_cast("double")
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.count_distinct(F.col("val")).cast("long").alias("n_distinct"),
        F.count(num).cast("long").alias("n_numeric"),
        F.round(F.min(num), 6).alias("min_numeric"),
        F.round(F.max(num), 6).alias("max_numeric"),
    )
