"""Projections / filters / predicates (SURVEY.md §2.2 F1–F10).

The reference's universal query primitive ``item_get_elements(filters)``
(base.py:986–1024) is a conjunction of IN-list predicates; these queries
pin that contract (silent ignore of non-member values, str coercion) plus
the range / regex / array-membership variants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ixmp_spark.operators.filtering import in_list_filter
from ixmp_spark.queries import load, query


@query(
    "f1_filter_in_conj",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R') AND l_linestatus IN ('F')
      AND l_quantity IN (1.0, 2.0, 3.0)
    """,
)
def f1_filter_in_conj(spark, sf_dir):
    """Conjunctive IN-list filter — the item_get_elements contract (F1–F4,
    base.py:986–1024). Values absent from the column's domain are silently
    ignored (here 'X' for returnflag) and non-str values match their
    coerced form (reference base.py:1001–1005); our engine keeps native
    types and coerces the *filter* side instead.
    """
    li = load(spark, sf_dir, "lineitem")
    out = in_list_filter(
        li,
        {
            "l_returnflag": ["A", "R", "X"],  # 'X' silently ignored
            "l_linestatus": ["F"],
            "l_quantity": [1, 2, 3],  # ints match double column
        },
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity"
    )


@query(
    "f5_ts_selector",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('click', 'purchase')
      AND user_id IN (1, 2, 3, 5, 8, 13, 21, 34)
      AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def f5_ts_selector(spark, sf_dir):
    """Time-series selector (F5, timeseries.py:419–492): IN-lists over
    region/variable/unit + year membership → here event_type/user_id +
    a time window. The reference's ixmp4 backend filters ``year``
    client-side (ixmp4.py:1553–1563); Spark pushes all four predicates to
    the scan.
    """
    ev = load(spark, sf_dir, "events")
    return ev.where(
        F.col("event_type").isin("click", "purchase")
        & F.col("user_id").isin(1, 2, 3, 5, 8, 13, 21, 34)
        & (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "f7_year_clamp",
    oracle="""
    SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year, o_totalprice
    FROM orders
    WHERE CAST(year(o_orderdate) AS INTEGER) BETWEEN 1996 AND 1998
    """,
)
def f7_year_clamp(spark, sf_dir):
    """Year-range clamp (F7, timeseries.py:403–408 ``firstyear/lastyear``).
    year() stays a Catalyst expression so the filter folds into the scan.
    """
    o = load(spark, sf_dir, "orders")
    return o.withColumn("o_year", F.year("o_orderdate")).where(
        F.col("o_year").between(1996, 1998)
    ).select("o_orderkey", "o_year", "o_totalprice")


@query(
    "f10_regex_match",
    oracle=r"""
    SELECT c_custkey, c_name
    FROM customer
    WHERE regexp_matches(c_name, 'Customer#0+[14]2$')
    """,
)
def f10_regex_match(spark, sf_dir):
    """Regex scenario-list match (F10, util/__init__.py:514–556
    ``format_scenario_list(match=...)`` → rlike)."""
    c = load(spark, sf_dir, "customer")
    return c.where(F.col("c_name").rlike("Customer#0+[14]2$")).select(
        "c_custkey", "c_name"
    )


@query(
    "f8_indexed_by",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE list_contains(string_split(p_type, ' '), 'ECONOMY')
    """,
)
def f8_indexed_by(spark, sf_dir):
    """``items(indexed_by=set)`` predicate (F8, scenario.py:430–435): our
    engine stores ``idx_sets array<string>`` in the item registry and
    filters with array_contains — same shape here over tokenized p_type.
    """
    p = load(spark, sf_dir, "part")
    return p.where(F.array_contains(F.split("p_type", " "), "ECONOMY")).select(
        "p_partkey", "p_name", "p_type"
    )
