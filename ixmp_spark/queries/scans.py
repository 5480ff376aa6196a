"""Scans / sources (SURVEY.md §2.1 S1–S9).

The reference's storage reads (JDBC item load jdbc.py:1168–1260, ixmp4
pandas load) become parquet scans with Catalyst predicate pushdown and
column pruning — verified in tests/test_plans.py by asserting PushedFilters
and ReadSchema on the physical plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ixmp_spark.queries import load, query


@query(
    "s1_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount > 0.05
    """,
)
def s1_scan_pushdown(spark, sf_dir):
    """Projection + predicate reaching the parquet scan (S1; reference
    jdbc.py:1188–1206 pushes dim filters into Java before materializing).

    Plan check: PushedFilters carries both predicates; ReadSchema has only
    the 4 referenced columns of lineitem's 11.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_extendedprice", "l_discount")


@query(
    "s6_bulk_export",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_orderstatus,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus IN ('O', 'F')
    """,
)
def s6_bulk_export(spark, sf_dir):
    """Filtered multi-table export (S6: platform.py:197–260
    ``export_timeseries_data`` = ts_data ⋈ runs + IN filters → CSV).

    Spark shape: fact ⋈ broadcast(dim) with the filter pushed below the
    join; the write.csv sink is exercised in tests, the query here returns
    the export frame.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.where(F.col("o_orderstatus").isin("O", "F"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            "c_name",
            "o_orderstatus",
            F.year("o_orderdate").alias("o_year"),
            "o_totalprice",
        )
    )
