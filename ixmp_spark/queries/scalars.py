"""Scalar / column functions (SURVEY.md §2.8 C1–C10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ixmp_spark.functions.columns import iamc_key, year_of
from ixmp_spark.queries import load, query


@query(
    "c7_key_assembly",
    oracle="""
    SELECT concat_ws('|', CAST(l_orderkey AS VARCHAR),
                          CAST(l_linenumber AS VARCHAR)) AS key,
           l_quantity AS value
    FROM lineitem
    WHERE l_orderkey < 100
    """,
)
def c7_key_assembly(spark, sf_dir):
    """Key-tuple assembly (C7, scenario.py:719–724: add_par builds the key
    column from idx-name columns as str): dimension columns → canonical
    string key. The engine's fact tables store ``key array<string>``; the
    flattened concat_ws form is used for hashing/equality."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") < 100).select(
        iamc_key("l_orderkey", "l_linenumber").alias("key"),
        F.col("l_quantity").alias("value"),
    )


@query(
    "c2_iamc_layout",
    oracle="""
    SELECT lower(event_type) AS variable,
           coalesce(nullif(props, ''), 'Year') AS subannual,
           CAST(user_id AS VARCHAR) AS region,
           value
    FROM events WHERE event_id < 500
    """,
)
def c2_iamc_layout(spark, sf_dir):
    """``to_iamc_layout`` normalization (C2, util/__init__.py:411–452):
    lowercase variable names, default ``subannual='Year'`` when missing,
    string-typed region labels."""
    ev = load(spark, sf_dir, "events")
    return ev.where(F.col("event_id") < 500).select(
        F.lower("event_type").alias("variable"),
        F.coalesce(
            F.nullif(F.col("props"), F.lit("")), F.lit("Year")
        ).alias("subannual"),
        F.col("user_id").cast("string").alias("region"),
        "value",
    )


@query(
    "c3_year_validate",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           (TRY_CAST(o_orderpriority AS INTEGER) IS NOT NULL) AS priority_is_int
    FROM orders WHERE o_orderkey < 500
    """,
)
def c3_year_validate(spark, sf_dir):
    """``year_list``/``check_year`` int-castability validation (C3,
    util/__init__.py:455–464): try_cast-style null-on-failure probing."""
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        year_of("o_orderdate").alias("year"),
        F.col("o_orderpriority").try_cast("int").isNotNull().alias("priority_is_int"),
    )


@query(
    "c9_string_cleaning",
    oracle=r"""
    SELECT p_partkey,
           lower(p_name) AS clean_name,
           regexp_replace(p_name, '[^A-Za-z0-9]+', '-', 'g') AS path_safe,
           regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
           length(p_name) AS name_len
    FROM part
    """,
)
def c9_string_cleaning(spark, sf_dir):
    """String cleaning (C9, model/base.py:41–44 ``clean_path`` invalid-char
    substitution; C6 dim-rename is tested in tests/test_core.py): lower,
    regexp_replace, regexp_extract, length — all JVM-side codegen'd."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("clean_name"),
        F.regexp_replace("p_name", "[^A-Za-z0-9]+", "-").alias("path_safe"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "c10_numeric_guards",
    oracle="""
    SELECT event_id, value
    FROM events
    WHERE NOT isnan(value) AND value NOT IN ('Infinity'::DOUBLE, '-Infinity'::DOUBLE)
      AND value > 0
    """,
)
def c10_numeric_guards(spark, sf_dir):
    """Numeric guards (C10): the reference rejects ±inf (Oracle driver,
    jdbc.py:969–976) and drops NaN on TS write (timeseries.py:414) — here
    a declarative finite-and-positive filter."""
    ev = load(spark, sf_dir, "events")
    return ev.where(
        ~F.isnan("value")
        & ~F.col("value").isin(float("inf"), float("-inf"))
        & (F.col("value") > 0)
    ).select("event_id", "value")
