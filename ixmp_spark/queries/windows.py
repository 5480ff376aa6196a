"""Window functions & sorts/limits (SURVEY.md §2.5 W1–W4, §2.6 O1–O3)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ixmp_spark.operators.versioning import chunk_index, next_version
from ixmp_spark.queries import load, query


@query(
    "w1_default_version",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date,
           o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def w1_default_version(spark, sf_dir):
    """Default-version resolution (W1, base.py:566–569: default flag else
    max version per (model, scenario)) — latest order per customer via
    row_number over (date desc, key desc)."""
    o = load(spark, sf_dir, "orders")
    # o_orderdate plays the version role; o_orderkey breaks ties.
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "order_date"
            ),
            "o_totalprice",
        )
    )


@query(
    "w2_next_version",
    oracle="""
    SELECT o_custkey, max(o_orderkey) + 1 AS next_version
    FROM orders GROUP BY o_custkey
    """,
)
def w2_next_version(spark, sf_dir):
    """Clone version assignment (W2, scenario.py:879–884): next free
    version = max + 1 per group."""
    o = load(spark, sf_dir, "orders")
    return next_version(o, keys=["o_custkey"], version_col="o_orderkey")


@query(
    "w3_running_total",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
    """,
)
def w3_running_total(spark, sf_dir):
    """Analytic frame-spec window (extension surface per SURVEY.md §2.5):
    per-user running sum + sequence number, ordered by (ts, event_id) so
    the frame — and therefore the float accumulation order — is total and
    deterministic on both engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@query(
    "w4_sheet_chunks",
    oracle="""
    SELECT chunk, count(*) AS n_rows, min(o_orderkey) AS first_key
    FROM (
      SELECT CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 1000)
             AS BIGINT) AS chunk, o_orderkey
      FROM orders
    ) GROUP BY chunk
    """,
)
def w4_sheet_chunks(spark, sf_dir):
    """Excel sheet-splitting chunk assignment (W4, io.py:128–139:
    EXCEL_MAX_ROWS rows per sheet → sheets name, name(2), …)."""
    o = load(spark, sf_dir, "orders")
    chunked = chunk_index(o, order_by=["o_orderkey"], chunk_size=1000)
    return chunked.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_rows"), F.min("o_orderkey").alias("first_key")
    )


@query(
    "o1_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def o1_topk(spark, sf_dir):
    """Top-k (§2.6; absent in reference, built-in here): orderBy+limit
    compiles to TakeOrderedAndProject — per-partition heap then k-merge on
    the driver, no global sort. Tie-break on the unique key makes the
    result set deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )
