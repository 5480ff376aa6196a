"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the declared catalog from
``ixmp_spark.queries`` — one entry per implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extension surface), each paired with
DuckDB oracle SQL unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from ixmp_spark.queries import QUERIES

    return QUERIES["a0_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ixmp_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ixmp_spark.queries import ORACLES

    return dict(ORACLES)
