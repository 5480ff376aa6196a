"""Reporting engine: named, dimensioned quantities as a lazy DataFrame DAG
(SURVEY.md §2.10 X1–X3, §3.2)."""

from ixmp_spark.plans.reporter import Key, Reporter

__all__ = ["Key", "Reporter"]
