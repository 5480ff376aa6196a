"""ixmp_spark — a PySpark-native scenario-data analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the iiasa/ixmp modeling platform (see SURVEY.md), re-expressed Spark-first:
DataFrame/SQL declared plans optimized by Catalyst, long-format fact tables
partitioned for 100 TB scale, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) the reference lacks.

Layout
------
- ``session``    SparkSession builder tuned for the target cluster shape.
- ``core``       Platform / Scenario / TimeSeries API (reference parity).
- ``operators``  Reusable DataFrame operator library (filters, joins,
                 windows, dedup, similarity, text, sessionization).
- ``sources``    Readers/writers (parquet store, IAMC CSV/Excel).
- ``functions``  Scalar/column helper functions.
- ``plans``      Reporting engine: Key -> lazy DataFrame DAG.
- ``queries``    Declared query catalog (queries + DuckDB oracle SQL pairs)
                 consumed by ``__spark_entry__``.
"""

__version__ = "0.1.0"

#: reference __init__.py public surface, re-expressed (same names)
__all__ = [
    "IAMC_IDX",
    "ItemType",
    "ModelError",
    "Platform",
    "Reporter",
    "Scenario",
    "TimeSeries",
    "config",
    "log",
    "show_versions",
]


def __getattr__(name):
    # lazy re-exports (keep `import ixmp_spark` light for UDF workers)
    if name in ("Platform", "Scenario", "TimeSeries", "ItemType", "IAMC_IDX"):
        import ixmp_spark.core as core

        return getattr(core, name)
    if name == "Reporter":
        from ixmp_spark.plans import Reporter

        return Reporter
    if name == "config":
        from ixmp_spark.config import config

        return config
    if name == "ModelError":
        from ixmp_spark.core.model import ModelError

        return ModelError
    if name == "show_versions":
        from ixmp_spark.core.utils import show_versions

        return show_versions
    if name == "log":
        # configured like the reference's package logger (reference
        # ixmp/__init__.py:48-52): stdout handler + WARNING level, set
        # once on first access (idempotent across repeated lookups)
        import logging

        logger = logging.getLogger(__name__)
        if not logger.handlers:
            handler = logging.StreamHandler()
            handler.setLevel(logging.WARNING)
            logger.addHandler(handler)
            logger.setLevel(logging.WARNING)
        return logger
    raise AttributeError(name)
