"""Core API: Platform / TimeSeries / Scenario (reference parity surface).

Mirrors the object hierarchy of SURVEY.md §1.1 with Spark-native storage:
data model and call signatures follow the reference; execution is Spark
DataFrames over the warehouse parquet.
"""

from ixmp_spark.core.itemtype import ItemType
from ixmp_spark.core.platform import Platform
from ixmp_spark.core.scenario import Scenario
from ixmp_spark.core.timeseries import IAMC_IDX, TimeSeries

__all__ = ["IAMC_IDX", "ItemType", "Platform", "Scenario", "TimeSeries"]
