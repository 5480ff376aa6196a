"""External RDBMS source (S2 — reference backend/jdbc.py:259,
backend/ixmp4.py:246: scenario data living in an external database).

The reference reaches external stores through a Java JDBC backend; the
Spark-native equivalent is the built-in JDBC DataFrame source — no
driver-side row loops, and with a partition column the read itself is
parallel (``numPartitions`` concurrent connections each pulling one
stride; Catalyst pushes filters and column pruning into the remote SQL).

Scale notes (100 TB posture):

- Always pass ``partition_column``/``bounds``/``num_partitions`` for
  non-trivial tables; an unpartitioned JDBC read is one connection on
  one executor.
- Filters on the partition column prune whole strides before any
  connection is opened; other filters are pushed into each stride's
  WHERE clause.
- The result is a plain DataFrame: feed it to ``add_par_bulk`` /
  ``add_timeseries_bulk`` to land external data in the warehouse through
  the normal validated commit path.

Driver availability: any JDBC driver jar on the Spark classpath works
(``spark.jars`` / ``--jars``). The test suite exercises a full
round-trip against an in-process Spark Thrift Server over the bundled
``hive-jdbc`` driver — no external database needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    bounds: tuple[int, int] | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """Read an external RDBMS table/query as a DataFrame.

    Exactly one of ``table``/``query``. With ``partition_column`` (+
    ``bounds`` + ``num_partitions``) the read fans out across executors;
    otherwise it is a single-connection read (fine for codelists, wrong
    for facts — see module docstring).
    """
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url)
    if driver:
        reader = reader.option("driver", driver)
    if table is not None:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        if bounds is None or num_partitions is None:
            raise ValueError(
                "partition_column needs bounds=(lower, upper) and "
                "num_partitions"
            )
        if query is not None:
            raise ValueError(
                "partitioned reads need table= (Spark wraps the partition "
                "predicates around dbtable)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def start_thrift_server(spark: SparkSession, port: int) -> None:
    """Start an in-process Spark Thrift Server (HiveServer2 protocol) on
    ``port``, sharing this session's catalog — the test harness for the
    JDBC source, and a way to expose warehouse tables to external BI
    tools over JDBC (the reverse S2 direction).

    Note: Spark's JDBC source quotes identifiers with double quotes
    while the served dialect is Spark SQL (backticks) — clients must pass
    ``?spark.sql.ansi.doubleQuotedIdentifiers=true`` in the hive2 URL's
    conf section so the served session parses them as identifiers.
    """
    spark.conf.set("hive.server2.thrift.port", str(port))
    spark._jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(  # noqa: E501
        spark._jsparkSession.sqlContext()
    )
