"""S2 external-RDBMS source: full JDBC round-trip against an in-process
Spark Thrift Server (HiveServer2 wire protocol, bundled hive-jdbc
driver) — no external database required.

Mirrors reference backend/jdbc.py:259's role (scenario data in an
external RDBMS) with the Spark-native JDBC DataFrame source: pushdown,
column pruning, and partitioned parallel reads all come from Catalyst.
"""

from __future__ import annotations

import socket
import time

import pytest

from ixmp_spark.sources.jdbc import read_jdbc, start_thrift_server

DRIVER = "org.apache.hive.jdbc.HiveDriver"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def thrift_url(spark):
    port = _free_port()
    start_thrift_server(spark, port)
    # doubleQuotedIdentifiers: see sources/jdbc.py — Spark's JDBC source
    # emits "col" identifiers; the served Spark SQL dialect needs the
    # ANSI flag (per served session, via the URL conf section).
    url = (
        f"jdbc:hive2://localhost:{port}/default"
        "?spark.sql.ansi.doubleQuotedIdentifiers=true"
    )
    spark.sql("SELECT 1 AS ready").createOrReplaceGlobalTempView("jdbc_ready")
    deadline = time.time() + 120
    last = None
    while time.time() < deadline:
        try:
            read_jdbc(
                spark, url,
                query="SELECT ready FROM global_temp.jdbc_ready",
                driver=DRIVER,
            ).collect()
            return url
        except Exception as e:  # server still booting
            last = e
            time.sleep(2)
    pytest.skip(f"thrift server did not come up: {last}")


def test_jdbc_query_roundtrip(spark, thrift_url):
    spark.range(100).selectExpr(
        "id", "id * 2 AS doubled", "CAST(id % 3 AS STRING) AS grp"
    ).createOrReplaceGlobalTempView("jdbc_src")
    df = read_jdbc(
        spark, thrift_url,
        query="SELECT id, doubled, grp FROM global_temp.jdbc_src",
        driver=DRIVER,
    )
    assert dict(df.dtypes) == {"id": "bigint", "doubled": "bigint", "grp": "string"}
    rows = {r.id: (r.doubled, r.grp) for r in df.collect()}
    assert len(rows) == 100
    assert rows[7] == (14, "1")
    # filters evaluate on the frame (pushed into the remote SQL by the
    # JDBC source where the dialect allows)
    assert df.where("id >= 90").count() == 10


def test_jdbc_partitioned_read(spark, thrift_url):
    """The scale path: numPartitions strided connections, each executor
    pulling one [lower, upper) slice of the partition column."""
    spark.range(1000).selectExpr("id", "id % 7 AS v").createOrReplaceGlobalTempView(
        "jdbc_part_src"
    )
    df = read_jdbc(
        spark, thrift_url,
        table="global_temp.jdbc_part_src",
        driver=DRIVER,
        partition_column="id",
        bounds=(0, 1000),
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.selectExpr("sum(v) AS s").first().s == sum(i % 7 for i in range(1000))


def test_jdbc_arg_validation(spark):
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:x", table="t", query="q")
    with pytest.raises(ValueError, match="bounds"):
        read_jdbc(spark, "jdbc:x", table="t", partition_column="id")
    with pytest.raises(ValueError, match="table="):
        read_jdbc(
            spark, "jdbc:x", query="q", partition_column="id",
            bounds=(0, 1), num_partitions=2,
        )
