"""Every declared query runs and (where an oracle exists) hash-matches the
DuckDB oracle at the smoke scale — the same gate the driver applies at
sf0.01 (SURVEY.md §5 strategy: declared queries vs oracle)."""

from __future__ import annotations

import duckdb
import pytest

from ixmp_spark.queries import ORACLES, QUERIES
from tools.check_parity import TABLES, norm_frame, value_hash


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, sf_dir, oracle_con):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract: must at least execute
        return
    odf = oracle_con.execute(ORACLES[name]).fetchdf()
    a, b = norm_frame(sdf), norm_frame(odf)
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    assert list(a.columns) == list(b.columns)
    assert [str(t) for t in a.dtypes] == [str(t) for t in b.dtypes]
    assert value_hash(a) == value_hash(b)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
