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


def test_testdata_contract(sf_dir):
    """Fail LOUD and first when the driver regenerates /root/testdata
    with a different shape (it happened at the r3→r4 boundary: events.ts
    went TIMESTAMP(NANOS) → TIMESTAMP(MICROS), surfacing as dozens of
    downstream cast errors). Column names must match exactly; temporal
    columns may use any encoding `queries.load` normalizes."""
    import pyarrow.parquet as pq

    expected_cols = {
        "region": ["r_regionkey", "r_name"],
        "nation": ["n_nationkey", "n_name", "n_regionkey"],
        "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                     "c_mktsegment"],
        "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                 "p_retailprice"],
        "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                     "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"],
        "events": ["event_id", "ts", "user_id", "event_type", "value",
                   "props"],
        "documents": ["doc_id", "text", "lang", "source", "n_chars"],
        "embeddings": ["vec_id", "embedding", "label"],
    }
    temporal = {("orders", "o_orderdate"), ("lineitem", "l_shipdate"),
                ("events", "ts")}
    tolerated = ("timestamp", "date32", "date64", "int64")
    for table, cols in expected_cols.items():
        schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
        assert schema.names == cols, (
            f"DRIVER TESTDATA DRIFT in {table}: columns {schema.names} != "
            f"expected {cols} — update queries/oracles for the new shape"
        )
        for name in cols:
            t = str(schema.field(name).type)
            if (table, name) in temporal:
                assert t.startswith(tolerated), (
                    f"DRIVER TESTDATA DRIFT: {table}.{name} is {t}; "
                    "queries.load normalizes only timestamp/date/nanos-long "
                    "encodings — extend the loader"
                )
