"""Set operations (SURVEY.md §2.7 U1–U5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ixmp_spark.queries import load, query


@query(
    "u1_union_dedup",
    oracle="""
    SELECT nationkey, acctbal FROM (
      SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
      UNION
      SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
    )
    """,
)
def u1_union_dedup(spark, sf_dir):
    """``add_set`` idempotent-union semantics (U1, base.py:1027–1087:
    appending elements already present is a no-op) — unionByName +
    dropDuplicates."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionByName(s).dropDuplicates()


@query(
    "u2_delete_elements",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u2_delete_elements(spark, sf_dir):
    """``item_delete_elements`` key-tuple removal (U2, base.py:1090–1113)
    as a set difference: customers with finalized orders minus those with
    open ones (non-empty at every sf)."""
    o = load(spark, sf_dir, "orders")
    f = (
        o.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    op = (
        o.where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return f.exceptAll(op)


@query(
    "u3_multisheet_concat",
    oracle="""
    SELECT part_key, source_sheet FROM (
      SELECT p_partkey AS part_key, 'sheet1' AS source_sheet
      FROM part WHERE p_partkey % 2 = 0
      UNION ALL
      SELECT p_partkey AS part_key, 'sheet2' AS source_sheet
      FROM part WHERE p_partkey % 2 = 1
    )
    """,
)
def u3_multisheet_concat(spark, sf_dir):
    """Multi-sheet concat on Excel read (U3, io.py:236–248: sheets name,
    name(2), … are pd.concat'ed) — unionByName of homogeneous chunks."""
    p = load(spark, sf_dir, "part")
    s1 = p.where(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("part_key"), F.lit("sheet1").alias("source_sheet")
    )
    s2 = p.where(F.col("p_partkey") % 2 == 1).select(
        F.col("p_partkey").alias("part_key"), F.lit("sheet2").alias("source_sheet")
    )
    return s1.unionByName(s2)


@query(
    "u5_cat_mapping",
    oracle="""
    WITH catmap(cat, key) AS (
      VALUES ('america', 'NATION_1'), ('america', 'NATION_4'),
             ('europe', 'NATION_2'), ('europe', 'NATION_7'),
             ('asia', 'NATION_11')
    )
    SELECT m.cat,
           array_to_string(list_sort(list(n.n_name)), ',') AS elements,
           count(*) AS n_elements,
           count(DISTINCT n.n_regionkey) AS n_regions
    FROM catmap m JOIN nation n ON n.n_name = m.key
    GROUP BY m.cat
    """,
)
def u5_cat_mapping(spark, sf_dir):
    """Category mapping set read (U5, reference base.py:1232–1288
    cat_list/cat_get_elements): a (cat, key) mapping broadcast-joined to
    the categorized set's members, grouped per category — exactly the
    plan Scenario.cat_spark() feeds into J5-style aggregations. The
    write-path API (add_cat incl. is_unique replace-singleton) is pinned
    in tests/test_core.py.

    The ``elements`` column is a comma-joined string, not array<string>:
    declared queries must emit driver-sortable scalar columns (the
    external comparator canonicalizes with pandas sort_values, which
    cannot hash Python lists)."""
    n = load(spark, sf_dir, "nation")
    catmap = spark.createDataFrame(
        [
            ("america", "NATION_1"), ("america", "NATION_4"),
            ("europe", "NATION_2"), ("europe", "NATION_7"),
            ("asia", "NATION_11"),
        ],
        "cat string, key string",
    )
    return (
        n.join(F.broadcast(catmap), n.n_name == catmap.key)
        .groupBy("cat")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias(
                "elements"
            ),
            F.count(F.lit(1)).alias("n_elements"),
            F.countDistinct("n_regionkey").alias("n_regions"),
        )
    )
