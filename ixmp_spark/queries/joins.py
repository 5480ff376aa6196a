"""Joins (SURVEY.md §2.3 J1–J8 + as-of/star extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ixmp_spark.operators.joins import (
    asof_join,
    cascade_resolve,
    diff,
    update_anti,
    validate_members,
)
from ixmp_spark.queries import load, query


@query(
    "j1_diff_full_outer",
    oracle="""
    WITH a AS (
      SELECT c_nationkey AS nationkey, round(sum(c_acctbal), 2) AS value_a
      FROM customer GROUP BY c_nationkey
    ), b AS (
      SELECT s_nationkey AS nationkey, round(sum(s_acctbal), 2) AS value_b
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(a.nationkey, b.nationkey) AS nationkey,
           a.value_a, b.value_b,
           CASE WHEN a.value_a IS NOT NULL AND b.value_b IS NOT NULL THEN 'both'
                WHEN a.value_a IS NOT NULL THEN 'left_only'
                ELSE 'right_only' END AS _merge
    FROM a FULL OUTER JOIN b ON a.nationkey = b.nationkey
    """,
)
def j1_diff_full_outer(spark, sf_dir):
    """``ixmp.util.diff`` (J1, util/__init__.py:136–204): full outer
    equi-join of two parameters on shared dims, suffixed value columns,
    pandas-style merge indicator."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.round(F.sum("c_acctbal"), 2).alias("value")
    )
    b = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.round(F.sum("s_acctbal"), 2).alias("value")
    )
    return diff(a, b, on=["nationkey"], value_cols=["value"])


@query(
    "j2_update_anti",
    oracle="""
    SELECT DISTINCT p.o_custkey, p.o_orderpriority
    FROM orders p WHERE p.o_orderstatus = 'P'
      AND NOT EXISTS (
        SELECT 1 FROM orders f
        WHERE f.o_orderstatus = 'F'
          AND f.o_custkey = p.o_custkey
          AND f.o_orderpriority = p.o_orderpriority
      )
    """,
)
def j2_update_anti(spark, sf_dir):
    """``update_par`` add-only-missing-keys (J2, util/__init__.py:677–690)
    as a left anti-join on the composite key tuple — only (customer,
    priority) pairs not already present among finalized orders survive."""
    o = load(spark, sf_dir, "orders")
    new = (
        o.where(F.col("o_orderstatus") == "P")
        .select("o_custkey", "o_orderpriority")
        .distinct()
    )
    existing = o.where(F.col("o_orderstatus") == "F").select(
        "o_custkey", "o_orderpriority"
    )
    return update_anti(new, existing, on=["o_custkey", "o_orderpriority"])


@query(
    "j3_validate_members",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey NOT IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment <> 'MACHINERY'
    )
    """,
)
def j3_validate_members(spark, sf_dir):
    """Write-path key-membership validation (J3, base.py:1070–1074,
    jdbc.py:1311–1314): broadcast anti-join of fact rows against the index
    set; non-empty result ⇒ reject the commit. Here the 'index set' is the
    non-MACHINERY customer list, so the query returns the violations."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    idx = c.where(F.col("c_mktsegment") != "MACHINERY")
    return validate_members(
        o.select("o_orderkey", F.col("o_custkey")),
        idx,
        key_col="o_custkey",
        member_col="c_custkey",
    )


@query(
    "j4_semi_intersect",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def j4_semi_intersect(spark, sf_dir):
    """Read-path filter∩index-set (J4, jdbc.py:1191–1202): semi-join of the
    fact against the (small, broadcast) allowed-member set."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    bld = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return o.join(F.broadcast(bld), on="o_custkey", how="left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "j5_map_aggregate",
    oracle="""
    SELECT r.r_name, round(sum(c.c_acctbal), 2) AS total_bal,
           count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j5_map_aggregate(spark, sf_dir):
    """``map_as_qty``/broadcast_map (dis)aggregation (J5,
    report/operator.py:204–241): mapping-set join then group-sum. nation
    and region are codelists → both broadcast; only the customer agg
    shuffles, on the 5-value region key (map-side partial agg first)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "j8_meta_cascade",
    oracle="""
    WITH general AS (
      SELECT n_regionkey, round(avg(c_acctbal), 4) AS v
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_regionkey
    ), specific AS (
      SELECT s_nationkey AS n_nationkey, round(avg(s_acctbal), 4) AS v
      FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_nationkey, coalesce(sp.v, g.v) AS value,
           CASE WHEN sp.v IS NOT NULL THEN 'specific' ELSE 'general' END AS source
    FROM nation n
    JOIN general g ON n.n_regionkey = g.n_regionkey
    LEFT JOIN specific sp ON n.n_nationkey = sp.n_nationkey
    """,
)
def j8_meta_cascade(spark, sf_dir):
    """Meta-cascade precedence resolution (J8, base.py:1126–1135): a
    specific scope (per-nation supplier avg) overlays a general one
    (per-region customer avg), with provenance — left join + coalesce."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    general = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(F.round(F.avg("c_acctbal"), 4).alias("value"))
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")), "n_regionkey")
        .select("n_nationkey", "value")
    )
    specific = s.groupBy(F.col("s_nationkey").alias("n_nationkey")).agg(
        F.round(F.avg("s_acctbal"), 4).alias("value")
    )
    return cascade_resolve(specific, general, on=["n_nationkey"], value_col="value")


@query(
    "jx_asof_join",
    oracle="""
    SELECT event_id, last_orderkey, last_totalprice
    FROM (
      SELECT e.event_id, o.o_orderkey AS last_orderkey,
             o.o_totalprice AS last_totalprice,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def jx_asof_join(spark, sf_dir):
    """As-of join (extension — absent in the reference, SURVEY.md §2.3):
    for each event, the latest order of the same user at-or-before the
    event time. Tie-break: max orderkey (deterministic on both engines,
    unlike DuckDB's ASOF JOIN keyword whose tie choice is unspecified)."""
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    out = asof_join(
        e,
        o,
        left_id="event_id",
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        tie_break="o_orderkey",
    )
    return out.select(
        "event_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


@query(
    "b_q5_star_join",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
                   AND s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def b_q5_star_join(spark, sf_dir):
    """TPC-H Q5-shaped star join (bench headliner): fact ⋈ 5 dims with
    local-supplier constraint. customer/supplier/nation/region broadcast;
    only lineitem ⋈ orders shuffles (on orderkey). Date filter pushes to
    the orders scan before the join."""
    l = load(spark, sf_dir, "lineitem")  # noqa: E741
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey),
        )
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "j6_synonym_resolution",
    oracle="""
    WITH synonyms(alias_name, canonical) AS (
      VALUES ('AMERICA-ALT', 'AMERICA'), ('EU', 'EUROPE')
    )
    SELECT coalesce(s.canonical, r.r_name) AS region,
           count(*) AS n_nations
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN synonyms s ON r.r_name = s.alias_name
    GROUP BY 1
    """,
)
def j6_synonym_resolution(spark, sf_dir):
    """Region-synonym resolution on write (J6, platform.py:335–349):
    labels arriving via an alias map to the canonical region — left join
    on the (broadcast, codelist-sized) synonym table + coalesce."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    syn = spark.createDataFrame(
        [("AMERICA-ALT", "AMERICA"), ("EU", "EUROPE")],
        "alias_name string, canonical string",
    )
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(syn), r.r_name == syn.alias_name, "left")
        .select(F.coalesce("canonical", "r_name").alias("region"))
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@query(
    "b_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def b_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped shipping priority (bench headliner #2): selective
    dim filter broadcast into the fact join, grouped revenue, top-10 via
    TakeOrderedAndProject. Tie-break on the unique orderkey keeps the
    result set deterministic across engines."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").where(  # noqa: E741
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
    )


@query(
    "b_q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
    GROUP BY cn.n_name, sn.n_name, CAST(year(l.l_shipdate) AS INTEGER)
    """,
)
def b_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7-shaped bilateral trade volume: the nation dim joins twice
    under two aliases with an OR-pair constraint — the disjunction stays
    on the broadcast side so the fact path is still one shuffle."""
    l = load(spark, sf_dir, "lineitem")  # noqa: E741
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .where(
            ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
        )
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


@query(
    "b_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def b_q10_returned_items(spark, sf_dir):
    """TPC-H Q10-shaped returned-item revenue ranking: selective fact
    filter (returnflag) + date-sliced orders, customer rollup, top-20."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")  # noqa: E741
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
    )


@query(
    "b_q14_promo_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def b_q14_promo_share(spark, sf_dir):
    """TPC-H Q14-shaped promo revenue share: conditional aggregate ratio
    over a broadcast part join — one shuffle to a single row."""
    l = load(spark, sf_dir, "lineitem").where(  # noqa: E741
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "b_q19_disjunctive",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#14' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def b_q19_disjunctive(spark, sf_dir):
    """TPC-H Q19-shaped OR-of-ANDs predicate across both join sides —
    the disjunction can't push below the join entirely, but each
    conjunct's single-side parts do (Catalyst splits them); classic
    planner stress test."""
    l = load(spark, sf_dir, "lineitem")  # noqa: E741
    p = load(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#14") & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return j.where(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "b_q2_min_cost_supplier",
    oracle="""
    SELECT p_partkey, s_suppkey, s_acctbal
    FROM (
      SELECT p.p_partkey, s.s_suppkey, s.s_acctbal,
             row_number() OVER (
               PARTITION BY p.p_partkey
               ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE p.p_size < 10
    ) WHERE rn = 1
    """,
)
def b_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped best-supplier-per-part: the reference query's
    correlated min-subquery rewritten as a per-partition window rank —
    the decorrelation Catalyst would otherwise have to do itself."""
    p = load(spark, sf_dir, "part").where(F.col("p_size") < 10)
    l = load(spark, sf_dir, "lineitem")  # noqa: E741
    s = load(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_suppkey", "s_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "j9_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           coalesce(t.n_orders, 0) AS n_orders,
           coalesce(t.total, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY o_custkey
    ) t ON c.c_custkey = t.o_custkey
    """,
)
def j9_left_outer(spark, sf_dir):
    """Left outer join with null-coalesced aggregates: every customer
    appears, order-less ones with zeros (the read-side counterpart of
    J2's anti-join)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    t = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
    return c.join(t, c.c_custkey == t.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total", F.lit(0.0)).alias("total_spent"),
    )


@query(
    "j10_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 10.0), ('medium', 10.0, 30.0),
             ('large', 30.0, 1e9)
    )
    SELECT b.band, count(*) AS n_rows,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM lineitem l
    JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
)
def j10_band_join(spark, sf_dir):
    """Range (band) join: non-equi theta join of the fact against a tiny
    banding dimension — broadcast nested-loop with a 3-row build side
    (the only sound plan for pure inequality predicates; at scale the
    alternative is precomputing the band as a CASE column, which Catalyst
    can do here too but the operator form keeps bands data-driven)."""
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("small", 0.0, 10.0), ("medium", 10.0, 30.0), ("large", 30.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )
