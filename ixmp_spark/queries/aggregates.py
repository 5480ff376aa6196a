"""Aggregations (SURVEY.md §2.4 A1–A7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ixmp_spark.queries import load, query


@query(
    "a0_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a0_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1-shaped pricing summary — grouped multi-aggregate
    with arithmetic inside the sum. Map-side partial aggregation (hash agg)
    means the shuffle carries 6 groups, not 600k rows; survives any
    scale-up since cardinality is bounded by the group domain."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "a1_partial_sums_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a1_partial_sums_cube(spark, sf_dir):
    """Partial sums over every dimension subset (A1): the Reporter
    registers, for each quantity x:t-y, sums over all dim subsets
    (reporter.py:64–69). ``cube`` computes the whole lattice in one pass
    (grouping-sets expansion, still one shuffle); per-request subsets use
    plain groupBy in plans/reporter.py."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty")
    )


@query(
    "a2_named_groups",
    oracle="""
    SELECT CASE WHEN n_name < 'J' THEN 'early' ELSE 'late' END AS name_group,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def a2_named_groups(spark, sf_dir):
    """Named-group aggregate (A2, genno ``aggregate``): map member labels
    into named groups, sum within group."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn(
            "name_group",
            F.when(F.col("n_name") < "J", F.lit("early")).otherwise(F.lit("late")),
        )
        .groupBy("name_group")
        .agg(F.round(F.sum("s_acctbal"), 2).alias("total_bal"))
    )


@query(
    "a4_describe_runs",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           max(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS last_final
    FROM orders GROUP BY o_custkey
    """,
)
def a4_describe_runs(spark, sf_dir):
    """Scenario-list describe (A4, util/__init__.py:518–542): per (model,
    scenario) → N versions, min/max, conditional max (default version) —
    same shape per customer over orders. min/max/count are exact (no
    rounding needed)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.max(F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey"))).alias(
            "last_final"
        ),
    )


@query(
    "a5_pivot_wide",
    oracle="""
    SELECT l_linestatus,
           sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_A,
           sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qty_N,
           sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qty_R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def a5_pivot_wide(spark, sf_dir):
    """Long→wide pivot (A5, timeseries.py:381–386 IAMC year-pivot). Pivot
    values are declared explicitly — at scale an unpinned pivot needs an
    extra distinct pass; the IAMC writer pins the year list the same way."""
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@query(
    "a6_weighted_rollup",
    oracle="""
    SELECT p.p_brand,
           round(sum(l.l_quantity * p.p_retailprice), 2) AS weighted_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def a6_weighted_rollup(spark, sf_dir):
    """Duration-weighted rollup (A6, platform.py:356–361: subannual→annual
    via timeslice ``duration`` weights): join the weight table (broadcast —
    it's a codelist) and sum(value * weight)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_quantity") * F.col("p_retailprice")), 2).alias(
                "weighted_qty"
            )
        )
    )


@query(
    "a7_unit_guard",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           count(DISTINCT value) AS n_distinct_values
    FROM events GROUP BY event_type
    """,
)
def a7_unit_guard(spark, sf_dir):
    """Unit-consistency guard (A7, report/operator.py:114–127: a quantity
    with >1 distinct unit is discarded as 'mixed units') — countDistinct
    per group is the declarative check."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("value").alias("n_distinct_values"),
    )


@query(
    "a3_group_sum",
    oracle="""
    SELECT l_returnflag, sum(l_quantity) AS sum_qty,
           count(DISTINCT l_linestatus) AS n_status
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a3_group_sum(spark, sf_dir):
    """``group_sum`` (A3, genno): sum over one dimension within groups of
    another — groupBy(group).agg(sum) with the summed dim projected away
    before the shuffle (column pruning keeps the exchange narrow)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.countDistinct("l_linestatus").alias("n_status"),
    )


@query(
    "b_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def b_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped forecast revenue: pure scan-filter-aggregate — the
    pushdown stress test (all four predicates must reach the parquet scan;
    no shuffle except the single-row final agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "b_q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, t.total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    ) t ON o.o_orderkey = t.l_orderkey
    """,
)
def b_q18_large_orders(spark, sf_dir):
    """TPC-H Q18-shaped large-volume orders: aggregate + HAVING
    (post-aggregation filter) + join back to the order dimension; the
    HAVING filter shrinks the aggregated side before the join shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "o_totalprice", "total_qty"
    )


@query(
    "a8_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def a8_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (extension surface): both
    engines implement the same continuous-quantile definition so the
    values hash-match. The approximate sketch variant (scale path: fixed
    memory, mergeable) is x1_sketches."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "a9_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def a9_rollup(spark, sf_dir):
    """Hierarchical rollup (region → nation → grand total) — the
    drill-down companion of a1's cube; one shuffle via grouping-sets
    expansion."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query("x1_sketches")  # no SQL oracle: sketch internals are engine-specific
def x1_sketches(spark, sf_dir):
    """Approximate sketch aggregates — the fixed-memory, mergeable scale
    path for distinct counts and quantiles (HLL++ / KLL-style): at 100 TB
    exact countDistinct shuffles every distinct value, a sketch ships a
    few KB per partition. Rows-only check; accuracy bounds are asserted
    in unit tests against the exact values."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
            "approx_median_price"
        ),
    )


@query(
    "a10_grouping_flag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a10_grouping_flag(spark, sf_dir):
    """CUBE with GROUPING() indicator columns — disambiguates real NULL
    group labels from subtotal rows (the lattice metadata the Reporter's
    partial-sum keys encode structurally)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.sum("l_quantity").alias("sum_qty"),
    )


@query(
    "a11_iamc_year_pivot",
    oracle="""
    SELECT o_custkey,
           round(sum(CASE WHEN year(o_orderdate) = 1996 THEN o_totalprice END), 2) AS y1996,
           round(sum(CASE WHEN year(o_orderdate) = 1997 THEN o_totalprice END), 2) AS y1997,
           round(sum(CASE WHEN year(o_orderdate) = 1998 THEN o_totalprice END), 2) AS y1998
    FROM orders GROUP BY o_custkey
    """,
)
def a11_iamc_year_pivot(spark, sf_dir):
    """IAMC wide layout (A5 twin on the year axis, reference
    timeseries.py:481–490): one column per pinned year — exactly how the
    engine's ``timeseries(iamc=True)`` pivots, with the year list
    declared up front so no extra distinct pass is needed."""
    o = load(spark, sf_dir, "orders")
    out = (
        o.withColumn("y", F.year("o_orderdate"))
        .groupBy("o_custkey")
        .pivot("y", [1996, 1997, 1998])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return out.select(
        "o_custkey",
        F.col("1996").alias("y1996"),
        F.col("1997").alias("y1997"),
        F.col("1998").alias("y1998"),
    )
