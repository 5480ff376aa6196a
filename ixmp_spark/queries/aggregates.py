"""Aggregations (SURVEY.md §2.4 A1–A7).

Only reference-parity rows live here; extension aggregates (a5/a8/a9/
a10 twins, percentiles, rollup variants) are registered at the catalog
tail in ``extensions.py`` and the TPC-H bench headliners in ``tpch.py``
so the driver's correctness budget covers §2 core families first.
"""

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
    """IAMC wide layout (A5 on the year axis, reference
    timeseries.py:481–490): one column per pinned year — exactly how the
    engine's ``timeseries(iamc=True)`` pivots, with the year list
    declared up front so no extra distinct pass is needed. The
    returnflag-axis pivot twin (a5_pivot_wide) is in extensions.py."""
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


@query(
    "a12_histogram_fd",
    oracle="""
    WITH s AS (
      SELECT quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3,
             CAST(count(*) AS DOUBLE) AS n,
             min(value) AS lo, max(value) AS hi
      FROM events WHERE value IS NOT NULL
    ), p AS (
      SELECT e.value,
             round(2.0 * (s.q3 - s.q1) / cbrt(s.n), 6) AS h,
             s.lo, s.hi - s.lo AS sp
      FROM events e, s WHERE e.value IS NOT NULL
    ), b AS (
      SELECT CASE WHEN h <= 0 OR sp <= 0 THEN 0
                  ELSE least(CAST(floor((value - lo) / h) AS BIGINT),
                             least(CAST(ceil(sp / h) AS BIGINT),
                                   10000) - 1) END AS bin,
             lo, h, sp,
             CASE WHEN h <= 0 OR sp <= 0 THEN 1
                  ELSE least(CAST(ceil(sp / h) AS BIGINT), 10000)
             END AS nb
      FROM p
    )
    SELECT bin,
           round(min(lo + bin * (CASE WHEN nb = 1 THEN sp ELSE h END)),
                 6) AS lo,
           round(min(lo + (bin + 1)
                     * (CASE WHEN nb = 1 THEN sp ELSE h END)), 6) AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY bin
    """,
)
def a12_histogram_fd(spark, sf_dir):
    """Freedman–Diaconis histogram of event values (histogram_fd):
    the five summary scalars ride one 1-row cross-broadcast, the bin
    width rounds to 6 decimals BEFORE binning so the bin function is
    bit-identical across engines despite interpolated quantiles (the
    a8 ulp class), and the oracle restates the whole derivation."""
    from ixmp_spark.operators.sampling import histogram_fd

    ev = load(spark, sf_dir, "events")
    return histogram_fd(ev, "value")
