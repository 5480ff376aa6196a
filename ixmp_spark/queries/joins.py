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
    "jx2_asof_forward",
    oracle="""
    SELECT event_id, next_orderkey, next_totalprice
    FROM (
      SELECT e.event_id, o.o_orderkey AS next_orderkey,
             o.o_totalprice AS next_totalprice,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      FROM (SELECT event_id, user_id,
                   ts - INTERVAL 29 YEAR AS ts FROM events) e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
    ) WHERE rn = 1
    """,
)
def jx2_asof_forward(spark, sf_dir):
    """Forward as-of join (merge_asof direction='forward'): for each
    event, the EARLIEST order of the same user at-or-after the event
    time; ties broken by min orderkey. Same union–sort–carry plan as
    jx, with the sort direction flipped — one shuffle, no candidate
    explosion."""
    # events are 2024, TPC-H orders 1992-98: shift the probe times 29
    # years back (identically in the oracle) so forward matches exist
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 29 YEARS")
    )
    o = load(spark, sf_dir, "orders")
    out = asof_join(
        e, o,
        left_id="event_id", left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate", tie_break="o_orderkey",
        direction="forward",
    )
    return out.select(
        "event_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )


@query(
    "jx3_asof_nearest",
    oracle="""
    SELECT event_id, near_orderkey, dist_s
    FROM (
      SELECT e.event_id, o.o_orderkey AS near_orderkey,
             round(abs(epoch(CAST(o.o_orderdate AS TIMESTAMP)) - epoch(e.ts)), 1) AS dist_s,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch(CAST(o.o_orderdate AS TIMESTAMP)) - epoch(e.ts)) ASC,
                        CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END ASC,
                        CASE WHEN o.o_orderdate <= e.ts
                             THEN -o.o_orderkey ELSE o.o_orderkey END ASC
             ) AS rn
      FROM (SELECT event_id, user_id,
                   ts - INTERVAL 29 YEAR AS ts FROM events) e
      JOIN orders o
        ON o.o_custkey = e.user_id
       AND abs(epoch(CAST(o.o_orderdate AS TIMESTAMP)) - epoch(e.ts)) <= 7776000
    ) WHERE rn = 1
    """,
)
def jx3_asof_nearest(spark, sf_dir):
    """Nearest as-of join with tolerance (merge_asof
    direction='nearest', tolerance=90 days): whichever of the
    latest-before / earliest-after order is closer in time, exact-tie
    distances preferring backward, matches farther than 90 days
    dropped. Event times shift 29 years back (identically in both
    engines) so they land inside the TPC-H date range. The oracle states the selection as one explicit ranking
    (distance, then direction, then the direction's own tie rule);
    both engines measure distance in double epoch seconds."""
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 29 YEARS")
    )
    o = load(spark, sf_dir, "orders")
    out = asof_join(
        e, o,
        left_id="event_id", left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate", tie_break="o_orderkey",
        direction="nearest", tolerance_seconds=7_776_000,
    )
    return out.select(
        "event_id",
        F.col("o_orderkey").alias("near_orderkey"),
        F.round(
            F.abs(
                F.col("o_orderdate").cast("timestamp").cast("double")
                - F.col("ts").cast("timestamp").cast("double")
            ),
            1,
        ).alias("dist_s"),
    )


@query(
    "j13_fuzzy_join",
    oracle="""
    SELECT a.p_partkey AS left_id, b.p_partkey AS right_id,
           CAST(levenshtein(a.p_name, b.name) AS BIGINT) AS edit_distance
    FROM part a
    JOIN (
      SELECT p_partkey, substr(p_name, 1, 2) || substr(p_name, 4) AS name
      FROM part
    ) b ON levenshtein(a.p_name, b.name) <= 1
    """,
)
def j13_fuzzy_join(spark, sf_dir):
    """Fuzzy key join within Levenshtein 1 (fuzzy_key_join): part names
    matched against a deterministically perturbed copy (3rd character
    deleted, identically in both engines), so every original must find
    its perturbation and the ambiguous near-collisions TPC-H-ish name
    vocabularies produce are adjudicated by exact verify. The oracle is
    the brute-force DEFINITION (cross join + levenshtein filter) —
    quadratic there, which is exactly what the deletion-neighborhood
    blocking exists to avoid; the driver hash proves blocked ≡ brute."""
    from ixmp_spark.operators.joins import fuzzy_key_join

    p = load(spark, sf_dir, "part")
    left = p.select("p_partkey", "p_name")
    right = p.select(
        F.col("p_partkey"),
        F.concat(
            F.substring("p_name", 1, 2),
            F.expr("substring(p_name, 4)"),
        ).alias("name"),
    )
    return fuzzy_key_join(left, right, "p_name", "name").select(
        F.col("p_partkey").alias("left_id"),
        F.col("p_partkey_r").alias("right_id"),
        "edit_distance",
    )


@query(
    "j15_fd_violations",
    oracle="""
    SELECT o_orderkey, CAST(2 AS BIGINT) AS n_variants
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def j15_fd_violations(spark, sf_dir):
    """Functional-dependency check (fd_violations) on an
    orderkey→custkey association with planted corruption: every 97th
    order re-enters the feed with a shifted customer, so the violator
    set — and nothing else — must surface with exactly 2 variants.
    The oracle states that expected set ANALYTICALLY (it never runs a
    groupBy), so both the detector and its negative space (clean keys
    stay silent) are hash-covered."""
    from ixmp_spark.operators.joins import fd_violations

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    corrupted = o.where(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_custkey", F.col("o_custkey") + 1
    )
    feed = o.unionByName(corrupted)
    return fd_violations(feed, ["o_orderkey"], ["o_custkey"])


@query(
    "j16_temporal_join",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                THEN round(c_acctbal, 2)
                ELSE round(c_acctbal + 100, 2) END AS acctbal_asof,
           CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                THEN '1992-01-01' ELSE '1995-01-01' END AS version_from
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def j16_temporal_join(spark, sf_dir):
    """Effective-dated join (temporal_join) of orders against a
    two-version customer history (v1 1992→1995, v2 1995→open, balance
    +100): each order must pick the version valid at its order date.
    The oracle never joins intervals — it states the expected version
    per order with a plain date CASE — so boundary semantics (the
    half-open cut at exactly 1995-01-01) and join fan-out bugs are
    both hash-covered."""
    from ixmp_spark.operators.joins import temporal_join

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer")
    v1 = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.lit("1995-01-01").cast("timestamp").alias("valid_to"),
    )
    v2 = c.select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal") + 100).alias("bal"),
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    j = temporal_join(o, dim, "o_custkey", "k", "o_orderdate")
    return j.select(
        "o_orderkey", "o_custkey",
        F.round("bal", 2).alias("acctbal_asof"),
        F.date_format("valid_from", "yyyy-MM-dd").alias("version_from"),
    )


@query(
    "j18_scd2_consistency",
    oracle="""
    SELECT c_custkey, '2000-01-01' AS valid_from,
           'overlap' AS reasons
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, '2000-01-01', 'gap'
    FROM customer WHERE c_custkey % 7 = 1
    UNION ALL
    SELECT c_custkey, '2000-01-01', 'multiple_current'
    FROM customer WHERE c_custkey % 7 = 2
    UNION ALL
    SELECT c_custkey, '2001-01-01', 'multiple_current'
    FROM customer WHERE c_custkey % 7 = 2
    UNION ALL
    SELECT c_custkey, '2005-01-01', 'inverted'
    FROM customer WHERE c_custkey % 7 = 3
    """,
)
def j18_scd2_consistency(spark, sf_dir):
    """SCD2 history audit (scd2_consistency) over a customer history
    with four violation strata planted analytically — an overlapping
    predecessor, a coverage gap, a second open row, an inverted
    interval — and three clean strata that must stay silent. The
    oracle states the EXPECTED violation rows and reasons outright
    (it never replays the window logic), so both the detectors and
    their negative space are hash-certified."""
    from ixmp_spark.operators.versioning import scd2_consistency

    c = load(spark, sf_dir, "customer").select("c_custkey")
    k = F.col("c_custkey")
    d = lambda s: F.lit(s).cast("date")  # noqa: E731
    base = c.select(
        k, d("2000-01-01").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    overlap = c.where(k % 7 == 0).select(
        k, d("1999-01-01").alias("valid_from"),
        d("2000-06-01").alias("valid_to"), F.lit(False).alias("is_current"),
    )
    gap = c.where(k % 7 == 1).select(
        k, d("1998-01-01").alias("valid_from"),
        d("1999-06-01").alias("valid_to"), F.lit(False).alias("is_current"),
    )
    second_open = c.where(k % 7 == 2).select(
        k, d("2001-01-01").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    inverted = c.where(k % 7 == 3).select(
        k, d("2005-01-01").alias("valid_from"),
        d("2004-01-01").alias("valid_to"), F.lit(False).alias("is_current"),
    )
    hist = base.unionByName(overlap).unionByName(gap).unionByName(
        second_open
    ).unionByName(inverted)
    out = scd2_consistency(hist, ["c_custkey"])
    return out.select(
        "c_custkey",
        F.col("valid_from").cast("string").alias("valid_from"),
        "reasons",
    )
