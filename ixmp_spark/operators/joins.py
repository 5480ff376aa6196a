"""Join operators (SURVEY.md §2.3 J1–J8 + as-of extension).

All joins are declared DataFrame joins so Catalyst picks the physical
strategy; small sides are explicitly broadcast where the data model
guarantees smallness (codelists, index sets, mapping tables).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def diff(
    a: DataFrame,
    b: DataFrame,
    on: Sequence[str],
    value_cols: Sequence[str],
    indicator: str = "_merge",
) -> DataFrame:
    """``ixmp.util.diff`` (J1, reference util/__init__.py:136–204): full
    outer equi-join on the dimension columns with ``_a``/``_b`` suffixed
    value columns and a pandas-style merge-indicator column.

    Scale note: a full outer join shuffles both sides on ``on`` — unless
    both inputs are bucketed scans whose bucket key is a subset of
    ``on`` (the warehouse's fact layout buckets by ``key``;
    ``Scenario.diff_par`` joins on that raw key and runs exchange-free,
    pinned by tests/test_warehouse_bucketed.py). On exploded dim columns
    the bucket distribution is invisible to Catalyst, so prefer the
    raw-key path for fact-table diffs at scale.
    """
    la = a.select(*on, *[F.col(c).alias(f"{c}_a") for c in value_cols])
    lb = b.select(*on, *[F.col(c).alias(f"{c}_b") for c in value_cols])
    av, bv = f"{value_cols[0]}_a", f"{value_cols[0]}_b"
    joined = la.join(lb, on=list(on), how="full_outer")
    return joined.withColumn(
        indicator,
        F.when(F.col(av).isNotNull() & F.col(bv).isNotNull(), F.lit("both"))
        .when(F.col(av).isNotNull(), F.lit("left_only"))
        .otherwise(F.lit("right_only")),
    )


def update_anti(new: DataFrame, existing: DataFrame, on: Sequence[str]) -> DataFrame:
    """``update_par`` add-missing-keys semantics (J2, util/__init__.py:677–690):
    keep only rows of ``new`` whose key tuple is absent from ``existing``."""
    return new.join(existing.select(*on), on=list(on), how="left_anti")


def validate_members(
    data: DataFrame, index_set: DataFrame, key_col: str, member_col: str
) -> DataFrame:
    """Write-path key validation (J3, base.py:1070–1074): rows whose key is
    NOT a member of its index set — must be empty before commit. Index sets
    are codelist-sized → broadcast anti-join, no shuffle of ``data``."""
    members = F.broadcast(index_set.select(F.col(member_col).alias(key_col)).distinct())
    return data.join(members, on=key_col, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    tie_break: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join (extension; SURVEY.md §2.3 notes the reference lacks it):
    for each left row (uniquely identified by ``left_id``), the latest
    right row with equal key and ``right_time <= left_time``; ties broken
    by max ``tie_break``. Inner semantics: left rows with no qualifying
    right row are dropped.

    ``direction`` (pandas ``merge_asof`` parity):

    - ``"backward"`` (default): latest right row at-or-before, max
      ``tie_break`` at equal times;
    - ``"forward"``: earliest right row at-or-after, min ``tie_break``
      at equal times (the mirror image);
    - ``"nearest"``: whichever of the two is closer in time; exact-tie
      distances prefer backward. Requires time-typed columns (the
      distance is computed in epoch seconds).

    ``tolerance_seconds``: drop matches farther than this from the left
    time (post-selection filter — the selected row IS the nearest in
    the chosen direction, so filtering it equals bounding the search).
    Requires time-typed columns.

    Implementation — union–sort–carry-forward, the fan-out-free plan:
    both sides union into one stream tagged (key, time, side), sorted per
    key by (time, side, tie_break) with right rows before left rows at
    equal time (inclusive bound); a running ``last(right_struct,
    ignorenulls)`` window carries the latest right row forward onto each
    left row. ONE shuffle on the key and one sort — no equi-join whose
    per-left-row candidate set can explode (the old plan joined every
    left row to ALL earlier right rows of its key before ranking: n·m
    pairs per key; this plan is n+m log(n+m) per key), and no second
    shuffle on left_id. Hot keys are a sort, not a blow-up; AQE handles
    partition-level skew. ``forward`` flips the sort direction;
    ``nearest`` runs BOTH carry windows over the one keyed partitioning
    (two Sort operators, still ONE Exchange) and picks per left row."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    rstruct = F.struct(*[right[c] for c in right.columns]).alias("__r")
    lstruct = F.struct(*[left[c] for c in left.columns]).alias("__l")
    r = right.select(
        right[right_on].alias("__k"),
        right[right_time].alias("__t"),
        F.lit(0).alias("__side"),
        right[tie_break].alias("__tie"),
        rstruct,
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{f.name}`:{f.dataType.simpleString()}"
                for f in left.schema.fields
            ) + ">"
        ).alias("__l"),
    )
    lf = left.select(
        left[left_on].alias("__k"),
        left[left_time].alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(dict(right.dtypes)[tie_break]).alias("__tie"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{f.name}`:{f.dataType.simpleString()}"
                for f in right.schema.fields
            ) + ">"
        ).alias("__r"),
        lstruct,
    )
    # backward: ascending time, right before left at equal t, last-seen
    # right = max (time, tie). forward: descending time, right before
    # left at equal t, descending tie so last-seen = min (time, tie).
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").desc(), F.col("__side").asc(), F.col("__tie").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = r.unionByName(lf)
    t_sec = F.col("__t").cast("timestamp").cast("double")

    def _rt_sec(carried):
        return carried[right_time].cast("timestamp").cast("double")

    if direction == "backward":
        merged = merged.withColumn(
            "__carried", F.last("__r", ignorenulls=True).over(wb)
        )
    elif direction == "forward":
        merged = merged.withColumn(
            "__carried", F.last("__r", ignorenulls=True).over(wf)
        )
    else:  # nearest: both carries over the SAME keyed partitioning
        merged = (
            merged.withColumn("__b", F.last("__r", ignorenulls=True).over(wb))
            .withColumn("__f", F.last("__r", ignorenulls=True).over(wf))
        )
        db = F.abs(t_sec - _rt_sec(F.col("__b")))
        df_ = F.abs(_rt_sec(F.col("__f")) - t_sec)
        merged = merged.withColumn(
            "__carried",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(db <= df_, F.col("__b"))  # exact-tie distance → backward
            .otherwise(F.col("__f")),
        )
    out = merged.where((F.col("__side") == 1) & F.col("__carried").isNotNull())
    if tolerance_seconds is not None:
        out = out.where(
            F.abs(t_sec - _rt_sec(F.col("__carried"))) <= tolerance_seconds
        )
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__carried.{c}").alias(c) for c in right.columns],
    )


def cascade_resolve(
    specific: DataFrame,
    general: DataFrame,
    on: Sequence[str],
    value_col: str,
    source_names: tuple[str, str] = ("specific", "general"),
) -> DataFrame:
    """Meta-cascade precedence (J8, base.py:1126–1135): overlay the more
    specific scope over the general one — left join + coalesce, with a
    provenance column. N-level cascades fold this pairwise from most to
    least specific."""
    sp = specific.select(*on, F.col(value_col).alias("__v_spec"))
    ge = general.select(*on, F.col(value_col).alias("__v_gen"))
    return (
        ge.join(sp, on=list(on), how="left")
        .select(
            *on,
            F.coalesce("__v_spec", "__v_gen").alias(value_col),
            F.when(F.col("__v_spec").isNotNull(), F.lit(source_names[0]))
            .otherwise(F.lit(source_names[1]))
            .alias("source"),
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval (containment) join that stays a HASH join at any
    scale. A raw ``p.ts BETWEEN i.start AND i.end`` predicate with no
    equality key gives Catalyst nothing to hash on, so large×large plans
    degenerate to BroadcastNestedLoopJoin / CartesianProduct — the
    classic range-join scale killer (Databricks ships a dedicated hint
    for it; open-source Spark has nothing built in).

    The standard bucketization decomposition, exact: each interval is
    exploded to the time buckets it covers (``sequence`` of
    ``floor(epoch/bucket)`` — map-side, no Python), points map to their
    single bucket, the join becomes an equi-join on (bucket, *extra_on)
    with the BETWEEN predicate as a post-filter. A (point, interval)
    pair can meet in at most one bucket — the point's own — so no
    dedup pass is needed.

    Cost model: the interval side is replicated ``len/bucket + 1`` times
    (``bucket_seconds`` ≈ the typical interval length keeps the factor
    ≈ 2); the shuffle is hash-partitioned on bucket values, so time
    skew follows data skew, not join-shape skew. Output: every point
    row + every matched interval's columns (inner semantics; points in
    no interval drop out).

    Columns shared by both inputs must be disambiguated by the caller
    (select/alias first), as with any join."""
    pb = F.floor(
        F.col(ts_col).cast("double") / F.lit(float(bucket_seconds))
    ).cast("long")
    ib_first = F.floor(
        F.col(start_col).cast("double") / F.lit(float(bucket_seconds))
    ).cast("long")
    ib_last = F.floor(
        F.col(end_col).cast("double") / F.lit(float(bucket_seconds))
    ).cast("long")
    p = points.withColumn("__bk", pb)
    # Malformed intervals (end < start) must emit NO candidate rows:
    # Spark's sequence(first, last) auto-steps -1 when last < first, so a
    # badly corrupt end (e.g. epoch 0) would explode a huge DESCENDING
    # bucket list that only the post-filter removes — rows the shuffle
    # already paid for. Guard to an empty array instead.
    iv = intervals.withColumn(
        "__bk",
        F.explode(
            F.when(ib_last >= ib_first, F.sequence(ib_first, ib_last))
            .otherwise(F.array().cast("array<long>"))
        ),
    )
    on = ["__bk", *extra_on]
    return (
        p.join(iv, on)
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bk")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str],
    right_cols: tuple[str, str],
    bucket_seconds: int,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Interval×interval OVERLAP join (``a.start <= b.end AND b.start <=
    a.end``) that stays a hash join — ``range_join``'s two-sided sibling,
    same motivation: no equality key ⇒ stock Spark plans a nested-loop.

    Both sides explode to their covered time buckets and equi-join on
    the bucket. Unlike the point case, an overlapping pair shares SEVERAL
    buckets; instead of a dedup shuffle, each pair is emitted exactly
    once with the standard first-shared-bucket guard: keep the match
    only where the join bucket equals ``max(first_bucket(a),
    first_bucket(b))`` — every overlapping pair has exactly one such
    bucket, and non-overlapping same-bucket pairs are removed by the
    overlap post-filter. Cost model matches range_join: each side
    replicated ``len/bucket + 1`` times; no global operator anywhere.

    ``left_cols`` / ``right_cols`` = (start, end) column names; shared
    names must be disambiguated by the caller."""
    ls, le = left_cols
    rs, re_ = right_cols

    def buckets(df, s, e):
        first = F.floor(
            F.col(s).cast("double") / F.lit(float(bucket_seconds))
        ).cast("long")
        last = F.floor(
            F.col(e).cast("double") / F.lit(float(bucket_seconds))
        ).cast("long")
        # Same end<start guard as range_join: corrupt intervals emit no
        # candidate buckets rather than a descending-sequence explosion.
        return df.withColumn("__first", first).withColumn(
            "__bk",
            F.explode(
                F.when(last >= first, F.sequence(first, last))
                .otherwise(F.array().cast("array<long>"))
            ),
        )

    lb = buckets(left, ls, le).withColumnRenamed("__first", "__lfirst")
    rb = buckets(right, rs, re_).withColumnRenamed("__first", "__rfirst")
    on = ["__bk", *extra_on]
    return (
        lb.join(rb, on)
        .where(
            (F.col("__bk") == F.greatest("__lfirst", "__rfirst"))
            & (F.col(ls) <= F.col(re_))
            & (F.col(rs) <= F.col(le))
        )
        .drop("__bk", "__lfirst", "__rfirst")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iter: int = 40,
    tol: float | None = 1e-6,
    checkpoint_dir: str | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over an arbitrary directed edge frame — the standard
    centrality signal for source/domain quality in web-scale corpus
    curation (spam networks and boilerplate farms form dense low-rank
    neighborhoods; crawl frontier prioritization ranks by it).

    Power iteration, Pregel-shaped: per round, each node's rank splits
    evenly over its out-edges (one join ranks⋈edges on src + one
    groupBy dst), then ``rank' = (1-d)/n + d·(inflow + dangling/n)``
    with dangling mass (rank parked on nodes without out-edges)
    redistributed uniformly — the classic stochastic-matrix patch, so
    ranks sum to 1 every round. Convergence = L1 delta < ``tol``
    (one scalar per round to the driver, like dedup_clusters' changed
    count); raises if ``max_iter`` rounds don't converge. ``tol=None``
    runs exactly ``max_iter`` rounds with NO per-round delta join —
    the fixed-budget mode for bounded-cost pipelines. (Measured and
    rejected: batching 3 lazy rounds per checkpoint — the folded plan's
    compile cost exceeded the saved job overhead, 10.6 s vs 8.5 s for
    5 rounds on a 1.6k-node graph. Per-round checkpointing also keeps
    worst-case recompute bounded on executor loss.)

    Scale discipline (the iterative-operator lessons this repo keeps
    re-learning): edges + out-degrees persist once; ranks are
    checkpointed EVERY round (``localCheckpoint`` by default,
    reliable ``checkpoint(dir)`` for executor-churn clusters) so the
    plan never accumulates O(rounds) lineage; per-round driver traffic
    is two scalars. Each round is one shuffle join on src + one
    keyed aggregation on dst over (node, 8 B rank) — the frame the
    cluster iterates on is node-sized, never edge-payload-sized.

    Output: (node, rank), ranks summing to 1.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint()

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    # weighted form (weight_col): rank flows proportionally to edge
    # weight instead of evenly — with damping→1 this is the power
    # iteration for the stationary distribution of the weighted Markov
    # chain (duplicate edges merge by SUMMING weight); unweighted
    # edges carry weight 1.0, making the classic form the special case
    # (multiplying a share by literal 1.0 is an IEEE identity, so the
    # unweighted path is bit-identical to the pre-weight operator)
    if weight_col is not None:
        e = (
            edges.select(
                F.col(src_col).alias("__s"),
                F.col(dst_col).alias("__d"),
                F.col(weight_col).cast("double").alias("__w"),
            )
            .groupBy("__s", "__d")
            .agg(F.sum("__w").alias("__w"))
            .persist()
        )
    else:
        e = edges.select(
            F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
        ).distinct().withColumn("__w", F.lit(1.0)).persist()
    m = e.count()
    # one explode pass over the cached edges instead of two scans (r15)
    nodes = (
        e.select(F.explode(F.array("__s", "__d")).alias("node"))
        .distinct()
        .persist()
    )
    n = nodes.count()
    # right-size the iteration's parallelism to the graph: a small
    # graph on a default-partitioned session otherwise pays 10-100x
    # its compute in task overhead PER ROUND (measured: 1.7 s/round
    # for a 1.6k-node graph at 64 shuffle partitions, ~0.3 s at 4)
    parts = max(1, min(
        edges.sparkSession.sparkContext.defaultParallelism * 4,
        (m + n) // 25_000 + 1,
    ))
    e = e.repartition(parts, "__s")
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, rank double"
        )
    deg = e.groupBy(F.col("__s").alias("node")).agg(
        F.sum("__w").alias("__deg")
    )
    base = nodes.join(deg, "node", "left").select(
        "node", F.coalesce("__deg", F.lit(0.0)).alias("__deg")
    ).persist()
    base.count()
    ranks = base.select("node", F.lit(1.0 / n).alias("rank"))
    for it in range(max_iter):
        with_deg = ranks.join(base.hint("shuffle_hash"), "node")
        # dangling mass rides the SAME job as the rank update (broadcast
        # 1-row cross join), not a separate per-round collect — at a few
        # seconds of job overhead per action, one action per round is
        # the difference between usable and sluggish on small graphs
        dangling = F.broadcast(
            with_deg.where(F.col("__deg") == 0).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
            )
        )
        inflow = (
            with_deg.where(F.col("__deg") > 0)
            .select(
                F.col("node").alias("__s"),
                (F.col("rank") / F.col("__deg")).alias("__share"),
            )
            .repartition(parts, "__s")
            .join(e, "__s")
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.col("__share") * F.col("__w")).alias("__in"))
        )
        new_ranks = (
            base.select("node")
            .join(inflow, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce("__in", F.lit(0.0))
                        + F.col("__dang") / n
                    )
                ).alias("rank"),
            )
        )
        new_ranks = _ckpt(new_ranks)
        if tol is not None:
            delta = (
                new_ranks.join(
                    ranks.select("node", F.col("rank").alias("__old")), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
                .collect()[0][0]
            )
        ranks = new_ranks
        if tol is not None and delta is not None and delta < tol:
            break
    else:
        if tol is not None:
            e.unpersist()
            nodes.unpersist()
            base.unpersist()
            raise RuntimeError(
                f"pagerank did not converge in {max_iter} iterations"
                f" (tol={tol})"
            )
    e.unpersist()
    nodes.unpersist()
    base.unpersist()
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_edits: int = 1,
) -> DataFrame:
    """Fuzzy equi-join on string keys within Levenshtein distance
    ``max_edits`` — the entity-resolution join (matching names/titles/
    SKUs across sources that differ by a typo) that a naive plan makes
    a cartesian product.

    SymSpell deletion-neighborhood blocking (Garbe's public algorithm):
    two strings within edit distance 1 necessarily SHARE a member of
    their deletion neighborhoods D(x) = {x} ∪ {x minus one char}. Each
    side explodes into its ≤ len+1 variants — hashed to 8 B so the
    shuffle never carries the variant text — candidates come from ONE
    variant-hash equi-join, are deduped, and the exact
    ``levenshtein(l, r) <= max_edits`` check (JVM builtin) verifies
    them. Cost: O(rows · key_len) variants instead of O(n·m) pairs;
    the blocking is exact (no recall loss), the verify is exact (no
    precision loss — hash collisions die there too).

    Only ``max_edits=1`` is supported: distance-2 needs the nested
    deletion neighborhood (O(len²) variants) — an honest gate, not a
    silent fallback to a cross join.

    Output: left row + right row (right columns suffixed ``_r`` where
    they collide) + ``edit_distance``.
    """
    if max_edits != 1:
        raise NotImplementedError(
            "fuzzy_key_join supports max_edits=1 (deletion-neighborhood "
            "blocking); distance 2 needs nested deletes"
        )

    def variants(col):
        s = F.col(col)
        dels = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.concat(
                s.substr(F.lit(1), i - 1),
                s.substr(i + 1, F.length(s)),
            ),
        )
        return F.array_distinct(F.array_union(F.array(s), dels))

    lcols = left.columns
    rcols = right.columns
    renamed = {c: (c + "_r" if c in lcols else c) for c in rcols}
    r2 = right.select(*[F.col(c).alias(renamed[c]) for c in rcols])
    rk = renamed[right_key]
    # Block and verify on DISTINCT KEY STRINGS, then expand back to
    # rows with two equality joins (guide §8: make every shuffle but
    # the last operate on a lightweight proxy). The first cut exploded
    # FULL ROWS into their deletion variants, so k content-duplicate
    # keys paid k² candidate pairs × ~(len+1) shared variants through
    # two payload-carrying shuffles — 65M joined rows for 7.8M real
    # pairs on the duplicate-heavy x20 corpus (measured; 67 s noop).
    # At the name level the same corpus is 64 distinct keys. Row
    # multiplicity is preserved exactly: every (left row, right row)
    # pair whose keys verify emits once — content-duplicate rows are
    # distinct matches and all survive, as before. NULL keys never
    # match (the equality join drops them; levenshtein(NULL, x)
    # dropped them before).
    ln = left.select(F.col(left_key).alias("__lk")).distinct()
    rn = r2.select(F.col(rk).alias("__rk")).distinct()
    lv = ln.withColumn(
        "__h", F.explode(F.transform(variants("__lk"), lambda v: F.xxhash64(v)))
    )
    rv = rn.withColumn(
        "__h", F.explode(F.transform(variants("__rk"), lambda v: F.xxhash64(v)))
    )
    dist = F.levenshtein(F.col("__lk"), F.col("__rk"))
    # the computed distance rides a RESERVED name through the joins
    # (ADVICE r14): a bare "edit_distance" reference in the final select
    # turned ambiguous (AnalysisException) whenever an input frame
    # already carried that column — where the pre-r14 withColumn form
    # silently overwrote it. The alias restores the overwrite semantics:
    # an input edit_distance column is replaced by the computed one.
    name_pairs = (
        lv.join(rv, "__h")
        .drop("__h")
        .dropDuplicates(["__lk", "__rk"])
        .where(dist <= max_edits)
        .select("__lk", "__rk", dist.cast("long").alias("__ed"))
    )
    # same latent class for the blocking helpers: fail loud, not
    # ambiguous, if an input column shadows a reserved join name
    reserved = {"__lk", "__rk", "__ed"}
    shadowed = reserved & (set(lcols) | {renamed[c] for c in rcols})
    if shadowed:
        raise ValueError(
            f"fuzzy_key_join: input columns shadow reserved names "
            f"{sorted(shadowed)}; rename them before joining"
        )
    out_l = [c for c in lcols if c != "edit_distance"]
    out_r = [renamed[c] for c in rcols if renamed[c] != "edit_distance"]
    return (
        left.join(name_pairs, F.col(left_key) == F.col("__lk"))
        .join(r2, F.col("__rk") == F.col(rk))
        .drop("__lk", "__rk")
        .select(*out_l, *out_r, F.col("__ed").alias("edit_distance"))
    )


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as an
    edge frame — the local clustering signal next to ``pagerank``'s
    centrality: spam/SEO link farms and mirror rings show up as
    abnormally triangle-dense neighborhoods, and triangle counts are
    the core of clustering-coefficient and community features for
    source-quality scoring.

    Algorithm: degree-ordered orientation (the node-iterator++ /
    Schank–Wagner scheme every distributed triangle system uses).
    Self-loops drop, parallel edges collapse (one ``distinct``), each
    undirected edge is oriented from its lower-(degree, id) endpoint
    to the higher one — a DAG whose max out-degree is O(sqrt(m)) —
    then one self-join on the oriented source enumerates wedges
    (b, c) and one join against the oriented edge set closes them.
    The orientation is what makes the wedge join safe at scale: a
    degree-D hub contributes O(D^2) wedges un-oriented, but at most
    O(m) across the whole graph once every wedge center must be the
    lowest-degree endpoint of both its edges. All joins are keyed
    equi-joins on node ids (hash-partitionable, AQE-skew-splittable);
    nothing broadcasts by assumption, nothing iterates.

    Per-node counts are orientation-invariant (each triangle adds 1
    to each of its three corners regardless of enumeration order), so
    an oracle can state the canonical id-ordered definition directly.

    Returns (node, triangles) for every node incident to ≥1 edge,
    ``triangles = 0`` for nodes on edges but in no triangle.
    """
    e = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .distinct()
        # e feeds the degree count twice, the rank join, and the node
        # roster; oriented feeds both wedge sides and the closure.
        # Without sharing each reference re-inlines the whole upstream
        # (measured: 69 shuffle exchanges on the co-supplier query, 6
        # after). r14: persist, NOT localCheckpoint — a checkpointed
        # RDD scan has UnknownPartitioning and no size statistics, so
        # every downstream join was forced to SortMergeJoin even when
        # one side is node-sized (guide §3.1: pick the strategy
        # deliberately); InMemoryRelation keeps stats, letting the
        # planner/AQE choose broadcast or shuffled-hash where the
        # sizes warrant (measured: x5 3.35 s -> 1.9 s at sf0.1, 6
        # SMJ -> 1 SMJ + 5 broadcast). This is not an iterative
        # operator, so lineage truncation is not needed.
        .persist()
    )
    # one explode pass, not a two-branch union (r15): each union branch
    # scanned the cached edge frame separately; explode emits both
    # endpoints from one scan — identical multiset into the same agg.
    # deg feeds both ranking joins AND the output node list (3
    # evaluations over the edge cache) but is deliberately NOT
    # persisted (r15): an InMemoryRelation here blocks the
    # count-action's aggregate-uniqueness join elimination, and the
    # interleaved bench-surface A-B measured the persist consistently
    # ~1 s SLOWER (2.2 → 3.3 s median) — the evaluations are cheap
    # node-bounded aggregates over the already-cached edge frame.
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # rank = (degree, id): a total order, ties broken by node id
    ranked = (
        e.join(deg.withColumnRenamed("n", "u"), "u")
        .withColumnRenamed("deg", "deg_u")
        .join(
            deg.withColumnRenamed("n", "v").withColumnRenamed("deg", "deg_v"),
            "v",
        )
    )
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias(
            "deg_b"
        ),
    ).persist()  # r14: persist, not localCheckpoint — see `e` above
    # wedges from each center a: unordered endpoint pairs, kept once
    # via the same (degree, id) order
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(e2, "a").where(
        (F.col("e1.deg_b") < F.col("e2.deg_b"))
        | (
            (F.col("e1.deg_b") == F.col("e2.deg_b"))
            & (F.col("e1.b") < F.col("e2.b"))
        )
    ).select(
        F.col("a"),
        F.col("e1.b").alias("x"),
        F.col("e2.b").alias("y"),
    )
    closing = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"])
    corner = tris.select(
        F.explode(F.array("a", "x", "y")).alias("n")
    ).groupBy("n").agg(F.count(F.lit(1)).alias("triangles"))
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        deg.select("n")
        .join(corner, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        ),
        e,
        oriented,
    )


def fd_violations(
    df: DataFrame,
    determinant_cols: Sequence[str],
    dependent_cols: Sequence[str],
) -> DataFrame:
    """Functional-dependency violation detector: the determinant key
    tuples for which the dependent columns take MORE THAN ONE distinct
    value — the data-quality assertion behind every dimension load
    ("order_id determines customer", "ISO code determines country
    name"); J3 validates set membership, this validates uniqueness of
    association, the other half of referential hygiene.

    ONE aggregation: groupBy the determinant, count distinct dependent
    tuples (map-side partial aggregation; dependent tuples compare as
    a struct so NULLs group as values, matching SQL DISTINCT). Emits
    only violators — the healthy 99.99% never leave the mappers as
    more than partial counts.

    Output: determinant columns + ``n_variants`` (> 1), sorted-free;
    join back to ``df`` on the determinant for the offending rows.
    """
    dep = F.struct(*[F.col(c) for c in dependent_cols])
    return (
        df.groupBy(*determinant_cols)
        .agg(F.count_distinct(dep).alias("n_variants"))
        .where(F.col("n_variants") > 1)
    )


def temporal_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Effective-dated dimension join — the consumption side of
    ``scd2_merge``: each fact row picks the dimension VERSION that was
    valid at its event time, ``valid_from <= ts < valid_to`` with a
    NULL ``valid_to`` meaning still-open (the half-open convention
    SCD2 history is built with, so version intervals tile without
    overlap and a boundary timestamp matches exactly one version).

    A keyed equi-join with the interval predicate as join condition —
    NOT a range join: SCD2 intervals per key are disjoint, so each
    fact row matches at most one dim row and there is no fan-out to
    bucketize (j11's bucketized range join is for the overlapping-
    interval case). Catalyst plans the key equality as the join key
    and the interval check as a residual filter; both sides shuffle
    once on the key, AQE handles skewed hot keys.

    ``how="left"`` keeps orphaned facts (no valid version at their
    time) with NULL dim columns — the audit mode for detecting
    late-arriving dimension gaps.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    ts = fact[fact_ts]
    cond = (
        (fact[fact_key] == dim[dim_key])
        & (ts >= dim[valid_from])
        & (dim[valid_to].isNull() | (ts < dim[valid_to]))
    )
    return fact.join(dim, cond, how)


def lpa_communities(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over an undirected edge frame — the density-aware
    companion to ``dedup_clusters``' connected components: CC merges
    everything reachable (one bridge edge fuses two mirror farms);
    LPA keeps densely-linked groups separate because a node adopts
    the label the MAJORITY of its neighbors carry.

    Per round: labels join onto both edge directions, one
    (node, neighbor-label) count aggregate, then per node the
    ``min(struct(-count, label))`` argmax — most-frequent label, ties
    to the smallest (the determinism the replay test needs). Rounds
    are Pregel-shaped keyed joins/aggregates; like ``pagerank``,
    every round re-checkpoints the label frame (the repo's iterative
    lineage discipline) and the changed-count is the only driver
    scalar. Synchronous LPA can oscillate on bipartite-ish structure,
    so this runs a FIXED ``max_iter`` budget and reports convergence
    honestly instead of raising: output (node, community, converged)
    where ``converged`` is the same boolean on every row.

    Isolated nodes never appear (no edges → no membership); self-loops
    drop; labels are the node ids themselves, so a community's label
    is one of its members.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint()

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    # symmetrize map-side with one explode (r15, the dedup_clusters
    # fix): the two union branches each re-evaluated the caller's
    # UNPERSISTED edge lineage (for x9 a distinct-join) when the
    # persisted frame materialized; explode emits both directions from
    # one evaluation — identical multiset into the same distinct
    und = edges.where(F.col(src_col) != F.col(dst_col))
    e = (
        und.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("__a"),
                        F.col(dst_col).alias("__b"),
                    ),
                    F.struct(
                        F.col(dst_col).alias("__a"),
                        F.col(src_col).alias("__b"),
                    ),
                )
            ).alias("__fe")
        )
        .select("__fe.__a", "__fe.__b")
        .distinct()
        .persist()
    )
    labels = _ckpt(
        e.select(F.col("__a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    try:
        for _ in range(max_iter):
            nbr = e.join(
                labels.withColumnRenamed("node", "__b"), "__b"
            ).select(F.col("__a").alias("node"), "label")
            counted = nbr.groupBy("node", "label").agg(
                F.count(F.lit(1)).alias("__c")
            )
            new_labels = (
                counted.groupBy("node")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("__c")).alias("__nc"),
                            F.col("label").alias("label"),
                        )
                    ).alias("__best")
                )
                .select("node", F.col("__best.label").alias("label"))
            )
            new_labels = _ckpt(new_labels)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
    finally:
        e.unpersist()
    return labels.select(
        "node",
        F.col("label").alias("community"),
        F.lit(converged).alias("converged"),
    )


def hierarchy_flatten(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Flatten a parent-child hierarchy (org chart, category tree,
    region rollup) to (node, root, depth) — the closure every
    warehouse needs to aggregate leaves to their top-level ancestor
    without per-level self-joins.

    Pointer doubling: every node starts pointing at its parent with
    distance 1 (roots at themselves, distance 0); each round joins the
    pointer table with ITSELF on the ancestor (``anc' = anc.anc``,
    ``depth += anc.depth``), so the followed distance DOUBLES per
    round — a depth-1M chain closes in 20 keyed self-joins, not 1M
    (the same O(log n) discipline as ``dedup_clusters``). Parent
    pointers are functional (one parent per child — raises otherwise,
    limit-5 fail-fast probe), so every join is 1:1 and the frame never
    grows. Per-round checkpoint + changed-count scalar, converge (all
    pointers on a root fixpoint) or raise — a cycle can never
    converge, so ``max_iter`` is also the cycle guard.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint()

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    # persist (r15, the p15/x33 multi-consumer class): the distinct
    # edge frame feeds the duplicate-parent guard, both sides of the
    # root anti-join and the doubling seed — unpersisted, the edge
    # scan + distinct shuffle ran four times. The checkpoint below is
    # EAGER, so the cache can release as soon as the seed state is
    # materialized.
    e = edges.select(
        F.col(child_col).alias("__c"), F.col(parent_col).alias("__p")
    ).distinct().persist()
    try:
        dupes = (
            e.groupBy("__c").agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1).limit(5).collect()
        )
        if dupes:
            raise ValueError(
                f"multiple parents for children {[r['__c'] for r in dupes]}"
            )
        roots = (
            e.select(F.col("__p").alias("node"))
            .distinct()
            .join(e.select(F.col("__c").alias("node")), "node", "left_anti")
        )
        state = _ckpt(
            e.select(
                F.col("__c").alias("node"),
                F.col("__p").alias("anc"),
                F.lit(1).cast("long").alias("d"),
            ).unionByName(
                roots.select(
                    "node",
                    F.col("node").alias("anc"),
                    F.lit(0).cast("long").alias("d"),
                )
            )
        )
    finally:
        e.unpersist()
    for _ in range(max_iter):
        s, t = state.alias("s"), state.alias("t")
        new = _ckpt(
            s.join(t, F.col("s.anc") == F.col("t.node")).select(
                F.col("s.node").alias("node"),
                F.col("t.anc").alias("anc"),
                (F.col("s.d") + F.col("t.d")).alias("d"),
            )
        )
        changed = (
            new.alias("n")
            .join(state.alias("o"), "node")
            .where(F.col("n.anc") != F.col("o.anc"))
            .limit(1)
            .count()
        )
        state = new
        if changed == 0:
            return state.select(
                "node", F.col("anc").alias("root"),
                F.col("d").alias("depth"),
            )
    raise RuntimeError(
        f"hierarchy_flatten did not converge in {max_iter} rounds "
        "(cycle, or depth > 2^max_iter)"
    )


def neighborhood_jaccard(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 1,
    max_center_degree: int | None = 10_000,
) -> DataFrame:
    """Neighborhood-overlap link prediction over an undirected graph:
    for every node pair sharing at least ``min_common`` neighbors,
    ``common = |N(a)∩N(b)|`` and ``jaccard = common / |N(a)∪N(b)|`` —
    the classic common-neighbors / Jaccard scores (Liben-Nowell &
    Kleinberg) that rank "who should be connected next" and flag
    near-mirror nodes (two domains linked by the same neighbor set).

    Plan: canonical undirected edge set (self-loops dropped, parallel
    edges collapsed), symmetric adjacency, one self-join keyed on the
    SHARED NEIGHBOR (each wedge center emits its unordered endpoint
    pairs once), count per pair, then two degree joins close the
    union via inclusion–exclusion. All shuffles hash node ids.

    The wedge join is quadratic in CENTER degree — the same hub
    explosion d2 guards with max_block. Same discipline here: centers
    with degree > ``max_center_degree`` FAIL FAST (limit-5 probe
    naming offenders) rather than silently stalling the stage; pass
    ``None`` to disable when hub wedges are genuinely wanted. Note
    the scores themselves are exact only over the surviving centers —
    the guard raises instead of approximating.

    Output: (a, b, common, union_size, jaccard), a < b.
    """
    e = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .distinct()
        # r14: persist, not localCheckpoint — checkpointed RDD scans
        # lose size statistics and forced SortMergeJoin on the
        # node-sized degree joins (the triangle_count finding); this
        # operator is not iterative, so lineage truncation buys nothing
        .persist()
    )
    # one explode pass over the cache instead of two union scans (r15)
    adj = e.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("n"), F.col("v").alias("nbr")),
                F.struct(F.col("v").alias("n"), F.col("u").alias("nbr")),
            )
        ).alias("__fe")
    ).select("__fe.n", "__fe.nbr")
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg")).persist()
    if max_center_degree is not None:
        hot = deg.where(F.col("deg") > int(max_center_degree)).limit(5)
        try:
            offenders = [(r["n"], r["deg"]) for r in hot.collect()]
        except BaseException:
            e.unpersist()
            deg.unpersist()
            raise
        if offenders:
            e.unpersist()  # fail-fast must not leak the caches
            deg.unpersist()
            raise ValueError(
                "neighborhood_jaccard: wedge centers exceed "
                f"max_center_degree={max_center_degree}: {offenders} — "
                "raise the cap (None to disable) or pre-filter hubs"
            )
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    pairs = (
        a1.join(a2, "nbr")
        .where(F.col("a1.n") < F.col("a2.n"))
        .groupBy(F.col("a1.n").alias("a"), F.col("a2.n").alias("b"))
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= int(min_common))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("_db"))
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            (F.col("_da") + F.col("_db") - F.col("common"))
            .cast("long")
            .alias("union_size"),
            F.round(
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common")),
                6,
            ).alias("jaccard"),
        ),
        e,
        deg,
    )


def kcore(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 2,
    max_iter: int = 100,
) -> DataFrame:
    """k-core extraction: the maximal subgraph in which every node has
    degree ≥ k — the standard "dense backbone vs peripheral fluff"
    split (spam-farm cores, collaboration cliques, the seed set for
    community detection). The 2-core alone strips every tree-like
    tendril.

    Iterative peel, the textbook fixpoint: each round computes degrees
    over the surviving edge set and anti-joins away EVERY node below k
    at once (so a chain of length L peels from both ends in ⌈L/2⌉
    rounds, not L). Rounds are keyed aggregations + anti-joins —
    no driver-side data, one lazy ``localCheckpoint`` per round to cut
    the self-referential lineage (the repo's standard iterative
    discipline; without it plan size goes exponential in rounds).
    Terminates when no node is below k — checked with a cheap
    ``isEmpty`` probe per round — and RAISES after ``max_iter`` rounds
    instead of returning a not-yet-core set (converge-or-raise;
    pathological path graphs need ~diameter/2 rounds, so size
    ``max_iter`` to the graph's diameter, not its node count).

    Output: (node, degree) for every member of the k-core, degree
    measured WITHIN the core.
    """
    cur = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(int(max_iter)):
        # one explode pass per round instead of two checkpoint scans
        adj = cur.select(F.explode(F.array("u", "v")).alias("n"))
        deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
        bad = deg.where(F.col("degree") < int(k)).select("n").localCheckpoint(
            eager=False
        )
        if bad.isEmpty():
            return deg.select("n", "degree").withColumnRenamed("n", "node")
        cur = (
            cur.join(bad.withColumnRenamed("n", "u"), "u", "left_anti")
            .join(bad.withColumnRenamed("n", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(
        f"kcore did not converge in {max_iter} rounds — the graph's "
        "peel depth exceeds max_iter; raise it (rounds ~ diameter/2)"
    )


def interval_union(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union-of-intervals coverage per key: total time covered by a
    set of possibly-overlapping intervals, counting overlaps ONCE —
    the uptime/maintenance-window/on-call arithmetic naive
    ``sum(end − start)`` double-counts (three stacked hour-long
    incidents are one hour of downtime, not three).

    The classic sweep, expressed as two windows on one keyed
    shuffle: every interval emits (+1 at start, −1 at end) boundary
    events; a running sum gives live coverage depth; a segment
    between consecutive boundaries counts iff depth > 0; a block
    starts where depth steps 0→1. Touching intervals ([1,2],[2,3])
    merge — starts order before ends at the same instant. Intervals
    with end ≤ start are dropped (zero/negative length, not an
    error: half-open semantics make them empty).

    Output: (key, n_intervals, n_blocks, covered_s) — blocks =
    maximal merged runs; microsecond-exact seconds.
    """
    iv = df.where(F.col(end_col) > F.col(start_col)).select(
        F.col(key_col),
        F.unix_micros(F.col(start_col)).alias("_s"),
        F.unix_micros(F.col(end_col)).alias("_e"),
    )
    counts = iv.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals")
    )
    # both boundary events from ONE scan of the (unpersisted) interval
    # projection (r15): the union's branches each re-read the source
    ev = iv.select(
        key_col,
        F.explode(
            F.array(
                F.struct(F.col("_s").alias("_t"), F.lit(1).alias("_d")),
                F.struct(F.col("_e").alias("_t"), F.lit(-1).alias("_d")),
            )
        ).alias("__ev"),
    ).select(key_col, "__ev._t", "__ev._d")
    wo = Window.partitionBy(key_col).orderBy(
        F.col("_t"), F.col("_d").desc()
    )
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = ev.withColumn("_depth", F.sum("_d").over(run)).withColumn(
        "_next_t", F.lead("_t").over(wo)
    )
    segs = swept.groupBy(key_col).agg(
        F.sum(
            F.when(
                (F.col("_depth") > 0) & F.col("_next_t").isNotNull(),
                F.col("_next_t") - F.col("_t"),
            ).otherwise(F.lit(0))
        ).alias("_cov_us"),
        F.sum(
            ((F.col("_depth") == 1) & (F.col("_d") == 1)).cast("long")
        ).cast("long").alias("n_blocks"),
    )
    return counts.join(segs, key_col).select(
        key_col,
        "n_intervals",
        "n_blocks",
        (F.col("_cov_us") / 1_000_000.0).alias("covered_s"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of an undirected graph (Newman's r): the
    Pearson correlation of endpoint degrees over edges — do hubs link
    to hubs (r>0, social nets) or to leaves (r<0, supply/star
    topologies)? One number that tells you whether hub-guarded
    operators (neighborhood_jaccard's max_center_degree, kcore's peel)
    will bite on this graph before you run them.

    ``edges`` is one row per undirected edge (src, dst); the operator
    symmetrizes internally (Newman's sum runs over BOTH edge
    directions). The symmetrized frame is lazily checkpointed
    (``localCheckpoint(eager=False)``, the kcore/j12 discipline):
    it feeds both the degree aggregate and the endpoint-degree join,
    and without the lineage cut each branch would re-derive the
    caller's edge construction — for wedge/co-occurrence graphs
    that's a data-sized self-join run 3×. Degrees join back keyed by
    node (broadcast when small — left to AQE). r uses the exact
    product-moment identity on integer degrees, so the sums are
    order-independent exact while ``E·deg² < 2^52``; n_nodes rides
    the same aggregate as ``count_distinct`` (no extra branch); the
    one division happens on bit-identical inputs in both engines.

    Output: one row — (n_nodes, n_edges, assortativity), NULL r for
    degree-regular graphs (zero variance).
    """
    sym = (
        edges.select(F.col("src").alias("_u"), F.col("dst").alias("_v"))
        .unionAll(
            edges.select(
                F.col("dst").alias("_u"), F.col("src").alias("_v")
            )
        )
        # r14: persist, not localCheckpoint (stats, see triangle_count)
        .persist()
    )
    # persist (r15, the p15/x33 multi-consumer class): deg feeds both
    # endpoint joins — unpersisted, the aggregate over the symmetric
    # edge cache ran twice. Node-bounded; float-identical.
    deg = sym.groupBy("_u").agg(
        F.count(F.lit(1)).cast("double").alias("_d")
    ).persist()
    du = deg.select(F.col("_u"), F.col("_d").alias("_du"))
    dv = deg.select(
        F.col("_u").alias("_v"), F.col("_d").alias("_dv")
    )
    pairs = sym.join(du, "_u").join(dv, "_v")
    agg = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("_m"),
        F.count_distinct("_u").cast("long").alias("n_nodes"),
        F.sum("_du").alias("_sx"),
        F.sum("_dv").alias("_sy"),
        F.sum(F.col("_du") * F.col("_du")).alias("_sxx"),
        F.sum(F.col("_dv") * F.col("_dv")).alias("_syy"),
        F.sum(F.col("_du") * F.col("_dv")).alias("_sxy"),
    )
    num = F.col("_m") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = F.col("_m") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = F.col("_m") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    r = F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy))
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        agg.select(
            "n_nodes",
            (F.col("_m") / 2).cast("long").alias("n_edges"),
            F.round(r, 4).alias("assortativity"),
        ),
        sym,
        deg,
    )


def bradley_terry(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    max_iter: int = 100,
    tol: float = 1e-6,
    prior: float = 0.1,
    driver_max_pairs: int = 2_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Bradley-Terry strength fitting from pairwise comparisons via
    Hunter's MM algorithm — turn "A beat B" logs (preference pairs in
    RLHF data curation, engine matches, ranker A/B duels) into one
    latent strength per item, the principled alternative to naive
    win-rate when schedules are unbalanced (beating strong opponents
    counts for more).

    Model: P(i beats j) = p_i/(p_i+p_j). MM update (Hunter 2004,
    public):  ``p_i' = W_i / Σ_{j≠i} n_ij/(p_i+p_j)``, a fixpoint that
    monotonically increases the likelihood. ``prior`` pseudo-wins are
    added per ordered pair (so each pair contributes prior wins each
    way) — the standard regularization that keeps never-winners off
    zero and disconnected schedules finite. ``prior=0`` gives the
    plain MLE (exact planted-strength recovery when empirical win
    fractions match the model — the pinning test's construction).

    Scale discipline, two-regime like the MMR / BM25 bounded blocks:
    comparisons collapse ONCE to the directed pair frame
    (i, j, w_ij, n_ij) + per-item win totals W_i — both item²-bounded,
    never log-sized (this collapse is the stage that sees 100 TB).

    * ``n_pairs ≤ driver_max_pairs`` (the common case): the grid
      collects and the fixpoint runs as exact float64 numpy — zero
      per-round Spark jobs, convergence in milliseconds. This is what
      cut x27 from 15.5 s at sf0.01 (r8 verdict #1).
    * larger grids run parameter-server style: the PAIR GRID stays
      distributed (persisted once, never re-shuffled) while the
      STRENGTH VECTOR — item-sized, 1M items ≈ 8 MB — lives on the
      driver and BROADCASTS onto the grid each round: two map-side
      broadcast-hash joins + one keyed aggregate + one item-sized
      collect = ONE Spark job per round with a constant-size plan (no
      checkpoint chain, so the iterative-lineage trap cannot arise),
      and the L1 delta is free driver arithmetic every round. The r8
      design (per-round localCheckpoint + 2 shuffle joins + separate
      probe job) paid ~18 scheduler stages per round and made x27 the
      slowest query in the catalog. Driver bound: the item vector
      must fit on the driver — same contract as the win-totals
      collect, fine to ~50M items.

    Convergence: MEAN absolute per-item strength change < ``tol``
    (item-count-invariant — a summed L1 would make tol effectively
    n× stricter at n× the items). Converge-or-raise: RuntimeError
    past ``max_iter``. Output:
    (item, strength, wins, n_comparisons), strengths mean-1
    normalized. Reference-free extension (no ixmp counterpart);
    pinned by tests/test_scale.py::test_bradley_terry_planted_recovery
    (planted-strengths recovery + driver≡distributed equivalence).
    """
    spark = comparisons.sparkSession
    ordered = comparisons.select(
        F.col(winner_col).alias("__w"), F.col(loser_col).alias("__l")
    ).where(F.col("__w") != F.col("__l"))
    # UNORDERED-pair win counts — the ONLY data-sized shuffle, and the
    # r15 form of it: grouping by (least, greatest) with one conditional
    # sum per direction merges the two directed rows of every pair into
    # one grid row BEFORE the exchange (map-side partial aggregation
    # compresses onto ~half the keys), so the shuffled, cached and
    # driver-collected frame is up to 2x smaller than the directed grid
    # for the same information (VERDICT r14 next-round #3: the fit
    # consumes per-pair counts anyway — ship the collapsed form).
    # Everything after runs on (observed-pair)-bounded frames.
    wins = ordered.groupBy(
        F.least("__w", "__l").alias("__a"),
        F.greatest("__w", "__l").alias("__b"),
    ).agg(
        F.sum(F.when(F.col("__w") < F.col("__l"), 1).otherwise(0))
        .cast("double")
        .alias("__kf"),
        F.sum(F.when(F.col("__w") > F.col("__l"), 1).otherwise(0))
        .cast("double")
        .alias("__kb"),
    ).persist()
    # count() then a full Arrow collect, NOT a limit-probe: the grid
    # is persisted, so the count is one fully-parallel job that
    # materializes every cache partition at once, where
    # CollectLimit's escalating partition waves (1, 4, 16, …
    # sequential jobs) staged the materialization and swung the wall
    # time 5× rep-to-rep (measured at sf0.1: probe 1.3–6.2 s vs
    # count+collect 1.15–1.63 s). Over-cap inputs also no longer
    # collect cap+1 rows just to learn they must go distributed —
    # the path decision now precedes any driver transfer. The
    # collect rides Arrow (toPandas): a row-by-row collect() of a
    # near-cap grid is py4j-bound (~8 s vs ~0.3 s for 1M rows). The
    # symmetrize-with-prior step happens in numpy on the driver path
    # (pure per-pair arithmetic) — the r9 profile showed the Spark
    # union+groupBy+join symmetrization costing more than the whole
    # MM fit at sf0.1.
    # item_type derives BEFORE the empty check so the empty frame's
    # schema matches the non-empty paths (a long-keyed empty input must
    # not come back string-keyed — downstream unions would mismatch)
    item_type = wins.schema["__a"].dataType.simpleString()
    # ONE fully-parallel job materializes the cache and returns both the
    # regime-decision count and the empty check. n_win_pairs stays the
    # DIRECTED pair count — (kf>0)+(kb>0) per row — so the driver-vs-
    # distributed decision is bit-identical to the directed-grid form.
    st0 = wins.agg(
        F.count(F.lit(1)).alias("_u"),
        F.sum(
            (F.col("__kf") > 0).cast("long")
            + (F.col("__kb") > 0).cast("long")
        ).alias("_d"),
    ).collect()[0]
    n_win_pairs = int(st0["_d"] or 0)
    if n_win_pairs == 0:
        wins.unpersist()
        return spark.createDataFrame(
            [], f"item {item_type}, strength double, wins double,"
            " n_comparisons double"
        )
    if stats is not None:
        stats.update(
            n_pairs=n_win_pairs,
            path="driver" if n_win_pairs <= driver_max_pairs
            else "distributed", round_seconds=[],
        )
    if n_win_pairs <= driver_max_pairs:
        # bounded-block fast path: the collapsed grid is item²-bounded
        # by construction — exact numpy fixpoint, zero per-round jobs
        import numpy as np

        pdf = wins.toPandas()
        wins.unpersist()
        # deterministic summation order: np.bincount accumulates its
        # float weights in array order, and the MM fixpoint amplifies
        # ulp-level sum differences across iterations — sorting by
        # (a, b) reproduces exactly the ascending-unordered-pair order
        # the pre-r15 driver collapse produced (np.unique over encoded
        # pmin·n+pmax keys), so results are bit-identical run-to-run
        # and to the directed-grid form, independent of partition order
        pdf = pdf.sort_values(["__a", "__b"], ignore_index=True)
        m = len(pdf)
        both = np.concatenate(
            [pdf["__a"].to_numpy(), pdf["__b"].to_numpy()]
        )
        # the grid arrives ALREADY collapsed onto unordered pairs with
        # per-direction counts (the r15 Spark-side groupBy), so the old
        # pmin/pmax/unique-collapse is gone — item indexing is the only
        # remaining driver prep. Same item set and np.unique order as
        # the directed form (every duel endpoint appears in __a or __b).
        items_arr, inv = np.unique(both, return_inverse=True)
        items = items_arr.tolist()
        n_items = len(items)
        a_idx = inv[:m].astype(np.int64)
        b_idx = inv[m:].astype(np.int64)
        kf = pdf["__kf"].to_numpy(dtype=np.float64)
        kb = pdf["__kb"].to_numpy(dtype=np.float64)
        wf, wb = kf + prior, kb + prior
        nu = wf + wb
        src = np.concatenate([a_idx, b_idx])
        dst = np.concatenate([b_idx, a_idx])
        wij = np.concatenate([wf, wb])
        nij = np.concatenate([nu, nu])
        # bincount, not np.add.at: at a 1M-pair grid the ufunc.at
        # scatter costs ~50 ms/M per round (x27's sf0.1 profile) vs
        # ~5 ms/M for the fused bincount reduction
        win = np.bincount(src, weights=wij, minlength=n_items)
        ncmp = np.bincount(src, weights=nij, minlength=n_items)
        if stats is not None:
            stats["n_items"] = n_items
        p_vec = np.ones(n_items, dtype=np.float64)
        for _round in range(max_iter):
            if stats is not None:
                stats["rounds"] = _round + 1
            den = np.bincount(
                src,
                weights=nij / (p_vec[src] + p_vec[dst]),
                minlength=n_items,
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                new = np.where(den > 0, win / den, 0.0)
            mean = new.mean()
            if mean > 0:
                new = new / mean
            delta = float(np.abs(new - p_vec).sum()) / n_items
            p_vec = new
            if delta < tol:
                break
        else:
            raise RuntimeError(
                f"bradley_terry did not converge in {max_iter}"
                f" iterations (tol={tol})"
            )
        out_rows = [
            (items[k], round(float(p_vec[k]), 8), float(win[k]),
             float(ncmp[k]))
            for k in range(n_items)
        ]
        return spark.createDataFrame(
            out_rows,
            f"item {item_type}, strength double, wins double,"
            " n_comparisons double",
        )
    # Distributed regime: the PAIR GRID outgrows the driver but the
    # STRENGTH VECTOR never does — it is item-sized (1M items ≈ 8 MB of
    # float64), the same bounded-block class as the BM25 query-term and
    # MMR candidate collects. So the loop runs parameter-server style:
    # strengths live on the driver as numpy, each round BROADCASTS them
    # onto the (persisted, never re-shuffled) pair frame — two map-side
    # broadcast-hash joins, one keyed aggregate, one item-sized collect.
    # ONE Spark job per round, constant-size plan (no checkpoint chain:
    # every round's lineage is e.persist + broadcast join, so the
    # iterative-lineage trap cannot arise), and the L1 delta is free
    # driver arithmetic every round. This replaced the r8 design
    # (per-round localCheckpoint + 2 shuffle joins + separate probe
    # job) whose per-round stage count made x27 the slowest query in
    # the catalog.
    import numpy as np
    import pandas as pd

    # symmetrize with the prior MAP-SIDE from the cached unordered grid
    # (r15): each grid row (a, b, kf, kb) directly emits its two
    # directed rows with w_ij = k + prior and n_ij = w_ij + w_ji — the
    # old union → groupBy exchange and the pairs⋈back self-join carried
    # no information the collapsed grid doesn't already hold. The float
    # arithmetic replicates the old order exactly:
    # (kf + prior) + (kb + prior), never (kf + kb) + 2·prior.
    _wf = F.col("__kf") + F.lit(prior)
    _wb = F.col("__kb") + F.lit(prior)
    e = (
        wins.select(
            F.col("__a").alias("__i"),
            F.col("__b").alias("__j"),
            _wf.alias("__wij"),
            (_wf + _wb).alias("__nij"),
        )
        .unionByName(
            wins.select(
                F.col("__b").alias("__i"),
                F.col("__a").alias("__j"),
                _wb.alias("__wij"),
                (_wf + _wb).alias("__nij"),
            )
        )
        .persist()
    )
    totals = e.groupBy(F.col("__i").alias("item")).agg(
        F.sum("__wij").alias("__win"),
        F.sum("__nij").alias("__n"),
    )
    trows = totals.collect()  # item-sized: the documented driver bound
    items = [r["item"] for r in trows]
    n_items = len(items)
    win = np.array([r["__win"] for r in trows], dtype=np.float64)
    idx = {it_: k for k, it_ in enumerate(items)}
    p_vec = np.ones(n_items, dtype=np.float64)
    if stats is not None:
        stats["n_items"] = n_items
    import time as _time

    delta = None
    for it in range(max_iter):
        _t0 = _time.perf_counter()
        pdf = pd.DataFrame({"item": items, "__p": p_vec})
        pframe = spark.createDataFrame(pdf)
        pi = F.broadcast(
            pframe.select(
                F.col("item").alias("__i"), F.col("__p").alias("__pi")
            )
        )
        pj = F.broadcast(
            pframe.select(
                F.col("item").alias("__j"), F.col("__p").alias("__pj")
            )
        )
        dens = (
            e.join(pi, "__i")
            .join(pj, "__j")
            .groupBy("__i")
            .agg(
                F.sum(
                    F.col("__nij") / (F.col("__pi") + F.col("__pj"))
                ).alias("__den")
            )
            .collect()
        )
        den = np.zeros(n_items, dtype=np.float64)
        for r in dens:
            den[idx[r["__i"]]] = r["__den"]
        with np.errstate(divide="ignore", invalid="ignore"):
            new = np.where(den > 0, win / den, 0.0)
        mean = new.mean()
        if mean > 0:
            new = new / mean
        delta = float(np.abs(new - p_vec).sum()) / n_items
        p_vec = new
        if stats is not None:
            stats["round_seconds"].append(
                round(_time.perf_counter() - _t0, 4)
            )
            stats["rounds"] = it + 1
        if delta < tol:
            break
    else:
        e.unpersist()
        wins.unpersist()
        raise RuntimeError(
            f"bradley_terry did not converge in {max_iter} iterations"
            f" (tol={tol})"
        )
    wins.unpersist()
    ncmp = {r["item"]: r["__n"] for r in trows}
    out_rows = [
        (items[k], round(float(p_vec[k]), 8), float(win[k]),
         float(ncmp[items[k]]))
        for k in range(n_items)
    ]
    e.unpersist()
    return spark.createDataFrame(
        out_rows,
        f"item {item_type}, strength double, wins double,"
        " n_comparisons double",
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.001,
    min_confidence: float = 0.05,
    max_rules: int = 100,
    cache_base: bool = False,
) -> DataFrame:
    """Pairwise association rules A→B with support / confidence / lift
    — the classic market-basket readout (Agrawal-Srikant lineage,
    public) over any (basket, item) co-occurrence: which parts ship
    together, which sources co-cite, which tools co-invoke. x16's
    neighborhood-Jaccard scores SIMILARITY of items; rules are
    DIRECTED (bread→butter ≠ butter→bread: confidence differs) and
    lift calibrates against item popularity, which raw co-counts
    cannot.

    Scale shape: baskets dedupe ONCE to distinct (basket, item) rows
    (the only data-sized shuffle family); the within-basket self-join
    explodes per-basket item pairs — basket size is the fan-out bound,
    the d-family blocking contract (huge baskets belong pre-capped
    upstream); pair counts aggregate on the (A, B) grid, item²-bounded.
    Item supports are ITEM-DOMAIN-sized and join back onto the grid
    (AQE-broadcast when the item table is small — no forced hint, r13);
    the 1-row basket total rides a cross-broadcast (t9/t17 pattern). The final top-``max_rules`` by (lift desc, support desc,
    antecedent, consequent) is a TakeOrderedAndProject — bounded
    driver rows, deterministic ties.

    support = n_AB/N baskets, confidence = n_AB/n_A,
    lift = confidence/(n_B/N); all three divide exact integer counts
    once, so the driver hash certifies them cross-engine. Output:
    (antecedent, consequent, n_ab, support, confidence, lift).
    """
    # The distinct (basket, item) frame feeds the basket total, the
    # item supports and both self-join sides — unpersisted, the data
    # scan + distinct shuffle re-run per consumer (the self-join sides
    # share one evaluation via ReusedExchange). ``cache_base=True``
    # persists it for the cluster regime, where repeating the distinct
    # shuffle dominates; the default keeps the recompute shape because
    # the interleaved sf0.1 A-B measured the unconditional persist
    # ~12% SLOWER locally (cache write of the basket-item frame >
    # two extra scans) — the t9/p12 cache-write-vs-recompute
    # adjudication, applied with the same measured standard.
    base = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if cache_base:
        base = base.persist()
    n_baskets = base.agg(
        F.count_distinct("__b").cast("double").alias("__n")
    )
    items = base.groupBy(F.col("__i")).agg(
        F.count(F.lit(1)).cast("double").alias("__ni")
    )
    a = base.select(F.col("__b"), F.col("__i").alias("__ia"))
    b = base.select(F.col("__b"), F.col("__i").alias("__ib"))
    pairs = (
        a.join(b, "__b")
        .where(F.col("__ia") != F.col("__ib"))
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).cast("double").alias("__nab"))
    )
    # item supports are ITEM-DOMAIN-sized (SF-scaling for catalog-like
    # item domains): no forced broadcast (r13) — AQE broadcasts them at
    # runtime when actually small; the 1-row basket total keeps its
    # hint (provably bounded)
    scored = (
        pairs.join(
            items.select(F.col("__i").alias("__ia"),
                         F.col("__ni").alias("__na")),
            "__ia",
        )
        .join(
            items.select(F.col("__i").alias("__ib"),
                         F.col("__ni").alias("__nb")),
            "__ib",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    support = F.col("__nab") / F.col("__n")
    confidence = F.col("__nab") / F.col("__na")
    lift = confidence / (F.col("__nb") / F.col("__n"))
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        scored.where(
            (support >= min_support) & (confidence >= min_confidence)
        )
        .select(
            F.col("__ia").alias("antecedent"),
            F.col("__ib").alias("consequent"),
            F.col("__nab").cast("long").alias("n_ab"),
            F.round(support, 6).alias("support"),
            F.round(confidence, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(
            F.desc("lift"), F.desc("support"),
            "antecedent", "consequent",
        )
        .limit(max_rules),
        *((base,) if cache_base else ()),
    )


def graph_modularity(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    labels: DataFrame,
    id_col: str,
    label_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Newman modularity of a node partition over an undirected
    (optionally weighted) edge list — THE quality score for a
    community labeling (Newman 2006, public):
    Q = Σ_c ( w_in(c)/W − (S(c)/2W)² ), W = total edge weight,
    w_in(c) = intra-community edge weight, S(c) = weighted degree
    (strength) sum of c's members (intra edges count twice, cut edges
    once). Complements x9's LPA (which PRODUCES labels) with the
    measurement of how good ANY labeling is — LPA's, a metadata
    partition's, or a rival clustering's.

    Output per community, ordered: (community, n_edges_internal
    weight-summed as w_internal, strength, q_contrib rounded 6);
    Q = sum of q_contrib. Plan shape: two label joins onto the edge
    list (node-keyed — broadcastable when the node table is small),
    then the labeled edges are consumed EXACTLY ONCE — a 2-struct
    explode sends each edge's weight to both endpoint communities
    carrying an intra flag, so one community aggregation yields both
    the strength and (halved — intra edges arrive twice) the internal
    weight, and the 1-row total W = Σ strength / 2 derives from the
    community-bounded frame (a first draft fed the labeled edges to
    three separate aggregations and the audit counted 13 exchanges
    from the triple recompute). Nothing shuffles wider than the edge
    list."""
    w = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v"),
        w.alias("_w"),
    )
    lab = labels.select(
        F.col(id_col).alias("_n"), F.col(label_col).alias("_c")
    )
    j = (
        e.join(lab.withColumnRenamed("_n", "_u")
               .withColumnRenamed("_c", "_ca"), "_u")
        .join(lab.withColumnRenamed("_n", "_v")
              .withColumnRenamed("_c", "_cb"), "_v")
    )
    intra_flag = (F.col("_ca") == F.col("_cb")).alias("_i")
    ex = j.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_ca").alias("_c"), F.col("_w").alias("_s"),
                    intra_flag,
                ),
                F.struct(
                    F.col("_cb").alias("_c"), F.col("_w").alias("_s"),
                    intra_flag,
                ),
            )
        ).alias("_p")
    ).select(
        F.col("_p._c").alias("community"),
        F.col("_p._s").alias("_s"),
        F.col("_p._i").alias("_i"),
    )
    per = ex.groupBy("community").agg(
        (
            F.sum(F.when(F.col("_i"), F.col("_s")).otherwise(0.0)) / 2.0
        ).alias("w_internal"),
        F.sum("_s").alias("strength"),
    )
    # W = Σ strength / 2 as a GLOBAL window over the community-bounded
    # frame — a 1-row aggregate + cross join would recompute the whole
    # edge pipeline as the broadcast build side (measured: the audit
    # counted the duplicate chain at 10 exchanges)
    tot_w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per.withColumn("_W", F.sum("strength").over(tot_w) / 2.0)
        .select(
            "community",
            F.round("w_internal", 6).alias("w_internal"),
            F.round("strength", 6).alias("strength"),
            F.round(
                F.col("w_internal") / F.col("_W")
                - F.pow(
                    F.col("strength") / (2.0 * F.col("_W")), F.lit(2.0)
                ),
                6,
            ).alias("q_contrib"),
        )
        .orderBy("community")
    )
