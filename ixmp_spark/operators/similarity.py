"""Similarity search over embedding columns (array<float>).

Extension surface (north star): brute-force cosine top-k as the exact
baseline, and an LSH-bucketed (random hyperplane / sign-LSH) variant as
the 100 TB scale path. Vector math is expressed with F.zip_with /
F.aggregate — JVM-side, no Python in the loop. Accumulation is cast to
double before summing so results are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dvec(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Dot product of two array columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(_dvec(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors of a single probe vector.

    probe: 1-row frame with (id_col, vec_col). Cross-joined as broadcast —
    a map-only pass over the corpus followed by TakeOrderedAndProject;
    at 100 TB this is the embarrassingly-parallel exact scan.
    """
    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("__probe_id"), F.col(vec_col).alias("__probe_vec")
        )
    )
    scored = df.crossJoin(p)
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col("__probe_id"))
    return (
        scored.select(
            F.col(id_col),
            F.round(cosine(vec_col, "__probe_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_lsh_bucket(vec_col, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = sign(v · plane_b). ``planes`` is a small
    driver-side list of random hyperplanes (deterministic seed upstream).
    Candidate search restricts cosine scoring to the probe's bucket
    (± multi-probe neighbors), turning the all-pairs scan into a
    bucket-equi-join — the scale path for ANN."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket.bitwiseOR(
            F.when(
                dot(vec_col, pl) >= 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def ivf_build(
    df: DataFrame,
    vec_col: str,
    n_clusters: "int | str" = 16,
    seed: int = 42,
):
    """Build an IVF (inverted-file) index: one Spark ML KMeans fit + a
    cluster-id column on the corpus. Returns ``(centers, assigned)`` —
    centers as a plain ``n_clusters × d`` float list (a codelist-sized
    model artifact, carried driver-side) and the corpus with ``__c``.

    Split out of :func:`ivf_topk` so the index is built ONCE and
    amortized across queries — the deployment shape at 100 TB, where
    ``assigned`` is written back partitioned/clustered by ``__c`` and
    each query scans ~n_probe/n_clusters of the data. Persist (or
    write) ``assigned`` before issuing queries.

    ``n_clusters='auto'`` (one count job; r13 footgun sweep) sizes
    k = max(16, ⌈n/4096⌉) so each inverted list stays ~4k vectors —
    the fixed-16 default at 10M vectors makes every probe scan 625k
    rows (silently-lossy *latency*, not recall, but the same
    fixed-default-outgrown-by-n class as hard_negatives bits=4)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_clusters == "auto":
        import math as _math

        n_clusters = max(16, int(_math.ceil(df.count() / 4096.0)))
    corpus = df.withColumn("__v", array_to_vector(_dvec(vec_col)))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="__v", predictionCol="__c")
    model = km.fit(corpus)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    return centers, model.transform(corpus).drop("__v")


def ivf_query(
    assigned: DataFrame,
    centers,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    n_probe: int = 2,
    k: int = 10,
) -> DataFrame:
    """Query a prebuilt IVF index (:func:`ivf_build`): rank centers by
    distance to the probe driver-side (n_clusters rows — a codelist),
    scan only the ``n_probe`` nearest clusters, exact cosine within.
    Recall grows with ``n_probe``; n_probe == n_clusters degenerates to
    the exact scan."""
    import math

    head = probe.select(vec_col).take(1)
    if not head:
        return assigned.select(
            F.col(id_col), F.lit(0.0).alias("cosine_sim")
        ).where(F.lit(False))
    pvec = [float(x) for x in head[0][0]]
    dists = [
        (ci, math.dist(pvec, list(c))) for ci, c in enumerate(centers)
    ]
    nearest = [ci for ci, _ in sorted(dists, key=lambda t: t[1])[:n_probe]]

    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("__probe_id"), F.col(vec_col).alias("__probe_vec")
        )
    )
    cand = assigned.where(F.col("__c").isin(nearest)).crossJoin(p).where(
        F.col(id_col) != F.col("__probe_id")
    )
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(vec_col, "__probe_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    n_probe: int = 2,
    k: int = 10,
    seed: int = 42,
) -> DataFrame:
    """One-shot IVF ANN: :func:`ivf_build` + :func:`ivf_query`. For
    repeated queries build the index once and call ``ivf_query`` —
    the fit dominates single-query latency (measured in the
    --ann-table rehearsal)."""
    head = probe.select(vec_col).take(1)
    if not head:
        # before the KMeans fit: an empty probe must not pay an index build
        return df.select(
            F.col(id_col), F.lit(0.0).alias("cosine_sim")
        ).where(F.lit(False))
    centers, assigned = ivf_build(df, vec_col, n_clusters, seed)
    return ivf_query(assigned, centers, probe, id_col, vec_col, n_probe, k)


def bucketed_topk(
    df: DataFrame,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    k: int = 10,
    multi_probe: int = 0,
    prebucketed: bool = False,
) -> DataFrame:
    """ANN top-k: score only vectors in the probe's LSH bucket(s). Recall
    depends on bucket bits and ``multi_probe``: with m > 0 the probe also
    searches every bucket within Hamming distance m of its own (the
    standard multi-probe LSH recall knob — each extra bit of probing
    roughly doubles candidates and recovers neighbors that fell on the
    wrong side of one hyperplane). multi_probe = len(planes) degenerates
    to the exact scan.

    ``prebucketed=True``: ``df`` already carries ``__bucket`` (from
    ``hyperplane_lsh_bucket`` with the SAME planes) — the amortized
    deployment shape, mirroring ivf_build/ivf_query: assign buckets
    once, persist (or write partitioned by bucket for scan pruning),
    then serve queries without re-deriving the index. The --ann-table
    rehearsal showed per-query bucket recomputation costing more than
    the exact scan at 50k vectors."""
    import itertools

    with_b = (
        df
        if prebucketed
        else df.withColumn("__bucket", hyperplane_lsh_bucket(vec_col, planes))
    )
    # probe-side bucket list: own bucket XOR every bit-mask of weight <= m
    # (a driver-side literal array — len(planes) is small by construction)
    masks = [0]
    for m in range(1, multi_probe + 1):
        for bits in itertools.combinations(range(len(planes)), m):
            masks.append(sum(1 << b for b in bits))
    own = hyperplane_lsh_bucket(vec_col, planes)
    p = probe.select(
        F.col(id_col).alias("__probe_id"),
        F.col(vec_col).alias("__probe_vec"),
        F.explode(
            F.array(*[own.bitwiseXOR(F.lit(m).cast("long")) for m in masks])
        ).alias("__bucket"),
    )
    cand = with_b.join(F.broadcast(p), "__bucket").where(
        F.col(id_col) != F.col("__probe_id")
    )
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(vec_col, "__probe_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    max_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT all-pairs form — the
    verification path (quadratic; the scale path is
    ``cosine_lsh_pairs``). Like d2's Jaccard guard, ``max_rows`` is an
    explicit input contract: exceeding it fails fast instead of silently
    launching an n² join."""
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"{n} vectors exceeds max_rows={max_rows} for exact "
                "all-pairs cosine; use cosine_lsh_pairs"
            )
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    sim = cosine("__va", "__vb")
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(sim, 6))
        .where(sim >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def _sign_lsh_banded(vecs: DataFrame, band_planes) -> DataFrame:
    """(__id, __band, __bucket) band frame over a (__id, __vec) input —
    deliberately vector-free so the (band, bucket) candidate self-join
    shuffles ~24 B/row/band regardless of embedding width."""
    return vecs.select(
        "__id",
        F.posexplode(
            F.array(
                *[hyperplane_lsh_bucket("__vec", planes)
                  for planes in band_planes]
            )
        ).alias("__band", "__bucket"),
    )


def _auto_bits(
    n_rows: int,
    bands: int,
    max_bucket: int | None,
    min_bucket: float = 8.0,
    budget: float = 10_000_000,
    tail_factor: float = 1.0,
) -> int:
    """Size sign-LSH bits from TWO bounds (the r12 hard_negatives
    scale-bug fix, generalized r13): expected bucket population under
    ``max_bucket`` (the per-bucket guard must not fire on the AVERAGE
    bucket) AND total raw candidate volume (≈ bands·n·bucket_rows/2 ·
    ``tail_factor``) under ``budget`` rows — sign-LSH bucket sizes are
    heavy-tailed on natural data, so realized volume lands several
    times the uniform estimate, and the factor RISES with n at fixed
    avg-bucket aim (r13: 5.4× at 500k/bits=16; r14 rungs: 2.42× at
    2M/bits=18, 3.27× at 2M/bits=21, 4.08× at 5M/bits=23). A fixed
    default past
    n ≈ 2^bits·max_bucket makes EVERY bucket hot and ``on_hot='drop'``
    silently empties the result (measured at 200k vectors / bits=4).

    Two calling profiles (r14, the 2M-rung finding):
    - **miner** (:func:`hard_negatives`, the defaults): ``min_bucket=8``
      keeps buckets occupied enough for mid-similarity candidate
      recall; past ~400k vectors the volume then grows LINEARLY in n
      (≈ bands·n·8/2) and the clamp routing bounds it — dropping tail
      buckets is the miner's accepted trade.
    - **near-dup search** (:func:`cosine_lsh_pairs` auto,
      ``min_bucket=0.25``, ``tail_factor=6``): volume-first — near-dup
      pairs collide because they are angularly near-IDENTICAL, not
      because buckets are populous, so bits can grow with n until the
      tail-adjusted volume fits the budget with no clamping and no
      recall loss for the high-similarity pairs the operator is for
      (the r14 2M rung measured clamping costing 2/200 planted pairs
      under the old shared profile; the volume-first profile restored
      recall 1.0 with ~8× less candidate volume)."""
    import math as _math

    cap = float(max_bucket) if max_bucket else 2000.0
    b_target = max(
        float(min_bucket),
        min(cap, 2.0 * budget / (tail_factor * bands * max(n_rows, 1))),
    )
    return max(4, _math.ceil(_math.log2(max(n_rows / b_target, 2.0))))


def cosine_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    bands: int = 4,
    bits: "int | str" = 8,
    seed: int = 42,
    dim: int | None = None,
    storage_level=None,
    max_bucket: int | None = None,
    on_hot: str = "raise",
    max_candidates: int | None = 50_000_000,
    volume_route: str = "raise",
) -> DataFrame:
    """Embedding-cosine near-dup at scale: banded sign-LSH candidate
    generation + exact cosine verification — the vector twin of the
    MinHash text plan (shuffle on (band, bucket), never all-pairs).
    ``max_bucket``/``on_hot`` bound hot-bucket candidate explosion
    exactly as in ``dedup.lsh_band_pairs`` — a near-zero vector (or a
    duplicated embedding) crowds one bucket in every band and turns the
    self-join quadratic no matter how the shuffle splits.

    Each band hashes every vector with its own ``bits`` random
    hyperplanes; two vectors are candidates if ANY band agrees on all
    bits. P[band match] = (1 - θ/π)^bits for angle θ, so more bands →
    higher recall, more bits → higher precision of candidates. The
    exact cosine filter makes the OUTPUT exact over the candidate set.

    SIZE ``bits`` WITH THE CORPUS: there are only 2^bits buckets per
    band, so the AVERAGE bucket holds n / 2^bits vectors and the
    self-join emits Θ(bands · n² / 2^bits) candidates even with zero
    skew — at n = 250k, bits=8 means ~1k per bucket and ~half a
    billion candidate rows (measured: it spills the local disk dry).
    Rule: ``bits >= log2(n / target_bucket)`` with target_bucket in the
    low hundreds; ``max_bucket`` then only has to police the skewed
    tail (duplicate crowds), not the average case. Pass ``bits='auto'``
    (one count job) to apply :func:`_auto_bits` — the r13 footgun
    sweep's answer to the silently-empty regime where a fixed bits
    default plus ``on_hot='drop'`` drops EVERY bucket past
    n ≈ 2^bits·max_bucket; and when a drop DOES remove every bucket,
    the operator now raises instead of returning zero pairs.

    .. warning:: **Breaking default change in r13** — ``max_candidates``
       went from unguarded (None) to ``50_000_000``. A legitimately
       large run that previously completed past 5e7 estimated
       candidates now raises :class:`CandidateVolumeExceeded` (and so
       does :func:`hard_negatives`, which inherits this default
       transitively). Callers that want routing rather than failure
       must catch the typed exception or pass ``max_candidates=None``
       explicitly — the pattern is ``dedup.similarity_join``'s
       exact→LSH reroute, which catches exactly this exception on the
       text family. Rationale: the unguarded worst case killed the
       JVM at 500k vectors (below).

    ``max_candidates`` (r13, the d14 raw-volume guard ported): the
    WORST-case candidate volume is bands·n·max_bucket/2 — INDEPENDENT
    of bits, because sign-LSH buckets on natural data are not
    equal-measure and the surviving buckets can all sit at the
    ``max_bucket`` cap (measured at 500k vectors / max_bucket=2000:
    ~3e9 candidate rows whose two-sided vector verify join killed the
    JVM while the average-bucket arithmetic predicted 9e7). Before the
    self-join, Σ m·(m−1)/2 over the KEPT buckets is estimated from the
    (cheap, bucket-count-sized) sizes frame and the operator raises if
    it exceeds the budget — lower ``max_bucket``, raise ``bits``, or
    pre-dedup. None disables.

    ``volume_route`` (r14, VERDICT r13 #1): ``'raise'`` (default)
    keeps the typed-exception contract above; ``'clamp'`` converts the
    guard into ROUTING — from the REALIZED bucket-size distribution
    (the sizes frame is exact, unlike the uniform estimate that landed
    several× low in r13) pick the largest per-bucket cap whose
    kept-bucket Σ m(m−1)/2 fits ``max_candidates/2``, and drop the
    buckets above it. The exact arithmetic means the backstop raise
    can no longer fire; the trade is candidate RECALL in the hot tail
    (near-dup crowds — exact-dedup first recovers them), which is the
    miner's standing trade, so :func:`hard_negatives` defaults to it.
    Requires ``on_hot='drop'`` (clamping IS dropping); still raises
    :class:`~ixmp_spark.operators.dedup.CandidateVolumeExceeded` in
    the degenerate regime where even size-2 buckets alone exceed the
    budget (only possible past n·bands/2 > budget — pre-dedup or
    shard).

    Shuffle discipline: the banded self-join carries ONLY
    (id, band, bucket) — never the vectors — so exchange volume is
    rows × bands × ~24 B regardless of embedding width. Vectors are
    joined back from the persisted (id, vec) projection only for the
    deduplicated candidate pairs, the same join-back-from-``sh``
    pattern as ``minhash_lsh_neardup``.

    ``dim`` may be passed to skip the 1-row probe job; when the corpus
    is empty an empty pairs frame is returned. ``storage_level`` picks
    the persist level for the (id, vec) and banded intermediates
    (default MEMORY_AND_DISK; cluster runs over wide embeddings may
    prefer DISK_ONLY)."""
    import random

    from pyspark import StorageLevel

    if on_hot not in ("raise", "drop"):
        # validate BEFORE any persist: failing later would leak the
        # vecs/banded caches (the fail-fast/no-leak guard discipline)
        raise ValueError(f"on_hot must be 'raise' or 'drop', got {on_hot!r}")
    if volume_route not in ("raise", "clamp"):
        raise ValueError(
            f"volume_route must be 'raise' or 'clamp', got {volume_route!r}"
        )
    if volume_route == "clamp" and on_hot != "drop":
        raise ValueError(
            "volume_route='clamp' drops over-cap buckets and therefore "
            "requires on_hot='drop'"
        )
    if storage_level is None:
        storage_level = StorageLevel.MEMORY_AND_DISK
    if dim is None:
        head = df.select(vec_col).take(1)
        if not head:
            return df.select(
                F.col(id_col).alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(0.0).alias("cosine_sim"),
            ).where(F.lit(False))
        dim = len(head[0][0])
    if bits == "auto":
        # near-dup profile: volume-first (min_bucket=1) aimed at HALF
        # the guard with 6× tail headroom — the measured heavy-tail
        # factor RISES with n (r14 rung curve: 3.27 at 2M/bits=21,
        # 4.08 at 5M/bits=23), so the old 4× sat exactly at the 5M
        # realization; see _auto_bits
        bits = _auto_bits(
            df.count(), bands, max_bucket,
            min_bucket=0.25,
            budget=(max_candidates or 50_000_000) / 2.0,
            tail_factor=6.0,
        )
    rng = random.Random(seed)
    band_planes = [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(bits)]
        for _ in range(bands)
    ]
    # per-vector norm into the persisted frame (r15, the semantic_dedup
    # hoist): the verify expression is evaluated twice per candidate
    # (rounded projection + threshold filter — the pushed-filter
    # duplicate-eval class), so dropping the two norm folds from it
    # removes 4 of 6 per-candidate array folds. Bit-identical values.
    vecs = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"),
        norm(F.col(vec_col)).alias("__nrm"),
    ).persist(storage_level)
    banded = _sign_lsh_banded(vecs, band_planes).persist(storage_level)
    cached = banded  # release handle (the drop branch rebinds `banded`)
    if max_bucket is not None or max_candidates is not None:
        # ONE aggregation pass decides all three guards (r13 review:
        # the first form ran up to three sizes-shaped jobs), and all
        # fail-fast paths unpersist the REAL cache handle (``cached``),
        # not the possibly-rebound ``banded``. The volume estimate is
        # the KEPT-bucket Σ m(m−1)/2 — the actual self-join output,
        # not the average-bucket estimate (worst case is
        # bands·n·max_bucket/2 regardless of bits; see docstring).
        sizes = banded.groupBy("__band", "__bucket").agg(
            F.count(F.lit(1)).alias("__n")
        )
        if volume_route == "clamp" and max_candidates is not None:
            # EXACT realized-volume routing (r14): the per-size-class
            # cumulative Σ m(m−1)/2 over the (bucket-count-sized,
            # further collapsed to ≤ distinct-sizes rows) sizes frame
            # picks the largest cap that fits HALF the budget — the
            # other half stays headroom for the dedup/verify join's
            # own skew. One extra tiny job; the global-order window
            # runs over an aggregate, so the SinglePartition exchange
            # is bounded (the audit's _BOUNDED_SOURCES rule).
            from pyspark.sql import Window as _W

            _cum_w = _W.orderBy("__n").rowsBetween(
                _W.unboundedPreceding, 0
            )
            fit = (
                sizes.groupBy("__n")
                .agg(F.count(F.lit(1)).alias("_c"))
                .select(
                    "__n",
                    F.sum(
                        F.col("_c").cast("double")
                        * F.col("__n").cast("double")
                        * (F.col("__n").cast("double") - 1.0)
                        / 2.0
                    )
                    .over(_cum_w)
                    .alias("_cum"),
                )
                .where(F.col("_cum") <= max_candidates / 2.0)
                .agg(F.max("__n"))
                .collect()[0][0]
            )
            if fit is None or fit < 2:
                cached.unpersist()
                vecs.unpersist()
                from ixmp_spark.operators.dedup import (
                    CandidateVolumeExceeded,
                )

                raise CandidateVolumeExceeded(
                    "cosine_lsh_pairs: volume_route='clamp' found no "
                    f"per-bucket cap ≥ 2 fitting max_candidates="
                    f"{max_candidates}/2 — even the size-2 buckets "
                    "alone exceed the budget (n·bands/2 > budget): "
                    "exact-dedup first, shard the corpus, or raise "
                    "max_candidates"
                )
            if max_bucket is None or int(fit) < max_bucket:
                max_bucket = int(fit)
        kept_pred = (
            F.col("__n") <= max_bucket
            if max_bucket is not None
            else F.lit(True)
        )
        st = sizes.agg(
            F.count(F.lit(1)).alias("_total"),
            F.count(F.when(kept_pred, 1)).alias("_kept"),
            F.sum(
                F.when(
                    kept_pred,
                    F.col("__n").cast("double")
                    * (F.col("__n").cast("double") - 1.0)
                    / 2.0,
                )
            ).alias("_vol"),
        ).collect()[0]
        n_total = st["_total"] or 0
        n_kept = st["_kept"] or 0
        vol = st["_vol"] or 0.0
        if max_bucket is not None and n_total > n_kept:
            if on_hot == "raise":
                hot = (
                    sizes.where(F.col("__n") > max_bucket).limit(5).collect()
                )
                cached.unpersist()
                vecs.unpersist()
                raise ValueError(
                    f"LSH buckets over max_bucket={max_bucket}: "
                    f"{[((r['__band'], r['__bucket']), r['__n']) for r in hot]}; "
                    'use on_hot="drop" or raise bands/bits'
                )
            # on_hot == "drop" (validated at entry)
            if n_kept == 0:
                # the silently-empty regime (r12 hard_negatives bug
                # class): EVERY bucket is hot, so dropping them all
                # provably returns zero pairs — fail loud instead. An
                # EMPTY corpus (n_total == 0) never reaches here and
                # still returns an empty pairs frame.
                cached.unpersist()
                vecs.unpersist()
                raise ValueError(
                    f"every LSH bucket exceeds max_bucket={max_bucket} "
                    f"(bits={bits}, bands={bands}): on_hot='drop' would "
                    "return ZERO pairs; use bits='auto' or raise bits"
                )
            banded = banded.join(
                sizes.where(kept_pred).select("__band", "__bucket"),
                ["__band", "__bucket"],
                "left_semi",
            )
        if max_candidates is not None and vol > max_candidates:
            cached.unpersist()
            vecs.unpersist()
            from ixmp_spark.operators.dedup import CandidateVolumeExceeded

            raise CandidateVolumeExceeded(
                f"cosine_lsh_pairs: estimated raw candidate volume "
                f"{int(vol)} (Σ per-bucket m(m−1)/2 over kept buckets) "
                f"exceeds max_candidates={max_candidates} — lower "
                "max_bucket (hot buckets are near-dup crowds: exact-"
                "dedup first), raise bits, or raise the threshold"
            )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = cand.join(
        vecs.select(
            F.col("__id").alias("id_a"), F.col("__vec").alias("__va"),
            F.col("__nrm").alias("__na"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col("__id").alias("id_b"), F.col("__vec").alias("__vb"),
            F.col("__nrm").alias("__nb"),
        ),
        "id_b",
    )
    sim = dot("__va", "__vb") / (F.col("__na") * F.col("__nb"))
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        pairs.withColumn("cosine_sim", F.round(sim, 6))
        .where(sim >= threshold)
        .select("id_a", "id_b", "cosine_sim"),
        vecs,
        cached,
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: "int | str" = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): KMeans-
    partition the embedding space, find cosine-similar pairs WITHIN each
    cluster only, connect them into components, and return every vector
    with its component representative (the min id; singletons represent
    themselves).

    The cluster assignment is the blocking key — the quadratic pair
    search runs per cluster, so total work is Σ|cluster|² instead of
    N². ``max_cluster`` is the same fail-fast input contract as
    jaccard_block_pairs/cosine_neardup_pairs: a degenerate clustering
    (one hot cluster) raises with the size rather than silently running
    an n² join. At corpus scale, raise ``n_clusters`` so the expected
    cluster size stays bounded — or pass ``n_clusters='auto'`` (one
    count job; the r13 footgun sweep): k = max(16, ⌈n/4096⌉), and
    ⌈n/(max_cluster/2)⌉ when ``max_cluster`` is set, so the AVERAGE
    cluster sits at half the guard and the fixed-16 default can't turn
    silently quadratic (16 clusters at 10M vectors = 625k-row clusters
    = 4e11 within-cluster pairs). The pair join shuffles (id, 8 B
    cluster) plus one vector copy per side within each cluster only.

    Output: (id, rep_id, cluster) — ``rep_id == id`` for kept
    representatives; dropping duplicates = ``where(rep_id == id)``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ixmp_spark.operators.dedup import dedup_clusters

    if n_clusters == "auto":
        import math as _math

        target = (max_cluster / 2.0) if max_cluster else 4096.0
        n_clusters = max(16, int(_math.ceil(df.count() / target)))
    if n_clusters < 2:
        raise ValueError("n_clusters must be >= 2 (Spark ML KMeans contract)")
    corpus = df.select(
        F.col(id_col), F.col(vec_col).alias("__vec")
    ).withColumn("__v", array_to_vector(_dvec("__vec")))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="__v", predictionCol="__c")
    # per-vector norm computed ONCE into the persisted frame (r15):
    # cosine's norm folds are per-vector, not per-pair — inside the
    # within-cluster quadratic verify they re-ran (with their defensive
    # double-casts) for both sides of every candidate pair, tripling
    # the per-pair fold work. Same expression on the same array ⇒ the
    # same double, so sim values are bit-identical.
    assigned = (
        km.fit(corpus)
        .transform(corpus)
        .select(id_col, "__vec", "__c", norm("__vec").alias("__nrm"))
        .persist()
    )
    try:
        if max_cluster is not None:
            hot = (
                assigned.groupBy("__c")
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > max_cluster)
                .limit(5)
                .collect()
            )
            if hot:
                raise ValueError(
                    f"clusters over max_cluster={max_cluster}: "
                    f"{[(r['__c'], r['n']) for r in hot]}; raise n_clusters"
                )
        a = assigned.select(
            F.col(id_col).alias("id_a"), F.col("__vec").alias("__va"),
            F.col("__nrm").alias("__na"), "__c"
        )
        b = assigned.select(
            F.col(id_col).alias("id_b"), F.col("__vec").alias("__vb"),
            F.col("__nrm").alias("__nb"), "__c"
        )
        sim = dot("__va", "__vb") / (F.col("__na") * F.col("__nb"))
        pairs = (
            a.join(b, "__c")
            .where(F.col("id_a") < F.col("id_b"))
            .where(sim >= threshold)
            .select("id_a", "id_b")
        )
        labels = dedup_clusters(pairs).select(
            F.col("id").alias(id_col), F.col("cluster").alias("rep_id")
        )
        # the cache stays alive backing the returned plan (the d2/d3/e5
        # persist discipline — unpersisting here would make the caller's
        # action recompute the KMeans transform); it evicts under memory
        # pressure via the MEMORY_AND_DISK default, and long sessions can
        # free it explicitly after materializing the result:
        # ``ixmp_spark.operators.release_cache(out)``.
        from ixmp_spark.operators import attach_caches

        return attach_caches(
            assigned.join(labels, id_col, "left")
            .select(
                id_col,
                F.coalesce("rep_id", F.col(id_col)).alias("rep_id"),
                F.col("__c").alias("cluster"),
            ),
            assigned,
        )
    except BaseException:
        assigned.unpersist(False)
        raise


def pq_train_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    bits: int = 4,
    seed: int = 42,
    train_fraction: float | None = None,
):
    """Product quantization (Jégou et al. 2011): split each dim-``d``
    vector into ``m`` subvectors, learn a ``2**bits``-centroid KMeans
    codebook per subspace, and encode every vector as ``m`` small codes.

    Returns ``(codebooks, codes_df)``:

    - ``codebooks`` — ``m × 2**bits × d/m`` nested float list. A MODEL
      ARTIFACT (for d=64, m=8, bits=4: 1024 floats), carried driver-side
      and embedded as literals, never joined.
    - ``codes_df`` — ``(id, codes array<int>)``: the compressed corpus,
      ``m·bits`` bits of payload per vector vs ``32·d`` for raw floats
      (32× at d=64/m=8/bits=4). THIS is what PQ buys at 100 TB: the
      whole corpus' codes fit where 3 TB of raw vectors cannot, and an
      ANN scan becomes memory-bandwidth over bytes.

    Encoding is pure Catalyst: per subspace, squared distances to the
    2**bits literal centroids via ``transform`` + ``aggregate`` folds,
    argmin via ``array_position(.., array_min(..))`` — no Python on the
    corpus. Training fits ``m`` KMeans models (one per subspace) on a
    sample (``train_fraction``; codebooks need ~1e3 points per centroid,
    not the corpus — at 100 TB ALWAYS sample)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n_cent = 1 << bits
    head = df.select(F.size(_dvec(vec_col)).alias("d")).take(1)
    if not head:
        raise ValueError("pq_train_encode: empty corpus")
    d = head[0]["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m

    train = df if train_fraction is None else df.sample(train_fraction, seed)
    train = train.select(_dvec(vec_col).alias("__v")).persist()
    try:
        # fail actionably BEFORE fitting: a thin sample (fewer rows than
        # centroids) dies inside KMeans with a cryptic error. The count
        # reads the frame we just persisted, so the pass is not wasted —
        # every per-subspace fit below reuses the cache.
        n_train = train.count()
        if n_train < n_cent:
            raise ValueError(
                f"pq_train_encode: training sample has {n_train} rows but "
                f"each subspace codebook needs >= 2**bits = {n_cent} "
                f"centroids; raise train_fraction (got {train_fraction}) "
                "or lower bits"
            )
        # the m per-subspace fits are independent and all read the one
        # persisted training cache — submit them CONCURRENTLY (Spark
        # supports multi-threaded job submission on one context; fixed
        # per-subspace seeds keep every codebook deterministic
        # regardless of scheduling). Sequential fits serialized m
        # rounds of KMeans' many tiny jobs behind one driver loop;
        # overlapping them cut e7_embed_pq from 8.2 s to ~3 s at
        # sf0.01. Workers capped: each fit's jobs still fan out over
        # the executor pool, so more threads than ~cores/4 just queue.
        from concurrent.futures import ThreadPoolExecutor

        def _fit(j: int) -> list[list[float]]:
            sl = train.select(
                array_to_vector(
                    F.slice("__v", j * sub + 1, sub)
                ).alias("__s")
            )
            # random init, not k-means|| — the parallel init runs extra
            # distributed passes per fit that cost more than the whole
            # Lloyd refinement at codebook scale (profiled: 2.8 s vs
            # 1.3 s per fit), and a fixed seed keeps it deterministic.
            # Codebooks are 16-centroid quantizers refined by Lloyd
            # anyway; init quality washes out.
            km = KMeans(
                k=n_cent, seed=seed + j, featuresCol="__s",
                predictionCol="__c", initMode="random",
            )
            return [
                [float(x) for x in c] for c in km.fit(sl).clusterCenters()
            ]

        with ThreadPoolExecutor(max_workers=min(m, 8)) as ex:
            codebooks = list(ex.map(_fit, range(m)))
    finally:
        train.unpersist()

    def _code(j: int) -> Column:
        cents = F.array(
            *[
                F.array(*[F.lit(x) for x in c])
                for c in codebooks[j]
            ]
        )
        s = F.slice(_dvec(vec_col), j * sub + 1, sub)
        dists = F.transform(
            cents,
            lambda c: F.aggregate(
                F.zip_with(s, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    codes = df.select(
        F.col(id_col),
        F.array(*[_code(j) for j in range(m)]).alias("codes"),
    )
    return codebooks, codes


def pq_topk(
    codes_df: DataFrame,
    codebooks,
    probe_vec,
    id_col: str,
    k: int = 10,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN query over a PQ-encoded corpus by asymmetric distance (ADC):
    the probe stays a raw vector; per subspace the probe→centroid
    squared distances form an ``m × 2**bits`` lookup table (computed
    driver-side — it is tiny — and embedded as literals), and each
    corpus vector's approximate squared L2 is the sum of ``m`` LUT
    lookups indexed by its codes. The scan is map-only over the
    compressed codes + TakeOrderedAndProject — no shuffle, no join,
    no decompression.

    ``rerank=R`` (with ``vectors=``) upgrades to the standard two-stage
    search: top-``R`` candidates by ADC, then EXACT squared L2 on just
    those R raw vectors (an R-row broadcast-side join back to the
    corpus). With R ≥ corpus size this degenerates to exact search —
    which is how the test pins correctness. Output: (id, dist2) by
    ascending distance, ties by id."""
    m = len(codebooks)
    pv = [float(x) for x in probe_vec]
    sub = len(pv) // m
    lut = [
        [
            sum(
                (pv[j * sub + t] - c[t]) ** 2 for t in range(sub)
            )
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in lut]
    )
    approx = F.aggregate(
        F.zip_with(
            lut_lit,
            F.col("codes"),
            lambda row, code: F.element_at(row, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = codes_df.select(F.col(id_col), approx.alias("dist2"))
    if rerank is None:
        return scored.orderBy(F.asc("dist2"), F.asc(id_col)).limit(k).select(
            id_col, F.round("dist2", 6).alias("dist2")
        )
    if vectors is None:
        raise ValueError("rerank requires the raw vectors frame")
    cand = scored.orderBy(F.asc("dist2"), F.asc(id_col)).limit(rerank)
    probe_lit = F.array(*[F.lit(x) for x in pv])
    exact = F.aggregate(
        F.zip_with(
            _dvec(vec_col), probe_lit, lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        F.broadcast(cand.select(id_col))
        .join(vectors, id_col)
        .select(F.col(id_col), F.round(exact, 6).alias("dist2"))
        .orderBy(F.asc("dist2"), F.asc(id_col))
        .limit(k)
    )


def hard_negatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    min_sim: float = 0.4,
    max_sim: float = 0.9,
    bands: int = 6,
    bits: "int | str" = 4,
    seed: int = 42,
    max_bucket: int | None = 2000,
    on_hot: str = "drop",
    max_candidates: int | None = 20_000_000,
    volume_route: str = "clamp",
) -> DataFrame:
    """Hard-negative mining for contrastive training data: for each
    anchor, up to ``k`` MID-similarity neighbors — cosine in
    ``[min_sim, max_sim)`` — similar enough to be informative
    negatives, excluded above ``max_sim`` because near-duplicates are
    unlabeled positives, not negatives (the standard dedup-before-
    negatives rule in contrastive-pair pipelines).

    Plan: banded sign-LSH candidates at ``threshold=min_sim`` (NOTE the
    knob inversion vs near-dup search: mid-similarity pairs need
    COARSER bands — P[band match] = (1-θ/π)^bits, so fewer bits per
    band keep ~60°-apart vectors colliding; bits=4/bands=6 gives ~0.7
    candidate recall at cosine 0.5 where the near-dup defaults would
    give ~0.1), exact-cosine verified, band-filtered to
    ``< max_sim``, symmetrized (each pair serves both ends as anchor),
    then a per-anchor top-k window — rank-limited, so Spark's
    WindowGroupLimit keeps O(k) rows per anchor per task, never a
    global sort. Inherits cosine_lsh_pairs' hot-bucket guards.

    SCALE NOTE (r12 ANN rehearsal finding): with ``bits=4`` each band
    has only 16 buckets, so bucket population is ~n/16 — past
    n ≈ 16·max_bucket EVERY bucket is hot and the default
    ``on_hot='drop'`` returned ZERO pairs silently (measured at 200k
    vectors / max_bucket=2000; since r13 the all-dropped regime raises
    loudly in cosine_lsh_pairs). Pass ``bits='auto'`` to size bits from
    TWO bounds: expected bucket population under ``max_bucket`` (the
    per-bucket guard) AND total raw candidate volume
    (≈ bands·n·bucket_rows/2) under ~1e7 rows — well under the 5e7
    guard budget, because sign-LSH bucket sizes are heavy-tailed on
    natural data and the realized Σ m(m−1)/2 lands several times the
    uniform estimate (measured: 21.5M realized at 500k vectors where
    the uniform arithmetic said ~4M) — the d14 budget scaled
    to ~1 KB vector verify rows (r13: 2e8 rows of two-sided 64-dim
    joins is ~200 GB of shuffle — measured filling local tmpfs) —
    budget; a first auto rule honoring only max_bucket picked bits=7
    at 200k vectors and the ~1e9-row verify OOMed the JVM. And bits
    alone is not enough (r13, found live at 500k): the WORST-case
    volume is bands·n·max_bucket/2 regardless of bits — sign-LSH
    buckets are not equal-measure, so kept buckets can all sit at the
    cap — and auto mode therefore also lowers the effective
    ``max_bucket`` to the same ~1e7 aim under ``on_hot='drop'``.
    Per-pair candidate recall drops with bits and the tighter cap, but
    a MINER wants bounded, valid negatives — fewer candidates is an
    acceptable trade, an empty result (or an OOM) is not.

    r14 (VERDICT r13 #1, the 2M/5M rehearsal): the r13 auto rule
    tightened ``max_bucket`` from the UNIFORM volume arithmetic
    (``2e7/(bands·n)`` with a floor of 64) — but realized sign-LSH
    volume lands several× the uniform estimate, so past ~1–2M vectors
    the 5e7 backstop guard still fired. The heuristic is replaced by
    ``volume_route='clamp'`` (default here): :func:`cosine_lsh_pairs`
    now derives the cap from the REALIZED bucket-size distribution so
    the kept-bucket Σ m(m−1)/2 provably fits ``max_candidates/2``
    (default 2e7 → the documented ~1e7 verify-join aim) at ANY corpus
    size — the guard became routing, exact by construction. Pass
    ``volume_route='raise'`` to restore fail-loud; a non-'drop'
    ``on_hot`` implies it (clamping IS dropping).

    BUDGET SCALING (r14 rung curve): under the FIXED default budget
    the realized clamp cap falls as n grows — 9 at 2M, 5 at 5M, 3 at
    10M vectors (REHEARSAL_ann_r14_*) — because total collision volume
    grows superlinearly while the budget stands still, so per-anchor
    candidate depth thins toward the bucket-pair floor. On a cluster,
    scale ``max_candidates`` ≈ 4·n (≈ 4 KB of verify shuffle per
    corpus row at 64-dim) to hold per-anchor depth roughly constant;
    the single-box default is sized for the rehearsal host's tmpfs."""
    if bits == "auto":
        n_rows = df.count()
        bits = _auto_bits(n_rows, bands, max_bucket)
    if on_hot != "drop":
        volume_route = "raise"
    pairs = cosine_lsh_pairs(
        df, id_col, vec_col, threshold=min_sim, bands=bands, bits=bits,
        seed=seed, max_bucket=max_bucket, on_hot=on_hot,
        max_candidates=max_candidates, volume_route=volume_route,
    ).where(F.col("cosine_sim") < max_sim)
    # symmetrize map-side with one explode (r15, the dedup_clusters
    # class): the two union branches each re-executed the ENTIRE
    # unpersisted LSH candidate-join + cosine-verify lineage; explode
    # emits both directions from one evaluation — same row multiset
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("anchor_id"),
                    F.col("id_b").alias("negative_id"),
                ),
                F.struct(
                    F.col("id_b").alias("anchor_id"),
                    F.col("id_a").alias("negative_id"),
                ),
            )
        ).alias("__s"),
        "cosine_sim",
    ).select("__s.anchor_id", "__s.negative_id", "cosine_sim")
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("negative_id")
    )
    return (
        sym.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def lsh_index_write(
    df: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
) -> None:
    """Materialize the sign-LSH index AS STORAGE LAYOUT: assign buckets
    once and write parquet PARTITIONED BY bucket. This is where
    prebucketing actually pays: a query against the written index reads
    only its probe buckets' directories (partition pruning — the scan
    never opens the other ~2^bits of the corpus), which an in-memory
    cache cannot do (measured in the --ann-table rehearsal: a cached
    prebucketed frame still scans everything). One shuffle to cluster
    bucket files together; at 100 TB this is the build-once index job."""
    (
        df.withColumn("bucket", hyperplane_lsh_bucket(vec_col, planes))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def lsh_index_topk(
    spark,
    path: str,
    probe_vec,
    planes: list[list[float]],
    id_col: str,
    vec_col: str = "embedding",
    k: int = 10,
    multi_probe: int = 0,
    exclude_id=None,
) -> DataFrame:
    """ANN top-k against a written LSH index (:func:`lsh_index_write`):
    compute the probe's bucket set DRIVER-SIDE (the probe is one
    vector; planes are literals), then read the index with
    ``bucket IN (...)`` — a partition-pruning predicate, so only the
    matching bucket directories are listed and scanned — and rank by
    exact cosine. ``.explain`` shows the pruned ``PartitionFilters``;
    the test asserts the scan's partition count equals the probe set,
    not the corpus."""
    import itertools

    pv = [float(x) for x in probe_vec]
    own = 0
    for b, plane in enumerate(planes):
        s = sum(x * y for x, y in zip(pv, plane))
        if s >= 0:
            own |= 1 << b
    buckets = {own}
    for m in range(1, multi_probe + 1):
        for bits_ in itertools.combinations(range(len(planes)), m):
            buckets.add(own ^ sum(1 << b for b in bits_))
    probe_col = F.array(*[F.lit(x) for x in pv])
    scan = spark.read.parquet(path).where(
        F.col("bucket").isin(*[int(b) for b in buckets])
    )
    if exclude_id is not None:
        scan = scan.where(F.col(id_col) != exclude_id)
    return (
        scan
        .select(
            F.col(id_col),
            F.round(cosine(vec_col, probe_col), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def prototype_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    prune_frac: float = 0.25,
    seed: int = 42,
) -> DataFrame:
    """Prototypicality pruning — the density step of D4 (Tirumala et
    al. 2023, arXiv:2308.12284): KMeans-partition the embedding space,
    rank each point within its cluster by cosine similarity to the
    cluster centroid, and mark the top ``prune_frac`` MOST prototypical
    (closest-to-centroid) points for removal. Near-centroid points are
    the semantically redundant core of a dense region; dropping them
    diversifies the corpus beyond what pairwise near-dup removal
    (SemDeDup, :func:`semantic_dedup`) reaches.

    Plan shape for scale: the KMeans fit is a model artifact (sampled
    iterations, amortizable exactly like ivf_build's); the k×d centroid
    table is a broadcast join on the 4 B cluster id; the ranking is one
    window per cluster — partitions bounded by cluster size, the same
    blocking bound as semantic_dedup, with ``n_clusters`` as the knob.
    Vectors shuffle once (the assignment), never pairwise.

    Output: (id, cluster, proto_sim, kept) — ``kept = false`` for the
    pruned prototypical core; ``where(kept)`` is the surviving corpus.

    The cutoff is count-based — a cluster of n rows prunes exactly
    ``floor(prune_frac * n)`` of its most prototypical rows — not a
    ``percent_rank() >= prune_frac`` threshold, whose edges are wrong:
    percent_rank is 0 for every singleton cluster (always fully pruned)
    and for the top row of every cluster (pruned at any frac > 0), and
    its max is 1.0 (prune_frac=1.0 kept one row instead of zero). With
    floor, a singleton survives any frac < 1, frac=0 prunes nothing,
    and frac=1.0 prunes everything.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    if n_clusters < 2:
        raise ValueError("n_clusters must be >= 2 (Spark ML KMeans contract)")
    if not 0.0 <= prune_frac <= 1.0:
        raise ValueError("prune_frac must be in [0, 1]")
    corpus = df.select(
        F.col(id_col), F.col(vec_col).alias("__vec")
    ).withColumn("__v", array_to_vector(_dvec("__vec")))
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="__v", predictionCol="__c"
    ).fit(corpus)
    spark = df.sparkSession
    centers = spark.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "__c int, __center array<double>",
    )
    assigned = model.transform(corpus).select(id_col, "__vec", "__c")
    sim = cosine(_dvec("__vec"), F.col("__center"))
    # both windows share partitionBy(cluster) → one shuffle feeds both
    w = Window.partitionBy("cluster").orderBy(
        F.desc("__sim"), F.asc(id_col)
    )
    wc = Window.partitionBy("cluster")
    n_pruned = F.floor(F.count(F.lit(1)).over(wc) * prune_frac + 1e-9)
    return (
        assigned.join(F.broadcast(centers), "__c")
        .select(
            F.col(id_col),
            F.col("__c").alias("cluster"),
            F.round(sim, 6).alias("__sim"),
        )
        .select(
            id_col,
            "cluster",
            F.col("__sim").alias("proto_sim"),
            (F.row_number().over(w) > n_pruned).alias("kept"),
        )
    )


def pca_whiten(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    eps: float = 1e-9,
) -> "tuple[DataFrame, dict]":
    """PCA-whitening of an embedding column — the standard preprocessing
    before semantic clustering/dedup (SemDeDup, D4 and most ANN papers
    center + decorrelate + equalize variance first; raw encoder outputs
    have a few dominant directions that otherwise swamp cosine
    structure).

    Spark-first plan: mean-center (one tiny avg-per-dimension aggregate,
    broadcast back), fit :class:`pyspark.ml.feature.PCA` — whose
    covariance/Gramian accumulates distributed, one pass, no vectors on
    the driver beyond the k×d principal-component matrix — project, then
    one variance aggregate over the k projected dimensions scales each
    to unit variance (``eps`` guards degenerate directions). Two keyed
    aggregations + two map-only projections total; nothing quadratic,
    nothing driver-sized except k×d.

    Returns (frame, model_info): frame is (id, whitened array<double>
    of length k); model_info carries the centering means, the k
    per-dimension scales, and the explained-variance proportions —
    enough to whiten NEW vectors with the same transform (the
    build/query split ivf_build established).
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    dim = len(df.select(vec_col).first()[0])
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    means = [
        float(r)
        for r in df.select(
            F.array(*[
                F.avg(F.element_at(_dvec(vec_col), i + 1)) for i in range(dim)
            ]).alias("m")
        ).first()["m"]
    ]
    m_arr = F.array(*[F.lit(m) for m in means])
    centered = df.select(
        F.col(id_col),
        array_to_vector(
            F.zip_with(_dvec(vec_col), m_arr, lambda x, m: x - m)
        ).alias("__v"),
    )
    model = PCA(k=k, inputCol="__v", outputCol="__p").fit(centered)
    proj = model.transform(centered).select(
        id_col, vector_to_array("__p").alias("__p")
    )
    variances = [
        float(v)
        for v in proj.select(
            F.array(*[
                F.var_samp(F.element_at("__p", i + 1)) for i in range(k)
            ]).alias("v")
        ).first()["v"]
    ]
    scales = [1.0 / float((v + eps) ** 0.5) for v in variances]
    s_arr = F.array(*[F.lit(s) for s in scales])
    out = proj.select(
        id_col,
        F.zip_with("__p", s_arr, lambda x, s: F.round(x * s, 6)).alias(
            "whitened"
        ),
    )
    info = {
        "means": means,
        "scales": scales,
        "explained_variance": [float(x) for x in model.explainedVariance],
        "k": k,
        "dim": dim,
    }
    return out, info


def rrf_fuse(
    rankings,
    id_col: str,
    k: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of
    multiple bounded candidate lists — THE standard way to combine a
    lexical ranker (``bm25_search``) with an embedding ranker
    (``brute_force_topk`` / the ANN family) into one hybrid retrieval
    result without score calibration:

        ``rrf(d) = Σ_systems 1 / (k + rank_s(d))``

    with the conventional ``k = 60``; a document absent from a
    system's list simply contributes nothing. Rank-based fusion is
    what makes it robust: BM25 scores and cosine similarities live on
    incomparable scales, but their RANKS always fuse.

    ``rankings``: sequence of ``(name, df, score_col)`` where each
    ``df`` is a BOUNDED top-k candidate list (the output shape of the
    retrieval operators — TakeOrdered'd, ≤ k rows). Ranks are
    1-based ``row_number`` over (score desc, id asc) — computed over
    the already-bounded lists, so the single-partition window runs on
    dozens of rows, never the corpus; every heavy stage stayed inside
    the upstream retrieval operators. The fusion itself is one union
    + one groupBy on the id of candidate-list-sized frames.

    Output: (id, rrf_score, rank_<name>…) ordered by (score desc,
    id), limited to ``top_n`` when given. rrf_score is exact dyadic
    rational arithmetic on small integers — engine-reproducible
    without rounding.
    """
    from pyspark.sql import Window

    names = [name for name, _, _ in rankings]
    if len(set(names)) != len(names):
        raise ValueError("ranking names must be unique")
    tagged = None
    for name, df, score_col in rankings:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        part = df.select(
            F.col(id_col).alias("__id"),
            F.lit(name).alias("__sys"),
            F.row_number().over(w).cast("long").alias("__rank"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy("__id").agg(
        F.sum(1.0 / (F.lit(float(k)) + F.col("__rank"))).alias("rrf_score"),
        *[
            F.max(
                F.when(F.col("__sys") == name, F.col("__rank"))
            ).alias(f"rank_{name}")
            for name in names
        ],
    )
    out = fused.select(
        F.col("__id").alias(id_col), "rrf_score",
        *[f"rank_{n}" for n in names],
    ).orderBy(F.desc("rrf_score"), F.asc(id_col))
    return out.limit(top_n) if top_n is not None else out


def mips_topk(
    df: DataFrame,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by MAXIMUM INNER PRODUCT — the retrieval objective
    of recommender scoring and un-normalized two-tower models, where
    cosine is the WRONG metric (a long vector with middling angle can
    out-score a perfectly-aligned short one; popularity lives in the
    norm). Broadcast probe, map-only dot-product pass,
    TakeOrderedAndProject — e1's plan with the metric swapped.

    Output: (id, inner_product) rounded to 6, score-desc / id ties.
    """
    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("__probe_id"),
            F.col(vec_col).alias("__probe_vec"),
        )
    )
    scored = df.crossJoin(p)
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col("__probe_id"))
    return (
        scored.select(
            F.col(id_col),
            F.round(dot(vec_col, "__probe_vec"), 6).alias("inner_product"),
        )
        .orderBy(F.col("inner_product").desc(), F.col(id_col))
        .limit(k)
    )


def mips_augment(
    df: DataFrame,
    vec_col: str,
    out_col: str = "aug_vec",
    max_norm: float | None = None,
) -> DataFrame:
    """The MIPS → cosine reduction (Bachrach et al. 2014 / the
    Shrivastava–Li ALSH family): append one dimension
    ``sqrt(M² − ‖x‖²)`` to every corpus vector (M = the corpus max
    norm), after which every augmented vector has norm EXACTLY M — so
    cosine against a zero-padded probe orders candidates by raw inner
    product, and the whole sign-LSH / IVF cosine machinery becomes a
    MIPS index for free (probe side: pad with 0.0, see the pinning
    test).

    ``max_norm=None`` computes M with a 1-row aggregate broadcast
    (lazy — it rides the main job); pass a known bound to keep the
    plan fully map-only. Norms are clamped into M numerically
    (``greatest(M² − ‖x‖², 0)``): the max's own residual is
    mathematically 0 but can land an ulp negative, and sqrt must
    never see it.

    Output: input + ``out_col`` (double array, dim + 1).
    """
    n2 = F.aggregate(
        _dvec(vec_col), F.lit(0.0), lambda acc, x: acc + x * x
    )
    if max_norm is None:
        m2f = df.agg(F.max(n2).alias("__m2"))
        base = df.crossJoin(F.broadcast(m2f))
        m2 = F.col("__m2")
    else:
        base = df
        m2 = F.lit(float(max_norm) * float(max_norm))
    aug = F.concat(
        _dvec(vec_col),
        F.array(F.sqrt(F.greatest(m2 - n2, F.lit(0.0)))),
    )
    out = base.withColumn(out_col, aug)
    return out.drop("__m2") if max_norm is None else out


def mmr_rerank(
    df: DataFrame,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    lambda_: float = 0.7,
    candidates: int = 100,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    top-k results that balance relevance to the probe against
    redundancy with what's already picked —
    ``argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)``. The diversity
    pass every retrieval stack runs after ANN: without it, a top-10 of
    near-duplicates answers one question ten times (few-shot example
    selection and RAG context packing both need coverage, not echoes).

    Two stages with an honest distributed/driver split:

    1. candidate generation is the e1 scan — broadcast 1-row probe,
       map-only cosine over the corpus, ``TakeOrderedAndProject``
       keeps ``candidates`` rows. This is the stage that sees 100 TB.
    2. the greedy selection is inherently sequential (pick t+1 depends
       on picks 1..t), so it runs on the CANDIDATE SET ONLY — a
       (candidates × dim) block, bounded by construction like the
       BM25 query-term collects — as exact driver-side float64 math,
       then returns as a 1-partition frame.

    λ=1 reproduces pure relevance order; λ=0 is pure anti-redundancy.
    Ties (exact-duplicate scores) break by candidate rank so the
    output is deterministic. Output: (rank 1..k, id, relevance,
    mmr_score) in pick order.

    Reference-free extension (no ixmp counterpart); the operator is
    deliberately NOT oracle-paired — the greedy argmax chain is not
    expressible as set SQL — and is pinned instead by
    tests/test_scale.py::test_mmr_rerank_pinned (planted
    exact-duplicate demotion + λ=1 ≡ relevance-order equivalence).
    """
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    cand = (
        brute_force_topk(
            df, probe, id_col, vec_col, k=candidates, exclude_self=True
        )
        .join(df.select(id_col, vec_col), id_col)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .collect()
    )
    if not cand:
        return df.sparkSession.createDataFrame(
            [], f"rank int, {id_col} long, relevance double,"
            " mmr_score double"
        )
    import numpy as np

    ids = [r[id_col] for r in cand]
    rel = np.array([r["cosine_sim"] for r in cand], dtype=np.float64)
    mat = np.array([r[vec_col] for r in cand], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    unit = mat / norms[:, None]
    sims = unit @ unit.T  # candidate-candidate cosine, bounded k²
    picked: list[int] = []
    out_rows = []
    avail = list(range(len(ids)))
    for rank in range(1, min(k, len(ids)) + 1):
        if picked:
            redundancy = sims[np.ix_(avail, picked)].max(axis=1)
        else:
            redundancy = np.zeros(len(avail))
        score = lambda_ * rel[avail] - (1.0 - lambda_) * redundancy
        best = int(np.argmax(score))  # first max = lowest candidate rank
        idx = avail[best]
        out_rows.append(
            (rank, ids[idx], float(rel[idx]), round(float(score[best]), 6))
        )
        picked.append(idx)
        avail.pop(best)
    return df.sparkSession.createDataFrame(
        out_rows,
        f"rank int, {id_col} long, relevance double, mmr_score double",
    )


def matryoshka_recall(
    df: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    dims=(8, 16, 32),
    k: int = 10,
) -> DataFrame:
    """Truncated-dimension retrieval quality (the Matryoshka question,
    public MRL lineage): if embeddings are cut to their first d
    coordinates, what fraction of the FULL-dimension top-k survives?
    The measurement that decides how hard an index/storage layer can
    truncate vectors before retrieval quality pays — run per corpus,
    not assumed from the embedding card.

    Shape: the probe set is a BOUNDED frame (caller samples it — the
    e1 probe contract) broadcast onto the corpus; per (probe, dim) the
    cosine uses ``slice(vec, 1, d)`` inside one JVM fold, ranks via a
    row_number window PARTITIONED BY (probe, dim) — probe-set-bounded
    partitions — and the full-dim top-k joins against each truncated
    top-k on (probe, neighbor) to count survivors. Output one row per
    dim: (dim, n_probes, mean_recall) — recall averaged over probes,
    rounded 6. Ties break by id (deterministic cut).

    Every stage is a fold or a probe-bounded window — the corpus scan
    is the only data-sized pass, once per dim (a 100 TB run picks few
    dims). Oracle-expressible: DuckDB replays slices and ranks with
    list_dot_product + row_number.
    """
    from pyspark.sql import Window

    # DEDUPE (set, not list): a duplicated dim would land twice in the
    # exploded dim array, putting every corpus row in the (probe, dim)
    # window partition twice — row_number would interleave the copies
    # and the top-k would silently cover ~k/2 distinct neighbors
    # (ADVICE r14). The old per-dim loop merely emitted a duplicate
    # output row; under the single-window form dedup is the only
    # correct reading of duplicate dims.
    ds = sorted({int(d) for d in dims})
    if any(d <= 0 for d in ds):
        raise ValueError("dims must be positive")
    p = F.broadcast(
        probes.select(
            F.col(id_col).alias("__pid"), F.col(vec_col).alias("__pv")
        )
    )
    scored = df.crossJoin(p).where(F.col(id_col) != F.col("__pid"))
    # r14 (guide §2.4 — one exchange instead of four): the four rankings
    # (full + each truncation) used to be four separate window branches,
    # each re-scanning the corpus and paying its own probe-keyed
    # exchange, with three (pid, nid) joins + a union stitching them
    # back. One map-side dim explode (sentinel 0 = full vector) ranks
    # everything under a SINGLE window exchange partitioned by
    # (probe, dim); the full-dim slice is a broadcast-sized build for
    # ONE left join, and one aggregation pair emits all dims' rows.
    # Same rankings (per-(pid, dim) row_number over the same sort key),
    # same left-join indicator semantics, one corpus scan instead of
    # |dims|+1.
    dim_arr = F.array(*[F.lit(d) for d in ([0] + ds)])
    expl = scored.withColumn("__d", F.explode(dim_arr))
    va = F.when(F.col("__d") == 0, F.col(vec_col)).otherwise(
        F.slice(F.col(vec_col), F.lit(1), F.col("__d"))
    )
    vb = F.when(F.col("__d") == 0, F.col("__pv")).otherwise(
        F.slice(F.col("__pv"), F.lit(1), F.col("__d"))
    )
    sim = cosine(va, vb)
    w = Window.partitionBy("__pid", "__d").orderBy(F.desc(sim), F.asc(id_col))
    ranked = (
        expl.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("__d", "__pid", F.col(id_col).alias("__nid"))
    )
    # Survivor marking without a join (the ranked frame is
    # probe×(|dims|+1)×k rows — always tiny): a truncated top-k row
    # survives iff its (probe, neighbor) group also contains the
    # full-dim sentinel row. Window-max over that group replaces the
    # old (pid, nid) LEFT join + indicator with identical semantics —
    # every truncated row still counts (a probe sharing nothing with
    # the full top-k keeps recall 0, so n_probes never shrinks).
    wh = Window.partitionBy("__pid", "__nid")
    hits = (
        ranked.withColumn(
            "__hit",
            F.max(F.when(F.col("__d") == 0, 1).otherwise(0)).over(wh),
        )
        .where(F.col("__d") != 0)
        .groupBy("__d", "__pid")
        .agg((F.sum("__hit") / F.lit(float(k))).alias("__rec"))
    )
    return (
        hits.groupBy("__d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.round(F.avg("__rec"), 6).alias("mean_recall"),
        )
        .select(F.col("__d").alias("dim"), "n_probes", "mean_recall")
        .orderBy("dim")
    )


def embedding_dispersion(
    df: DataFrame,
    label_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-group embedding-corpus dispersion via the centroid
    identity: for unit vectors, the mean pairwise cosine similarity
    within a group equals ``(n²·‖m‖² − n)/(n·(n−1))`` where m is the
    mean unit vector — so ONE aggregation answers "how semantically
    redundant is this slice" without any pairwise join (the
    diversity readout behind SemDeDup-style pruning decisions:
    dispersion = 1 − mean_cos near 0 means the slice is one idea
    repeated; near 1, spread out).

    Shape: unit-normalize map-side, ``posexplode`` to (label, dim)
    rows and aggregate component sums — the shuffle carries
    label×dim-bounded aggregation state (map-side partial sums do the
    heavy lifting), never vectors; ‖m‖² folds over the dim-bounded
    per-label component frame. Zero-norm vectors are excluded (no
    direction, no dispersion). Output per label:
    (label, n, mean_cos, dispersion) rounded 6; NULL stats for
    single-vector groups (no pair exists).
    """
    unit = df.select(
        F.col(label_col).alias("_g"),
        F.transform(
            _dvec(vec_col),
            lambda x: F.try_divide(
                x,
                F.sqrt(
                    F.aggregate(
                        _dvec(vec_col), F.lit(0.0),
                        lambda a, y: a + y * y,
                    )
                ),
            ),
        ).alias("_u"),
        F.sqrt(
            F.aggregate(_dvec(vec_col), F.lit(0.0), lambda a, y: a + y * y)
        ).alias("_nrm"),
    ).where(F.col("_nrm") > 0)
    comps = unit.select(
        "_g", F.posexplode("_u").alias("_pos", "_x")
    )
    per_dim = comps.groupBy("_g", "_pos").agg(
        F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_cnt")
    )
    agg = per_dim.groupBy("_g").agg(
        F.sum(F.col("_s") * F.col("_s")).alias("_m2"),  # ‖Σu‖²
        F.max("_cnt").cast("double").alias("_n"),
    )
    n = F.col("_n")
    # try_divide, not /: ANSI raises DIVIDE_BY_ZERO for the n=1 rows
    # even inside the when() guard under whole-stage codegen
    mean_cos = F.when(
        n >= 2, F.try_divide(F.col("_m2") - n, n * (n - 1))
    )
    return agg.select(
        F.col("_g").alias(label_col),
        n.cast("long").alias("n"),
        F.round(mean_cos, 6).alias("mean_cos"),
        F.round(1 - mean_cos, 6).alias("dispersion"),
    )
