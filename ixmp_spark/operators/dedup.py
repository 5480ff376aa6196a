"""Deduplication operators for large-scale training-data pipelines.

Extension surface (BASELINE.json north star) — the reference has no
document operators. Everything here is built from Catalyst expressions
(hash/xxhash64/transform/aggregate) so dedup scales as pure shuffle-on-key
jobs; no Python in the hot path.

- exact_dedup:       hash-groupBy on normalized text.
- simhash:           64-bit SimHash over tokens (bitwise majority of token
                     hashes), Hamming-bucket joinable.
- minhash_signature: k independent min-hashes over shingles.
- lsh_band_pairs:    banded-LSH candidate pairs (shingle→minhash→band→
                     bucket self-join) for near-dup detection.
- ngram_jaccard:     exact n-gram Jaccard between candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class CandidateVolumeExceeded(ValueError):
    """Raised by :func:`jaccard_prefix_join` when the estimated raw
    candidate volume (Σ per-gram n²) exceeds ``max_candidates``.
    A dedicated type (ADVICE r12) so :func:`similarity_join` routes on
    the exception CLASS, not on substring-matching the message — an
    unrelated ValueError that happens to mention max_candidates must
    propagate, not silently reroute to LSH."""


def normalize_text(col) -> "F.Column":
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id representative per normalized-text
    group. groupBy on md5(norm) — the shuffle key is the 128-bit digest,
    never the document body, so shuffle volume is O(rows·16B) regardless of
    document size."""
    return (
        df.withColumn("__h", F.md5(normalize_text(text_col)))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__h")
    )


def jaccard_block_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    max_block: int | None = None,
    storage_level=None,
) -> DataFrame:
    """Exact token-set Jaccard pairs within blocks — the bounded-input
    verification path (the unblocked scale path is minhash_lsh_neardup).

    All-pairs WITHIN a block is quadratic in the block size, so this
    operator enforces an explicit input contract: with ``max_block`` set,
    one cheap count-per-block aggregation runs first and any oversized
    block fails fast with its size (an n² job on a hot block would
    otherwise look like a hang at 100 TB). Callers with legitimately hot
    blocks should pre-split them (finer block_cols) or use the LSH path.

    Token sets are collapsed to 64-bit xxhash64 values before the
    self-join: |A∩B| / |A∪B| is a pure cardinality computation, so the
    Jaccard values are unchanged (modulo negligible 64-bit collisions)
    while the block shuffle carries 8 B/token instead of token strings
    and the intersect compares longs.

    The tokenized frame is PERSISTED before the self-join (the
    lsh_band_pairs/ngram_jaccard discipline): both join sides derive
    from it, and without the persist Catalyst recomputes the
    tokenize+hash projection — the dominant per-row cost — once per
    side. The input is also spread to ``defaultParallelism`` first:
    small parquet inputs arrive as 1–2 splits, and the projection is
    the expensive stage. ``storage_level`` as in :func:`lsh_band_pairs`.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.repartition(par)
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            F.transform(
                F.array_distinct(F.split(F.trim(F.lower(text_col)), r"\s+")),
                lambda t: F.xxhash64(t),
            ).alias("toks"),
        )
        .persist(_level(storage_level))
    )
    if max_block is not None:
        # guard pre-pass over the RAW frame: block sizes need only the
        # block columns, and building it from `toks` costs the whole
        # tokenize/hash projection (measured: the optimizer does not
        # prune the higher-order-function column out of that pass)
        hot = (
            df.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_block)
            .limit(5)
            .collect()
        )
        if hot:
            toks.unpersist()  # fail-fast path must not leak the cache
            raise ValueError(
                f"blocks over max_block={max_block}: "
                f"{[(tuple(r[c] for c in block_cols), r['n']) for r in hot]}; "
                "pre-split the block keys or use minhash_lsh_neardup"
            )
    a = toks.select(
        F.col(id_col).alias("id_a"), *block_cols, F.col("toks").alias("toks_a")
    )
    b = toks.select(
        F.col(id_col).alias("id_b"), *block_cols, F.col("toks").alias("toks_b")
    )
    # inclusion–exclusion form (r14): the token arrays are distinct by
    # construction, so |A∪B| = |A|+|B|−|A∩B| exactly — the filter-
    # pushdown double evaluation of the verify expression then costs
    # two array_intersects instead of two intersect+union pairs (the
    # oracle states the same identity)
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    jac = inter / (F.size("toks_a") + F.size("toks_b") - inter)
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        a.join(b, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(jac, 6))
        .where(jac >= threshold)
        .select("id_a", "id_b", "jaccard"),
        toks,
    )


def shingles(col, n: int = 3) -> "F.Column":
    """Word n-gram shingle set (array<string>, distinct).

    The token array is LET-BOUND through a one-element array wrapper
    (the t6 winnow trap, r15): referencing the computed ``split(...)``
    expression inside the per-gram ``transform`` lambda lets projection
    collapse re-inline the whole split per gram — O(len²) token
    re-tokenization per document. As a lambda variable the tokens are a
    materialized value, so each ``slice`` reads it — measured 1.5× on
    the sf0.1 shingle pass (0.41 → 0.27 s noop), output bit-identical
    (incl. null/empty text: both forms yield ``['']``)."""
    toks_arr = F.array(F.split(normalize_text(col), " "))
    return F.array_distinct(
        F.flatten(
            F.transform(
                toks_arr,
                lambda toks: F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                ),
            )
        )
    )


#: Mersenne prime 2^31-1 — the universal-hash modulus. Keeping the hash
#: domain at 31 bits means a*h+b stays < 2^62, so the arithmetic never
#: overflows a long (Spark 4 runs ANSI mode: overflow would *raise*, not
#: wrap).
_MH_P = 2_147_483_647


def _mh_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k universal hash functions."""
    import random

    rng = random.Random(0xD5DD)
    return [(rng.randrange(1, _MH_P), rng.randrange(0, _MH_P)) for _ in range(k)]


def _minhash_sig(base, k: int):
    """All k running minima in ONE ``aggregate`` fold over the base-hash
    array (the simhash one-fold lesson): the k-wide accumulator zips
    against a literal (a, b) coefficient array, so each base hash is
    visited once instead of once per permutation — the old form ran k
    separate ``transform`` passes, each allocating a gram-sized array
    that ``array_min`` immediately collapsed (measured 1.21× on the
    sf0.1 signature projection, signatures bit-identical). The guard
    branch reproduces the k-transform form's corner semantics exactly:
    NULL or empty base → an array of k NULLs (``array_min`` of an
    empty/NULL array is NULL), where a bare fold would return NULL or
    the untouched init sentinels."""
    ab = F.array(
        *[
            F.struct(
                F.lit(a).cast("long").alias("a"),
                F.lit(b).cast("long").alias("b"),
            )
            for (a, b) in _mh_coeffs(k)
        ]
    )
    fold = F.aggregate(
        base,
        F.array_repeat(F.lit(_MH_P).cast("long"), k),
        lambda acc, h: F.zip_with(
            acc,
            ab,
            lambda m, s: F.least(
                m, F.pmod(h * s["a"] + s["b"], F.lit(_MH_P))
            ),
        ),
    )
    return F.when(F.size(base) >= 1, fold).otherwise(
        F.array_repeat(F.lit(None).cast("long"), k)
    )


def minhash_signature(df: DataFrame, text_col: str, k: int = 32, n: int = 3) -> DataFrame:
    """k-permutation MinHash: shingle → ONE base xxhash64 → k cheap
    universal-hash permutations sig[j] = min((a_j·h + b_j) mod p).

    One string hash per shingle (not k), one fold carrying all k
    running minima (see :func:`_minhash_sig`) — all Catalyst, one
    narrow map stage, no shuffle."""
    base = F.transform(
        shingles(text_col, n), lambda s: F.pmod(F.xxhash64(s), F.lit(_MH_P))
    )
    df = df.withColumn("__base", base)
    return df.withColumn(
        "minhash", _minhash_sig(F.col("__base"), k)
    ).drop("__base")


def _level(storage_level):
    if storage_level is None:
        from pyspark import StorageLevel

        return StorageLevel.MEMORY_AND_DISK
    return storage_level


def lsh_band_pairs(
    df: DataFrame, id_col: str, k: int = 32, bands: int = 8,
    storage_level=None, max_bucket: int | None = None,
    on_hot: str = "raise", max_candidates: int | None = None,
    _dedup: bool = True,
) -> DataFrame:
    """Banded LSH candidate pairs from a ``minhash`` column: hash each band
    of r=k/bands signature values to a bucket (multi-arg xxhash64 — no
    string building); documents sharing any (band, bucket) become a
    candidate pair (id_a < id_b, distinct).

    The banded frame is persisted before the self-join — otherwise Catalyst
    recomputes the whole shingle/minhash lineage for BOTH join sides.
    ``storage_level`` picks the persist level (default MEMORY_AND_DISK);
    cluster runs where the banded frame outgrows executor memory should
    pass StorageLevel.DISK_ONLY (or checkpoint to the shuffle service).

    Scale: explode to (doc, band) rows → shuffle on (band, bucket) — the
    classic MinHash-LSH plan. Bucket sizes are the quadratic risk: one
    hot bucket of m docs emits m²/2 candidates no matter what AQE does
    to the shuffle. ``max_bucket`` bounds it: ``on_hot="raise"`` fails
    fast with the offending sizes (the jaccard_block_pairs contract);
    ``on_hot="drop"`` excludes oversized buckets from candidate
    generation — the standard stop-bucket treatment for web-scale
    dedup, where a bucket shared by thousands of documents is
    boilerplate that exact-dedup or span-removal handles more cheaply
    than m² Jaccard verifications. Dropping costs recall only for pairs
    whose EVERY matching band is hot; with 8+ bands that is rare for
    genuine near-dups.

    ``max_candidates`` (r13, the cosine_lsh_pairs guard mirrored —
    default None, preserving existing call sites): the worst case
    under ``on_hot='drop'`` is bands·n·max_bucket/2 candidate rows
    regardless of banding, since surviving buckets can all sit at the
    cap (dup-family corpora). When set, Σ m(m−1)/2 over the KEPT
    buckets is estimated from the (bucket-count-sized) sizes frame
    before the self-join and :class:`CandidateVolumeExceeded` raises
    over budget — exact-dedup first, lower max_bucket, or raise k.
    """
    if on_hot not in ("raise", "drop"):
        # validate BEFORE any persist: failing later would leak the
        # banded cache (the fail-fast/no-leak guard discipline)
        raise ValueError(f"on_hot must be 'raise' or 'drop', got {on_hot!r}")
    r = k // bands
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("minhash")[b * r + i] for i in range(r)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    ).persist(_level(storage_level))
    cached = banded  # release handle (the drop branch rebinds `banded`)
    if max_bucket is not None or max_candidates is not None:
        # ONE aggregation pass decides all three guards (r13 review:
        # the first form ran up to three sizes-shaped jobs), and all
        # fail-fast paths unpersist the REAL cache handle (``cached``),
        # not the possibly-rebound ``banded``
        sizes = banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__n")
        )
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
                raise ValueError(
                    f"LSH buckets over max_bucket={max_bucket}: "
                    f"{[((r['band'], r['bucket']), r['__n']) for r in hot]}; "
                    'use on_hot="drop" or raise bands/k'
                )
            # on_hot == "drop" (validated at entry)
            if n_kept == 0:
                # the silently-empty regime (r13 footgun sweep,
                # mirroring the r12 hard_negatives bits=4 bug): every
                # band bucket hot — here that means the corpus is one
                # giant duplicate family — and dropping them all
                # provably returns zero pairs; fail loud instead. An
                # EMPTY corpus (n_total == 0) never reaches here and
                # still returns an empty pairs frame.
                cached.unpersist()
                raise ValueError(
                    f"every LSH band bucket exceeds max_bucket="
                    f"{max_bucket}: on_hot='drop' would return ZERO "
                    "pairs — exact-dedup the corpus first (the bucket "
                    "crowd is a duplicate family) or raise max_bucket"
                )
            banded = banded.join(
                sizes.where(kept_pred).select("band", "bucket"),
                ["band", "bucket"],
                "left_semi",
            )
        if max_candidates is not None and vol > max_candidates:
            cached.unpersist()
            raise CandidateVolumeExceeded(
                f"lsh_band_pairs: estimated raw candidate volume "
                f"{int(vol)} (Σ per-bucket m(m−1)/2 over kept buckets) "
                f"exceeds max_candidates={max_candidates} — exact-dedup "
                "first (hot buckets are duplicate families), lower "
                "max_bucket, or raise k"
            )
    a = banded.alias("a")
    b = banded.alias("b")
    from ixmp_spark.operators import attach_caches

    raw = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
    # ``_dedup=False`` (internal, minhash_lsh_neardup only): the fused
    # pipeline applies ONE distinct after unioning the short-doc path —
    # distinct here would shuffle the pair frame a second time for the
    # same final set (map-side partial aggregation already collapses
    # band-collision duplicates before either shuffle)
    return attach_caches(raw.distinct() if _dedup else raw, cached)


def ngram_jaccard(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str, n: int = 3,
    storage_level=None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B| via
    array_intersect/array_union on 64-bit shingle hashes (cardinalities —
    and so Jaccard values — are unchanged by hashing; the joined frames
    carry 8 B/shingle). Persisted once, joined twice; ``storage_level``
    as in :func:`lsh_band_pairs`."""
    sh = df.select(
        F.col(id_col),
        F.transform(shingles(text_col, n), lambda s: F.xxhash64(s)).alias(
            "sh"
        ),
    ).persist(_level(storage_level))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / (
                    F.size("sh_a")
                    + F.size("sh_b")
                    - F.size(F.array_intersect("sh_a", "sh_b"))
                )
            ).alias("jaccard"),
        ),
        sh,
    )


def _short_doc_pairs(
    sh: DataFrame,
    id_col: str,
    short_min: int,
    threshold: float,
    max_bucket: int | None,
    on_hot: str,
    storage_level=None,
    _dedup: bool = True,
) -> DataFrame | None:
    """Exact prefix-filter candidate pairs for SHORT documents (see
    minhash_lsh_neardup's routing contract), computed over the
    RESTRICTED gram universe — only grams that occur in some short doc
    can witness a (short, partner) pair, since the witness min(A∩B) is
    an element of the short side A.

    r11 ranked and prefix-filtered the whole Jaccard-feasible band
    (size ≤ short_min/t — most of a natural corpus at t = 0.3): a
    band-wide frequency aggregation plus a rank window over nearly
    every document, measured at 1.85× the r10 pipeline cost at factor
    100 (VERDICT r11 #1). This form first restricts the band's
    exploded grams to the short-doc gram set (a broadcast semi-join —
    the short class is a corpus sliver), then runs ONE frequency
    aggregation and ONE rank window over the restricted frame. Each
    doc's index is the first cnt′ − ⌈t·sz⌉ + 1 of its RESTRICTED gram
    list (cnt′ = restricted count, sz = FULL size): for a true pair
    (A short, B), |A∩B| ≥ ⌈t·szB⌉ (J ≥ t, |A∪B| ≥ szB) and
    A∩B ⊆ B∩short_grams, so min(A∩B) under the global (freq, hash)
    order cannot be confined to B's ⌈t·szB⌉−1 unindexed tail — the
    standard PPJoin pigeonhole applied inside the restricted universe,
    per side. For short docs cnt′ = sz, so their prefixes are exactly
    r11's; partner indexes are never longer than r11's full-band
    prefixes (cnt′ ≤ szB), and a partner with cnt′ < ⌈t·szB⌉ — too few
    short-present grams to ever reach Jaccard t with a short doc —
    prunes to zero index entries, a pruning the full-band form cannot
    see. Strictly fewer candidates than r11 into the same
    exact-Jaccard verify, without the band-wide shuffles. (A first r12
    draft dropped the partner prefix entirely — one-sided pigeonhole
    against FULL restricted gram lists — and measured 16.2 s vs
    r11's 12.55 s at factor 10/t=0.5: the candidate blowup from
    unprefixed partners outweighs the saved window.) Returns None when
    routing is disabled/infeasible or no short docs exist; candidates
    only — the caller verifies exact Jaccard."""
    if short_min <= 0 or threshold <= 0:
        return None
    import math as _math

    sz = F.size("sh")
    shorts = sh.where((sz >= 1) & (sz < short_min)).select(
        F.col(id_col).alias("__id"), "sh"
    )
    if shorts.isEmpty():
        return None
    max_partner = int(_math.ceil(short_min / float(threshold)))
    short_grams = shorts.select(F.explode("sh").alias("__g")).distinct()
    elig = sh.where((sz >= 1) & (sz <= max_partner)).select(
        F.col(id_col).alias("__id"), sz.alias("__sz"), "sh"
    )
    # persisted: the frequency aggregation, the hot-gram guard, and the
    # rank window all read it (honors the caller's storage_level knob —
    # the passthrough test)
    ex_band = (
        elig.select("__id", "__sz", F.explode("sh").alias("__g"))
        .join(F.broadcast(short_grams), "__g")
        .persist(_level(storage_level))
    )
    # restricted-band frequency of every short-doc gram — equal to the
    # band-wide frequency for every gram any short doc carries, so the
    # short docs' prefixes are identical to the r11 full-band ranking
    freq = ex_band.groupBy("__g").agg(F.count(F.lit(1)).alias("__f"))
    t = F.lit(float(threshold))
    wnd = Window.partitionBy("__id").orderBy(F.asc("__f"), F.asc("__g"))
    cnt = Window.partitionBy("__id")
    prefix = (
        ex_band.join(freq, "__g")
        .withColumn("__rk", F.row_number().over(wnd))
        .withColumn("__cnt", F.count(F.lit(1)).over(cnt))
        .where(
            F.col("__rk") <= F.col("__cnt") - F.ceil(t * F.col("__sz")) + 1
        )
        .select("__id", "__sz", "__g", "__rk", "__cnt")
    )
    if max_bucket is not None:
        # Hot-gram guard over the RANK-FILTERED PREFIX frame (ADVICE
        # r12): the candidate join's volume is set by prefix GROUP
        # size, not restricted-band frequency (band freq >= prefix
        # size — the old freq-based guard raised for corpora whose
        # actual join volume was fine, and dropped grams that appear
        # in no prefix at all). Same adjudication basis as
        # jaccard_prefix_join's gsize guard.
        gsize = prefix.groupBy("__g").agg(F.count(F.lit(1)).alias("__gs"))
        hot = gsize.where(F.col("__gs") > max_bucket)
        if on_hot == "raise":
            top = hot.limit(5).collect()
            if top:
                ex_band.unpersist()  # fail-fast must not leak the cache
                raise ValueError(
                    f"short-doc prefix shingle groups over max_bucket="
                    f"{max_bucket}: "
                    f"{[(r['__g'], r['__gs']) for r in top]}; "
                    'use on_hot="drop" or pre-dedup exact copies'
                )
        else:  # on_hot == "drop" (validated by lsh_band_pairs already)
            n_hot = hot.count()
            if n_hot:
                # dropping converts the short path from exact to lossy
                # (ADVICE r11): unlike the LSH buckets, where drop
                # degrades an already probabilistic path, a dropped
                # prefix gram can be the ONLY witness of a true short
                # pair — surface it instead of silently forfeiting the
                # contract the routing exists to provide
                import warnings

                warnings.warn(
                    f"minhash_lsh_neardup: on_hot='drop' removed {n_hot}"
                    " hot shingle group(s) from the short-doc prefix"
                    " path — the short-doc exact-recall guarantee is"
                    " forfeited for pairs whose only prefix match was a"
                    " dropped shingle",
                    stacklevel=3,
                )
                # ranks stay defined over the WHOLE restricted list
                # (as in r11): rank first, then remove hot grams
                prefix = prefix.join(
                    hot.select("__g"), "__g", "left_anti"
                )
    # ASYMMETRIC join — only pairs with a SHORT side matter (long-long
    # pairs in the band are LSH's job; both paths feed the same verify,
    # so overlap is harmless, only wasteful). != + least/greatest
    # dedups the short×short double generation (the edit-join lesson).
    pa = prefix.where(F.col("__sz") < short_min).select(
        F.col("__id").alias("__ida"), F.col("__sz").alias("__sza"),
        F.col("__rk").alias("__rka"), F.col("__cnt").alias("__cnta"), "__g"
    )
    pb = prefix.select(
        F.col("__id").alias("__idb"), F.col("__sz").alias("__szb"),
        F.col("__rk").alias("__rkb"), F.col("__cnt").alias("__cntb"), "__g"
    )
    from ixmp_spark.operators import attach_caches

    out = attach_caches(
        pa.join(pb, "__g")
        .where(
            (F.col("__ida") != F.col("__idb"))
            & (F.least("__sza", "__szb") >= t * F.greatest("__sza", "__szb"))
            # PPJoin positional filter (the r12 factor-100 probe
            # measured 63M/70M candidates FALSE — random single-gram
            # collisions): both restricted lists sort by the same
            # global (freq, hash) order, so for the SMALLEST common
            # gram every other common gram ranks later on BOTH sides —
            # o ≤ 1 + min(cntA−rkA, cntB−rkB) — while J ≥ t needs
            # o ≥ t/(1+t)·(szA+szB). A true pair's smallest-common-gram
            # row always satisfies this (that row is the pigeonhole
            # witness); rows failing it can be discarded without recall
            # loss. Kept in multiplied form — a float ceil at an exact
            # integer boundary could over-prune.
            & (
                (1 + F.least(
                    F.col("__cnta") - F.col("__rka"),
                    F.col("__cntb") - F.col("__rkb"),
                )) * (F.lit(1.0) + t)
                >= t * (F.col("__sza") + F.col("__szb"))
            )
        )
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
        ),
        ex_band,
    )
    # ``_dedup=False`` (minhash_lsh_neardup): the caller's post-union
    # distinct already collapses the short×short double generation —
    # see lsh_band_pairs
    if _dedup:
        out = attach_caches(out.distinct(), *getattr(out, "_ixmp_spark_caches", ()))
    return out


def _lsh_bands_for_recall(
    k: int, threshold: float, target_recall: float
) -> int:
    """Smallest band count b (dividing ``k``) whose banded-LSH catch
    probability at similarity = ``threshold`` — the WORST case for any
    pair the operator promises to find, since 1-(1-s^r)^b increases in
    s — meets ``target_recall``. The driver-side arithmetic twin of
    ``lsh_parameter_plan`` (the d13 design table): p(b) is monotone in
    b for fixed k, so the first divisor that clears the target is the
    cheapest banding (fewest explode rows, fewest false-positive
    candidates) that honors the recall contract. Raises when even
    b = k (rows = 1) falls short — the honest signal to raise k."""
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    t = float(threshold)
    for b in (d for d in range(1, k + 1) if k % d == 0):
        p = 1.0 - (1.0 - t ** (k // b)) ** b
        if p >= target_recall:
            return b
    raise ValueError(
        f"no banding of k={k} hashes reaches target_recall="
        f"{target_recall} at threshold={t} (best p="
        f"{1.0 - (1.0 - t) ** k:.6f} at bands=k) — increase k"
    )


def minhash_lsh_neardup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.3,
    storage_level=None,
    max_bucket: int | None = None,
    on_hot: str = "raise",
    target_recall: float | None = None,
    short_min: int | None = None,
) -> DataFrame:
    """End-to-end near-dup pipeline: shingle ONCE (persisted), minhash →
    banded LSH candidates → exact shingle-Jaccard filter ≥ threshold.
    ``storage_level`` picks the persist level for the shingle and banded
    frames (default MEMORY_AND_DISK; DISK_ONLY for cluster runs where
    shingle arrays outgrow executor memory); ``max_bucket``/``on_hot``
    bound hot-bucket candidate explosion as in :func:`lsh_band_pairs`.

    Composing minhash_signature + lsh_band_pairs + ngram_jaccard naively
    shingles every document twice; this fused operator computes the
    shingle arrays a single time and derives both the signatures and the
    verification joins from the persisted frame — at 100 TB the shingle
    materialization is the dominant cost, so halving it matters more than
    any join strategy choice.

    PROVISIONING (r13 10M-doc rung, executable in
    :func:`ixmp_spark.operators.scale.recommended_resources`): the full
    dedup chain through this operator needs ~3–6 GB of JVM heap per 1M
    documents (measured — the 16 GB default OOMed at 10M docs; 64 GB
    completed with the plan unchanged). Size executors with
    ``recommended_resources(n_docs, "dedup_pipeline", n_executors)``;
    the scale rehearsal asserts its own configuration against the same
    rule (``assert_provisioned``), so the constant stays honest.

    The persisted frame stores 64-bit shingle HASHES, not strings: the
    signatures need xxhash64(shingle) anyway, and the verification
    Jaccard is a pure cardinality computation, so hashing first gives
    identical output while the persisted/joined frames carry 8 B per
    shingle instead of n-gram text.

    Short-document routing (closes the r10 factor-100 recall finding —
    REHEARSAL_dedup_pipeline_r10 measured 2 LSH escapes in 495k docs,
    both <16 words at Jaccard 0.78/0.83 ≫ threshold: with few shingles
    the minhash estimator's variance defeats the banding): documents
    with fewer than ``short_min`` shingles (default k — 2× the measured
    escape class; 0 disables) are ALSO paired through an EXACT
    prefix-filter path — global rarest-first shingle order, per-doc
    prefix of the first ``sz − ⌈t·sz⌉ + 1`` shingles (a pair with
    Jaccard ≥ t must place the MINIMUM of its intersection inside the
    short side's prefix — the AllPairs/PPJoin pigeonhole, one-sided),
    joined against the FULL gram lists of the Jaccard-feasible partner
    band (size ≤ short_min/t — a partner of a short doc cannot be
    larger), restricted to grams occurring in some short doc, then fed
    through the same exact-Jaccard verify as the LSH candidates.
    Deterministic recall for the short class at a cost bounded by the
    (small) short corpus; hot prefix shingles obey the same
    ``max_bucket``/``on_hot`` discipline as LSH buckets — with the
    caveat that ``on_hot="drop"`` FORFEITS the short-doc exactness
    guarantee (a dropped gram can be a true pair's only prefix
    witness; the operator warns with the dropped-group count).
    Routing is skipped when threshold <= 0 (no feasible
    partner bound) or the corpus has no short docs.

    ``target_recall``: when set, ``bands`` is DERIVED instead of taken
    from the argument — the smallest divisor of k whose catch
    probability at similarity = threshold meets the target (see
    ``_lsh_bands_for_recall`` / the d13 planner table), so callers
    state the contract they need instead of hand-picking a banding.
    """
    if target_recall is not None:
        bands = _lsh_bands_for_recall(k, threshold, target_recall)
    if short_min is None:
        # default = k, not 2k: the measured escape class sits under ~16
        # shingles (REHEARSAL_dedup_pipeline_r10), so k = 32 carries 2x
        # margin — while 2k would route 63% of a natural web corpus
        # (median 54 words) through the exact path, a full second dedup
        # pass in disguise (measured: d3 3.4x at factor 10)
        short_min = k
    # small parquet inputs arrive as 1–2 splits; the shingle transform is
    # the dominant per-row cost, so spread it across all cores first
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(par)
        .select(
            F.col(id_col),
            F.transform(
                shingles(text_col, n), lambda s: F.xxhash64(s)
            ).alias("sh"),
        )
        .persist(_level(storage_level))
    )
    base = F.transform(F.col("sh"), lambda h: F.pmod(h, F.lit(_MH_P)))
    sigs = (
        sh.withColumn("__base", base)
        .withColumn("minhash", _minhash_sig(F.col("__base"), k))
        .drop("__base", "sh")
    )
    try:
        # _dedup=False: ONE distinct runs after the short-path union
        # (r14) — the same final pair set with one pair-frame shuffle
        # instead of up to three (map-side partial aggregation still
        # collapses band-collision duplicates before the wire)
        pairs = lsh_band_pairs(
            sigs, id_col, k=k, bands=bands, storage_level=storage_level,
            max_bucket=max_bucket, on_hot=on_hot, _dedup=False,
        )
    except BaseException:
        sh.unpersist()  # the guard's fail-fast must not leak the shingles
        raise
    lsh_caches = list(getattr(pairs, "_ixmp_spark_caches", ()))
    try:
        short_pairs = _short_doc_pairs(
            sh, id_col, short_min, threshold, max_bucket, on_hot,
            storage_level=storage_level, _dedup=False,
        )
    except BaseException:
        sh.unpersist()
        for c in lsh_caches:
            c.unpersist()
        raise
    if short_pairs is not None:
        lsh_caches += getattr(short_pairs, "_ixmp_spark_caches", ())
        pairs = pairs.unionByName(short_pairs)
    pairs = pairs.distinct()
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    # inclusion–exclusion: |A∪B| = |A|+|B|−|A∩B| for the distinct hash
    # arrays — one array op instead of two in the (filter-duplicated)
    # verify expression (r14)
    _i = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    jac = _i / (F.size("sh_a") + F.size("sh_b") - _i)
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        sh,
        *lsh_caches,
    )


def simhash64(col, n: int = 2) -> "F.Column":
    """64-bit SimHash over word n-grams: for each bit position, the sign of
    the sum over token-hash bits. Expressed with aggregate() over the
    shingle array — still pure Catalyst.

    For each of the 64 bits b: count of tokens with bit b set, minus count
    unset; bit in output = 1 iff count > 0.

    One fold, not 64: the first formulation ran a separate
    ``aggregate()`` per bit — 64 redundant passes over every row's
    shingle array and a giant codegen tree; the round-6 timing sweep
    caught it at 49 ms/doc. This form carries all 64 vote counters in a
    single array accumulator (``zip_with`` against a literal mask
    array), one pass over the tokens — bit-identical output (verified
    fingerprint-for-fingerprint before the swap), 36× faster (29.1 s →
    0.8 s for 500 docs)."""
    sh = shingles(col, n)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    masks = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(64)
        ]
    )
    # votes[b] = sum over tokens of (bit b set ? 1 : -1), all 64 carried
    # in one array accumulator
    votes = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    bits = F.zip_with(
        votes,
        masks,
        lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def winnow_fingerprints(col, k: int = 5, w: int = 4) -> "F.Column":
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every character k-gram, then keep the minimum hash
    of each window of ``w`` consecutive k-grams — a position-robust
    fingerprint set whose overlap measures local similarity (the
    rolling-hash family member of the dedup suite; SimHash/MinHash are
    the global-similarity members).

    Guarantees: any shared substring of length >= w + k - 1 contributes
    at least one shared fingerprint, so containment of fingerprint sets
    lower-bounds long-match coverage. Pure Catalyst: sequence/transform/
    slice/array_min — no Python, no shuffle (per-row expression).
    Returns array<long> (distinct, sorted).
    """
    c = normalize_text(col)
    empty = F.array().cast("array<bigint>")

    def upto(n):  # 1..n, or [] when n < 1 (sequence(1, 0) would DESCEND)
        return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )

    n_grams = F.length(c) - (k - 1)
    grams = F.transform(upto(n_grams), lambda i: F.xxhash64(c.substr(i, F.lit(k))))

    # Sliding-window minima over the gram hashes, with the hash array
    # LET-BOUND as a lambda variable: wrapping `grams` in a one-element
    # array and transforming over it binds the evaluated array to `gr`,
    # so every window's slice reads the SAME materialized value. The
    # two tempting alternatives both go quadratic per document: a bare
    # transform(i -> array_min(slice(grams, i, w))) re-inlines the
    # whole k-gram expression into every window under projection
    # collapse (O(n²) substr+xxhash64 — the r5 HOF trap), and the
    # aggregate-fold that replaced it appends each minimum to its
    # accumulator with concat, copying the ever-growing result array
    # once per gram (O(n²) element traffic; measured 22.9 s for the
    # sf0.1 corpus vs 12.2 s for this form, identical output).
    def mins_of(gr):
        n_win = F.size(gr) - (w - 1)
        return F.when(
            n_win >= 1,
            F.transform(
                upto(n_win), lambda i: F.array_min(F.slice(gr, i, w))
            ),
        ).otherwise(
            # shorter than one window but non-empty: the global min is
            # the sole fingerprint
            F.when(F.size(gr) > 0, F.array(F.array_min(gr))).otherwise(
                empty
            )
        )

    mins = F.transform(F.array(grams), mins_of)[0]
    return F.array_sort(F.array_distinct(mins))


def fingerprint_overlap(fp_a, fp_b) -> "F.Column":
    """Containment of two fingerprint arrays: |A∩B| / |A| — the
    winnowing similarity score (asymmetric by design: how much of A's
    content appears in B)."""
    a = F.col(fp_a) if isinstance(fp_a, str) else fp_a
    b = F.col(fp_b) if isinstance(fp_b, str) else fp_b
    return F.size(F.array_intersect(a, b)) / F.size(a)


def contaminated_ids(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
) -> DataFrame:
    """Cross-corpus contamination check (benchmark decontamination): the
    ids of training documents that share any word n-gram with the
    benchmark corpus, with the count of distinct shared grams.

    The industry-standard pre-training step (e.g. GPT-3 App. C uses 13-gram
    overlap): eval/benchmark text must not leak into the training set.

    Plan shape: both corpora shingle once, grams collapse to a 64-bit
    xxhash64 BEFORE the join so the shuffle carries (id, 8B) rows, never
    gram strings; the benchmark side reduces to DISTINCT gram hashes —
    usually small enough that AQE turns the join into a broadcast on its
    own (eval suites are MBs against TBs of training data). Inner join +
    per-id count, so one shuffle each side plus the count aggregation.
    """
    tg = train.select(
        F.col(id_col),
        F.explode(shingles(text_col, n)).alias("__g"),
    ).select(id_col, F.xxhash64("__g").alias("__gh"))
    bg = (
        bench.select(F.explode(shingles(text_col, n)).alias("__g"))
        .select(F.xxhash64("__g").alias("__gh"))
        .distinct()
    )
    return (
        tg.join(bg, "__gh")
        .groupBy(id_col)
        .agg(F.countDistinct("__gh").alias("n_shared_grams"))
    )


def source_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    n: int = 8,
    max_sources: int = 64,
    storage_level=None,
) -> DataFrame:
    """Cross-source n-gram containment matrix — corpus governance: for
    every ordered source pair (a, b), what fraction of a's distinct word
    ``n``-grams also occur in b (``containment`` is asymmetric: a mirror
    site is ~fully contained in the original, not vice versa). The
    standard audit before mixing corpora: it surfaces mirrored dumps,
    re-crawls, and pipeline double-ingests that per-document dedup only
    finds pair-by-pair.

    Output: (src_a, src_b, n_common, containment), one row per ordered
    pair with any overlap; ``containment = n_common / |kept grams of a|``
    rounded to 6 decimals.

    Plan shape for scale: grams collapse to DISTINCT (source, 8-byte
    xxhash64) rows before anything else, so every downstream shuffle
    carries source + 8 B. The pair computation is a self-equi-join on
    the gram hash: a gram present in s sources fans out to s² pair rows,
    so grams spread across more than ``max_sources`` sources are DROPPED
    first (the stop-bucket discipline of lsh_band_pairs — such
    ubiquitous grams are boilerplate/stop-grams carrying no attribution
    signal, and they are exactly the ones that would quadratically blow
    up the join at web scale where a corpus has 10⁵⁺ sources).
    Containment denominators count the KEPT grams, so the matrix is
    internally consistent under the guard. Both intermediate frames are
    persisted — the distinct gram frame (read twice building the guard)
    and the guarded frame (feeding the sizes and both join sides) — and
    attached to the result for :func:`release_cache`."""
    if max_sources < 1:
        raise ValueError("max_sources must be >= 1")
    grams = (
        df.select(
            F.col(group_col).alias("src"),
            F.explode(shingles(text_col, n)).alias("__g"),
        )
        .select("src", F.xxhash64("__g").alias("g"))
        .distinct()
        .persist(_level(storage_level))
    )
    kept = grams.join(
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__s"))
        .where(F.col("__s") <= max_sources)
        .select("g"),
        "g",
    ).persist(_level(storage_level))
    sizes = kept.groupBy("src").agg(F.count(F.lit(1)).alias("__n"))
    a = kept.select(F.col("src").alias("src_a"), "g")
    b = kept.select(F.col("src").alias("src_b"), "g")
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        a.join(b, "g")
        .where(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(sizes.withColumnRenamed("src", "src_a"), "src_a")
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(F.col("n_common") / F.col("__n"), 6).alias("containment"),
        ),
        grams,
        kept,
    )


def drop_common_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 8,
    min_docs: int = 2,
    sep: str = " ",
) -> DataFrame:
    """C4-style cross-corpus span removal: delete every non-overlapping
    ``w``-token chunk that occurs in at least ``min_docs`` DISTINCT
    documents (boilerplate headers/footers/license blocks), and
    reassemble each document from its surviving chunks in order.

    Returns (id, n_chunks, n_dropped, new_text). Plan shape: the
    frequency side reduces chunks to 64-bit xxhash64 keys before its
    shuffle (8 B regardless of span width, the contaminated_ids
    discipline); the document side necessarily carries chunk text — it
    is needed for reassembly no matter what — through one anti-join and
    one groupBy(id) reassembly shuffle. Popular boilerplate hashes are
    the skew risk; countDistinct partials + AQE handle it.
    """
    toks = F.split(normalize_text(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(w)).cast("int")
    chunks = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
                lambda i: F.concat_ws(sep, F.slice(toks, (i - 1) * w + 1, w)),
            )
        ).alias("__pos", "__chunk"),
    ).withColumn("__ch", F.xxhash64("__chunk"))
    freq = (
        chunks.groupBy("__ch")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__ch")
    )
    kept = chunks.join(freq, "__ch", "left_anti")
    assembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__chunk"))),
                lambda s: s["__chunk"],
            ),
            sep,
        ).alias("new_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = chunks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        totals.join(assembled, id_col, "left")
        .select(
            id_col,
            "n_chunks",
            (F.col("n_chunks") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            F.coalesce("new_text", F.lit("")).alias("new_text"),
        )
    )


def dedup_clusters(
    pairs: DataFrame, max_iter: int = 25, checkpoint_dir: str | None = None
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every
    document gets the MIN id of its component as ``cluster`` — the
    grouping step between pair generation (d2/d3/e5) and per-cluster
    representative selection.

    Min-label propagation WITH pointer doubling: each round every node
    takes (1) the minimum label among itself and its neighbors, then
    (2) the label of the node its label points to (path shortcutting).
    Step 2 halves the remaining label-chain depth each round, so the
    fixpoint arrives in O(log diameter) rounds instead of O(diameter) —
    a pathological crawl dup-chain of length 1000 converges in ~11
    rounds, comfortably inside the default ``max_iter``. At the
    fixpoint every node's label equals all its neighbors' labels
    (step 1) and is a self-labeled node (step 2), so each component
    carries exactly one label — its minimum id. Each round is two
    joins + one groupBy carrying (id, 8 B label); the driver only sees
    the single changed-count per round. Raises if ``max_iter`` rounds
    don't converge.

    Labels are checkpointed every round: iterative plans otherwise
    accumulate O(rounds) lineage, growing analysis time and the final
    plan without bound (the Pregel/GraphFrames discipline). By default
    ``localCheckpoint`` (executor-lifetime blocks — fine for a single
    job); pass ``checkpoint_dir`` to use reliable ``checkpoint()``
    against that directory on clusters with executor churn.
    """
    spark = pairs.sparkSession

    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint()

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    # symmetrize MAP-SIDE with one explode, not a two-branch union
    # (r15): union branches execute independently, so materializing the
    # persisted edge frame evaluated the whole upstream PAIR-GENERATION
    # lineage twice — for e6 that is the full within-cluster cosine
    # verify, for d6/d9 the candidate join. Same row multiset (explode
    # preserves duplicates exactly as the union did), one evaluation.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("a"), F.col("id_b").alias("b")
                    ),
                    F.struct(
                        F.col("id_b").alias("a"), F.col("id_a").alias("b")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
        .persist()
    )
    try:
        labels = _ckpt(
            edges.select(F.col("a").alias("id"))
            .distinct()
            .withColumn("cluster", F.col("id"))
        )
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.select(
                        F.col("id").alias("b"), F.col("cluster").alias("__nl")
                    ),
                    "b",
                )
                .groupBy("a")
                .agg(F.min("__nl").alias("__nmin"))
            )
            propagated = labels.join(
                nbr_min, labels.id == nbr_min.a, "left"
            ).select(
                labels.id,
                F.least(
                    labels.cluster, F.coalesce("__nmin", labels.cluster)
                ).alias("cluster"),
            )
            # pointer doubling: cluster <- label(cluster). Every label IS
            # a node id present in `labels`, so the left join always
            # matches; shortcutting keeps total work O(E log d).
            shortcut = labels.select(
                F.col("id").alias("__lid"), F.col("cluster").alias("__lcl")
            )
            new_labels = _ckpt(
                propagated.join(
                    shortcut, propagated.cluster == F.col("__lid"), "left"
                ).select(
                    "id",
                    F.least(
                        "cluster", F.coalesce("__lcl", F.col("cluster"))
                    ).alias("cluster"),
                )
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.cluster") != F.col("o.cluster"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds — "
            "component diameter exceeds max_iter; raise it or pre-split"
        )
    finally:
        edges.unpersist()


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    bad: DataFrame | None = None,
) -> DataFrame:
    """Remove contaminated documents from the training corpus: anti-join
    against :func:`contaminated_ids`.

    Plan shape (pinned by test_decontaminate_plan_shape): the train
    corpus is shingle-hashed exactly ONCE (inside the contaminated-ids
    subtree); its second appearance is a plain column-pruned scan feeding
    the anti-join, and the contaminated-id frame — small by construction,
    it's bounded by the benchmark's vocabulary — broadcasts into that
    anti-join. Nothing here is worth persisting at 100 TB: re-reading
    pruned parquet beats caching the corpus, and the expensive gram
    explosion happens on one side only.

    Callers that already computed :func:`contaminated_ids` (e.g. to
    report them) should pass the frame as ``bad`` so the gram join isn't
    evaluated twice."""
    if bad is None:
        bad = contaminated_ids(train, bench, id_col, text_col, n)
    return train.join(bad.select(id_col), id_col, "left_anti")


def incremental_dedup(
    new_df: DataFrame,
    seen_digests: DataFrame,
    text_col: str,
    id_col: str,
    digest_col: str = "digest",
) -> DataFrame:
    """Dedup an INCOMING batch against a historical digest index — the
    steady-state form of exact dedup once a corpus is live: the crawl
    delta arrives, everything already ingested (by content digest) is
    dropped, within-batch repeats keep their min-id row, and the
    survivors' digests are what the caller appends to the index.

    ``seen_digests`` is a 1-column frame of md5 digests (16 B/row — for
    a 10-billion-doc corpus that's a ~160 GB table, joinable; keep it
    BUCKETED on the digest in a real deployment so this anti-join and
    every future one co-locate shuffle-free). Because the output is the
    surviving ROWS (unlike ``exact_dedup``, which returns only ids),
    document bodies must cross the wire exactly once — the digest
    window that picks the min-id keeper; doing the min-id pick as a
    light (digest, id) aggregation instead would only ADD a second
    body-moving join on the way back. The history check then joins on
    16-byte digests, and at typical delta:corpus ratios AQE broadcasts
    the delta side.

    Returns the surviving rows of ``new_df`` with their ``digest_col``
    attached (feed `.select(digest_col)` back into the index)."""
    from pyspark.sql import Window

    hashed = new_df.withColumn(digest_col, F.md5(normalize_text(text_col)))
    w = Window.partitionBy(digest_col)
    batch_unique = (
        hashed.withColumn("__min_id", F.min(id_col).over(w))
        .where(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )
    seen = seen_digests.select(
        F.col(seen_digests.columns[0]).alias(digest_col)
    )
    return batch_unique.join(seen, digest_col, "left_anti")


def canonical_url(col) -> "F.Column":
    """Canonical form of an absolute http(s) URL — the key for URL-level
    dedup of crawled corpora, where the same page arrives as
    ``HTTP://WWW.Site.com/a/?utm_source=feed#top`` and
    ``http://site.com/a``. Steps (each a deliberate, documented choice,
    mirrored verbatim by the d8 oracle SQL):

    - scheme and host lowercased; leading ``www.`` and the scheme's
      default port (``:80`` http / ``:443`` https) stripped
    - fragment dropped
    - trailing slashes of the path stripped (``/a/`` ≡ ``/a``; the root
      path collapses to the bare host)
    - query parameters: tracking params dropped (``utm_*``, ``fbclid``,
      ``gclid``, ``ref``), the rest SORTED (param order is
      transport-level noise), empty query dropped

    Strings without a ``scheme://host`` shape pass through trimmed and
    otherwise untouched — this canonicalizes URLs, it does not validate
    them. Pure built-in expressions (regexp + array ops): map-only,
    whole-stage codegen, no UDF."""
    u = F.trim(col if not isinstance(col, str) else F.col(col))
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""),
        r"#.*",
        "",
    )
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1)), r"^www\.", ""
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_replace(
        F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)="),
    )
    qcanon = F.array_join(F.sort_array(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(""),
    )
    return F.when((scheme == "") | (host == ""), u).otherwise(canon)


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL-level exact dedup on :func:`canonical_url` — the cheap first
    pass of a crawl pipeline (dedup by address before paying for
    content hashing). One groupBy on the canonical string; document
    bodies never shuffle. Output: (canonical_url, n_docs, keep_id) with
    ``keep_id`` = min id per group (deterministic representative)."""
    return (
        df.select(
            F.col(id_col), canonical_url(url_col).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def cluster_representatives(
    df: DataFrame,
    labels: DataFrame,
    id_col: str,
    score_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """Survivor selection after near-dup clustering — the step between
    :func:`dedup_clusters` (pairs → components) and the curated corpus:
    per cluster keep the single best row by ``score_col`` (quality,
    length, recency — caller's choice), ties broken by min ``tie_col``
    (default: the id). Rows absent from ``labels`` are singletons and
    keep themselves.

    One left join on the id (labels are cluster-member-sized) + one
    row_number window partitioned by cluster — cluster sizes are the
    near-dup group sizes, naturally bounded by the upstream pair
    generators' ``max_block`` guards, so the window never sees a
    corpus-sized partition. Output: input columns + ``cluster`` +
    ``kept``; ``where(kept)`` is the surviving corpus, the full frame
    is the audit trail (who lost to whom).
    """
    from pyspark.sql import Window

    tie = tie_col or id_col
    lab = labels.select(F.col("id").alias(id_col), "cluster")
    j = df.join(lab, id_col, "left").withColumn(
        "cluster", F.coalesce(F.col("cluster"), F.col(id_col))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc(score_col), F.asc(tie)
    )
    return j.withColumn("kept", F.row_number().over(w) == 1)


def url_host(col) -> "F.Column":
    """Lowercased registrable host of an absolute URL: scheme,
    ``user:pass@`` credentials, port, path, query and fragment all
    stripped; a trailing dot (FQDN form) removed. Not-URL-shaped
    strings yield ``''``. Pure regexp built-ins — map-only, codegen."""
    u = F.trim(col if not isinstance(col, str) else F.col(col))
    h = F.lower(
        F.regexp_extract(
            u,
            r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/:?#]+)",
            1,
        )
    )
    return F.regexp_replace(h, r"\.$", "")


def flag_blocked_domains(
    df: DataFrame,
    id_col: str,
    url_col: str,
    blocklist: DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Domain-blocklist gate — the first policy filter of every crawl
    pipeline (spam/adult/malware domain lists à la C4's badlist pass):
    a document is blocked when its URL host EQUALS a listed domain or
    is any SUBDOMAIN of one (``cdn.bad.example`` matches
    ``bad.example``; ``notbad.example`` does not — matching is on
    dot-separated label boundaries, never substrings).

    Suffix matching joins, it doesn't scan: each host explodes into
    its ≤ #labels dot-suffixes (``a.b.c`` → ``a.b.c``, ``b.c``,
    ``c``), one hash equi-join against the blocklist marks hits, and
    the flag joins back on the id. Blocklists at Spamhaus scale
    (millions of rows) stay keyed — nothing assumes the list fits in
    a broadcast, though Catalyst will broadcast a small one on its
    own. Document bodies never enter either join: only (id, suffix)
    pairs shuffle.

    Returns ``df`` + ``host`` + ``blocked`` (boolean) — flag form, so
    callers can quarantine, sample, or audit rather than just drop.
    """
    with_host = df.withColumn("host", url_host(F.col(url_col)))
    labels = with_host.select(
        F.col(id_col), F.split("host", r"\.").alias("l")
    )
    cand = labels.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(l)),"
                " i -> array_join(slice(l, i, size(l) - i + 1), '.'))"
            )
        ).alias("__cand"),
    )
    hits = (
        cand.join(
            blocklist.select(
                F.col(domain_col).alias("__cand")
            ).distinct(),
            "__cand",
        )
        .select(id_col)
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return with_host.join(hits, id_col, "left").withColumn(
        "blocked", F.coalesce(F.col("blocked"), F.lit(False))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.9,
    max_block: int | None = None,
    storage_level=None,
) -> DataFrame:
    """Directional token-set CONTAINMENT pairs — the asymmetric
    near-dup measure Jaccard misses: a tweet quoted inside an article
    has tiny Jaccard (union ≈ the article) but containment ≈ 1 in the
    quote→article direction. The standard second pass after symmetric
    dedup for quote/subset/boilerplate-inclusion detection
    (Broder's containment, the C in shingle-based resemblance).

    Same bounded-block contract and 8-byte token-hash discipline as
    :func:`jaccard_block_pairs` (one persisted tokenize pass feeds
    both join sides; ``max_block`` fails fast on quadratic blocks).
    ONE unordered self-join computes the intersection once and tests
    BOTH directions from it — an ordered-pair join would double the
    shuffle for no information.

    Output: (contained_id, container_id, containment) — one row per
    passing DIRECTION, so mutual containment (near-identical sets)
    emits both rows.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.repartition(par)
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            F.transform(
                F.array_distinct(
                    F.split(F.trim(F.lower(text_col)), r"\s+")
                ),
                lambda t: F.xxhash64(t),
            ).alias("toks"),
        )
        .persist(_level(storage_level))
    )
    if max_block is not None:
        hot = (
            df.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_block)
            .limit(5)
            .collect()
        )
        if hot:
            toks.unpersist()
            raise ValueError(
                f"blocks over max_block={max_block}: "
                f"{[(tuple(r[c] for c in block_cols), r['n']) for r in hot]}"
            )
    a = toks.select(
        F.col(id_col).alias("id_a"), *block_cols,
        F.col("toks").alias("toks_a"),
    )
    b = toks.select(
        F.col(id_col).alias("id_b"), *block_cols,
        F.col("toks").alias("toks_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    ca = inter / F.size("toks_a")
    cb = inter / F.size("toks_b")
    thr = float(threshold)
    directed = F.array_compact(
        F.array(
            F.when(
                ca >= thr,
                F.struct(
                    F.col("id_a").alias("contained_id"),
                    F.col("id_b").alias("container_id"),
                    F.round(ca, 6).alias("containment"),
                ),
            ),
            F.when(
                cb >= thr,
                F.struct(
                    F.col("id_b").alias("contained_id"),
                    F.col("id_a").alias("container_id"),
                    F.round(cb, 6).alias("containment"),
                ),
            ),
        )
    )
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        a.join(b, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .select(F.explode(directed).alias("r"))
        .select("r.*"),
        toks,
    )


def soft_dedup_weights(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """SoftDeDup: keep EVERY row and down-weight duplicates instead of
    dropping them — each exact-content group of size n contributes total
    sampling mass 1 (weight 1/n per copy), so the training distribution
    matches the deduplicated corpus while no document is lost (the
    soft alternative to ``exact_dedup`` when provenance or recall
    matters more than corpus size; cf. the SoftDeDup loss-reweighting
    idea applied at the sampling layer).

    One window count over the normalized-text digest. Unlike
    ``exact_dedup`` (which shuffles only digests because it emits one
    survivor), stamping a weight BACK onto every row inherently moves
    the rows once — one body-bearing shuffle, the same volume a
    count-join-back would pay twice. At warehouse scale, write the
    corpus digest-partitioned once and this becomes a shuffle-free
    window.

    Output: input columns + ``n_copies`` and ``weight`` (1/n_copies).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("__h")
    return (
        df.withColumn("__h", F.md5(normalize_text(text_col)))
        .withColumn("n_copies", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("weight", F.lit(1.0) / F.col("n_copies"))
        .drop("__h")
    )


def auto_gram_size(alpha: int, n_distinct: int, cap: int = 8) -> int:
    """The q-vs-alphabet selectivity rule (two killed quadratic drafts,
    REHEARSAL_editjoin_r10: a 16-symbol md5-hex vocabulary needs q≥4 —
    256 q=2 grams are ALL hot at 50k strings; 64-symbol base64 works at
    q=3 where 64³ = 262k ≥ N) turned into arithmetic: the smallest q
    with |alphabet|^q ≥ n_distinct, floored at 2 (single-char prefixes
    are structurally hot) and capped (every +1 of q raises the
    short-string routing threshold q·(k+1))."""
    if alpha < 2:
        return 2
    qv = 2
    while alpha ** qv < n_distinct and qv < cap:
        qv += 1
    return qv


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_edits: int = 2,
    q: "int | str" = 2,
    max_short: int = 100_000,
) -> DataFrame:
    """Similarity self-join under edit distance: all row pairs whose
    strings are within ``max_edits`` Levenshtein operations (and not
    equal — exact duplicates are ``exact_dedup``'s job). Generalizes
    ``fuzzy_key_join`` (joins.py, max_edits=1 deletion neighborhood)
    to arbitrary ``max_edits`` via ed-join prefix filtering (Xiao,
    Wang & Lin, VLDB'08 — public): an edit operation disturbs at most
    ``q`` of a string's q-grams, so two strings within ``k`` edits
    differ in at most ``k·q`` grams each — their ``k·q + 1``
    globally-RAREST grams must intersect. Blocking on only those
    prefix grams (rarest-first) bounds the candidate space AND
    structurally avoids hot-gram blowup: the most frequent grams are
    exactly the ones never indexed.

    Plan shape (all JVM built-ins, no UDF):
    1. collapse rows to DISTINCT strings — the quadratic stage runs on
       the VOCABULARY, never the row count (the t-family discipline);
    2. one gram-frequency aggregation (gram-domain-bounded);
    3. per-string rank grams by (global freq, gram), keep ``k·q + 1``;
    4. gram-keyed candidate join, pair-distinct, length filter
       (|len_a − len_b| ≤ k), ``levenshtein`` verify;
    5. short strings (< q·(k+1) chars — too few grams for the prefix
       guarantee) pair exhaustively against every string within
       length k of them, guarded by ``max_short`` candidates
       (converge-or-raise: silent truncation would be false
       negatives);
    6. expand verified STRING pairs back to id pairs.

    Output: (id_a, id_b, dist) with id_a < id_b, 1 ≤ dist ≤ max_edits.

    Choosing ``q``: the prefix filter selects only when the gram
    DOMAIN is large relative to the vocabulary — |alphabet|^q ≫
    #distinct strings — otherwise every gram is hot and candidates
    degrade toward quadratic (measured in
    REHEARSAL_editjoin_r10.json: 16-symbol synthetic strings need
    q=3; natural text with its ~1e3-symbol bigram domain is fine at
    the q=2 default). Larger q also raises the short-string
    threshold q·(k+1), routing more of the corpus to the banded
    exhaustive path. Pass ``q="auto"`` (VERDICT r10 #7) to apply the
    rule automatically: alphabet size estimated from a 10k-name
    sample, vocabulary size counted exactly, q =
    ``auto_gram_size(alpha, n_distinct)`` — callers no longer need to
    know the selectivity rule to avoid the quadratic regime.
    """
    k = int(max_edits)
    if k < 1:
        raise ValueError("max_edits must be >= 1")
    rows = df.select(
        F.col(id_col).alias("_id"), F.col(str_col).alias("_s")
    ).where(F.col("_s").isNotNull() & F.col("_id").isNotNull())
    names = rows.select("_s").distinct().persist()
    if q == "auto":
        alpha = (
            names.limit(10_000)
            .select(F.explode(F.split("_s", "")).alias("_c"))
            .where(F.col("_c") != "")
            .agg(F.countDistinct("_c").alias("a"))
            .collect()[0]["a"]
        )
        q = auto_gram_size(int(alpha or 0), names.count())
    q = int(q)
    short_len = q * (k + 1)
    longs = names.where(F.length("_s") >= short_len)
    grams = longs.select(
        "_s",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(_s) - {q} + 1),"
                    f" i -> substring(_s, i, {q}))"
                )
            )
        ).alias("_g"),
    )
    freq = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_f"))
    w = Window.partitionBy("_s").orderBy(F.asc("_f"), F.asc("_g"))
    prefix = (
        grams.join(freq, "_g")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k * q + 1)
        .select("_s", "_g")
    )
    a, b = prefix.alias("_a"), prefix.alias("_b")
    cand = (
        a.join(b, "_g")
        .where(F.col("_a._s") < F.col("_b._s"))
        .select(
            F.col("_a._s").alias("_sa"), F.col("_b._s").alias("_sb")
        )
        .distinct()
    )
    # short strings: the prefix guarantee needs >= k·q + 1 grams; pair
    # them against EVERY name within length k instead (length-banded
    # nested loop over an alphabet-bounded set). The join condition is
    # `!=` + least/greatest normalization, NOT `_sa < _sb`: a LONG
    # partner (len in [q(k+1), q(k+1)+k)) that sorts lexicographically
    # BEFORE the short string has no other path to the pair — it is
    # not in `shorts` and the short string is not in `longs` — so an
    # ordered join would silently drop e.g. ('zzzzz','azzzzz'), dist 1.
    # short×short pairs generate twice and collapse in the distinct.
    shorts = names.where(F.length("_s") < short_len)
    if shorts.isEmpty():
        # common case (one homogeneous long-string vocabulary): skip
        # the short path entirely — no candidate join, no guard count
        cand_all = cand
    else:
        partners = names.where(F.length("_s") < short_len + k)
        short_cand = (
            shorts.select(F.col("_s").alias("_x"))
            .join(
                partners.select(F.col("_s").alias("_y")),
                (F.col("_x") != F.col("_y"))
                & (F.abs(F.length("_x") - F.length("_y")) <= k),
            )
            .select(
                F.least("_x", "_y").alias("_sa"),
                F.greatest("_x", "_y").alias("_sb"),
            )
            .distinct()
        )
        n_short = short_cand.count()
        if n_short > max_short:
            raise RuntimeError(
                f"edit_distance_join: {n_short} short-string candidate"
                f" pairs exceed max_short={max_short} — raise q,"
                " max_short, or pre-filter degenerate keys (silent"
                " truncation would be false negatives)"
            )
        cand_all = cand.unionByName(short_cand)
    verified = (
        cand_all.distinct()
        .where(F.abs(F.length("_sa") - F.length("_sb")) <= k)
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .where((F.col("dist") >= 1) & (F.col("dist") <= k))
    )
    ra = rows.select(F.col("_id").alias("_ida"), F.col("_s").alias("_sa"))
    rb = rows.select(F.col("_id").alias("_idb"), F.col("_s").alias("_sb"))
    out = (
        verified.join(ra, "_sa")
        .join(rb, "_sb")
        .where(F.col("_ida") != F.col("_idb"))
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "dist",
        )
        .distinct()
    )
    names.unpersist()
    return out


def lsh_parameter_plan(
    spark,
    total_hashes: int = 128,
    threshold: float = 0.5,
    sims: tuple[float, ...] = (0.3, 0.5, 0.7, 0.8, 0.9),
) -> DataFrame:
    """MinHash-LSH (bands, rows) planner: for every factorization
    b·r = ``total_hashes``, the catch probability 1 − (1 − s^r)^b at
    each similarity of interest, the S-curve threshold (1/b)^(1/r),
    and the gap to the target ``threshold`` — the design table behind
    minhash_lsh_neardup's banding, turned into a first-class operator
    after the r10 factor-100 rehearsal measured its first real
    false negatives (REHEARSAL_dedup_pipeline_r10 finding_factor100:
    2 escapes in 495k docs at s≈0.8) — this table is how a pipeline
    QUANTIFIES that residual risk before choosing a config instead of
    discovering it at scale.

    Pure arithmetic over a divisor-pair grid (≤ d(total_hashes) rows —
    driver-built literals, no data scan); both engines evaluate the
    same pow() so the plan is hash-certifiable. Output one row per
    (bands, rows): (bands, rows, s_threshold, threshold_gap,
    p_at_<s>...) rounded 6, sorted by threshold_gap then bands.
    """
    pairs = [
        (b, total_hashes // b)
        for b in range(1, total_hashes + 1)
        if total_hashes % b == 0
    ]
    grid = spark.createDataFrame(pairs, "bands int, rows int")
    s_thr = F.pow(
        F.lit(1.0) / F.col("bands"), F.lit(1.0) / F.col("rows")
    )
    cols = [
        F.col("bands"),
        F.col("rows"),
        F.round(s_thr, 6).alias("s_threshold"),
        F.round(F.abs(s_thr - F.lit(float(threshold))), 6).alias(
            "threshold_gap"
        ),
    ]
    for s in sims:
        p = F.lit(1.0) - F.pow(
            F.lit(1.0) - F.pow(F.lit(float(s)), F.col("rows")),
            F.col("bands"),
        )
        cols.append(
            F.round(p, 6).alias(f"p_at_{str(s).replace('.', '_')}")
        )
    return grid.select(*cols).orderBy("threshold_gap", "bands")


def jaccard_prefix_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    storage_level=None,
    max_bucket: int | None = None,
    on_hot: str = "raise",
    max_candidates: int | None = 200_000_000,
) -> DataFrame:
    """EXACT set-similarity self-join: all document pairs with shingle
    Jaccard ≥ ``threshold`` — no blocking keys (d2's limitation), no
    probabilistic recall (d3's trade). The AllPairs/PPJoin prefix
    filter (Bayardo et al., WWW'07; Vernica et al., SIGMOD'10 —
    public) as a first-class operator, generalizing the short-doc
    routing inside minhash_lsh_neardup to the WHOLE corpus: rank each
    doc's shingle hashes by (global frequency, hash) and index only
    the first sz − ⌈t·sz⌉ + 1 — two sets with Jaccard ≥ t must share
    min(A∩B) inside BOTH prefixes (if min(A∩B) sat outside A's
    prefix, all of A∩B would fit in A's ⌈t·sz⌉−1 tail, contradicting
    |A∩B| ≥ t·|A∪B| ≥ ⌈t·|A|⌉).

    Completes the dedup-join triad: d2 = exact within blocks
    (quadratic per block), d3 = probabilistic unblocked (LSH), this =
    exact unblocked. Candidate volume is bounded by prefix-gram
    selectivity, NOT by a block size — rarest-first ordering makes
    hot grams structurally unindexed for long docs, and the residual
    hot-gram risk obeys the same ``max_bucket``/``on_hot`` discipline
    as the LSH buckets.

    TWO guards, because the operator has two failure regimes (both
    converge-or-raise — the quadratic case hits a guard, never
    silence or an OOM): ``max_bucket`` bounds a single hot gram's
    group, and ``max_candidates`` bounds the RAW JOIN VOLUME
    Σ_g n(g)² estimated from the prefix index BEFORE the join runs —
    the r11 --jaccard-join rehearsal's factor-50 corpus (every doc in
    a ~50-strong near-dup family, so families share whole prefixes)
    kept every per-gram group under max_bucket yet accumulated ~325M
    raw join rows and OOM-killed the JVM; that regime is
    near-duplication so heavy that an EXACT join is the wrong tool,
    and the guard now says so with the estimate in the message
    (exact-dedup first, raise the threshold, or accept
    minhash_lsh_neardup's banding). Default calibrated from the same
    rehearsal: 97M raw rows completed comfortably on the 16 GB local
    box (29 s), 2.4B was the OOM — 200M sits 2× above the measured-
    good point and 12× under the measured-fatal one; cluster
    deployments scale it with executor count.

    Plan: shingle-hash once (persisted — the minhash_lsh_neardup
    discipline), one gram-frequency aggregation, one rank window,
    prefix-keyed self-join (id_a < id_b, Jaccard-feasible size band
    t·|B| ≤ |A|), exact-Jaccard verify against the persisted arrays.
    Output: (id_a, id_b, jaccard) rounded 6.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    if on_hot not in ("raise", "drop"):
        raise ValueError(f"on_hot must be 'raise' or 'drop', got {on_hot!r}")
    par = df.sparkSession.sparkContext.defaultParallelism
    # Filter on the SOURCE column, not the derived array: for non-null
    # text, size(sh) >= 1 always holds (split returns >= 1 token and
    # sequence(0, greatest(sz-n, 0)) is never empty), and for null text
    # the whole array is null — so `text IS NOT NULL` keeps exactly the
    # same rows. The old `.where(F.size("sh") >= 1)` referenced the
    # derived column, which Catalyst collapses into the projection and
    # pushes below it, RE-EVALUATING the full shingle expression for the
    # predicate — measured 3.3 s vs 0.5 s for the sf0.1 shingle stage
    # (guide §4.4's duplicate-evaluation class, JVM-expression flavor).
    # The null filter now also pushes down to the parquet scan.
    sh = (
        df.where(F.col(text_col).isNotNull())
        .repartition(par)
        .select(
            F.col(id_col),
            F.transform(
                shingles(text_col, n), lambda s: F.xxhash64(s)
            ).alias("sh"),
        )
        .persist(_level(storage_level))
    )
    ex = sh.select(
        F.col(id_col).alias("__id"),
        F.size("sh").alias("__sz"),
        F.explode("sh").alias("__g"),
    )
    freq = ex.groupBy("__g").agg(F.count(F.lit(1)).alias("__f"))
    wnd = Window.partitionBy("__id").orderBy(F.asc("__f"), F.asc("__g"))
    t = F.lit(float(threshold))
    prefix = (
        ex.join(freq, "__g")
        .withColumn("__rk", F.row_number().over(wnd))
        .where(F.col("__rk") <= F.col("__sz") - F.ceil(t * F.col("__sz")) + 1)
        .select("__id", "__sz", "__g", "__rk")
        .persist(_level(storage_level))
    )
    try:
        prefix_j = prefix
        if max_bucket is not None:
            gsize = prefix.groupBy("__g").agg(
                F.count(F.lit(1)).alias("__n")
            )
            if on_hot == "raise":
                hot = (
                    gsize.where(F.col("__n") > max_bucket).limit(5).collect()
                )
                if hot:
                    raise ValueError(
                        f"prefix gram groups over max_bucket={max_bucket}:"
                        f" {[(r['__g'], r['__n']) for r in hot]};"
                        ' use on_hot="drop" or exact-dedup first'
                    )
            else:
                prefix_j = prefix.join(
                    gsize.where(F.col("__n") <= max_bucket).select("__g"),
                    "__g",
                )
        if max_candidates is not None:
            est = (
                prefix_j.groupBy("__g")
                .agg(F.count(F.lit(1)).cast("double").alias("__n"))
                .agg(F.sum(F.col("__n") * F.col("__n")).alias("_e"))
                .collect()[0]["_e"]
            )
            if est and est > max_candidates:
                raise CandidateVolumeExceeded(
                    f"jaccard_prefix_join: estimated raw candidate volume"
                    f" {int(est)} (Σ per-gram n²) exceeds max_candidates="
                    f"{max_candidates} — the corpus is too near-duplicate-"
                    "heavy for an exact join: exact-dedup first, raise the"
                    " threshold, or use minhash_lsh_neardup"
                )
    except BaseException:
        sh.unpersist()
        prefix.unpersist()
        raise
    pa = prefix_j.select(
        F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"),
        F.col("__rk").alias("__rka"), "__g"
    )
    pb = prefix_j.select(
        F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"),
        F.col("__rk").alias("__rkb"), "__g"
    )
    cand = (
        pa.join(pb, "__g")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.least("__sza", "__szb") >= t * F.greatest("__sza", "__szb"))
            # PPJoin positional filter: both docs' gram lists sort by
            # the same global (freq, hash) order, so for the SMALLEST
            # common gram the rest of the intersection ranks later on
            # BOTH sides — o ≤ 1 + min(szA−rkA, szB−rkB) — while
            # J ≥ t needs o ≥ t/(1+t)·(szA+szB). The smallest-common-
            # gram row is the pigeonhole witness and always passes, so
            # discarding failing rows loses no pair. Multiplied form —
            # a float ceil at an exact integer boundary could
            # over-prune.
            & (
                (1 + F.least(
                    F.col("__sza") - F.col("__rka"),
                    F.col("__szb") - F.col("__rkb"),
                )) * (F.lit(1.0) + t)
                >= t * (F.col("__sza") + F.col("__szb"))
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    # inclusion–exclusion: |A∪B| = |A|+|B|−|A∩B| for the distinct hash
    # arrays — one array op instead of two in the (filter-duplicated)
    # verify expression (r14)
    _i = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    jac = _i / (F.size("sh_a") + F.size("sh_b") - _i)
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        sh,
        prefix,
    )


def similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    storage_level=None,
    max_bucket: int | None = None,
    on_hot: str = "raise",
    max_candidates: int | None = 200_000_000,
    k: int = 32,
    bands: int = 8,
    target_recall: float | None = None,
    short_min: int | None = None,
) -> DataFrame:
    """ONE front door for the dedup-join triad (VERDICT r11 #4):
    attempt the EXACT unblocked join (:func:`jaccard_prefix_join`) and
    let its calibrated Σ per-gram n² raw-volume guard adjudicate —
    under ``max_candidates`` the exact path runs to completion; over
    it (the r11 factor-50 rehearsal's regime: near-duplication so
    heavy that whole prefixes are shared family-wide and the exact
    join's candidate volume goes quadratic) the operator ROUTES to
    :func:`minhash_lsh_neardup` instead of raising, which is exactly
    what the guard's own error message tells a human to do.

    The result carries a literal ``route`` column ('exact' | 'lsh') so
    downstream consumers — and the rehearsal artifacts — see which
    path produced the pairs. Both paths verify exact Jaccard on the
    full shingle sets, so ``jaccard`` is exact either way; the routes
    differ in RECALL (exact = provably complete; lsh = banded
    probability, plus the short-doc exact routing). The reroute pays
    the estimator's prep (one shingle pass, one frequency aggregation,
    one rank window) before discarding it — bounded, and only in the
    regime where the LSH run dominates total cost anyway.

    LSH-only knobs (``k``, ``bands``, ``target_recall``, ``short_min``)
    are forwarded to the fallback; shared knobs (``threshold``, ``n``,
    ``storage_level``, ``max_bucket``, ``on_hot``) apply to both. A
    hot-gram raise under ``on_hot='raise'`` propagates — a single hot
    gram fails BOTH paths' bucket discipline, so rerouting would just
    re-raise after twice the work."""
    from ixmp_spark.operators import attach_caches

    try:
        out = jaccard_prefix_join(
            df, id_col, text_col, threshold=threshold, n=n,
            storage_level=storage_level, max_bucket=max_bucket,
            on_hot=on_hot, max_candidates=max_candidates,
        )
        route = "exact"
    except CandidateVolumeExceeded:
        # the guard unpersisted the exact path's frames on raise
        out = minhash_lsh_neardup(
            df, id_col, text_col, k=k, bands=bands, n=n,
            threshold=threshold, storage_level=storage_level,
            max_bucket=max_bucket, on_hot=on_hot,
            target_recall=target_recall, short_min=short_min,
        )
        route = "lsh"
    # withColumn returns a NEW DataFrame object — re-attach the cache
    # handles so release_cache on the front door's result still frees
    # the chosen path's persisted frames
    return attach_caches(
        out.withColumn("route", F.lit(route)),
        *getattr(out, "_ixmp_spark_caches", ()),
    )
