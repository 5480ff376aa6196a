"""Rows-only declared queries (no DuckDB oracle is expressible).

These are genuinely non-SQL-replicable ops — engine-specific hash
families (Spark xxhash64), KMeans indexes, approximate sketches. The
driver records a weaker rows-only check for them, so they register
*after* every oracle-paired query: the driver's correctness budget
(first 50 catalog entries) is spent on hash-verified rows first.
Accuracy/determinism for everything here is pinned in unit tests
(tests/test_dedup.py, tests/test_similarity.py, tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ixmp_spark.operators.dedup import minhash_lsh_neardup, simhash64
from ixmp_spark.queries import load, load_spread, query


@query("x1_sketches")  # no SQL oracle: sketch internals are engine-specific
def x1_sketches(spark, sf_dir):
    """Approximate sketch aggregates — the fixed-memory, mergeable scale
    path for distinct counts and quantiles (HLL++ / KLL-style): at 100 TB
    exact countDistinct shuffles every distinct value, a sketch ships a
    few KB per partition. Rows-only check; accuracy bounds are asserted
    in unit tests against the exact values."""
    # fixed 32-way repartition, deliberately NOT load_spread: the heavy
    # per-row work (HLL updates, percentile-summary inserts, the
    # distinct Expand) otherwise serializes in the bench files' single
    # scan task (measured 9.3 s → 3.7 s), and a FIXED count — unlike
    # defaultParallelism — keeps approx_percentile's summary-merge
    # topology, and therefore its value, a pure function of the data
    # across the driver's different core-count arms.
    li = load(spark, sf_dir, "lineitem").repartition(32)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
            "approx_median_price"
        ),
    )


@query("d3_minhash_lsh")  # no SQL oracle: xxhash64 not available in DuckDB
def d3_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup scale path: shingle once → 32 min-hashes →
    8 bands → bucket self-join → exact 3-gram Jaccard on candidates ≥ 0.3.
    Rows-only check (the banded-hash family is engine-specific)."""
    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_neardup(
        docs, id_col="doc_id", text_col="text", k=32, bands=8, n=3, threshold=0.3
    )


@query("d4_simhash")  # no SQL oracle: xxhash64-based bit votes
def d4_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints (near-dup via Hamming distance on the
    fingerprint). Rows-only check; determinism is covered in unit tests."""
    # load_spread: the per-bigram hash + 64-bit vote fold is map-only
    # and per-row expensive — single-task on the bench files otherwise.
    docs = load_spread(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash64("text", n=2).alias("simhash"))


@query("e2_embed_ann")  # no SQL oracle: LSH bucketing is engine-specific
def e2_embed_ann(spark, sf_dir):
    """ANN via sign-LSH bucketing: deterministic pseudo-random hyperplanes,
    candidate set = probe's bucket, exact cosine within. Rows-only check;
    recall vs e1 is asserted in unit tests."""
    import random

    from ixmp_spark.operators.similarity import bucketed_topk

    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    emb = load(spark, sf_dir, "embeddings")
    probe = emb.orderBy("vec_id").limit(1)
    return bucketed_topk(
        emb, probe, id_col="vec_id", vec_col="embedding", planes=planes, k=10
    )


@query("e3_embed_ivf")  # no SQL oracle: k-means index is engine-specific
def e3_embed_ivf(spark, sf_dir):
    """IVF ANN: KMeans-partitioned corpus, probe the 2 nearest of 16
    clusters, exact cosine within — the index-amortized scale path
    (each query touches ~n_probe/n_clusters of the corpus). Rows-only;
    recall vs the exact e1 baseline is asserted in unit tests."""
    from ixmp_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    probe = emb.orderBy("vec_id").limit(1)
    return ivf_topk(
        emb, probe, id_col="vec_id", vec_col="embedding",
        n_clusters=16, n_probe=2, k=10,
    )


@query("e5_cosine_lsh_pairs")  # no SQL oracle: hyperplane family is engine-specific
def e5_cosine_lsh_pairs(spark, sf_dir):
    """Embedding-cosine near-dup at scale: banded sign-LSH candidates
    (shuffle on (band, bucket), never all-pairs) + exact cosine filter —
    the vector twin of d3's MinHash plan. Rows-only; candidate-subset and
    recall-vs-exact invariants are pinned in unit tests."""
    from ixmp_spark.operators.similarity import cosine_lsh_pairs

    emb = load(spark, sf_dir, "embeddings")
    return cosine_lsh_pairs(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.3,
        bands=6, bits=6,
    )


@query("t6_winnow_fingerprints")  # no SQL oracle: xxhash64 rolling hashes
def t6_winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (rolling k-gram hash + per-window
    minima — the local-similarity member of the dedup family; SIGMOD'03).
    Rows-only; the shared-substring guarantee and overlap behavior are
    pinned in unit tests."""
    from ixmp_spark.operators.dedup import winnow_fingerprints

    # load_spread: per-character rolling hashes are the most per-row-
    # expensive transform in the catalog; on the single-split bench
    # files the whole corpus would hash in one task.
    docs = load_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        winnow_fingerprints("text", k=5, w=4).alias("fingerprints"),
    )


@query("e6_semantic_dedup")  # no SQL oracle: k-means blocking is engine-specific
def e6_semantic_dedup(spark, sf_dir):
    """SemDeDup: KMeans-blocked cosine near-dup components over the
    embedding table; every vector mapped to its representative."""
    from ixmp_spark.operators.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    out = semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding",
        n_clusters=8, threshold=0.92, max_cluster=5000,
    )
    return out.select(
        "vec_id", "rep_id", F.col("cluster").cast("long").alias("cluster")
    )


@query("m1_media_features")  # no SQL oracle: Arrow mapInPandas decode path
def m1_media_features(spark, sf_dir):
    """Multimodal decode→features over REAL in-plan media bytes: even
    documents become 10x1 binary-PPM images whose pixel bytes are the
    document's first 30 text bytes (a genuine stdlib decode — header
    parse + numpy pixel array inside the Arrow batches), odd documents
    ride the documented fingerprint fallback (image/png, PIL absent).
    Exercises the media-struct schema and mapInPandas batch plumbing at
    corpus scale; per-format decode values are pinned in unit tests
    (tests/test_streaming_model_mm.py)."""
    from ixmp_spark.operators.multimodal import extract_features

    docs = load(spark, sf_dir, "documents")
    ppm = F.concat(
        F.lit(b"P6\n10 1\n255\n"),
        F.substring(F.encode(F.rpad("text", 30, " "), "UTF-8"), 1, 30),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, ppm)
            .otherwise(F.encode("text", "UTF-8"))
            .alias("content"),
            F.lit(None).cast("string").alias("uri"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("image/ppm"))
            .otherwise(F.lit("image/png"))
            .alias("mime"),
            F.lit(10).alias("width"),
            F.lit(1).alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("media"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "mime",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f_mean_r"),
        F.round(F.element_at("features", 4), 6).alias("f_luma"),
    )


@query("m2_audio_features")  # no SQL oracle: Arrow mapInPandas decode path
def m2_audio_features(spark, sf_dir):
    """Audio twin of m1: every even document becomes a REAL 8-bit-PCM
    mono WAV whose 32 samples are the document's first 32 text bytes
    (constant 44-byte RIFF header built driver-side with the stdlib
    ``wave`` writer — a genuine in-plan decode through ``wave`` +
    numpy inside the Arrow batches, yielding 16 RMS-segment features);
    odd documents ride the documented fingerprint fallback (audio/flac,
    librosa absent). Gives the audio decode path corpus-scale
    driver-visible signal; exact RMS values are pinned in unit tests."""
    import io
    import wave as _wave

    from ixmp_spark.operators.multimodal import extract_features

    buf = io.BytesIO()
    w = _wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(1)
    w.setframerate(8000)
    w.writeframes(b"\x00" * 32)
    w.close()
    header = buf.getvalue()[:-32]  # constant header for 32 sample bytes

    docs = load(spark, sf_dir, "documents")
    wav = F.concat(
        F.lit(header),
        F.substring(F.encode(F.rpad("text", 32, " "), "UTF-8"), 1, 32),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, wav)
            .otherwise(F.encode("text", "UTF-8"))
            .alias("content"),
            F.lit(None).cast("string").alias("uri"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("audio/wav"))
            .otherwise(F.lit("audio/flac"))
            .alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(8000).alias("sample_rate"),
            F.lit(0.004).alias("duration_s"),
        ).alias("media"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "mime",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f_rms_seg1"),
        F.round(F.element_at("features", 16), 6).alias("f_rms_seg16"),
    )


@query("m3_video_features")  # no SQL oracle: Arrow mapInPandas decode path
def m3_video_features(spark, sf_dir):
    """Video twin of m1/m2 — the third modality's REAL decode path gets
    corpus-scale driver signal: every even document becomes a genuine
    one-frame 8×1 uncompressed AVI (valid RIFF container built
    driver-side with ``_encode_avi``; the 24 frame-payload bytes are
    swapped in-plan for the document's first 24 text bytes — width 8
    keeps the DIB row 4-byte aligned so the payload is a clean splice),
    decoded frame-by-frame through the RIFF/DIB parser inside the Arrow
    batches; odd documents ride the documented fingerprint fallback
    (video/mp4, pyav/ffmpeg absent). Frame-exact decode values are
    pinned in tests/test_streaming_model_mm.py."""
    import numpy as np

    from ixmp_spark.operators.multimodal import _encode_avi, extract_features

    template = _encode_avi([np.zeros((1, 8, 3), dtype=np.uint8)], fps=1)
    payload = b"\x00" * 24
    off = template.rindex(payload)  # the single frame's DIB body
    prefix, suffix = template[:off], template[off + 24:]

    docs = load(spark, sf_dir, "documents")
    avi = F.concat(
        F.lit(prefix),
        F.substring(F.encode(F.rpad("text", 24, " "), "UTF-8"), 1, 24),
        F.lit(suffix),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, avi)
            .otherwise(F.encode("text", "UTF-8"))
            .alias("content"),
            F.lit(None).cast("string").alias("uri"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("video/avi"))
            .otherwise(F.lit("video/mp4"))
            .alias("mime"),
            F.lit(8).alias("width"),
            F.lit(1).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1.0).alias("duration_s"),
        ).alias("media"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "mime",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f_mean_r"),
        F.round(F.element_at("features", 4), 6).alias("f_luma"),
    )


@query("e8_hard_negatives")  # no SQL oracle: hyperplane family is engine-specific
def e8_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining: per-anchor top-k MID-similarity
    neighbors (cosine in [min_sim, max_sim)) via coarse banded sign-LSH
    + exact-cosine verify + rank-limited per-anchor window. The
    [*, max_sim) ceiling excludes near-duplicates — unlabeled positives,
    not negatives. Rows-only; the planted-structure semantics (near-dup
    excluded, mid-sim group found) are pinned in
    tests/test_scale.py::test_hard_negatives_planted_structure."""
    from ixmp_spark.operators.similarity import hard_negatives

    emb = load(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb, "vec_id", "embedding", k=5,
        min_sim=0.2, max_sim=0.9, bands=6, bits=4, on_hot="drop",
    )


@query("e9_prototype_prune")  # no SQL oracle: k-means centroids are engine-specific
def e9_prototype_prune(spark, sf_dir):
    """D4-style prototypicality pruning: drop the quarter of each
    KMeans cluster closest to its centroid (the semantically redundant
    dense core). Rows-only; the planted-structure semantics (a tight
    replica clump is pruned, diffuse points survive) are pinned in
    tests/test_scale.py::test_prototype_prune_planted_structure."""
    from ixmp_spark.operators.similarity import prototype_prune

    emb = load(spark, sf_dir, "embeddings")
    return prototype_prune(
        emb, "vec_id", "embedding", n_clusters=16, prune_frac=0.25
    )


@query("e10_pca_whiten")  # no SQL oracle: PCA basis is engine-specific
def e10_pca_whiten(spark, sf_dir):
    """PCA-whitening of the embedding corpus (pca_whiten, k=8): the
    decorrelate-and-equalize preprocessing SemDeDup/D4-style semantic
    pipelines apply before clustering. Rows-only — the principal basis
    depends on Spark ML's solver; the operator's invariants (unit
    per-dimension variance, near-zero cross-correlation, exact
    reconstruction of planted dominant directions) are pinned in
    tests/test_scale.py::test_pca_whiten_planted_structure."""
    from ixmp_spark.operators.similarity import pca_whiten

    emb = load(spark, sf_dir, "embeddings")
    out, _info = pca_whiten(emb, "vec_id", "embedding", k=8)
    return out


@query("x4_supplier_pagerank")  # no SQL oracle: iterative fixpoint;
# update rule pinned vs pure-Python power iteration in
# tests/test_scale.py::test_pagerank_matches_power_iteration
def x4_supplier_pagerank(spark, sf_dir):
    """PageRank centrality over the supplier→customer fulfillment graph
    (supplier s shipped a line item on customer c's order): the
    corpus-curation centrality signal exercised on the TPC-H-ish
    testdata's natural directed graph. Fixed 3 iterations so the
    catalog cost is bounded; the operator's converge-or-raise mode is
    the production path."""
    from ixmp_spark.operators.joins import pagerank

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
    )
    return pagerank(edges, max_iter=3, tol=None)


@query("x9_lpa_communities")  # no SQL oracle: iterative majority-vote
# fixpoint; update rule pinned vs a pure-Python synchronous replay in
# tests/test_scale.py::test_lpa_matches_python_replay
def x9_lpa_communities(spark, sf_dir):
    """Label-propagation communities over the co-supplier graph
    (suppliers sharing an order) — the density-aware complement of
    d6's connected components, fixed 4 rounds for bounded catalog
    cost; the operator's converged flag reports whether the budget
    sufficed."""
    from ixmp_spark.operators.joins import lpa_communities

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
    )
    return lpa_communities(edges, max_iter=4)


@query("x12_markov_stationary")  # no SQL oracle: iterative fixpoint;
# pinned vs a pure-Python weighted power iteration in
# tests/test_scale.py::test_weighted_pagerank_markov_stationary
def x12_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain: edges
    are per-user consecutive event-type transitions weighted by their
    observed counts (g5's transition matrix), ranked by the WEIGHTED
    pagerank power iteration (rank flows proportionally to transition
    probability; damping 0.95 is the teleporting regularizer that
    guarantees irreducibility). The long-run occupancy of each event
    type — the steady-state the funnel family's per-step views don't
    show. Fixed 8 rounds for bounded catalog cost (the event-type
    graph has ~5 nodes; per-round cost here is pure job overhead,
    and the 0.95-damped chain is well mixed by round 8)."""
    from pyspark.sql import Window

    from ixmp_spark.operators.joins import pagerank

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next", F.lead("event_type").over(w))
        .where(F.col("next").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(
        trans, damping=0.95, max_iter=8, tol=None, weight_col="w"
    )


@query("m4_image_neardup")  # no SQL oracle: Arrow mapInPandas decode path
def m4_image_neardup(spark, sf_dir):
    """Perceptual image near-dedup over REAL in-plan media bytes
    (image_dhash → dhash_neardup_pairs): every document renders as a
    16x8 binary-PPM whose pixels derive from its text bytes, decoded
    and dHashed inside Arrow batches; banded 16-bit joins then pair
    images within 6 flipped bits — the multimodal twin of d4's
    SimHash pipeline, returning per-image pair counts (bounded,
    deterministic). Hash values are pinned in unit tests; here the
    plumbing runs at corpus scale."""
    from ixmp_spark.operators.multimodal import (
        dhash_neardup_pairs,
        image_dhash,
    )

    docs = load(spark, sf_dir, "documents")
    ppm = F.concat(
        F.lit(b"P6\n16 8\n255\n"),
        F.substring(
            F.encode(F.rpad("text", 384, " "), "UTF-8"), 1, 384
        ),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            ppm.alias("content"),
            F.lit(None).cast("string").alias("uri"),
            F.lit("image/ppm").alias("mime"),
            F.lit(16).alias("width"),
            F.lit(8).alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("media"),
    )
    hashes = image_dhash(media)
    pairs = dhash_neardup_pairs(hashes, max_hamming=6)
    return (
        pairs.select(F.explode(F.array("a", "b")).alias("media_id"))
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_neardups"))
        .orderBy("media_id")
    )


@query("p22_topic_model")  # no SQL oracle: stochastic variational LDA fit
def p22_topic_model(spark, sf_dir):
    """Online-LDA topic map of the corpus (topic_model, k=4): per-doc
    argmax topic + weight — the unsupervised domain column for mixing
    when sources don't carry one. Distributed CountVectorizer +
    mini-batch variational LDA (driver state k×vocab, never
    corpus-sized). Rows-only by nature (stochastic fit); structure
    recovery is pinned in unit tests on planted vocabularies."""
    from ixmp_spark.operators.text import topic_model

    docs = load_spread(spark, sf_dir, "documents")
    doc_topics, _ = topic_model(
        docs, "doc_id", "text", k=4, max_iter=10
    )
    return doc_topics.orderBy("doc_id")


@query("m5_image_patches")  # no SQL oracle: Arrow mapInPandas decode path
def m5_image_patches(spark, sf_dir):
    """ViT-style patchification over REAL in-plan media bytes
    (patchify_images): even documents render as 12x8 binary-PPMs
    (pixels = the text's first 288 bytes) and split into 4x4 tiles —
    3x2 = 6 patch rows per image with exact mean-RGB features
    computed inside Arrow batches; odd documents (image/png, PIL
    absent) ride the documented single-fingerprint-patch fallback.
    The patch-sequence fanout (one row per tile, grid position
    carried) is the training-data shape a vision pipeline feeds a
    transformer; per-tile means are pinned in unit tests
    (test_patchify_images_pinned)."""
    from ixmp_spark.operators.multimodal import patchify_images

    docs = load(spark, sf_dir, "documents")
    ppm = F.concat(
        F.lit(b"P6\n12 8\n255\n"),
        F.substring(
            F.encode(F.rpad("text", 288, " "), "UTF-8"), 1, 288
        ),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, ppm)
            .otherwise(F.encode("text", "UTF-8"))
            .alias("content"),
            F.lit(None).cast("string").alias("uri"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("image/ppm"))
            .otherwise(F.lit("image/png"))
            .alias("mime"),
            F.lit(12).alias("width"),
            F.lit(8).alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("media"),
    )
    return patchify_images(media, patch=4).orderBy(
        "media_id", "patch_row", "patch_col"
    )
