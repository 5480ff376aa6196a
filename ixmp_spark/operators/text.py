"""Text-analysis operators (training-data pipeline extension surface).

Language-ID, quality scoring, token counting, and fingerprinting — all as
Catalyst column expressions over the ``documents`` table. No Python UDFs:
these run inside whole-stage codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny per-language stopword marker lists for the n-gram heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def token_count(col) -> Column:
    """Whitespace token count (size of split on runs of whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def word_token_count(col) -> Column:
    """BPE-ish token estimate: count of word/number/punctuation chunks
    (regexp-based; a real BPE runs as a Pandas UDF in sources/multimodal)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio(col) -> Column:
    """Punctuation chars / total chars (quality-score component)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[^.!?,;:]", "")) / F.length(c)


def mean_word_len(col) -> Column:
    """Mean word length: (non-space chars) / tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"\s", "")) / token_count(c)


def stopword_ratio(col, lang: str = "en") -> Column:
    """Fraction of tokens that are (language-marker) stopwords."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return hits / F.size(toks)


def quality_score(col) -> Column:
    """Composite quality score in [0, 1]: rewards moderate length and word
    size, penalizes punctuation soup. Deterministic arithmetic only."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(1000.0), F.lit(1.0))
    wl = mean_word_len(c)
    wl_score = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_pen = F.least(punct_ratio(c) * 5, F.lit(1.0))
    return F.round(0.5 * len_score + 0.3 * wl_score + 0.2 * (1 - punct_pen), 4)


def fingerprint64(col) -> Column:
    """Document fingerprint: 64-bit xxhash of the normalized text (the
    rolling-hash analogue; stable across partitions/engines only within
    Spark — for cross-engine checks use md5)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def lang_id(col) -> Column:
    """N-gram-heuristic language ID: pick the language whose marker
    stopwords have the most hits; 'und' (undetermined) when no marker hits.
    Pure case-when over per-language hit counts."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    hits = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reverse order so earlier languages win ties (stable priority)
    for lang in reversed(list(hits)):
        expr = F.when(hits[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Attach the full stat column family to a documents frame."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("punct_ratio", F.round(punct_ratio(text_col), 6))
        .withColumn("mean_word_len", F.round(mean_word_len(text_col), 4))
        .withColumn("quality", quality_score(text_col))
    )


#: PII/noise patterns for redaction (RE2-compatible — portable across
#: Spark and the DuckDB oracle)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"
_NUM_RE = r"\b[0-9]{7,}\b"


def redact_pii(col) -> Column:
    """Redact emails, URLs and long digit runs with typed placeholders —
    the standard pre-training scrub, as chained JVM-side regexp_replace."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, _EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, _URL_RE, "<URL>")
    return F.regexp_replace(out, _NUM_RE, "<NUM>")


def dedup_segments(col, sep: str = ". ") -> Column:
    """Intra-document segment dedup (C4-style line/paragraph cleaning):
    split on the separator, drop exact repeats keeping first occurrence,
    rejoin. array_distinct preserves first-occurrence order."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_distinct(F.split(c, F.lit(sep), -1)), sep)


def repetition_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    duplicate-word fraction, duplicate-bigram fraction, and top-word
    share. High values mark boilerplate/spam for pre-training filters.

    Pure Catalyst: the bigram array is built from one split, and the
    top-word share folds over the DISTINCT words only (O(distinct·n)
    per document — bounded by document size, no shuffle; the whole
    thing is a map-only projection)."""
    c = F.col(text_col)
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    n_toks = F.size(toks)
    dup_word = 1 - F.size(F.array_distinct(toks)) / n_toks
    idx2 = F.sequence(F.lit(1), F.greatest(n_toks - 1, F.lit(1)))
    grams2 = F.transform(
        idx2, lambda i: F.concat_ws(" ", F.slice(toks, i, 2))
    )
    dup_bigram = 1 - F.size(F.array_distinct(grams2)) / F.size(grams2)
    counts = F.transform(
        F.array_distinct(toks),
        lambda w: F.size(F.filter(toks, lambda t: t == w)),
    )
    top_share = F.array_max(counts) / n_toks
    return (
        df.withColumn("dup_word_frac", F.round(dup_word, 6))
        .withColumn("dup_bigram_frac", F.round(dup_bigram, 6))
        .withColumn("top_word_share", F.round(top_share, 6))
    )


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 5,
    cache_tf: bool = False,
) -> DataFrame:
    """Per-document top-``k`` keywords by TF-IDF (raw term frequency ×
    ``ln(N / df)``), ties broken lexicographically.

    Plan shape for scale: explode → groupBy(doc, term) builds the TF
    table in one keyed shuffle (map-side partial counts); the DF table
    derives from TF with a second small aggregation keyed on term (a
    groupBy, NOT a per-term window: partial aggregation collapses a
    stopword's rows map-side where a window would ship every
    (doc, term) row of the hot term to one task), so the join back is
    term-keyed and AQE broadcasts it when the vocabulary is small. The
    only per-document serialization is the final top-k window,
    partitioned by document id — never a global sort. N (total
    documents) is a 1-row aggregate cross-broadcast into the scoring
    projection, so the whole operator is ONE Spark action — no separate
    driver-side count job.

    ``cache_tf``: TF is referenced twice (scoring probe side + DF
    aggregation) and the two subtrees canonicalize differently after
    column pruning, so ReuseExchange does NOT dedupe them — the corpus
    is tokenized and (doc, term)-shuffled once per reference. With the
    default ``False`` both passes run (measured at sf0.1: recomputing
    the second pass is ~1 s CHEAPER than materializing the TF cache —
    the frame is aggregate-sized but the cache write dominates when the
    corpus fits one box). At cluster scale the second pass re-pays a
    full corpus tokenize plus a network exchange of the token stream,
    which dwarfs a local MEMORY_AND_DISK cache write: pass ``True`` to
    persist TF and run one corpus pass (the handle attaches to the
    result — the d2/d3 discipline; release_cache frees it).

    Output: (id, term, rank, score) — rank 1..k, score rounded to 6
    decimals.
    """
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(text_col)), r"\s+")).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    if cache_tf:
        tf = tf.persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            (F.col("tf") * F.log(F.col("__n") / F.col("__df"))).alias("__s"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__s"), F.asc("term"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "rank", F.round("__s", 6).alias("score"))
    )
    if cache_tf:
        from ixmp_spark.operators import attach_caches

        out = attach_caches(out, tf)
    return out


def bigram_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_smooth: float = 1.0,
    storage_level=None,
) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed bigram language
    model trained on the corpus itself — the classic count-based quality
    signal (high perplexity = text unlike the corpus; near-duplicate
    boilerplate scores artificially low).

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)`` where ``c(w1·)`` is
    the count of bigrams starting with ``w1`` and ``V`` the corpus
    vocabulary size; per-document ``ppl = exp(mean(-ln P))`` over its
    bigrams. Documents with fewer than two tokens carry no bigram and
    are absent from the output.

    Plan shape: the bigram stream is built map-side with two shifted
    ``slice``s zipped together (never an element-at transform over a
    computed array — that inlines the split per element, the O(n²)
    projection-collapse trap) and PERSISTED, together with the
    pair-count aggregate ``bg`` derived from it. One eager count of
    ``bg`` materializes BOTH caches in a single corpus pass (persist
    caches on first computation), and every statistic the model needs
    is then derived from the small cache, not the big one: the context
    counts ``c(w1·)`` are the per-``w1`` SUM of ``bg``'s pair counts
    (each bigram occurrence belongs to exactly one pair group), and the
    vocab scalar V = |distinct tokens| reads ``bg``'s distinct ``w2``
    column (every token except each document's first) unioned with a
    cheap first-token projection (``element_at(split, 1)`` — one split
    per row, NO explode). The corpus-scale gram stream is therefore
    read exactly TWICE — once to build the caches, once as the probe
    side of the final scoring join — where the naive fan-out (vocab,
    pair counts, context counts, scoring each re-reading grams) pays 5
    passes. The vocab count rides the plan as a broadcast 1-row
    aggregate (the tfidf_topk pattern) — no scalar leaves the cluster.
    Scoring is two key-equi joins (bigram, then context) that AQE
    broadcasts for codelist-sized vocabularies and shuffle-joins at
    corpus scale. Both caches stay alive backing the returned plan (the
    d2/d3 persist discipline); they evict under memory pressure via the
    MEMORY_AND_DISK default, or pass ``storage_level`` to override.
    """
    from ixmp_spark.operators.dedup import _level

    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    n = F.size(toks)
    zipped = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    grams = (
        df.select(F.col(id_col), F.explode(zipped).alias("g"))
        .select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .persist(_level(storage_level))
    )
    bg = grams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("__c12")
    ).persist(_level(storage_level))
    # ONE corpus pass materializes BOTH caches: computing bg scans the
    # explode+split projection, which populates the grams cache on the
    # way (persist caches on first computation), then shuffles into the
    # pair-vocabulary-sized bg cache. Everything corpus-derived below
    # reads bg, NOT grams: ctx is the per-w1 sum of bg's pair counts
    # (identical to counting grams by w1 — each bigram occurrence is in
    # exactly one pair group) and the vocab scalar's w2 side needs only
    # DISTINCT tokens, which bg already holds. The final scoring join is
    # then the only other reader of the corpus-scale cache: 2 passes
    # over the gram stream total, where the naive fan-out pays 5.
    bg.count()
    firsts = df.select(F.element_at(toks, 1).alias("t"))
    vocab = (
        bg.select(F.col("w2").alias("t"))
        .union(firsts)
        .agg(F.countDistinct("t").cast("double").alias("__v"))
    )
    ctx = bg.groupBy("w1").agg(F.sum("__c12").alias("__c1"))
    p = (F.col("__c12") + F.lit(k_smooth)) / (
        F.col("__c1") + F.lit(k_smooth) * F.col("__v")
    )
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        grams.join(bg, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.exp(F.avg(-F.log(p))), 6).alias("ppl"),
        ),
        grams,
        bg,
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """Context-window chunking for training: split each document into
    ``window``-token chunks every ``stride`` tokens (default
    non-overlapping; stride < window gives overlapping windows), keeping
    provenance. Output: (id, chunk_idx, n_tokens, chunk).

    Map-only — one split per document and one slice per emitted chunk
    (the split expression is inlined once per chunk by projection
    collapse; with training-scale windows that is n/stride ≈ a handful
    of evaluations per document, NOT the per-element O(n²) trap that
    per-token transforms hit). The final short chunk is kept (standard
    packing discipline: downstream padding/packing handles it);
    documents shorter than one window emit exactly one chunk.
    """
    stride = stride or window
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - F.lit(window) + F.lit(stride), F.lit(1)),
        F.lit(stride),
    )
    chunks = F.transform(starts, lambda i: F.slice(toks, i, window))
    return (
        df.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_idx", "__toks"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("__toks").cast("long").alias("n_tokens"),
            F.array_join("__toks", " ").alias("chunk"),
        )
    )


def word_ngrams(text_col, n: int = 2) -> Column:
    """All word ``n``-grams of a text column as array<string>, in
    document order with multiplicity (NOT the distinct shingle set —
    counting operators need every occurrence). Map-side: one split per
    row, then ``transform`` over the start-position sequence with
    ``slice``. Documents shorter than ``n`` tokens yield an empty array
    (guarded: Spark's ``sequence(1, 0)`` counts DOWN)."""
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    sz = F.size(toks)
    starts = F.when(
        sz >= n, F.sequence(F.lit(1), sz - F.lit(n) + F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))


def top_ngrams(
    df: DataFrame, text_col: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-wide top-``k`` most frequent word ``n``-grams — the standard
    corpus-statistics probe (boilerplate discovery, contamination grams,
    stopword audits). Output: (gram, n) ordered by count desc, gram asc
    (a total order — gram is unique — so top-k is deterministic).

    Plan shape: gram construction is map-side (one split per row, then
    ``transform`` over the start-position sequence with ``slice`` — a
    handful of array ops per row, no per-token explode of the split
    itself); counting is one keyed shuffle with map-side partial
    aggregation; the top-k is TakeOrderedAndProject over the aggregated
    gram table — never a global sort of the gram stream. Documents
    shorter than ``n`` tokens contribute nothing (guarded: Spark's
    ``sequence(1, 0)`` counts DOWN, so the start sequence only exists
    when size >= n)."""
    if n < 1 or k < 1:
        raise ValueError("n and k must be >= 1")
    return (
        df.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(k)
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 32,
    min_word_freq: int = 1,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Learn a byte-pair-encoding merge table from the corpus — the
    tokenizer-training step of an LLM data pipeline (Sennrich et al.
    2016's algorithm, re-expressed for Spark).

    Returns the learned merge sequence as a small DataFrame:
    ``(rank long, left string, right string, merged string, freq long)``
    — rank 1..n_merges in learning order, ``freq`` the corpus-weighted
    pair count that won the rank. Training may stop early if no pair
    remains (tiny corpora); ties break deterministically by
    (freq desc, left asc, right asc) so the merge sequence is a pure
    function of the corpus.

    Scale shape — the whole point of BPE's word-frequency formulation:
    the CORPUS is touched exactly once (tokenize → groupBy word → count,
    one keyed shuffle with map-side partial counts). Every merge
    iteration then runs on the WORD table (vocabulary-sized: ~10⁷ rows
    for a 100 TB web corpus — still a Spark job, never a driver dict,
    but orders of magnitude below corpus scale). Per iteration: one
    adjacent-pair aggregation (map-side expression: ``transform`` over
    shifted indices, weighted by word freq) + a 1-row argmax collect,
    then a map-only greedy left-to-right merge of the winning pair via
    an ``aggregate`` lambda over each word's symbol array.

    The symbol table is LAZILY CHECKPOINTED every round (the
    dedup_clusters / Pregel discipline): each round's argmax job
    materializes the previous round's checkpoint as a side effect, so
    every iteration still costs exactly one job, while the logical plan
    stays one projection deep FOREVER. This is load-bearing, not
    hygiene: an earlier persist-chain variant (each round one projection
    over a cached parent, grandparent unpersisted a round late) went
    EXPONENTIAL past ~12 merges — Spark's non-cascading cache
    invalidation recompiles the dependent cached plans on every
    unpersist, projection collapse then re-inlines the accumulated
    ``aggregate`` lambdas (each round references ``s`` several times,
    so the expression tree multiplies per round), and round 17 cost
    92 s on a 5k-doc corpus where round 11 cost 0.5 s. Caught by
    ``tools/scale_rehearsal.py --text`` raising ``n_merges`` 12 → 32;
    pinned by ``tests/test_scale.py::test_bpe_train_rounds_stay_flat``.
    By default ``localCheckpoint`` (executor-lifetime blocks — fine for
    a single job); pass ``checkpoint_dir`` for reliable ``checkpoint()``
    on clusters with executor churn. Checkpoint blocks are released by
    the ContextCleaner as references drop.

    Word boundary: each word ends with the conventional ``</w>`` marker
    symbol, so merges never cross words and end-of-word variants are
    learned separately (``e+s`` vs ``e+s</w>``)."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(F.trim(F.lower(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= min_word_freq)
    )
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(d: DataFrame) -> DataFrame:
            return d.checkpoint(eager=False)

    else:

        def _ckpt(d: DataFrame) -> DataFrame:
            return d.localCheckpoint(eager=False)

    syms = _ckpt(
        words.select(
            "freq",
            F.concat(F.split("w", ""), F.array(F.lit("</w>"))).alias("s"),
        )
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        sz = F.size("s")
        idx = F.when(
            sz >= 2, F.sequence(F.lit(1), sz - 1)
        ).otherwise(F.array().cast("array<int>"))
        pair_structs = F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(F.col("s"), i).alias("left"),
                F.element_at(F.col("s"), i + 1).alias("right"),
            ),
        )
        # this argmax job materializes syms' lazy checkpoint as a side
        # effect, so every iteration costs exactly ONE job and the next
        # round's plan starts from the checkpointed blocks, not lineage
        best = (
            syms.select("freq", F.explode(pair_structs).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, freq = best[0].left, best[0].right, best[0].pair_freq
        merged = left + right
        merges.append((rank, left, right, merged, int(freq)))
        syms = _ckpt(
            syms.select(
                "freq",
                F.aggregate(
                    "s",
                    F.array().cast("array<string>"),
                    lambda acc, x: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(left))
                        & (x == F.lit(right)),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(F.lit(merged)),
                        ),
                    ).otherwise(F.concat(acc, F.array(x))),
                ).alias("s"),
            )
        )
    return spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, freq long"
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
    out_col: str = "pieces",
) -> DataFrame:
    """Apply a learned BPE merge table (``bpe_train``'s output) to a
    corpus → ``(id, pieces array<string>, n_tokens)`` — the tokenize
    step of an LLM data pipeline.

    Scale shape — Python touches only the VOCABULARY, never the corpus:
    the corpus is tokenized once (map-side posexplode, order kept via
    the position index); the DISTINCT word table (vocabulary-sized,
    ~10⁷ rows for a 100 TB web corpus) is encoded by an Arrow-batched
    ``mapInPandas`` worker; the encoded vocabulary then joins back onto
    the (id, pos, word) stream (word-keyed — AQE broadcasts it when
    small) and per-document piece arrays reassemble with one
    ``collect_list`` shuffle on the id (``array_sort`` on the (pos,
    pieces) structs restores order — never a global sort). A real merge
    table has ~32k entries, which is why the per-word merge loop is a
    Python kernel and not a nested column expression: composing 32k
    ``aggregate`` folds into one Catalyst projection is infeasible,
    while the kernel runs on vocabulary rows only and prunes merges
    whose symbols aren't present in the word (most of them, cheaply).

    Semantics match ``bpe_train`` exactly: merges apply sequentially in
    rank order, each merging its pair greedily left-to-right — so
    train→encode round-trips are property-testable against a pure-Python
    reference. The merge table is a model ARTIFACT (small), so it is
    collected and broadcast, not joined. Documents with no tokens
    (empty/whitespace text) are absent from the output."""
    spark = df.sparkSession
    if isinstance(merges, DataFrame):
        seq = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").select("left", "right").collect()
        ]
    else:
        seq = [(left, right) for left, right in merges]
    bc = spark.sparkContext.broadcast(seq)

    toks = F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    words = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "w"))
    vocab = words.select("w").distinct()

    def _encode_batches(batches):
        import pandas as pd

        merge_seq = bc.value
        for pdf in batches:
            encoded = []
            for w in pdf["w"]:
                syms = list(w) + ["</w>"]
                present = set(syms)
                for left, right in merge_seq:
                    # a merge can only fire if both symbols are present
                    # NOW; later merges can't resurrect earlier ones
                    # (sequential semantics), so skipping is sound
                    if left not in present or right not in present:
                        continue
                    nxt: list = []
                    for x in syms:
                        if nxt and nxt[-1] == left and x == right:
                            nxt[-1] = left + right
                        else:
                            nxt.append(x)
                    syms = nxt
                    present = set(syms)
                encoded.append(syms)
            yield pd.DataFrame({"w": pdf["w"], "pieces": encoded})

    enc = vocab.mapInPandas(_encode_batches, "w string, pieces array<string>")
    return (
        words.join(enc, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias(out_col)
        )
        .withColumn("n_tokens", F.size(out_col).cast("long"))
    )


#: Gopher rule 6's required-stopword list (Rae et al. 2021 §A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    attach: bool = False,
) -> DataFrame:
    """Gopher-style composite quality gate (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (# and ellipses), alphabetic-word fraction, and required-stopword
    hits — every signal a map-only column expression over one token
    split, so the whole filter is a single whole-stage-codegen
    projection (no shuffle, no UDF).

    Output: (id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
    stopword_hits, keep) — the signal columns are kept (not just the
    boolean) because pipeline audits bin documents by WHICH gate failed.
    Ratios are NULL and keep=false for token-less documents.
    ``attach=True`` instead RETAINS every input column and appends the
    signal/keep columns — the single-scan form a pipeline filters on
    (a select-then-semi-join would scan the corpus twice)."""
    toks = F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    n_words = F.size(toks).cast("long")
    nw = F.when(n_words > 0, n_words.cast("double"))  # null-safe divisor
    mwl = (
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        / nw
    )
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    symbols = (
        F.regexp_count(c, F.lit(r"#"))
        + F.regexp_count(c, F.lit(r"\.\.\."))
        + F.regexp_count(c, F.lit("…"))
    )
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / nw
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    ).cast("long")
    signals = [
        n_words.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(symbols / nw, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    ]
    if attach:
        out = df.select("*", *signals)
    else:
        out = df.select(F.col(id_col), *signals)
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return out.withColumn("keep", F.coalesce(keep, F.lit(False)))


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """One-pass per-group corpus profile — the summary a corpus card /
    mixing decision reads: document and token counts, source diversity,
    length distribution (mean + interpolated median), and exact-duplicate
    rate. ONE aggregation shuffle on the group key; every input signal is
    a map-side expression, and the two distinct-counts expand under the
    same grouping (Spark plans them as a single expand + aggregate, not
    separate jobs)."""
    n_chars = F.length(text_col)
    cnt = F.count(F.lit(1))
    return df.groupBy(group_col).agg(
        cnt.alias("n_docs"),
        F.sum(token_count(text_col).cast("long")).alias("n_tokens"),
        F.countDistinct(source_col).alias("n_sources"),
        F.round(F.avg(n_chars), 6).alias("avg_chars"),
        F.round(F.percentile(n_chars, F.lit(0.5)), 6).alias("p50_chars"),
        F.round(F.lit(1.0) - F.countDistinct(text_col) / cnt, 6).alias(
            "dup_rate"
        ),
    )


def normalize_unicode(col, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the first step of any
    crawl-text cleanup (decomposed accents, compatibility ligatures, and
    width variants otherwise defeat exact dedup and tokenization).

    Spark has no built-in Unicode normalizer, so this is an honest
    Pandas-UDF case: Arrow-batched, one ``unicodedata.normalize`` per
    row, no per-row Python boxing beyond the string itself. Everything
    around it stays JVM-side; the UDF is the narrowest possible kernel
    (string→string). The hint types are spelled as real objects (not
    the module's postponed-annotation strings) because pandas_udf
    resolves them at decoration time."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    import pandas
    from pyspark.sql.functions import pandas_udf

    def _norm(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    _norm.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    udf = pandas_udf("string")(_norm)
    return udf(F.col(col) if isinstance(col, str) else col)


def quality_classifier_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_fraction: float | None = None,
    seed: int = 42,
    **gate_kwargs,
) -> DataFrame:
    """Model-based quality scoring (the CCNet / fastText-classifier
    pattern): featurize every document map-side, train a logistic
    regression on WEAK labels (the Gopher composite gate — no human
    labels needed), then score the whole corpus with a calibrated
    P(keep) in [0, 1]. The score feeds ``sampling.weighted_sample`` for
    soft filtering, where the hard gate alone would discard all
    tail-quality text.

    Scale shape: features are the same single-projection column
    expressions the gate uses (no UDFs, no shuffle); training runs on a
    SAMPLE (``train_fraction`` — a classifier needs 10⁴–10⁶ examples,
    never the corpus); scoring is one map-side model.transform. The
    model is a driver-side artifact like the BPE merge table.

    Output: (id, quality_p double) — deterministic for a fixed seed.
    ``gate_kwargs`` forward to ``gopher_quality_filter`` so the weak
    labels match the corpus' length profile."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    labeled = gopher_quality_filter(df, id_col, text_col, **gate_kwargs)
    feat_cols = [
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_frac",
        "stopword_hits",
    ]
    feats = labeled.select(
        id_col,
        *[
            F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
            for c in feat_cols
        ],
        F.col("keep").cast("double").alias("__label"),
    )
    asm = VectorAssembler(inputCols=feat_cols, outputCol="__features")
    train = feats if train_fraction is None else feats.sample(
        train_fraction, seed
    )
    # both weak-label classes must be present; a degenerate gate (all
    # keep / all drop) has nothing to learn from — fail loudly
    classes = [
        r["__label"]
        for r in train.select("__label").distinct().limit(2).collect()
    ]
    if len(classes) < 2:
        raise ValueError(
            "quality_classifier_scores: weak labels are single-class; "
            "tune the gate thresholds to the corpus (gate_kwargs)"
        )
    lr = LogisticRegression(
        featuresCol="__features", labelCol="__label", maxIter=50,
        regParam=0.01,
    )
    model = lr.fit(asm.transform(train))
    scored = model.transform(asm.transform(feats))
    return scored.select(
        id_col,
        F.round(vector_to_array("probability")[1], 6).alias("quality_p"),
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Lucene idf variant) of documents
    against a bag of query terms — the lexical-search baseline every
    corpus tool needs next to the embedding ANN family.

    Plan shape for scale: the posting stream is filtered TO THE QUERY
    TERMS inside the same projection as the explode, so the shuffle
    carries only matching (doc, term) hits — for a q-term query that is
    a ~|q|/|vocab| sliver of the corpus, and Catalyst pushes the filter
    into the generate. One keyed shuffle builds tf; df(t) is a
    term-partitioned WINDOW over that same tf frame (≤ |q| partitions
    over the already-tiny hit table — deriving it as a separate
    aggregation + join would recompute the whole posting stream, since
    exchange reuse does not bridge the two consumers); N and avgdl are
    a 1-row corpus aggregate cross-broadcast into the scoring
    projection (the t9 single-action pattern). Final top-k is
    TakeOrderedAndProject.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). Output: (id, score,
    n_hits) — rounded to 6, ties by id; documents matching no term are
    absent."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    base = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__dl")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    qset = F.array(*[F.lit(t) for t in terms])
    hits = base.select(
        F.col(id_col),
        "__dl",
        F.explode(
            F.filter("__toks", lambda t: F.array_contains(qset, t))
        ).alias("term"),
    )
    tf = hits.groupBy(id_col, "term", "__dl").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    w_term = Window.partitionBy("term")
    scored = (
        tf.withColumn(
            "__df", F.count(F.lit(1)).over(w_term).cast("double")
        )
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    1.0
                    + (F.col("__n") - F.col("__df") + 0.5)
                    / (F.col("__df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(F.sum("__s"), 6).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def dsir_logratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target,
    alpha: float = 1.0,
    hash_buckets: int | None = None,
    cache_counts: bool = False,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) scores: per-document mean log-likelihood ratio
    ``avg_w ln(p_target(w) / p_raw(w))`` under two add-``alpha``-smoothed
    unigram models — one fit on the rows matching the ``target``
    predicate (the distribution you want more of), one on the rest.
    High scores mark raw documents that look like the target domain;
    feeding them into ``weighted_sample``/top-k IS the DSIR selection
    step.

    Plan shape for scale: explode → ONE word-keyed count aggregation
    carrying both sides as conditional sums (map-side partials), totals
    as a 1-row broadcast, then a word-keyed join back and a per-doc
    aggregation — two keyed shuffles total, no driver-side vocabulary.
    ``hash_buckets`` is the paper's hashed-feature variant: words fold
    into ``xxhash64 % buckets`` so the weight table is bounded by the
    bucket count instead of the open vocabulary (collisions merge
    counts exactly as in the paper; scores then differ from the exact
    form, so the oracle-paired catalog query uses the exact variant).

    Output: (id, n_tokens, logratio) — every document scored, target
    rows included (they rank high by construction; callers selecting
    raw data filter on the target predicate themselves).
    """
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    grams = df.select(
        F.col(id_col),
        F.col(text_col),
        target.alias("__t"),
    ).select(id_col, "__t", F.explode(toks).alias("__w"))
    if hash_buckets is not None:
        grams = grams.withColumn(
            "__w", F.pmod(F.xxhash64("__w"), F.lit(hash_buckets))
        )
    # counts is vocabulary-sized and referenced twice (totals +
    # weights). ``cache_counts`` picks the trade (the t9 cache_tf
    # adjudication, applied here by the same A-B after the r14
    # unconditional persist REGRESSED the driver bench 0.754 → 0.851 s:
    # interleaved persist-vs-recompute at sf0.1 measured 0.91 vs
    # 0.765 s median over 5 reps — the cache write costs more than the
    # duplicated aggregate while the corpus fits one box). Default
    # recompute (the pre-r14 two-pass shape); set cache_counts=True on
    # a cluster, where the second corpus scan+explode+aggregate re-pays
    # a network exchange of the token stream. (The pre-AQE plan may
    # still show the exploded token stream as the broadcast build side
    # — explode fan-out is invisible to size estimates, so the
    # raw-parquet number leaks through. That misestimate is
    # self-limiting: it only fires when the SOURCE scan estimate is
    # under the 10 MB broadcast threshold, i.e. small inputs where the
    # broadcast is harmless, and the AQE-final plan flips the build
    # side to the weights table — verified in the executed plan at
    # sf0.1. No join hint: a forced weights broadcast breaks when the
    # open vocabulary grows data-sized, and a forced merge pins a full
    # token-stream shuffle in the common small-vocab case.)
    counts = grams.groupBy("__w").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__ct"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("__cr"),
    )
    if cache_counts:
        counts = counts.persist()
    totals = counts.agg(
        F.sum("__ct").cast("double").alias("__nt"),
        F.sum("__cr").cast("double").alias("__nr"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    p_t = (F.col("__ct") + alpha) / (F.col("__nt") + alpha * F.col("__v"))
    p_r = (F.col("__cr") + alpha) / (F.col("__nr") + alpha * F.col("__v"))
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "__w", F.log(p_t / p_r).alias("__lw")
    )
    from ixmp_spark.operators import attach_caches

    out = (
        grams.join(weights, "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("__lw"), 6).alias("logratio"),
        )
    )
    return attach_caches(out, counts) if cache_counts else out


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): split each
    language's documents into ``n_buckets`` equal-frequency tiers by LM
    perplexity — tier 1 ("head") is the most-fluent slice that CCNet
    keeps outright, the tail the candidate for dropping or aggressive
    filtering. CCNet scores against a wiki-trained KenLM; here the
    score is the engine's corpus bigram LM (:func:`bigram_perplexity`),
    which preserves the bucketing semantics without an external model
    artifact.

    Plan shape: the perplexity table (one row per document) joins the
    (id, lang) projection — document keyed, AQE-broadcastable when
    small — then ONE ntile window per language partition ordered by
    (ppl, id). The tie-break on id makes bucket assignment a pure
    function of the data. Documents shorter than 2 tokens have no
    bigrams and are excluded (CCNet drops them pre-scoring too).

    Output: (id, lang, ppl, bucket) with bucket in 1..n_buckets.
    """
    ppl = bigram_perplexity(df, id_col=id_col, text_col=text_col)
    meta = df.select(F.col(id_col), F.col(lang_col))
    w = Window.partitionBy(lang_col).orderBy("ppl", id_col)
    return (
        ppl.join(meta, id_col)
        .select(
            id_col,
            lang_col,
            "ppl",
            F.ntile(n_buckets).over(w).cast("long").alias("bucket"),
        )
    )


def bm25_index_write(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n_shards: int = 64,
) -> None:
    """Materialize the inverted index AS STORAGE LAYOUT — BM25's scale
    path (the lexical sibling of similarity.lsh_index_write): postings
    parquet PARTITIONED BY ``shard = xxhash64(term) % n_shards``, so a
    query lists and scans only its terms' shard directories instead of
    the corpus. Denormalized for a join-free query path: each posting
    row carries (term, id, tf, dl, df_t) — document length and the
    term's document frequency ride along (two ints per posting), so
    scoring needs NO doc-side or term-side join at query time. Corpus
    stats (N, avgdl, n_shards) land in one tiny ``_stats`` parquet.

    Build cost: one explode + (id, term) count shuffle for tf, a
    term-keyed window for df(t) over the tf table, one repartition to
    cluster shard files — the build-once index job at 100 TB. Rebuild
    to refresh; for append-only corpora, write new docs to the same
    shard scheme and recompute ``_stats``/df_t in the merge."""
    tf = _bm25_tf(df, id_col, text_col)
    w_term = Window.partitionBy("term")
    postings = tf.select(
        "term",
        F.col(id_col),
        "tf",
        "dl",
        F.count(F.lit(1)).over(w_term).cast("double").alias("df_t"),
        F.pmod(F.xxhash64("term"), F.lit(n_shards)).alias("shard"),
    )
    (
        postings.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path + "/postings")
    )
    _bm25_write_stats(df.sparkSession, tf, path, n_shards)


def _bm25_tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, dl, tf) rows — the shared tokenize+count pass of the
    BM25 index build and append paths."""
    toks = F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"), F.size(toks).alias("dl"))
        .select(F.col(id_col), "dl", F.explode("__toks").alias("term"))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )


def _bm25_write_stats(
    spark, tf: DataFrame, path: str, n_shards: int,
    add_docs: int = 0, add_sum_dl: int = 0,
) -> None:
    """Corpus stats for the index: counts and the EXACT integer
    ``sum_dl`` (document lengths are ints, so the sum is order-exact),
    with ``avgdl = sum_dl / n_docs`` derived from it — the same
    arithmetic on the build and append paths, so an appended index's
    stats are bit-identical to a full rebuild's."""
    row = (
        tf.groupBy(F.col(tf.columns[0]))
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("s"),
        )
        .collect()[0]
    )
    n_docs = int(row["n"]) + add_docs
    sum_dl = int(row["s"]) + add_sum_dl
    spark.createDataFrame(
        [(float(n_docs), sum_dl / n_docs if n_docs else 0.0,
          int(n_shards), n_docs, sum_dl)],
        "n_docs double, avgdl double, n_shards long, "
        "n_docs_exact long, sum_dl long",
    ).write.mode("overwrite").parquet(path + "/_stats")


def bm25_index_append(
    df_new: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
) -> None:
    """Append documents to a WRITTEN BM25 index without rebuilding the
    unaffected shards — the maintenance path the index docstring
    promises for append-only corpora. Only shards containing a NEW
    document's terms are touched: their existing postings are read
    back, merged with the new postings, df_t recomputed per term over
    the merged rows (terms absent from the new docs reproduce their old
    value — recomputation only corrects the terms that grew), and the
    result replaces JUST those shard directories via dynamic partition
    overwrite. ``_stats`` updates exactly: doc count and the integer
    ``sum_dl`` accumulate, so ``avgdl`` is bit-identical to a full
    rebuild's.

    At 100 TB this is the difference between an index refresh costing
    O(new docs + touched shards) and O(corpus): a day's crawl touching
    most terms still rewrites only postings, never re-tokenizes the
    historical corpus. Caller contract: ``df_new`` ids are new (append,
    not upsert).
    """
    spark = df_new.sparkSession
    st = spark.read.parquet(path + "/_stats").collect()[0]
    n_shards = int(st["n_shards"])
    old_docs = int(st["n_docs_exact"]) if "n_docs_exact" in st.__fields__ else int(st["n_docs"])
    old_sum_dl = (
        int(st["sum_dl"])
        if "sum_dl" in st.__fields__
        else round(float(st["avgdl"]) * old_docs)
    )
    tf_new = _bm25_tf(df_new, id_col, text_col).withColumn(
        "shard", F.pmod(F.xxhash64("term"), F.lit(n_shards))
    ).persist()
    affected = [int(r["shard"]) for r in tf_new.select("shard").distinct().collect()]
    if not affected:
        tf_new.unpersist()
        return
    existing = (
        spark.read.parquet(path + "/postings")
        .where(F.col("shard").isin(affected))
        .select("term", F.col(id_col), "tf", "dl", "shard")
    )
    merged = existing.unionByName(
        tf_new.select("term", F.col(id_col), "tf", "dl", "shard")
    )
    w_term = Window.partitionBy("term")
    out = merged.select(
        "term",
        F.col(id_col),
        "tf",
        "dl",
        F.count(F.lit(1)).over(w_term).cast("double").alias("df_t"),
        "shard",
    )
    # the write overwrites partitions the plan is READING (Spark refuses
    # a self-referential overwrite): materialize the merged shards first
    # — eager localCheckpoint cuts the lineage to an ExistingRDD, sized
    # by the AFFECTED shards only, which the rewrite must hold anyway
    out = out.localCheckpoint(eager=True)
    (
        out.repartition("shard")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(path + "/postings")
    )
    _bm25_write_stats(
        spark, tf_new, path, n_shards,
        add_docs=old_docs, add_sum_dl=old_sum_dl,
    )
    tf_new.unpersist()


def bm25_index_search(
    spark,
    path: str,
    query_terms: list[str],
    id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k against a WRITTEN index (:func:`bm25_index_write`):
    the query terms' shards are computed with a one-row Spark job on
    term literals (same ``xxhash64`` the writer used — no Python
    reimplementation to drift), the postings scan carries
    ``shard IN (...)`` as a PARTITION filter plus ``term IN (...)``
    pushed to parquet, and scoring is a join-free projection over the
    pruned sliver: every factor (tf, dl, df_t) is on the posting row,
    N/avgdl are literals from the 1-row ``_stats`` table. One keyed
    aggregation by document + TakeOrderedAndProject.

    Matches :func:`bm25_search` exactly on the same corpus (pinned by
    test); documents matching no term are absent."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    st = spark.read.parquet(path + "/_stats").collect()[0]
    n_docs, avgdl, n_shards = st["n_docs"], st["avgdl"], st["n_shards"]
    shards = [
        r["s"]
        for r in spark.createDataFrame([(t,) for t in terms], "t string")
        .select(F.pmod(F.xxhash64("t"), F.lit(n_shards)).alias("s"))
        .distinct()
        .collect()
    ]
    hits = (
        spark.read.parquet(path + "/postings")
        .where(F.col("shard").isin(shards))
        .where(F.col("term").isin(terms))
    )
    idf = F.log(
        1.0
        + (F.lit(n_docs) - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    score = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))
    )
    return (
        hits.select(F.col(id_col), score.alias("__s"))
        .groupBy(id_col)
        .agg(
            F.round(F.sum("__s"), 6).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_line_chars: int = 30,
    min_alpha_pct: int = 50,
) -> DataFrame:
    """Line-level boilerplate removal for plain-text corpora — the
    jusText/trafilatura-lite cleaning pass a web-scraped training
    corpus needs between extraction and quality scoring. A line is KEPT
    iff (on its trimmed form):

    1. at least ``min_line_chars`` characters (drops nav crumbs,
       timestamps, pagination fragments);
    2. ASCII-letter mass ≥ ``min_alpha_pct``% of its length (drops
       separator art, number tables, markup residue) — integer
       arithmetic, so the predicate is bit-identical across engines;
    3. not entirely upper-case (drops shouting headers/section rails).

    Map-only: split → one array filter lambda → re-join; no shuffle, no
    UDF — whole-stage codegen end to end, trivially 100 TB-safe. The
    rules are deliberately engine-portable (length / regexp_replace /
    upper), so the DuckDB oracle states the SAME predicate and the
    hash contract covers every kept-line decision.

    Output: (id, clean_text [trimmed kept lines joined with \\n],
    n_lines_kept, n_lines_dropped).
    """
    lines = F.split(F.col(text_col), "\n")

    def _keep(x):
        t = F.trim(x)
        n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
        return (
            (F.length(t) >= min_line_chars)
            & (n_alpha * 100 >= min_alpha_pct * F.length(t))
            & (t != F.upper(t))
        )

    kept = F.transform(
        F.filter(lines, _keep), lambda x: F.trim(x)
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_dropped"),
    )


def strip_common_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_docs: int = 3,
) -> DataFrame:
    """Cross-document template-line removal (the RefinedWeb/C4 chrome
    pass): a line that recurs — byte-identical after trimming — in at
    least ``min_docs`` documents of the same ``group_col`` (site,
    source, domain) is navigation/footer boilerplate the extractor
    missed, and is dropped from EVERY document of that group. The
    within-document complement is :func:`strip_boilerplate` (per-line
    heuristics); this pass catches chrome that LOOKS like prose and
    only betrays itself by repeating across a site.

    Plan: explode lines with their position → count DISTINCT documents
    per (group, line) — one keyed aggregation; line text never leaves
    the shuffle key — → anti-join the line table against the template
    set on (group, line) → regroup by document, ordered by position.
    Two shuffles total (the count and the regroup; the anti-join reuses
    the count's (group, line) partitioning). Template lines per group
    are chrome-sized, but the anti-join is keyed, NOT broadcast, so a
    pathological group with millions of distinct templates degrades to
    a shuffle join instead of a driver OOM.

    Output: (id, group, clean_text, n_lines_kept, n_lines_dropped).
    Line ORDER is preserved via the original position index.
    """
    lines = F.split(F.col(text_col), "\n")
    exploded = df.select(
        F.col(id_col),
        F.col(group_col).alias("__g"),
        F.posexplode(lines).alias("__pos", "__line"),
    ).withColumn("__line", F.trim("__line"))
    counts = (
        exploded.groupBy("__g", "__line")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("__g", "__line")
    )
    kept = exploded.join(counts, ["__g", "__line"], "left_anti")
    regrouped = (
        kept.groupBy(id_col, "__g")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("n_lines_kept"),
        )
    )
    totals = df.select(
        F.col(id_col),
        F.col(group_col).alias("__g"),
        F.size(lines).cast("long").alias("__n_total"),
    )
    return (
        totals.join(regrouped, [id_col, "__g"], "left")
        .select(
            id_col,
            F.col("__g").alias(group_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (F.col("__n_total") - F.coalesce("n_lines_kept", F.lit(0)))
            .alias("n_lines_dropped"),
        )
    )


#: every non-ASCII run must form a structurally valid UTF-8 sequence
#: when the string's codepoints 0x80–0xFF are reinterpreted as bytes —
#: including the overlong (E0 A0–BF) and surrogate (ED 80–9F) side
#: conditions, because Spark's ANSI `decode` RAISES on malformed input
#: rather than inserting U+FFFD. Matching this is what makes the
#: charset round-trip below total.
_MOJIBAKE_SHAPE = (
    r"^(?:[\x00-\x7F]"
    r"|[\xC2-\xDF][\x80-\xBF]"
    r"|\xE0[\xA0-\xBF][\x80-\xBF]"
    r"|[\xE1-\xEC][\x80-\xBF]{2}"
    r"|\xED[\x80-\x9F][\x80-\xBF]"
    r"|[\xEE-\xEF][\x80-\xBF]{2}"
    r"|\xF0[\x90-\xBF][\x80-\xBF]{2}"
    r"|[\xF1-\xF3][\x80-\xBF]{3}"
    r"|\xF4[\x80-\x8F][\x80-\xBF]{2})*$"
)


#: the 27 printable Windows-1252 codepoints that differ from Latin-1's
#: C1 range: real-world mojibake is almost always cp1252-decoded (curly
#: quotes, em-dash, €, ™ …), and those land on these characters instead
#: of the raw \x80–\x9F bytes. `translate` maps them back to their byte
#: positions so the Latin-1 round-trip below can invert them too.
_CP1252_SRC = (
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
_CP1252_DST = (
    "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a"
    "\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97"
    "\x98\x99\x9a\x9b\x9c\x9e\x9f"
)


def fix_mojibake(col, passes: int = 1) -> Column:
    """Repair UTF-8-read-as-Latin-1 mojibake ('cafÃ©' → 'café') — the
    ftfy-style cleanup every web-crawl pipeline runs before anything
    tokenizes. GENERIC, not a lookup table: re-encode the string's
    codepoints as ISO-8859-1 bytes and decode them as UTF-8 — exactly
    inverting the corruption — entirely with JVM charset built-ins
    (``encode``/``decode``), map-only, no UDF.

    Corruptions through BOTH common charsets invert: bytes read as
    Latin-1 directly, and bytes read as Windows-1252 (the usual web
    case — curly quotes arrive as 'â€œ', € as 'â‚¬') via a
    ``translate`` of the 27 cp1252-printable codepoints back to their
    C1 byte positions first.

    A string is touched ONLY when (a) it contains a non-ASCII char and
    (b) after the cp1252 back-map its whole non-ASCII content parses
    as structurally valid UTF-8 under the byte reinterpretation
    (``_MOJIBAKE_SHAPE``): legitimate Latin-1 text ('café' with a real
    é followed by ASCII) fails the shape test and passes through
    untouched, and the guard is precise enough that the ANSI
    ``decode`` can never raise. ``passes=2`` unwinds doubly-encoded
    mojibake; each pass re-applies the same guard, so over-unwinding
    cannot occur.
    """
    c = col if not isinstance(col, str) else F.col(col)
    out = c
    for _ in range(passes):
        tr = F.translate(out, _CP1252_SRC, _CP1252_DST)
        repairable = tr.rlike(r"[^\x00-\x7F]") & tr.rlike(
            _MOJIBAKE_SHAPE
        )
        out = F.when(
            repairable, F.decode(F.encode(tr, "ISO-8859-1"), "UTF-8")
        ).otherwise(out)
    return out


def char_entropy(col) -> Column:
    """Shannon entropy (bits/char) of a string's character
    distribution — the cheapest gibberish detector there is: random
    base64/hex blobs score near log2(alphabet) (≥ 5), natural language
    sits ~4–4.5, template/repetition collapses toward 0. The classic
    companion gate to `gopher_quality_filter` for stripping encoded
    blobs and boilerplate runs out of crawl text.

    Single O(n) fold, no explode: sort the char array, then ONE
    ``aggregate`` walks the runs carrying (prev, run_len, Σ n·log2 n)
    — run boundaries close their term as they pass. ``H = log2(N) −
    (Σ n_i·log2 n_i)/N`` needs no per-char map or second pass, and the
    accumulator is 3 scalars regardless of alphabet. (A
    transform-over-distinct formulation would re-inline the split per
    distinct char under projection collapse — the repo's documented
    HOF trap — this fold touches each char once.) NULL on empty/NULL
    input."""
    c = col if not isinstance(col, str) else F.col(col)
    chars = F.array_sort(
        F.filter(F.split(c, ""), lambda x: x != F.lit(""))
    )
    n = F.size(chars)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0.0).alias("s"),
    )
    close = lambda cnt: F.when(  # noqa: E731 — term of a finished run
        cnt > 0, cnt.cast("double") * F.log2(cnt.cast("double"))
    ).otherwise(F.lit(0.0))
    folded = F.aggregate(
        chars,
        acc0,
        lambda a, ch: F.struct(
            ch.alias("prev"),
            F.when(ch == a.prev, a.cnt + 1).otherwise(F.lit(1).cast("long")).alias("cnt"),
            F.when(ch == a.prev, a.s).otherwise(a.s + close(a.cnt)).alias("s"),
        ),
        lambda a: a.s + close(a.cnt),
    )
    return F.when(
        n > 0, F.log2(n.cast("double")) - folded / n.cast("double")
    )


def zipf_fit(
    df: DataFrame, text_col: str, top_n: int = 200
) -> DataFrame:
    """Zipf's-law fit of the corpus frequency spectrum: OLS of
    ``ln(freq)`` on ``ln(rank)`` over the top-``top_n`` terms — the
    one-row corpus-health diagnostic (natural language sits near
    slope −1 with r² ≳ 0.9; machine-generated/templated corpora bend
    the spectrum and the fit degrades or steepens). Drift of the
    exponent between snapshots is the vocabulary-level complement of
    ``corpus_drift``'s value-level PSI.

    One explode + one term-keyed count aggregate (map-side partials)
    is all that touches the corpus; ranking happens AFTER a
    ``top_n``-bounded TakeOrdered, so the global row_number window
    runs on hundreds of rows. The regression itself is the ANSI
    ``regr_*`` aggregates both engines implement natively.

    Output (1 row): ``zipf_slope``, ``zipf_intercept``, ``zipf_r2``
    (rounded to 6), ``n_terms``.
    """
    toks = df.select(
        F.explode(
            F.split(F.trim(F.lower(text_col)), r"\s+")
        ).alias("term")
    ).where(F.col("term") != "")
    cnt = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    top = cnt.orderBy(F.desc("n"), F.asc("term")).limit(top_n)
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    ranked = top.withColumn(
        "r", F.row_number().over(w).cast("double")
    )
    ln_n, ln_r = F.log(F.col("n")), F.log(F.col("r"))
    return ranked.agg(
        F.round(F.regr_slope(ln_n, ln_r), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_n, ln_r), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(ln_n, ln_r), 6).alias("zipf_r2"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )


def cross_perplexity(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    k_smooth: float = 1.0,
    storage_level=None,
) -> DataFrame:
    """Perplexity of one corpus under a bigram LM trained on ANOTHER —
    the domain-shift scorer (``bigram_perplexity`` is the in-domain
    special case): score a candidate crawl against the reference
    corpus's LM and high perplexity means "unlike the data you
    trusted", the count-based cousin of p12's DSIR log-ratio and the
    CCNet wiki-LM setup that p13 approximates in-corpus.

    Same add-k model as the in-domain operator — ``P(w2|w1) =
    (c(w1,w2)+k)/(c(w1·)+k·V)`` with counts and vocabulary V from the
    TRAIN side only — so bigrams and contexts the train corpus never
    saw degrade smoothly to the uniform floor (LEFT joins with
    coalesce-to-0, never dropped rows: unseen text must score HIGH,
    not vanish). Train-side grams persist once and back both count
    aggregates (the t10 single-pass discipline); V rides a broadcast
    1-row aggregate; scoring is two left equi-joins on the score
    side's gram stream.

    Output: (id, n_bigrams, ppl) per score-side document with ≥ 2
    tokens, ppl rounded to 6.
    """
    from ixmp_spark.operators.dedup import _level

    def _grams(df: DataFrame, with_id: bool) -> DataFrame:
        toks = F.split(F.trim(F.lower(text_col)), r"\s+")
        n = F.size(toks)
        zipped = F.arrays_zip(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )
        cols = [F.col(id_col)] if with_id else []
        return df.select(*cols, F.explode(zipped).alias("g")).select(
            *([id_col] if with_id else []),
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
        )
    tg = _grams(train_df, with_id=False).persist(_level(storage_level))
    bg = tg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c12"))
    ctx = tg.groupBy("w1").agg(F.count(F.lit(1)).alias("__c1"))
    vocab = train_df.select(
        F.explode(
            F.split(F.trim(F.lower(text_col)), r"\s+")
        ).alias("term")
    ).agg(F.count_distinct("term").cast("double").alias("__v"))
    sg = _grams(score_df, with_id=True)
    k = float(k_smooth)
    p = (
        sg.join(bg, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                (F.coalesce(F.col("__c12"), F.lit(0)) + k)
                / (F.coalesce(F.col("__c1"), F.lit(0)) + k * F.col("__v"))
            ).alias("__p"),
        )
    )
    return p.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.exp(F.avg(-F.log("__p"))), 6).alias("ppl"),
    )


def readability_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading-ease per document — the oldest quality feature
    in the book and still a standard column in corpus quality stacks
    (very low scores mark legalese/spec dumps, implausibly high ones
    mark token soup):

        ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``

    with the portable heuristics the formula tolerates: sentences =
    runs of ``.!?`` (min 1 — an unpunctuated doc is one sentence),
    syllables = per-word count of vowel GROUPS (``[aeiouy]+``), min 1
    per word. All array/regexp built-ins — map-only, codegen, and
    each lambda touches only its own word (no cross-element
    references, so the projection-collapse trap doesn't apply).

    Output: (id, n_words, n_sentences, n_syllables, flesch) for
    non-empty documents; flesch rounded to 4.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )
    n_words = F.size(toks)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(text_col, F.lit(r"[.!?]+"), 0)),
        F.lit(1),
    )
    syl = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda acc, s: acc + s,
    )
    flesch = (
        F.lit(206.835)
        - 1.015 * (n_words.cast("double") / n_sent.cast("double"))
        - 84.6 * (syl.cast("double") / n_words.cast("double"))
    )
    return df.where(n_words > 0).select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"),
        F.round(flesch, 4).alias("flesch"),
    )


def redact_cards(col, placeholder: str = "<CARD>") -> Column:
    """Credit-card redaction with CHECKSUM VALIDATION — the upgrade
    over ``redact_pii``'s blunt long-digit-run rule: a 13–19 digit run
    is masked only when it actually passes the Luhn check, so
    order ids, EANs and timestamps that happen to be long digit runs
    survive (the false-positive class that makes teams turn naive PII
    scrubbers off).

    Pure expressions end to end: candidates via ``regexp_extract_all``
    (digit runs, non-digit boundaries), each validated by ONE
    ``aggregate`` fold over its reversed digits (double every second
    digit from the right, subtract 9 over 9, sum % 10 == 0), and the
    validated list folds back over the text with a BOUNDARY-ANCHORED
    ``regexp_replace`` (``(^|[^0-9])card([^0-9]|$)``) — a plain
    substring replace would also rewrite a valid card that happens to
    occur INSIDE a longer (>19 digit, non-candidate) run elsewhere in
    the document, corrupting non-card digit strings. No UDF, map-only,
    each lambda touches only its own candidate string. ``placeholder``
    must not contain regex-replacement metacharacters (``$`` / ``\\``).
    """
    c = col if not isinstance(col, str) else F.col(col)
    # maximal [0-9]+ runs filtered by length ≡ boundary-guarded
    # {13,19} runs, without lookaround — RE2-portable like the other
    # redaction patterns (the DuckDB oracle shares the construction)
    cands = F.filter(
        F.array_distinct(F.regexp_extract_all(c, F.lit("[0-9]+"), 0)),
        lambda s: (F.length(s) >= 13) & (F.length(s) <= 19),
    )

    def luhn_ok(s):
        digits = F.transform(F.split(s, ""), lambda ch: ch.cast("int"))
        # Luhn runs right-to-left: reverse once, then the zip index IS
        # the distance from the rightmost digit
        rev = F.reverse(F.filter(digits, lambda d: d.isNotNull()))
        total = F.aggregate(
            F.zip_with(
                rev,
                F.sequence(F.lit(0), F.size(rev) - 1),
                lambda d, i: F.when(
                    i % 2 == 1,
                    F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2),
                ).otherwise(d),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        return total % 10 == 0

    valid = F.filter(cands, luhn_ok)
    return F.aggregate(
        valid,
        c,
        lambda acc, card: F.regexp_replace(
            acc,
            F.concat(F.lit("(^|[^0-9])"), card, F.lit("([^0-9]|$)")),
            F.lit("$1" + placeholder + "$2"),
        ),
    )


def vocab_coverage(df: DataFrame, text_col: str, ks=(10, 100, 1000, 10000)):
    """Vocabulary coverage curve: the fraction of total token mass
    covered by the top-k most frequent word types, at each requested k
    — the tokenizer-design readout (how big must a vocab be before
    <unk> is rare?) and the Zipf companion to ``zipf_fit``'s exponent
    (English-like text covers ~90% at 1k types; base64 noise barely
    moves).

    One explode + word-count aggregation over the corpus (the only
    data-sized pass), then the ranking runs on the VOCABULARY frame:
    an ``orderBy().limit(max(ks))`` bounds the single-partition
    ranking stage to max(ks) rows by construction (ties broken by
    word, so the cut is deterministic), a running-sum window over
    those ≤max(ks) rows builds the cumulative mass, and the corpus
    total arrives as a 1-row broadcast. Coverage at k simply reads the
    cumulative row at rank k — ranks beyond the vocabulary size emit
    nothing (there is no k-th word to stop at).

    Output: (k, coverage), one row per k ≤ vocabulary size.
    """
    ks = sorted(int(k) for k in ks)
    toks = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "w"
        )
    ).where(F.col("w") != "")
    # persist (r15, the p15/x33 multi-consumer class): the
    # vocabulary-sized count table feeds the top-k probe AND the
    # total — unpersisted, the corpus tokenize+aggregate ran twice
    # (interleaved sf0.1 A-B flat locally; the saved pass is
    # data-sized at scale).
    cnt = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).persist()
    top = cnt.orderBy(F.desc("c"), "w").limit(ks[-1])
    wr = Window.orderBy(F.desc("c"), "w")
    wc = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = top.select(
        F.row_number().over(wr).cast("long").alias("k"),
        F.sum("c").over(wc).cast("long").alias("_cum"),
    )
    tot = cnt.agg(F.sum("c").cast("long").alias("_total"))
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        ranked.where(F.col("k").isin(ks))
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.round(F.col("_cum") * 1.0 / F.col("_total"), 6).alias(
                "coverage"
            ),
        ),
        cnt,
    )


def lexical_diversity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document lexical-diversity profile: type–token ratio and
    hapax-legomena ratio — the cheap gibberish/boilerplate separators
    next to ``char_entropy``: templated spam repeats a tiny vocabulary
    (low TTR, few hapaxes), keyboard mash is all hapaxes (TTR ≈ 1),
    natural prose sits between.

    Two keyed aggregations, both with map-side partials: per-(doc,
    word) counts (the only token-sized shuffle), then the per-doc fold
    (types = rows, tokens = Σcount, hapaxes = Σ[count = 1]) — the
    explode-then-count shape deliberately avoids the HOF-inlining trap
    of counting each distinct word's occurrences inside an array
    lambda (O(n²) per document, see the repo's aggregate-fold rule).
    Empty/whitespace-only documents are dropped (no tokens, no ratio).

    Output: (id, n_tokens, n_types, ttr, hapax_ratio), ratios rounded
    to 6.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).where(F.col("w") != "")
    wc = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("_c"))
    return wc.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(
            F.count(F.lit(1)) * F.lit(1.0) / F.sum("_c"), 6
        ).alias("ttr"),
        F.round(
            F.sum((F.col("_c") == 1).cast("long"))
            * F.lit(1.0)
            / F.count(F.lit(1)),
            6,
        ).alias("hapax_ratio"),
    )


#: default RAKE stopword list — deliberately tiny and fixed so the
#: oracle can inline it; real deployments pass their own.
RAKE_STOPWORDS = (
    "the", "a", "an", "and", "of", "to", "in", "is", "for", "on",
)


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords=RAKE_STOPWORDS,
    k: int = 3,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are the maximal token runs BETWEEN stopwords, each word scores
    ``degree/frequency`` over the document (degree = Σ lengths of the
    phrases containing it — co-occurrence favors words that travel in
    long phrases), and a phrase scores the sum of its words. The
    unsupervised keyword baseline that needs no corpus statistics —
    per-document, so it trivially shards.

    Pipeline (two keyed shuffles, both on the doc id): positional
    explode → running stopword count assigns each token its phrase id
    (gaps-and-islands, the g-family identity) → per-(doc, word)
    degree/frequency aggregate → score join back → per-(doc, phrase)
    fold with an ordered collect. Ranking uses the ROUNDED score with
    the phrase text as tie-break — phrase scores are sums of
    rationals, and two mathematically-equal sums accumulated in
    different orders may differ by an ulp (the repo's cross-engine
    ordering rule: never rank on raw float sums).

    Output: (id, phrase, n_words, score, rank), top-``k`` per doc.
    """
    sw = [s.lower() for s in stopwords]
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "w"),
    ).where(F.col("w") != "")
    stop = F.col("w").isin(sw)
    wdoc = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = toks.withColumn(
        "_pid", F.sum(stop.cast("long")).over(wdoc)
    ).where(~stop)
    wph = Window.partitionBy(id_col, "_pid")
    with_len = marked.withColumn("_plen", F.count(F.lit(1)).over(wph))
    wstats = with_len.groupBy(id_col, "w").agg(
        F.count(F.lit(1)).alias("_freq"),
        F.sum("_plen").alias("_deg"),
    )
    scored = with_len.join(wstats, [id_col, "w"]).withColumn(
        "_ws", F.col("_deg") / F.col("_freq")
    )
    phrases = scored.groupBy(id_col, "_pid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("w")))
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.round(F.sum("_ws"), 6).alias("score"),
    )
    wr = Window.partitionBy(id_col).orderBy(
        F.desc("score"), "phrase", "_pid"
    )
    return (
        phrases.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= int(k))
        .select(id_col, "phrase", "n_words", "score", "rank")
    )


def topic_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    vocab_size: int = 10_000,
    max_iter: int = 20,
    seed: int = 42,
):
    """Corpus topic modeling via Spark ML's distributed online LDA —
    the unsupervised "what is this corpus made of" map used for
    domain-mix design, drift stories, and per-topic sampling quotas
    (the p5/p8 mixing knobs need a domain column; when sources don't
    carry one, topics are the fallback).

    Pipeline: the repo's standard tokenizer → ``CountVectorizer``
    (distributed vocabulary fit, capped at ``vocab_size``) → ``LDA``
    with the online variational optimizer (mini-batch EM — one corpus
    pass per iteration, model state on the driver is k×vocab, not
    corpus-sized; the EM optimizer would keep per-doc state). Seeded
    for reproducibility on a fixed corpus/partitioning; LDA remains a
    stochastic variational fit, so tests pin recovered STRUCTURE
    (planted vocabularies separate), never raw weights.

    Returns (doc_topics, topic_terms): per doc the argmax topic and
    its weight; per topic the top terms with weights — both as
    DataFrames, vocabulary-scale artifacts.
    """
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer
    from pyspark.ml.functions import vector_to_array

    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda w: w != "",
        ).alias("_toks"),
    )
    cv = CountVectorizer(
        inputCol="_toks", outputCol="_tf", vocabSize=int(vocab_size)
    )
    cvm = cv.fit(toks)
    tf = cvm.transform(toks)
    lda = LDA(
        k=int(k),
        maxIter=int(max_iter),
        seed=int(seed),
        optimizer="online",
        featuresCol="_tf",
    )
    model = lda.fit(tf)
    dist = model.transform(tf)
    to_arr = vector_to_array(F.col("topicDistribution"))
    doc_topics = dist.select(
        F.col(id_col),
        to_arr.alias("_td"),
    ).select(
        id_col,
        (F.array_position(
            F.col("_td"), F.array_max(F.col("_td"))
        ) - 1).cast("long").alias("topic"),
        F.round(F.array_max(F.col("_td")), 6).alias("topic_weight"),
    )
    vocab = cvm.vocabulary
    spark = df.sparkSession
    terms = model.describeTopics(10)
    vocab_df = F.broadcast(
        spark.createDataFrame(
            [(i, w) for i, w in enumerate(vocab)], "term_idx int, term string"
        )
    )
    topic_terms = (
        terms.select(
            F.col("topic").cast("long").alias("topic"),
            F.explode(
                F.arrays_zip(
                    F.col("termIndices").alias("term_idx"),
                    F.col("termWeights").alias("w"),
                )
            ).alias("z"),
        )
        .select(
            "topic",
            F.col("z.term_idx").cast("int").alias("term_idx"),
            F.round(F.col("z.w"), 6).alias("weight"),
        )
        .join(vocab_df, "term_idx")
        .select("topic", "term", "weight")
    )
    return doc_topics, topic_terms


def gopher_repetition_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_ngram_char_frac=(0.20, 0.18, 0.16),
    max_dup_5gram_char_frac: float = 0.15,
) -> DataFrame:
    """The REPETITION half of the Gopher quality rules (Rae et al.
    2021 §A1.1) that ``gopher_quality_filter`` deliberately leaves
    out (its signals are all map-only; these need a gram shuffle):
    duplicate-line fractions, the top-{2,3,4}-gram character
    fraction, and the duplicated-5-gram character fraction — the
    signals that catch boilerplate loops, keyword stuffing, and
    template spam that length/symbol gates miss. Default thresholds
    are the published Gopher numbers.

    Shapes: the line signals are pure map-side array expressions
    (split on newline, ``array_distinct`` for the duplicate mass).
    The gram signals pay exactly ONE shuffle, keyed by
    (doc, n, gram) — the t-family contract: gram-count rows, never
    documents — then collapse per (doc, n) with ``max_by`` (top
    gram, ties by gram text for determinism) and a conditional sum
    (chars in grams occurring ≥ 2, overlapping occurrences counted —
    the standard approximation), and land as columns via a
    conditional aggregation per doc. Character denominators use the
    normalized text length; documents shorter than n words score 0
    for that n (nothing repeats in an empty gram set).

    Output: (id, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac, top_3gram_char_frac, top_4gram_char_frac,
    dup_5gram_char_frac, keep) — signal columns kept so audits can
    bin documents by WHICH rule fired, rounded 6.
    """
    c = F.col(text_col) if isinstance(text_col, str) else F.col(text_col)
    norm = F.trim(F.lower(c))
    lines = F.filter(
        F.split(c, r"\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    nl = F.size(lines)
    dlines = F.array_distinct(lines)
    total_line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    distinct_line_chars = F.aggregate(
        dlines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        norm.alias("_norm"),
        nl.cast("long").alias("n_lines"),
        F.round(
            F.when(nl > 0, 1 - F.size(dlines) / nl.cast("double"))
            .otherwise(0.0), 6,
        ).alias("dup_line_frac"),
        F.round(
            F.when(
                total_line_chars > 0,
                1 - distinct_line_chars / total_line_chars.cast("double"),
            ).otherwise(0.0), 6,
        ).alias("dup_line_char_frac"),
        F.length(norm).cast("double").alias("_chars"),
    )
    # all four gram sizes from ONE scan and ONE tokenize: a per-n
    # union re-reads the source and re-splits the text once per branch
    # (4 Scan→Generate chains; subexpression sharing cannot cross plan
    # branches). One flatten(array(transform…)) projection over a
    # single split emits the identical (n, gram) multiset — same rows
    # into the same keyed shuffle — at ~60% of the union's CPU
    # (measured at sf0.1 on spread input: 1.47 s → 0.76 s warm noop;
    # the union's LOCAL wall time on the driver's single-split bench
    # files looks better only because its 4 branches are 4 accidental
    # tasks — callers restore real parallelism with load_spread).
    toks = F.split(F.col("_norm"), r"\s+")
    sz = F.size(toks)

    def _tagged(n: int):
        starts = F.when(
            sz >= n, F.sequence(F.lit(1), sz - F.lit(n) + F.lit(1))
        ).otherwise(F.array().cast("array<int>"))
        gram_n = F.transform(
            starts, lambda i: F.array_join(F.slice(toks, i, n), " ")
        )
        # NB: the lambda must stay unary — pyspark passes (element,
        # index) to two-parameter transform lambdas, so a `n=n`
        # default capture would silently receive the array index.
        return F.transform(
            gram_n,
            lambda g: F.struct(F.lit(n).alias("_n"), g.alias("_g")),
        )

    gram_structs = F.flatten(
        F.array(*[_tagged(n) for n in (2, 3, 4, 5)])
    )
    grams = base.select(
        "_id", "_chars", F.explode(gram_structs).alias("_s")
    ).select(
        "_id", "_chars", F.col("_s._n").alias("_n"), F.col("_s._g").alias("_g")
    )
    cnt = grams.groupBy("_id", "_n", "_g").agg(
        F.count(F.lit(1)).cast("double").alias("_c"),
        F.max("_chars").alias("_chars"),
    )
    per_n = cnt.groupBy("_id", "_n").agg(
        F.max_by(
            # a gram seen ONCE is not repetition: the top-gram char
            # mass counts only at count >= 2, else short clean docs
            # trip the threshold on one long unique gram
            F.when(F.col("_c") >= 2, F.col("_c") * F.length("_g"))
            .otherwise(F.lit(0.0)),
            F.struct(F.col("_c"), F.length("_g"), F.col("_g")),
        ).alias("_topchars"),
        F.sum(
            F.when(F.col("_c") >= 2, F.col("_c") * F.length("_g"))
            .otherwise(0.0)
        ).alias("_dupchars"),
        F.max("_chars").alias("_chars"),
    )
    sig = per_n.groupBy("_id").agg(
        *[
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("_n") == n,
                            F.col("_topchars") / F.col("_chars"),
                        )
                    ),
                    F.lit(0.0),
                ), 6,
            ).alias(f"top_{n}gram_char_frac")
            for n in (2, 3, 4)
        ],
        F.round(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("_n") == 5,
                        F.col("_dupchars") / F.col("_chars"),
                    )
                ),
                F.lit(0.0),
            ), 6,
        ).alias("dup_5gram_char_frac"),
    )
    out = base.drop("_norm", "_chars").join(sig, "_id", "left")
    t2, t3, t4 = max_top_ngram_char_frac
    filled = out.select(
        F.col("_id").alias(id_col),
        "n_lines", "dup_line_frac", "dup_line_char_frac",
        *[
            F.coalesce(F.col(f"top_{n}gram_char_frac"), F.lit(0.0))
            .alias(f"top_{n}gram_char_frac")
            for n in (2, 3, 4)
        ],
        F.coalesce(F.col("dup_5gram_char_frac"), F.lit(0.0)).alias(
            "dup_5gram_char_frac"
        ),
    )
    keep = (
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("top_2gram_char_frac") <= t2)
        & (F.col("top_3gram_char_frac") <= t3)
        & (F.col("top_4gram_char_frac") <= t4)
        & (F.col("dup_5gram_char_frac") <= max_dup_5gram_char_frac)
    )
    return filled.withColumn("keep", F.coalesce(keep, F.lit(False)))


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY against everything ingested before
    it (by ascending ``id_col`` — the ingest order): the fraction of a
    document's distinct n-grams whose FIRST corpus occurrence is this
    document. The corpus-growth diagnostic behind "is new data still
    adding new content or are we re-crawling the same pages" — the
    continuous companion to d5's binary decontamination and the
    curve a crawl pipeline plots before paying for another dump.

    Plan shape: one distinct-gram explode per doc, then TWO
    aggregations off it — per-doc gram totals (map-side count, no
    gram strings move) and min(doc_id) per gram (the one gram-keyed
    shuffle) whose winners collapse to per-doc NOVEL counts
    (doc-keyed, doc-domain-sized) — joined doc-to-doc. The naive form
    joins the full exploded gram table back to the per-gram minima
    (a second gram-string-keyed shuffle of everything); this shape
    moves gram strings exactly once. First doc is 100% novel by
    construction; empty/sub-n docs emit zero grams and are absent
    from the output (no 0/0). Output: (id, n_grams, n_novel,
    novelty) sorted by id, rounded 6.
    """
    c = F.col(text_col)
    toks = F.filter(
        F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != F.lit("")
    )
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )
    exploded = (
        df.where(c.isNotNull() & F.col(id_col).isNotNull())
        .where(F.size(toks) >= n)
        .select(F.col(id_col).alias("_id"), F.explode(grams).alias("_g"))
    )
    totals = exploded.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    novel = (
        exploded.groupBy("_g")
        .agg(F.min("_id").alias("_first"))
        .groupBy("_first")
        .agg(F.count(F.lit(1)).alias("n_novel"))
        .withColumnRenamed("_first", "_id")
    )
    return (
        totals.join(novel, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0))
                / F.col("n_grams"),
                6,
            ).alias("novelty"),
        )
        .orderBy(id_col)
    )


def zipf_slope(
    df: DataFrame,
    text_col: str,
    top_k: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency slope of the corpus vocabulary: OLS fit of
    ln(freq) against ln(rank) over the ``top_k`` most frequent terms —
    natural language sits near −1; a slope far off flags synthetic or
    template-heavy corpora (boilerplate flattens the head, keyword
    stuffing steepens it). The one-number companion to x31's Hill tail
    index: Hill asks how heavy the tail is, Zipf asks whether the HEAD
    obeys the law.

    One term-count aggregation (gram-domain-bounded) → one rank window
    over the vocabulary frame clipped to ``top_k`` rows (the a14
    adjudicated class; ties broken by term for determinism) → the
    closed-form OLS sums in a single aggregation. Output one row:
    (n_terms, slope, intercept) rounded 6.
    """
    c = F.col(text_col)
    toks = F.filter(
        F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != F.lit("")
    )
    terms = (
        df.where(c.isNotNull())
        .select(F.explode(toks).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).cast("double").alias("_f"))
    )
    w = Window.orderBy(F.desc("_f"), F.asc("_t"))
    ranked = (
        terms.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= top_k)
        .select(
            F.log(F.col("_r").cast("double")).alias("_x"),
            F.log("_f").alias("_y"),
        )
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        den > 0,
        (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den,
    )
    intercept = (F.col("_sy") - slope * F.col("_sx")) / F.col("_n")
    return agg.select(
        F.col("_n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )



def pmi_collocations(
    df: DataFrame, text_col: str, min_count: int = 5, k: int = 100
) -> DataFrame:
    """Top-``k`` PMI-scored word-bigram collocations — the standard
    collocation-extraction probe (Church & Hanks 1990): bigrams whose
    observed frequency beats the independence expectation of their
    unigrams, pmi = log2((c_xy/N_b) / ((c_x/N_u)·(c_y/N_u))). Distinct
    from :func:`top_ngrams` (raw counts — dominated by stopword pairs)
    and from the event-transition PMI (g12 — event types, not text):
    this surfaces multi-word units ("los angeles") for tokenizer and
    phrase-mining decisions.

    ``min_count`` floors the bigram count before scoring (rare pairs
    have unstable PMI — one co-occurrence of two hapaxes maxes the
    score). Output (gram, n, pmi) ordered by pmi desc, gram asc.

    Plan shape: one keyed shuffle for bigram counts, one for unigram
    counts (both map-side partial), two vocabulary-keyed joins of the
    min_count-filtered bigram table against the unigram table, scalar
    totals broadcast via 1-row cross joins; top-k is
    TakeOrderedAndProject. Nothing is corpus-scale after the two
    aggregations — both tables are vocabulary-sized."""
    if min_count < 1 or k < 1:
        raise ValueError("min_count and k must be >= 1")
    # uni is consumed three times (total + both pair joins) — measured
    # and deliberately NOT persisted (r15): the three evaluations run
    # as CONCURRENT broadcast-build jobs that overlap on the cluster,
    # while a cache serializes them behind one vocabulary-sized cache
    # write; the interleaved sf0.1 A-B read the persist 1.7× SLOWER
    # (4.6 → 7.8 s), and caching the pre-filter bigram table to save
    # n_b's pass measured 1.4× slower the same way (the t9/p12
    # cache-write-vs-recompute class, both directions rejected).
    uni = (
        df.select(F.explode(word_ngrams(text_col, 1)).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    bi = (
        df.select(F.explode(word_ngrams(text_col, 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    n_u = uni.agg(F.sum("cw").alias("nu"))
    n_b = df.select(
        F.explode(word_ngrams(text_col, 2)).alias("gram")
    ).agg(F.count(F.lit(1)).alias("nb"))
    w1 = F.split(F.col("gram"), " ").getItem(0)
    w2 = F.split(F.col("gram"), " ").getItem(1)
    return (
        bi.withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2")), "w2")
        .crossJoin(n_u)
        .crossJoin(n_b)
        .select(
            "gram",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.log2(
                    (F.col("n") / F.col("nb"))
                    / ((F.col("c1") / F.col("nu")) * (F.col("c2") / F.col("nu")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("gram"))
        .limit(k)
    )


def llr_keyness(
    df: DataFrame,
    text_col: str,
    in_a,
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Corpus-keyness by Dunning log-likelihood ratio (Dunning 1993):
    for each token, G² = 2·Σ O·ln(O/E) between slice A (rows where the
    boolean column/expr ``in_a`` holds) and the rest — "which words
    characterize THIS slice", the statistically-grounded replacement
    for raw frequency diffs when slice sizes differ. Distinct from x22
    (chi² on event contingency) and p12 (DSIR importance log-ratios —
    per-DOCUMENT scoring; this is per-TERM corpus contrast).

    Expected counts under independence: E_a = N_a·(a+b)/N,
    E_b = N_b·(a+b)/N; zero cells contribute 0 (lim x·ln x = 0).
    ``keyness`` is G² signed positive when the term is OVERrepresented
    in A. Output (w, n_a, n_b, keyness) ordered by keyness desc, w asc,
    top-k; terms with a+b < min_count dropped.

    Plan shape: one explode + keyed count per slice membership (single
    shuffle — the slice flag rides the token row), scalar totals
    broadcast, arithmetic in the projection."""
    if min_count < 1 or k < 1:
        raise ValueError("min_count and k must be >= 1")
    flag = in_a if not isinstance(in_a, str) else F.col(in_a)
    toks = df.select(
        flag.cast("boolean").alias("__a"),
        F.explode(word_ngrams(text_col, 1)).alias("w"),
    ).where(F.length("w") > 0)
    # persist (r15, the p15/x33 multi-consumer class): the
    # vocabulary-sized count table feeds the totals AND the scored
    # output — unpersisted, the corpus tokenize+aggregate ran twice
    # (interleaved sf0.1 A-B: 4.14 → 3.22 s median, 1.29×).
    counts = toks.groupBy("w").agg(
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("__a"), 0).otherwise(1)).cast("long").alias("b"),
    ).persist()
    totals = counts.agg(
        F.sum("a").cast("double").alias("na"),
        F.sum("b").cast("double").alias("nb"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    na, nb = F.col("na"), F.col("nb")
    ea = na * (a + b) / (na + nb)
    eb = nb * (a + b) / (na + nb)
    term_a = F.when(a > 0, a * F.log(a / ea)).otherwise(F.lit(0.0))
    term_b = F.when(b > 0, b * F.log(b / eb)).otherwise(F.lit(0.0))
    g2 = 2.0 * (term_a + term_b)
    signed = F.when(a / na >= b / nb, g2).otherwise(-g2)
    from ixmp_spark.operators import attach_caches

    return attach_caches(
        counts.where(F.col("a") + F.col("b") >= min_count)
        .crossJoin(totals)
        .select(
            "w",
            F.col("a").alias("n_a"),
            F.col("b").alias("n_b"),
            F.round(signed, 6).alias("keyness"),
        )
        .orderBy(F.desc("keyness"), F.asc("w"))
        .limit(k),
        counts,
    )
