"""LLM-training-data pipeline queries (north-star extension surface):
dedup, text analysis, similarity search over documents/embeddings."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ixmp_spark.operators.dedup import exact_dedup
from ixmp_spark.operators.similarity import brute_force_topk
from ixmp_spark.operators.text import lang_id, text_stats
from ixmp_spark.queries import load, load_spread, query


@query(
    "d1_exact_dedup",
    oracle=r"""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    """,
)
def d1_exact_dedup(spark, sf_dir):
    """Exact dedup by normalized-text hash: one representative (min id) per
    content group. Shuffle key is the 16-byte digest, not the body."""
    docs = load_spread(spark, sf_dir, "documents")
    return exact_dedup(docs, text_col="text", id_col="doc_id")


@query(
    "d2_jaccard_neardup",
    oracle=r"""
    WITH sh AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS toks
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 1.0
                 / len(list_distinct(a.toks || b.toks)), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 1.0
          / len(list_distinct(a.toks || b.toks)) >= 0.5
    """,
)
def d2_jaccard_neardup(spark, sf_dir):
    """Near-duplicate pairs by exact token-set Jaccard ≥ 0.5, blocked on
    (lang, source) — the bounded-input VERIFICATION stage of the dedup
    family (the unblocked scale path is d3_minhash_lsh). The operator
    enforces the bound explicitly: any block over max_block rows fails
    fast with its size instead of silently running an n² join."""
    from ixmp_spark.operators.dedup import jaccard_block_pairs

    # plain load, NOT load_spread: the operator spreads its tokenized
    # frame internally, and the max_block guard aggregation runs on this
    # input — off the raw column-pruned scan it is one partial-agg pass
    # with no preceding repartition shuffle.
    docs = load(spark, sf_dir, "documents")
    return jaccard_block_pairs(
        docs,
        id_col="doc_id",
        text_col="text",
        block_cols=["lang", "source"],
        threshold=0.5,
        max_block=100_000,
    )


@query(
    "t1_text_stats",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                 * 1.0 / length(text), 6) AS punct_ratio,
           round(length(regexp_replace(text, '\s', '', 'g')) * 1.0
                 / len(string_split_regex(trim(text), '\s+')), 4) AS mean_word_len,
           round(0.5 * least(length(text) / 1000.0, 1.0)
                 + 0.3 * (CASE WHEN length(regexp_replace(text, '\s', '', 'g')) * 1.0
                                    / len(string_split_regex(trim(text), '\s+'))
                               BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
                 + 0.2 * (1 - least(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                                    * 5.0 / length(text), 1.0)), 4) AS quality
    FROM documents
    """,
)
def t1_text_stats(spark, sf_dir):
    """Text quality statistics (token count, punctuation ratio, mean word
    length, composite quality score) — all whole-stage-codegen column
    expressions; the formula is mirrored exactly in the oracle."""
    docs = load_spread(spark, sf_dir, "documents")
    return text_stats(docs, "text").select(
        "doc_id", "n_tokens", "punct_ratio", "mean_word_len", "quality"
    )


@query(
    "t2_lang_id",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ), hits AS (
      SELECT doc_id, lang,
        len(list_filter(t, x -> list_contains(['the','and','of'], x))) AS h_en,
        len(list_filter(t, x -> list_contains(['der','und','die'], x))) AS h_de,
        len(list_filter(t, x -> list_contains(['le','et','les'], x))) AS h_fr,
        len(list_filter(t, x -> list_contains(['el','y','los'], x))) AS h_es
      FROM toks
    )
    SELECT doc_id, lang AS lang_true,
           CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM hits
    """,
)
def t2_lang_id(spark, sf_dir):
    """Language-ID n-gram heuristic: marker-stopword hit counts per
    language, argmax with stable priority (en > de > fr > es on ties),
    'und' when nothing matches."""
    docs = load_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        lang_id("text").alias("lang_pred"),
    )


@query(
    "e1_embed_topk",
    oracle="""
    WITH probe AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
      FROM embeddings ORDER BY vec_id LIMIT 1
    ), scored AS (
      SELECT e.vec_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv), 6)
               AS cosine_sim
      FROM embeddings e, probe p
      WHERE e.vec_id <> p.probe_id
    )
    SELECT vec_id, cosine_sim FROM scored
    ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """,
)
def e1_embed_topk(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of the min-id probe vector —
    the exact ANN baseline: broadcast probe, map-only scoring pass,
    TakeOrderedAndProject (per-partition heap, no global sort). The
    LSH-bucketed scale variant is e2_embed_ann."""
    emb = load(spark, sf_dir, "embeddings")
    probe = emb.orderBy("vec_id").limit(1)
    return brute_force_topk(emb, probe, id_col="vec_id", vec_col="embedding", k=10)


@query(
    "p1_curation_pipeline",
    oracle=r"""
    WITH stats AS (
      SELECT doc_id, lang,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             round(0.5 * least(length(text) / 1000.0, 1.0)
                   + 0.3 * (CASE WHEN length(regexp_replace(text, '\s', '', 'g')) * 1.0
                                      / len(string_split_regex(trim(text), '\s+'))
                                 BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
                   + 0.2 * (1 - least(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                                      * 5.0 / length(text), 1.0)), 4) AS quality
      FROM documents
    ), reps AS (
      SELECT min(doc_id) AS doc_id FROM stats GROUP BY h
    )
    SELECT s.doc_id, s.lang, s.n_tokens, s.quality
    FROM stats s JOIN reps r ON s.doc_id = r.doc_id
    WHERE s.lang = 'en' AND s.quality >= 0.55 AND s.n_tokens BETWEEN 30 AND 120
    """,
)
def p1_curation_pipeline(spark, sf_dir):
    """Composite training-data curation: exact dedup (keep min-id
    representative) → language filter → quality threshold → token-length
    band. One declared plan — Catalyst fuses the stat expressions into the
    scan projection and the dedup is the only shuffle."""
    docs = load_spread(spark, sf_dir, "documents")
    stats = text_stats(docs, "text")
    reps = exact_dedup(docs, text_col="text", id_col="doc_id").select("doc_id")
    return (
        stats.join(reps, "doc_id")
        .where(
            (F.col("lang") == "en")
            & (F.col("quality") >= 0.55)
            & F.col("n_tokens").between(30, 120)
        )
        .select("doc_id", "lang", "n_tokens", "quality")
    )


@query(
    "p2_token_budget_pack",
    oracle=r"""
    WITH stats AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             round(0.5 * least(length(text) / 1000.0, 1.0)
                   + 0.3 * (CASE WHEN length(regexp_replace(text, '\s', '', 'g')) * 1.0
                                      / len(string_split_regex(trim(text), '\s+'))
                                 BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
                   + 0.2 * (1 - least(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                                      * 5.0 / length(text), 1.0)), 4) AS quality
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tokens, quality,
             CAST(sum(n_tokens) OVER (
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM stats
    )
    SELECT doc_id, n_tokens, quality, cum_tokens
    FROM ranked WHERE cum_tokens <= 10000
    """,
)
def p2_token_budget_pack(spark, sf_dir):
    """Token-budget packing: select the highest-quality documents until a
    token budget is exhausted — quality-descending running token sum, cut
    at the budget. EXACT semantics, no global window: the running sum
    decomposes into (a) per-quality token totals → exclusive prefix sums
    over the quality domain (ONE ROW PER DISTINCT QUALITY — quality is
    rounded to 4 dp, so this frame is bounded by the score domain ~1e4,
    not the corpus; its orderBy window is driver-trivial at any scale),
    broadcast back; (b) a per-quality-PARTITION window for the local
    running sum. Quality groups whose offset already exceeds the budget
    are pruned BEFORE the window, so only boundary groups do window work.
    """
    B = 10_000
    docs = load_spread(spark, sf_dir, "documents")
    stats = text_stats(docs, "text")
    w_off = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        stats.groupBy("quality")
        .agg(F.sum("n_tokens").alias("__qt"))
        .withColumn("__off", F.coalesce(F.sum("__qt").over(w_off), F.lit(0)))
        .drop("__qt")
    )
    w_loc = Window.partitionBy("quality").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        stats.join(F.broadcast(offsets), "quality")
        .where(F.col("__off") <= B)  # prune whole over-budget groups
        .withColumn("cum_tokens", F.col("__off") + F.sum("n_tokens").over(w_loc))
        .where(F.col("cum_tokens") <= B)
        .select("doc_id", "n_tokens", "quality", "cum_tokens")
    )


@query(
    "t3_bpe_tokens",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_chunks,
           len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens
    FROM documents
    """,
)
def t3_bpe_tokens(spark, sf_dir):
    """BPE-ish token estimate (word/number/punct chunks via regex, the
    pre-tokenizer shape real BPE uses) vs whitespace tokens — both engines
    share RE2-compatible semantics for this class."""
    from ixmp_spark.operators.text import token_count, word_token_count

    docs = load_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        word_token_count("text").alias("n_chunks"),
        token_count("text").alias("n_ws_tokens"),
    )


@query(
    "t4_redact_pii",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\s]+', '<URL>', 'g'),
             '\b[0-9]{7,}\b', '<NUM>', 'g') AS clean_text,
           length(text) AS n_before
    FROM documents WHERE doc_id < 200
    """,
)
def t4_redact_pii(spark, sf_dir):
    """PII/noise redaction (emails, URLs, long digit runs → typed
    placeholders) — chained regexp_replace, whole-stage codegen; patterns
    are RE2-compatible so the oracle is exact."""
    from ixmp_spark.operators.text import redact_pii

    docs = load(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") < 200).select(
        "doc_id",
        redact_pii("text").alias("clean_text"),
        F.length("text").alias("n_before"),
    )


@query(
    "t5_segment_dedup",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
             AS dedup_sorted,
           len(string_split(text, ' '))
             - len(list_distinct(string_split(text, ' '))) AS n_removed
    FROM documents WHERE doc_id < 200
    """,
)
def t5_segment_dedup(spark, sf_dir):
    """Intra-document segment dedup (C4-style cleaning): split → drop
    exact repeats → rejoin. The operator (operators/text.dedup_segments)
    preserves first-occurrence order; this declared check canonicalizes
    to sorted form because DuckDB's list_distinct reorders — the
    order-preserving behavior itself is pinned in unit tests."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ", -1)
    return docs.where(F.col("doc_id") < 200).select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(toks)), " ").alias(
            "dedup_sorted"
        ),
        (F.size(toks) - F.size(F.array_distinct(toks))).alias("n_removed"),
    )


@query(
    "p11_temperature_weights",
    oracle="""
    WITH per AS (
      SELECT source, CAST(sum(len(string_split(trim(text), ' '))) AS DOUBLE) AS n
      FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n) AS t, sum(pow(n, 0.5)) AS ta FROM per
    )
    SELECT per.source, CAST(per.n AS BIGINT) AS n,
           round(per.n / tot.t, 6) AS p_raw,
           round(pow(per.n, 0.5) / tot.ta, 6) AS p_sample,
           round((pow(per.n, 0.5) / tot.ta) / (per.n / tot.t), 6) AS boost
    FROM per, tot
    """,
)
def p11_temperature_weights(spark, sf_dir):
    """Temperature-based domain mixing weights (T5/mT5-style p_i ∝
    n_i^alpha, alpha=0.5) over per-source token counts: the planning
    step that decides how hard to up/down-sample each domain before
    ``domain_mix``/``weighted_sample`` execute it. One aggregation
    shuffle; normalizers ride a 1-row cross-broadcast. NOTE the token
    count here intentionally matches the oracle's simple
    split-on-single-space — the operator takes any size expression."""
    from ixmp_spark.operators.sampling import temperature_weights

    docs = load(spark, sf_dir, "documents")
    return temperature_weights(
        docs, "source", F.size(F.split(F.trim("text"), " ", -1)), alpha=0.5
    )


@query(
    "p12_dsir_logratio",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source = 'src0' AS tgt,
             string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (SELECT doc_id, tgt, unnest(toks) AS w FROM t),
    c AS (
      SELECT w,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
             sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS cr
      FROM g GROUP BY w
    ),
    tot AS (
      SELECT CAST(sum(ct) AS DOUBLE) AS nt,
             CAST(sum(cr) AS DOUBLE) AS nr,
             CAST(count(*) AS DOUBLE) AS v
      FROM c
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(
             ((c.ct + 1.0) / (tot.nt + 1.0 * tot.v))
             / ((c.cr + 1.0) / (tot.nr + 1.0 * tot.v))
           )), 6) AS logratio
    FROM g JOIN c USING (w) CROSS JOIN tot
    GROUP BY g.doc_id
    """,
)
def p12_dsir_logratio(spark, sf_dir):
    """DSIR importance scores (Xie et al. 2023): per-document mean
    log-likelihood ratio between add-1-smoothed unigram models of the
    target domain (source = 'src0') and the rest of the corpus — the
    data-selection signal behind importance resampling. Exact-word
    variant (the hashed-feature scale path is exercised in unit
    tests; hashes don't mirror into DuckDB)."""
    from ixmp_spark.operators.text import dsir_logratio

    docs = load(spark, sf_dir, "documents")
    return dsir_logratio(
        docs, "doc_id", "text", F.col("source") == "src0"
    )


@query(
    "d8_url_dedup",
    oracle="""
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keep_id
    FROM (
      SELECT doc_id,
             'https://' || lower(source) || '.example.com/p/'
               || CAST(doc_id % 97 AS VARCHAR) || '?a=1&b=2'
               AS canonical_url
      FROM documents
    )
    GROUP BY canonical_url
    """,
)
def d8_url_dedup(spark, sf_dir):
    """URL-level dedup on canonicalized addresses. The url column is
    synthesized deterministically from (source, doc_id) in two messy
    variants — even ids get a clean lowercase form, odd ids an
    uppercase WWW.:443 form with shuffled params, a utm_source tracker
    and a fragment — and the canonicalizer must collapse both onto the
    SAME key. The oracle states the expected canonical form
    analytically (it does NOT re-implement the regex pipeline), so a
    canonicalization bug shared by both sides cannot hide."""
    from ixmp_spark.operators.dedup import url_dedup

    docs = load(spark, sf_dir, "documents")
    url = F.when(
        (F.col("doc_id") % 2) == 0,
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/p/"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit("?a=1&b=2"),
        ),
    ).otherwise(
        F.concat(
            F.lit("HTTPS://WWW."),
            F.upper("source"),
            F.lit(".EXAMPLE.COM:443/p/"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit("/?b=2&a=1&utm_source=feed#frag"),
        )
    )
    return url_dedup(
        docs.select("doc_id", url.alias("url")), "doc_id", "url"
    )


@query(
    "p16_domain_blocklist",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                    THEN 'cdn.' || lower(source) || '.example.com'
                  WHEN doc_id % 2 = 0
                    THEN lower(source) || '.example.com'
                  ELSE 'www.' || lower(source) || '.example.com'
             END AS host
      FROM documents
    ), bl(domain) AS (
      VALUES ('src1.example.com'), ('src3.example.com'), ('example.org')
    )
    SELECT d.doc_id, d.host,
           EXISTS (SELECT 1 FROM bl
                   WHERE d.host = bl.domain
                      OR d.host LIKE '%.' || bl.domain) AS blocked
    FROM d
    """,
)
def p16_domain_blocklist(spark, sf_dir):
    """Domain-blocklist gate (flag_blocked_domains) over URLs
    synthesized from (source, doc_id) in three host shapes — bare,
    www-prefixed, cdn-prefixed, a third of them carrying an explicit
    :443 port and credentials to exercise host extraction. The oracle
    states the expected host analytically and the block decision by
    its DEFINITION (equal-or-dot-suffix EXISTS), so neither the regexp
    host parser nor the suffix-explode join can hide a shared bug."""
    from ixmp_spark.operators.dedup import flag_blocked_domains

    docs = load(spark, sf_dir, "documents")
    hostish = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("cdn."), F.lower("source"),
                     F.lit(".example.com")),
        )
        .when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lower("source"), F.lit(".example.com")),
        )
        .otherwise(
            F.concat(F.lit("www."), F.lower("source"),
                     F.lit(".example.com")),
        )
    )
    url = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("https://user:pw@"), hostish, F.lit(":443/p/"),
                 (F.col("doc_id") % 7).cast("string")),
    ).otherwise(
        F.concat(F.lit("https://"), hostish, F.lit("/p/"),
                 (F.col("doc_id") % 7).cast("string"),
                 F.lit("?q=1#frag")),
    )
    bl = spark.createDataFrame(
        [("src1.example.com",), ("src3.example.com",), ("example.org",)],
        "domain string",
    )
    out = flag_blocked_domains(
        docs.withColumn("url", url), "doc_id", "url", bl
    )
    return out.select("doc_id", "host", "blocked")


@query(
    "p17_pareto_frontier",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, n_chars,
             len(list_distinct(
               string_split_regex(trim(lower(text)), '\s+')
             )) AS n_distinct
      FROM documents
    )
    SELECT a.doc_id, a.n_chars,
           CAST(a.n_distinct AS BIGINT) AS n_distinct,
           NOT EXISTS (
             SELECT 1 FROM d b
             WHERE b.n_chars <= a.n_chars
               AND b.n_distinct >= a.n_distinct
               AND (b.n_chars < a.n_chars OR b.n_distinct > a.n_distinct)
           ) AS on_frontier
    FROM d a
    """,
)
def p17_pareto_frontier(spark, sf_dir):
    """Pareto-frontier flag over (shortest, most-distinct-tokens) —
    the info-density skyline for data selection (pareto_frontier with
    x = -n_chars, y = distinct-token count). The Spark side runs the
    bucketed prefix-max reduction; the oracle states strict dominance
    by its NOT EXISTS definition, so the whole reduction — bucketing,
    carries, tie handling — is certified against the textbook
    formulation row by row."""
    from ixmp_spark.operators.sampling import pareto_frontier

    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "n_chars",
        F.size(
            F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
        ).cast("long").alias("n_distinct"),
    )
    out = pareto_frontier(
        d.withColumn("__negc", -F.col("n_chars")), "__negc", "n_distinct"
    )
    return out.select("doc_id", "n_chars", "n_distinct", "on_frontier")


@query(
    "t20_fix_mojibake",
    oracle="""
    SELECT doc_id,
           CASE
             WHEN doc_id % 3 = 0 THEN replace(text, 'a', '\u00e1')
             WHEN doc_id % 3 = 1 THEN '\u201c' || text || '\u201d'
             ELSE text
           END AS fixed
    FROM documents
    """,
)
def t20_fix_mojibake(spark, sf_dir):
    """Mojibake repair (fix_mojibake): documents are deterministically
    corrupted -- a third get Latin-1-mojibake accents (the 'a-acute'
    arriving as its C3-A1 byte pair read as Latin-1), a third get
    cp1252-mojibake curly quotes (the closing one through the
    undefined-0x9D control byte), a third stay clean ASCII -- and the
    operator must return exactly the UNCORRUPTED text. The oracle
    states that ground truth analytically (it never models the
    repair), so the charset round-trip, the cp1252 back-map, and the
    do-not-touch guard are all hash-covered."""
    from ixmp_spark.operators.text import fix_mojibake

    docs = load(spark, sf_dir, "documents")
    moji = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.replace(
                F.col("text"), F.lit("a"), F.lit("\u00c3\u00a1")
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("\u00e2\u20ac\u0153"),
                F.col("text"),
                F.lit("\u00e2\u20ac\u009d"),
            ),
        )
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", fix_mojibake(moji).alias("fixed"))


@query(
    "t21_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id,
             substr(text, CAST(unnest(range(1, length(text) + 1))
                           AS INTEGER), 1) AS c
      FROM documents WHERE length(text) > 0
    ), runs AS (
      SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n
      FROM ch GROUP BY doc_id, c
    ), tot AS (
      SELECT doc_id, sum(n) AS nn, sum(n * log2(n)) AS s
      FROM runs GROUP BY doc_id
    )
    SELECT doc_id,
           round(log2(nn) - s / nn, 6) AS char_entropy,
           (log2(nn) - s / nn) < 3.0 AS low_entropy
    FROM tot
    """,
)
def t21_char_entropy(spark, sf_dir):
    """Character-distribution Shannon entropy per document
    (char_entropy) + a low-entropy gate — the gibberish/boilerplate
    detector next to the Gopher gates. Spark computes it as ONE
    sorted-array fold (3-scalar accumulator, no explode, no per-char
    map — the HOF-trap-safe form); the oracle recomputes the
    definition by exploding chars to rows and aggregating, so the
    driver hash certifies the fold against the textbook formula."""
    from ixmp_spark.operators.text import char_entropy

    # load_spread: the per-document sorted-char fold is map-only and
    # per-row expensive — single-task on the single-split bench files.
    docs = load_spread(spark, sf_dir, "documents")
    h = char_entropy("text")
    return docs.where(F.length("text") > 0).select(
        "doc_id",
        F.round(h, 6).alias("char_entropy"),
        (h < 3.0).alias("low_entropy"),
    )


@query(
    "x7_zipf_fit",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), cnt AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS n
      FROM tok WHERE term <> '' GROUP BY term
    ), top AS (
      SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT 200
    ), ranked AS (
      SELECT n, CAST(row_number() OVER (ORDER BY n DESC, term)
                     AS DOUBLE) AS r
      FROM top
    )
    SELECT round(regr_slope(ln(n), ln(r)), 6) AS zipf_slope,
           round(regr_intercept(ln(n), ln(r)), 6) AS zipf_intercept,
           round(regr_r2(ln(n), ln(r)), 6) AS zipf_r2,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM ranked
    """,
)
def x7_zipf_fit(spark, sf_dir):
    """Zipf's-law exponent of the corpus frequency spectrum
    (zipf_fit, top-200 terms): the 1-row vocabulary-health metric.
    Ranks are computed on exact integer counts with a term tie-break,
    so both engines rank identically, and the regression rides the
    same ANSI regr_* aggregates as w12 — the oracle is a literal
    restatement."""
    from ixmp_spark.operators.text import zipf_fit

    docs = load(spark, sf_dir, "documents")
    return zipf_fit(docs, "text", top_n=200)


@query(
    "t22_calibration_table",
    oracle=r"""
    WITH q AS (
      SELECT doc_id,
             round(0.5 * least(length(text) / 1000.0, 1.0)
                   + 0.3 * (CASE WHEN length(regexp_replace(text, '\s', '', 'g')) * 1.0
                                      / len(string_split_regex(trim(text), '\s+'))
                                 BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
                   + 0.2 * (1 - least(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                                      * 5.0 / length(text), 1.0)), 4) AS s,
             CASE WHEN n_chars > 150 THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    ), b AS (
      SELECT least(CAST(floor(s * 10) AS BIGINT), 9) AS bin, s, y FROM q
    )
    SELECT bin,
           round(min(bin / 10.0), 6) AS lo,
           round(min((bin + 1) / 10.0), 6) AS hi,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(s), 6) AS mean_score,
           round(avg(y), 6) AS frac_pos
    FROM b GROUP BY bin
    """,
)
def t22_calibration_table(spark, sf_dir):
    """Reliability-diagram table (calibration_table, 10 bins) of the
    t1 quality score against a deterministic long-document label —
    the calibration audit that belongs next to every threshold gate.
    Map-side binning + one 10-row aggregation; the oracle restates
    the t1 scoring formula (already hash-certified in p1/t1) plus the
    binning arithmetic."""
    from ixmp_spark.operators.sampling import calibration_table
    from ixmp_spark.operators.text import quality_score

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        quality_score("text").alias("s"),
        F.when(F.col("n_chars") > 150, 1.0).otherwise(0.0).alias("y"),
    )
    return calibration_table(scored, "s", "y", n_bins=10)


@query(
    "p18_k_anonymity",
    oracle="""
    SELECT c_custkey, c_nationkey, c_mktsegment,
           CAST(count(*) OVER (PARTITION BY c_nationkey, c_mktsegment)
                AS BIGINT) AS cell_size,
           count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) < 5
             AS suppress
    FROM customer
    """,
)
def p18_k_anonymity(spark, sf_dir):
    """k-anonymity release gate (k_anonymity_filter, k=5) over the
    (nation, segment) quasi-identifier pair of the customer extract:
    every row carries its cell size and a suppress flag for cells an
    attacker could re-identify. One window count over the
    quasi-identifier partitioning; the oracle is a literal
    restatement."""
    from ixmp_spark.operators.sampling import k_anonymity_filter

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    return k_anonymity_filter(c, ["c_nationkey", "c_mktsegment"], k=5)


@query(
    "t24_readability",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         w -> w <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sentences,
             list_sum(list_transform(toks,
               w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')),
                             1))) AS n_syllables
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           round(206.835
                 - 1.015 * (n_words * 1.0 / n_sentences)
                 - 84.6 * (n_syllables * 1.0 / n_words), 4) AS flesch
    FROM s
    """,
)
def t24_readability(spark, sf_dir):
    """Flesch reading-ease table (readability_scores): the classic
    quality feature with portable sentence/syllable heuristics, all
    map-only built-ins. The oracle restates the same heuristics in
    DuckDB list/regexp functions."""
    from ixmp_spark.operators.text import readability_scores

    docs = load(spark, sf_dir, "documents")
    return readability_scores(docs, "doc_id", "text")


@query(
    "t25_redact_cards",
    oracle="""
    WITH cand AS (
      SELECT doc_id, text,
             list_filter(
               list_distinct(regexp_extract_all(
                 'order ' || CAST(4000000000000000000 + doc_id * 7919
                                  AS VARCHAR)
                 || ' card 4539578763621486 ref '
                 || CAST(1000000000000 + doc_id AS VARCHAR)
                 || ' end',
                 '[0-9]+')),
               x -> len(x) BETWEEN 13 AND 19) AS cands,
             'order ' || CAST(4000000000000000000 + doc_id * 7919
                              AS VARCHAR)
               || ' card 4539578763621486 ref '
               || CAST(1000000000000 + doc_id AS VARCHAR)
               || ' end' AS payload
      FROM documents
    ), digits AS (
      SELECT doc_id, c.cand,
             unnest(generate_series(1, length(c.cand))) AS i
      FROM cand, unnest(cand.cands) AS c(cand)
    ), luhn AS (
      SELECT doc_id, cand,
             sum(CASE WHEN (length(cand) - i) % 2 = 1
                      THEN CASE WHEN CAST(substr(cand, i, 1) AS INT) * 2 > 9
                                THEN CAST(substr(cand, i, 1) AS INT) * 2 - 9
                                ELSE CAST(substr(cand, i, 1) AS INT) * 2 END
                      ELSE CAST(substr(cand, i, 1) AS INT) END) AS s
      FROM digits GROUP BY doc_id, cand
    ), valid AS (
      SELECT doc_id, list(cand ORDER BY cand) AS ok
      FROM luhn WHERE s % 10 = 0 GROUP BY doc_id
    )
    SELECT c.doc_id,
           list_reduce(
             list_prepend(c.payload, coalesce(v.ok, [])),
             (acc, x) -> regexp_replace(
               acc, '(^|[^0-9])' || x || '([^0-9]|$)',
               '\\1<CARD>\\2', 'g')
           ) AS redacted
    FROM cand c LEFT JOIN valid v USING (doc_id)
    """,
)
def t25_redact_cards(spark, sf_dir):
    """Checksum-validated card redaction (redact_cards) over payloads
    synthesized per document: one known-valid Luhn number that must
    mask, one doc-dependent 19-digit order id and one 13-digit ref
    that mask ONLY when their arithmetic happens to pass Luhn (~10%
    of rows each — live positives and negatives in one corpus). The
    oracle validates each candidate RELATIONALLY (digits exploded to
    rows, positional CASE sum) and folds the replacements — a fully
    independent reformulation of the in-expression Luhn fold."""
    from ixmp_spark.operators.text import redact_cards

    docs = load(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit("order "),
        (F.lit(4000000000000000000) + F.col("doc_id") * 7919)
        .cast("string"),
        F.lit(" card 4539578763621486 ref "),
        (F.lit(1000000000000) + F.col("doc_id")).cast("string"),
        F.lit(" end"),
    )
    return docs.select(
        "doc_id",
        redact_cards(payload).alias("redacted"),
    )


@query(
    "d10_containment",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(trim(lower(text)), '\s+'))
               AS toks
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_filter(a.toks, x -> list_contains(b.toks, x)))
               * 1.0 AS i,
             len(a.toks) AS na, len(b.toks) AS nb
      FROM t a JOIN t b
        ON a.lang = b.lang AND a.source = b.source
       AND a.doc_id < b.doc_id
    )
    SELECT id_a AS contained_id, id_b AS container_id,
           round(i / na, 6) AS containment
    FROM pairs WHERE i / na >= 0.8
    UNION ALL
    SELECT id_b, id_a, round(i / nb, 6)
    FROM pairs WHERE i / nb >= 0.8
    """,
)
def d10_containment(spark, sf_dir):
    """Directional containment pairs within (lang, source) blocks
    (containment_pairs, threshold 0.8): the asymmetric quote/subset
    detector next to d2's symmetric Jaccard — one unordered blocked
    self-join tests both directions from a single intersection. The
    oracle is the set-theoretic definition on raw token lists (no
    hashing), so the 64-bit token-hash shortcut is certified
    collision-safe on this corpus too."""
    from ixmp_spark.operators.dedup import containment_pairs

    docs = load(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "doc_id", "text", ["lang", "source"],
        threshold=0.8, max_block=5000,
    )


@query(
    "d11_soft_dedup",
    oracle=r"""
    SELECT doc_id, source, CAST(n AS BIGINT) AS n_copies,
           round(1.0 / n, 6) AS weight
    FROM (
      SELECT doc_id, source,
             count(*) OVER (PARTITION BY
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
             ) AS n
      FROM documents
    )
    """,
)
def d11_soft_dedup(spark, sf_dir):
    """SoftDeDup weighting (soft_dedup_weights): every document kept,
    each exact-content group's sampling mass normalized to 1 via
    weight = 1/n_copies — d1's drop decision re-expressed as a
    training-mix weight. One window count over the normalized-text
    digest; the oracle restates digest + window literally."""
    from ixmp_spark.operators.dedup import soft_dedup_weights

    docs = load_spread(spark, sf_dir, "documents")
    out = soft_dedup_weights(docs, text_col="text", id_col="doc_id")
    return out.select("doc_id", "source", "n_copies", "weight")


@query(
    "p19_l_diversity",
    oracle="""
    WITH p AS (
      SELECT o_custkey, o_orderstatus,
             CAST(count(*) AS BIGINT) AS cell_size,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT)
               AS l_distinct
      FROM orders GROUP BY o_custkey, o_orderstatus
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
           p.cell_size, p.l_distinct, p.l_distinct < 3 AS at_risk
    FROM orders o JOIN p USING (o_custkey, o_orderstatus)
    """,
)
def p19_l_diversity(spark, sf_dir):
    """l-diversity audit over the (customer, status) cells of an order
    release, sensitive attribute = order priority: a cell where every
    order shares one priority leaks it regardless of cell size (the
    homogeneity attack k-anonymity misses). One quasi-keyed profile
    aggregate + join back on the same key; the oracle restates it."""
    from ixmp_spark.operators.sampling import l_diversity_audit

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    out = l_diversity_audit(
        o, ["o_custkey", "o_orderstatus"], "o_orderpriority", l=3
    )
    return out.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "cell_size", "l_distinct", "at_risk",
    )


@query(
    "t26_vocab_coverage",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents
    ),
    cnt AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM toks WHERE w <> '' GROUP BY w
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
    ranked AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT)
               AS k
      FROM cnt
    ),
    cum AS (
      SELECT k, CAST(sum(c) OVER (ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cc
      FROM ranked
    )
    SELECT k, round(cc * 1.0 / total, 6) AS coverage
    FROM cum CROSS JOIN tot WHERE k IN (5, 10, 20, 30)
    """,
)
def t26_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve (vocab_coverage): token mass covered
    by the top-{5,10,20,30} word types
    (the driver corpus is a ~31-type template vocabulary) — the <unk>-rate /
    vocab-size design readout. One corpus-sized count aggregation;
    ranking bounded to max(k) rows via orderBy().limit(); total as a
    1-row broadcast. The oracle ranks the full vocabulary (same rows
    survive the IN filter)."""
    from ixmp_spark.operators.text import vocab_coverage

    docs = load_spread(spark, sf_dir, "documents")
    return vocab_coverage(docs, "text", ks=(5, 10, 20, 30))


@query(
    "t28_lexical_diversity",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents
    ), wc AS (
      SELECT doc_id, w, count(*) AS c
      FROM toks WHERE w <> '' GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(count(*) * 1.0 / sum(c), 6) AS ttr,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS hapax_ratio
    FROM wc GROUP BY doc_id
    """,
)
def t28_lexical_diversity(spark, sf_dir):
    """Type–token and hapax ratios per document (lexical_diversity):
    the vocabulary-richness gate between templated spam (low TTR) and
    keyboard mash (all hapaxes). Explode + two keyed aggregations —
    deliberately NOT an array-lambda count (the HOF-inlining O(n²)
    trap); the oracle restates the same two-level fold."""
    from ixmp_spark.operators.text import lexical_diversity

    docs = load_spread(spark, sf_dir, "documents")
    return lexical_diversity(docs, "doc_id", "text")


@query(
    "p20_effective_sample_size",
    oracle=r"""
    WITH w AS (
      SELECT source,
             1.0 / count(*) OVER (PARTITION BY
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
             ) AS wt
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           round(sum(wt), 6) AS sum_w,
           round(sum(wt) * sum(wt) / sum(wt * wt), 6) AS ess,
           round(sum(wt) * sum(wt) / sum(wt * wt) / count(*), 6)
             AS ess_ratio
    FROM w WHERE wt > 0 GROUP BY source
    """,
)
def p20_effective_sample_size(spark, sf_dir):
    """Kish effective sample size per source under d11's soft-dedup
    weights (effective_sample_size ∘ soft_dedup_weights): how many
    equal-weight documents each source is actually worth after
    duplicate down-weighting — the honesty metric for every
    reweighted mix. One keyed aggregation over the weighted frame;
    the oracle recomputes weights AND the ESS quotient analytically."""
    from ixmp_spark.operators.dedup import soft_dedup_weights
    from ixmp_spark.operators.sampling import effective_sample_size

    docs = load_spread(spark, sf_dir, "documents")
    weighted = soft_dedup_weights(docs, text_col="text", id_col="doc_id")
    return effective_sample_size(weighted, "source", "weight")


@query(
    "t27_rake_keywords",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS l
      FROM documents
    ), toks AS (
      SELECT doc_id, unnest(l) AS w, unnest(range(0, len(l))) AS pos
      FROM t
    ), tk AS (SELECT * FROM toks WHERE w <> ''),
    marked AS (
      SELECT doc_id, pos, w,
             w IN ('the','a','an','and','of','to','in','is','for','on')
               AS stop,
             sum(CASE WHEN w IN ('the','a','an','and','of','to','in',
                                 'is','for','on')
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pid
      FROM tk
    ), ns AS (
      SELECT doc_id, pos, w, pid FROM marked WHERE NOT stop
    ), wl AS (
      SELECT doc_id, pos, w, pid,
             count(*) OVER (PARTITION BY doc_id, pid) AS plen
      FROM ns
    ), ws AS (
      SELECT doc_id, w, count(*) AS freq, sum(plen) AS deg
      FROM wl GROUP BY doc_id, w
    ), sc AS (
      SELECT wl.doc_id, wl.pid, wl.pos, wl.w,
             ws.deg * 1.0 / ws.freq AS s
      FROM wl JOIN ws ON wl.doc_id = ws.doc_id AND wl.w = ws.w
    ), ph AS (
      SELECT doc_id, pid,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             CAST(count(*) AS BIGINT) AS n_words,
             round(sum(s), 6) AS score
      FROM sc GROUP BY doc_id, pid
    )
    SELECT doc_id, phrase, n_words, score, rank
    FROM (
      SELECT doc_id, phrase, n_words, score,
             CAST(row_number() OVER (
               PARTITION BY doc_id
               ORDER BY score DESC, phrase, pid) AS BIGINT) AS rank
      FROM ph
    ) WHERE rank <= 3
    """,
)
def t27_rake_keywords(spark, sf_dir):
    """Top-3 RAKE keyphrases per document (rake_keywords): stopword-
    delimited candidate phrases scored by summed word degree/frequency
    — the no-training keyword extractor. Gaps-and-islands phrase ids,
    two doc-keyed shuffles; ranking on the ROUNDED score (raw float
    sums must never order cross-engine results). The oracle replays
    the full pipeline."""
    from ixmp_spark.operators.text import rake_keywords

    docs = load_spread(spark, sf_dir, "documents")
    return rake_keywords(docs, "doc_id", "text", k=3)


@query(
    "e11_mips_topk",
    oracle="""
    WITH probe AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
      FROM embeddings ORDER BY vec_id LIMIT 1
    ), scored AS (
      SELECT e.vec_id,
             round(list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pv),
                   6) AS inner_product
      FROM embeddings e, probe p
      WHERE e.vec_id <> p.probe_id
    )
    SELECT vec_id, inner_product FROM scored
    ORDER BY inner_product DESC, vec_id LIMIT 10
    """,
)
def e11_mips_topk(spark, sf_dir):
    """Exact top-10 by maximum inner product for the min-id probe
    (mips_topk): the recommender-scoring metric where vector NORM
    carries signal cosine throws away. Broadcast probe, map-only dot
    pass, TakeOrderedAndProject; the scale path is the ALSH
    augmentation (mips_augment) feeding the existing cosine-LSH
    index, pinned order-equivalent in tests."""
    from ixmp_spark.operators.similarity import mips_topk

    emb = load(spark, sf_dir, "embeddings")
    probe = emb.orderBy("vec_id").limit(1)
    return mips_topk(emb, probe, id_col="vec_id", vec_col="embedding", k=10)


@query(
    "p21_quantile_normalize",
    oracle="""
    WITH g AS (
      SELECT quantile_cont(CAST(n_chars AS DOUBLE),
               [x * 1.0 / 200 for x in range(0, 201)]) AS q
      FROM documents
    ), b AS (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY CAST(n_chars AS DOUBLE))
               AS pr
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           round(q[CAST(floor(pr * 200.0) AS INTEGER) + 1]
                 + (pr * 200.0 - CAST(floor(pr * 200.0) AS INTEGER))
                 * (q[least(CAST(floor(pr * 200.0) AS INTEGER) + 2,
                            201)]
                    - q[CAST(floor(pr * 200.0) AS INTEGER) + 1]),
                 4) AS norm_score
    FROM b CROSS JOIN g
    """,
)
def p21_quantile_normalize(spark, sf_dir):
    """Per-source quantile normalization of document length onto the
    global distribution (quantile_normalize, 200-bucket grid): after
    it, "top decile of each source" is one global threshold — the
    heterogeneous-scorer fix for corpus mixing. One keyed
    percent_rank + a 1-row quantile-grid broadcast + map-only lerp;
    the oracle restates grid and lerp (round 4 — the a8 percentile
    ulp rule)."""
    from ixmp_spark.operators.sampling import quantile_normalize

    docs = load(spark, sf_dir, "documents")
    out = quantile_normalize(
        docs, "source", "n_chars", n_buckets=200
    )
    return out.select(
        "doc_id", "source", "n_chars",
        F.round("norm_score", 4).alias("norm_score"),
    )


@query(
    "t29_repetition",
    oracle="""
    WITH docs AS (
      SELECT doc_id, text, trim(lower(text)) AS norm FROM documents
    ), lined AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> trim(x) != '') AS l
      FROM docs
    ), linesig AS (
      SELECT doc_id,
             CAST(len(l) AS BIGINT) AS n_lines,
             round(CASE WHEN len(l) > 0
               THEN 1 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l)
               ELSE 0.0 END, 6) AS dup_line_frac,
             round(CASE WHEN coalesce(list_sum(
                     list_transform(l, x -> length(x))), 0) > 0
               THEN 1 - CAST(list_sum(list_transform(
                       list_distinct(l), x -> length(x))) AS DOUBLE)
                     / list_sum(list_transform(l, x -> length(x)))
               ELSE 0.0 END, 6) AS dup_line_char_frac
      FROM lined
    ), w AS (
      SELECT doc_id, CAST(length(norm) AS DOUBLE) AS chars,
             string_split_regex(norm, '\\s+') AS words
      FROM docs
    ), grams AS (
      SELECT w.doc_id, w.chars, n.n,
             array_to_string(
               words[CAST(i AS INT) : CAST(i AS INT) + n.n - 1], ' '
             ) AS g
      FROM w
      CROSS JOIN (VALUES (2), (3), (4), (5)) n(n)
      CROSS JOIN unnest(range(1, len(words) - n.n + 2)) AS t(i)
    ), cnt AS (
      SELECT doc_id, n, g, CAST(count(*) AS DOUBLE) AS c,
             max(chars) AS chars
      FROM grams GROUP BY doc_id, n, g
    ), topg AS (
      SELECT doc_id, n,
             CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END AS topchars
      FROM (
        SELECT doc_id, n, c, g, row_number() OVER (
          PARTITION BY doc_id, n
          ORDER BY c DESC, length(g) DESC, g DESC
        ) AS rn FROM cnt
      ) WHERE rn = 1
    ), per_n AS (
      SELECT cnt.doc_id, cnt.n, max(topg.topchars) AS topchars,
             sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)
               AS dupchars,
             max(chars) AS chars
      FROM cnt JOIN topg ON topg.doc_id = cnt.doc_id AND topg.n = cnt.n
      GROUP BY cnt.doc_id, cnt.n
    ), sig AS (
      SELECT doc_id,
        round(coalesce(max(CASE WHEN n = 2
          THEN topchars / chars END), 0.0), 6) AS top_2gram_char_frac,
        round(coalesce(max(CASE WHEN n = 3
          THEN topchars / chars END), 0.0), 6) AS top_3gram_char_frac,
        round(coalesce(max(CASE WHEN n = 4
          THEN topchars / chars END), 0.0), 6) AS top_4gram_char_frac,
        round(coalesce(max(CASE WHEN n = 5
          THEN dupchars / chars END), 0.0), 6) AS dup_5gram_char_frac
      FROM per_n GROUP BY doc_id
    )
    SELECT linesig.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
           coalesce(top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
           coalesce(top_3gram_char_frac, 0.0) AS top_3gram_char_frac,
           coalesce(top_4gram_char_frac, 0.0) AS top_4gram_char_frac,
           coalesce(dup_5gram_char_frac, 0.0) AS dup_5gram_char_frac,
           (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
            AND coalesce(top_2gram_char_frac, 0.0) <= 0.20
            AND coalesce(top_3gram_char_frac, 0.0) <= 0.18
            AND coalesce(top_4gram_char_frac, 0.0) <= 0.16
            AND coalesce(dup_5gram_char_frac, 0.0) <= 0.15) AS keep
    FROM linesig LEFT JOIN sig USING (doc_id)
    """,
)
def t29_repetition(spark, sf_dir):
    """Gopher repetition rules (gopher_repetition_signals): duplicate-line
    fractions + top-{2,3,4}-gram and duplicated-5-gram character
    fractions with the published thresholds — the boilerplate-loop /
    keyword-stuffing half of the Gopher gate that t14's map-only
    signals cannot see (these need the one gram-keyed shuffle). The
    oracle rebuilds the same grams via list slicing and replays the
    max_by tie-break (count, length, gram) literally."""
    from ixmp_spark.operators.text import gopher_repetition_signals

    # load_spread (the x19 precedent): gram construction is per-row
    # expensive and the bench files are single-split — without the
    # spread the whole one-pass gram build runs in one task.
    docs = load_spread(spark, sf_dir, "documents")
    return gopher_repetition_signals(docs, "doc_id", "text")
