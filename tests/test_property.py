"""Property-based tests (hypothesis) for contract-critical pure logic:
key coercion (C1/C7), the IN-list filter predicate (F1), unit algebra
(C5), Key parsing, and chunk assignment (W4)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ixmp_spark.core.scenario import _as_str_list
from ixmp_spark.plans.reporter import Key, _combine_units, _unit_exponents
from ixmp_spark.sources.scenario_io import _sheet_chunks

labels = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)


@given(st.lists(st.one_of(st.integers(), st.floats(allow_nan=False), labels)))
def test_as_str_list_total(xs):
    out = _as_str_list(xs)
    assert all(isinstance(s, str) for s in out)
    assert len(out) == len(xs)
    # str coercion is idempotent
    assert _as_str_list(out) == out


@given(st.integers(), labels)
def test_as_str_list_scalars(i, s):
    assert _as_str_list(i) == [str(i)]
    assert _as_str_list(s) == [s]
    assert _as_str_list(None) == []


@given(
    st.lists(labels, min_size=1, max_size=6, unique=True),
)
def test_key_roundtrip(dims):
    k = Key("q", tuple(dims))
    assert Key.parse(str(k)) == k
    for d in dims:
        assert d not in Key.parse(str(k.drop(d))).dims


unit_atoms = st.sampled_from(["km", "USD", "GWa", "cases", "kg"])


@st.composite
def units(draw):
    n = draw(st.integers(1, 3))
    parts = [draw(unit_atoms)]
    for _ in range(n - 1):
        parts.append(draw(st.sampled_from(["*", "/"])))
        parts.append(draw(unit_atoms))
    return "".join(parts)


@given(units(), units())
def test_unit_mul_div_inverse(a, b):
    """(a*b)/b ≡ a at the exponent level."""
    ab = _combine_units(a, b, "mul")
    back = _combine_units(ab, b, "div")
    assert _unit_exponents(back) == _unit_exponents(a)


@given(units())
def test_unit_self_div_cancels(a):
    assert _combine_units(a, a, "div") == ""
    assert _combine_units(a, a, "add") == a


@given(st.integers(1, 5000), st.integers(1, 997))
@settings(max_examples=30, deadline=None)  # GC on a loaded machine trips 200ms
def test_sheet_chunks_partition(n_rows, max_row):
    """W4: chunks partition the frame, ordered, sizes ≤ max_row."""
    df = pd.DataFrame({"x": range(n_rows)})
    chunks = list(_sheet_chunks("it", df, max_row))
    assert len(chunks) == math.ceil(n_rows / max_row)
    assert chunks[0][0] == "it"
    assert [name for name, _ in chunks[1:]] == [
        f"it({i})" for i in range(2, len(chunks) + 1)
    ]
    total = pd.concat([c for _, c in chunks])
    assert total["x"].tolist() == list(range(n_rows))
    assert all(len(c) <= max_row for _, c in chunks)


@pytest.mark.parametrize(
    "filters,expect",
    [
        ({"l_returnflag": []}, 6000),  # empty list → no constraint
        ({"not_a_dim": ["x"]}, 6000),  # irrelevant key pruned
        ({"l_returnflag": ["A"], "l_linestatus": ["F"]}, None),  # conj
    ],
)
def test_filter_contract_edges(spark, sf_dir, filters, expect):
    from ixmp_spark.operators.filtering import in_list_filter
    from ixmp_spark.queries import load

    li = load(spark, sf_dir, "lineitem")
    out = in_list_filter(li, filters)
    n = out.count()
    if expect is not None:
        assert n == li.count() == expect or n == expect
    else:
        manual = li.where(
            (li.l_returnflag == "A") & (li.l_linestatus == "F")
        ).count()
        assert n == manual


def test_chunk_index_matches_global_order(spark):
    """The range-partitioned chunk assignment must equal the sequential
    definition (floor(global_rank / chunk_size)) for arbitrary sizes and
    chunk widths — the scale-safe plan is a pure refactor of W4."""
    from ixmp_spark.operators.versioning import chunk_index

    for n, size, parts in ((0, 10, 4), (1, 3, 4), (97, 10, 7), (1000, 64, 32)):
        df = spark.range(n).selectExpr("id * 37 % 1009 AS k", "id")
        got = (
            chunk_index(df, order_by=["k", "id"], chunk_size=size,
                        num_partitions=parts)
            .orderBy("k", "id")
            .collect()
        )
        rows = sorted(((r.k, r.id) for r in got))
        expect = {kv: i // size for i, kv in enumerate(rows)}
        assert all(expect[(r.k, r.id)] == r.chunk for r in got), (n, size)


def test_items_itemtype_flags(spark, tmp_path):
    from ixmp_spark.core import ItemType, Platform
    from ixmp_spark.testing import make_dantzig

    scen = make_dantzig(Platform(spark, str(tmp_path / "wh")))
    assert scen.items(ItemType.PAR) == scen.items("par")
    assert scen.items(ItemType.SET) == scen.items("set")
    combo = scen.items(ItemType.VAR | ItemType.EQU)
    assert combo == sorted(scen.items("var") + scen.items("equ"))
    assert ItemType.is_model_data(ItemType.PAR)
    assert not ItemType.is_model_data(ItemType.TS)
    assert ItemType.from_str("par") is ItemType.PAR
    assert (ItemType.VAR | ItemType.EQU) == ItemType.SOLUTION


def test_p2_decomposition_matches_global_window(spark):
    """The per-quality-group token-budget packing (p2) must select the
    exact same rows as the single-partition global-window definition, on
    data with heavy quality-value ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(500).selectExpr(
        "id AS doc_id",
        "CAST(id % 13 AS DOUBLE) / 13 AS quality",  # many ties per value
        "CAST(id % 37 + 5 AS INT) AS n_tokens",
    )
    B = 3000
    # reference: global running sum (the definition)
    wg = Window.orderBy(F.col("quality").desc(), F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    expect = {
        (r.doc_id, r.cum_tokens)
        for r in df.withColumn("cum_tokens", F.sum("n_tokens").over(wg))
        .where(F.col("cum_tokens") <= B)
        .collect()
    }
    # scale-safe decomposition (the p2 plan)
    w_off = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        df.groupBy("quality")
        .agg(F.sum("n_tokens").alias("__qt"))
        .withColumn("__off", F.coalesce(F.sum("__qt").over(w_off), F.lit(0)))
        .drop("__qt")
    )
    w_loc = Window.partitionBy("quality").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    got = {
        (r.doc_id, r.cum_tokens)
        for r in df.join(F.broadcast(offsets), "quality")
        .where(F.col("__off") <= B)
        .withColumn("cum_tokens", F.col("__off") + F.sum("n_tokens").over(w_loc))
        .where(F.col("cum_tokens") <= B)
        .collect()
    }
    assert got == expect and len(got) > 0


# -- _sql_not_in: the SQL-parsed membership predicate must agree with
#    Python-side membership for arbitrary member strings (escaping is the
#    risk: quotes, backslashes, backticks, unicode)

weird_text = st.text(min_size=1, max_size=12).filter(
    lambda s: "\x00" not in s and s == s.strip() and s != ""
)


@settings(max_examples=12, deadline=None)
@given(
    members=st.lists(weird_text, min_size=1, max_size=6, unique=True),
    probes=st.lists(weird_text, min_size=1, max_size=6, unique=True),
)
def test_sql_not_in_matches_python_membership(spark, members, probes):
    from ixmp_spark.core.scenario import _sql_not_in

    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"v": probes}))
    got = {
        r["v"]
        for r in df.where(F.expr(_sql_not_in("v", members))).collect()
    }
    want = {p for p in probes if p not in set(members)}
    assert got == want


# -- t9/t10: TF-IDF and bigram-LM vs a pure-pandas reference model --------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "e", "fff"]),
        min_size=1, max_size=10,
    ),
    min_size=1, max_size=6,
)


@settings(max_examples=8, deadline=None)
@given(docs=docs_strategy)
def test_tfidf_matches_reference(spark, docs):
    """tfidf_topk == a 10-line pure-Python reference on arbitrary small
    corpora: same (doc, term, rank) triples, scores equal to 1e-9."""
    from ixmp_spark.operators.text import tfidf_topk

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.term): (r.rank, r.score)
        for r in tfidf_topk(df, "doc_id", "text", k=3).collect()
    }
    # reference
    n = len(docs)
    dfreq: dict[str, int] = {}
    for toks in docs:
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for i, toks in enumerate(docs):
        scores = {
            t: toks.count(t) * math.log(n / dfreq[t]) for t in set(toks)
        }
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (t, s) in enumerate(ranked, 1):
            want[(i, t)] = (rank, round(s, 6))
    assert set(got) == set(want)
    for key, (rank, score) in want.items():
        assert got[key][0] == rank
        assert abs(got[key][1] - score) < 1e-9


@settings(max_examples=8, deadline=None)
@given(docs=docs_strategy)
def test_bigram_perplexity_matches_reference(spark, docs):
    """bigram_perplexity == the pure-Python add-1 LM on arbitrary small
    corpora (docs with <2 tokens absent; ppl equal to 1e-6)."""
    from ixmp_spark.operators.text import bigram_perplexity

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.ppl)
        for r in bigram_perplexity(df, "doc_id", "text").collect()
    }
    vocab = len({t for toks in docs for t in toks})
    bg: dict[tuple, int] = {}
    ctx: dict[str, int] = {}
    for toks in docs:
        for w1, w2 in zip(toks, toks[1:]):
            bg[(w1, w2)] = bg.get((w1, w2), 0) + 1
            ctx[w1] = ctx.get(w1, 0) + 1
    want = {}
    for i, toks in enumerate(docs):
        grams = list(zip(toks, toks[1:]))
        if not grams:
            continue
        h = -sum(
            math.log((bg[g] + 1.0) / (ctx[g[0]] + vocab)) for g in grams
        ) / len(grams)
        want[i] = (len(grams), round(math.exp(h), 6))
    assert set(got) == set(want)
    for i, (nb, ppl) in want.items():
        assert got[i][0] == nb
        assert abs(got[i][1] - ppl) < 1e-6


# -- multimodal codec round-trips (pure functions, no Spark) --------------

rgb_arrays = st.integers(1, 9).flatmap(
    lambda h: st.integers(1, 9).flatmap(
        lambda w: st.lists(
            st.integers(0, 255), min_size=h * w * 3, max_size=h * w * 3
        ).map(lambda v: (h, w, v))
    )
)


@given(rgb_arrays)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_identity(hwv):
    """encode→decode is the identity for arbitrary small RGB images —
    including odd widths whose BMP rows need 4-byte padding."""
    import numpy as np

    from ixmp_spark.operators.multimodal import _bmp_pixels, _encode_bmp

    h, w, vals = hwv
    pix = np.array(vals, dtype=np.uint8).reshape(h, w, 3)
    assert (_bmp_pixels(_encode_bmp(pix)) == pix).all()


@given(rgb_arrays)
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_identity(hwv):
    import numpy as np

    from ixmp_spark.operators.multimodal import _encode_ppm, _ppm_pixels

    h, w, vals = hwv
    pix = np.array(vals, dtype=np.uint8).reshape(h, w, 3)
    assert (_ppm_pixels(_encode_ppm(pix)) == pix).all()


@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=400,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_samples(values, rate):
    """WAV encode→decode preserves the waveform to 16-bit quantization
    (encode truncation + the 32767/32768 scale mismatch bound the error
    by 2 LSB) and the sample rate exactly."""
    import io
    import wave

    import numpy as np

    from ixmp_spark.operators.multimodal import _wav_samples

    vals = np.asarray(values)
    pcm = (vals * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    got, got_rate = _wav_samples(buf.getvalue())
    assert got_rate == rate and len(got) == len(vals)
    assert np.abs(got - vals).max() <= 2.0 / 32768 + 1e-12


@given(rgb_arrays, st.integers(1, 6), st.integers(1, 6))
@settings(max_examples=40, deadline=None)
def test_resize_nearest_contract(hwv, out_w, out_h):
    """Nearest-neighbor resize: output shape is exact, every output
    pixel is some input pixel, and identity-resize is a no-op."""
    import numpy as np

    from ixmp_spark.operators.multimodal import _resize_nearest

    h, w, vals = hwv
    pix = np.array(vals, dtype=np.uint8).reshape(h, w, 3)
    out = _resize_nearest(pix, out_w, out_h)
    assert out.shape == (out_h, out_w, 3)
    in_set = {tuple(p) for p in pix.reshape(-1, 3)}
    assert all(tuple(p) in in_set for p in out.reshape(-1, 3))
    assert (_resize_nearest(pix, w, h) == pix).all()


# -- t12: distributed BPE merge learning vs a pure-Python reference -------

def _bpe_reference(texts, n_merges):
    """Sennrich-style BPE on a word-frequency table: overlapping pair
    counts, greedy left-to-right merge, ties by (freq desc, left asc,
    right asc)."""
    import re
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                wc[w] += 1
    vocab = [(list(w) + ["</w>"], c) for w, c in wc.items()]
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for s, c in vocab:
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, freq))
        new_vocab = []
        for s, c in vocab:
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            new_vocab.append((out, c))
        vocab = new_vocab
    return merges


bpe_docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["ab", "aab", "b", "aa", "abab", "ba"]),
        min_size=1, max_size=8,
    ),
    min_size=1, max_size=5,
)


@settings(max_examples=5, deadline=None)
@given(docs=bpe_docs_strategy)
def test_bpe_train_matches_reference(spark, docs):
    """bpe_train's merge sequence equals the pure-Python Sennrich BPE on
    arbitrary small corpora — rank, pair, merged symbol, and weighted
    pair frequency all match exactly (the tie-break makes the sequence a
    pure function of the corpus, so equality is exact, not approximate).
    Repeated-symbol runs ('aaa') exercise both the overlapping pair
    COUNT and the non-overlapping greedy MERGE semantics."""
    from ixmp_spark.operators.text import bpe_train

    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.rank, r.left, r.right, r.merged, r.freq)
        for r in bpe_train(df, "text", n_merges=5).collect()
    ]
    assert got == _bpe_reference(texts, 5)


# -- r6 exact decompositions: randomized equivalence pins ------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                    # user
        st.integers(0, 60 * 60 * 24 * 6),     # seconds offset over ~6 days
        st.sampled_from(["a", "b", "c"]),     # event type
        st.floats(-5, 5, allow_nan=False),    # value
    ),
    min_size=1, max_size=60,
)


def _event_frame(spark, rows):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 6, 1)
    return spark.createDataFrame(
        [
            (i, t0 + timedelta(seconds=s), u, e, float(v))
            for i, (u, s, e, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_chunked_windows_equal_plain_random(spark, rows):
    """The bucket-chunked decompositions (head carries / prefix-sum
    stitching / tail carries) equal their plain whole-history windows on
    ARBITRARY event frames — random users, random timestamps (bucket
    boundaries and empty days arise by chance), random path lengths."""
    from ixmp_spark.operators.sessions import (
        event_transitions,
        sessionize,
        top_paths,
        zscore_anomalies,
    )

    ev = _event_frame(spark, rows)
    a = sessionize(ev, "user_id", "ts", 1800, "event_id")
    b = sessionize(ev, "user_id", "ts", 1800, "event_id", bucket="day")
    key = lambda r: (r["event_id"], r["session_id"])  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))

    for length in (2, 3):
        p = top_paths(ev, length=length, k=1000).collect()
        c = top_paths(ev, length=length, k=1000, bucket="day").collect()
        assert sorted(map(tuple, p)) == sorted(map(tuple, c))

    p = event_transitions(ev, k=1000).collect()
    c = event_transitions(ev, k=1000, bucket="day").collect()
    assert sorted(map(tuple, p)) == sorted(map(tuple, c))

    zp = zscore_anomalies(ev, window=3).collect()
    zc = zscore_anomalies(ev, window=3, bucket="day").collect()
    assert sorted(map(tuple, zp)) == sorted(map(tuple, zc))


intervals_strategy = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 180)),  # start min, len min
    min_size=0, max_size=12,
)
points_strategy = st.lists(st.integers(0, 700), min_size=0, max_size=40)


@settings(max_examples=10, deadline=None)
@given(iv=intervals_strategy, pts=points_strategy)
def test_range_join_equals_naive_random(spark, iv, pts):
    """Bucketized range_join == the naive BETWEEN join on arbitrary
    point/interval sets (boundary hits, zero-length and multi-bucket
    intervals, overlapping intervals all arise by generation)."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.joins import range_join

    t0 = datetime(2024, 6, 1)
    points = spark.createDataFrame(
        [(i, t0 + timedelta(minutes=m)) for i, m in enumerate(pts)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (i, t0 + timedelta(minutes=s), t0 + timedelta(minutes=s + ln))
            for i, (s, ln) in enumerate(iv)
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r["iid"], r["pid"])
        for r in range_join(
            points, intervals, "ts", "start_ts", "end_ts", 3600
        ).collect()
    )
    want = sorted(
        (i, p_i)
        for i, (s, ln) in enumerate(iv)
        for p_i, m in enumerate(pts)
        if s <= m <= s + ln
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(iv=intervals_strategy, iv2=intervals_strategy)
def test_interval_overlap_join_equals_naive_random(spark, iv, iv2):
    """interval_overlap_join == the naive theta join on arbitrary
    interval sets (touching endpoints, containment, multi-bucket spans,
    same-bucket disjoint pairs all arise by generation)."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.joins import interval_overlap_join

    t0 = datetime(2024, 6, 1)

    def frame(rows, p):
        return spark.createDataFrame(
            [
                (
                    i,
                    t0 + timedelta(minutes=s),
                    t0 + timedelta(minutes=s + ln),
                )
                for i, (s, ln) in enumerate(rows)
            ],
            f"{p}_id long, {p}_s timestamp, {p}_e timestamp",
        )

    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            frame(iv, "a"), frame(iv2, "b"), ("a_s", "a_e"),
            ("b_s", "b_e"), 3600
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, l1) in enumerate(iv)
        for j, (s2, l2) in enumerate(iv2)
        if s1 <= s2 + l2 and s2 <= s1 + l1
    )
    assert got == want


# -- VERDICT r7 #7: port the ulp-hunting property-test pattern to the
#    other re-derived numeric formulas that must match a Spark builtin
#    or the DuckDB oracle: percentile interpolation (a8), ntile
#    boundaries (p13), and gap-threshold session stitching (g1b).


def _spark_percentile_ref(values: list[float], p: float) -> float:
    """Pure-Python replay of Spark's exact interpolated-percentile
    arithmetic (Percentile.getPercentile): pos = p*(n-1), then the
    SYMMETRIC weighted form ``(higher-pos)*x[lo] + (pos-lower)*x[hi]``
    — NOT the lerp ``x[lo] + frac*(x[hi]-x[lo])``. The two are equal in
    the reals but differ by an ulp on adjacent doubles (this test's
    first run found it: [a, nextafter(a)], p=0.9 → Spark returns a, the
    lerp returns nextafter(a)). DuckDB's quantile_cont uses the lerp
    form; the a8 oracle hash-match survives because the catalog rounds
    to 4 decimals, which absorbs the ulp — exactly the amplification
    class this test exists to keep visible."""
    xs = sorted(values)
    n = len(xs)
    pos = p * (n - 1)
    lo = int(math.floor(pos))
    hi = int(math.ceil(pos))
    if lo == hi:
        return xs[lo]
    if xs[lo] == xs[hi]:
        # Spark's equal-key short-circuit (Percentile.getPercentile:
        # "no interpolation needed"): returns the key DIRECTLY. Only
        # observable at the floating-point extremes — this suite's
        # second real find: [5e-324, 5e-324], p=0.5 makes the weighted
        # form underflow (0.5·subnormal-min rounds to 0) to 0.0 where
        # Spark returns 5e-324
        return xs[lo]
    return (hi - pos) * xs[lo] + (pos - lo) * xs[hi]


# ulp-adjacent clusters: pairs separated by one representable double —
# interpolation between them amplifies rounding differences if either
# engine deviates from lower + frac*(upper-lower)
_ulp_values = st.lists(
    st.one_of(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        st.floats(min_value=-1e-3, max_value=1e-3, allow_nan=False),
    ),
    min_size=1,
    max_size=14,
).flatmap(
    lambda base: st.lists(
        st.sampled_from(
            [v for b in base for v in (b, math.nextafter(b, math.inf), b)]
        ),
        min_size=1,
        max_size=20,
    )
)


@settings(max_examples=12, deadline=None)
@given(values=_ulp_values, p=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]))
def test_percentile_interpolation_matches_reference(spark, values, p):
    """Spark's percentile() must equal the pure-Python replay of its
    interpolation formula BIT-FOR-BIT on frames with ulp-separated
    values and duplicates — the same exposure class as the r7 w10b
    stddev bug (hash parity at sf0.01 can sit below the amplification
    threshold for rounds)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = df.agg(F.expr(f"percentile(x, {p!r})").alias("q")).collect()[0]["q"]
    want = _spark_percentile_ref(values, p)
    assert got == want, (got, want, values, p)

    # and the oracle side: DuckDB quantile_cont on the same rows agrees
    # after the catalog's 4-decimal round (the hash contract a8 rides)
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    oracle = con.execute(
        f"SELECT quantile_cont(x, {p!r}) FROM t"
    ).fetchone()[0]
    assert round(got, 4) == round(oracle, 4), (got, oracle, values, p)


def _ntile_ref(n: int, k: int) -> list[int]:
    """SQL-standard ntile over a partition of n ordered rows: the first
    n % k buckets get floor(n/k)+1 rows, the rest floor(n/k) — the
    boundary layout both Spark and DuckDB implement (what makes the p13
    oracle hash-match when the ORDER is deterministic)."""
    base, extra = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (base + (1 if b <= extra else 0)))
    return out


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 23), min_size=1, max_size=4),
    k=st.sampled_from([2, 3, 5, 7]),
    dup_every=st.integers(1, 5),
)
def test_ntile_boundaries_match_reference(spark, sizes, k, dup_every):
    """p13's bucket assignment (ntile over (ppl, id) per language) must
    match the pure-Python ntile layout for every partition size — n not
    divisible by k, singleton partitions, k > n — and stay deterministic
    under heavy ppl TIES (every dup_every-th row shares a value), where
    only the id tie-break pins which row lands each boundary."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = []
    for li, n in enumerate(sizes):
        for i in range(n):
            # duplicated scores force the id tie-break to decide buckets
            rows.append((f"L{li}", li * 1000 + i, float((i // dup_every) * 7)))
    df = spark.createDataFrame(rows, "lang string, id long, ppl double")
    w = Window.partitionBy("lang").orderBy("ppl", "id")
    got = {
        (r["lang"], r["id"]): r["b"]
        for r in df.select(
            "lang", "id", F.ntile(k).over(w).alias("b")
        ).collect()
    }
    for li, n in enumerate(sizes):
        ordered = sorted(
            ((float((i // dup_every) * 7), li * 1000 + i) for i in range(n))
        )
        layout = _ntile_ref(n, k)
        for (ppl, rid), want in zip(ordered, layout):
            assert got[(f"L{li}", rid)] == want, (li, rid, n, k)

    # oracle side: DuckDB's ntile over the same deterministic order
    import duckdb
    import pandas as pd  # noqa: F811

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["lang", "id", "ppl"]))
    for lang, rid, b in con.execute(
        f"SELECT lang, id, ntile({k}) OVER "
        "(PARTITION BY lang ORDER BY ppl, id) FROM t"
    ).fetchall():
        assert got[(lang, rid)] == b, (lang, rid)


# gap deltas hugging the session threshold: exactly the gap, one
# microsecond either side, and sub-microsecond jitter near day
# boundaries — the stitch decision (local new-session flags + boundary
# heal) must agree with the plain window's gap comparison on every one,
# including where the double cast of a 2024 epoch can no longer
# represent the microsecond exactly
_GAP = 1800


@settings(max_examples=10, deadline=None)
@given(
    deltas=st.lists(
        st.sampled_from(
            [
                _GAP * 1_000_000 - 1,
                _GAP * 1_000_000,
                _GAP * 1_000_000 + 1,
                1_000_000,
                86_400_000_000 - _GAP * 1_000_000,
                43_200_000_000,
            ]
        ),
        min_size=1,
        max_size=14,
    ),
    start_us=st.sampled_from([0, 1, 86_399_999_999, 43_200_000_000]),
)
def test_sessionize_gap_threshold_ulp(spark, deltas, start_us):
    """g1b's prefix-sum stitching vs the plain window on gap deltas at
    EXACTLY the threshold ±1 µs, with sessions engineered to straddle
    day-bucket boundaries: both forms cast ts to double epoch seconds,
    so the decision must come out identical even where that cast rounds
    the microsecond."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import sessionize

    t = datetime(2024, 6, 1) + timedelta(microseconds=start_us)
    rows, acc = [], t
    for i, d in enumerate([0] + deltas):
        acc = acc + timedelta(microseconds=d)
        rows.append((i, acc, 1, "e", 0.0))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    plain = sessionize(ev, "user_id", "ts", _GAP, "event_id")
    chunked = sessionize(ev, "user_id", "ts", _GAP, "event_id", bucket="day")
    key = lambda r: (r["event_id"], r["session_id"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, chunked.collect())
    )


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),                      # key
            st.floats(-1e3, 1e3, allow_nan=False),  # value
        ),
        min_size=1,
        max_size=60,
    ),
    alpha=st.sampled_from([1.0, 0.9, 0.5, 0.1, 0.01]),
)
def test_ewma_matches_sequential_reference(spark, rows, alpha):
    """The blocked-scan EWMA must match the sequential recurrence
    y_i = a·x_i + (1-a)·y_{i-1} (pandas ewm(adjust=False)) to fp
    tolerance on arbitrary keys/values/decays — including block
    boundaries, which the small block size forces constantly here."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import ewma

    t0 = datetime(2024, 6, 1)
    ev = spark.createDataFrame(
        [
            (i, t0 + timedelta(seconds=i), k, "e", float(v))
            for i, (k, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma(ev, "user_id", "ts", "event_id", "value", alpha).collect()
    }
    # sequential reference
    state: dict = {}
    for i, (k, v) in enumerate(rows):
        state[k] = alpha * v + (1 - alpha) * state.get(k, 0.0)
        assert abs(got[i] - round(state[k], 6)) <= 1e-6 + 1e-9 * abs(state[k]), (
            i, k, alpha, got[i], state[k]
        )


def test_ewma_long_series_stability(spark):
    """5000 rows on one key at d=0.5 — the naive scaled-prefix-sum
    rewrite overflows d^-j after ~1000 rows; the blocked scan must stay
    finite and match the recurrence at the tail."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import ewma

    t0 = datetime(2024, 6, 1)
    n, alpha = 5000, 0.5
    vals = [float((i * 37) % 101) for i in range(n)]
    ev = spark.createDataFrame(
        [
            (i, t0 + timedelta(seconds=i), 1, "e", vals[i])
            for i in range(n)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma(ev, "user_id", "ts", "event_id", "value", alpha).collect()
    }
    y = 0.0
    for i in range(n):
        y = alpha * vals[i] + (1 - alpha) * y
    assert math.isfinite(got[n - 1])
    assert abs(got[n - 1] - y) <= 1e-6 + 1e-9 * abs(y)


@settings(max_examples=15, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 10_000), min_size=1, max_size=12),
    budget_frac=st.sampled_from([0.0, 0.2, 0.5, 0.9, 1.0, 1.5]),
    cap_frac=st.sampled_from([None, 0.1, 0.4, 1.0]),
)
def test_fair_token_allocation_matches_waterfill(spark, sizes, budget_frac, cap_frac):
    """The closed-form windowed allocation equals the sequential
    water-filling reference for arbitrary domain sizes, budgets (under-
    and over-subscribed), and caps: allocations sum to min(budget, Σm),
    saturated domains get exactly min(size, cap), unsaturated ones an
    equal waterline."""
    from ixmp_spark.operators.sampling import fair_token_allocation

    total = sum(sizes)
    budget = budget_frac * total
    cap = cap_frac * total if cap_frac is not None else None
    rows = [(f"d{i:02d}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "domain string, tok long")
    got = {
        r["domain"]: (r["alloc"], r["saturated"])
        for r in fair_token_allocation(
            df, "domain", "tok", budget=budget, cap=cap
        ).collect()
    }
    # sequential water-filling reference (bisect the waterline)
    m = {d: min(s, cap) if cap is not None else float(s) for d, s in rows}
    lo, hi = 0.0, max(m.values()) if m else 0.0
    if sum(m.values()) <= budget:
        ref = dict(m)
    else:
        for _ in range(200):
            mid = (lo + hi) / 2
            if sum(min(v, mid) for v in m.values()) > budget:
                hi = mid
            else:
                lo = mid
        ref = {d: min(v, lo) for d, v in m.items()}
    assert set(got) == set(ref)
    for d in ref:
        assert abs(got[d][0] - ref[d]) < 1e-3, (d, got[d], ref[d], budget, cap)
        assert got[d][1] == (got[d][0] >= round(m[d], 4)), d
    assert abs(
        sum(a for a, _ in got.values()) - min(budget, sum(m.values()))
    ) < 1e-2


@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            # tiny integer grids force heavy x/y collisions — the tie
            # and duplicate-point edges — while floats exercise bucket
            # boundary arithmetic
            st.one_of(
                st.integers(-3, 3).map(float),
                st.floats(-100, 100, allow_nan=False),
            ),
            st.one_of(
                st.integers(-3, 3).map(float),
                st.floats(-100, 100, allow_nan=False),
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    buckets=st.sampled_from([1, 3, 256]),
)
def test_pareto_frontier_matches_brute_force(spark, pts, buckets):
    """pareto_frontier's bucketed prefix-max reduction equals the
    O(n²) strict-dominance definition for ANY point set and ANY bucket
    count — the property form of the skyline contract (collision-heavy
    grids hit the tie/duplicate paths, floats the bucket-edge math)."""
    from ixmp_spark.operators.sampling import pareto_frontier

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {
        r["id"]
        for r in pareto_frontier(df, "x", "y", buckets=buckets).collect()
        if r["on_frontier"]
    }
    expect = {
        i
        for i, x, y in rows
        if not any(
            bx >= x and by >= y and (bx > x or by > y)
            for j, bx, by in rows
            if j != i
        )
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),        # key
            st.integers(0, 2000),     # hour offset (spans many days)
            st.integers(-8, 8),       # dyadic value numerator (x/4)
        ),
        min_size=1,
        max_size=80,
    ),
    bucket=st.sampled_from(["day", "week"]),
)
def test_cusum_chunked_equals_plain_bit_exact(spark, rows, bucket):
    """cusum_changepoints(bucket=...) equals the plain whole-key form
    BIT-exactly on dyadic grids with a fixed dyadic baseline — the
    aggregate-carry decomposition (C_b, D_b) is exact arithmetic
    there, so any disagreement is a logic bug, not float noise.
    Random hour offsets scatter rows across bucket boundaries,
    including multi-day silent gaps and single-row buckets."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import cusum_changepoints

    t0 = datetime(2024, 1, 1)
    data = [
        (i, t0 + timedelta(hours=h), k, n * 0.25)
        for i, (k, h, n) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, value double"
    )
    kw = dict(order_cols=("event_id",), baseline=(0.0, 0.5))
    # hot_rows_threshold=1: every key routes through the CHUNKED core,
    # so the decomposition math itself is what's being compared
    plain = {
        r["event_id"]: (r["cusum_high"], r["cusum_low"], r["is_change"])
        for r in cusum_changepoints(
            ev, "user_id", "ts", "value", **kw
        ).collect()
    }
    chunked = {
        r["event_id"]: (r["cusum_high"], r["cusum_low"], r["is_change"])
        for r in cusum_changepoints(
            ev, "user_id", "ts", "value", bucket=bucket,
            hot_rows_threshold=1, **kw
        ).collect()
    }
    assert chunked == plain
    # and with a mid threshold the hot/cold ROUTER must still agree
    routed = {
        r["event_id"]: (r["cusum_high"], r["cusum_low"], r["is_change"])
        for r in cusum_changepoints(
            ev, "user_id", "ts", "value", bucket=bucket,
            hot_rows_threshold=10, **kw
        ).collect()
    }
    assert routed == plain


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),                  # key
            st.integers(-4, 4).map(float),      # value (heavy ties)
            st.sampled_from([0.0, 0.5, 1.0, 3.0]),  # weight (incl. 0)
        ),
        min_size=1,
        max_size=40,
    ),
    q=st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99, 1.0]),
)
def test_weighted_percentile_matches_replay(spark, rows, q):
    """weighted_percentile equals the cumulative-crossing definition
    replayed in Python under heavy value ties, zero weights, and edge
    quantiles — the smallest value whose cumulative weight reaches
    q*total, independent of tie order (keys whose total weight is 0
    have no crossing and yield NULL)."""
    from ixmp_spark.operators.sessions import weighted_percentile

    df = spark.createDataFrame(
        [(k, v, w) for k, v, w in rows], "k long, v double, w double"
    )
    got = {r["k"]: r for r in
           weighted_percentile(df, "k", "v", "w", (q,)).collect()}
    col = f"wp_{str(q).replace('.', '_')}"
    by_key: dict[int, list] = {}
    for k, v, w in rows:
        by_key.setdefault(k, []).append((v, w))
    for k, vals in by_key.items():
        tot = sum(w for _, w in vals)
        want = None
        cum = 0.0
        for v, w in sorted(vals):
            cum += w
            if cum >= q * tot:
                want = v
                break
        if tot == 0:
            # all-zero weights: cum >= 0 crosses immediately at the
            # smallest value — the operator keeps rows with w >= 0
            want = min(v for v, _ in vals)
        assert got[k][col] == want, (k, q, got[k][col], want)


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 500_000),                   # second offset
            st.floats(-50, 50, allow_nan=False),       # value
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    step=st.sampled_from([60, 3600, 86_400]),
)
def test_resample_ffill_matches_pandas(spark, pts, step):
    """resample_ffill equals pandas resample().mean().ffill() for ANY
    irregular series and grid step — grid extent, bucket means, gap
    carries, and the filled flags all line up."""
    from datetime import datetime, timedelta

    import pandas as pd

    from ixmp_spark.operators.sessions import resample_ffill

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=s), 1, v)
        for i, (s, v) in enumerate(pts)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = (
        resample_ffill(ev, "user_id", "ts", "value", step)
        .orderBy("bucket_ts")
        .collect()
    )
    pdf = pd.DataFrame(
        [(ts, v) for _, ts, _, v in rows], columns=["ts", "v"]
    ).set_index("ts")
    want = pdf.resample(f"{step}s")["v"].mean().ffill()
    assert len(got) == len(want)
    for r, (ts, v) in zip(got, want.items()):
        assert r["bucket_ts"] == ts.to_pydatetime()
        assert abs(r["value"] - round(v, 6)) < 5e-6, (r, v)


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_kendall_tau_bounds_and_antisymmetry(pairs):
    """Property (pins x40's operator): tau_b ∈ [-1, 1] whenever defined,
    and negating y negates tau exactly (C and D swap). Spark-free
    replay of the operator's cell arithmetic."""
    from collections import Counter

    def tau_parts(pts):
        cells = Counter(pts)
        items = sorted(cells.items())
        C = D = 0
        for i, ((x1, y1), c1) in enumerate(items):
            for (x2, y2), c2 in items[i + 1:]:
                if x2 == x1:
                    continue
                d = (y2 - y1) * (x2 - x1)
                if d > 0:
                    C += c1 * c2
                elif d < 0:
                    D += c1 * c2
        n = len(pts)
        n0 = n * (n - 1) // 2
        tx = Counter(x for x, _ in pts)
        ty = Counter(y for _, y in pts)
        n1 = sum(t * (t - 1) // 2 for t in tx.values())
        n2 = sum(t * (t - 1) // 2 for t in ty.values())
        den = ((n0 - n1) * (n0 - n2)) ** 0.5
        return C, D, (C - D) / den if den > 0 else None

    C, D, tau = tau_parts(pairs)
    Cn, Dn, taun = tau_parts([(x, -y) for x, y in pairs])
    assert (Cn, Dn) == (D, C)
    if tau is not None:
        assert -1.0000001 <= tau <= 1.0000001
        assert abs(taun + tau) < 1e-12


@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=60))
@settings(max_examples=25, deadline=None)
def test_gini_bounds(values):
    """Property (pins x41's formula): with the rank formula over any
    non-negative values, G ∈ [0, (n−1)/n]; 0 iff all values equal
    (when total > 0)."""
    xs = sorted(values)
    n, tot = len(xs), sum(xs)
    if tot == 0:
        return
    g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (
        n + 1
    ) / n
    assert -1e-9 <= g <= (n - 1) / n + 1e-9
    if len(set(xs)) == 1:
        assert abs(g) < 1e-12


@given(st.lists(st.integers(0, 5), min_size=3, max_size=30))
@settings(max_examples=25, deadline=None)
def test_mann_kendall_antisymmetry(series):
    """Property (pins x42's S): S(series) == -S(reversed series) — the
    pairwise sign statistic is exactly antisymmetric under time
    reversal, ties included."""

    def s_stat(v):
        return sum(
            (v[j] > v[i]) - (v[j] < v[i])
            for i in range(len(v))
            for j in range(i + 1, len(v))
        )

    assert s_stat(series) == -s_stat(series[::-1])


@given(st.lists(st.integers(1, 10**5), min_size=2, max_size=50))
@settings(max_examples=25, deadline=None)
def test_burstiness_bounds(gaps):
    """Property (pins g14's B): population-σ burstiness ∈ [-1, 1) for
    positive gaps, exactly -1 iff all gaps equal."""
    n = len(gaps)
    mu = sum(gaps) / n
    var = sum(g * g for g in gaps) / n - mu * mu
    sd = max(var, 0.0) ** 0.5
    b = (sd - mu) / (sd + mu)
    assert -1.0 - 1e-9 <= b < 1.0
    if len(set(gaps)) == 1:
        assert abs(b + 1.0) < 1e-9
