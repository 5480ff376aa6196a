"""Scale-operator tests: salted joins match plain joins; bucketed tables
eliminate the join exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ixmp_spark.operators.scale import bucket_table, exchange_count, salted_join
from ixmp_spark.queries import load


def test_salted_join_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").agg(
        F.count(F.lit(1)), F.round(F.sum("l_quantity"), 2)
    ).collect()
    salted = salted_join(li, o, "l_orderkey", salt=4).agg(
        F.count(F.lit(1)), F.round(F.sum("l_quantity"), 2)
    ).collect()
    assert plain == salted


def test_salted_join_left_outer(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    users = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
        .where(F.col("user_id") < 50)
    )
    plain = ev.join(users, "user_id", "left").count()
    salted = salted_join(ev, users, "user_id", salt=3, how="left").count()
    assert plain == salted == ev.count()


def test_salted_join_rejects_outer(spark, sf_dir):
    """Salting replicates the right side — right/full outer would emit
    salt× duplicate null-padded rows, so those modes must raise."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    for how in ("right", "outer", "full"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(li, o, "l_orderkey", how=how)


def test_jaccard_block_guard(spark):
    """d2's operator fails fast on oversized blocks instead of silently
    running an n² self-join."""
    from ixmp_spark.operators.dedup import jaccard_block_pairs

    df = spark.range(40).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 30 THEN 'en' ELSE 'de' END AS lang",
        "'web' AS source",
        "concat('tok', CAST(id % 7 AS STRING), ' shared words here') AS text",
    )
    with pytest.raises(ValueError, match="blocks over max_block"):
        jaccard_block_pairs(
            df, "doc_id", "text", ["lang", "source"], max_block=20
        )
    # under the bound it runs; pairs stay within blocks
    out = jaccard_block_pairs(
        df, "doc_id", "text", ["lang", "source"], threshold=0.9, max_block=50
    )
    rows = out.collect()
    assert all(r.jaccard >= 0.9 for r in rows)
    langs = df.select("doc_id", "lang").toPandas().set_index("doc_id")["lang"]
    assert all(langs[r.id_a] == langs[r.id_b] for r in rows)


def test_cosine_neardup_exact_vs_lsh(spark, sf_dir):
    """e4/e5 invariants: LSH pairs are a subset of the exact pairs with
    identical similarity values, and recall in the high-similarity
    stratum (where near-dup detection actually operates) is high."""
    from ixmp_spark.operators.similarity import (
        cosine_lsh_pairs,
        cosine_neardup_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in cosine_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.3
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in cosine_lsh_pairs(
            emb, "vec_id", "embedding", threshold=0.3, bands=6, bits=6
        ).collect()
    }
    assert set(lsh) <= set(exact)
    assert all(exact[p] == s for p, s in lsh.items())
    # recall where it matters: sign-LSH band-collision probability is
    # (1 - theta/pi)^bits, so high-cosine pairs are recalled reliably
    hot = {p for p, s in exact.items() if s >= 0.8}
    if hot:
        assert len(hot & set(lsh)) / len(hot) >= 0.8

    # guard: exact form refuses oversized inputs
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_rows"):
        cosine_neardup_pairs(emb, "vec_id", "embedding", max_rows=10)


def test_cosine_lsh_banded_shuffle_is_vector_free(spark, sf_dir):
    """VERDICT r2 #3: the banded candidate self-join must carry only
    (id, band, bucket) — vectors are joined back post-dedup from the
    persisted (id, vec) projection, never shipped through the
    rows×bands exchange."""
    from ixmp_spark.operators.similarity import (
        _sign_lsh_banded,
        cosine_lsh_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select(
        F.col("vec_id").alias("__id"), F.col("embedding").alias("__vec")
    )
    planes = [[[1.0] * 8] * 2] * 2
    banded = _sign_lsh_banded(
        vecs.withColumn("__vec", F.slice("__vec", 1, 8)), planes
    )
    assert banded.columns == ["__id", "__band", "__bucket"]

    # the full plan's band-keyed exchanges must not mention the vector col
    out = cosine_lsh_pairs(emb, "vec_id", "embedding", bands=2, bits=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "hashpartitioning(__band" in line:
            assert "__vec" not in line, line

    # empty corpus: empty pairs frame, no probe-job crash (ADVICE r2)
    empty = cosine_lsh_pairs(
        emb.where(F.lit(False)), "vec_id", "embedding"
    )
    assert empty.count() == 0
    assert empty.columns == ["id_a", "id_b", "cosine_sim"]
    # explicit dim skips the probe entirely
    got = cosine_lsh_pairs(
        emb, "vec_id", "embedding", threshold=0.99, dim=64
    )
    assert got.columns == ["id_a", "id_b", "cosine_sim"]


def test_multi_probe_recall_monotonic(spark, sf_dir):
    """bucketed_topk's multi_probe knob: candidates grow with m, and the
    top-k converges toward the exact answer (m = n_planes is exact)."""
    import random

    from ixmp_spark.operators.similarity import brute_force_topk, bucketed_topk

    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    emb = load(spark, sf_dir, "embeddings")
    probe = emb.orderBy("vec_id").limit(1)
    exact = {r.vec_id for r in brute_force_topk(
        emb, probe, "vec_id", "embedding", k=10).collect()}
    recalls = []
    for m in (0, 2, 4):
        got = {r.vec_id for r in bucketed_topk(
            emb, probe, "vec_id", "embedding", planes, k=10, multi_probe=m
        ).collect()}
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls)  # non-decreasing in m
    assert recalls[-1] == 1.0  # m = n_planes probes every bucket


def test_bucketed_join_no_exchange(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bucket_table(li, spark, "b_lineitem", "l_orderkey", buckets=8)
    bucket_table(o, spark, "b_orders", "o_orderkey", buckets=8)
    bl = spark.table("b_lineitem")
    bo = spark.table("b_orders")
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        n_exchange = exchange_count(joined)
        plain = load(spark, sf_dir, "lineitem").join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert exchange_count(plain) >= 2  # both sides shuffle
        assert n_exchange == 0  # co-located: no exchange at all
        assert joined.count() == plain.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with n_probe=4/8 clusters must recover most of the exact
    top-10 (and n_probe=n_clusters recovers it fully)."""
    from ixmp_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    probe = emb.orderBy("vec_id").limit(1)
    exact = {
        r["vec_id"]
        for r in brute_force_topk(emb, probe, "vec_id", "embedding", k=10).collect()
    }
    full = {
        r["vec_id"]
        for r in ivf_topk(
            emb, probe, "vec_id", "embedding", n_clusters=8, n_probe=8, k=10
        ).collect()
    }
    assert full == exact  # degenerate IVF == exact search
    approx = {
        r["vec_id"]
        for r in ivf_topk(
            emb, probe, "vec_id", "embedding", n_clusters=8, n_probe=4, k=10
        ).collect()
    }
    assert len(approx & exact) >= 5  # recall ≥ 0.5 at half the clusters


def test_concurrent_catalog_updates(spark, tmp_path):
    """Advisory-locked read-modify-write: parallel unit registrations from
    multiple processes all survive (no lost updates)."""
    import subprocess
    import sys

    root = str(tmp_path / "wh")
    from ixmp_spark.sources.warehouse import LocalWarehouse

    LocalWarehouse(root)  # init catalog
    script = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from ixmp_spark.sources.warehouse import LocalWarehouse\n"
        f"wh = LocalWarehouse({root!r})\n"
        "import sys\n"
        "u = sys.argv[1]\n"
        "for i in range(20):\n"
        "    wh.update_catalog(lambda c, u=u, i=i: c['units'].append(f'{u}-{i}')\n"
        "        if f'{u}-{i}' not in c['units'] else None)\n"
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", script, f"p{k}"])
        for k in range(4)
    ]
    assert all(p.wait() == 0 for p in procs)
    units = LocalWarehouse(root).catalog()["units"]
    assert len(units) == 80  # 4 procs x 20 units, none lost


def test_concurrent_commits_same_run(spark, tmp_path):
    """Per-run commit lock: parallel committers on the SAME run serialize
    — every commit lands (counter == total), the final snapshot is one
    writer's complete table set (never a mix), and each commit left an
    addressable history snapshot."""
    import subprocess
    import sys

    root = str(tmp_path / "wh")
    from ixmp_spark.sources.warehouse import FACT_TABLES, LocalWarehouse, _empty

    wh = LocalWarehouse(root)
    rid, _ = wh.new_run("m", "s")
    import textwrap

    script_path = tmp_path / "committer.py"
    script_path.write_text(textwrap.dedent(
        """
        import sys
        sys.path.insert(0, '/root/repo')
        import pandas as pd
        from ixmp_spark.sources.warehouse import FACT_TABLES, LocalWarehouse, _empty

        root, rid, tag = sys.argv[1], int(sys.argv[2]), sys.argv[3]
        wh = LocalWarehouse(root)
        for i in range(5):
            tables = {t: _empty(t) for t in FACT_TABLES}
            tables['set_data'] = pd.DataFrame(
                {'run_id': rid, 'name': 'i',
                 'key': [[f'{tag}-{i}-{j}'] for j in range(50)],
                 'comment': tag})
            wh.commit_run(rid, tables, {}, comment=f'{tag}-{i}')
        """
    ))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script_path), root, str(rid), f"w{k}"]
        )
        for k in range(3)
    ]
    assert all(p.wait() == 0 for p in procs)
    cat = wh.catalog()["runs"][str(rid)]
    assert cat["commit"] == 15  # 3 writers x 5 commits, none lost
    final = wh.read_table(rid, "set_data")
    # complete single-writer snapshot: all 50 rows share one (tag, i)
    tags = {(k[0].rsplit("-", 1)[0]) for k in final["key"]}
    assert len(final) == 50 and len(tags) == 1
    assert len(wh.commit_history(rid)) == 15


def test_engine_e2e_at_bench_scale(spark, tmp_path):
    """Engine end-to-end on the bench table: a 600k-row parameter built
    from lineitem at sf0.1 through add_par_bulk (large index set →
    broadcast-join validation path), then the filter contract and
    named-view reads on top."""
    import os

    from pyspark.sql import functions as F

    from ixmp_spark.core import Platform, Scenario

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = load(spark, sf_dir, "lineitem")
    mp = Platform(spark, str(tmp_path / "wh_scale"))
    mp.add_unit("qty")
    scen = Scenario(mp, "tpch", "lineitem", version="new")
    scen.init_set("orderkey")
    orderkeys = [
        str(r[0]) for r in li.select("l_orderkey").distinct().collect()
    ]
    scen.add_set("orderkey", orderkeys)
    scen.init_set("linenumber")
    scen.add_set("linenumber", [str(i) for i in range(1, 8)])
    scen.init_par(
        "qty", idx_sets=["orderkey", "linenumber"],
        idx_names=["orderkey", "linenumber"],
    )
    src = li.select(
        F.col("l_orderkey").cast("string").alias("orderkey"),
        F.col("l_linenumber").cast("string").alias("linenumber"),
        F.col("l_quantity").alias("value"),
    )
    scen.add_par_bulk("qty", src, unit="qty", assume_unique=True)
    scen.commit("lineitem as parameter")

    assert len(scen.par("qty")) == li.count()
    one_order = scen.par("qty", filters={"orderkey": [orderkeys[0]]})
    expect = li.where(
        F.col("l_orderkey") == int(orderkeys[0])
    ).count()
    assert len(one_order) == expect
    # silent-ignore contract at scale
    both = scen.par(
        "qty", filters={"orderkey": [orderkeys[0], "no-such-key"]}
    )
    assert len(both) == expect


def test_sketch_accuracy(spark, sf_dir):
    """approx_count_distinct within its rsd bound of the exact count;
    approx_percentile within 2% of the exact median."""
    rows = {
        r["l_returnflag"]: r
        for r in __import__("ixmp_spark.queries", fromlist=["QUERIES"])
        .QUERIES["x1_sketches"](spark, sf_dir)
        .collect()
    }
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem")
    exact_med = {
        r["l_returnflag"]: r["m"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
        .collect()
    }
    for flag, r in rows.items():
        assert abs(r["approx_orders"] - r["exact_orders"]) <= max(
            5, 0.06 * r["exact_orders"]
        )
        assert abs(r["approx_median_price"] - exact_med[flag]) <= 0.02 * exact_med[flag]


def test_simhash_properties(spark, sf_dir):
    """SimHash: deterministic across runs; identical texts → identical
    fingerprints; near-identical texts → small Hamming distance."""
    from pyspark.sql import functions as F

    from ixmp_spark.operators.dedup import simhash64

    docs = load(spark, sf_dir, "documents").limit(50)
    a = docs.select("doc_id", simhash64("text").alias("h")).toPandas()
    b = docs.select("doc_id", simhash64("text").alias("h")).toPandas()
    assert a.sort_values("doc_id")["h"].tolist() == b.sort_values("doc_id")["h"].tolist()

    # a doc vs itself with one appended token: small Hamming distance
    one = docs.limit(1).select(F.col("text"))
    pair = one.select(
        simhash64(F.col("text")).alias("h1"),
        simhash64(F.concat(F.col("text"), F.lit(" extra"))).alias("h2"),
    ).collect()[0]
    ham = bin(pair["h1"] ^ pair["h2"]).count("1")
    assert ham <= 16  # near-dup territory on a 64-bit fingerprint


def test_add_par_bulk_distributed_path(spark, tmp_path):
    """distributed=True keeps the merge + write Spark-side (directory
    table) and upserts per key correctly."""
    import os

    from pyspark.sql import functions as F

    from ixmp_spark.core import Platform, Scenario

    mp = Platform(spark, str(tmp_path / "whd"))
    mp.add_unit("u")
    scen = Scenario(mp, "m", "s", version="new")
    scen.init_set("k")
    scen.add_set("k", [str(i) for i in range(100)])
    scen.init_par("p", idx_sets=["k"])
    src = spark.range(100).selectExpr("cast(id as string) k", "cast(id as double) value")
    scen.add_par_bulk("p", src, unit="u", distributed=True)
    scen.commit("v1")
    assert os.path.isdir(mp.wh.table_path(scen.run_id, "par_data"))
    assert len(scen.par("p")) == 100
    # distributed upsert overwrites overlapping keys
    scen.check_out()
    upd = spark.range(10).selectExpr("cast(id as string) k", "cast(999 as double) value")
    scen.add_par_bulk("p", upd, unit="u", distributed=True)
    scen.commit("v2")
    p = scen.par("p")
    assert len(p) == 100
    assert (p.set_index("k").loc[[str(i) for i in range(10)], "value"] == 999).all()


def test_dedup_segments_order_preserving(spark):
    """dedup_segments keeps FIRST occurrences in original order (the
    cross-engine query t5 canonicalizes; this pins the real behavior)."""
    from ixmp_spark.operators.text import dedup_segments, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("b a b c a",)], "text string")
    got = df.select(dedup_segments("text", sep=" ").alias("t")).collect()[0]["t"]
    assert got == "b a c"
    red = spark.createDataFrame(
        [("mail me at jo@example.com or https://x.org/page id 123456789",)],
        "text string",
    )
    out = red.select(redact_pii("text").alias("t")).collect()[0]["t"]
    assert out == "mail me at <EMAIL> or <URL> id <NUM>"


def test_asof_join_semantics(spark):
    """Union-sort as-of: inclusive time bound, max-tie_break at equal
    right times, and inner semantics (left rows before any right row of
    their key are dropped)."""
    from ixmp_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u1", 10), (2, "u1", 5), (3, "u1", 2), (4, "u2", 10)],
        "event_id long, user string, t long",
    )
    right = spark.createDataFrame(
        # u1: two rows at t=5 (tie -> max rk wins), one at t=3
        [("u1", 5, 100), ("u1", 5, 101), ("u1", 3, 50), ("u3", 1, 999)],
        "key string, rt long, rk long",
    )
    got = {
        r.event_id: r.rk
        for r in asof_join(
            left, right,
            left_id="event_id", left_on="user", right_on="key",
            left_time="t", right_time="rt", tie_break="rk",
        ).collect()
    }
    assert got[1] == 101  # latest rt=5, tie broken by max rk
    assert got[2] == 101  # inclusive: rt == t qualifies
    assert 3 not in got  # t=2 precedes every u1 right row -> dropped
    assert 4 not in got  # u2 has no right rows at all -> dropped


def test_winnow_fingerprints(spark):
    """Winnowing invariants: near-identical docs overlap heavily,
    unrelated docs don't; deterministic; degenerate lengths safe."""
    from ixmp_spark.operators.dedup import (
        fingerprint_overlap,
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy cat tonight"),
            (3, "entirely unrelated content about spark query planning"),
            (4, "tiny"),          # shorter than k -> no fingerprints
            (5, "sixchar"),       # >= k but < one window -> global min only
            (6, ""),
        ],
        "id long, text string",
    )
    fp = df.select("id", winnow_fingerprints("text", k=5, w=4).alias("fp"))
    rows = {r.id: list(r.fp) for r in fp.collect()}
    assert rows[4] == [] and rows[6] == []
    assert len(rows[5]) == 1
    assert rows[1] == sorted(set(rows[1]))  # distinct + sorted
    # determinism
    again = {r.id: list(r.fp) for r in fp.collect()}
    assert rows == again
    pairs = (
        fp.alias("a")
        .crossJoin(fp.alias("b"))
        .where("a.id < b.id AND size(a.fp) > 0 AND size(b.fp) > 0")
        .select(
            F.col("a.id").alias("ia"), F.col("b.id").alias("ib"),
            fingerprint_overlap(F.col("a.fp"), F.col("b.fp")).alias("ov"),
        )
    )
    ov = {(r.ia, r.ib): r.ov for r in pairs.collect()}
    assert ov[(1, 2)] > 0.8      # one word changed -> heavy overlap
    assert ov[(1, 3)] < 0.1      # unrelated -> (near) zero


def test_minhash_lsh_vs_spark_ml(spark, sf_dir):
    """External validity: the custom Catalyst MinHash-LSH finds the same
    strong near-duplicate pairs as Spark ML's MinHashLSH over identical
    shingle sets (and both are validated against exact Jaccard)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from ixmp_spark.operators.dedup import minhash_lsh_neardup, shingles

    docs = load(spark, sf_dir, "documents").limit(300)
    # ground truth: exact shingle-Jaccard >= 0.7 over all pairs
    sh = docs.select("doc_id", shingles("text", 3).alias("sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb"))
    truth = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .where((F.col("id_a") < F.col("id_b")) & (jac >= 0.7))
        .collect()
    }
    # ours
    ours = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_neardup(
            docs, "doc_id", "text", k=32, bands=8, n=3, threshold=0.7
        ).collect()
    }
    # Spark ML: CountVectorizer on the same shingles -> MinHashLSH join
    cv = CountVectorizer(inputCol="sh", outputCol="vec", binary=True)
    model = cv.fit(sh)
    vecs = model.transform(sh)
    mh = MinHashLSH(inputCol="vec", outputCol="hashes", numHashTables=8,
                    seed=42).fit(vecs)
    ml = {
        (min(r.ida, r.idb), max(r.ida, r.idb))
        for r in mh.approxSimilarityJoin(vecs, vecs, 0.3)
        .selectExpr(
            "datasetA.doc_id AS ida", "datasetB.doc_id AS idb"
        )
        .where("ida < idb")
        .collect()
    }
    assert truth, "fixture should contain near-duplicate documents"
    # both detectors recover the exact truth set (ours exactly: LSH
    # candidates are verified with exact Jaccard; ML's join distance is
    # exact Jaccard too, after approximate candidate generation)
    assert ours == truth
    assert ml == truth


def test_decontaminate_removes_exactly_contaminated(spark, sf_dir):
    """decontaminate = train MINUS contaminated_ids; a doc duplicated
    across the split must be flagged, and clean + contaminated partitions
    the train set."""
    from ixmp_spark.operators.dedup import contaminated_ids, decontaminate

    docs = load(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    bad = contaminated_ids(train, bench, "doc_id", "text", n=4)
    clean = decontaminate(train, bench, "doc_id", "text", n=4)
    n_train, n_bad, n_clean = train.count(), bad.count(), clean.count()
    assert n_clean == n_train - n_bad
    # a benchmark doc injected verbatim into train must be caught
    planted = train.unionByName(
        bench.limit(1).withColumn("doc_id", F.lit(999_999))
    )
    flagged = contaminated_ids(planted, bench, "doc_id", "text", n=4)
    assert flagged.where(F.col("doc_id") == 999_999).count() == 1
    # and every shared gram of the plant is counted (>= 1)
    assert (
        flagged.where(F.col("doc_id") == 999_999).first()["n_shared_grams"] >= 1
    )


def test_storage_level_passthrough(spark, sf_dir):
    """The LSH/shingle persists honor the storage_level knob (cluster
    runs over wide embeddings/shingles choose DISK_ONLY)."""
    from pyspark import StorageLevel

    from ixmp_spark.operators.dedup import minhash_lsh_neardup
    from ixmp_spark.operators.similarity import cosine_lsh_pairs

    docs = load(spark, sf_dir, "documents").limit(50)
    emb = load(spark, sf_dir, "embeddings").limit(50)
    sc = spark.sparkContext
    # baseline: earlier tests' localCheckpoint RDDs survive clearCache
    # until GC'd, so attribute storage levels to NEW ids only
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    minhash_lsh_neardup(
        docs, "doc_id", "text", storage_level=StorageLevel.DISK_ONLY
    ).count()
    cosine_lsh_pairs(
        emb, "vec_id", "embedding",
        storage_level=StorageLevel.DISK_ONLY,
    ).count()
    levels = {
        str(i.storageLevel().description())
        for i in sc._jsc.sc().getRDDStorageInfo()
        if i.id() not in before
    }
    assert levels, "expected newly persisted frames"
    assert all("Memory" not in lv for lv in levels), levels
    spark.catalog.clearCache()


def test_decontaminate_plan_shape(spark, sf_dir):
    """VERDICT r2 #4 follow-up: the train corpus is gram-hashed exactly
    once — its anti-join appearance is a plain pruned scan — and the
    contaminated-id set broadcasts into the anti-join. Also: passing a
    precomputed ``bad`` frame skips recomputing the gram join."""
    from ixmp_spark.operators.dedup import contaminated_ids, decontaminate

    docs = load(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    clean = decontaminate(train, bench, "doc_id", "text", n=4)
    plan = clean._jdf.queryExecution().executedPlan().toString()
    # one shingle computation per corpus: since the r15 let-bound
    # shingles() the tokenization (and its normalize_text
    # regexp_replace) appears exactly ONCE per shingle site — the
    # pre-r15 expression inlined it twice (split + size), i.e. 4
    # occurrences for the 2 sites (train grams + bench grams); a
    # duplicated train shingle subtree would push this to 4+
    assert plan.count("regexp_replace") == 2, plan.count("regexp_replace")
    assert "LeftAnti" in plan and "BroadcastExchange" in plan

    bad = contaminated_ids(train, bench, "doc_id", "text", n=4)
    reused = decontaminate(train, bench, "doc_id", "text", bad=bad)
    assert reused.count() == clean.count()


def test_drop_common_spans_semantics(spark):
    """Cross-doc span removal: a chunk shared by >= min_docs docs is
    deleted from every doc; unique chunks survive in original order;
    a fully-boilerplate doc comes back empty (not missing)."""
    from ixmp_spark.operators.dedup import drop_common_spans

    boiler = "standard license header all rights reserved by corp"  # 8 toks
    df = spark.createDataFrame(
        [
            (1, boiler + " unique body of document one here now ok"),
            (2, boiler + " another totally different body text for two"),
            (3, boiler),  # nothing but the shared chunk
            (4, "entirely original content with no shared spans at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in drop_common_spans(
            df, "doc_id", "text", w=8, min_docs=2
        ).collect()
    }
    assert out[1].n_dropped == 1 and out[1].new_text.startswith("unique body")
    assert out[2].n_dropped == 1 and "another" in out[2].new_text
    assert out[3].n_dropped == 1 and out[3].new_text == ""
    assert out[4].n_dropped == 0 and out[4].n_chunks == 2
    assert all(r.n_chunks >= r.n_dropped for r in out.values())


def test_dedup_clusters_components(spark):
    """Min-label propagation finds exact connected components, including
    a chain (diameter > 1) and isolated pairs; non-edge docs absent."""
    from ixmp_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        # component {1,2,3,4} as a chain, component {10,11}
        [(1, 2), (2, 3), (3, 4), (10, 11)],
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    with pytest.raises(RuntimeError, match="converge"):
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "id_a long, id_b long"
        )
        dedup_clusters(chain, max_iter=2)


def test_dedup_clusters_long_chain(spark):
    """Adversarial diameter: a 1000-link chain (the crawl dup-chain
    pathology from VERDICT r3 #3) converges inside the DEFAULT max_iter
    thanks to pointer doubling — O(log diameter) rounds, not
    O(diameter) — and still labels every node with the component min."""
    from ixmp_spark.operators.dedup import dedup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "id_a long, id_b long"
    )
    out = dedup_clusters(chain)  # default max_iter=25; needs ~10 rounds
    got = out.groupBy("cluster").count().collect()
    assert len(got) == 1
    assert got[0].cluster == 0 and got[0]["count"] == 1001


def test_dedup_clusters_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir swaps localCheckpoint for reliable checkpoint():
    same labels, and checkpoint files actually land in the directory."""
    import os

    from ixmp_spark.operators.dedup import dedup_clusters

    ckpt = str(tmp_path / "ckpt")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r.id: r.cluster
        for r in dedup_clusters(pairs, checkpoint_dir=ckpt).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert os.path.isdir(ckpt) and os.listdir(ckpt)


def test_train_val_split_deterministic_and_sized(spark, sf_dir):
    """The split is a pure function of the key: stable across
    repartitioning, ~val_frac sized, and exhaustive."""
    from ixmp_spark.operators.sampling import train_val_split

    docs = load(spark, sf_dir, "documents")
    s1 = train_val_split(docs, "doc_id", val_frac=0.2)
    s2 = train_val_split(docs.repartition(13), "doc_id", val_frac=0.2)
    a = {r["doc_id"]: r["split"] for r in s1.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in s2.select("doc_id", "split").collect()}
    assert a == b  # layout-independent
    n = len(a)
    n_val = sum(1 for v in a.values() if v == "val")
    assert 0.1 * n < n_val < 0.3 * n  # ~20% within loose tolerance


def test_stratified_sample_rates_and_subset(spark, sf_dir):
    """Kept rows are a subset of the stratum, at roughly the requested
    rate; unlisted strata are dropped entirely."""
    from ixmp_spark.operators.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.0}, "doc_id")
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_en = docs.where(F.col("lang") == "en").count()
    assert by_lang.get("en") == n_en  # rate 1.0 keeps everything
    assert "de" not in by_lang  # rate 0.0 drops everything
    assert set(by_lang) <= {"en"}  # unlisted strata dropped


def test_domain_mix_counts(spark, sf_dir):
    """Output multiplicity equals the domain weight; copy index is 1..w."""
    from ixmp_spark.operators.sampling import domain_mix

    docs = load(spark, sf_dir, "documents")
    mixed = domain_mix(docs, "source", {"src0": 3, "src1": 2})
    base = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, n in base.items():
        want = n * {"src0": 3, "src1": 2}.get(src, 1)
        assert out[src] == want, src
    copies = mixed.where(F.col("source") == "src0").groupBy("copy").count()
    assert {r["copy"] for r in copies.collect()} == {1, 2, 3}


def test_drop_common_spans_skewed_hot_chunk(spark):
    """VERDICT r3 #6: one boilerplate chunk in 50% of a 40k-doc corpus
    (the hot-key pathology for t8's frequency aggregation). Two layers:

    1. Plan shape — the countDistinct is two-phase: map-side (chunk, id)
       dedup + ``partial_count(distinct ...)``, so the ONLY shuffle on
       the hot chunk hash carries one pre-counted row per map partition,
       never the 20k raw occurrences. Asserted from the formatted plan.
    2. End-to-end under skew — correct drops at volume, wall-clock
       bounded far below what a single-task O(hot²) blowup would cost.
    """
    import time

    from ixmp_spark.operators.dedup import drop_common_spans

    n = 40_000
    boiler = "standard license header all rights reserved by corp"  # 8 toks
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        f"""CASE WHEN id % 2 = 0
            THEN concat('{boiler} ', 'unique body marker word tok',
                        CAST(id AS STRING), ' filler pad words')
            ELSE concat('original content fresh piece number tok',
                        CAST(id AS STRING), ' more words')
            END AS text""",
    )
    out = drop_common_spans(docs, "doc_id", "text", w=8, min_docs=2)

    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "partial_count(distinct" in plan, plan

    t0 = time.time()
    agg = out.agg(
        F.sum("n_dropped").alias("nd"),
        F.sum(F.when(F.col("n_dropped") > 0, 1).otherwise(0)).alias("docs_hit"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    elapsed = time.time() - t0
    # every even doc loses exactly the boilerplate chunk; odd docs intact
    assert agg.n == n and agg.nd == n // 2 and agg.docs_hit == n // 2
    assert elapsed < 90, f"skewed drop_common_spans took {elapsed:.1f}s"


def test_dedup_clusters_skewed_star(spark):
    """VERDICT r3 #6: a star component whose center appears in 50% of
    all edges (one label dominating the neighbor join + groupBy). The
    min-aggregation partial-combines the hot node map-side and AQE
    splits any residual skewed join, so the run must stay near the
    uniform cost — asserted as a generous wall-clock bound — and label
    every member with the center's id."""
    import time

    from ixmp_spark.operators.dedup import dedup_clusters

    n = 50_000
    star = spark.range(1, n).selectExpr("0 AS id_a", "id AS id_b")
    # plus an equal volume of uniform 2-cliques so hot edges are 50%
    pairs = star.unionByName(
        spark.range(n, 2 * n).selectExpr(
            "(id * 2) AS id_a", "(id * 2 + 1) AS id_b"
        )
    )
    t0 = time.time()
    out = dedup_clusters(pairs).persist()
    star_rows = out.where(F.col("cluster") == 0).count()
    n_clusters = out.select("cluster").distinct().count()
    elapsed = time.time() - t0
    out.unpersist()
    assert star_rows == n  # center + n-1 leaves
    assert n_clusters == 1 + n  # the star + n uniform pairs
    assert elapsed < 120, f"skewed dedup_clusters took {elapsed:.1f}s"


def test_tfidf_topk_hand_computed(spark):
    """TF-IDF on a 3-doc corpus verified by hand: a corpus-wide term
    scores 0 (ln(3/3)), a doc-unique term scores tf*ln(3); ties break
    lexicographically; rank never exceeds k."""
    import math

    from ixmp_spark.operators.text import tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "apple banana apple common"),
            (2, "banana cherry common"),
            (3, "dates common"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.term): (r.rank, r.score)
        for r in tfidf_topk(df, "doc_id", "text", k=2).collect()
    }
    # doc 1: apple tf=2 df=1 -> 2*ln(3) top; banana tf=1 df=2 -> ln(1.5)
    assert out[(1, "apple")][0] == 1
    assert abs(out[(1, "apple")][1] - round(2 * math.log(3), 6)) < 1e-9
    assert out[(1, "banana")][0] == 2
    # 'common' (df=3) scores ln(1)=0 and loses to any positive score
    assert (1, "common") not in out
    # doc 3: dates is the only positive-score term; common fills rank 2
    assert out[(3, "dates")][0] == 1 and out[(3, "common")][0] == 2
    assert out[(3, "common")][1] == 0.0
    assert all(rank <= 2 for rank, _ in out.values())


def test_tfidf_topk_cache_tf_identical_and_releasable(spark):
    """cache_tf=True (one corpus pass via a persisted TF frame) returns
    the identical result set and attaches exactly one releasable cache
    handle; the default path attaches none."""
    from ixmp_spark.operators import release_cache
    from ixmp_spark.operators.text import tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "apple banana apple common"),
            (2, "banana cherry common"),
            (3, "dates common"),
        ],
        "doc_id long, text string",
    )
    plain = tfidf_topk(df, "doc_id", "text", k=2)
    cached = tfidf_topk(df, "doc_id", "text", k=2, cache_tf=True)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, cached.collect())
    )
    assert release_cache(plain) == 0
    assert release_cache(cached) == 1


def test_bigram_perplexity_semantics(spark):
    """Add-1 bigram LM: a document repeating the corpus's dominant
    pattern scores lower perplexity than off-distribution text; docs
    with <2 tokens are absent; n_bigrams = n_tokens - 1. A hand-checked
    two-doc corpus pins the exact formula."""
    import math

    from ixmp_spark.operators.text import bigram_perplexity

    df = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "a b a b x y z w"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_perplexity(df, "doc_id", "text").collect()}
    assert 3 not in rows  # single token, no bigram
    assert rows[1].n_bigrams == 7 and rows[2].n_bigrams == 7
    assert rows[1].ppl < rows[2].ppl  # in-distribution beats off-
    # hand check doc 1: vocab = {a,b,x,y,z,w,solo} = 7 (doc 3 counts!);
    # corpus counts c(a,b)=6 c(b,a)=4, contexts c(a·)=6 c(b·)=5; doc 1 is
    # (a,b)x4 (b,a)x3 -> P(a,b)=(6+1)/(6+7)=7/13, P(b,a)=(4+1)/(5+7)=5/12
    h = -(4 * math.log(7 / 13) + 3 * math.log(5 / 12)) / 7
    assert abs(rows[1].ppl - round(math.exp(h), 6)) < 1e-6


def test_semantic_dedup_collapses_duplicates(spark):
    """SemDeDup: exact-duplicate vectors collapse to the min-id rep
    across the board, near-orthogonal vectors represent themselves, and
    the max_cluster guard fails fast on a degenerate clustering."""
    from ixmp_spark.operators.similarity import semantic_dedup

    base = [1.0] + [0.0] * 7
    other = [0.0] * 7 + [1.0]
    third = [0.0, 1.0] + [0.0] * 6
    rows = [
        (10, base), (11, base), (12, base),   # identical triple
        (20, other), (21, other),             # identical pair
        (30, third),                          # singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.rep_id
        for r in semantic_dedup(
            df, "vec_id", "embedding", n_clusters=3, threshold=0.99
        ).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}

    with pytest.raises(ValueError, match="max_cluster"):
        semantic_dedup(
            df, "vec_id", "embedding", n_clusters=2, threshold=0.99,
            max_cluster=2,
        )
    with pytest.raises(ValueError, match="n_clusters"):
        semantic_dedup(df, "vec_id", "embedding", n_clusters=1)


def test_lsh_hot_bucket_guard(spark):
    """max_bucket bounds LSH candidate explosion: a corpus where 60% of
    docs are byte-identical puts them all in the same (band, bucket)
    everywhere — m²/2 candidates from one key. on_hot='raise' fails fast
    with the sizes; on_hot='drop' skips the hot buckets but still finds
    near-dup pairs among the benign docs."""
    from ixmp_spark.operators.dedup import minhash_lsh_neardup

    boiler = "identical boilerplate body repeated verbatim across the corpus"
    df = spark.range(100).selectExpr(
        "id AS doc_id",
        f"""CASE WHEN id < 60 THEN '{boiler}'
            WHEN id IN (97, 98) THEN
              'rare nearly duplicated sentence with trailing token shared here'
            ELSE concat('unique document number ', CAST(id AS STRING),
                        ' with entirely distinct words ',
                        CAST(id * 7 AS STRING))
            END AS text""",
    )
    with pytest.raises(ValueError, match="max_bucket"):
        minhash_lsh_neardup(
            df, "doc_id", "text", max_bucket=30, on_hot="raise"
        ).collect()

    # drop mode warns that the short-doc exactness guarantee is
    # forfeited, with the dropped-group count (ADVICE r11)
    with pytest.warns(UserWarning, match=r"removed \d+ hot shingle"):
        kept = minhash_lsh_neardup(
            df, "doc_id", "text", threshold=0.5, max_bucket=30,
            on_hot="drop",
        ).collect()
    got = {(r.id_a, r.id_b) for r in kept}
    assert (97, 98) in got  # benign near-dup pair survives the drop
    assert not any(a < 60 and b < 60 for a, b in got)  # hot group excluded

    with pytest.raises(ValueError, match="on_hot"):
        minhash_lsh_neardup(
            df, "doc_id", "text", max_bucket=30, on_hot="sample"
        ).collect()


def test_cosine_lsh_hot_bucket_guard(spark):
    """e5's vector twin of the LSH stop-bucket guard: duplicated
    embeddings crowd one bucket per band; raise mode fails fast, drop
    mode still recovers pairs among the benign vectors."""
    from ixmp_spark.operators.similarity import cosine_lsh_pairs

    hotvec = [1.0] * 16
    rows = [(i, hotvec) for i in range(60)]
    rows += [(100, [1.0] * 8 + [-1.0] * 8), (101, [1.0] * 8 + [-1.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    with pytest.raises(ValueError, match="max_bucket"):
        cosine_lsh_pairs(
            df, "vec_id", "embedding", threshold=0.9, max_bucket=30
        ).collect()

    kept = cosine_lsh_pairs(
        df, "vec_id", "embedding", threshold=0.9, max_bucket=30,
        on_hot="drop",
    ).collect()
    got = {(r.id_a, r.id_b) for r in kept}
    assert (100, 101) in got
    assert not any(a < 60 and b < 60 for a, b in got)


def test_guard_failfast_does_not_leak_cache(spark):
    """ADVICE r3 discipline extended to the guard paths: when max_block /
    max_bucket raise, the operator's persisted intermediates must not
    stay in the block-manager cache."""
    from ixmp_spark.operators.dedup import (
        jaccard_block_pairs,
        minhash_lsh_neardup,
    )

    df = spark.range(60).selectExpr(
        "id AS doc_id", "'en' AS lang", "'web' AS source",
        "'identical text body shared by every document here' AS text",
    )
    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    with pytest.raises(ValueError, match="max_block"):
        jaccard_block_pairs(
            df, "doc_id", "text", ["lang", "source"], max_block=10
        )
    with pytest.raises(ValueError, match="max_bucket"):
        minhash_lsh_neardup(df, "doc_id", "text", max_bucket=10).collect()
    leaked = [
        i.id() for i in sc._jsc.sc().getRDDStorageInfo()
        if i.id() not in before and i.numCachedPartitions() > 0
    ]
    assert not leaked, f"guard raise leaked cached RDDs: {leaked}"


def test_on_hot_validated_before_persist(spark):
    """ADVICE r4: an invalid on_hot fails at function entry — before any
    intermediate is persisted — even when max_bucket is unset, so a typo
    can never leak a cache or be discovered only on the guarded branch."""
    from ixmp_spark.operators.dedup import lsh_band_pairs, minhash_signature
    from ixmp_spark.operators.similarity import cosine_lsh_pairs

    docs = spark.range(5).selectExpr(
        "id AS doc_id", "concat('text body number ', id) AS text"
    )
    sigs = minhash_signature(docs, "text")
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    with pytest.raises(ValueError, match="on_hot"):
        lsh_band_pairs(sigs, "doc_id", on_hot="typo")  # no max_bucket
    with pytest.raises(ValueError, match="on_hot"):
        cosine_lsh_pairs(vecs, "vec_id", "embedding", on_hot="typo")
    leaked = [
        i.id() for i in sc._jsc.sc().getRDDStorageInfo()
        if i.id() not in before and i.numCachedPartitions() > 0
    ]
    assert not leaked, f"entry validation leaked cached RDDs: {leaked}"


def test_release_cache_frees_operator_caches(spark):
    """ADVICE r4: persist-backed operators attach their cache handles to
    the returned frame; release_cache(out) unpersists them all after the
    caller materializes the result, so long sessions don't accumulate
    MEMORY_AND_DISK frames. Results stay correct (recompute) afterwards."""
    from ixmp_spark.operators import release_cache
    from ixmp_spark.operators.similarity import semantic_dedup
    from ixmp_spark.operators.text import bigram_perplexity

    vecs = spark.createDataFrame(
        [(1, [1.0] + [0.0] * 7), (2, [1.0] + [0.0] * 7), (3, [0.0] * 7 + [1.0])],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(vecs, "vec_id", "embedding", n_clusters=2)
    want = {(r.vec_id, r.rep_id) for r in out.collect()}
    assert release_cache(out) == 1  # the KMeans-assigned frame
    assert release_cache(out) == 0  # idempotent
    assert {(r.vec_id, r.rep_id) for r in out.collect()} == want  # recomputes

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b x y")], "doc_id long, text string"
    )
    ppl = bigram_perplexity(docs, "doc_id", "text")
    got = {r.doc_id: r.ppl for r in ppl.collect()}
    assert release_cache(ppl) == 2  # the gram stream + the pair counts
    assert {r.doc_id: r.ppl for r in ppl.collect()} == got


def test_bigram_perplexity_reuses_gram_cache(spark):
    """VERDICT r4 #2 (tightened in r5): the gram stream AND the pair
    aggregate bg are persisted; corpus-derived statistics (ctx counts,
    vocab) read bg's cache while the scoring join probes the grams cache
    — the explode+split projection appears only inside cached build
    plans, never replicated per consumer."""
    from ixmp_spark.operators.text import bigram_perplexity

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b c d e")], "doc_id long, text string"
    )
    out = bigram_perplexity(docs, "doc_id", "text")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # all gram consumers hit the cache: the in-memory relation is scanned
    # >= 3 times and the raw explode over arrays_zip appears only inside
    # its cached build plan, not replicated per consumer
    assert plan.count("InMemoryRelation") >= 3
    from ixmp_spark.operators import release_cache

    release_cache(out)


def test_chunk_documents_semantics(spark):
    """Context-window chunking: stride < window overlaps, short docs emit
    one chunk, the trailing remainder is kept, and token provenance is
    exact (hand-checked windows)."""
    from ixmp_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk)
        for r in chunk_documents(df, "doc_id", "text", window=3, stride=2).collect()
    }
    assert got == {
        (1, 0): (3, "a b c"), (1, 1): (3, "c d e"), (1, 2): (3, "e f g"),
        (2, 0): (2, "x y"), (3, 0): (1, "solo"),
    }
    # non-overlapping default covers every token exactly once
    cover = chunk_documents(df, "doc_id", "text", window=3).collect()
    per_doc = {}
    for r in cover:
        per_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    rebuilt = {
        d: " ".join(c for _, c in sorted(rows)) for d, rows in per_doc.items()
    }
    assert rebuilt == {1: "a b c d e f g", 2: "x y", 3: "solo"}

    with pytest.raises(ValueError, match="window and stride"):
        chunk_documents(df, "doc_id", "text", window=0)


def test_shuffle_shards_permutation_and_determinism(spark, sf_dir):
    """(shard, pos) is a valid shuffle: positions are exactly 1..count
    within every shard, the assignment is layout-independent, and a
    different seed yields a different permutation."""
    from ixmp_spark.operators.sampling import shuffle_shards

    docs = load(spark, sf_dir, "documents")
    out = shuffle_shards(docs, "doc_id", n_shards=8, seed="s1")
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == docs.count()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # layout-independent: same (seed, corpus) -> same assignment
    again = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in shuffle_shards(
            docs.repartition(13), "doc_id", n_shards=8, seed="s1"
        ).select("doc_id", "shard", "pos").collect()
    }
    assert again == {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}
    # a different seed is a different permutation
    other = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shards(docs, "doc_id", n_shards=8, seed="s2")
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert other != again
    with pytest.raises(ValueError):
        shuffle_shards(docs, "doc_id", n_shards=0)


def test_cap_per_group_matches_single_window(spark, sf_dir):
    """The two-path plan (broadcast pass-through for under-cap groups +
    window only over the hot ones) returns row-for-row the same set as
    the naive single-window formulation, and per-group sizes are
    min(n, cap)."""
    from pyspark.sql import Window

    from ixmp_spark.operators.sampling import cap_per_group

    docs = load(spark, sf_dir, "documents")
    cap = 30
    got = {
        r["doc_id"]
        for r in cap_per_group(docs, "lang", "doc_id", cap).select("doc_id").collect()
    }
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want = {
        r["doc_id"]
        for r in docs.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= cap)
        .select("doc_id")
        .collect()
    }
    assert got == want
    sizes = {
        r["lang"]: r["n"]
        for r in cap_per_group(docs, "lang", "doc_id", cap)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {lang: min(n, cap) for lang, n in full.items()}
    with pytest.raises(ValueError):
        cap_per_group(docs, "lang", "doc_id", -1)


def test_top_ngrams_hand_computed(spark):
    """Bigram counts on a fixed corpus, short docs contribute nothing,
    ties break lexicographically."""
    from ixmp_spark.operators.text import top_ngrams

    df = spark.createDataFrame(
        [
            (0, "a b a b"),
            (1, "a b c"),
            (2, "solo"),  # 1 token: no bigram
        ],
        "doc_id long, text string",
    )
    rows = [(r["gram"], r["n"]) for r in top_ngrams(df, "text", n=2, k=3).collect()]
    assert rows == [("a b", 3), ("b a", 1), ("b c", 1)]
    with pytest.raises(ValueError):
        top_ngrams(df, "text", n=0)


def test_source_overlap_semantics(spark):
    """Containment is asymmetric and exact on a hand-built corpus: src B
    fully contains src A's grams (copy), src C shares nothing; the
    stop-gram guard drops grams present in too many sources."""
    from ixmp_spark.operators import release_cache
    from ixmp_spark.operators.dedup import source_overlap

    base = "w1 w2 w3 w4 w5"
    df = spark.createDataFrame(
        [
            ("A", base),                     # 1 distinct 4-gram... see n=4
            ("B", base + " extra tail"),     # contains all of A's grams
            ("C", "x1 x2 x3 x4 x5 x6"),      # disjoint
        ],
        "source string, text string",
    )
    out = source_overlap(df, "source", "text", n=4)
    rows = {(r.src_a, r.src_b): (r.n_common, r.containment) for r in out.collect()}
    release_cache(out)
    # A: grams of n=4 over 5 tokens -> positions 1..2 -> 2 grams, both in B
    assert rows[("A", "B")] == (2, 1.0)
    n_b = 4  # B: 7 tokens -> 4 grams
    assert rows[("B", "A")] == (2, round(2 / n_b, 6))
    assert ("A", "C") not in rows and ("C", "A") not in rows
    # guard: with max_sources=1 every shared gram is dropped -> no rows
    assert (
        source_overlap(df, "source", "text", n=4, max_sources=1).count() == 0
    )
    with pytest.raises(ValueError):
        source_overlap(df, "source", "text", max_sources=0)


def _ref_bpe_encode(word, merges):
    """Sequential merge application, identical to bpe_train's per-round
    greedy left-to-right semantics."""
    syms = list(word) + ["</w>"]
    for left, right in merges:
        out = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        syms = out
    return syms


def test_bpe_encode_matches_reference(spark):
    """Train merges on a corpus, encode the SAME corpus: per-document
    piece sequences equal the pure-Python sequential reference exactly
    (order preserved across the posexplode → join → reassembly path),
    and unseen symbols at encode time survive as single characters."""
    import re

    from ixmp_spark.operators.text import bpe_encode, bpe_train

    texts = [
        "aab aab ab b",
        "abab aab aa",
        "b aab abab abab",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df = bpe_train(df, "text", n_merges=5)
    merges = [
        (r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()
    ]
    got = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(df, "doc_id", "text", merges_df).collect()
    }
    for i, t in enumerate(texts):
        want = [
            p
            for w in re.split(r"\s+", t.strip().lower())
            if w
            for p in _ref_bpe_encode(w, merges)
        ]
        assert got[i] == want, f"doc {i}"

    # unseen word: no merge applies, chars + </w> pass through
    df2 = spark.createDataFrame([(9, "xyz")], "doc_id long, text string")
    out2 = bpe_encode(df2, "doc_id", "text", merges_df).collect()[0]
    assert out2["pieces"] == ["x", "y", "z", "</w>"]
    assert out2["n_tokens"] == 4


def test_gopher_quality_filter_rules(spark):
    """Each Gopher gate trips on a crafted document; a clean document
    passes; token-less text yields NULL ratios and keep=false."""
    from ixmp_spark.operators.text import gopher_quality_filter

    good = "the quick brown fox jumps over that lazy dog with great " * 3
    docs = [
        (1, good),                                     # passes all gates
        (2, "to of in a " * 10),                       # mean word len < 3
        (3, "### " + good + " ### ... ... ... ..."),   # symbol ratio
        (4, "the be to 123 456 789 000 111 222 333 " * 4),  # alpha frac
        (5, "zebra quagga okapi dingo " * 10),         # no stopwords
        (6, "   "),                                    # token-less
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_filter(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "doc_id",
            "text",
            min_words=10,
            max_words=100,
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["mean_word_len"] < 3
    assert out[3]["keep"] is False and out[3]["symbol_ratio"] > 0.1
    assert out[4]["keep"] is False and out[4]["alpha_word_frac"] < 0.8
    assert out[5]["keep"] is False and out[5]["stopword_hits"] == 0
    assert out[6]["keep"] is False and out[6]["n_words"] == 0
    assert out[6]["mean_word_len"] is None
    # stopword hits count DISTINCT stopwords present, not occurrences
    # (doc 2 has 20 'to'/'of' occurrences but only 2 distinct hits)
    assert out[2]["stopword_hits"] == 2


def test_corpus_stats_hand_computed(spark):
    """Per-group profile on a corpus small enough to check by hand —
    including the exact-duplicate rate and the interpolated median."""
    from ixmp_spark.operators.text import corpus_stats

    rows = [
        (1, "aa bb", "en", "s1"),      # 2 tokens, 5 chars
        (2, "aa bb", "en", "s2"),      # exact dup of doc 1
        (3, "cc dd ee", "en", "s1"),   # 3 tokens, 8 chars
        (4, "ff", "de", "s3"),         # 1 token, 2 chars
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["lang"]: r for r in corpus_stats(df).collect()}
    en = out["en"]
    assert en["n_docs"] == 3 and en["n_tokens"] == 7 and en["n_sources"] == 2
    assert en["avg_chars"] == 6.0          # (5 + 5 + 8) / 3
    assert en["p50_chars"] == 5.0          # median of 5, 5, 8
    assert en["dup_rate"] == round(1 - 2 / 3, 6)
    de = out["de"]
    assert de["n_docs"] == 1 and de["dup_rate"] == 0.0


def test_compact_parquet_file_counts(spark, sf_dir, tmp_path):
    """40 small parts compact into few target-sized files with rows
    preserved; in-place compaction is refused."""
    import pytest as _pytest

    from ixmp_spark.queries import load
    from ixmp_spark.sources.maintenance import (
        compact_parquet,
        parquet_file_stats,
    )

    docs = load(spark, sf_dir, "documents")
    src = str(tmp_path / "frag")
    docs.repartition(40).write.parquet(src)
    n_src, total = parquet_file_stats(spark, src)
    assert n_src == 40

    dest = str(tmp_path / "compact")
    before, after = compact_parquet(
        spark, src, dest, target_file_bytes=max(1, total // 2)
    )
    assert before == 40 and after <= 4  # ceil rounding + tiny-file floor
    assert spark.read.parquet(dest).count() == docs.count()

    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src)


def test_compact_parquet_sorted_layout_disjoint(spark, sf_dir, tmp_path):
    """sort_by clustering: every output file covers a DISJOINT doc_id
    range (range-partitioned + sorted within), which is what lets
    parquet min/max row-group stats skip whole files on filtered
    scans."""
    import pyarrow.parquet as papq

    from ixmp_spark.queries import load
    from ixmp_spark.sources.maintenance import compact_parquet

    docs = load(spark, sf_dir, "documents")
    src = str(tmp_path / "frag2")
    docs.repartition(16).write.parquet(src)
    dest = str(tmp_path / "clustered")
    _, total = __import__(
        "ixmp_spark.sources.maintenance", fromlist=["parquet_file_stats"]
    ).parquet_file_stats(spark, src)
    compact_parquet(
        spark, src, dest, target_file_bytes=max(1, total // 3),
        sort_by="doc_id",
    )
    import glob

    ranges = []
    for part in glob.glob(dest + "/part-*.parquet"):
        ids = papq.read_table(part, columns=["doc_id"])["doc_id"].to_pylist()
        if ids:
            assert ids == sorted(ids)  # sorted within the file
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    assert len(ranges) >= 2  # the target actually split the data
    for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b  # disjoint: min/max stats can prune files
    assert spark.read.parquet(dest).count() == docs.count()


def test_lsh_index_partition_pruning(spark, sf_dir, tmp_path):
    """The WRITTEN LSH index prunes at the storage layer: a query reads
    only its probe buckets' partition directories (asserted from the
    executed scan's partition metrics AND from result equality with the
    in-memory bucketed search)."""
    import random

    from ixmp_spark.operators.similarity import (
        bucketed_topk,
        lsh_index_topk,
        lsh_index_write,
    )
    from ixmp_spark.queries import load

    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    emb = load(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "lsh_idx")
    lsh_index_write(emb, idx, "vec_id", "embedding", planes)
    import glob

    n_buckets = len(glob.glob(idx + "/bucket=*"))
    assert n_buckets > 4  # the corpus actually spreads over buckets

    probe_row = emb.orderBy("vec_id").limit(1).collect()[0]
    got = lsh_index_topk(
        spark, idx, probe_row["embedding"], planes, "vec_id",
        k=10, multi_probe=1, exclude_id=probe_row["vec_id"],
    )
    from tools.audit_plans import formatted_plan

    fplan = formatted_plan(got)
    # partition pruning reaches the scan: bucket is a PartitionFilter,
    # never a post-scan filter over the full corpus
    assert "PartitionFilters: [" in fplan
    assert "bucket" in fplan.split("PartitionFilters:")[1].splitlines()[0]

    want = bucketed_topk(
        emb, emb.orderBy("vec_id").limit(1), "vec_id", "embedding",
        planes, k=10, multi_probe=1,
    ).collect()
    assert [(r["vec_id"], r["cosine_sim"]) for r in got.collect()] == [
        (r["vec_id"], r["cosine_sim"]) for r in want
    ]


def test_hard_negatives_planted_structure(spark):
    """Hard-negative mining: for a planted anchor with (a) a near-dup
    at cosine ~0.999, (b) mid-similarity neighbors ~0.7-0.9, and (c)
    orthogonal decoys, the mined negatives are exactly the mid-sim
    group — the near-dup is excluded by max_sim (unlabeled positive)
    and decoys fall below min_sim."""
    import math
    import random

    from ixmp_spark.operators.similarity import hard_negatives

    rng = random.Random(11)
    d = 32
    base = [rng.gauss(0, 1) for _ in range(d)]
    nb = math.sqrt(sum(x * x for x in base))
    base = [x / nb for x in base]

    def mix(alpha, seed):
        r = random.Random(seed)
        noise = [r.gauss(0, 1) for _ in range(d)]
        nn = math.sqrt(sum(x * x for x in noise))
        noise = [x / nn for x in noise]
        v = [alpha * b + math.sqrt(1 - alpha * alpha) * n
             for b, n in zip(base, noise)]
        return v

    rows = [(0, base), (1, mix(0.999, 1))]          # anchor + near-dup
    rows += [(10 + i, mix(0.8, 100 + i)) for i in range(4)]   # hard negs
    rows += [(100 + i, mix(0.0, 200 + i)) for i in range(30)]  # decoys
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = (
        hard_negatives(
            emb, "vec_id", "embedding", k=10,
            min_sim=0.5, max_sim=0.95, bands=8, bits=3,
        )
        .where("anchor_id = 0")
        .collect()
    )
    ids = {r["negative_id"] for r in got}
    assert 1 not in ids  # near-dup excluded: it is an unlabeled positive
    assert ids and ids <= {10, 11, 12, 13}, ids
    assert all(0.5 <= r["cosine_sim"] < 0.95 for r in got)


def test_zorder_cluster_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Morton clustering: every output file covers a BOUNDED region of
    BOTH clustered columns, unlike a lexicographic sort which clusters
    only the leading column. Measured as mean per-file span fraction of
    each column's domain: z-order must bound both dims well below the
    random baseline (≈1.0) and beat single-column sort's trailing-dim
    span; rows survive exactly."""
    import glob

    import pyarrow.parquet as papq

    from ixmp_spark.queries import load
    from ixmp_spark.sources.maintenance import (
        compact_parquet,
        parquet_file_stats,
        zorder_cluster,
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    src = str(tmp_path / "li_frag")
    # pre-shuffle so the baseline layout has no accidental clustering
    li.orderBy(F.md5(F.col("l_orderkey").cast("string"))).repartition(
        8
    ).write.parquet(src)
    _, total = parquet_file_stats(spark, src)
    target = max(1, total // 16)

    def span_fracs(dest, col, domain):
        spans = []
        for part in glob.glob(dest + "/part-*.parquet"):
            vals = papq.read_table(part, columns=[col])[col].to_pylist()
            if vals:
                spans.append((max(vals) - min(vals)) / domain)
        return sum(spans) / len(spans)

    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).collect()[0]
    dom_o, dom_p = hi_o - lo_o, hi_p - lo_p

    dest_sort = str(tmp_path / "lex")
    compact_parquet(spark, src, dest_sort, target, sort_by="l_orderkey")
    dest_z = str(tmp_path / "zord")
    zorder_cluster(
        spark, src, dest_z, ["l_orderkey", "l_partkey"],
        target_file_bytes=target,
    )

    z_o = span_fracs(dest_z, "l_orderkey", dom_o)
    z_p = span_fracs(dest_z, "l_partkey", dom_p)
    lex_p = span_fracs(dest_sort, "l_partkey", dom_p)
    # z-order bounds both dimensions; lexicographic leaves the trailing
    # column unclustered (span ≈ full domain per file)
    assert z_o < 0.7 and z_p < 0.7, (z_o, z_p)
    assert lex_p > 0.9, lex_p
    assert z_p < lex_p / 1.5
    assert spark.read.parquet(dest_z).count() == li.count()


def test_zorder_key_caps_bits_to_63bit_long(spark):
    """With 5 columns and the default bits=16 the interleave would shift
    past bit 63, where Spark's shiftleft wraps mod 64 and silently
    scrambles the Morton order. zorder_key caps bits to 63//len(cols):
    the key must fit in a signed long (5 cols → 12 bits each → 60 bits)
    and still order the diagonal monotonically."""
    from ixmp_spark.sources.maintenance import zorder_key

    cols = ["a", "b", "c", "d", "e"]
    df = spark.createDataFrame(
        [(0,) * 5, (50,) * 5, (100,) * 5],
        "a long, b long, c long, d long, e long",
    )
    by_a = {
        r["a"]: r["k"]
        for r in df.select("a", zorder_key(df, cols).alias("k")).collect()
    }
    assert all(0 <= k < (1 << 60) for k in by_a.values())
    assert by_a[0] < by_a[50] < by_a[100]
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(df, [])


def test_range_and_overlap_join_malformed_interval_guard(spark):
    """An interval with end < start (corrupt data) emits NO candidate
    buckets. Spark's sequence(first, last) auto-steps -1 when last <
    first, so a corrupt end like epoch 0 used to explode a huge
    DESCENDING bucket list — rows the shuffle paid for and only the
    post-filter removed. Both bucketized joins now drop such intervals
    at the explode, and healthy intervals are unaffected."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.joins import interval_overlap_join, range_join

    t0 = datetime(2024, 5, 1, 0, 0)

    def ts(minute):
        return t0 + timedelta(minutes=minute)

    pts = spark.createDataFrame(
        [(0, ts(30)), (1, ts(90))], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            (1, ts(0), ts(60)),                  # healthy: matches pt 0
            (2, ts(120), datetime(1970, 1, 1)),  # corrupt: end « start
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = range_join(pts, iv, "ts", "start_ts", "end_ts", 3600)
    assert sorted((r["iid"], r["pid"]) for r in got.collect()) == [(1, 0)]

    left = spark.createDataFrame(
        [(10, ts(0), ts(45))], "lid long, l_start timestamp, l_end timestamp"
    )
    right = spark.createDataFrame(
        [
            (20, ts(30), ts(60)),                 # overlaps lid=10
            (21, ts(40), datetime(1970, 1, 1)),   # corrupt
        ],
        "rid long, r_start timestamp, r_end timestamp",
    )
    ov = interval_overlap_join(
        left, right, ("l_start", "l_end"), ("r_start", "r_end"), 3600
    )
    assert sorted((r["lid"], r["rid"]) for r in ov.collect()) == [(10, 20)]


def test_pq_rerank_full_equals_exact(spark, sf_dir):
    """PQ with rerank ≥ corpus size degenerates to EXACT squared-L2
    search — the two-stage design's correctness anchor: the ADC stage
    only selects candidates, the rerank stage computes true distances."""
    from ixmp_spark.operators.similarity import pq_topk, pq_train_encode
    from ixmp_spark.queries import load

    emb = load(spark, sf_dir, "embeddings").limit(300).persist()
    try:
        n = emb.count()
        prow = emb.orderBy("vec_id").limit(1).collect()[0]
        pv = [float(x) for x in prow["embedding"]]
        books, codes = pq_train_encode(
            emb, "vec_id", "embedding", m=8, bits=4, seed=7
        )
        got = pq_topk(
            codes.where(F.col("vec_id") != prow["vec_id"]),
            books, pv, "vec_id", k=10, rerank=n, vectors=emb,
            vec_col="embedding",
        ).collect()

        import math

        exact = sorted(
            (
                (
                    round(
                        sum(
                            (float(a) - b) ** 2
                            for a, b in zip(r["embedding"], pv)
                        ),
                        6,
                    ),
                    r["vec_id"],
                )
                for r in emb.collect()
                if r["vec_id"] != prow["vec_id"]
            ),
        )[:10]
        assert [(r["vec_id"], r["dist2"]) for r in got] == [
            (vid, d) for d, vid in exact
        ]
        assert math.isclose(got[0]["dist2"], exact[0][0])
    finally:
        emb.unpersist()


def test_pq_finds_planted_neighbors(spark):
    """ADC-only PQ search (no rerank) recovers a planted near-duplicate
    group: 20 tiny perturbations of one base vector among 500 spread-out
    decoys — the probe's top-19 must be dominated by its group."""
    import random

    from ixmp_spark.operators.similarity import pq_topk, pq_train_encode

    rng = random.Random(3)
    d = 32
    base = [rng.gauss(0, 1) for _ in range(d)]
    rows = []
    for i in range(20):  # planted group: ids 0..19
        rows.append((i, [x + rng.gauss(0, 0.01) for x in base]))
    for i in range(20, 520):  # decoys far away
        rows.append((i, [rng.gauss(0, 1) * 4 for _ in range(d)]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    books, codes = pq_train_encode(emb, "vec_id", "embedding", m=8, bits=4)
    got = pq_topk(
        codes.where(F.col("vec_id") != 0), books, rows[0][1], "vec_id", k=19
    ).collect()
    hits = sum(1 for r in got if 1 <= r["vec_id"] <= 19)
    assert hits >= 15, f"only {hits}/19 planted neighbors found"


def test_pq_code_compression_shape(spark, sf_dir):
    """Codes are m small ints in [0, 2**bits) — the 32× compression
    contract — and encoding is deterministic for a fixed seed."""
    from ixmp_spark.operators.similarity import pq_train_encode
    from ixmp_spark.queries import load

    emb = load(spark, sf_dir, "embeddings").limit(100)
    books, codes = pq_train_encode(emb, "vec_id", "embedding", m=8, bits=4)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    rows = codes.collect()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])
    _, codes2 = pq_train_encode(emb, "vec_id", "embedding", m=8, bits=4)
    assert {(r["vec_id"], tuple(r["codes"])) for r in rows} == {
        (r["vec_id"], tuple(r["codes"])) for r in codes2.collect()
    }


def test_chunked_lead_windows_match_plain(spark, sf_dir):
    """The bucket-chunked forms of event_transitions / top_paths must be
    row-identical to the plain whole-history windows — including the
    hard case the head-carry construction exists for: chains that span
    MULTIPLE buckets because intermediate buckets hold a single event
    (a 4-step path across 4 distinct days must still assemble)."""
    from datetime import datetime

    from ixmp_spark.operators.sessions import event_transitions, top_paths
    from ixmp_spark.queries import load

    # crafted sparse frame: user 1 has one event per day for 6 days
    # (every >=2-step chain crosses a bucket boundary), user 2 has a
    # dense day then a 1-event day then a dense day, user 3 ties on ts
    rows, eid = [], 0
    for day in range(1, 7):
        rows.append((eid, datetime(2024, 3, day, 12), 1, f"e{day % 3}", 1.0))
        eid += 1
    for h in range(5):
        rows.append((eid, datetime(2024, 3, 1, 8 + h), 2, f"d{h % 2}", 1.0))
        eid += 1
    rows.append((eid, datetime(2024, 3, 2, 9), 2, "gap", 1.0)); eid += 1
    for h in range(4):
        rows.append((eid, datetime(2024, 3, 3, 8 + h), 2, f"f{h % 2}", 1.0))
        eid += 1
    rows.append((eid, datetime(2024, 3, 4, 10), 3, "t0", 1.0)); eid += 1
    rows.append((eid, datetime(2024, 3, 4, 10), 3, "t1", 1.0)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    for length in (2, 3, 4):
        plain = top_paths(ev, length=length, k=100).collect()
        chunk = top_paths(ev, length=length, k=100, bucket="day").collect()
        assert sorted((r["path"], r["n"]) for r in plain) == sorted(
            (r["path"], r["n"]) for r in chunk
        ), f"length={length}"
    plain = event_transitions(ev, k=100).collect()
    chunk = event_transitions(ev, k=100, bucket="day").collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, chunk))
    # and on the real events table at sf0.01
    real = load(spark, sf_dir, "events")
    a = top_paths(real, length=4, k=50).collect()
    b = top_paths(real, length=4, k=50, bucket="day").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bucketed_topk_prebucketed_matches(spark, sf_dir):
    """The amortized LSH form (caller-persisted __bucket column) must
    return exactly what the per-query recomputation returns, for both
    single- and multi-probe."""
    import random

    from ixmp_spark.operators.similarity import (
        bucketed_topk,
        hyperplane_lsh_bucket,
    )
    from ixmp_spark.queries import load

    rng = random.Random(7)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    emb = load(spark, sf_dir, "embeddings").limit(400)
    pre = emb.withColumn(
        "__bucket", hyperplane_lsh_bucket("embedding", planes)
    )
    probe = emb.orderBy("vec_id").limit(1)
    for mp in (0, 1):
        a = bucketed_topk(
            emb, probe, "vec_id", "embedding", planes, k=10, multi_probe=mp
        ).collect()
        b = bucketed_topk(
            pre, probe, "vec_id", "embedding", planes, k=10,
            multi_probe=mp, prebucketed=True,
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], f"mp={mp}"


def test_range_join_hand_computed(spark):
    """Bucketized containment join: boundary timestamps are inclusive
    both ends, an interval spanning many buckets matches points in each
    covered bucket exactly once, overlapping intervals each match, and
    the plan is a hash join (no BNLJ / cartesian) despite having no
    natural equality key."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.joins import range_join

    t0 = datetime(2024, 5, 1, 0, 0)

    def ts(minute):
        return t0 + timedelta(minutes=minute)

    pts = spark.createDataFrame(
        [(i, ts(m)) for i, m in enumerate([0, 30, 60, 90, 150, 240])],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (1, ts(0), ts(90)),     # spans 2 hour-buckets; pts 0,1,2,3
            (2, ts(60), ts(60)),    # zero-length: exactly pt 2
            (3, ts(89), ts(200)),   # overlaps 1; pts 3,4
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = range_join(pts, iv, "ts", "start_ts", "end_ts", 3600)
    pairs = sorted((r["iid"], r["pid"]) for r in got.collect())
    assert pairs == [(1, 0), (1, 1), (1, 2), (1, 3), (2, 2), (3, 3), (3, 4)]
    plan_buf = got._jdf.queryExecution().executedPlan().toString() if False else None
    from tools.audit_plans import formatted_plan

    plan = formatted_plan(got)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_hand_computed(spark):
    """interval_overlap_join: touching endpoints count as overlap,
    multi-bucket spans emit each pair EXACTLY once (the
    first-shared-bucket guard), disjoint same-bucket pairs are
    filtered, and the plan stays free of nested-loop joins."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.joins import interval_overlap_join

    t0 = datetime(2024, 5, 1, 0, 0)

    def ts(minute):
        return t0 + timedelta(minutes=minute)

    a = spark.createDataFrame(
        [
            (1, ts(0), ts(300)),   # 5h: spans many buckets
            (2, ts(100), ts(130)),
            (3, ts(400), ts(410)),
        ],
        "a_id long, a_s timestamp, a_e timestamp",
    )
    b = spark.createDataFrame(
        [
            (10, ts(120), ts(500)),  # overlaps 1 (many shared buckets), 2, 3
            (11, ts(300), ts(300)),  # touches 1's endpoint exactly
            (12, ts(131), ts(140)),  # same bucket as 2, DISJOINT from 2
        ],
        "b_id long, b_s timestamp, b_e timestamp",
    )
    got = interval_overlap_join(a, b, ("a_s", "a_e"), ("b_s", "b_e"), 3600)
    pairs = sorted((r["a_id"], r["b_id"]) for r in got.collect())
    assert pairs == [(1, 10), (1, 11), (1, 12), (2, 10), (3, 10)]

    from tools.audit_plans import formatted_plan

    plan = formatted_plan(got)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunked_sessionize_and_zscore_match_plain(spark):
    """Bucket-chunked sessionize (prefix-sum stitching) and z-score
    (tail carries) must equal the plain whole-history windows on the
    crafted hard cases: sessions continuing across bucket boundaries
    AND across EMPTY buckets; midnight-gap session breaks; z-score
    baselines straddling boundaries where a bucket holds fewer rows
    than the trailing window."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import sessionize, zscore_anomalies

    t0 = datetime(2024, 3, 1, 23, 50)
    rows, eid = [], 0
    # user 1: session straddles midnight (10-min gaps), then a break,
    # then a session that spans an EMPTY day (last event 23:59 Mar 2,
    # next 00:05 Mar 4 — gap > 1800 = new session, but lag must still
    # find the Mar-2 event from Mar 4)
    for i in range(4):
        rows.append((eid, t0 + timedelta(minutes=10 * i), 1, "a", float(i)))
        eid += 1
    rows.append((eid, datetime(2024, 3, 2, 23, 59), 1, "a", 9.0)); eid += 1
    rows.append((eid, datetime(2024, 3, 4, 0, 5), 1, "a", 1.0)); eid += 1
    rows.append((eid, datetime(2024, 3, 4, 0, 10), 1, "a", 2.0)); eid += 1
    # user 2: one event per day → every z-baseline crosses buckets
    for d in range(1, 9):
        rows.append((eid, datetime(2024, 3, d, 12), 2, "b", float(d * d)))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    plain = sessionize(ev, "user_id", "ts", 1800, "event_id")
    chunk = sessionize(ev, "user_id", "ts", 1800, "event_id", bucket="day")
    key = lambda r: (r["user_id"], r["event_id"], r["session_id"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, chunk.collect()))

    zp = zscore_anomalies(ev, window=3).collect()
    zc = zscore_anomalies(ev, window=3, bucket="day").collect()
    assert sorted(map(tuple, zp)) == sorted(map(tuple, zc))


def test_pq_thin_training_sample_fails_actionably(spark, sf_dir):
    """A train_fraction that samples fewer rows than 2**bits centroids
    must raise a clear ValueError naming the knob, not die inside KMeans
    with a cryptic fit error (and an empty sample likewise)."""
    import pytest

    from ixmp_spark.operators.similarity import pq_train_encode
    from ixmp_spark.queries import load

    emb = load(spark, sf_dir, "embeddings").limit(50)
    with pytest.raises(ValueError, match="train_fraction"):
        pq_train_encode(
            emb, "vec_id", "embedding", m=8, bits=4, train_fraction=1e-6
        )


def test_event_transitions_hand_computed(spark):
    """Transition counts and P(dst|src) on a hand-checkable path set;
    same-timestamp ties resolved by the order column."""
    from datetime import datetime

    from ixmp_spark.operators.sessions import event_transitions

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1: a -> b -> a
        (1, 1, ts(1), "a"),
        (2, 1, ts(2), "b"),
        (3, 1, ts(3), "a"),
        # user 2: a -> b (same ts: event_id orders them)
        (4, 2, ts(5), "a"),
        (5, 2, ts(5), "b"),
        # user 3: single event, no transition
        (6, 3, ts(9), "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["src"], r["dst"]): (r["n"], r["prob"])
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("a", "b"): (2, 1.0),
        ("b", "a"): (1, 1.0),
    }


def test_bpe_train_rounds_stay_flat(spark):
    """Deep merge counts must not blow up: the pre-fix persist-chain
    variant went EXPONENTIAL in the merge round (plan recompile +
    projection collapse re-inlining every prior round's aggregate
    lambda — round 17 alone took 92 s, CORPUS-SIZE-INDEPENDENT since
    the cost was driver/plan-side). With per-round lazy checkpoints, 40
    rounds on a tiny corpus finish in seconds; the generous bound below
    only exists to fail the build if lineage truncation ever regresses."""
    import time

    from ixmp_spark.operators.text import bpe_train

    texts = [
        ("the quick brown fox jumps over the lazy dog %d " % i) * 3
        for i in range(50)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    t0 = time.time()
    merges = bpe_train(df, "text", n_merges=40)
    n = merges.count()
    elapsed = time.time() - t0
    assert n == 40
    assert elapsed < 120, f"40 merge rounds took {elapsed:.0f}s — lineage leak"
    # determinism across the checkpointed path
    again = bpe_train(df, "text", n_merges=40)
    assert [tuple(r) for r in merges.collect()] == [
        tuple(r) for r in again.collect()
    ]


def test_weighted_sample_semantics(spark):
    """Soft quality sampling: score 1 keeps everything, score 0 drops
    everything, and a mid score keeps roughly that fraction —
    deterministically (same rows on every run/layout); gamma sharpens."""
    from ixmp_spark.operators.sampling import weighted_sample

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit(0.5).alias("score")
    )
    kept = weighted_sample(df, "doc_id", "score")
    n = kept.count()
    assert 850 <= n <= 1150  # ~50% of 2000, hash-uniform
    # deterministic + layout-stable
    again = weighted_sample(df.repartition(7), "doc_id", "score")
    assert {r["doc_id"] for r in kept.collect()} == {
        r["doc_id"] for r in again.collect()
    }
    assert weighted_sample(
        df.withColumn("score", F.lit(1.0)), "doc_id", "score"
    ).count() == 2000
    assert weighted_sample(
        df.withColumn("score", F.lit(0.0)), "doc_id", "score"
    ).count() == 0
    # gamma > 1 sharpens: mid scores keep fewer
    sharp = weighted_sample(df, "doc_id", "score", gamma=2.0).count()
    assert sharp < n
    # audit mode attaches the boolean without filtering
    audited = weighted_sample(df, "doc_id", "score", keep_col="keep")
    assert audited.count() == 2000
    assert audited.where("keep").count() == n


def test_normalize_unicode_forms(spark):
    """NFC composes decomposed accents; NFKC folds compatibility chars;
    NULLs pass through; unknown forms are rejected."""
    import pytest as _pytest

    from ixmp_spark.operators.text import normalize_unicode

    rows = [
        (1, "café"),   # cafe + combining acute -> café
        (2, "ﬁle"),          # ﬁ ligature -> fi under NFKC only
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nfc = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", normalize_unicode("text").alias("n")
        ).collect()
    }
    assert nfc[1] == "café" and len(nfc[1]) == 4
    assert nfc[2] == "ﬁle"  # NFC keeps the ligature
    assert nfc[3] is None
    nfkc = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", normalize_unicode("text", "NFKC").alias("n")
        ).collect()
    }
    assert nfkc[2] == "file"
    with _pytest.raises(ValueError):
        normalize_unicode("text", "NFX")


def test_quality_classifier_separates(spark):
    """The weak-supervised classifier scores clean documents above
    spam, is deterministic for a fixed seed, and refuses single-class
    weak labels."""
    import pytest as _pytest

    from ixmp_spark.operators.text import quality_classifier_scores

    clean = [
        (i, "the quick brown fox jumps over that lazy dog with vigor "
            "and purpose today %d" % i)
        for i in range(60)
    ]
    spam = [
        (100 + i, "### ... ### ... 111 222 333 %d ..." % i)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        clean + spam, "doc_id long, text string"
    )
    kw = dict(min_words=5, max_words=100)
    scores = {
        r["doc_id"]: r["quality_p"]
        for r in quality_classifier_scores(df, "doc_id", "text", **kw).collect()
    }
    mean_clean = sum(scores[i] for i, _ in clean) / len(clean)
    mean_spam = sum(scores[i] for i, _ in spam) / len(spam)
    assert mean_clean > 0.7 > 0.3 > mean_spam
    again = {
        r["doc_id"]: r["quality_p"]
        for r in quality_classifier_scores(df, "doc_id", "text", **kw).collect()
    }
    assert scores == again
    only_clean = spark.createDataFrame(clean, "doc_id long, text string")
    with _pytest.raises(ValueError, match="single-class"):
        quality_classifier_scores(only_clean, "doc_id", "text", **kw)


def test_incremental_dedup_semantics(spark):
    """Batch-vs-history dedup: history hits drop (by content, not id),
    within-batch repeats keep min id, whitespace/case variants collapse
    to the same digest, and survivors carry their digest for the index
    append."""
    from ixmp_spark.operators.dedup import incremental_dedup, normalize_text

    history = spark.createDataFrame(
        [("old news",)], "text string"
    ).select(F.md5(normalize_text("text")).alias("digest"))
    batch = spark.createDataFrame(
        [
            (1, "Old   NEWS"),     # history hit after normalization
            (2, "fresh story"),
            (3, "fresh  STORY"),   # within-batch dup of 2
            (4, "another one"),
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup(batch, history, "text", "doc_id")
    rows = {r["doc_id"]: r["digest"] for r in out.collect()}
    assert set(rows) == {2, 4}
    assert "digest" in out.columns and all(len(d) == 32 for d in rows.values())


def test_pack_sequences_invariants(spark, sf_dir):
    """Contiguous-fill packing: within every (shard, seq) the token
    offsets tile end-to-end (each doc starts where the previous ended,
    mod capacity), sequence indices are dense from 0 per shard, and the
    layout is reproducible and layout-independent."""
    from ixmp_spark.operators.sampling import pack_sequences
    from ixmp_spark.operators.text import token_count
    from ixmp_spark.queries import load

    docs = (
        load(spark, sf_dir, "documents")
        .withColumn("n_tokens", token_count("text").cast("long"))
        .select("doc_id", "n_tokens")
    )
    cap = 256
    out = pack_sequences(docs, "doc_id", "n_tokens", capacity=cap, n_shards=8)
    rows = out.collect()
    assert {r["shard"] for r in rows} == set(range(8))
    # rebuild each shard's layout and verify offsets/seqs
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["seq"], r["tok_offset"]))
        before = 0
        seqs = set()
        for r in rs:
            assert r["seq"] == before // cap, (shard, r)
            assert r["tok_offset"] == before % cap, (shard, r)
            seqs.add(r["seq"])
            before += r["n_tokens"]
        assert seqs == set(range(max(seqs) + 1))  # dense from 0
    # layout-independent determinism
    again = pack_sequences(
        docs.repartition(13), "doc_id", "n_tokens", capacity=cap, n_shards=8
    )
    key = lambda r: (r["doc_id"], r["shard"], r["seq"], r["tok_offset"])
    assert sorted(map(key, rows)) == sorted(map(key, again.collect()))


def test_bm25_search_hand_computed(spark):
    """BM25 on a 3-doc corpus against hand-computed scores (Robertson
    idf, k1=1.2, b=0.75); non-matching docs absent; empty query
    rejected."""
    import math

    import pytest as _pytest

    from ixmp_spark.operators.text import bm25_search

    docs = [
        (1, "spark shuffle join"),          # dl 3, tf(join)=1
        (2, "join join broadcast hints"),   # dl 4, tf(join)=2
        (3, "catalyst optimizer"),          # no hit
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score"], r["n_hits"])
        for r in bm25_search(df, "doc_id", "text", ["join"], k=10).collect()
    }
    assert set(got) == {1, 2}

    def bm25(tf, dl, n=3.0, dfr=2.0, avgdl=3.0, k1=1.2, b=0.75):
        idf = math.log(1 + (n - dfr + 0.5) / (dfr + 0.5))
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert got[1] == (bm25(1, 3), 1)
    assert got[2] == (bm25(2, 4), 1)  # n_hits counts distinct terms
    assert got[2][0] > got[1][0]      # higher tf wins despite longer doc
    with _pytest.raises(ValueError):
        bm25_search(df, "doc_id", "text", [])


def test_zscore_anomalies_semantics(spark):
    """A spike after a stable baseline flags; the baseline never includes
    the current value; short history and zero variance give NULL z and
    no flag."""
    from datetime import datetime

    from ixmp_spark.operators.sessions import zscore_anomalies

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = (
        # user 1: stable 10s then a spike at 100
        [(i, 1, ts(i), 10.0 + (i % 2) * 0.2) for i in range(1, 7)]
        + [(7, 1, ts(7), 100.0)]
        # user 2: constant series (zero variance) then a jump
        + [(10 + i, 2, ts(10 + i), 5.0) for i in range(6)]
        + [(17, 2, ts(17), 50.0)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r["event_id"]: r
        for r in zscore_anomalies(df, window=5, threshold=2.0).collect()
    }
    assert out[7]["is_anomaly"] is True and out[7]["z"] > 2
    assert out[1]["z"] is None and out[1]["is_anomaly"] is False  # no history
    # zero-variance baseline: z NULL, not flagged, no division error
    assert out[17]["z"] is None and out[17]["is_anomaly"] is False
    # stable rows are unflagged
    assert all(not out[i]["is_anomaly"] for i in range(2, 7))


def test_top_paths_hand_computed(spark):
    """Three-step journeys on a hand-checkable event set: complete paths
    only (no partial windows), counts aggregated across users,
    length < 2 rejected."""
    from datetime import datetime

    import pytest as _pytest

    from ixmp_spark.operators.sessions import top_paths

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1: a b c d  -> paths "a>b>c", "b>c>d"
        (1, 1, ts(1), "a"), (2, 1, ts(2), "b"),
        (3, 1, ts(3), "c"), (4, 1, ts(4), "d"),
        # user 2: a b c    -> path "a>b>c"
        (5, 2, ts(1), "a"), (6, 2, ts(2), "b"), (7, 2, ts(3), "c"),
        # user 3: two events only -> no length-3 path
        (8, 3, ts(1), "a"), (9, 3, ts(2), "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["path"]: r["n"] for r in top_paths(df, length=3).collect()}
    assert got == {"a > b > c": 2, "b > c > d": 1}
    with _pytest.raises(ValueError):
        top_paths(df, length=1)


def test_clone_distributed_ts_never_stages_on_driver(spark, tmp_path, monkeypatch):
    """Cloning a bulk-TS run takes the distributed path (r6 verdict #3):
    ts_data above the row threshold clones as a Spark plan — read the
    committed parquet, stamp the new run_id, apply keep_solution /
    shift_first_model_year as Spark predicates, distributed write at
    commit. Proven two ways: (1) DataFrame.toPandas is patched to raise
    for the duration of every clone call — any driver materialization
    fails the test; (2) the warehouse's pandas reader (read_table) is
    spied and must never be asked for the SOURCE run's ts_data. Values
    and the shift predicate are pinned against the source."""
    import pandas as pd
    from pyspark.sql import DataFrame as SparkDF

    from ixmp_spark.core import Platform, Scenario
    from ixmp_spark.sources.warehouse import LocalWarehouse

    mp = Platform(spark, str(tmp_path / "wh"))
    mp.add_region("World", "common")
    mp.add_unit("GWa")
    s = Scenario(mp, "bulk_model", "bulk_scen", version="new")
    n = 1_000_000
    sdf = spark.range(n).select(
        F.lit("World").alias("region"),
        F.concat(F.lit("v"), (F.col("id") / 30).cast("long").cast("string")).alias("variable"),
        F.lit("GWa").alias("unit"),
        (F.lit(2000) + (F.col("id") % 30)).cast("int").alias("year"),
        (F.col("id") % 997 * 0.001).alias("value"),
    )
    s.add_timeseries_bulk(sdf)
    s.commit("bulk ingest")
    assert mp.wh.table_num_rows(s.run_id, "ts_data") == n

    reads: list[tuple[int, str]] = []
    orig_read = LocalWarehouse.read_table
    monkeypatch.setattr(
        LocalWarehouse,
        "read_table",
        lambda self, run_id, table: (
            reads.append((run_id, table)),
            orig_read(self, run_id, table),
        )[1],
    )

    def boom(self, *a, **k):
        raise AssertionError("clone staged a Spark frame through the driver")

    monkeypatch.setattr(SparkDF, "toPandas", boom)
    full = s.clone()
    shifted = s.clone(keep_solution=False, shift_first_model_year=2010)
    monkeypatch.undo()

    assert (s.run_id, "ts_data") not in reads  # source TS never hit pandas
    src_path = mp.wh.table_path(s.run_id, "ts_data")
    got_full = spark.read.parquet(mp.wh.table_path(full.run_id, "ts_data"))
    assert got_full.count() == n
    assert set(r["run_id"] for r in got_full.select("run_id").distinct().collect()) == {full.run_id}
    src = spark.read.parquet(src_path)
    assert (
        got_full.agg(F.round(F.sum("value"), 3)).first()[0]
        == src.agg(F.round(F.sum("value"), 3)).first()[0]
    )
    got_shift = spark.read.parquet(mp.wh.table_path(shifted.run_id, "ts_data"))
    want_rows = src.where("meta OR year < 2010").count()
    assert got_shift.count() == want_rows > 0
    assert got_shift.where("NOT meta AND year >= 2010").count() == 0
    assert mp.wh.table_num_rows(shifted.run_id, "sol_data") == 0


def test_dsir_logratio_hand_computed(spark):
    """DSIR scores on a 4-doc corpus against hand-computed smoothed
    log-ratios, plus: the hashed-feature variant with a collision-free
    bucket count reproduces the exact scores (hashing only merges
    counts; with no collisions the models are identical)."""
    import math

    from ixmp_spark.operators.text import dsir_logratio

    rows = [
        (0, "spark spark table", True),
        (1, "spark table", True),
        (2, "goat goat table", False),
        (3, "spark goat", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logratio"])
        for r in dsir_logratio(df, "doc_id", "text", F.col("tgt")).collect()
    }
    # counts: target: spark=3, table=2 (nt=5); raw: goat=3, spark=1,
    # table=1 (nr=5); vocab=3
    def lw(ct, cr):
        return math.log(((ct + 1.0) / (5 + 3.0)) / ((cr + 1.0) / (5 + 3.0)))

    w = {"spark": lw(3, 1), "table": lw(2, 1), "goat": lw(0, 3)}
    exp = {
        0: (3, (2 * w["spark"] + w["table"]) / 3),
        1: (2, (w["spark"] + w["table"]) / 2),
        2: (3, (2 * w["goat"] + w["table"]) / 3),
        3: (2, (w["spark"] + w["goat"]) / 2),
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-6)

    hashed = {
        r["doc_id"]: r["logratio"]
        for r in dsir_logratio(
            df, "doc_id", "text", F.col("tgt"), hash_buckets=1 << 30
        ).collect()
    }
    assert hashed == {k: got[k][1] for k in got}

    # cache_counts=True (the cluster one-pass form) is result-identical
    # to the default recompute shape, and its persisted counts frame is
    # releasable (the t9 cache_tf contract, mirrored after the r14
    # unconditional persist regressed the local bench)
    from ixmp_spark.operators import release_cache

    cached_df = dsir_logratio(
        df, "doc_id", "text", F.col("tgt"), cache_counts=True
    )
    cached = {
        r["doc_id"]: (r["n_tokens"], r["logratio"])
        for r in cached_df.collect()
    }
    assert cached == got
    handles = getattr(cached_df, "_ixmp_spark_caches", ())
    assert len(handles) == 1
    release_cache(cached_df, blocking=True)
    assert all(h.storageLevel.useMemory is False for h in handles)


def test_canonical_url_table_and_idempotence(spark):
    """canonical_url: documented equivalences hold, non-URLs pass
    through trimmed, and the function is idempotent (canonicalizing a
    canonical form is the identity)."""
    from ixmp_spark.operators.dedup import canonical_url

    cases = [
        ("HTTP://WWW.Site.COM:80/A/b/?z=1&a=2#frag", "http://site.com/A/b?a=2&z=1"),
        ("https://site.com:443/a/", "https://site.com/a"),
        ("https://site.com/a?utm_source=x&utm_campaign=y", "https://site.com/a"),
        ("https://site.com/a?gclid=1&q=spark&fbclid=2&ref=hn",
         "https://site.com/a?q=spark"),
        ("https://site.com/", "https://site.com"),
        ("https://site.com:8443/a", "https://site.com:8443/a"),
        ("  not a url  ", "not a url"),
        ("ftp://Host.com:443/x", "ftp://host.com:443/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["c"] for r in
           df.select(canonical_url("u").alias("c")).collect()]
    assert got == [c for _, c in cases]
    again = [
        r["c"]
        for r in spark.createDataFrame([(c,) for c in got], "u string")
        .select(canonical_url("u").alias("c"))
        .collect()
    ]
    assert again == got


def test_url_dedup_collapses_variants(spark):
    """url_dedup groups the messy and clean variants of the same page
    under one canonical key and keeps the min id."""
    from ixmp_spark.operators.dedup import url_dedup

    rows = [
        (1, "https://a.com/p/1?a=1&b=2"),
        (2, "HTTPS://WWW.A.COM:443/p/1/?b=2&a=1&utm_source=f#x"),
        (3, "https://a.com/p/2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["canonical_url"]: (r["n_docs"], r["keep_id"])
        for r in url_dedup(df, "doc_id", "url").collect()
    }
    assert got == {
        "https://a.com/p/1?a=1&b=2": (2, 1),
        "https://a.com/p/2": (1, 3),
    }


def test_prototype_prune_planted_structure(spark):
    """D4 prototypicality pruning: in a cluster holding a tight
    replica core plus diffuse satellites, the pruned (kept=false) set
    is dominated by the core — near-centroid redundancy is what goes."""
    import math
    import random

    from ixmp_spark.operators.similarity import prototype_prune

    rng = random.Random(7)
    d = 16
    base = [1.0] + [0.0] * (d - 1)
    far = [0.0] * (d - 1) + [1.0]
    rows = []
    # tight core: 20 near-replicas of base
    for i in range(20):
        rows.append((i, [b + rng.gauss(0, 0.005) for b in base]))
    # diffuse satellites of base
    for i in range(20):
        v = [b + rng.gauss(0, 0.4) for b in base]
        rows.append((100 + i, v))
    # a second, far-away blob so k=2 separates cleanly
    for i in range(20):
        rows.append((200 + i, [x + rng.gauss(0, 0.1) for x in far]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = prototype_prune(
        emb, "vec_id", "embedding", n_clusters=2, prune_frac=0.5
    ).collect()
    pruned = {r["vec_id"] for r in out if not r["kept"]}
    core_pruned = sum(1 for i in range(20) if i in pruned)
    satellites_pruned = sum(1 for i in range(20) if 100 + i in pruned)
    assert core_pruned >= 15, (core_pruned, satellites_pruned)
    assert core_pruned > satellites_pruned
    # prune_frac=0.5 drops about half of each cluster, never everything
    kept = [r for r in out if r["kept"]]
    assert 0 < len(kept) < len(rows)


def test_prototype_prune_count_cutoff_edges(spark):
    """The cutoff is count-based (floor(frac*n) pruned per cluster), so
    the percent_rank edge cases are gone: a singleton cluster survives
    any frac<1, frac=0 prunes nothing, frac=1 prunes everything, and a
    2-row cluster at frac=0.25 prunes zero rows (floor(0.5)=0)."""
    import random

    from ixmp_spark.operators.similarity import prototype_prune

    rng = random.Random(3)
    d = 8
    rows = [(0, [1.0] + [0.0] * (d - 1))]  # singleton-ish blob A
    rows += [
        (10 + i, [0.0] * (d - 1) + [1.0 + rng.gauss(0, 0.01)])
        for i in range(9)
    ]  # blob B: 9 rows
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def prune_sets(frac):
        out = prototype_prune(
            emb, "vec_id", "embedding", n_clusters=2, prune_frac=frac
        ).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster"], []).append(r)
        return out, by_cluster

    out, by_cluster = prune_sets(0.25)
    sizes = sorted(len(v) for v in by_cluster.values())
    assert sizes == [1, 9]
    for rows_c in by_cluster.values():
        n = len(rows_c)
        pruned = sum(1 for r in rows_c if not r["kept"])
        assert pruned == int(0.25 * n)  # 1-row cluster: 0; 9-row: 2
    # frac=0: nothing pruned; frac=1: everything pruned
    out0, _ = prune_sets(0.0)
    assert all(r["kept"] for r in out0)
    out1, _ = prune_sets(1.0)
    assert not any(r["kept"] for r in out1)


def test_choose_bucket_rate_adaptive(spark):
    """choose_bucket walks the ladder coarse → fine: None ("don't
    chunk") when the plain plan's hottest whole-key partition already
    fits the cap, else the coarsest granularity whose hottest (key,
    bucket) partition fits, falling back to the finest when nothing
    does."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import choose_bucket

    t0 = datetime(2024, 6, 1, 8, 0, 0)
    # one hot key: 5000 events spread uniformly over 10 hours
    rows = [
        (i, t0 + timedelta(seconds=(i * 7) % 36000), 7, "a", 1.0)
        for i in range(5000)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    # whole key holds all 5000 → a 10k cap needs NO chunking at all
    assert choose_bucket(ev, "user_id", "ts", max_rows_per_task=10_000) is None
    # day also holds all 5000; hour ~500; minute ~9
    assert choose_bucket(ev, "user_id", "ts", max_rows_per_task=4_000) == "hour"
    assert choose_bucket(ev, "user_id", "ts", max_rows_per_task=1_000) == "hour"
    assert choose_bucket(ev, "user_id", "ts", max_rows_per_task=50) == "minute"
    # nothing fits: fall back to the finest rather than refuse
    assert choose_bucket(ev, "user_id", "ts", max_rows_per_task=1) == "minute"
    # the SPEED term: with the floor lowered, the target becomes
    # hottest_key / parallelism (~156 here), so the ladder keeps
    # drilling past hour (~500/chunk) to minute — splitting the hot key
    # across cores, not merely under the memory cap
    assert choose_bucket(
        ev, "user_id", "ts", max_rows_per_task=4_000, min_chunk_rows=1
    ) == "minute"
    # multi-day key: whole key 5000 > cap, per-day 1000 fits → "day"
    rows_md = [
        (i, t0 + timedelta(days=i % 5, seconds=(i * 7) % 36000), 7, "a", 1.0)
        for i in range(5000)
    ]
    ev_md = spark.createDataFrame(
        rows_md,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    assert choose_bucket(ev_md, "user_id", "ts", max_rows_per_task=2_000) == "day"


def test_chunked_auto_bucket_equals_plain(spark):
    """bucket='auto' keeps outputs identical to the plain forms — and on
    a uniform (unskewed) corpus it resolves to None, i.e. auto TAKES the
    plain path instead of paying the chunked boundary-healing constant
    (~6× on uniform 10M-row z-score, REHEARSAL_events_r7)."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import (
        choose_bucket,
        event_transitions,
        sessionize,
        zscore_anomalies,
    )

    t0 = datetime(2024, 6, 1)
    rows = [
        (i, t0 + timedelta(minutes=i * 37 % 5000), i % 3,
         "ev" + str(i % 4), float(i % 11))
        for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    # uniform corpus, default cap: auto must answer "don't chunk"
    assert choose_bucket(ev, "user_id", "ts") is None
    a = sessionize(ev, "user_id", "ts", 1800, "event_id")
    b = sessionize(ev, "user_id", "ts", 1800, "event_id", bucket="auto")
    key = lambda r: (r["event_id"], r["session_id"])  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))

    p = event_transitions(ev, k=1000).collect()
    c = event_transitions(ev, k=1000, bucket="auto").collect()
    assert sorted(map(tuple, p)) == sorted(map(tuple, c))

    zp = zscore_anomalies(ev, window=4).collect()
    zc = zscore_anomalies(ev, window=4, bucket="auto").collect()
    assert sorted(map(tuple, zp)) == sorted(map(tuple, zc))


def test_perplexity_buckets_equal_frequency(spark, sf_dir):
    """CCNet bucketing: within each language the tier sizes are
    equal-frequency (ntile contract: sizes differ by at most 1), every
    scored document lands in a tier, and sub-2-token documents are
    excluded (no bigrams to score)."""
    from collections import Counter

    from ixmp_spark.operators.text import perplexity_buckets

    docs = load(spark, sf_dir, "documents")
    out = perplexity_buckets(docs, "doc_id", "text", "lang").collect()
    assert out and all(1 <= r["bucket"] <= 3 for r in out)
    per_lang = {}
    for r in out:
        per_lang.setdefault(r["lang"], Counter())[r["bucket"]] += 1
    for lang, sizes in per_lang.items():
        vals = [sizes.get(b, 0) for b in (1, 2, 3)]
        assert max(vals) - min(vals) <= 1, (lang, vals)


def test_bm25_index_partition_pruning_and_equality(spark, sf_dir, tmp_path):
    """The WRITTEN inverted index prunes at the storage layer (shard is
    a PartitionFilter, term a pushed parquet filter) and returns
    exactly what the scan-everything bm25_search returns on the same
    corpus and query."""
    import glob

    from ixmp_spark.operators.text import (
        bm25_index_search,
        bm25_index_write,
        bm25_search,
    )
    from tools.audit_plans import formatted_plan

    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "bm25_idx")
    bm25_index_write(docs, idx, "doc_id", "text", n_shards=16)
    assert len(glob.glob(idx + "/postings/shard=*")) > 4

    q = ["spark", "join", "window"]
    got = bm25_index_search(spark, idx, q, "doc_id", k=10)
    fplan = formatted_plan(got)
    assert "PartitionFilters: [" in fplan
    assert "shard" in fplan.split("PartitionFilters:")[1].splitlines()[0]
    # the term filter reaches parquet as a pushed filter, not post-scan
    assert "PushedFilters:" in fplan and "term" in fplan.split("PushedFilters:")[1].splitlines()[0]

    want = bm25_search(docs, "doc_id", "text", q, k=10).collect()
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want]


def test_bm25_index_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Appending documents to a written index produces EXACTLY the index
    a full rebuild on the union produces: identical postings rows
    (df_t corrected for grown terms, untouched for the rest), identical
    _stats (sum_dl accumulates exactly in integers), identical search
    results — while rewriting only the affected shard directories."""
    import os

    from ixmp_spark.operators.text import (
        bm25_index_append,
        bm25_index_search,
        bm25_index_write,
    )

    docs = load(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    inc = str(tmp_path / "bm25_inc")
    full = str(tmp_path / "bm25_full")
    bm25_index_write(old, inc, "doc_id", "text", n_shards=16)
    # watermark an untouched shard file's mtime to prove it survives
    import glob as g

    pre_files = {p: os.path.getmtime(p)
                 for p in g.glob(inc + "/postings/shard=*/*.parquet")}
    bm25_index_append(new, inc, "doc_id", "text")
    bm25_index_write(docs, full, "doc_id", "text", n_shards=16)

    # any shard NONE of the new docs' terms hash into must be untouched
    # (file-identical) — partition-level rewrite, not a full rebuild
    new_shards = {
        r["s"]
        for r in new.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t")
        )
        .where(F.col("t") != "")
        .select(F.pmod(F.xxhash64("t"), F.lit(16)).alias("s"))
        .distinct()
        .collect()
    }
    for p, mtime in pre_files.items():
        shard = int(p.split("shard=")[1].split("/")[0])
        if shard not in new_shards:
            assert os.path.getmtime(p) == mtime, p

    def canon(path):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(path + "/postings")
            .select("term", "doc_id", "tf", "dl", "df_t", "shard")
            .collect()
        )

    assert canon(inc) == canon(full)
    si = spark.read.parquet(inc + "/_stats").collect()[0]
    sf = spark.read.parquet(full + "/_stats").collect()[0]
    assert (si["n_docs_exact"], si["sum_dl"], si["avgdl"]) == (
        sf["n_docs_exact"], sf["sum_dl"], sf["avgdl"]
    )
    q = ["spark", "join", "window"]
    a = bm25_index_search(spark, inc, q, "doc_id", k=10).collect()
    b = bm25_index_search(spark, full, q, "doc_id", k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_strip_boilerplate_rules(spark):
    """Each keep-rule independently: short lines, letter-poor lines,
    and all-caps lines drop; ordinary prose lines survive with original
    order preserved and counts adding up."""
    from ixmp_spark.operators.text import strip_boilerplate

    prose1 = "the quick brown fox jumps over the lazy dog tonight"
    prose2 = "a second perfectly ordinary sentence with ample letters"
    doc = "\n".join([
        "MENU NAV",                                  # short + caps
        prose1,
        "12345 67890 12345 67890 12345 67890",       # letter-poor, long
        "  " + prose2 + "  ",                        # kept, trimmed
        "THIS ENTIRE LINE IS UPPER CASE SHOUTING",   # caps, long
        "- - - - - - - - - - - - - - - - - - - -",   # separator art
        "short line",                                # < 30 chars
    ])
    out = strip_boilerplate(
        spark.createDataFrame([(1, doc)], "doc_id long, text string"),
        "doc_id", "text",
    ).collect()[0]
    assert out["clean_text"] == prose1 + "\n" + prose2
    assert out["n_lines_kept"] == 2
    assert out["n_lines_dropped"] == 5


def test_pca_whiten_planted_structure(spark):
    """pca_whiten on a corpus with two planted dominant directions:
    the projected dimensions come out unit-variance and uncorrelated,
    and the transform recorded in model_info reproduces the frame's
    whitened vectors (the build/query split works on new data)."""
    import random

    from ixmp_spark.operators.similarity import pca_whiten

    rng = random.Random(11)
    d, n, k = 12, 400, 4
    rows = []
    for i in range(n):
        a, b = rng.gauss(0, 9), rng.gauss(0, 3)  # two dominant axes
        v = [a, b] + [rng.gauss(0, 0.3) for _ in range(d - 2)]
        v = [x + 2.5 for x in v]  # nonzero mean: centering must matter
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, info = pca_whiten(emb, "vec_id", "embedding", k=k)
    got = {r["vec_id"]: r["whitened"] for r in out.collect()}
    assert len(got) == n and all(len(v) == k for v in got.values())
    import statistics

    cols = list(zip(*[got[i] for i in range(n)]))
    for c in cols:
        assert abs(statistics.variance(c) - 1.0) < 0.05
        assert abs(statistics.mean(c)) < 0.05
    # decorrelated: pairwise sample correlation ~ 0
    for i in range(k):
        for j in range(i + 1, k):
            num = sum(x * y for x, y in zip(cols[i], cols[j])) / (n - 1)
            assert abs(num) < 0.1, (i, j, num)
    # the two planted directions dominate the explained variance
    ev = info["explained_variance"]
    assert ev[0] > ev[2] and ev[1] > ev[2]
    assert sum(ev[:2]) > 0.9


def test_pagerank_matches_power_iteration(spark):
    """pagerank on a small directed graph with a dangling node and a
    disconnected pair equals the pure-Python power iteration with the
    same damping/dangling-redistribution rule, to fp tolerance — and
    ranks sum to 1."""
    from ixmp_spark.operators.joins import pagerank

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),            # d has in-degree 0
        ("e", "f"),            # f is dangling (no out-edges)
        ("g", "h"), ("h", "g"),  # disconnected 2-cycle
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, tol=1e-10, max_iter=100).collect()
    }
    # reference power iteration
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    n = len(nodes)
    damping = 0.85
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(200):
        dangling = sum(r for v, r in ranks.items() if v not in out)
        new = {v: (1 - damping) / n + damping * dangling / n for v in nodes}
        for s, ds in out.items():
            share = ranks[s] / len(ds)
            for d in ds:
                new[d] += damping * share
        if sum(abs(new[v] - ranks[v]) for v in nodes) < 1e-12:
            ranks = new
            break
        ranks = new
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - ranks[v]) < 1e-6, (v, got[v], ranks[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # sanity: the hub 'c' outranks the dangling leaf 'f'
    assert got["c"] > got["f"]


def test_pagerank_nonconvergence_raises(spark):
    from ixmp_spark.operators.joins import pagerank

    # asymmetric graph: one round moves mass (delta > 0), so an
    # unreachable tol must raise rather than return a half-iterated rank
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")],
        "src string, dst string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(df, max_iter=1, tol=1e-300)
    # fixed-budget mode: same budget, tol=None returns without raising
    out = pagerank(df, max_iter=1, tol=None)
    assert abs(sum(r["rank"] for r in out.collect()) - 1.0) < 1e-6


def test_strip_common_lines_semantics(spark):
    """Template lines (>= min_docs docs of a group) drop group-wide;
    the same line in ANOTHER group survives when under threshold there;
    order is preserved; a fully-templated doc comes back empty."""
    from ixmp_spark.operators.text import strip_common_lines

    nav = "welcome to our wonderful site enjoy your stay"
    rows = []
    for i in range(3):
        rows.append((i, "s1", f"{nav}\nunique body line number {i} here\n{nav}"))
    rows.append((10, "s2", f"{nav}\nanother body in another group"))
    rows.append((11, "s1", nav))  # all-template doc
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in strip_common_lines(
            df, "doc_id", "text", "source", min_docs=3
        ).collect()
    }
    for i in range(3):
        assert out[i]["clean_text"] == f"unique body line number {i} here"
        assert out[i]["n_lines_dropped"] == 2
    # s2 has only one copy of nav -> kept there
    assert out[10]["clean_text"] == f"{nav}\nanother body in another group"
    assert out[10]["n_lines_dropped"] == 0
    # doc that was ALL template: empty but present
    assert out[11]["clean_text"] == "" and out[11]["n_lines_kept"] == 0


def test_key_trends_exact_line_and_noise(spark):
    """key_trends recovers a planted exact line (slope/intercept exact,
    r2 = 1), flags pure noise with low r2, and drops keys under
    min_points."""
    from datetime import datetime, timedelta
    import random

    from ixmp_spark.operators.sessions import key_trends

    t0 = datetime(2024, 6, 1)
    rng = random.Random(5)
    rows = []
    # key 1: exact line value = 2*t_seconds + 7 (t in steps of 60s)
    for i in range(10):
        rows.append((i, t0 + timedelta(seconds=60 * i), 1, "e", 2.0 * 60 * i + 7.0))
    # key 2: noise around a constant
    for i in range(50):
        rows.append((100 + i, t0 + timedelta(seconds=60 * i), 2, "e", rng.gauss(5, 3)))
    # key 3: only two points -> dropped
    rows.append((900, t0, 3, "e", 1.0))
    rows.append((901, t0 + timedelta(seconds=60), 3, "e", 2.0))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = {r["user_id"]: r for r in key_trends(ev, "user_id", "ts", "value").collect()}
    assert set(out) == {1, 2}
    assert out[1]["slope"] == 2.0 and out[1]["r2"] == 1.0
    base = t0.timestamp()
    assert abs(out[1]["intercept"] - (7.0 - 2.0 * base)) < 1e-4
    assert out[2]["r2"] < 0.3


def test_cusum_matches_sequential_recurrence(spark):
    """cusum_changepoints' window-SQL form (prefix sum + running min,
    the max-drawdown identity) equals the literal sequential recurrence
    S_i = max(0, S_{i-1} + z_i - k) replayed in pure Python with the
    same sample-stddev standardization — and a planted +4σ level shift
    alarms after the shift point, never before it."""
    from datetime import datetime, timedelta
    import math
    import random

    from ixmp_spark.operators.sessions import cusum_changepoints

    t0 = datetime(2024, 3, 1)
    rng = random.Random(11)
    rows = []
    # key 1: 60 quiet rows then 40 shifted by +4 raw units
    for i in range(100):
        v = rng.gauss(0, 1) + (4.0 if i >= 60 else 0.0)
        rows.append((i, t0 + timedelta(seconds=i), 1, v))
    # key 2: pure noise (should never alarm at h=5, k=0.5)
    for i in range(80):
        rows.append((200 + i, t0 + timedelta(seconds=i), 2, rng.gauss(10, 2)))
    # key 3: constant value -> zero stddev -> NULL stats, no alarm
    for i in range(5):
        rows.append((400 + i, t0 + timedelta(seconds=i), 3, 7.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = cusum_changepoints(
        ev, "user_id", "ts", "value", slack_k=0.5, threshold_h=5.0,
        order_cols=("event_id",),
    ).collect()
    got = {r["event_id"]: r for r in out}

    # pure-Python replay per key
    k, h = 0.5, 5.0
    by_key: dict[int, list] = {}
    for eid, _ts, key, v in rows:
        by_key.setdefault(key, []).append((eid, v))
    for key, seq in by_key.items():
        vals = [v for _, v in seq]
        n = len(vals)
        mu = sum(vals) / n
        var = sum((x - mu) ** 2 for x in vals) / (n - 1)
        sd = math.sqrt(var)
        s = t = 0.0
        for eid, v in seq:
            r = got[eid]
            if sd == 0:
                assert r["cusum_high"] is None and r["cusum_low"] is None
                assert r["is_change"] is False
                continue
            z = (v - mu) / sd
            s = max(0.0, s + z - k)
            t = max(0.0, t - z - k)
            assert abs(r["cusum_high"] - s) < 1e-5, (key, eid)
            assert abs(r["cusum_low"] - t) < 1e-5, (key, eid)
            assert r["is_change"] == (s > h or t > h), (key, eid)

    # planted-shift semantics (retrospective baseline: the key mean
    # blends both regimes, so the LOW side flags the below-mean quiet
    # prefix and the HIGH side the shifted suffix — each side localizes
    # its own regime): high-side alarms exist and start only after the
    # shift; low-side alarms exist and stop shortly after it resets
    hi = [e for e in range(100) if (got[e]["cusum_high"] or 0) > 5.0]
    lo = [e for e in range(100) if (got[e]["cusum_low"] or 0) > 5.0]
    assert hi and min(hi) >= 60
    assert lo and min(lo) < 60 and max(lo) < 70
    # key 2 (pure stationary noise) never alarms
    assert not [e for e in range(200, 280) if got[e]["is_change"]]


def test_rrf_fuse_formula_and_absences(spark):
    """rrf_fuse equals the hand-computed RRF formula: overlapping ids
    sum both systems' reciprocal ranks, ids unique to one list carry a
    NULL rank for the other, ordering is (score desc, id), top_n
    truncates, and duplicate system names raise."""
    import pytest

    from ixmp_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "id long, s double"
    )
    b = spark.createDataFrame(
        [(2, 0.99), (4, 0.5), (1, 0.4)], "id long, s double"
    )
    out = rrf_fuse([("a", a, "s"), ("b", b, "s")], "id", k=10)
    rows = out.collect()
    got = {r["id"]: r for r in rows}
    # hand-computed: a ranks 1,2,3 for ids 1,2,3; b ranks 1,2,3 for 2,4,1
    exp = {
        1: 1 / 11 + 1 / 13,
        2: 1 / 12 + 1 / 11,
        3: 1 / 13,
        4: 1 / 12,
    }
    for i, s in exp.items():
        assert abs(got[i]["rrf_score"] - s) < 1e-12
    assert got[3]["rank_b"] is None and got[4]["rank_a"] is None
    assert got[1]["rank_a"] == 1 and got[1]["rank_b"] == 3
    # ordering: 2 (0.1742) > 1 (0.1678) > 4 (0.0833) > 3 (0.0769)
    assert [r["id"] for r in rows] == [2, 1, 4, 3]
    assert [r["id"] for r in
            rrf_fuse([("a", a, "s"), ("b", b, "s")], "id", k=10,
                     top_n=2).collect()] == [2, 1]
    with pytest.raises(ValueError):
        rrf_fuse([("a", a, "s"), ("a", b, "s")], "id")


def test_pareto_frontier_dominance_edges(spark):
    """pareto_frontier equals the brute-force strict-dominance
    definition on a frame engineered for the edges: duplicate points
    (tie, both flag), same-x different-y (only max-y flags), same-y
    different-x (only max-x flags), a dominated interior, NULLs never
    flag — checked at buckets=1 (degenerate single bucket) and
    buckets=4 (cross-bucket carries)."""
    from ixmp_spark.operators.sampling import pareto_frontier

    pts = [
        (1, 1.0, 9.0), (2, 5.0, 5.0), (3, 9.0, 1.0),    # frontier arc
        (4, 5.0, 5.0),      # duplicate of 2: tie, flags too
        (5, 5.0, 4.0),      # same x as 2, lower y: dominated
        (6, 4.0, 5.0),      # same y as 2, lower x: dominated
        (7, 2.0, 2.0),      # interior
        (8, 9.0, 1.0),      # duplicate of 3
        (9, None, 99.0),    # NULL x
        (10, 99.0, None),   # NULL y
        (11, 9.5, 0.5),     # new max x, low y: frontier
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")

    def brute(pts):
        ok = set()
        clean = [(i, x, y) for i, x, y in pts if x is not None and y is not None]
        for i, x, y in clean:
            dom = any(
                bx >= x and by >= y and (bx > x or by > y)
                for j, bx, by in clean if j != i
            )
            if not dom:
                ok.add(i)
        return ok

    expect = brute(pts)
    for b in (1, 4):
        got = {
            r["id"]
            for r in pareto_frontier(df, "x", "y", buckets=b).collect()
            if r["on_frontier"]
        }
        assert got == expect, (b, got, expect)


def test_domain_blocklist_label_boundaries(spark):
    """flag_blocked_domains matches on dot-label boundaries only:
    exact host and any-depth subdomains block, lookalike supersets
    (notbad.example.com) and substrings never do; host extraction
    strips credentials, port, trailing FQDN dot; non-URLs yield ''
    and pass."""
    from ixmp_spark.operators.dedup import flag_blocked_domains

    rows = [
        (1, "https://bad.example.com/x"),             # exact
        (2, "https://a.b.bad.example.com/"),          # deep subdomain
        (3, "https://notbad.example.com/x"),          # lookalike: pass
        (4, "https://bad.example.com.evil.io/"),      # suffix-spoof: pass
        (5, "http://user:pw@BAD.Example.COM:8080/p"), # creds+port+case
        (6, "https://bad.example.com./x"),            # FQDN dot
        (7, "not a url at all"),                      # shapeless: pass
        (8, "https://good.example.org/x"),            # unlisted: pass
    ]
    docs = spark.createDataFrame(rows, "id long, url string")
    bl = spark.createDataFrame([("bad.example.com",)], "domain string")
    out = {r["id"]: r for r in
           flag_blocked_domains(docs, "id", "url", bl).collect()}
    assert {i for i in out if out[i]["blocked"]} == {1, 2, 5, 6}
    assert out[5]["host"] == "bad.example.com"
    assert out[6]["host"] == "bad.example.com"
    assert out[7]["host"] == ""


def test_scd2_merge_semantics(spark):
    """scd2_merge on a hand-built dimension: change closes + reopens,
    equal update no-ops, NULL→value and value→NULL count as changes
    (null-safe comparison), unseen key inserts, expired rows pass
    through byte-identical."""
    from ixmp_spark.operators.versioning import scd2_merge

    hist = spark.createDataFrame(
        [
            # key 1: will change (val 10 -> 20)
            (1, 10.0, "1992-01-01", None, True),
            # key 1 expired history: must pass through
            (1, 5.0, "1990-01-01", "1992-01-01", False),
            # key 2: equal update -> no-op
            (2, 7.0, "1992-01-01", None, True),
            # key 3: no update -> untouched
            (3, 3.0, "1992-01-01", None, True),
            # key 4: NULL -> 1.0 is a change
            (4, None, "1992-01-01", None, True),
            # key 5: 9.0 -> NULL is a change
            (5, 9.0, "1992-01-01", None, True),
        ],
        "k long, val double, valid_from string, valid_to string,"
        " is_current boolean",
    )
    upd = spark.createDataFrame(
        [
            (1, 20.0, "2024-06-01"),
            (2, 7.0, "2024-06-01"),
            (4, 1.0, "2024-06-01"),
            (5, None, "2024-06-01"),
            (99, 42.0, "2024-06-01"),  # brand new
        ],
        "k long, val double, valid_from string",
    )
    out = scd2_merge(hist, upd, ["k"], ["val"]).collect()
    rows = {(r["k"], r["valid_from"]): r for r in out}
    assert len(out) == len(rows) == 10
    # key 1: expired passthrough + closed old + new current
    assert rows[(1, "1990-01-01")]["valid_to"] == "1992-01-01"
    closed = rows[(1, "1992-01-01")]
    assert closed["val"] == 10.0 and closed["valid_to"] == "2024-06-01"
    assert closed["is_current"] is False
    new1 = rows[(1, "2024-06-01")]
    assert new1["val"] == 20.0 and new1["valid_to"] is None
    assert new1["is_current"] is True
    # keys 2 and 3: single untouched current row
    for k in (2, 3):
        r = rows[(k, "1992-01-01")]
        assert r["is_current"] is True and r["valid_to"] is None
    # null transitions are changes, both directions
    assert rows[(4, "2024-06-01")]["val"] == 1.0
    assert rows[(4, "1992-01-01")]["is_current"] is False
    assert rows[(5, "2024-06-01")]["val"] is None
    assert rows[(5, "1992-01-01")]["is_current"] is False
    # fresh insert
    fresh = rows[(99, "2024-06-01")]
    assert fresh["val"] == 42.0 and fresh["is_current"] is True


def test_triangle_count_known_structures(spark):
    """triangle_count on a graph with known answers: a K4 (4 triangles,
    every node in 3), a triangle sharing one node with it, a 3-path and
    an isolated star (0 triangles each); self-loops and duplicate /
    reversed edges must not change counts."""
    from ixmp_spark.operators.joins import triangle_count

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    extra = [("d", "e"), ("e", "f"), ("d", "f")]   # triangle d-e-f
    path = [("p", "q"), ("q", "r")]                # no triangle
    star = [("s", x) for x in ("s1", "s2", "s3")]  # no triangle
    noise = [("a", "a"), ("b", "a"), ("c", "b"), ("a", "b")]
    edges = spark.createDataFrame(
        k4 + extra + path + star + noise, "src string, dst string"
    )
    got = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}
    expect = {
        "a": 3, "b": 3, "c": 3,            # K4 corners
        "d": 4,                             # 3 in K4 + 1 in d-e-f
        "e": 1, "f": 1,
        "p": 0, "q": 0, "r": 0,
        "s": 0, "s1": 0, "s2": 0, "s3": 0,
    }
    assert got == expect


def test_fuzzy_key_join_exact_semantics(spark):
    """Deletion-neighborhood fuzzy join finds EXACTLY the pairs within
    Levenshtein 1 — insert, delete, substitute, and exact matches — and
    none beyond; equal to the brute-force definition on a corpus with
    ambiguous near-collisions."""
    from ixmp_spark.operators.joins import fuzzy_key_join

    lnames = ["alpha", "beta", "gamma", "delta", "kappa", "a"]
    rnames = [
        "alpha",    # exact
        "alpa",     # deletion
        "betaa",    # insertion
        "gamna",    # substitution
        "dleta",    # transposition = distance 2 -> NOT matched
        "zz",       # unrelated
        "",         # empty: distance 1 from "a"
    ]
    lf = spark.createDataFrame([(i, n) for i, n in enumerate(lnames)],
                               "lid long, name string")
    rf = spark.createDataFrame([(i, n) for i, n in enumerate(rnames)],
                               "rid long, name string")
    got = sorted(
        (r["lid"], r["rid"], r["edit_distance"])
        for r in fuzzy_key_join(lf, rf, "name", "name").collect()
    )
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[-1]

    want = sorted(
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.product(
            enumerate(lnames), enumerate(rnames)
        )
        if lev(a, b) <= 1
    )
    assert got == want and len(got) >= 5
    with pytest.raises(NotImplementedError):
        fuzzy_key_join(lf, rf, "name", "name", max_edits=2)


def test_cluster_representatives_semantics(spark):
    """Best-by-score survives per cluster (tie -> min id), singletons
    keep themselves, and the audit frame retains every loser."""
    from ixmp_spark.operators.dedup import cluster_representatives

    docs = spark.createDataFrame(
        [(1, 0.9), (2, 0.95), (3, 0.95), (7, 0.1)],
        "doc_id long, quality double",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, cluster long"
    )
    out = {
        r["doc_id"]: r
        for r in cluster_representatives(
            docs, labels, "doc_id", "quality"
        ).collect()
    }
    assert len(out) == 4                      # audit trail: all rows
    assert out[2]["kept"] and not out[1]["kept"] and not out[3]["kept"]
    assert out[7]["kept"] and out[7]["cluster"] == 7  # singleton


def test_corpus_drift_psi_semantics(spark):
    """PSI ~ 0 for identical snapshots; grows with a planted
    categorical shift; numeric edge-clamping puts out-of-range B values
    in the boundary bins instead of dropping them."""
    from ixmp_spark.operators.sampling import corpus_drift

    a = spark.createDataFrame(
        [(i, "en" if i % 4 else "de", float(10 + i % 50)) for i in range(400)],
        "doc_id long, lang string, x double",
    )
    same = {
        r["column"]: r["psi"]
        for r in corpus_drift(a, a, ["x"], ["lang"]).collect()
    }
    assert all(abs(v) < 1e-6 for v in same.values())
    # planted shift: half of B flips to 'fr', x shifted far out of range
    b = a.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("fr")).otherwise(
            F.col("lang")
        ).alias("lang"),
        (F.col("x") + 1000.0).alias("x"),
    )
    moved = {
        (r["column"]): (r["psi"], r["n_bins_used"])
        for r in corpus_drift(a, b, ["x"], ["lang"]).collect()
    }
    assert moved["lang"][0] > 0.25      # categorical shift detected
    assert moved["x"][0] > 0.25         # everything clamped to top bin
    assert moved["x"][1] <= 10          # clamping kept the bin count


def test_fix_mojibake_repair_and_guard(spark):
    """fix_mojibake inverts Latin-1 AND cp1252 mojibake (single and,
    with passes=2, double encoding), while the validity guard leaves
    legitimate accents, dangling lead bytes, and plain ASCII untouched
    -- and the ANSI decode never raises on any of them."""
    from ixmp_spark.operators.text import fix_mojibake

    cases = [
        # (input, expected after 1 pass, expected after 2 passes)
        ("caf\u00c3\u00a9", "caf\u00e9", "caf\u00e9"),
        ("na\u00c3\u00af" "ve \u00c3\u00bcber",
         "na\u00efve \u00fcber", "na\u00efve \u00fcber"),
        # cp1252: curly quotes, euro, em-dash, CJK
        ("\u00e2\u20ac\u0153q\u00e2\u20ac\u009d",
         "\u201cq\u201d", "\u201cq\u201d"),
        ("\u00e4\u00b8\u00adq", "\u4e2dq", "\u4e2dq"),
        ("\u00e2\u201a\u00ac5 \u00e2\u20ac\u201d ok",
         "\u20ac5 \u2014 ok", "\u20ac5 \u2014 ok"),
        # double-encoded through pure Latin-1
        ("caf\u00c3\u0083\u00c2\u00a9", "caf\u00c3\u00a9",
         "caf\u00e9"),
        # guard: legit accent, dangling lead byte, ASCII
        ("caf\u00e9", "caf\u00e9", "caf\u00e9"),
        ("abc\u00c3", "abc\u00c3", "abc\u00c3"),
        ("plain", "plain", "plain"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(cases)], "id long, s string"
    )
    got = {
        r["id"]: (r["f1"], r["f2"])
        for r in df.select(
            "id",
            fix_mojibake("s").alias("f1"),
            fix_mojibake("s", passes=2).alias("f2"),
        ).collect()
    }
    for i, (_, e1, e2) in enumerate(cases):
        assert got[i] == (e1, e2), (i, got[i], (e1, e2))


def test_mad_outliers_breakdown_resistance(spark):
    """mad_outliers equals a statistics.median replay, flags a gross
    spike that the MEAN z-score (w10 family) masks when a key is 20%
    contaminated, and returns NULL scores on a majority-constant key
    (MAD = 0)."""
    import statistics
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import mad_outliers

    t0 = datetime(2024, 1, 1)
    rows = []
    # key 1: 40 quiet values around 10 +/- small det. wiggle, 10
    # contaminated at 1000 (20%) -> stddev explodes, MAD does not
    for i in range(40):
        rows.append((i, t0 + timedelta(seconds=i), 1, 10.0 + (i % 5) * 0.1))
    for i in range(40, 50):
        rows.append((i, t0 + timedelta(seconds=i), 1, 1000.0))
    # key 2: constant -> MAD 0 -> NULLs
    for i in range(100, 105):
        rows.append((i, t0 + timedelta(seconds=i), 2, 3.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: r
           for r in mad_outliers(ev, "user_id", "value").collect()}

    k1 = [v for _, _, k, v in rows if k == 1]
    med = statistics.median(k1)
    mad = statistics.median([abs(v - med) for v in k1])
    for eid, _, k, v in rows:
        r = got[eid]
        if k == 2:
            assert r["mod_z"] is None and r["is_outlier"] is False
            continue
        mz = (v - med) / (1.4826 * mad)
        assert abs(r["mod_z"] - mz) < 1e-5
        assert r["is_outlier"] == (abs(mz) > 3.5)
    # the contaminated points DO flag under MAD...
    assert all(got[i]["is_outlier"] for i in range(40, 50))
    # ...but would NOT under mean/stddev z at the same threshold:
    mean = sum(k1) / len(k1)
    sd = statistics.stdev(k1)
    assert all(abs((v - mean) / sd) < 3.5 for v in k1)


def test_char_entropy_matches_counter(spark):
    """char_entropy's sorted-run fold equals the Counter-based
    definition on hand-picked and random strings; degenerate cases
    (uniform, empty, single char) pin the boundaries and a base64-ish
    blob scores far above repeated template text."""
    import math
    import random
    from collections import Counter

    from ixmp_spark.operators.text import char_entropy

    rng = random.Random(3)
    blob = "".join(rng.choice(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    ) for _ in range(400))
    template = "click here to continue " * 20
    cases = ["aaaa", "abab", "abcd", "", "x",
             "the quick brown fox jumps over the lazy dog",
             blob, template]
    cases += ["".join(rng.choice("abcdef ") for _ in range(rng.randrange(1, 60)))
              for _ in range(20)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "id long, s string"
    )
    got = {r["id"]: r["h"]
           for r in df.select("id", char_entropy("s").alias("h")).collect()}

    def ref(s):
        if not s:
            return None
        n = len(s)
        return -sum((c / n) * math.log2(c / n)
                    for c in Counter(s).values())

    for i, s in enumerate(cases):
        want = ref(s)
        if want is None:
            assert got[i] is None
        else:
            assert abs(got[i] - want) < 1e-9, (i, s, got[i], want)
    assert got[6] > 5.5          # base64 blob
    assert got[7] < got[5] < got[6]   # template < english < blob


def test_zipf_fit_planted_spectrum(spark):
    """zipf_fit recovers a planted power law (slope ~ -1, r2 ~ 1),
    matches a pure-Python OLS replay to 1e-4, and reports a flat
    low-r2 fit on a uniform vocabulary — the corpus-health contrast
    the diagnostic exists for."""
    import math

    from ixmp_spark.operators.text import zipf_fit

    # planted: word w_r appears round(1000/r) times, r = 1..50
    words = []
    for r in range(1, 51):
        words += [f"w{r:03d}"] * round(1000 / r)
    docs = [(i, " ".join(words[i::20])) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = zipf_fit(df, "text", top_n=50).collect()[0]

    # replay: same counts, same ranking, same OLS
    from collections import Counter
    cnt = Counter(words)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    xs = [math.log(r + 1) for r in range(len(top))]
    ys = [math.log(n) for _, n in top]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    syy = sum((y - my) ** 2 for y in ys)
    slope = sxy / sxx
    r2 = sxy * sxy / (sxx * syy)
    assert abs(got["zipf_slope"] - slope) < 1e-4
    assert abs(got["zipf_r2"] - r2) < 1e-4
    assert -1.1 < got["zipf_slope"] < -0.9 and got["zipf_r2"] > 0.95

    flat = spark.createDataFrame(
        [(0, " ".join(f"u{i}" for i in range(100)) * 3)],
        "doc_id long, text string",
    )
    g2 = zipf_fit(flat, "text", top_n=100).collect()[0]
    assert abs(g2["zipf_slope"]) < 0.05  # uniform spectrum: no law


def test_winsorize_and_fd_violations(spark):
    """winsorize clips exactly to the numpy-style interpolated band
    (replayed in pure Python with Spark's percentile formula) and
    leaves NULLs unclipped; fd_violations finds exactly the planted
    multi-valued keys, counting distinct dependent TUPLES (duplicate
    identical rows are not violations, NULL variants count once)."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.joins import fd_violations
    from ixmp_spark.operators.sessions import winsorize

    t0 = datetime(2024, 1, 1)
    vals = [float(v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
    rows = [(i, t0 + timedelta(seconds=i), 1, v) for i, v in enumerate(vals)]
    rows.append((99, t0, 1, None))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: r
           for r in winsorize(ev, "user_id", "value", 0.1, 0.9).collect()}

    def pct(sorted_xs, p):
        # Spark percentile: symmetric weighted interpolation
        pos = (len(sorted_xs) - 1) * p
        lo, hi = int(pos), min(int(pos) + 1, len(sorted_xs) - 1)
        return (hi - pos) * sorted_xs[lo] + (pos - lo) * sorted_xs[hi]

    s = sorted(vals)
    lo_b, hi_b = pct(s, 0.1), pct(s, 0.9)
    for i, v in enumerate(vals):
        r = got[i]
        assert abs(r["lo_bound"] - round(lo_b, 6)) < 1e-9
        assert abs(r["hi_bound"] - round(hi_b, 6)) < 1e-9
        want = min(max(v, lo_b), hi_b)
        assert abs(r["value_winsorized"] - round(want, 6)) < 1e-9
        assert r["was_clipped"] == (want != v)
    assert got[99]["value_winsorized"] is None
    assert got[99]["was_clipped"] is False

    feed = spark.createDataFrame(
        [
            (1, 10), (1, 10),          # duplicate association: clean
            (2, 20), (2, 21),          # violation
            (3, None), (3, None),      # NULL variant, consistent: clean
            (4, 40), (4, None),        # value vs NULL: violation
            (5, 50),
        ],
        "k long, dep long",
    )
    v = {r["k"]: r["n_variants"]
         for r in fd_violations(feed, ["k"], ["dep"]).collect()}
    assert v == {2: 2, 4: 2}


def test_cuped_calibration_kanon(spark):
    """Three readout/release operators pinned: cuped_adjust matches a
    pure-Python replay (theta, residualized means) and actually cuts
    variance on correlated units while preserving the planted lift;
    calibration_table bins edges correctly (score 1.0 folds into the
    top bin, NULLs drop); k_anonymity_filter counts NULL cells as
    cells."""
    import random

    from ixmp_spark.operators.sampling import (
        calibration_table,
        k_anonymity_filter,
    )
    from ixmp_spark.operators.sessions import cuped_adjust

    rng = random.Random(7)
    units = []
    for i in range(400):
        pre = rng.gauss(100, 20)
        arm = i % 2
        post = 0.8 * pre + rng.gauss(0, 5) + (3.0 if arm == 1 else 0.0)
        units.append((i, arm, pre, post))
    units.append((998, 0, None, 5.0))  # dropped
    units.append((999, 1, 5.0, None))  # dropped
    df = spark.createDataFrame(units, "uid long, arm int, pre double, post double")
    got = {r["arm"]: r for r in cuped_adjust(df, "arm", "pre", "post").collect()}

    clean = [(a, p, q) for _, a, p, q in units if p is not None and q is not None]
    n = len(clean)
    mp = sum(p for _, p, _ in clean) / n
    mq = sum(q for _, _, q in clean) / n
    cov = sum((p - mp) * (q - mq) for _, p, q in clean) / (n - 1)
    var = sum((p - mp) ** 2 for _, p, _ in clean) / (n - 1)
    theta = cov / var
    for arm in (0, 1):
        sub = [(p, q) for a, p, q in clean if a == arm]
        madj = sum(q - theta * (p - mp) for p, q in sub) / len(sub)
        assert abs(got[arm]["theta"] - round(theta, 6)) < 1e-9
        assert abs(got[arm]["mean_adj"] - madj) < 1e-4
        assert got[arm]["var_adj"] < got[arm]["var_post"] / 5
    lift_adj = got[1]["mean_adj"] - got[0]["mean_adj"]
    assert 2.0 < lift_adj < 4.0  # planted +3 preserved

    cal = spark.createDataFrame(
        [(0.05, 0.0), (0.12, 0.0), (0.18, 1.0), (1.0, 1.0),
         (0.95, 1.0), (None, 1.0), (0.5, None)],
        "s double, y double",
    )
    rows = {r["bin"]: r for r in calibration_table(cal, "s", "y", 10).collect()}
    assert set(rows) == {0, 1, 9}
    assert rows[9]["n"] == 2 and rows[9]["frac_pos"] == 1.0  # incl. s=1.0
    assert rows[1]["n"] == 2 and rows[1]["frac_pos"] == 0.5
    assert rows[0]["lo"] == 0.0 and rows[0]["hi"] == 0.1

    kd = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 1), (3, "a", 1),
         (4, "b", None), (5, "b", None),
         (6, None, 2)],
        "id long, q1 string, q2 int",
    )
    ka = {r["id"]: r for r in
          k_anonymity_filter(kd, ["q1", "q2"], k=3).collect()}
    assert not ka[1]["suppress"] and ka[1]["cell_size"] == 3
    assert ka[4]["suppress"] and ka[4]["cell_size"] == 2  # NULL cell counted
    assert ka[6]["suppress"] and ka[6]["cell_size"] == 1


def test_temporal_join_version_boundaries(spark):
    """temporal_join picks exactly one version per fact row under the
    half-open convention: a boundary timestamp belongs to the NEWER
    version, NULL valid_to is open-ended, facts before all versions /
    for unknown keys drop (inner) or survive with NULLs (left)."""
    from datetime import datetime

    from ixmp_spark.operators.joins import temporal_join

    dim = spark.createDataFrame(
        [
            (1, "v1", datetime(2020, 1, 1), datetime(2021, 1, 1)),
            (1, "v2", datetime(2021, 1, 1), None),
            (2, "w1", datetime(2020, 6, 1), datetime(2020, 7, 1)),
        ],
        "k long, ver string, valid_from timestamp, valid_to timestamp",
    )
    fact = spark.createDataFrame(
        [
            (10, 1, datetime(2020, 5, 5)),    # v1
            (11, 1, datetime(2021, 1, 1)),    # boundary -> v2
            (12, 1, datetime(2030, 1, 1)),    # open end -> v2
            (13, 1, datetime(2019, 1, 1)),    # before all -> orphan
            (14, 2, datetime(2020, 8, 1)),    # gap after w1 -> orphan
            (15, 9, datetime(2020, 8, 1)),    # unknown key -> orphan
        ],
        "fid long, k long, ts timestamp",
    )
    inner = {r["fid"]: r["ver"] for r in temporal_join(
        fact, dim, "k", "k", "ts").collect()}
    assert inner == {10: "v1", 11: "v2", 12: "v2"}
    left = {r["fid"]: r["ver"] for r in temporal_join(
        fact, dim, "k", "k", "ts", how="left").collect()}
    assert left == {10: "v1", 11: "v2", 12: "v2",
                    13: None, 14: None, 15: None}


def test_lpa_matches_python_replay(spark):
    """lpa_communities equals a pure-Python synchronous replay of the
    same update rule (majority label, ties to min) round for round on
    a two-clique-plus-bridge graph, separates the cliques that
    connected components would merge, and reports convergence."""
    from ixmp_spark.operators.joins import lpa_communities

    k5a = [(f"a{i}", f"a{j}") for i in range(5) for j in range(5) if i < j]
    k5b = [(f"b{i}", f"b{j}") for i in range(5) for j in range(5) if i < j]
    bridge = [("a0", "b0")]
    edges = k5a + k5b + bridge
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["community"], r["converged"])
           for r in lpa_communities(df, max_iter=10).collect()}

    # pure-Python synchronous replay
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(10):
        new = {}
        for n, nbrs in adj.items():
            freq: dict[str, int] = {}
            for m in nbrs:
                freq[labels[m]] = freq.get(labels[m], 0) + 1
            new[n] = min(freq, key=lambda l: (-freq[l], l))
        if new == labels:
            break
        labels = new
    for n in adj:
        assert got[n][0] == labels[n], (n, got[n], labels[n])
    # the bridge must NOT merge the cliques
    a_comm = {got[f"a{i}"][0] for i in range(5)}
    b_comm = {got[f"b{i}"][0] for i in range(5)}
    assert len(a_comm) == 1 and len(b_comm) == 1 and a_comm != b_comm
    assert all(c for _, c in got.values())  # converged


def test_resample_ffill_and_weighted_percentile(spark):
    """resample_ffill equals a pandas resample().mean().ffill() replay
    (grid edges, silent-gap carries, leading NULLs before first
    observation); weighted_percentile equals the cumulative-crossing
    definition replayed in Python, including a heavy-weight row
    dominating p50 and zero-weight rows never being selected."""
    from datetime import datetime, timedelta

    import pandas as pd

    from ixmp_spark.operators.sessions import (
        resample_ffill,
        weighted_percentile,
    )

    t0 = datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 10.0), (2, t0 + timedelta(minutes=10), 20.0),
        (3, t0 + timedelta(hours=3), 30.0),          # 2h silent gap
        (4, t0 + timedelta(hours=3, minutes=20), 50.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, 1, v) for i, ts, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = (
        resample_ffill(ev, "user_id", "ts", "value", 3600)
        .orderBy("bucket_ts").collect()
    )
    pdf = pd.DataFrame(
        [(ts, v) for _, ts, v in rows], columns=["ts", "v"]
    ).set_index("ts")
    want = pdf.resample("1h")["v"].mean().ffill()
    assert len(got) == len(want) == 4
    for r, (ts, v) in zip(got, want.items()):
        assert r["bucket_ts"] == ts.to_pydatetime()
        assert abs(r["value"] - v) < 1e-9
    assert [r["filled"] for r in got] == [False, True, True, False]

    wdf = spark.createDataFrame(
        [
            (1, 1.0, 1.0), (1, 2.0, 1.0), (1, 3.0, 10.0), (1, 4.0, 1.0),
            (2, 5.0, 0.0), (2, 7.0, 1.0),   # zero-weight row not picked
        ],
        "k long, v double, w double",
    )
    wp = {r["k"]: r for r in
          weighted_percentile(wdf, "k", "v", "w", (0.5, 0.99)).collect()}
    # key 1: cum = 1,2,12,13 of 13 -> p50 crosses at v=3 (the heavy row)
    assert wp[1]["wp_0_5"] == 3.0 and wp[1]["wp_0_99"] == 4.0
    assert wp[1]["total_weight"] == 13.0
    # key 2: all weight on v=7
    assert wp[2]["wp_0_5"] == 7.0 and wp[2]["total_weight"] == 1.0


def test_hierarchy_flatten_doubling_and_guards(spark):
    """hierarchy_flatten closes a depth-40 chain in pointer-doubling
    rounds (max_iter=8 suffices: 2^8 >> 40, proving O(log depth)
    not O(depth)), handles a forest with branches, raises on multiple
    parents, and raises on a cycle instead of looping."""
    import pytest

    from ixmp_spark.operators.joins import hierarchy_flatten

    chain = [(i + 1, i) for i in range(40)]            # 0 <- 1 <- ... 40
    tree = [(100, 0), (101, 100), (102, 100), (200, 201)]  # branches + 2nd root
    df = spark.createDataFrame(chain + tree, "child long, parent long")
    out = {r["node"]: (r["root"], r["depth"])
           for r in hierarchy_flatten(df, max_iter=8).collect()}
    assert out[0] == (0, 0)
    assert out[40] == (0, 40)
    assert out[17] == (0, 17)
    assert out[101] == (0, 2) and out[102] == (0, 2)
    assert out[200] == (201, 1) and out[201] == (201, 0)
    assert len(out) == 46

    with pytest.raises(ValueError, match="multiple parents"):
        hierarchy_flatten(spark.createDataFrame(
            [(1, 2), (1, 3)], "child long, parent long"))

    with pytest.raises(RuntimeError, match="did not converge"):
        hierarchy_flatten(spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "child long, parent long"),
            max_iter=6)


def test_histogram_fd_matches_numpy_style(spark):
    """histogram_fd equals a pure-Python Freedman-Diaconis replay
    (same interpolated quartiles, same rounded width, same clamping)
    on a skewed sample; degenerate single-value and zero-IQR inputs
    collapse to one bin covering the spread."""
    import math
    import random

    from ixmp_spark.operators.sampling import histogram_fd

    rng = random.Random(13)
    vals = [rng.expovariate(0.2) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {r["bin"]: r for r in histogram_fd(df, "value").collect()}

    def pct(xs, p):
        pos = (len(xs) - 1) * p
        lo, hi = int(pos), min(int(pos) + 1, len(xs) - 1)
        return (hi - pos) * xs[lo] + (pos - lo) * xs[hi]

    s = sorted(vals)
    h = round(2 * (pct(s, 0.75) - pct(s, 0.25)) / len(s) ** (1 / 3), 6)
    lo, hi = s[0], s[-1]
    nb = min(math.ceil((hi - lo) / h), 10000)
    want: dict[int, int] = {}
    for v in vals:
        b = min(int((v - lo) // h), nb - 1)
        want[b] = want.get(b, 0) + 1
    assert {b: r["n"] for b, r in got.items()} == want
    b0 = got[0]
    assert abs(b0["lo"] - round(lo, 6)) < 1e-9
    assert abs(b0["hi"] - round(lo + h, 6)) < 1e-9

    const = spark.createDataFrame([(5.0,)] * 10, "value double")
    g = histogram_fd(const, "value").collect()
    assert len(g) == 1 and g[0]["n"] == 10 and g[0]["bin"] == 0

    # zero IQR but nonzero spread (outliers beyond flat quartiles)
    z = spark.createDataFrame(
        [(1.0,)] * 50 + [(9.0,)], "value double"
    )
    gz = histogram_fd(z, "value").collect()
    assert len(gz) == 1 and gz[0]["n"] == 51
    assert abs(gz[0]["hi"] - 9.0) < 1e-9


def test_resample_interp_matches_pandas(spark):
    """resample_interp equals pandas resample().mean().interpolate()
    on interior cells (multi-hour gap lerped by time position) and
    keeps edge cells NULL (no extrapolation), with exact observed
    cells passed through unrounded."""
    from datetime import datetime, timedelta

    import pandas as pd

    from ixmp_spark.operators.sessions import resample_interp

    t0 = datetime(2024, 2, 1, 0, 15)
    rows = [
        (1, t0, 10.0),
        (2, t0 + timedelta(hours=4), 30.0),   # 3 empty cells between
        (3, t0 + timedelta(hours=5), 0.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, 7, v) for i, ts, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = (
        resample_interp(ev, "user_id", "ts", "value", 3600)
        .orderBy("bucket_ts").collect()
    )
    pdf = pd.DataFrame(
        [(ts, v) for _, ts, v in rows], columns=["ts", "v"]
    ).set_index("ts")
    want = pdf.resample("1h")["v"].mean().interpolate("linear")
    assert len(got) == len(want) == 6
    for r, (ts, v) in zip(got, want.items()):
        assert r["bucket_ts"] == ts.to_pydatetime()
        assert abs(r["value"] - v) < 1e-9, (r, v)
    assert [r["filled"] for r in got] == [
        False, True, True, True, False, False]


def test_benford_digit_extraction_and_chi2(spark):
    """benford_deviation extracts first significant digits across
    magnitudes (0.0042 -> 4, -730 -> 7, exact powers of 10 -> 1),
    drops zeros/NULLs, and its chi2 terms match a Python replay; a
    genuinely Benford sample (powers of a constant) yields small
    chi2, a constant-leading-digit sample a large one."""
    import math

    from ixmp_spark.operators.sampling import benford_deviation

    vals = [0.0042, -730.0, 1000.0, 19.5, 0.0, None, 2.0, 555.5]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["digit"]: r for r in benford_deviation(df, "v").collect()}
    assert {d: got[d]["n"] for d in got} == {4: 1, 7: 1, 1: 2, 2: 1, 5: 1}
    n = 6
    for d, r in got.items():
        exp = math.log10(1 + 1 / d)
        obs = r["n"] / n
        assert abs(r["obs_frac"] - round(obs, 6)) < 1e-9
        assert abs(r["chi2_term"]
                   - round(n * (obs - exp) ** 2 / exp, 6)) < 1e-6

    # 3^k is equidistributed in log10 -> near-Benford; 100 terms
    ben = spark.createDataFrame(
        [(3.0 ** k,) for k in range(1, 101)], "v double"
    )
    chi_ben = sum(r["chi2_term"]
                  for r in benford_deviation(ben, "v").collect())
    flat = spark.createDataFrame(
        [(900.0 + i,) for i in range(100)], "v double"
    )
    chi_flat = sum(r["chi2_term"]
                   for r in benford_deviation(flat, "v").collect())
    assert chi_ben < 16 < 100 < chi_flat


def test_weighted_pagerank_markov_stationary(spark):
    """pagerank(weight_col=...) equals a pure-Python weighted power
    iteration (teleport + dangling redistribution) round for round,
    and with damping near 1 on an ergodic weighted chain it recovers
    the analytic stationary distribution; weightless calls remain the
    classic even-split form (duplicate weighted edges merge by sum)."""
    from ixmp_spark.operators.joins import pagerank

    # ergodic 3-state chain with known stationary vector
    edges = [
        ("a", "b", 9.0), ("a", "c", 1.0),
        ("b", "a", 5.0), ("b", "c", 5.0),
        ("c", "a", 10.0),
        ("c", "a", 0.0),   # duplicate edge: merges by sum (no-op here)
        ("d", "a", 1.0),   # feeder state
        ("a", "d", 0.5),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    d, rounds = 0.9, 25
    got = {r["node"]: r["rank"]
           for r in pagerank(df, damping=d, max_iter=rounds, tol=None,
                             weight_col="w").collect()}

    # python replay of the exact update rule
    out: dict[str, dict[str, float]] = {}
    for s, t, w in edges:
        out.setdefault(s, {})
        out[s][t] = out[s].get(t, 0.0) + w
    nodes = sorted({n for s, t, _ in edges for n in (s, t)})
    n = len(nodes)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(rounds):
        dang = sum(rank[x] for x in nodes
                   if sum(out.get(x, {}).values()) == 0)
        new = {}
        for x in nodes:
            inflow = sum(
                rank[s] * ws[x] / sum(ws.values())
                for s, ws in out.items() if x in ws
            )
            new[x] = (1 - d) / n + d * (inflow + dang / n)
        rank = new
    for x in nodes:
        # the operator rounds ranks to 8 decimals on output
        assert abs(got[x] - rank[x]) < 1e-7, (x, got[x], rank[x])
    # the heavy a->b edge must dominate a's outflow: b far above c
    assert got["b"] > got["c"] * 1.5


def test_trend_residual_outliers_detrending(spark):
    """trend_residual_outliers stays quiet on a steep clean ramp
    (where the plain z-score would flag the endpoints of any trending
    series at a tight threshold), flags exactly the planted
    off-trend spike, and NULLs a perfect line (zero residual
    variance)."""
    from datetime import datetime, timedelta

    import random

    from ixmp_spark.operators.sessions import trend_residual_outliers

    t0 = datetime(2024, 4, 1)
    rng = random.Random(9)
    rows = []
    # key 1: steep ramp + small noise, one planted off-trend spike
    for i in range(120):
        v = 10.0 * i + rng.gauss(0, 1.0)
        if i == 60:
            v += 25.0
        rows.append((i, t0 + timedelta(hours=i), 1, v))
    # key 2: perfect line -> zero residual variance -> NULLs
    for i in range(10):
        rows.append((500 + i, t0 + timedelta(hours=i), 2, 3.0 * i + 7))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: r
           for r in trend_residual_outliers(
               ev, "user_id", "ts", "value", threshold=3.0).collect()}
    flagged = [e for e in range(120) if got[e]["is_outlier"]]
    assert flagged == [60]
    assert abs(got[60]["residual"]) > 20
    # ramp endpoints: far from the MEAN but on the trend -> quiet
    assert not got[0]["is_outlier"] and not got[119]["is_outlier"]
    for e in range(500, 510):
        assert got[e]["resid_z"] is None
        assert got[e]["is_outlier"] is False


def test_cross_perplexity_domain_shift(spark):
    """cross_perplexity scores in-domain text low and off-domain text
    high under the train-side LM; unseen bigrams fall to the uniform
    smoothing floor (LEFT joins — rows never vanish) and a fully
    out-of-vocabulary doc scores exactly ppl = V (the add-1 floor with
    empty counts). In-domain scoring equals bigram_perplexity when
    train == score."""
    from ixmp_spark.operators.text import (
        bigram_perplexity,
        cross_perplexity,
    )

    train_rows = [(i, "the cat sat on the mat " * 3) for i in range(4)]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    score = spark.createDataFrame(
        train_rows[:1]
        + [(10, "quantum flux harmonics destabilize the manifold"),
           (11, "zz yy xx ww vv")],          # fully OOV
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           cross_perplexity(train, score, "doc_id", "text").collect()}
    # ordering: in-domain lowest; fully-OOV sits exactly at the
    # uniform floor V; a SEEN context with an unseen continuation is
    # the most surprising of all (P = 1/(ctx+V) < 1/V) — doc 10's
    # 'the manifold' rides the heavy 'the' context
    assert got[0]["ppl"] < got[11]["ppl"] < got[10]["ppl"]
    # fully-OOV: every bigram scores (0+1)/(0+V) -> ppl == V exactly
    vocab = float(len({w for _, t in train_rows for w in t.split()}))
    assert abs(got[11]["ppl"] - vocab) < 1e-6

    same = {r["doc_id"]: r["ppl"] for r in
            bigram_perplexity(train, "doc_id", "text").collect()}
    cross_same = {r["doc_id"]: r["ppl"] for r in
                  cross_perplexity(train, train, "doc_id", "text")
                  .collect()}
    assert same == cross_same


def test_scd2_consistency_and_autocorr(spark):
    """scd2_consistency: healthy tiled history emits ZERO rows; each
    planted defect (overlap, gap, double-open, inverted, flag/NULL
    disagreements) surfaces with its reason. rolling_autocorr: a pure
    sine sampled at its period scores ~+1, alternating signs ~-1,
    white noise ~0, matching a numpy replay on the final frame."""
    import math
    import random
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import rolling_autocorr
    from ixmp_spark.operators.versioning import scd2_consistency

    D = lambda s: datetime.strptime(s, "%Y-%m-%d")  # noqa: E731
    hist = spark.createDataFrame(
        [
            # key 1: healthy tiling
            (1, D("2020-01-01"), D("2021-01-01"), False),
            (1, D("2021-01-01"), None, True),
            # key 2: overlap
            (2, D("2020-01-01"), D("2020-06-01"), False),
            (2, D("2020-03-01"), None, True),
            # key 3: gap
            (3, D("2020-01-01"), D("2020-02-01"), False),
            (3, D("2020-05-01"), None, True),
            # key 4: two open rows
            (4, D("2020-01-01"), None, True),
            (4, D("2021-01-01"), None, True),
            # key 5: inverted + current_not_open
            (5, D("2021-01-01"), D("2020-01-01"), True),
            # key 6: open but not flagged current
            (6, D("2020-01-01"), None, False),
        ],
        "k long, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )
    out = scd2_consistency(hist, ["k"])
    got = {(r["k"], r["valid_from"]): r["reasons"] for r in out.collect()}
    assert not any(k == 1 for k, _ in got)
    assert got[(2, D("2020-03-01"))] == "overlap"
    assert got[(3, D("2020-05-01"))] == "gap"
    assert got[(4, D("2020-01-01"))] == "multiple_current"
    assert got[(4, D("2021-01-01"))] == "multiple_current"
    assert got[(5, D("2021-01-01"))] == "current_not_open,inverted"
    assert got[(6, D("2020-01-01"))] == "open_not_current"
    assert len(got) == 6

    t0 = datetime(2024, 1, 1)
    rng = random.Random(3)
    rows = []
    for i in range(60):
        rows.append((i, t0 + timedelta(seconds=i), 1,
                     math.sin(2 * math.pi * i / 24)))      # smooth
        rows.append((100 + i, t0 + timedelta(seconds=i), 2,
                     (-1.0) ** i))                          # alternating
        rows.append((200 + i, t0 + timedelta(seconds=i), 3,
                     rng.gauss(0, 1)))                      # noise
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    ac = {r["event_id"]: r["autocorr"] for r in rolling_autocorr(
        ev, "user_id", "ts", "event_id", "value", window=24).collect()}
    assert ac[59] > 0.9
    assert ac[159] < -0.9
    assert abs(ac[259]) < 0.5

    # numpy-free exact replay of the final 24-row frame for key 3
    vals = [v for i, _, k, v in rows if k == 3]
    xs, ys = vals[-24:], vals[-25:-1]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = (sum((a - mx) ** 2 for a in xs)
           * sum((b - my) ** 2 for b in ys)) ** 0.5
    assert abs(ac[259] - num / den) < 1e-5


def test_profile_table_stats(spark):
    """profile_table's single-aggregation stats equal hand counts:
    NULLs counted per column, exact distincts (NULL not a distinct
    value in count_distinct), numeric min/max present only for
    numeric columns, and column selection honored."""
    from ixmp_spark.operators.filtering import profile_table

    df = spark.createDataFrame(
        [
            (1, "a", 2.5), (2, "b", None), (3, None, -1.0),
            (4, "a", 2.5), (None, "c", 0.0),
        ],
        "id long, s string, v double",
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s", "v"}
    for c in got:
        assert got[c]["n"] == 5
    assert got["id"]["n_null"] == 1 and got["id"]["n_distinct"] == 4
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 3
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 3
    assert got["id"]["min_numeric"] == 1.0
    assert got["id"]["max_numeric"] == 4.0
    assert got["v"]["min_numeric"] == -1.0
    assert got["v"]["max_numeric"] == 2.5
    assert got["s"]["min_numeric"] is None
    only = profile_table(df, ["s"]).collect()
    assert len(only) == 1 and only[0]["column"] == "s"


def test_streaks_and_readability(spark):
    """streaks returns exactly the maximal above-threshold islands
    (boundaries, singletons, all-true, all-false keys); readability
    matches a hand replay of the Flesch heuristics on known texts and
    orders simple > complex prose."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import streaks
    from ixmp_spark.operators.text import readability_scores

    t0 = datetime(2024, 1, 1)
    vals = {
        1: [0, 9, 9, 0, 9, 0, 0, 9, 9, 9],   # islands: [1,2],[4],[7,9]
        2: [9, 9],                            # all-true
        3: [0, 0],                            # all-false -> no rows
    }
    rows = []
    eid = 0
    for k, vs in vals.items():
        for v in vs:
            rows.append((eid, t0 + timedelta(seconds=eid), k, float(v)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    from pyspark.sql import functions as F

    got = sorted(
        (r["user_id"], r["streak_id"], r["n_rows"],
         r["start_event_id"], r["end_event_id"])
        for r in streaks(ev, "user_id", "ts", "event_id",
                         F.col("value") > 5).collect()
    )
    assert got == [
        (1, 1, 2, 1, 2), (1, 2, 1, 4, 4), (1, 3, 3, 7, 9),
        (2, 1, 2, 10, 11),
    ]

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran."),
            (2, "Extraordinarily convoluted administrative "
                "bureaucracies perpetuate unintelligible "
                "documentation."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in readability_scores(docs, "doc_id", "text").collect()}

    import re

    def replay(text):
        toks = [w for w in text.strip().lower().split() if w]
        sents = max(len(re.findall(r"[.!?]+", text)), 1)
        syl = sum(max(len(re.findall(r"[aeiouy]+", w)), 1) for w in toks)
        return (len(toks), sents, syl,
                round(206.835 - 1.015 * len(toks) / sents
                      - 84.6 * syl / len(toks), 4))
    for i, txt in [(1, "The cat sat. The dog ran."),
                   (2, "Extraordinarily convoluted administrative "
                       "bureaucracies perpetuate unintelligible "
                       "documentation.")]:
        w, s, y, f = replay(txt)
        r = out[i]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (w, s, y)
        assert abs(r["flesch"] - f) < 1e-9
    assert out[1]["flesch"] > out[2]["flesch"]


def test_redact_cards_luhn_validation(spark):
    """redact_cards masks ONLY Luhn-valid 13-19 digit runs: known test
    card numbers mask, a one-digit checksum corruption survives, short
    and overlong runs survive, duplicates mask everywhere, and a
    random corpus of synthetic ids masks exactly the ~10% whose
    arithmetic passes Luhn (replayed in Python)."""
    import random

    from ixmp_spark.operators.text import redact_cards

    def luhn(s):
        tot = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            tot += d
        return tot % 10 == 0

    rows = [
        (1, "pay 4539578763621486 now", True),
        (2, "visa 4111111111111111 ok", True),
        (3, "amex 378282246310005 ok", True),
        (4, "bad 4539578763621487 no", False),
        (5, "short 123456789012 no", False),
        (6, "long 12345678901234567890 no", False),
        (7, "twice 4111111111111111 and 4111111111111111", True),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "id long, s string"
    )
    got = {r["id"]: r["r"] for r in
           df.select("id", redact_cards("s").alias("r")).collect()}
    for i, t, masked in rows:
        if masked:
            assert "<CARD>" in got[i] and not any(
                ch.isdigit() for ch in got[i]
            ), (i, got[i])
        else:
            assert got[i] == t

    rng = random.Random(17)
    ids = ["".join(rng.choice("0123456789") for _ in range(16))
           for _ in range(200)]
    df2 = spark.createDataFrame(
        [(i, f"x {s} y") for i, s in enumerate(ids)], "id long, s string"
    )
    got2 = {r["id"]: r["r"] for r in
            df2.select("id", redact_cards("s").alias("r")).collect()}
    for i, s in enumerate(ids):
        assert ("<CARD>" in got2[i]) == luhn(s), (i, s)


def test_concentration_indices(spark):
    """x14's HHI and Gini arithmetic on engineered distributions:
    perfectly uniform activity gives HHI = 1/n and Gini = 0; a
    monopolist gives HHI -> 1 and Gini -> (n-1)/n; a known mixed case
    matches the hand-computed sorted-rank identity."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from ixmp_spark.queries import QUERIES  # noqa: F401  (style parity)

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 'view': 4 users x 5 events each (uniform)
    for u in range(4):
        for _ in range(5):
            rows.append((eid, t0 + timedelta(seconds=eid), u, "view", 1.0))
            eid += 1
    # 'click': user 0 has 97 events, users 1..3 have 1 each (monopoly)
    for u, k in [(0, 97), (1, 1), (2, 1), (3, 1)]:
        for _ in range(k):
            rows.append((eid, t0 + timedelta(seconds=eid), u, "click", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    # reuse the catalog query body via the operator-shaped construction
    from pyspark.sql import Window

    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    wk = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("x", "user_id")
    ranked = (
        per.withColumn("i", F.row_number().over(wo))
        .withColumn("tot", F.sum("x").over(wk))
        .withColumn("n", F.count(F.lit(1)).over(wk))
    )
    share = F.col("x") / F.col("tot")
    out = {r["event_type"]: r for r in ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_users"),
        F.round(F.sum(share * share), 6).alias("hhi"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x"))
            / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"), 6,
        ).alias("gini"),
    ).collect()}
    assert out["view"]["hhi"] == 0.25 and out["view"]["gini"] == 0.0
    # monopoly: shares (0.97, 0.01 x3); hand Gini via sorted ranks
    xs = sorted([1, 1, 1, 97])
    n, tot = 4, 100
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) \
        - (n + 1) / n
    assert abs(out["click"]["gini"] - round(gini, 6)) < 1e-9
    assert out["click"]["hhi"] == round(0.97 ** 2 + 3 * 0.01 ** 2, 6)


def test_containment_pairs_directional(spark):
    """containment_pairs finds the quote-in-article direction Jaccard
    misses: a 5-token subset of a 40-token doc scores containment 1.0
    (and tiny Jaccard), mutual near-identical sets emit BOTH
    directions, unrelated docs emit nothing, and blocks isolate."""
    from ixmp_spark.operators.dedup import containment_pairs

    big = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(5))
    docs = spark.createDataFrame(
        [
            (1, big, "en", "s"),
            (2, quote, "en", "s"),                  # contained in 1
            (3, big + " extra", "en", "s"),         # mutual with 1
            (4, "zz yy xx", "en", "s"),             # unrelated
            (5, quote, "en", "OTHER"),              # other block
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = containment_pairs(
        docs, "doc_id", "text", ["lang", "source"], threshold=0.9
    ).collect()
    got = {(r["contained_id"], r["container_id"]): r["containment"]
           for r in out}
    assert got[(2, 1)] == 1.0
    assert got[(1, 3)] == 1.0           # 1's 40 tokens all inside 3
    assert (3, 1) in got                # 3 contained to 40/41 > 0.9
    assert abs(got[(3, 1)] - round(40 / 41, 6)) < 1e-9
    assert (2, 3) in got                # quote also inside 3
    assert not any(4 in p or 5 in p for p in got)


def test_state_durations_episodes(spark):
    """state_durations collapses consecutive same-state rows to
    episodes with exact boundaries: repeats merge, flips split, NULL
    is a state, single observations get duration 0, and durations are
    second-exact across sub-second timestamps."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import state_durations

    t0 = datetime(2024, 1, 1)
    seq = ["up", "up", "down", None, None, "up"]
    rows = [
        (i, t0 + timedelta(seconds=10 * i, microseconds=500_000 * (i % 2)),
         1, s)
        for i, s in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, state string"
    )
    out = sorted(
        (r["episode_id"], r["state"], r["n_rows"], r["duration_s"])
        for r in state_durations(ev, "user_id", "ts", "event_id",
                                 "state").collect()
    )
    # episodes: up x2 (0..10.5s -> 10s), down x1 (0), NULL x2
    # (30.5..40 -> 9s), up x1 (0)
    assert out == [
        (1, "up", 2, 10), (2, "down", 1, 0),
        (3, None, 2, 9), (4, "up", 1, 0),
    ]


def test_cusum_auto_bucket_picks_plain_on_uniform(spark):
    """cusum_changepoints(bucket="auto") must not steer uniform data
    into the chunked machinery: choose_bucket answers None and the
    result is IDENTICAL (same plan family, same rows) to the explicit
    plain call."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import cusum_changepoints

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=i), i % 7, float((i * 13) % 10))
        for i in range(700)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    kw = dict(order_cols=("event_id",), baseline=(0.0, 2.0))
    auto = cusum_changepoints(ev, "user_id", "ts", "value",
                              bucket="auto", **kw)
    plain = cusum_changepoints(ev, "user_id", "ts", "value", **kw)
    a = {r["event_id"]: (r["cusum_high"], r["cusum_low"])
         for r in auto.collect()}
    p = {r["event_id"]: (r["cusum_high"], r["cusum_low"])
         for r in plain.collect()}
    assert a == p
    # the auto plan took the PLAIN path: no bucket column machinery
    assert "_bkt" not in auto.columns
    assert "date_trunc" not in auto._jdf.queryExecution().analyzed().toString()


def test_rolling_quantile_median(spark):
    """rolling_quantile at q=0.5 tracks the level through a spike the
    mean can't ignore (robustness), matches a pure-Python replay of
    every trailing frame, and partial head frames use whatever rows
    exist."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import rolling_quantile

    t0 = datetime(2024, 1, 1)
    vals = [10.0] * 10 + [1000.0] + [10.0] * 9   # one spike at i=10
    rows = [(i, t0 + timedelta(seconds=i), 1, v)
            for i, v in enumerate(vals)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {r["event_id"]: r["rolling_q"] for r in rolling_quantile(
        ev, "user_id", "ts", "event_id", "value", window=5).collect()}
    # replay: median of the trailing <=5 rows, linear interpolation
    def med(xs):
        s = sorted(xs)
        n = len(s)
        pos = (n - 1) * 0.5
        lo = int(pos)
        if pos == lo:
            return s[lo]
        hi = lo + 1
        return (hi - pos) * s[lo] + (pos - lo) * s[hi]

    for i in range(len(vals)):
        assert out[i] == round(med(vals[max(0, i - 4):i + 1]), 6), i
    # the spike never becomes the median: every frame median stays 10
    assert all(out[i] == 10.0 for i in range(len(vals)))

    with __import__("pytest").raises(ValueError):
        rolling_quantile(ev, "user_id", "ts", "event_id", "value", q=1.5)


def test_double_ewma_trend_recovery(spark):
    """double_ewma on a clean linear ramp: trend converges to the true
    per-step slope and forecast to the next value (the lag a single
    EWMA can never shed); s1/s2 are BIT-equal to the sequential
    recurrence at dyadic alpha; alpha edges raise."""
    from datetime import datetime, timedelta

    import pytest

    from ixmp_spark.operators.sessions import double_ewma

    t0 = datetime(2024, 1, 1)
    slope = 3.0
    rows = [(i, t0 + timedelta(seconds=i), 7, 5.0 + slope * i)
            for i in range(300)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: r for r in double_ewma(
        ev, "user_id", "ts", "event_id", "value", 0.5).collect()}

    # sequential replay, exactly the operator's arithmetic
    a, d = 0.5, 0.5
    s1 = s2 = None
    for i in range(300):
        x = 5.0 + slope * i
        s1 = a * x if s1 is None else a * x + d * s1
        s2 = a * s1 if s2 is None else a * s1 + d * s2
    r = got[299]
    assert r["s1"] == s1 and r["s2"] == s2          # bit-exact
    assert abs(r["trend"] - slope) < 1e-9           # converged slope
    next_val = 5.0 + slope * 300
    assert abs(r["forecast"] - next_val) < 1e-9     # lag cancelled

    with pytest.raises(ValueError):
        double_ewma(ev, "user_id", "ts", "event_id", "value", 1.0)


def test_seasonal_baseline_slot_scoring(spark):
    """seasonal_baseline flags a value only when IT is abnormal for
    its own slot: the same 500.0 that screams at 03:00 (baseline ~10)
    is silent at 14:00 (baseline ~500); under-observed slots (n <
    min_n) and zero-variance slots yield NULL z and never flag."""
    from datetime import datetime, timedelta

    import pytest

    from ixmp_spark.operators.sessions import seasonal_baseline

    rows = []
    eid = 0
    # 30 days of signal: quiet ~N(10, 1)-ish at 03:00, busy ~500 at
    # 14:00 (with spread), constant 7.0 at 05:00 (zero variance),
    # single observation at 06:00 (n < min_n)
    for day in range(1, 31):
        rows.append((eid, datetime(2024, 1, day, 3), "m",
                     10.0 + (day % 5) * 0.5)); eid += 1
        rows.append((eid, datetime(2024, 1, day, 14), "m",
                     500.0 + (day % 7) * 2.0)); eid += 1
        rows.append((eid, datetime(2024, 1, day, 5), "m", 7.0)); eid += 1
    rows.append((eid, datetime(2024, 1, 5, 6), "m", 123.0)); eid += 1
    # the planted anomaly: 500 at 03:00
    rows.append((eid, datetime(2024, 1, 31, 3), "m", 500.0))
    spike_id = eid
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, key string, value double"
    )
    out = {r["event_id"]: r for r in seasonal_baseline(
        ev, "key", "ts", "value").collect()}
    assert out[spike_id]["is_spike"] and out[spike_id]["seasonal_z"] > 3
    # same magnitude at its usual 14:00 slot: never flagged
    assert not any(r["is_spike"] for r in out.values()
                   if r["season_slot"] == 14)
    # zero-variance slot: NULL z, no flag (even though values "match")
    five = [r for r in out.values() if r["season_slot"] == 5]
    assert five and all(r["seasonal_z"] is None and not r["is_spike"]
                        for r in five)
    # n=1 slot: NULL z, no flag
    six = [r for r in out.values() if r["season_slot"] == 6]
    assert len(six) == 1 and six[0]["seasonal_z"] is None

    with pytest.raises(ValueError):
        seasonal_baseline(ev, "key", "ts", "value", period="fortnight")


def test_soft_dedup_weights_mass(spark):
    """soft_dedup_weights keeps every row, normalizes each content
    group's total mass to 1 (Σ weight per group = 1), and agrees with
    exact_dedup on group structure (same n_copies per surviving id)."""
    from ixmp_spark.operators.dedup import exact_dedup, soft_dedup_weights

    docs = spark.createDataFrame(
        [
            (1, "The cat sat"),
            (2, "the  cat   sat"),      # normalizes equal to 1
            (3, "THE CAT SAT "),        # and to 2
            (4, "something else"),
            (5, "a third text"),
        ],
        "doc_id long, text string",
    )
    out = soft_dedup_weights(docs, "text", "doc_id")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 5                               # nothing dropped
    assert [rows[i]["n_copies"] for i in (1, 2, 3)] == [3, 3, 3]
    assert rows[4]["n_copies"] == 1 and rows[4]["weight"] == 1.0
    assert abs(sum(rows[i]["weight"] for i in (1, 2, 3)) - 1.0) < 1e-12
    # group structure identical to the hard dedup's
    hard = {r["doc_id"]: r["n_copies"]
            for r in exact_dedup(docs, "text", "doc_id").collect()}
    assert hard == {1: 3, 4: 1, 5: 1}


def test_l_diversity_audit_homogeneity(spark):
    """l_diversity_audit flags the k-anonymous-but-homogeneous cell
    (size 4, one sensitive value) and passes the diverse cell of the
    same size; NULL sensitive values count as a value."""
    from ixmp_spark.operators.sampling import l_diversity_audit

    rows = [
        # cell A: 4 rows, all same diagnosis -> at risk even though k=4
        (1, "z1", "flu"), (2, "z1", "flu"), (3, "z1", "flu"),
        (4, "z1", "flu"),
        # cell B: 4 rows, 3 distinct -> safe at l=3
        (5, "z2", "flu"), (6, "z2", "cold"), (7, "z2", "covid"),
        (8, "z2", "flu"),
        # cell C: 2 rows, one NULL + one value -> 2 "values" < 3
        (9, "z3", None), (10, "z3", "flu"),
    ]
    df = spark.createDataFrame(rows, "id long, zip string, dx string")
    out = {r["id"]: r for r in
           l_diversity_audit(df, "zip", "dx", l=3).collect()}
    assert out[1]["cell_size"] == 4 and out[1]["l_distinct"] == 1
    assert out[1]["at_risk"]
    assert out[5]["l_distinct"] == 3 and not out[5]["at_risk"]
    assert out[9]["l_distinct"] == 2 and out[9]["at_risk"]


def test_proportion_ci_wilson(spark):
    """proportion_ci matches a scipy-free Wilson replay, stays inside
    [0,1] at p̂=0 and p̂=1 with nonzero width (where Wald collapses),
    and excludes NULL successes from n."""
    import math

    from ixmp_spark.operators.sampling import proportion_ci

    rows = (
        [("a", True)] * 7 + [("a", False)] * 3       # p=0.7, n=10
        + [("b", False)] * 5                          # p=0, n=5
        + [("c", True)] * 4                           # p=1, n=4
        + [("d", True), ("d", None), ("d", False)]    # NULL excluded
    )
    df = spark.createDataFrame(rows, "g string, s boolean")
    out = {r["g"]: r for r in
           proportion_ci(df, "g", F.col("s"), z=1.96).collect()}

    def wilson(ns, n, z=1.96):
        p, z2 = ns / n, z * z
        den = 1 + z2 / n
        c = (p + z2 / (2 * n)) / den
        h = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / den
        return round(c - h, 6), round(c + h, 6)

    lo, hi = wilson(7, 10)
    assert (out["a"]["ci_low"], out["a"]["ci_high"]) == (lo, hi)
    assert out["a"]["p_hat"] == 0.7
    b = out["b"]
    assert b["p_hat"] == 0.0 and b["ci_low"] == 0.0 and b["ci_high"] > 0.2
    c = out["c"]
    assert c["p_hat"] == 1.0 and c["ci_high"] == 1.0 and c["ci_low"] < 0.9
    assert out["d"]["n"] == 2 and out["d"]["n_success"] == 1


def test_neighborhood_jaccard_scores(spark):
    """neighborhood_jaccard matches a hand replay on a planted graph
    (including a pair with NO direct edge), honors min_common, and the
    hub guard fails fast with named offenders."""
    import pytest

    from ixmp_spark.operators.joins import neighborhood_jaccard

    # star around 0 (nodes 1..4) + edge 1-2: N(1)={0,2}, N(2)={0,1},
    # N(3)=N(4)={0}. Pair (3,4) shares neighbor 0 but has no edge.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 1)],  # dup collapses
        "src long, dst long",
    )
    out = {(r["a"], r["b"]): r for r in neighborhood_jaccard(
        edges, min_common=1).collect()}
    r34 = out[(3, 4)]
    assert (r34["common"], r34["union_size"], r34["jaccard"]) == (1, 1, 1.0)
    r12 = out[(1, 2)]
    # N(1)={0,2}, N(2)={0,1}: common={0}=1, union={0,1,2}=3
    assert (r12["common"], r12["union_size"], r12["jaccard"]) == (
        1, 3, round(1 / 3, 6))
    assert (1, 3) in out and out[(1, 3)]["common"] == 1
    # min_common=2 drops every pair here (max overlap is 1... except
    # none reach 2)
    assert neighborhood_jaccard(edges, min_common=2).count() == 0

    hub = spark.createDataFrame(
        [(0, i) for i in range(1, 30)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="max_center_degree"):
        neighborhood_jaccard(hub, max_center_degree=10).collect()
    # cap disabled: the hub's 29-choose-2 wedge pairs all appear
    assert neighborhood_jaccard(
        hub, max_center_degree=None).count() == 29 * 28 // 2


def test_kcore_cascade_and_convergence(spark):
    """kcore reproduces a pure-Python peel on a graph with a CASCADE
    (a clique-adjacent tail whose nodes fall out one round after their
    support does), returns within-core degrees, and raises past
    max_iter on a deep path."""
    import pytest

    from ixmp_spark.operators.joins import kcore

    # K4 on {0,1,2,3} (each degree 3) + tail 3-4, 4-5, 4-6, 5-6:
    # nodes 4,5,6 form a triangle attached at 3. For k=2 everything
    # but nothing survives... for k=3: the triangle nodes have degree
    # {4:3, 5:2, 6:2} -> 5,6 peel, then 4 drops to 1 and peels
    # (cascade), then 3 drops to 3 (still in K4) -> core = K4.
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (4, 5), (4, 6), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def peel(es, k):
        es = {tuple(sorted(e)) for e in es}
        while True:
            deg = {}
            for u, v in es:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            bad = {n for n, d in deg.items() if d < k}
            if not bad:
                return deg
            es = {e for e in es if bad.isdisjoint(e)}

    for k in (2, 3, 4):
        got = {r["node"]: r["degree"]
               for r in kcore(df, k=k).collect()}
        assert got == peel(edges, k), k

    # path of 12 peels from both ends: needs 6 rounds at k=2 -> a
    # max_iter below that raises instead of returning a non-core
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(path, k=2, max_iter=3)
    assert kcore(path, k=2, max_iter=10).count() == 0  # path has no 2-core


def test_attribution_touch_semantics(spark):
    """attribution credits the strictly-preceding first/last touch,
    counts the path, leaves organic conversions NULL/0, honors a
    custom is_touch restriction, and later events never leak in."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import attribution

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: ad -> blog -> purchase -> email -> purchase
        (1, t0 + timedelta(minutes=1), 1, "ad"),
        (2, t0 + timedelta(minutes=2), 1, "blog"),
        (3, t0 + timedelta(minutes=3), 1, "purchase"),
        (4, t0 + timedelta(minutes=4), 1, "email"),
        (5, t0 + timedelta(minutes=5), 1, "purchase"),
        # user 2: organic purchase, then a touch AFTER it
        (6, t0 + timedelta(minutes=1), 2, "purchase"),
        (7, t0 + timedelta(minutes=2), 2, "ad"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    conv = F.col("event_type") == "purchase"
    out = {r["event_id"]: r for r in attribution(
        ev, "user_id", "ts", "event_id", "event_type", conv).collect()}
    assert set(out) == {3, 5, 6}
    assert (out[3]["first_touch"], out[3]["last_touch"],
            out[3]["n_touches"]) == ("ad", "blog", 2)
    # the second purchase sees email as last touch; the FIRST purchase
    # event itself is not a touch
    assert (out[5]["first_touch"], out[5]["last_touch"],
            out[5]["n_touches"]) == ("ad", "email", 3)
    assert (out[6]["first_touch"], out[6]["n_touches"]) == (None, 0)

    # restrict credit to ads only
    out2 = {r["event_id"]: r for r in attribution(
        ev, "user_id", "ts", "event_id", "event_type", conv,
        is_touch=F.col("event_type") == "ad").collect()}
    assert (out2[5]["first_touch"], out2[5]["last_touch"],
            out2[5]["n_touches"]) == ("ad", "ad", 1)


def test_group_mode_tiebreak(spark):
    """group_mode picks the most frequent value, breaks count ties on
    the smallest value, and reports the distinct-value count; works on
    string values too."""
    from ixmp_spark.operators.filtering import group_mode

    df = spark.createDataFrame(
        [("g1", 5.0), ("g1", 5.0), ("g1", 3.0),
         ("g2", 2.0), ("g2", 7.0),            # tie -> smaller wins
         ("g3", 9.0)],
        "g string, v double",
    )
    out = {r["g"]: r for r in group_mode(df, "g", "v").collect()}
    assert (out["g1"]["mode_value"], out["g1"]["mode_count"],
            out["g1"]["n_values"]) == (5.0, 2, 2)
    assert (out["g2"]["mode_value"], out["g2"]["mode_count"]) == (2.0, 1)
    assert out["g3"]["mode_value"] == 9.0

    s = spark.createDataFrame(
        [("g", "b"), ("g", "b"), ("g", "a"), ("g", "c"), ("g", "a")],
        "g string, v string",
    )
    r = group_mode(s, "g", "v").collect()[0]
    # counts: a=2, b=2, c=1 -> tie at 2, 'a' < 'b'
    assert (r["mode_value"], r["mode_count"], r["n_values"]) == ("a", 2, 3)


def test_stats_partials_merge_exactness(spark):
    """merge_stats_partials over shard-level partials equals a direct
    aggregation BIT-exactly (integer units), across any partial split;
    NULLs excluded; readout math verified by hand."""
    rows = [
        ("a", "d1", 1.23), ("a", "d1", 2.34), ("a", "d2", 3.45),
        ("a", "d2", None), ("b", "d1", 10.01), ("b", "d3", -5.55),
    ]
    df = spark.createDataFrame(rows, "k string, day string, v double")
    from ixmp_spark.sources.maintenance import (
        merge_stats_partials,
        stats_partials,
    )

    p = stats_partials(df, ["k", "day"], "v", scale=2)
    got = {r["k"]: r for r in
           merge_stats_partials(p, ["k"], scale=2).collect()}
    assert got["a"]["n"] == 3
    assert got["a"]["sum_value"] == (123 + 234 + 345) / 100.0
    assert got["a"]["min_value"] == 1.23 and got["a"]["max_value"] == 3.45
    assert got["a"]["avg_value"] == round(7.02 / 100.0 * 100 / 3, 6)
    assert got["b"]["n"] == 2 and got["b"]["min_value"] == -5.55

    # split-invariance: partials at (k, day) and at (k, day, v-parity)
    # merge to identical rows — the monoid property, exactly
    p2 = stats_partials(
        df.withColumn("par", (F.col("v") > 2).cast("int")),
        ["k", "day", "par"], "v", scale=2,
    )
    a = sorted(merge_stats_partials(p, ["k"], scale=2).collect())
    b = sorted(merge_stats_partials(p2, ["k"], scale=2).collect())
    assert a == b


def test_vocab_coverage_curve(spark):
    """vocab_coverage: monotone in k, exact fractions on a hand corpus
    (mass 6/10 at k=1, 9/10 at k=2, 1.0 at k=3), ks beyond the
    vocabulary emit nothing, ties cut deterministically."""
    from ixmp_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "x x x y y z"), (2, "x X x y")],  # x:6, y:3, z:1
        "doc_id long, text string",
    )
    out = {r["k"]: r["coverage"] for r in
           vocab_coverage(docs, "text", ks=(1, 2, 3, 4)).collect()}
    assert out == {1: 0.6, 2: 0.9, 3: 1.0}  # no k=4 row: vocab is 3
    # tie handling: 'a' and 'b' both count 2 -> k=1 takes 'a' (word
    # order breaks the tie), coverage 2/4
    t = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    got = {r["k"]: r["coverage"] for r in
           vocab_coverage(t, "text", ks=(1, 2)).collect()}
    assert got == {1: 0.5, 2: 1.0}


def test_theil_sen_robustness(spark):
    """theil_sen recovers the true slope of a clean ramp EXACTLY, does
    not move when 20% of points are wildly corrupted (where OLS
    does), matches a pure-Python pairwise-median replay, and the
    max_points guard fails fast naming offenders."""
    from datetime import datetime, timedelta

    import pytest

    from ixmp_spark.operators.sessions import key_trends, theil_sen

    t0 = datetime(2024, 1, 1)
    clean, dirty = [], []
    for i in range(25):
        v = 2.0 + 0.5 * i
        clean.append((1, t0 + timedelta(seconds=i), v))
        dirty.append((2, t0 + timedelta(seconds=i),
                      v + (5000.0 if i % 5 == 0 else 0.0)))
    ev = spark.createDataFrame(
        clean + dirty, "user_id long, ts timestamp, value double"
    )
    got = {r["user_id"]: r for r in theil_sen(
        ev, "user_id", "ts", "value").collect()}
    assert got[1]["slope"] == 0.5
    # x is epoch seconds (the w12 convention), so the intercept is the
    # line's value at epoch 0: 2.0 − 0.5·epoch(t0), constant across i
    x0 = t0.replace(tzinfo=__import__("datetime").timezone.utc).timestamp()
    assert got[1]["intercept"] == round(2.0 - 0.5 * x0, 6)
    assert got[1]["n_pairs"] == 25 * 24 // 2
    # 5 of 25 corrupt: Theil–Sen still says 0.5; OLS is dragged hard
    assert got[2]["slope"] == 0.5
    ols = {r["user_id"]: r["slope"] for r in key_trends(
        ev, "user_id", "ts", "value").collect()}
    assert abs(ols[2] - 0.5) > 5

    # pure-Python replay for the dirty key
    xs = [i * 1.0 for i in range(25)]
    vs = [2.0 + 0.5 * i + (5000.0 if i % 5 == 0 else 0.0)
          for i in range(25)]
    sl = sorted((vs[j] - vs[i]) / (xs[j] - xs[i])
                for i in range(25) for j in range(i + 1, 25))
    n = len(sl)
    med = (sl[n // 2] if n % 2 else 0.5 * (sl[n // 2 - 1] + sl[n // 2]))
    assert got[2]["slope"] == round(med, 8)

    with pytest.raises(ValueError, match="max_points"):
        theil_sen(ev, "user_id", "ts", "value", max_points=10)


def test_ab_srm_check_flags(spark):
    """ab_srm_check: a clean 50/50 split with a real lift reads
    significant without an SRM flag; a broken 80/20 split flags SRM;
    a degenerate all-convert pool yields NULL z and significant=False
    (never a raise)."""
    from ixmp_spark.operators.sampling import ab_srm_check

    def frame(n_a, n_b, c_a, c_b):
        rows = ([(0, 1)] * c_a + [(0, 0)] * (n_a - c_a)
                + [(1, 1)] * c_b + [(1, 0)] * (n_b - c_b))
        return spark.createDataFrame(rows, "variant int, conv int")

    r = ab_srm_check(frame(500, 500, 100, 150), "variant", "conv").collect()[0]
    assert not r["srm_flag"] and r["significant"]
    assert (r["n_a"], r["conv_b"]) == (500, 150)
    assert r["p_a"] == 0.2 and r["p_b"] == 0.3
    # hand z: p=0.25, se=sqrt(.25*.75*(2/500))
    import math
    se = math.sqrt(0.25 * 0.75 * (1 / 500 + 1 / 500))
    assert abs(r["z_score"] - round((0.2 - 0.3) / se, 6)) < 1e-9

    r2 = ab_srm_check(frame(800, 200, 80, 20), "variant", "conv").collect()[0]
    assert r2["srm_flag"] and r2["srm_chi2"] == 360.0

    r3 = ab_srm_check(frame(50, 50, 50, 50), "variant", "conv").collect()[0]
    assert r3["z_score"] is None and not r3["significant"]


def test_lexical_diversity_and_ess(spark):
    """lexical_diversity: hand ratios, hapax arithmetic, empty docs
    dropped. effective_sample_size: uniform weights give ESS = n; one
    dominant weight collapses ESS toward 1; zero/NULL weights are
    excluded."""
    from ixmp_spark.operators.sampling import effective_sample_size
    from ixmp_spark.operators.text import lexical_diversity

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x x x x"), (3, "   "), (4, "q w e r")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           lexical_diversity(docs, "doc_id", "text").collect()}
    assert 3 not in out
    assert (out[1]["n_tokens"], out[1]["n_types"]) == (5, 3)
    assert out[1]["ttr"] == 0.6 and out[1]["hapax_ratio"] == round(1 / 3, 6)
    assert out[2]["ttr"] == 0.25 and out[2]["hapax_ratio"] == 0.0
    assert out[4]["ttr"] == 1.0 and out[4]["hapax_ratio"] == 1.0

    w = spark.createDataFrame(
        [("u", 1.0)] * 10
        + [("d", 100.0), ("d", 1.0), ("d", 1.0)]
        + [("z", 0.0), ("z", None), ("z", 2.0)],
        "g string, weight double",
    )
    ess = {r["g"]: r for r in
           effective_sample_size(w, "g", "weight").collect()}
    assert ess["u"]["ess"] == 10.0 and ess["u"]["ess_ratio"] == 1.0
    assert ess["d"]["ess"] < 1.1 and ess["d"]["n"] == 3
    assert ess["z"]["n"] == 1 and ess["z"]["ess"] == 1.0


def test_poisson_bootstrap_ci(spark):
    """poisson_bootstrap_ci: matches an exact pure-Python replay of
    the md5-deterministic bootstrap on a small group (same uniforms,
    same thresholds, same percentile), brackets the true mean on a
    clean sample, and a 4x larger sample yields a ~2x narrower CI."""
    import hashlib
    import math
    import random

    from ixmp_spark.operators.sampling import poisson_bootstrap_ci

    rng = random.Random(7)
    small = [(i, "s", rng.gauss(50, 10)) for i in range(40)]
    big = [(1000 + i, "b", rng.gauss(50, 10)) for i in range(640)]
    df = spark.createDataFrame(
        small + big, "event_id long, g string, v double"
    )
    out = {r["g"]: r for r in poisson_bootstrap_ci(
        df, "g", "event_id", "v", n_reps=100).collect()}

    for g, rows in (("s", small), ("b", big)):
        mean = sum(v for _, _, v in rows) / len(rows)
        r = out[g]
        assert r["ci_low"] < mean < r["ci_high"], g
        assert r["mean_value"] == round(mean, 4)
    w_small = out["s"]["ci_high"] - out["s"]["ci_low"]
    w_big = out["b"]["ci_high"] - out["b"]["ci_low"]
    assert 2.0 < w_small / w_big < 8.0  # ~sqrt(16)=4, loose band

    # exact replay of the 's' group
    cdf, acc = [], 0.0
    for f in (1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0, 5040.0, 40320.0):
        acc = acc + 1.0 / f
        cdf.append(math.exp(-1.0) * acc)

    def pois(u):
        for k, c in enumerate(cdf):
            if u < c:
                return k
        return 9

    ests = []
    for rep in range(100):
        sw = swv = 0.0
        for i, _, v in small:
            h = hashlib.md5(f"{i}#{rep}".encode()).hexdigest()
            u = int(h[:8], 16) / 4294967296.0
            w = float(pois(u))
            sw += w
            swv += w * v
        if sw > 0:
            ests.append(swv / sw)
    ests.sort()

    def pct(xs, q):
        pos = (len(xs) - 1) * q
        lo = int(pos)
        if pos == lo:
            return xs[lo]
        return (lo + 1 - pos) * xs[lo] + (pos - lo) * xs[lo + 1]

    assert out["s"]["ci_low"] == round(pct(ests, 0.025), 4)
    assert out["s"]["ci_high"] == round(pct(ests, 0.975), 4)


def test_rake_keywords_scoring(spark):
    """rake_keywords reproduces the textbook RAKE hand-computation on
    a crafted document (phrase split at stopwords, degree/frequency
    word scores, summed phrase scores), ranks deterministically, and
    caps at k."""
    from ixmp_spark.operators.text import rake_keywords

    # phrases: [deep learning], [deep neural networks], [networks]
    # freq: deep=2, learning=1, neural=1, networks=2
    # deg:  deep=2+3=5, learning=2, neural=3, networks=3+1=4
    # scores: [deep learning] = 5/2 + 2 = 4.5
    #         [deep neural networks] = 5/2 + 3 + 4/2 = 7.5
    #         [networks] = 2
    docs = spark.createDataFrame(
        [(1, "deep learning and deep neural networks of networks")],
        "doc_id long, text string",
    )
    rows = {r["rank"]: r for r in
            rake_keywords(docs, "doc_id", "text", k=3).collect()}
    assert rows[1]["phrase"] == "deep neural networks"
    assert rows[1]["score"] == 7.5 and rows[1]["n_words"] == 3
    assert rows[2]["phrase"] == "deep learning" and rows[2]["score"] == 4.5
    assert rows[3]["phrase"] == "networks" and rows[3]["score"] == 2.0

    # k caps output; equal-score duplicate phrases rank by first
    # occurrence and both survive
    d2 = spark.createDataFrame(
        [(2, "alpha beta the alpha beta the gamma")],
        "doc_id long, text string",
    )
    r2 = rake_keywords(d2, "doc_id", "text", k=2).collect()
    assert [x["phrase"] for x in sorted(r2, key=lambda x: x["rank"])] == [
        "alpha beta", "alpha beta"]


def test_mips_topk_and_augment(spark):
    """mips_topk ranks by raw inner product (a long middling-angle
    vector beats a short aligned one — the case cosine gets wrong);
    mips_augment gives every vector norm exactly M so cosine over
    augmented vectors reproduces the exact MIPS ordering; the probe
    pads with 0."""
    from ixmp_spark.operators.similarity import (
        brute_force_topk,
        cosine,
        mips_augment,
        mips_topk,
        norm,
    )

    # probe q = [1, 0]; a = [10, 5] (ip 10), b = [0.9, 0.01] (ip 0.9,
    # but cosine(b, q) ~ 1.0 > cosine(a, q) ~ 0.89)
    rows = [
        (0, [1.0, 0.0]),
        (1, [10.0, 5.0]),
        (2, [0.9, 0.01]),
        (3, [3.0, -4.0]),
        (4, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probe = emb.where(F.col("vec_id") == 0)
    mips = [r["vec_id"] for r in mips_topk(
        emb, probe, "vec_id", "embedding", k=4).collect()]
    assert mips == [1, 3, 2, 4]                      # by inner product
    cos = [r["vec_id"] for r in brute_force_topk(
        emb, probe, "vec_id", "embedding", k=4).collect()]
    assert cos[0] == 2                               # cosine disagrees

    # augmentation: all augmented norms equal max norm; cosine order
    # over (augmented corpus, zero-padded probe) == exact MIPS order
    aug = mips_augment(emb.where(F.col("vec_id") != 0), "embedding")
    norms = [r["n"] for r in aug.select(
        F.round(norm("aug_vec"), 9).alias("n")).collect()]
    assert len(set(norms)) == 1
    padded = probe.select(
        "vec_id",
        F.concat("embedding", F.array(F.lit(0.0))).alias("aug_vec"),
    )
    p = padded.select(F.col("aug_vec").alias("pv")).crossJoin(aug)
    order = [r["vec_id"] for r in p.select(
        "vec_id", cosine("aug_vec", "pv").alias("c"))
        .orderBy(F.desc("c"), "vec_id").collect()]
    assert order == [1, 3, 2, 4]


def test_rolling_active_and_gap_report(spark):
    """rolling_active: hand-checkable DAU/WAU on a 3-user timeline
    (WAU unions the trailing week, days past the last activity are
    clipped). gap_report: exactly the planted silences, first
    observation opens no gap."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import gap_report, rolling_active

    D = lambda d, h=0: datetime(2024, 3, d, h)  # noqa: E731
    rows = [
        (1, D(1)), (2, D(1)),          # day 1: users 1,2
        (1, D(2)), (1, D(2, 5)),       # day 2: user 1 (twice)
        (3, D(9)),                     # day 9: user 3 (old pair ages out)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"]: (r["dau"], r["wau"]) for r in rolling_active(
        ev, "user_id", "ts", window_days=7).collect()}
    import datetime as _dt
    k = lambda d: _dt.date(2024, 3, d)  # noqa: E731
    assert got[k(1)] == (2, 2)
    assert got[k(2)] == (1, 2)         # window {1,2} days: users {1,2}
    # day 9: only user 3 in [3..9] (days 1-2 aged out >7 back)
    assert got[k(9)] == (1, 1)
    assert set(got) == {k(1), k(2), k(9)}  # clipped at last activity

    gaps = gap_report(ev, "user_id", "ts", min_gap_s=3600.0)
    g = [(r["user_id"], r["gap_start"], r["gap_end"], r["gap_s"])
         for r in sorted(gaps.collect(), key=lambda r: (r["user_id"],
                                                        r["gap_start"]))]
    day_s = 86400.0
    assert g == [
        (1, D(1), D(2), day_s),
        (1, D(2), D(2, 5), 5 * 3600.0),
    ]


def test_seasonal_decompose_replay_and_recovery(spark):
    """seasonal_decompose matches a pure-Python replay (trailing
    identity: centered partial-frame means, slot means of detrended)
    to 1e-9, recovers a planted trend+season structure (residual of
    the clean series ~0; a planted off-pattern spike shows up ONLY in
    the residual), and the additive identity holds row-exactly."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import seasonal_decompose

    t0 = datetime(2024, 1, 1)
    season = [5.0 * (h % 4) for h in range(24)]
    rows = []
    for i in range(240):                      # 10 days hourly
        h = i % 24
        v = 0.1 * i + season[h]               # ramp + rhythm
        if i == 200:
            v += 80.0                         # planted anomaly
        rows.append((i, t0 + timedelta(hours=i), 1, v))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: r for r in seasonal_decompose(
        ev, "user_id", "ts", "event_id", "value",
        trend_window=24, round_digits=None).collect()}

    # pure-Python replay
    vals = [v for _, _, _, v in rows]
    n = len(vals)
    trend = []
    for i in range(n):
        lo, hi = max(0, i - 12), min(n - 1, i + 12)
        fr = vals[lo:hi + 1]
        trend.append(sum(fr) / len(fr))
    detr = [v - t for v, t in zip(vals, trend)]
    slot_sum, slot_n = {}, {}
    for i, d in enumerate(detr):
        h = i % 24
        slot_sum[h] = slot_sum.get(h, 0.0) + d
        slot_n[h] = slot_n.get(h, 0) + 1
    seas = {h: slot_sum[h] / slot_n[h] for h in slot_sum}
    for i in range(n):
        r = got[i]
        assert abs(r["trend"] - trend[i]) < 1e-9, i
        assert abs(r["seasonal"] - seas[i % 24]) < 1e-9, i
        assert abs(r["residual"] - (detr[i] - seas[i % 24])) < 1e-9, i
        # additive identity, exactly as computed
        assert r["value"] - r["trend"] - r["seasonal"] == r["residual"]

    # the spike lives in the residual, not the seasonal profile
    mid = [got[i]["residual"] for i in range(50, 150)]
    assert got[200]["residual"] > 60.0
    assert max(abs(x) for x in mid) < 12.0  # clean rows stay small


def test_cohort_ltv_curves(spark):
    """cohort_ltv: hand-checkable cumulative per-user revenue by
    cohort age; churned users keep denominating; ages past the cap
    are clipped."""
    from datetime import datetime

    from ixmp_spark.operators.sessions import cohort_ltv

    D = lambda d: datetime(2024, 4, d)  # noqa: E731
    rows = [
        # cohort Apr-1: users 1, 2. u1 pays 10 on d0 and 20 on d2;
        # u2 pays 5 on d0 then churns.
        (1, D(1), 10.0), (2, D(1), 5.0), (1, D(3), 20.0),
        # cohort Apr-2: user 3 pays 7 on d1 and 100 on d40 (clipped)
        (3, D(2), 0.0), (3, D(3), 7.0), (3, datetime(2024, 5, 20), 100.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, v double")
    out = {(r["cohort_day"].isoformat(), r["age_days"]): r
           for r in cohort_ltv(ev, "user_id", "ts", "v",
                               max_age_days=30).collect()}
    a = out[("2024-04-01", 0)]
    assert (a["cohort_size"], a["value_sum"], a["cum_ltv_per_user"]) == (
        2, 15.0, 7.5)
    b = out[("2024-04-01", 2)]
    assert (b["cum_value"], b["cum_ltv_per_user"]) == (35.0, 17.5)
    c = out[("2024-04-02", 1)]
    assert (c["cohort_size"], c["cum_value"]) == (1, 7.0)
    assert not any(k[0] == "2024-04-02" and k[1] > 30 for k in out)


def test_quantile_normalize_alignment(spark):
    """quantile_normalize maps two sources with wildly different score
    scales onto one comparable axis: the per-source TOP item lands at
    the global max, the bottom at the global min, medians align, and
    a shared global threshold then selects the same per-source
    fraction; single-row groups map to the global minimum."""
    from ixmp_spark.operators.sampling import quantile_normalize

    # source A scores in [0, 1], source B in [0, 100] — same shape
    rows = ([("a", i, i / 20.0) for i in range(21)]
            + [("b", 100 + i, float(5 * i)) for i in range(21)]
            + [("c", 999, 42.0)])                   # singleton group
    df = spark.createDataFrame(rows, "source string, id long, s double")
    out = {r["id"]: r["norm_score"] for r in quantile_normalize(
        df, "source", "s", n_buckets=100).collect()}
    # global distribution spans [0, 100]; each source's extremes map
    # onto the global extremes
    assert out[20] == out[120]                      # both tops agree
    assert out[0] == out[100] == 0.0                # both bottoms = min
    assert abs(out[10] - out[110]) < 1e-9           # medians align
    assert out[999] == 0.0                          # singleton -> min
    # a global "top 25%" threshold now keeps ~the same count per source
    thr = sorted(out.values())[-12]
    a_kept = sum(1 for i in range(21) if out[i] >= thr)
    b_kept = sum(1 for i in range(21) if out[100 + i] >= thr)
    assert abs(a_kept - b_kept) <= 1


def test_interval_union_coverage(spark):
    """interval_union counts overlaps once: hand-checkable merged
    blocks (overlap, touching, nested, disjoint, empty-dropped) with
    exact second arithmetic."""
    from datetime import datetime, timedelta

    from ixmp_spark.operators.joins import interval_union

    t0 = datetime(2024, 1, 1)
    T = lambda m: t0 + timedelta(minutes=m)  # noqa: E731
    rows = [
        # key 1: [0,10] + [5,15] overlap -> one block of 15 min;
        #        [20,30] + [30,40] touching -> one block of 20 min;
        #        [50,60] disjoint -> 10 min. 3 blocks, 45 min.
        (1, T(0), T(10)), (1, T(5), T(15)),
        (1, T(20), T(30)), (1, T(30), T(40)),
        (1, T(50), T(60)),
        # key 2: nested [0,60] ⊃ [10,20] ⊃ [12,14] -> 1 block, 60 min
        (2, T(0), T(60)), (2, T(10), T(20)), (2, T(12), T(14)),
        # key 3: one empty (end == start, dropped) + one real
        (3, T(0), T(0)), (3, T(1), T(2)),
    ]
    df = spark.createDataFrame(
        rows, "k long, start_ts timestamp, end_ts timestamp"
    )
    got = {r["k"]: r for r in
           interval_union(df, "k", "start_ts", "end_ts").collect()}
    assert (got[1]["n_intervals"], got[1]["n_blocks"],
            got[1]["covered_s"]) == (5, 3, 45 * 60.0)
    assert (got[2]["n_intervals"], got[2]["n_blocks"],
            got[2]["covered_s"]) == (3, 1, 3600.0)
    assert (got[3]["n_intervals"], got[3]["covered_s"]) == (1, 60.0)


def test_entity_clusters_transitivity(spark):
    """The x20 composition (fuzzy pairs -> components) groups a typo
    CHAIN into one entity even though its endpoints are 2 edits apart
    (transitivity is the point of the closure), and keeps a 1-edit-
    isolated name out."""
    from ixmp_spark.operators.dedup import dedup_clusters
    from ixmp_spark.operators.joins import fuzzy_key_join

    rows = [(1, "acme corp"), (2, "acme cor"), (3, "acme co"),
            (4, "globex inc"), (5, "initech")]
    part = spark.createDataFrame(rows, "p_partkey long, p_name string")
    matched = fuzzy_key_join(part, part, "p_name", "p_name")
    pairs = matched.where(
        F.col("p_partkey") < F.col("p_partkey_r")
    ).select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_partkey_r").alias("id_b"),
    )
    # endpoints "acme corp" vs "acme co" are 2 edits apart: no direct
    # pair, linked only through the middle
    direct = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert direct == {(1, 2), (2, 3)}
    labels = {r["id"]: r["cluster"]
              for r in dedup_clusters(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1}   # one entity; 4, 5 stay out


def test_json_profile_keys(spark):
    """json_profile: per-key presence/distinct/numeric stats on mixed
    payloads; malformed rows contribute nothing; numeric typing is
    per-VALUE (a key can be partially numeric)."""
    from ixmp_spark.operators.filtering import json_profile

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "b": "x", "c": null}',),
        ('{"a": "oops"}',),
        ("not json at all",),
    ]
    df = spark.createDataFrame(rows, "j string")
    out = {r["key"]: r for r in json_profile(df, "j").collect()}
    a = out["a"]
    assert (a["n_present"], a["n_distinct"], a["n_numeric"]) == (3, 3, 2)
    assert (a["min_numeric"], a["max_numeric"]) == (1.0, 2.5)
    b = out["b"]
    assert (b["n_present"], b["n_distinct"], b["n_numeric"]) == (2, 1, 0)
    assert b["min_numeric"] is None
    # null JSON value: key present, value NULL -> Spark map drops
    # nothing but the val is NULL; it still counts as present
    assert out["c"]["n_present"] == 1 and out["c"]["n_numeric"] == 0


def test_kaplan_meier_textbook(spark):
    """kaplan_meier reproduces the textbook product-limit table on a
    hand-worked cohort with censoring (the classic 6-subject
    example), keeps S flat through censored-only times, uses censored
    subjects in earlier risk sets, and pins S=0 when the last risk
    set dies (no ln(0) blowup)."""
    from ixmp_spark.operators.sessions import kaplan_meier

    # durations (E=event, C=censored): 1E, 2C, 3E, 3E, 4C, 5E
    rows = [("a", 1, 1), ("a", 2, 0), ("a", 3, 1), ("a", 3, 1),
            ("a", 4, 0), ("a", 5, 1),
            # cohort b: everyone dies at t=2 -> S hits exactly 0
            ("b", 1, 0), ("b", 2, 1), ("b", 2, 1)]
    df = spark.createDataFrame(rows, "cohort string, dur long, ev int")
    out = {(r["cohort"], r["duration"]): r for r in
           kaplan_meier(df, "cohort", "dur", "ev").collect()}

    # hand table for cohort a:
    # t=1: n=6, d=1 -> S = 5/6
    # t=2: n=5, d=0 (censor) -> S flat = 5/6
    # t=3: n=4, d=2 -> S = 5/6 * 2/4
    # t=4: n=2, d=0 -> flat
    # t=5: n=1, d=1 -> S = 0
    a = out[("a", 1)]
    assert (a["n_at_risk"], a["survival"]) == (6, round(5 / 6, 6))
    assert out[("a", 2)]["survival"] == round(5 / 6, 6)
    t3 = out[("a", 3)]
    assert (t3["n_at_risk"], t3["d_events"]) == (4, 2)
    assert t3["survival"] == round(5 / 6 * 2 / 4, 6)
    assert out[("a", 4)]["survival"] == t3["survival"]
    assert out[("a", 5)]["survival"] == 0.0
    b2 = out[("b", 2)]
    assert (b2["n_at_risk"], b2["d_events"], b2["survival"]) == (2, 2, 0.0)


def test_topic_model_planted_structure(spark):
    """topic_model separates two planted disjoint vocabularies: docs
    from each vocabulary land in internally-consistent topics (same
    topic within a family, different across), and the recovered
    topic-term lists are vocabulary-pure."""
    import random

    from ixmp_spark.operators.text import topic_model

    rng = random.Random(11)
    vocab_a = ["spark", "shuffle", "executor", "catalyst", "parquet"]
    vocab_b = ["sonnet", "stanza", "meter", "rhyme", "verse"]
    rows = []
    for i in range(40):
        v = vocab_a if i % 2 == 0 else vocab_b
        rows.append((i, " ".join(rng.choice(v) for _ in range(60))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    doc_topics, topic_terms = topic_model(
        docs, "doc_id", "text", k=2, max_iter=30, seed=7
    )
    got = {r["doc_id"]: r["topic"] for r in doc_topics.collect()}
    a_topics = {got[i] for i in range(0, 40, 2)}
    b_topics = {got[i] for i in range(1, 40, 2)}
    assert len(a_topics) == 1 and len(b_topics) == 1
    assert a_topics != b_topics
    # topic-term purity: each topic's 5 HEAVIEST terms come from one
    # vocabulary (describeTopics lists the whole 10-word vocab, the
    # tail at near-zero weight)
    terms = sorted(topic_terms.collect(),
                   key=lambda r: -r["weight"])
    by_topic: dict[int, list] = {}
    for r in terms:
        by_topic.setdefault(r["topic"], []).append(r["term"])
    ta = set(by_topic[a_topics.pop()][:5])
    tb = set(by_topic[b_topics.pop()][:5])
    assert ta == set(vocab_a) and tb == set(vocab_b)


def test_chisq_independence(spark):
    """chisq_independence matches the hand-computed 2x2 chi-square
    (including a zero-observed cell carrying expected mass), reads
    ~0 on an independent table, and degenerate 1-column tables
    return dof 0 / NULL stats."""
    from ixmp_spark.operators.sampling import chisq_independence

    # 2x2: rows a/b, cols x/y — a:(30,10), b:(10,30): strong assoc
    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 30)
    df = spark.createDataFrame(rows, "r string, c string")
    got = chisq_independence(df, "r", "c").collect()[0]
    # hand: e=20 every cell, chi2 = 4 * (10^2/20) = 20
    assert (got["n"], got["dof"], got["chi2"]) == (80, 1, 20.0)
    assert got["cramers_v"] == 0.5  # sqrt(20/80)

    # zero-observed cell: a:(10,0), b:(10,10)
    z = spark.createDataFrame(
        [("a", "x")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 10,
        "r string, c string",
    )
    gz = chisq_independence(z, "r", "c").collect()[0]
    # marginals: rows 10/20, cols 20/10; e(a,y)=10*10/30
    e = [(10, 10 * 20 / 30), (0, 10 * 10 / 30),
         (10, 20 * 20 / 30), (10, 20 * 10 / 30)]
    chi = sum((o - x) ** 2 / x for o, x in e)
    assert gz["chi2"] == round(chi, 4)

    ind = spark.createDataFrame(
        [("a", "x")] * 10 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 10,
        "r string, c string",
    )
    assert chisq_independence(ind, "r", "c").collect()[0]["chi2"] == 0.0

    deg = spark.createDataFrame([("a", "x"), ("b", "x")], "r string, c string")
    gd = chisq_independence(deg, "r", "c").collect()[0]
    assert gd["dof"] == 0 and gd["chi2"] is None


def _mw_reference(a, b):
    """Pure-Python Mann-Whitney U (tie-corrected z, no continuity
    correction) — the replay the distributed rank identity must match."""
    import math

    allv = sorted(set(a) | set(b))
    cnt = {v: a.count(v) + b.count(v) for v in allv}
    cum, ar = 0.0, {}
    for v in allv:
        ar[v] = cum + (cnt[v] + 1) / 2
        cum += cnt[v]
    n1, n2 = len(a), len(b)
    r1 = sum(ar[v] for v in a)
    u1 = r1 - n1 * (n1 + 1) / 2
    ties = sum(t**3 - t for t in cnt.values())
    n = n1 + n2
    sig2 = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(sig2) if sig2 > 0 else None
    rb = 2 * u1 / (n1 * n2) - 1
    return u1, z, rb


def test_mann_whitney_hand_and_replay(spark):
    """mann_whitney_u matches the hand U on a textbook case, the
    pure-Python replay under heavy ties, and flips sign with the
    group order."""
    from ixmp_spark.operators.sampling import mann_whitney_u

    # disjoint: A all above B -> U1 = n1*n2 (A wins every pair)
    rows = [("A", v) for v in (7, 8, 9)] + [("B", v) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert (got["n_a"], got["n_b"], got["u_a"]) == (3, 4, 12.0)
    assert got["rank_biserial"] == 1.0

    # heavy ties: replay check
    a = [1, 2, 2, 3, 5, 5, 5, 9]
    b = [2, 2, 4, 5, 6, 6]
    df2 = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in b], "g string, v int"
    )
    g2 = mann_whitney_u(df2, "g", "v", "A", "B").collect()[0]
    u1, z, rb = _mw_reference(a, b)
    assert g2["u_a"] == u1
    assert g2["z"] == round(z, 4)
    assert g2["rank_biserial"] == round(rb, 4)

    # antisymmetry: swapping the groups negates z and rank-biserial
    g3 = mann_whitney_u(df2, "g", "v", "B", "A").collect()[0]
    assert g3["rank_biserial"] == -g2["rank_biserial"]
    assert abs(g3["z"] + g2["z"]) <= 1e-3  # z uses U_b: sign flip

    # all-tied: zero variance -> z NULL, U at midpoint
    df4 = spark.createDataFrame(
        [("A", 5)] * 3 + [("B", 5)] * 2, "g string, v int"
    )
    g4 = mann_whitney_u(df4, "g", "v", "A", "B").collect()[0]
    assert g4["z"] is None and g4["u_a"] == 3.0  # n1*n2/2


def test_spearman_rho_pinned(spark):
    """spearman_rho: +1 on a monotone map, -1 on a reversed one,
    exact hand value under ties, NULL on a constant column."""
    from ixmp_spark.operators.sampling import spearman_rho

    inc = [("g", x, x * 10) for x in range(1, 8)]
    dec = [("h", x, 80 - x * 10) for x in range(1, 8)]
    df = spark.createDataFrame(inc + dec, "k string, x int, y int")
    got = {
        r["k"]: r["spearman_rho"]
        for r in spearman_rho(df, "k", "x", "y").collect()
    }
    assert got == {"g": 1.0, "h": -1.0}

    # ties: x=(1,2,2,3), y=(1,3,2,4) -> avg ranks rx=(1,2.5,2.5,4),
    # ry=(1,3,2,4); hand rho = 0.9487 (pearson of those ranks)
    t = spark.createDataFrame(
        [("t", 1, 1), ("t", 2, 3), ("t", 2, 2), ("t", 3, 4)],
        "k string, x int, y int",
    )
    rho = spearman_rho(t, "k", "x", "y").collect()[0]["spearman_rho"]
    import math

    rx, ry = [1, 2.5, 2.5, 4], [1, 3, 2, 4]
    n = 4.0
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    hand = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert rho == round(hand, 4)

    const = spark.createDataFrame(
        [("c", 1, 5), ("c", 2, 5)], "k string, x int, y int"
    )
    assert (
        spearman_rho(const, "k", "x", "y").collect()[0]["spearman_rho"]
        is None
    )


def test_mutual_information_pinned(spark):
    """mutual_information: 0 on an independent grid, ln(k) with
    nmi=1 on a bijection, NULL nmi on a constant column."""
    import math

    from ixmp_spark.operators.sampling import mutual_information

    ind = spark.createDataFrame(
        [("a", "x")] * 6 + [("a", "y")] * 6
        + [("b", "x")] * 6 + [("b", "y")] * 6,
        "r string, c string",
    )
    gi = mutual_information(ind, "r", "c").collect()[0]
    assert gi["mi"] == 0.0 and gi["nmi"] == 0.0

    bij = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 5 + [("c", "z")] * 5,
        "r string, c string",
    )
    gb = mutual_information(bij, "r", "c").collect()[0]
    assert gb["mi"] == round(math.log(3), 4)
    assert gb["h_row"] == gb["h_col"] == gb["mi"]
    assert gb["nmi"] == 1.0

    const = spark.createDataFrame(
        [("a", "x"), ("b", "x")], "r string, c string"
    )
    gc = mutual_information(const, "r", "c").collect()[0]
    assert gc["h_col"] == 0.0 and gc["mi"] == 0.0 and gc["nmi"] is None


def test_bradley_terry_planted_recovery(spark):
    """Planted-strengths recovery (pins x27_bradley_terry): strengths
    4:2:1, duel counts set EXACTLY to n·p_i/(p_i+p_j) per pair —
    A beats B 40/60, A beats C 48/60, B beats C 40/60 — so the
    planted vector satisfies the prior=0 likelihood equations
    exactly and the MM fixpoint must recover it (mean-1 normalized).
    The forced-distributed run (driver_max_pairs=0) must agree with
    the numpy fast path to rounding."""
    from ixmp_spark.operators.joins import bradley_terry

    rows = (
        [("A", "B")] * 40 + [("B", "A")] * 20
        + [("A", "C")] * 48 + [("C", "A")] * 12
        + [("B", "C")] * 40 + [("C", "B")] * 20
    )
    df = spark.createDataFrame(rows, "winner string, loser string")
    got = {
        r["item"]: r
        for r in bradley_terry(df, prior=0.0, tol=1e-9).collect()
    }
    mean = (4.0 + 2.0 + 1.0) / 3
    for item, planted in (("A", 4.0), ("B", 2.0), ("C", 1.0)):
        assert abs(got[item]["strength"] - planted / mean) < 1e-4, (
            item, got[item]["strength"], planted / mean)
    assert got["A"]["wins"] == 88.0
    assert got["A"]["n_comparisons"] == 120.0
    assert got["C"]["wins"] == 32.0
    # driver fast path ≡ distributed MM loop
    dist = {
        r["item"]: r["strength"]
        for r in bradley_terry(
            df, prior=0.0, tol=1e-7, driver_max_pairs=0
        ).collect()
    }
    for item in got:
        assert abs(dist[item] - got[item]["strength"]) < 1e-6

    # prior>0 shrinks toward uniform but preserves the order
    reg = {
        r["item"]: r["strength"]
        for r in bradley_terry(df, prior=1.0, tol=1e-9).collect()
    }
    assert reg["A"] > reg["B"] > reg["C"]
    assert reg["A"] < got["A"]["strength"]  # shrunk toward 1

    empty = bradley_terry(
        spark.createDataFrame([], "winner string, loser string")
    )
    assert empty.count() == 0
    # empty-input schema preserves the input item type (a long-keyed
    # empty frame must not come back string-keyed)
    empty_long = bradley_terry(
        spark.createDataFrame([], "winner long, loser long")
    )
    assert empty_long.schema["item"].dataType.simpleString() == "bigint"
    assert empty_long.count() == 0


def test_mmr_rerank_pinned(spark):
    """MMR pinning (pins p23_mmr_rerank): (a) the planted
    near-duplicate — an EXACT duplicate of the top hit — is demoted
    to last at low lambda while diverse docs are promoted; (b)
    lambda=1 reproduces the pure relevance order (brute_force_topk
    with the same tie-break); (c) lambda out of range raises."""
    import pytest as _pytest

    from ixmp_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),  # planted exact duplicate of id 1
            (3, [1.0, 1.0]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    probe = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    low = mmr_rerank(
        corpus, probe, "vec_id", "embedding", k=4, lambda_=0.3,
        candidates=10,
    ).collect()
    assert [r["vec_id"] for r in low] == [1, 4, 3, 2]
    assert [r["rank"] for r in low] == [1, 2, 3, 4]
    assert low[0]["relevance"] == 1.0 and low[1]["relevance"] == 0.0

    pure = mmr_rerank(
        corpus, probe, "vec_id", "embedding", k=4, lambda_=1.0,
        candidates=10,
    ).collect()
    rel_order = brute_force_topk(
        corpus, probe, "vec_id", "embedding", k=4
    ).collect()
    assert [r["vec_id"] for r in pure] == [r["vec_id"] for r in rel_order]
    assert [r["relevance"] for r in pure] == [
        r["cosine_sim"] for r in rel_order
    ]

    with _pytest.raises(ValueError):
        mmr_rerank(corpus, probe, "vec_id", "embedding", lambda_=1.5)


def test_ks_jsd_concentration_pinned(spark):
    """Hand-computed pins for the distribution-shape family (x28 KS /
    x29 JSD / a14 concentration): KS D on a textbook offset pair,
    zero on identical samples, 1 on disjoint supports; JSD zero on
    identical mixes, ln2 (norm 1) on disjoint categories, hand value
    on a (1,0)-vs-(.5,.5) pair; Gini/HHI/top-shares on uniform and
    skewed weight vectors."""
    import math

    from ixmp_spark.operators.sampling import (
        concentration_profile,
        js_divergence,
        ks_two_sample,
    )

    def two(a_vals, b_vals):
        rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
        return spark.createDataFrame(rows, "g string, v long")

    g = ks_two_sample(two([1, 2, 3], [2, 3, 4]), "g", "v", "A", "B")
    r = g.collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["d_stat"] == round(1 / 3, 6)
    assert r["ks_stat"] == round(1 / 3 * math.sqrt(9 / 6), 4)
    same = ks_two_sample(two([1, 2], [1, 2]), "g", "v", "A", "B")
    assert same.collect()[0]["d_stat"] == 0.0
    disj = ks_two_sample(two([1, 2], [3, 4]), "g", "v", "A", "B")
    assert disj.collect()[0]["d_stat"] == 1.0
    # degenerate guard: an empty group yields NULL statistics (the
    # welch_ttest convention), never a NaN from 0/0
    degen = ks_two_sample(two([1, 2], []), "g", "v", "A", "B").collect()[0]
    assert degen["d_stat"] is None and degen["ks_stat"] is None

    def mix(a_cats, b_cats):
        rows = [("A", c) for c in a_cats] + [("B", c) for c in b_cats]
        return spark.createDataFrame(rows, "g string, c string")

    eq = js_divergence(mix(["x", "y"], ["x", "y"]), "g", "c", "A", "B")
    assert eq.collect()[0]["jsd"] == 0.0
    dj = js_divergence(mix(["x"] * 3, ["y"] * 5), "g", "c", "A", "B")
    rd = dj.collect()[0]
    assert rd["jsd"] == round(math.log(2), 4) and rd["jsd_norm"] == 1.0
    # p=(1,0) vs q=(.5,.5): hand 0.5*ln(4/3) + 0.25*ln(2/3) + 0.25*ln 2
    hand = 0.5 * math.log(4 / 3) + 0.25 * math.log(2 / 3) \
        + 0.25 * math.log(2.0)
    hd = js_divergence(
        mix(["x", "x"], ["x", "y"]), "g", "c", "A", "B"
    ).collect()[0]
    assert hd["jsd"] == round(hand, 4)

    def weighted(xs):
        return spark.createDataFrame(
            [(str(i), float(x)) for i, x in enumerate(xs)],
            "k string, w double",
        )

    u = concentration_profile(weighted([1, 1, 1, 1]), "k", "w").collect()[0]
    assert (u["gini"], u["hhi"], u["top1_share"], u["top10_share"]) == (
        0.0, 0.25, 0.25, 1.0)
    s = concentration_profile(weighted([1, 1, 1, 7]), "k", "w").collect()[0]
    assert (s["gini"], s["hhi"], s["top1_share"]) == (0.45, 0.52, 0.7)
    assert s["n_keys"] == 4 and s["total"] == 10.0
    # non-positive-weight contract: zero/negative totals are excluded
    # (they carry no concentration mass and would NaN the share math),
    # so the result equals the positive-only vector's
    z = concentration_profile(
        weighted([1, 1, 1, 7, 0, -2]), "k", "w"
    ).collect()[0]
    assert (z["n_keys"], z["gini"], z["hhi"]) == (4, 0.45, 0.52)


def test_association_rules_hand(spark):
    """association_rules (pins x30): 4-basket hand case — exact
    support/confidence/lift, lift ties broken by (support, antecedent,
    consequent), duplicate (basket, item) rows dedupe before
    counting."""
    rows = [("b1", "x"), ("b1", "x"), ("b1", "y"),
            ("b2", "x"), ("b2", "y"),
            ("b3", "x"), ("b3", "z"),
            ("b4", "y")]
    from ixmp_spark.operators.joins import association_rules

    df = spark.createDataFrame(rows, "b string, i string")
    got = association_rules(
        df, "b", "i", min_support=0.0, min_confidence=0.0
    ).collect()
    as_t = [(r["antecedent"], r["consequent"], r["n_ab"], r["support"],
             r["confidence"], r["lift"]) for r in got]
    # lift: x<->z pairs 4/3; x<->y pairs 8/9; ties by antecedent
    assert as_t == [
        ("x", "z", 1, 0.25, round(1 / 3, 6), round(4 / 3, 6)),
        ("z", "x", 1, 0.25, 1.0, round(4 / 3, 6)),
        ("x", "y", 2, 0.5, round(2 / 3, 6), round(8 / 9, 6)),
        ("y", "x", 2, 0.5, round(2 / 3, 6), round(8 / 9, 6)),
    ]
    # thresholds prune: min_confidence=0.5 drops x->z
    pruned = association_rules(
        df, "b", "i", min_support=0.0, min_confidence=0.5
    ).collect()
    assert ("x", "z") not in {
        (r["antecedent"], r["consequent"]) for r in pruned
    }
    # cache_base=True (the cluster one-pass form: the distinct basket
    # frame feeds four consumers) is result-identical and attaches
    # exactly one releasable handle; the default attaches none (the
    # t9 cache_tf contract)
    from ixmp_spark.operators import release_cache

    plain = association_rules(
        df, "b", "i", min_support=0.0, min_confidence=0.0
    )
    cached = association_rules(
        df, "b", "i", min_support=0.0, min_confidence=0.0,
        cache_base=True,
    )
    assert [tuple(r) for r in plain.collect()] == [
        tuple(r) for r in cached.collect()
    ]
    assert release_cache(plain) == 0
    assert release_cache(cached) == 1


def test_matryoshka_recall_planted(spark):
    """matryoshka_recall (pins e12): at dim == full width recall is
    exactly 1.0; a planted corpus whose first-2-dim ranking ties
    adversarially yields recall 0.5 at dim 2 (tie-break by id pulls a
    non-neighbor in); probes with zero surviving neighbors still
    count in n_probes."""
    from ixmp_spark.operators.similarity import matryoshka_recall

    corpus = spark.createDataFrame(
        [
            (1, [0.1, 0.0, 1.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 1.0]),
            (3, [1.0, 0.0, 0.0, 0.0]),
            (4, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    probes = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["dim"]: r
        for r in matryoshka_recall(
            corpus, probes, "vec_id", "embedding", dims=(2, 4), k=2
        ).collect()
    }
    # full top-2 = {3 (cos 1), 2 (cos .707)}; dim-2 top-2 by tie-break
    # = {1, 2} -> recall 0.5
    assert got[2]["mean_recall"] == 0.5
    assert got[4]["mean_recall"] == 1.0  # dim 4 == full width
    assert got[2]["n_probes"] == got[4]["n_probes"] == 1


def test_hill_tail_index_pinned(spark):
    """hill_tail_index (pins x31_hill_tail): exact dyadic hand case —
    top-5 of powers of two gives alpha = 5/(15 ln 2); fewer than m+1
    keys yields NULL alpha; weight_col path matches the count path."""
    import math

    from ixmp_spark.operators.sampling import hill_tail_index

    rows = []
    for i, x in enumerate([64, 32, 16, 8, 4, 2, 1]):
        rows += [(f"k{i}",)] * x
    df = spark.createDataFrame(rows, "k string")
    got = hill_tail_index(df, "k", m=5).collect()[0]
    assert got["n_keys"] == 7 and got["m"] == 5
    assert got["x_threshold"] == 2.0
    assert got["alpha"] == round(5 / (15 * math.log(2)), 6)

    small = hill_tail_index(df, "k", m=10).collect()[0]
    assert small["alpha"] is None  # only 7 keys < m+1

    wdf = spark.createDataFrame(
        [(f"k{i}", float(x))
         for i, x in enumerate([64, 32, 16, 8, 4, 2, 1])],
        "k string, w double",
    )
    wg = hill_tail_index(wdf, "k", weight_col="w", m=5).collect()[0]
    assert wg["alpha"] == got["alpha"]


def test_ipf_raking_planted(spark):
    """ipf_raking (pins p24_ipf_raking): a skew-diagonal 2x2 sample
    raked to uniform-by-uniform — BOTH achieved weighted marginals
    must equal the targets to 1e-6 (the single-axis reweight provably
    cannot: scaling rows of [[8,2],[2,8]] to 50/50 leaves columns at
    50/50 only because of symmetry, so the test uses an ASYMMETRIC
    grid); weighted total mass is preserved; absent target categories
    raise."""
    import pytest as _pytest

    from ixmp_spark.operators.sampling import ipf_raking

    rows = ([("a", "x")] * 8 + [("a", "y")] * 1
            + [("b", "x")] * 2 + [("b", "y")] * 5)
    df = spark.createDataFrame(rows, "r string, c string")
    out = ipf_raking(
        df, "r", "c", {"a": 0.5, "b": 0.5}, {"x": 0.5, "y": 0.5}
    ).collect()
    mass = {(r["r"], r["c"]): r["n"] * r["weight"] for r in out}
    total = sum(mass.values())
    assert abs(total - 16.0) < 1e-5  # mass preserved
    row_a = (mass[("a", "x")] + mass[("a", "y")]) / total
    col_x = (mass[("a", "x")] + mass[("b", "x")]) / total
    assert abs(row_a - 0.5) < 1e-6
    assert abs(col_x - 0.5) < 1e-6
    # the naive single-axis row reweight leaves columns off-target
    naive_rs = {"a": 8.0 / 9, "b": 8.0 / 7}  # scales rows to 8 each
    naive_colx = (8 * naive_rs["a"] + 2 * naive_rs["b"]) / 16
    assert abs(naive_colx - 0.5) > 0.05

    with _pytest.raises(ValueError, match="absent from data"):
        ipf_raking(
            df, "r", "c", {"a": 0.5, "zz": 0.5}, {"x": 0.5, "y": 0.5}
        )
    # the mirror direction: a DATA category missing from the targets
    # must raise too (it would otherwise be silently zero-weighted)
    with _pytest.raises(ValueError, match="absent from targets"):
        ipf_raking(df, "r", "c", {"a": 0.5, "b": 0.5}, {"x": 1.0})


def test_weighted_sample_replay(spark):
    """weighted_reservoir_sample (pins p25): the Spark ranking equals an exact
    pure-Python Efraimidis-Spirakis replay (hashlib md5, same
    (h+0.5)/2^32 uniform, same -ln(u)/w race keys); zero/NULL
    weights are excluded; k caps the draw; reruns are identical."""
    import hashlib
    import math

    from ixmp_spark.operators.sampling import (
        weighted_reservoir_sample as weighted_sample,
    )

    rows = [(i, float(w)) for i, w in
            zip(range(20), [1, 5, 2, 9, 4, 7, 3, 8, 6, 10] * 2)]
    rows += [(90, 0.0), (91, None)]
    df = spark.createDataFrame(rows, "id long, w double")

    def replay(seed=42):
        out = []
        for i, w in rows:
            if not w:
                continue
            h = int(hashlib.md5(f"{seed}#{i}".encode()).hexdigest()[:8],
                    16)
            u = (h + 0.5) / 4294967296.0
            out.append((round(-math.log(u) / w, 8), i))
        return [i for _, i in sorted(out)]

    got = weighted_sample(df, "id", "w", k=8, seed=42).collect()
    assert [r["id"] for r in got] == replay()[:8]
    assert all(r["weight"] > 0 for r in got)
    again = weighted_sample(df, "id", "w", k=8, seed=42).collect()
    assert [r["score"] for r in again] == [r["score"] for r in got]
    # a different seed reshuffles the race
    other = weighted_sample(df, "id", "w", k=8, seed=7).collect()
    assert [r["id"] for r in other] == replay(seed=7)[:8]


def test_welch_ttest_hand(spark):
    """welch_ttest (pins x32): textbook hand case a=[1,2,3] vs
    b=[2,4,6,8] — t = −3/√2, Welch–Satterthwaite df ≈ 4.0755;
    NULL stats when a group has < 2 values; NULL values excluded."""
    import math

    from ixmp_spark.operators.sampling import welch_ttest

    rows = ([("A", v) for v in (1.0, 2.0, 3.0)]
            + [("B", v) for v in (2.0, 4.0, 6.0, 8.0)]
            + [("A", None), ("C", 99.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    assert (got["n_a"], got["n_b"]) == (3, 4)
    assert (got["mean_a"], got["mean_b"]) == (2.0, 5.0)
    assert got["t_stat"] == round(-3 / math.sqrt(2), 4)
    sea, seb = 1 / 3, (20 / 3) / 4
    dof = (sea + seb) ** 2 / (sea**2 / 2 + seb**2 / 3)
    assert got["df"] == round(dof, 4)

    tiny = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("B", 3.0)], "g string, v double"
    )
    gt = welch_ttest(tiny, "g", "v", "A", "B").collect()[0]
    assert gt["t_stat"] is None and gt["df"] is None


def test_rolling_corr_pinned(spark):
    """rolling_corr (pins w33): a perfectly co-moving pair reads
    corr 1.0 once warm, an anti-moving pair −1.0; warm-up rows
    (< window points) are NULL with the true n_in_window; constant
    windows (zero variance) are NULL."""
    from ixmp_spark.operators.sampling import rolling_corr

    pos = [(i, float(i % 5), float(2 * (i % 5) + 3)) for i in range(8)]
    df = spark.createDataFrame(pos, "t long, x double, y double")
    got = rolling_corr(df, "t", "x", "y", window=4).collect()
    assert [r["n_in_window"] for r in got] == [1, 2, 3, 4, 4, 4, 4, 4]
    assert all(r["corr"] is None for r in got[:3])  # warm-up
    assert all(r["corr"] == 1.0 for r in got[3:])

    neg = [(i, float(i % 5), float(-3 * (i % 5))) for i in range(6)]
    gn = rolling_corr(
        spark.createDataFrame(neg, "t long, x double, y double"),
        "t", "x", "y", window=3,
    ).collect()
    assert all(r["corr"] == -1.0 for r in gn[2:] if r["corr"] is not None)

    const = [(i, 1.0, float(i)) for i in range(5)]
    gc = rolling_corr(
        spark.createDataFrame(const, "t long, x double, y double"),
        "t", "x", "y", window=3,
    ).collect()
    assert all(r["corr"] is None for r in gc)  # x variance 0


def test_repetition_signals_pinned(spark):
    """gopher_repetition_signals (pins t29_repetition): hand-computed Gopher
    repetition fractions — a spam loop trips the top-n-gram rules
    (char fractions may exceed 1, overlapping occurrences counted —
    the standard approximation), duplicate lines trip the line rules,
    a planted repeated 5-gram trips dup_5gram, and clean prose
    keeps."""
    from ixmp_spark.operators.text import (
        gopher_repetition_signals as repetition_signals,
    )

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "aa\naa\nbb"),
            (3, "x y z w v x y z w v"),
            (4, "the quick brown fox jumps over a lazy dog today"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r
           for r in repetition_signals(docs, "doc_id", "text").collect()}
    s = got[1]  # norm 19 chars; "spam spam" x3 -> 27/19
    assert s["top_2gram_char_frac"] == round(27 / 19, 6)
    assert s["top_3gram_char_frac"] == round(28 / 19, 6)
    # the single 4-gram occurs ONCE -> not repetition, counts 0
    assert s["top_4gram_char_frac"] == 0.0
    assert s["keep"] is False

    ln = got[2]
    assert ln["n_lines"] == 3
    assert ln["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert ln["dup_line_char_frac"] == round(1 - 4 / 6, 6)

    f = got[3]  # "x y z w v" appears at pos 1 and 6 -> 2*9/19
    assert f["dup_5gram_char_frac"] == round(18 / 19, 6)
    assert f["keep"] is False

    assert got[4]["keep"] is True
    assert got[4]["dup_5gram_char_frac"] == 0.0


def test_cohens_kappa_pinned(spark):
    """cohens_kappa (pins x33): textbook 2x2 — po=0.7, pe=0.5,
    kappa=0.4; perfect agreement → 1.0; a single-category degenerate
    frame → NULL kappa; categories used by only one rater enter the
    marginal-product union."""
    from ixmp_spark.operators.sampling import cohens_kappa

    rows = ([("a", "a")] * 20 + [("b", "b")] * 15
            + [("a", "b")] * 5 + [("b", "a")] * 10)
    df = spark.createDataFrame(rows, "x string, y string")
    g = cohens_kappa(df, "x", "y").collect()[0]
    assert (g["n"], g["p_observed"], g["p_expected"], g["kappa"]) == (
        50, 0.7, 0.5, 0.4)
    assert g["n_categories"] == 2

    perfect = spark.createDataFrame(
        [("a", "a")] * 3 + [("b", "b")] * 3, "x string, y string"
    )
    assert cohens_kappa(perfect, "x", "y").collect()[0]["kappa"] == 1.0

    degen = spark.createDataFrame([("a", "a")] * 4, "x string, y string")
    assert cohens_kappa(degen, "x", "y").collect()[0]["kappa"] is None

    onesided = spark.createDataFrame(
        [("a", "a"), ("a", "z")], "x string, y string"
    )
    assert cohens_kappa(onesided, "x", "y").collect()[0][
        "n_categories"] == 2  # union {a, z}


def test_ljung_box_pinned(spark):
    """ljung_box (pins w34): exact pure-Python replay on a planted
    alternating series (argmax lag 1, huge Q) and a linear ramp;
    n <= m keys emit NULL stats."""
    from ixmp_spark.operators.sampling import ljung_box

    alt = [("alt", i, float(1 if i % 2 == 0 else -1))
           for i in range(20)]
    ramp = [("ramp", i, float(i)) for i in range(15)]
    tiny = [("tiny", i, float(i * i)) for i in range(5)]
    df = spark.createDataFrame(alt + ramp + tiny, "k string, t long, v double")
    got = {r["k"]: r for r in ljung_box(df, "k", "t", "v", m=7).collect()}

    def replay(vals, m=7):
        n = len(vals)
        mu = sum(vals) / n
        s0 = sum((x - mu) ** 2 for x in vals)
        rs = [
            sum((vals[i] - mu) * (vals[i - k] - mu)
                for i in range(k, n)) / s0
            for k in range(1, m + 1)
        ]
        q = n * (n + 2) * sum(
            r * r / (n - k) for k, r in enumerate(rs, 1)
        )
        amax = max(range(m), key=lambda i: (abs(rs[i]), -i)) + 1
        return round(q, 4), round(max(abs(r) for r in rs), 4), amax

    for key, vals in (("alt", [x[2] for x in alt]),
                      ("ramp", [x[2] for x in ramp])):
        q, mr, am = replay(vals)
        r = got[key]
        assert (r["q_stat"], r["max_abs_r"], r["argmax_lag"]) == (q, mr, am)
    assert got["alt"]["argmax_lag"] == 1
    assert got["tiny"]["q_stat"] is None  # n=5 <= m=7


def test_embedding_dispersion_pinned(spark):
    """embedding_dispersion (pins e13): identical vectors → mean_cos
    1 / dispersion 0; an orthogonal pair → 0; an antipodal pair →
    −1; singletons NULL; zero vectors excluded from n."""
    from ixmp_spark.operators.similarity import embedding_dispersion

    rows = [
        ("same", [1.0, 0.0]), ("same", [2.0, 0.0]), ("same", [3.0, 0.0]),
        ("orth", [1.0, 0.0]), ("orth", [0.0, 5.0]),
        ("anti", [1.0, 0.0]), ("anti", [-2.0, 0.0]),
        ("solo", [1.0, 1.0]),
        ("zed", [1.0, 0.0]), ("zed", [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    got = {r["label"]: r
           for r in embedding_dispersion(df, "label", "embedding").collect()}
    assert got["same"]["mean_cos"] == 1.0
    assert got["same"]["dispersion"] == 0.0
    assert got["orth"]["mean_cos"] == 0.0
    assert got["anti"]["mean_cos"] == -1.0
    assert got["solo"]["mean_cos"] is None
    assert got["zed"]["n"] == 1  # the zero vector carries no direction


def test_mcnemar_pinned(spark):
    """mcnemar_test (pins x34): textbook discordant counts b=10,
    c=4 → chi2 = 36/14; NULL-outcome pairs excluded;
    no-discordance → NULL chi2."""
    from ixmp_spark.operators.sampling import mcnemar_test

    rows = ([(True, True)] * 20 + [(False, False)] * 16
            + [(True, False)] * 10 + [(False, True)] * 4
            + [(None, True)])
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    m = mcnemar_test(df, "a", "b").collect()[0]
    assert (m["n"], m["n_both"], m["n_neither"]) == (50, 20, 16)
    assert (m["a_only"], m["b_only"]) == (10, 4)
    assert m["chi2"] == round(36 / 14, 4)

    agree = spark.createDataFrame(
        [(True, True), (False, False)], "a boolean, b boolean"
    )
    assert mcnemar_test(agree, "a", "b").collect()[0]["chi2"] is None


def test_changepoint_single_pinned(spark):
    """changepoint_single (pins w32_changepoint): hand AMOC case — a
    clean 10→20 level shift splits exactly at the boundary with
    stat 15/√1.5 and shift 10; a constant series still emits its
    argmax row but with shift 0; a single-point key emits nothing;
    ties break to the earliest time."""
    import math
    from datetime import date

    from ixmp_spark.operators.sessions import changepoint_single

    rows = [("g", date(2024, 1, d), float(v))
            for d, v in zip(range(1, 7), [10, 10, 10, 20, 20, 20])]
    rows += [("flat", date(2024, 1, d), 5.0) for d in range(1, 5)]
    rows += [("solo", date(2024, 1, 1), 1.0)]
    df = spark.createDataFrame(rows, "k string, t date, v double")
    got = {r["k"]: r for r in changepoint_single(df, "k", "t", "v").collect()}
    g = got["g"]
    assert str(g["split_time"]) == "2024-01-03"
    assert (g["mean_before"], g["mean_after"], g["shift"]) == (
        10.0, 20.0, 10.0)
    assert g["cusum_stat"] == round(15 / math.sqrt(1.5), 4)
    assert g["n_points"] == 6
    f = got["flat"]
    assert f["shift"] == 0.0 and f["cusum_stat"] == 0.0
    # tie on a flat series → earliest candidate day
    assert str(f["split_time"]) == "2024-01-01"
    assert "solo" not in got  # no candidate split on 1 point


def test_stat_family_null_exclusion(spark):
    """NULL categories / values are EXCLUDED, not ranked-or-vanished
    (the r8 ADVICE class): chi-square on an independent table plus a
    NULL row-category must stay 0 (before the fix the non-null-safe
    grid join dropped the NULL cells' observed counts while their
    mass stayed in N/marginals -> chi2=2.0, V=0.577); Mann-Whitney /
    Spearman / MI with NULL rows must equal the same data without
    them (before, a NULL value ranked as a real lowest category)."""
    from ixmp_spark.operators.sampling import (
        chisq_independence,
        mann_whitney_u,
        mutual_information,
        spearman_rho,
    )

    # ADVICE repro: perfectly independent 2x2 + one NULL row-category
    ind_null = spark.createDataFrame(
        [("a", "x")] * 10 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 10
        + [(None, "x")] * 4,
        "r string, c string",
    )
    g = chisq_independence(ind_null, "r", "c").collect()[0]
    assert g["chi2"] == 0.0 and g["cramers_v"] == 0.0
    assert g["n"] == 40 and g["n_rows"] == 2  # NULL is not a category

    clean = [("A", 5.0), ("A", 7.0), ("B", 3.0), ("B", 6.0), ("B", 9.0)]
    base = spark.createDataFrame(clean, "g string, v double")
    with_null = spark.createDataFrame(
        clean + [("A", None), ("B", None)], "g string, v double"
    )
    want = mann_whitney_u(base, "g", "v", "A", "B").collect()[0]
    got = mann_whitney_u(with_null, "g", "v", "A", "B").collect()[0]
    assert got.asDict() == want.asDict()
    assert got["n_a"] == 2  # NULL did not count as an A observation

    xy = [("g", 1.0, 2.0), ("g", 2.0, 3.0), ("g", 3.0, 1.0),
          ("g", 4.0, 4.0)]
    sb = spark.createDataFrame(xy, "k string, x double, y double")
    sn = spark.createDataFrame(
        xy + [("g", None, 9.0), ("g", 0.5, None)],
        "k string, x double, y double",
    )
    assert (
        spearman_rho(sn, "k", "x", "y").collect()[0].asDict()
        == spearman_rho(sb, "k", "x", "y").collect()[0].asDict()
    )

    mi_null = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 5 + [(None, "y")] * 3
        + [("a", None)] * 3,
        "r string, c string",
    )
    gm = mutual_information(mi_null, "r", "c").collect()[0]
    assert gm["n"] == 10 and gm["nmi"] == 1.0  # clean bijection remains


def test_redact_cards_boundary_anchored(spark):
    """A Luhn-valid card that ALSO occurs as a substring of a longer
    non-candidate digit run must be masked standalone but left intact
    inside the long run (the r8 ADVICE class: plain substring replace
    corrupted the long run)."""
    from ixmp_spark.operators.text import redact_cards

    card = "4539578763621486"  # Luhn-valid 16-digit
    long_run = "11" + card + "22"  # 20 digits: not a candidate
    s = f"pay {card} audit {long_run} done"
    df = spark.createDataFrame([(1, s)], "id int, s string")
    got = df.select(redact_cards("s").alias("r")).collect()[0]["r"]
    assert got == f"pay <CARD> audit {long_run} done"
    # boundary at string edges still masks
    edge = spark.createDataFrame([(1, card)], "id int, s string")
    assert edge.select(
        redact_cards("s").alias("r")
    ).collect()[0]["r"] == "<CARD>"
    # repeated occurrences of the same card all mask
    rep = spark.createDataFrame(
        [(1, f"{card} and {card}")], "id int, s string"
    )
    assert rep.select(
        redact_cards("s").alias("r")
    ).collect()[0]["r"] == "<CARD> and <CARD>"


def test_degree_assortativity_pinned(spark):
    """degree_assortativity: exactly -1 on a star (hubs meet only
    leaves), NULL on a degree-regular complete graph, and the
    node/edge counts are real."""
    from ixmp_spark.operators.joins import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src int, dst int"
    )
    gs = degree_assortativity(star).collect()[0]
    assert (gs["n_nodes"], gs["n_edges"]) == (6, 5)
    assert gs["assortativity"] == -1.0

    k4 = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(i + 1, 4)],
        "src int, dst int",
    )
    gk = degree_assortativity(k4).collect()[0]
    assert (gk["n_nodes"], gk["n_edges"]) == (4, 6)
    assert gk["assortativity"] is None


def test_max_drawdown_pinned(spark):
    """max_drawdown: hand curve (peak 10 -> trough -2 => dd 12),
    zero on a monotone-rising curve, ties broken by the tiebreak
    column, keys independent."""
    from datetime import datetime

    from ixmp_spark.operators.sessions import max_drawdown

    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0.replace(hour=h), i, v)
        for h, i, v in [
            (1, 1, 10.0), (2, 2, -5.0), (3, 3, -3.0),
            (4, 4, 2.0), (5, 5, -6.0),
        ]
    ] + [("m", t0.replace(hour=h), h, 1.0) for h in range(1, 5)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id int, v double"
    )
    got = {r["k"]: r for r in max_drawdown(df, "k", "ts", "v", "id").collect()}
    assert got["u"]["max_drawdown"] == 12.0
    assert got["u"]["final_value"] == -2.0
    assert got["u"]["peak_value"] == 10.0
    assert got["m"]["max_drawdown"] == 0.0
    assert got["m"]["final_value"] == 4.0

    # equal-ts rows: order decided by the tiebreak id (+5 first
    # -> peak 5, then -4 => dd 9; wrong order would report dd 4)
    tie = spark.createDataFrame(
        [("t", t0, 1, 5.0), ("t", t0, 2, -9.0)],
        "k string, ts timestamp, id int, v double",
    )
    gt = max_drawdown(tie, "k", "ts", "v", "id").collect()[0]
    assert gt["max_drawdown"] == 9.0 and gt["final_value"] == -4.0


def test_edit_distance_join_planted(spark):
    """edit_distance_join (pins d12_edit_join): the Spark pair set
    equals a brute-force Levenshtein replay on a planted vocabulary —
    including pairs whose only shared grams are rare (the prefix-filter
    guarantee), short strings routed around the q-gram path, and
    duplicate strings expanding to id pairs; the short-candidate guard
    raises instead of truncating."""
    import itertools

    import pytest as _pytest

    from ixmp_spark.operators.dedup import edit_distance_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    vocab = [
        "small ring", "small ringo", "smell ring", "small rung",
        "red widget", "red widgets", "rad midget",
        "blue bolt", "blue bolts", "glue bolt",
        "ab", "ba", "abc", "xyz",  # short-string path (< q(k+1))
        "hot gear", "hot gear",   # duplicate string, distinct ids
        # short string lexicographically GREATER than a long within-k
        # partner: the ordered short-path join dropped this pair (the
        # r10 ADVICE false negative); != + least/greatest keeps it
        "zzzzz", "azzzzz",
    ]
    rows = [(i, s) for i, s in enumerate(vocab)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(df, "id", "s", max_edits=2).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        if a != b and lev(a, b) <= 2:
            want[(min(i, j), max(i, j))] = lev(a, b)
    assert got == want
    # sanity: the planted set exercises both regimes
    assert (10, 11) in want and want[(10, 11)] == 2  # ab<->ba, short path
    assert (0, 1) in want  # long path
    assert (16, 17) in want and want[(16, 17)] == 1  # short>long ordering
    with _pytest.raises(RuntimeError, match="max_short"):
        shorts = spark.createDataFrame(
            [(i, f"a{i % 9}") for i in range(200)], "id long, s string"
        )
        edit_distance_join(shorts, "id", "s", max_edits=2, max_short=10)


def test_fleiss_kappa_hand(spark):
    """fleiss_kappa (pins x35): hand-computed 3-rater example; perfect
    agreement gives kappa 1; single-category data gives NULL (P_e=1);
    unequal rating counts raise."""
    import pytest as _pytest

    from ixmp_spark.operators.sampling import fleiss_kappa

    # 4 items x 3 raters: items 1-2 unanimous 'a', item 3 split 2a/1b,
    # item 4 unanimous 'b'.
    rows = (
        [(1, "a")] * 3 + [(2, "a")] * 3
        + [(3, "a"), (3, "a"), (3, "b")] + [(4, "b")] * 3
    )
    df = spark.createDataFrame(rows, "i long, c string")
    r = fleiss_kappa(df, "i", "c").collect()[0]
    # P_i: 1, 1, (4+1-3)/6=1/3, 1 -> P_bar = 10/12; p_a=8/12, p_b=4/12
    # P_e = (2/3)^2+(1/3)^2 = 5/9; kappa = (5/6-5/9)/(1-5/9) = 0.625
    assert (r["n_items"], r["n_raters"], r["n_categories"]) == (4, 3, 2)
    assert r["p_bar"] == round(10 / 12, 6)
    assert r["p_e"] == round(5 / 9, 6)
    assert r["kappa"] == 0.625
    perfect = spark.createDataFrame(
        [(1, "a")] * 3 + [(2, "b")] * 3, "i long, c string"
    )
    assert fleiss_kappa(perfect, "i", "c").collect()[0]["kappa"] == 1.0
    same = spark.createDataFrame([(1, "a")] * 3 + [(2, "a")] * 3,
                                 "i long, c string")
    assert fleiss_kappa(same, "i", "c").collect()[0]["kappa"] is None
    with _pytest.raises(ValueError, match="same number"):
        fleiss_kappa(
            spark.createDataFrame(
                [(1, "a")] * 3 + [(2, "a")] * 2, "i long, c string"
            ),
            "i", "c",
        )


def test_bh_fdr_step_up(spark):
    """bh_fdr (pins x36): the textbook example AND the step-up
    subtlety — a p-value ABOVE its own threshold is still rejected
    when a LARGER rank passes (k* is the max passing rank, not a
    running gate)."""
    from ixmp_spark.operators.sampling import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04), ("e", 0.2)],
        "k string, p double",
    )
    got = {r["key"]: r["rejected"]
           for r in bh_fdr(df, "k", "p", q=0.05).collect()}
    assert got == {"a": True, "b": True, "c": True, "d": True, "e": False}
    # step-up: rank-2 p=0.049 > 0.0333 fails its own bar, but rank-3
    # p=0.05 <= 0.05 passes, so ALL of ranks 1..3 reject
    df2 = spark.createDataFrame(
        [("a", 0.001), ("b", 0.049), ("c", 0.05)], "k string, p double"
    )
    got2 = {r["key"]: r["rejected"]
            for r in bh_fdr(df2, "k", "p", q=0.05).collect()}
    assert got2 == {"a": True, "b": True, "c": True}
    none = bh_fdr(
        spark.createDataFrame([("a", 0.9), ("b", 0.8)], "k string, p double"),
        "k", "p", q=0.05,
    ).collect()
    assert all(not r["rejected"] for r in none)


def test_stratified_split_replay(spark):
    """stratified_split (pins p26): the Spark assignment equals an
    exact pure-Python md5 replay per row (hash-certified determinism),
    shares sum to 1 per stratum, and reruns are identical."""
    import hashlib

    from ixmp_spark.operators.sampling import stratified_split

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = {
        (r["stratum"], r["split"]): r["n"]
        for r in stratified_split(df, "id", "lang", seed=42).collect()
    }

    want: dict = {}
    for i, lang in rows:
        h = int(hashlib.md5(f"42#{i}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        split = "train" if u < 0.8 else ("val" if u < 0.9 else "test")
        want[(lang, split)] = want.get((lang, split), 0) + 1
    assert out == want
    out2 = {
        (r["stratum"], r["split"]): r["n"]
        for r in stratified_split(df, "id", "lang", seed=42).collect()
    }
    assert out2 == out
    shares = {}
    for r in stratified_split(df, "id", "lang", seed=42).collect():
        shares.setdefault(r["stratum"], 0.0)
        shares[r["stratum"]] += r["share"]
    assert all(abs(v - 1.0) < 1e-5 for v in shares.values())


def test_weighted_quantiles_hand(spark):
    """weighted_quantiles (pins x37): hand case with the type-1 (lower)
    definition; zero/negative weights excluded."""
    from ixmp_spark.operators.sampling import weighted_quantiles

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 2.0), (9.0, 0.0), (9.0, -1.0)],
        "v double, w double",
    )
    got = {
        r["q"]: (r["value"], r["total_weight"])
        for r in weighted_quantiles(df, "v", "w", qs=(0.25, 0.5, 0.75)).collect()
    }
    assert got == {0.25: (1.0, 4.0), 0.5: (2.0, 4.0), 0.75: (3.0, 4.0)}


def test_isotonic_calibration_planted(spark):
    """isotonic_calibration (pins t30): PAV pools the planted violator
    run (0.4, 0.3, 0.2) to its weighted mean 0.3 while leaving the
    monotone ends untouched; output is non-decreasing; the bounded-
    block guard raises on too many levels."""
    import pytest as _pytest

    from ixmp_spark.operators.sampling import isotonic_calibration

    rates = {1.0: 0.1, 2.0: 0.4, 3.0: 0.3, 4.0: 0.2, 5.0: 0.5, 6.0: 0.9}
    rows = []
    for s, r in rates.items():
        k = int(r * 10)
        rows += [(s, 1.0)] * k + [(s, 0.0)] * (10 - k)
    df = spark.createDataFrame(rows, "score double, label double")
    out = isotonic_calibration(df, "score", "label").collect()
    cal = {r["score"]: r["calibrated"] for r in out}
    assert cal == {1.0: 0.1, 2.0: 0.3, 3.0: 0.3, 4.0: 0.3, 5.0: 0.5,
                   6.0: 0.9}
    assert all(r["n"] == 10 for r in out)
    vals = [r["calibrated"] for r in sorted(out, key=lambda r: r["score"])]
    assert vals == sorted(vals)  # monotone by construction
    with _pytest.raises(ValueError, match="distinct score"):
        isotonic_calibration(df, "score", "label", max_levels=2)


def test_transition_pmi_hand(spark):
    """transition_pmi (pins g12): hand-computed PMI on an engineered
    path set — the independent pair lands at PMI ~0 while the
    always-follows pair is strongly positive; min_count prunes."""
    import math
    from datetime import datetime, timedelta

    from ixmp_spark.operators.sessions import transition_pmi

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 8 users: a -> b always; 8 users: c -> (b then d alternating)
    for u in range(8):
        rows.append((eid, t0 + timedelta(seconds=eid), u, "a")); eid += 1
        rows.append((eid, t0 + timedelta(seconds=eid), u, "b")); eid += 1
    for u in range(8, 16):
        rows.append((eid, t0 + timedelta(seconds=eid), u, "c")); eid += 1
        rows.append(
            (eid, t0 + timedelta(seconds=eid), u,
             "b" if u % 2 == 0 else "d")
        ); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {(r["src"], r["dst"]): (r["n"], r["pmi"])
           for r in transition_pmi(df, min_count=4).collect()}
    # steps: a->b x8, c->b x4, c->d x4; total 16
    # PMI(a,b) = ln(8*16/(8*12)); PMI(c,b) = ln(4*16/(8*12)); PMI(c,d)=ln(4*16/(8*4))
    assert got[("a", "b")] == (8, round(math.log(8 * 16 / (8 * 12)), 6))
    assert got[("c", "b")] == (4, round(math.log(4 * 16 / (8 * 12)), 6))
    assert got[("c", "d")] == (4, round(math.log(4 * 16 / (8 * 4)), 6))
    assert got[("c", "d")][1] > 0 > got[("c", "b")][1]
    # min_count prunes everything at 5
    assert all(
        r["n"] >= 5 for r in transition_pmi(df, min_count=5).collect()
    )


def test_ngram_novelty_hand(spark):
    """ngram_novelty (pins t31): first doc is 100% novel; an exact
    repeat is 0% novel; a half-overlap doc scores its novel share;
    sub-n docs are absent."""
    from ixmp_spark.operators.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),
            (3, "the quick brown cat sleeps here"),
            (4, "to be"),  # 2 tokens < n -> no grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
           for r in ngram_novelty(df, "doc_id", "text", n=3).collect()}
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (3, 0, 0.0)
    # doc 3 grams: 'the quick brown' (seen), 'quick brown cat',
    # 'brown cat sleeps', 'cat sleeps here' -> 3/4 novel
    assert got[3] == (4, 3, 0.75)
    assert 4 not in got


def test_auc_roc_hand(spark):
    """auc_roc (pins x38): perfect separation gives 1.0, reversed 0.0,
    all-ties 0.5 (midranks), a textbook mixed case matches the
    pair-counting definition, and single-class input returns NULL."""
    from ixmp_spark.operators.sampling import auc_roc

    def frame(pairs):
        return spark.createDataFrame(pairs, "s double, y double")

    perfect = frame([(1.0, 0.0), (2.0, 0.0), (3.0, 1.0), (4.0, 1.0)])
    assert auc_roc(perfect, "s", "y").collect()[0]["auc"] == 1.0
    reverse = frame([(1.0, 1.0), (2.0, 1.0), (3.0, 0.0), (4.0, 0.0)])
    r = auc_roc(reverse, "s", "y").collect()[0]
    assert r["auc"] == 0.0 and r["gini"] == -1.0
    ties = frame([(5.0, 1.0), (5.0, 0.0), (5.0, 1.0), (5.0, 0.0)])
    assert auc_roc(ties, "s", "y").collect()[0]["auc"] == 0.5
    # mixed: pos scores {2, 3}, neg {1, 3}: of the 4 (pos, neg) pairs
    # (2,1) and (3,1) win, (2,3) loses, (3,3) ties -> (2 + 0.5)/4
    mixed = frame([(1.0, 0.0), (3.0, 0.0), (2.0, 1.0), (3.0, 1.0)])
    m = auc_roc(mixed, "s", "y").collect()[0]
    assert m["auc"] == round((2 + 0.5) / 4, 6)
    single = frame([(1.0, 1.0), (2.0, 1.0)])
    s = auc_roc(single, "s", "y").collect()[0]
    assert s["auc"] is None and s["gini"] is None


def test_lsh_plan_hand(spark):
    """lsh_parameter_plan (pins d13): the S-curve arithmetic on hand
    values — (16 bands, 8 rows) from 128 hashes has s* = (1/16)^(1/8)
    and p(s) = 1-(1-s^8)^16; the full divisor grid is present; band
    probabilities are monotone in s."""
    from ixmp_spark.operators.dedup import lsh_parameter_plan

    out = {(r["bands"], r["rows"]): r
           for r in lsh_parameter_plan(spark, 128, 0.5).collect()}
    assert set(out) == {(1, 128), (2, 64), (4, 32), (8, 16), (16, 8),
                        (32, 4), (64, 2), (128, 1)}
    r = out[(16, 8)]
    assert r["s_threshold"] == round((1 / 16) ** (1 / 8), 6)
    assert r["p_at_0_8"] == round(1 - (1 - 0.8 ** 8) ** 16, 6)
    for row in out.values():
        assert (row["p_at_0_3"] <= row["p_at_0_5"] <= row["p_at_0_7"]
                <= row["p_at_0_9"])


def test_markov_stationary_planted(spark):
    """markov_stationary (pins g13): a hand two-state chain converges
    to the exact eigenvector; a dangling state redistributes; a
    2-cycle (periodic) chain still converges from the uniform start
    (its average is the stationary point); max_states raises."""
    from datetime import datetime, timedelta

    import pytest as _pytest

    from ixmp_spark.operators.sessions import markov_stationary

    t0 = datetime(2024, 1, 1)

    def chain(path_per_user):
        rows = []
        eid = 0
        for u, path in enumerate(path_per_user):
            for ev in path:
                rows.append((eid, t0 + timedelta(seconds=eid), u, ev))
                eid += 1
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string",
        )
    # one path of 10 a's then b, b, a gives transition counts
    # a->a x9, a->b, b->b, b->a -> P = [[.9,.1],[.5,.5]], whose
    # stationary distribution is (5/6, 1/6)
    df = chain([["a"] * 10 + ["b", "b", "a"]])
    # steps: a->a x9, a->b, b->b, b->a -> P=[[9/10,1/10],[1/2,1/2]]
    got = {r["state"]: r["stationary_p"]
           for r in markov_stationary(df).collect()}
    assert abs(got["a"] - 5 / 6) < 1e-7
    assert abs(got["b"] - 1 / 6) < 1e-7
    # dangling: a->b only; b has no outgoing -> redistributes uniformly
    dang = chain([["a", "b"]])
    gd = {r["state"]: r["stationary_p"]
          for r in markov_stationary(dang).collect()}
    assert abs(gd["a"] - 1 / 3) < 1e-6 and abs(gd["b"] - 2 / 3) < 1e-6
    with _pytest.raises(ValueError, match="max_states"):
        markov_stationary(df, max_states=1)
    # two-regime cross-validation (g13 vs x12's distributed form): the
    # exact bounded-block fixpoint at teleport 0.05 ranks the states
    # identically to the weighted-pagerank loop at damping 0.95 on a
    # 3-state chain with distinct occupancies
    from pyspark.sql import functions as F

    from ixmp_spark.operators.joins import pagerank

    df3 = chain([["a"] * 6 + ["b", "a", "a", "b", "c", "a"]] * 2)
    exact = [r["state"] for r in markov_stationary(
        df3, teleport=0.05
    ).collect()]
    w = __import__("pyspark.sql", fromlist=["Window"]).Window
    trans = (
        df3.withColumn(
            "next",
            F.lead("event_type").over(
                w.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .where(F.col("next").isNotNull())
        .groupBy(F.col("event_type").alias("src"),
                 F.col("next").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pr = pagerank(trans, damping=0.95, max_iter=40, weight_col="w")
    distributed = [
        r[0] for r in pr.orderBy(F.desc(pr.columns[1])).collect()
    ]
    assert exact == distributed


def test_zipf_slope_exact(spark):
    """zipf_slope (pins t32): a corpus built to an EXACT power law
    (freq ∝ 1/rank over 5 terms) recovers slope −1 to float precision;
    a uniform vocabulary gives slope 0."""
    from ixmp_spark.operators.text import zipf_slope

    # term i (1-indexed) appears 60/i times: ln f = ln 60 - 1 * ln r
    words = []
    for i, t in enumerate(["t1", "t2", "t3", "t4", "t5"], start=1):
        words += [t] * (60 // i)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    r = zipf_slope(df, "text", top_k=5).collect()[0]
    assert r["n_terms"] == 5 and r["slope"] == -1.0
    uni = spark.createDataFrame([("x y z x y z",)], "text string")
    assert zipf_slope(uni, "text").collect()[0]["slope"] == 0.0


def test_tost_equivalence_hand(spark):
    """tost_equivalence (pins x39): identical-mean groups with tight
    spread are equivalent at a generous margin and NOT at a tiny one;
    a clearly shifted pair fails; degenerate inputs give NULLs;
    non-positive margin raises."""
    import pytest as _pytest

    from ixmp_spark.operators.sampling import tost_equivalence

    def frame(a_vals, b_vals):
        rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
        return spark.createDataFrame(rows, "g string, v double")

    same = frame([1.0, 1.1, 0.9, 1.0] * 10, [1.0, 0.9, 1.1, 1.0] * 10)
    r = tost_equivalence(same, "g", "v", "A", "B", margin=0.1).collect()[0]
    assert r["equivalent"] is True and r["diff"] == 0.0
    tight = tost_equivalence(
        same, "g", "v", "A", "B", margin=0.001
    ).collect()[0]
    assert tight["equivalent"] is False
    shifted = frame([1.0] * 5 + [1.2] * 5, [2.0] * 5 + [2.2] * 5)
    s = tost_equivalence(
        shifted, "g", "v", "A", "B", margin=0.1
    ).collect()[0]
    assert s["equivalent"] is False and s["t_lower"] < 0
    degen = tost_equivalence(
        frame([1.0], [2.0, 3.0]), "g", "v", "A", "B", margin=0.5
    ).collect()[0]
    assert degen["se"] is None and degen["equivalent"] is None
    with _pytest.raises(ValueError, match="margin"):
        tost_equivalence(same, "g", "v", "A", "B", margin=0.0)


def test_interval_union_length_hand(spark):
    """interval_union_length (pins w35): overlap merges once, touching
    intervals merge (half-open), gaps split, duplicates collapse into
    the same covered span, degenerate/NULL rows drop, and the naive
    sum double-counts where the union does not."""
    from ixmp_spark.operators.sessions import interval_union_length

    rows = [
        # key A: [0,10) + [5,15) -> 15; [15,20) touches -> merge to 20;
        #        [30,35) gap -> +5; duplicate [30,35) adds nothing
        ("A", 0, 10), ("A", 5, 15), ("A", 15, 20),
        ("A", 30, 35), ("A", 30, 35),
        # key B: disjoint [0,1) [2,3) -> 2
        ("B", 0, 1), ("B", 2, 3),
        # degenerate rows dropped
        ("B", 9, 9), ("B", 9, 5), ("C", None, 4), ("C", 4, None),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        r["k"]: (r["n_intervals"], r["union_len"])
        for r in interval_union_length(df, "k", "s", "e").collect()
    }
    assert got == {"A": (5, 25), "B": (2, 2)}
    naive = 10 + 10 + 5 + 5 + 5  # sum(e - s) for A double-counts to 35
    assert naive == 35 and got["A"][1] == 25


def test_short_doc_hot_guard_prefix_based(spark):
    """ADVICE r12: the short-path hot-gram guard adjudicates on PREFIX
    group size (the candidate join's actual volume driver), not
    restricted-band frequency. A ubiquitous gram ranks LAST in every
    doc's frequency order and never enters a prefix — it must NOT trip
    on_hot='raise' (the old band-frequency guard fired, band freq >=
    prefix size always); identical docs whose first-ranked grams land
    in every prefix MUST still raise, reporting prefix group sizes."""
    import pytest as _pytest

    from ixmp_spark.operators.dedup import _short_doc_pairs

    # 12 docs: one shared ubiquitous gram 'zz' + 3 unique grams each.
    # freq('zz') = 12 ranks it last (freq asc); t=0.5, sz=4 → prefix
    # window rk <= 4 - ceil(0.5*4) + 1 = 3, so 'zz' (rk 4) is in NO
    # prefix. Old guard: band freq 12 > max_bucket 5 → spurious raise.
    rows = [(i, [f"u{i}a", f"u{i}b", f"u{i}c", "zz"]) for i in range(12)]
    sh = spark.createDataFrame(rows, "doc_id long, sh array<string>")
    out = _short_doc_pairs(
        sh, "doc_id", short_min=10, threshold=0.5, max_bucket=5,
        on_hot="raise",
    )
    assert out is not None and out.count() == 0  # ran; no false raise

    # identical docs: the 3 globally-first grams are in EVERY prefix →
    # group size 12 > 5 → raise, and the message reports PREFIX sizes
    same = [(i, ["g1", "g2", "g3", "g4"]) for i in range(12)]
    sh2 = spark.createDataFrame(same, "doc_id long, sh array<string>")
    with _pytest.raises(ValueError, match="prefix shingle groups"):
        _short_doc_pairs(
            sh2, "doc_id", short_min=10, threshold=0.5, max_bucket=5,
            on_hot="raise",
        )


def test_lsh_short_doc_routing_exact_recall(spark):
    """Short-document routing (closes the r10 factor-100 recall
    finding): docs with fewer than short_min shingles are paired
    through the exact prefix-filter path, so the output equals the
    brute-force Jaccard truth REGARDLESS of minhash variance — the
    deterministic-recall contract the pure banding cannot give short
    docs. Also pins: routing off (short_min=0) is allowed to miss, and
    _lsh_bands_for_recall derives the planner's banding."""
    import itertools

    from ixmp_spark.operators.dedup import (
        _lsh_bands_for_recall,
        minhash_lsh_neardup,
    )

    def jac(a, b):
        def sh(s, n=3):
            w = s.split()
            return {" ".join(w[i:i + n]) for i in range(max(1, len(w) - n + 1))}
        A, B = sh(a), sh(b)
        return len(A & B) / len(A | B)

    # short near-dup pairs (<16 words, J >= 0.5 -- the measured r10
    # escape class) plus long fillers and a long near-dup pair
    corpus = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        "one two three four five six seven eight",
        "one two three four five six seven nine",
        "cats chase mice through the quiet warehouse at night",
        "dogs chase balls across the sunny park every morning ok",
    ] + [
        f"long filler document number {i} " + " ".join(
            f"tok{i}w{j}" for j in range(80)
        )
        for i in range(20)
    ] + [
        "shared long body " + " ".join(f"same{j}" for j in range(70)),
        "shared long body " + " ".join(f"same{j}" for j in range(70)) + " tail",
    ]
    rows = [(i, s) for i, s in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {
        (i, j): round(jac(a, b), 6)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if jac(a, b) >= 0.5
    }
    assert truth, "fixture must contain >=threshold pairs"
    assert any(len(corpus[i].split()) < 16 for i, _ in truth)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_neardup(
            df, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert got == truth  # exact recall incl. every short pair

    # routing disabled reproduces the pure-banding behavior (may miss
    # short pairs; must never invent pairs)
    off = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_neardup(
            df, "doc_id", "text", threshold=0.5, short_min=0
        ).collect()
    }
    assert off <= set(truth)

    # planner-derived banding: k=32, t=0.5 -> b=8 gives p=0.404, b=16
    # gives p=0.990 -> smallest divisor meeting 0.95 is 16
    assert _lsh_bands_for_recall(32, 0.5, 0.95) == 16
    assert _lsh_bands_for_recall(32, 0.5, 0.98) == 16  # p(16)=0.98998
    assert _lsh_bands_for_recall(32, 0.5, 0.99) == 32  # just over p(16)
    assert _lsh_bands_for_recall(32, 0.9, 0.5) == 4  # p(4)=0.895
    import pytest as _pytest

    with _pytest.raises(ValueError, match="increase k"):
        _lsh_bands_for_recall(4, 0.05, 0.999)
    with _pytest.raises(ValueError, match="target_recall"):
        _lsh_bands_for_recall(32, 0.5, 1.5)
    # end-to-end: target_recall derives bands without changing the
    # exact-truth output on this corpus
    got_tr = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_neardup(
            df, "doc_id", "text", threshold=0.5, target_recall=0.95
        ).collect()
    }
    assert got_tr == truth


def test_edit_join_auto_q(spark):
    """q='auto' (VERDICT r10 #7): the q-vs-alphabet selectivity rule is
    applied by the operator itself. Pure rule: hex alphabets (16
    symbols) at vocabulary sizes past 16^3 must select q>=4 (the two
    killed quadratic drafts); base64 at the 200k rehearsal rung selects
    the proven q=3; natural text stays at the q=2 default. End-to-end:
    q='auto' returns exactly the brute-force pair set on a planted
    hex-flavored vocabulary."""
    import itertools

    from ixmp_spark.operators.dedup import auto_gram_size, edit_distance_join

    # the rule, at the committed rehearsal's coordinates
    assert auto_gram_size(16, 50_000) == 4      # hex, killed-draft size
    assert auto_gram_size(16, 5_000) == 4       # 16^3=4096 < 5000
    assert auto_gram_size(64, 200_000) == 3     # base64, proven rung
    assert auto_gram_size(64, 550_000) == 4     # past 64^3
    assert auto_gram_size(27, 700) == 2         # natural text default
    assert auto_gram_size(2, 10**9) == 8        # cap
    assert auto_gram_size(1, 100) == 2          # degenerate floor

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    # hex-ish vocabulary with planted 1- and 2-edit variants
    import hashlib

    vocab = sorted({
        hashlib.md5(str(i).encode()).hexdigest()[:12] for i in range(60)
    })
    vocab += [("f" + v[1:]) for v in vocab[:6]]          # 1-edit
    vocab += [("gg" + v[2:]) for v in vocab[:4]]         # 2-edit
    rows = [(i, s) for i, s in enumerate(vocab)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(
            df, "id", "s", max_edits=2, q="auto"
        ).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        if a != b and lev(a, b) <= 2:
            want[(min(i, j), max(i, j))] = lev(a, b)
    assert got == want and want


def test_kendall_tau_hand(spark):
    """kendall_tau (pins x40): scipy-checkable hand examples — a
    perfectly concordant series gives tau 1, reversed gives -1, and a
    tied example matches the hand-computed tau-b; the cell guard
    raises instead of going quadratic."""
    import pytest as _pytest

    from ixmp_spark.operators.sampling import kendall_tau

    up = spark.createDataFrame(
        [(i, 2 * i + 1) for i in range(10)], "x long, y long"
    )
    r = kendall_tau(up, "x", "y").collect()[0]
    assert r["tau_b"] == 1.0 and r["n"] == 10
    assert r["concordant"] == 45 and r["discordant"] == 0

    down = spark.createDataFrame(
        [(i, -i) for i in range(10)], "x long, y long"
    )
    assert kendall_tau(down, "x", "y").collect()[0]["tau_b"] == -1.0

    # hand tie case: x=(1,1,2,3), y=(1,2,2,3)
    # pairs: (1,2):x-tie; (1,3):C; (1,4):C; (2,3): dy=0 y-tie;
    # (2,4):C; (3,4):C -> C=4, D=0, n0=6, n1=1 (x ties), n2=1 (y ties)
    # tau_b = 4/sqrt(5*5) = 0.8
    tie = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2), (3, 3)], "x long, y long"
    )
    t = kendall_tau(tie, "x", "y").collect()[0]
    assert (t["concordant"], t["discordant"]) == (4, 0)
    assert t["tau_b"] == 0.8

    with _pytest.raises(ValueError, match="max_cells"):
        big = spark.range(100).selectExpr("id AS x", "id * 7 AS y")
        kendall_tau(big, "x", "y", max_cells=10)


def test_gini_coefficient_hand(spark):
    """gini_coefficient (pins x41): perfect equality gives 0; extreme
    concentration approaches (n-1)/n; a textbook example matches."""
    from ixmp_spark.operators.sampling import gini_coefficient

    eq = spark.createDataFrame(
        [("g", 5, i) for i in range(4)], "g string, v long, id long"
    )
    assert gini_coefficient(eq, "g", "v", "id").collect()[0]["gini"] == 0.0

    conc = spark.createDataFrame(
        [("g", 0, 1), ("g", 0, 2), ("g", 0, 3), ("g", 100, 4)],
        "g string, v long, id long",
    )
    # all mass on the last of 4: G = 2*4*100/(4*100) - 5/4 = 0.75
    assert gini_coefficient(conc, "g", "v", "id").collect()[0]["gini"] == 0.75

    # hand: values 1,2,3,4 -> G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    hand = spark.createDataFrame(
        [("g", v, v) for v in (1, 2, 3, 4)], "g string, v long, id long"
    )
    assert gini_coefficient(hand, "g", "v", "id").collect()[0]["gini"] == 0.25


def test_mann_kendall_hand(spark):
    """mann_kendall_trend (pins x42): a strictly increasing series has
    S = n(n-1)/2 and positive z; a constant series has S=0, var 0 by
    the tie correction, z=0; the per-group guard raises."""
    import pytest as _pytest

    from ixmp_spark.operators.sampling import mann_kendall_trend

    inc = spark.createDataFrame(
        [("a", t, float(t)) for t in range(10)],
        "g string, t long, v double",
    )
    r = mann_kendall_trend(inc, "g", "t", "v").collect()[0]
    assert r["s"] == 45 and r["n"] == 10 and r["z"] > 2.5

    flat = spark.createDataFrame(
        [("a", t, 1.0) for t in range(10)], "g string, t long, v double"
    )
    rf = mann_kendall_trend(flat, "g", "t", "v").collect()[0]
    assert rf["s"] == 0 and rf["var_s"] == 0.0 and rf["z"] == 0.0

    with _pytest.raises(ValueError, match="max_points"):
        mann_kendall_trend(inc, "g", "t", "v", max_points=5)


def test_burstiness_hand(spark):
    """interarrival_burstiness (pins g14): a periodic clock gives
    B = -1 (sigma 0); NULL contract for single-gap users."""
    from ixmp_spark.operators.sessions import interarrival_burstiness

    rows = [("clock", f"2024-01-01 00:{m:02d}:00", m) for m in range(10)]
    rows += [("once", "2024-01-01 00:00:00", 0),
             ("once", "2024-01-01 00:05:00", 1)]
    df = spark.createDataFrame(
        rows, "user_id string, ts_s string, event_id long"
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id")
    got = {r["k"]: r for r in interarrival_burstiness(df).collect()}
    c = got["clock"]
    assert c["n_gaps"] == 9 and c["mean_gap_s"] == 60.0
    assert c["cv"] == 0.0 and c["burstiness"] == -1.0
    o = got["once"]
    assert o["n_gaps"] == 1 and o["cv"] is None and o["burstiness"] is None


def test_permutation_test_sanity(spark):
    """permutation_test (pins x44): identical groups give a
    non-significant p; planted large shift gives the minimum
    attainable p = 1/(n_perm+1); determinism across invocations."""
    from ixmp_spark.operators.sampling import permutation_test

    same = spark.createDataFrame(
        [("a", v) for v in range(50)] + [("b", v) for v in range(50)],
        "g string, v long",
    )
    r = permutation_test(same, "g", "v", "a", "b", n_perm=99).collect()[0]
    assert r["diff"] == 0.0 and r["p_value"] > 0.5

    shift = spark.createDataFrame(
        [("a", v) for v in range(50)]
        + [("b", v + 1000) for v in range(50)],
        "g string, v long",
    )
    s1 = permutation_test(shift, "g", "v", "a", "b", n_perm=99).collect()[0]
    s2 = permutation_test(shift, "g", "v", "a", "b", n_perm=99).collect()[0]
    assert s1["p_value"] == s2["p_value"] == 0.01  # 1/(99+1)
    assert s1["n_ge"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        permutation_test(same, "g", "v", "a", "zzz")


def test_rolling_beta_hand(spark):
    """rolling_beta (pins w37): y = 2x + 3 exactly gives beta 2,
    alpha 3 once the window is warm; warm-up rows NULL."""
    from ixmp_spark.operators.sampling import rolling_beta

    df = spark.createDataFrame(
        [(t, float(t % 5 + 1), 2.0 * (t % 5 + 1) + 3.0) for t in range(10)],
        "t long, x double, y double",
    )
    rows = rolling_beta(df, "t", "x", "y", window=3).collect()
    assert rows[0]["beta"] is None and rows[1]["beta"] is None
    warm = [r for r in rows if r["beta"] is not None]
    assert warm and all(r["beta"] == 2.0 and r["alpha"] == 3.0 for r in warm)



def test_jaccard_prefix_join_planted(spark):
    """jaccard_prefix_join (pins d14): output equals the brute-force
    Jaccard truth on a planted corpus with near-dups, disjoint docs,
    and sub-n-word short docs; the hot-gram guard raises on a
    boilerplate corpus and drop-mode keeps benign pairs."""
    import itertools

    import pytest as _pytest

    from ixmp_spark.operators.dedup import jaccard_prefix_join

    def jac(a, b, n=3):
        def sh(s):
            w = s.split()
            return {" ".join(w[i:i + n]) for i in range(max(1, len(w) - n + 1))}
        A, B = sh(a), sh(b)
        return len(A & B) / len(A | B)

    corpus = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog today",
        "pack my box with five dozen liquor jugs right now",
        "pack my box with five dozen liquor jugs right here",
        "completely unrelated text about spark catalyst planning",
        "ab",  # shorter than one shingle
        "ab",  # exact duplicate of a short doc (jaccard 1)
    ] + [
        f"filler document {i} " + " ".join(f"u{i}w{j}" for j in range(30))
        for i in range(20)
    ]
    rows = [(i, s) for i, s in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        (i, j): round(jac(a, b), 6)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if jac(a, b) >= 0.5
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_prefix_join(
            df, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert got == want
    assert (5, 6) in want and want[(5, 6)] == 1.0  # short exact pair
    assert (0, 1) in want  # near-dup pair

    boiler = spark.range(80).selectExpr(
        "id AS doc_id",
        "'same boilerplate body repeated in every single document"
        " verbatim' AS text",
    )
    with _pytest.raises(ValueError, match="max_bucket"):
        jaccard_prefix_join(
            boiler, "doc_id", "text", max_bucket=30
        ).collect()
    kept = jaccard_prefix_join(
        df.unionByName(
            boiler.selectExpr("doc_id + 1000 AS doc_id", "text")
        ),
        "doc_id",
        "text",
        threshold=0.5,
        max_bucket=30,
        on_hot="drop",
    ).collect()
    gotd = {(r["id_a"], r["id_b"]) for r in kept}
    assert not any(a >= 1000 and b >= 1000 for a, b in gotd)
    assert (0, 1) in gotd  # benign pairs survive the drop


def test_similarity_join_front_door(spark):
    """similarity_join (pins d15, VERDICT r11 #4): under the raw-volume
    budget the router takes the exact path (output = brute-force truth,
    route='exact'); a starved max_candidates forces the LSH route
    (route='lsh', pairs a subset of truth — banding may miss, never
    invent); a non-volume guard (hot gram, on_hot='raise') propagates
    instead of rerouting."""
    import itertools

    import pytest as _pytest

    from ixmp_spark.operators.dedup import similarity_join

    def jac(a, b, n=3):
        def sh(s):
            w = s.split()
            return {
                " ".join(w[i:i + n]) for i in range(max(1, len(w) - n + 1))
            }
        A, B = sh(a), sh(b)
        return len(A & B) / len(A | B)

    corpus = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog today",
        "completely different text about spark catalyst optimizer rules",
        "entirely unrelated sentence mentioning parquet bucketing layout",
    ] + [
        f"filler document {i} " + " ".join(f"w{i}x{j}" for j in range(30))
        for i in range(12)
    ]
    rows = [(i, s) for i, s in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {
        (i, j): round(jac(a, b), 6)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if jac(a, b) >= 0.5
    }
    assert truth

    got = similarity_join(df, "doc_id", "text", threshold=0.5).collect()
    assert {r["route"] for r in got} == {"exact"}
    assert {(r.id_a, r.id_b): r.jaccard for r in got} == truth

    rerouted = similarity_join(
        df, "doc_id", "text", threshold=0.5, max_candidates=1
    ).collect()
    assert rerouted and {r["route"] for r in rerouted} == {"lsh"}
    assert {(r.id_a, r.id_b) for r in rerouted} <= set(truth)

    boiler = spark.range(80).selectExpr(
        "id AS doc_id",
        "'same boilerplate body repeated in every single document"
        " verbatim' AS text",
    )
    with _pytest.raises(ValueError, match="max_bucket"):
        similarity_join(
            boiler, "doc_id", "text", max_bucket=30, on_hot="raise"
        ).collect()

    # ADVICE r12: routing is by EXCEPTION TYPE, not message substring —
    # an unrelated ValueError that happens to mention "max_candidates"
    # must PROPAGATE, and the guard raises the dedicated subclass
    from unittest import mock

    from ixmp_spark.operators import dedup as _dd

    assert issubclass(_dd.CandidateVolumeExceeded, ValueError)
    with mock.patch.object(
        _dd, "jaccard_prefix_join",
        side_effect=ValueError("unrelated failure citing max_candidates"),
    ):
        with _pytest.raises(ValueError, match="unrelated failure"):
            _dd.similarity_join(df, "doc_id", "text", threshold=0.5)


def test_path_entropy_hand(spark):
    """path_entropy (pins g15): a one-edge loop gives 0 bits (and NULL
    norm); a uniform two-edge user gives exactly 1 bit, norm 1;
    single-event users emit no row."""
    from ixmp_spark.operators.sessions import path_entropy

    rows = []
    # loop user: a->a->a->a (3 transitions, all a->a)
    for i in range(4):
        rows.append(("loop", f"2024-01-01 00:0{i}:00", i, "a"))
    # mix user: a->b, b->a, a->b, b->a (2 distinct edges, 2 each)
    for i, e in enumerate(["a", "b", "a", "b", "a"]):
        rows.append(("mix", f"2024-01-01 01:0{i}:00", i, e))
    rows.append(("solo", "2024-01-01 02:00:00", 0, "a"))
    df = spark.createDataFrame(
        rows, "user_id string, ts_s string, event_id long, event_type string"
    ).selectExpr(
        "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id", "event_type"
    )
    got = {r["k"]: r for r in path_entropy(df).collect()}
    assert set(got) == {"loop", "mix"}  # solo emits no row
    lo = got["loop"]
    assert lo["n_transitions"] == 3 and lo["n_distinct_transitions"] == 1
    assert lo["entropy_bits"] == 0.0 and lo["norm_entropy"] is None
    mx = got["mix"]
    assert mx["n_transitions"] == 4 and mx["n_distinct_transitions"] == 2
    assert mx["entropy_bits"] == 1.0 and mx["norm_entropy"] == 1.0


def test_jaccard_prefix_join_candidate_guard(spark):
    """jaccard_prefix_join's max_candidates guard (the r11 factor-50
    OOM lesson): a corpus of one big near-dup family keeps every
    per-gram group under max_bucket yet explodes the raw join volume —
    the estimate (Σ per-gram n²) must raise BEFORE the join runs, and
    the raise must not leak the persisted shingle/prefix caches."""
    import pytest as _pytest

    from ixmp_spark.operators.dedup import jaccard_prefix_join

    fam = spark.range(40).selectExpr(
        "id AS doc_id",
        "concat('shared family body with many common tokens one two"
        " three four five six seven eight nine ten eleven twelve"
        " variant ', CAST(id AS STRING)) AS text",
    )
    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    with _pytest.raises(ValueError, match="max_candidates"):
        jaccard_prefix_join(
            fam, "doc_id", "text", threshold=0.5, max_candidates=100
        )
    leaked = [
        i.id() for i in sc._jsc.sc().getRDDStorageInfo()
        if i.id() not in before and i.numCachedPartitions() > 0
    ]
    assert not leaked, f"guard raise leaked cached RDDs: {leaked}"
    # with the guard sized for the family, the join completes exactly
    got = jaccard_prefix_join(
        fam, "doc_id", "text", threshold=0.5, max_candidates=1_000_000
    )
    assert got.count() == 40 * 39 // 2  # one family: all pairs >= 0.5


def test_exact_join_cross_validates_lsh(spark, sf_dir):
    """Triad cross-validation (the r11 --jaccard-join finding made a
    pin): on the documents corpus, d3's LSH+routing pair set must be a
    SUBSET of d14's exact pair set at the same threshold (both verify
    exact Jaccard, so LSH can only miss, never invent) — and any
    difference is exactly the LSH misses, bounded here to zero on this
    corpus (the factor-10 rehearsal measured identical 248,740 counts;
    this pins the same equality at test scale)."""
    from ixmp_spark.operators.dedup import (
        jaccard_prefix_join,
        minhash_lsh_neardup,
    )

    docs = load(spark, sf_dir, "documents").limit(400)
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(
            docs, "doc_id", "text", threshold=0.5, n=3
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_neardup(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert lsh <= exact  # LSH can only miss, never invent
    assert lsh == exact  # and on this corpus it misses nothing


def test_funnel_latency_hand(spark):
    """funnel_latency (pins g16): hand-computable two-user fixture —
    per-pair first-to-first latencies, crossing quantiles at rank
    ceil(q*n), never-converting users count in n_src_users only, and a
    dst-before-src user is NOT a conversion (negative latency)."""
    from ixmp_spark.operators.sessions import funnel_latency

    rows = [
        # u1: view @0, click @60, purchase @180
        ("u1", 0, "view"), ("u1", 60, "click"), ("u1", 180, "purchase"),
        # u2: view @0, click @120 (never purchases)
        ("u2", 0, "view"), ("u2", 120, "click"),
        # u3: click @0 only (no view -> not in view-pairs' src)
        ("u3", 0, "click"),
        # u4: purchase BEFORE first view -> view->purchase NOT converted
        ("u4", 0, "purchase"), ("u4", 100, "view"),
    ]
    df = spark.createDataFrame(
        [(u, f"2024-01-01 00:00:{0:02d}", s, e) for u, s, e in rows],
        "user_id string, ts0 string, off long, event_type string",
    ).selectExpr(
        "user_id",
        "CAST(ts0 AS TIMESTAMP) + make_interval(0,0,0,0,0,0,off) AS ts",
        "event_type",
    )
    got = {
        (r["step_src"], r["step_dst"]): r
        for r in funnel_latency(df).collect()
    }
    vc = got[("view", "click")]
    # src users with a first view: u1, u2, u4 -> 3; converted: u1 (60s),
    # u2 (120s); u4 has no click
    assert vc["n_src_users"] == 3 and vc["n_converted"] == 2
    assert vc["p50_s"] == 60.0 and vc["p90_s"] == 120.0
    cp = got[("click", "purchase")]
    # src: u1, u2, u3; converted: u1 (120s)
    assert cp["n_src_users"] == 3 and cp["n_converted"] == 1
    assert cp["conv_rate"] == round(1 / 3, 6)
    vp = got[("view", "purchase")]
    # src: u1, u2, u4; converted: u1 only (u4's purchase precedes view)
    assert vp["n_src_users"] == 3 and vp["n_converted"] == 1
    assert vp["p50_s"] == 180.0


def test_pmi_collocations_hand(spark):
    """pmi_collocations (pins t33): hand-computed PMI on a planted
    corpus — the collocation outranks the stopword pair, and min_count
    floors rare pairs out."""
    import math

    from ixmp_spark.operators.text import pmi_collocations

    docs = spark.createDataFrame(
        [(0, "new york is big"), (1, "new york is old"),
         (2, "big and old and big")],
        "doc_id long, text string",
    )
    # unigrams (len>0): N_u = 13; bigrams N_b = 10
    # c('new york') = 2; c(new) = 2, c(york) = 2
    got = {r["gram"]: (r["n"], r["pmi"])
           for r in pmi_collocations(docs, "text", min_count=2).collect()}
    exp = round(math.log2((2 / 10) / ((2 / 13) * (2 / 13))), 6)
    assert got["new york"] == (2, exp)
    assert all(n >= 2 for n, _ in got.values())
    # 'is big' occurs once -> floored out at min_count=2
    assert "is big" not in got


def test_llr_keyness_hand(spark):
    """llr_keyness (pins t34): a term exclusive to slice A gets a
    positive G² equal to the hand-computed Dunning value; a term with
    identical rates scores ~0; sign flips for B-heavy terms."""
    import math

    from pyspark.sql import functions as SF

    from ixmp_spark.operators.text import llr_keyness

    docs = spark.createDataFrame(
        [(0, "a", "zork zork common common"),
         (1, "a", "zork common common common"),
         (2, "b", "blee common common common"),
         (3, "b", "blee blee common common")],
        "doc_id long, lang string, text string",
    )
    rows = {
        r["w"]: r
        for r in llr_keyness(
            docs, "text", SF.col("lang") == "a", min_count=1, k=10
        ).collect()
    }
    na, nb = 8.0, 8.0  # tokens per slice
    def g2(a, b):
        tot = na + nb
        s = 0.0
        if a: s += a * math.log(a / (na * (a + b) / tot))
        if b: s += b * math.log(b / (nb * (a + b) / tot))
        return 2 * s
    assert rows["zork"]["n_a"] == 3 and rows["zork"]["n_b"] == 0
    assert rows["zork"]["keyness"] == round(g2(3, 0), 6)
    assert rows["blee"]["keyness"] == round(-g2(0, 3), 6)
    assert rows["common"]["keyness"] == 0.0  # 5 vs 5 on equal totals


def test_theil_index_hand(spark):
    """theil_index (pins x45): equal values give exactly 0; the planted
    two-member group matches the closed form; zero/negative excluded."""
    import math

    from ixmp_spark.operators.sampling import theil_index

    df = spark.createDataFrame(
        [("eq", 5.0), ("eq", 5.0), ("eq", 5.0),
         ("sk", 1.0), ("sk", 3.0),
         ("sk", -7.0), ("sk", 0.0)],  # excluded
        "g string, v double",
    )
    got = {r["g"]: r for r in theil_index(df, "g", "v").collect()}
    assert got["eq"]["theil"] == 0.0 and got["eq"]["n"] == 3
    mu = 2.0
    exp = (1 / 2) * ((1 / mu) * math.log(1 / mu) + (3 / mu) * math.log(3 / mu))
    assert got["sk"]["n"] == 2
    assert abs(got["sk"]["theil"] - exp) < 1e-6


def test_rank_biased_overlap_hand(spark):
    """rank_biased_overlap (pins x47): identical length-d lists give
    exactly 1 − p^d; disjoint lists give 0; the two-item swap matches
    the hand value 0.25 at p=0.5."""
    from ixmp_spark.operators.sampling import rank_biased_overlap

    a = spark.createDataFrame(
        [(f"i{k}", float(100 - k)) for k in range(10)], "k string, s double"
    )
    same = rank_biased_overlap(a, a, "k", "s", p=0.9, depth=10).collect()[0]
    assert same["n_common"] == 10
    assert abs(same["rbo"] - (1 - 0.9 ** 10)) < 1e-6

    b = spark.createDataFrame(
        [(f"j{k}", float(100 - k)) for k in range(10)], "k string, s double"
    )
    disj = rank_biased_overlap(a, b, "k", "s", p=0.9, depth=10).collect()[0]
    assert disj["n_common"] == 0 and disj["rbo"] == 0.0

    x = spark.createDataFrame([("x", 2.0), ("y", 1.0)], "k string, s double")
    y = spark.createDataFrame([("x", 1.0), ("y", 2.0)], "k string, s double")
    swap = rank_biased_overlap(x, y, "k", "s", p=0.5, depth=2).collect()[0]
    assert swap["n_common"] == 2 and abs(swap["rbo"] - 0.25) < 1e-9


def test_rfm_scores_hand(spark):
    """rfm_scores (pins g17): hand-placed users land in the right
    quintile buckets with deterministic tie-breaks; recency is
    fractional-epoch seconds against the corpus max."""
    from ixmp_spark.operators.sessions import rfm_scores

    rows = []
    # user u: one event at the corpus max -> recency 0, freq 1
    rows.append((1, "2024-01-10 00:00:00", 10.0))
    # user v: 3 events, older, big spend
    for d in (1, 2, 3):
        rows.append((2, f"2024-01-0{d} 00:00:00", 100.0))
    # user w: 2 events, middle
    rows.append((3, "2024-01-05 00:00:00", 5.0))
    rows.append((3, "2024-01-06 00:00:00", 5.0))
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
    got = {r["user"]: r for r in
           rfm_scores(df, "user_id", "ts", "value", buckets=3).collect()}
    assert got[1]["recency_s"] == 0.0
    assert got[1]["frequency"] == 1 and got[1]["monetary"] == 10.0
    # recency order: u(0s) < w(4d) < v(7d) -> r_scores 1,2,3
    assert (got[1]["r_score"], got[3]["r_score"], got[2]["r_score"]) == (1, 2, 3)
    # frequency desc: v(3) < ... w(2), u(1) -> f_scores 1,2,3
    assert (got[2]["f_score"], got[3]["f_score"], got[1]["f_score"]) == (1, 2, 3)
    # monetary desc: v(300), u(10), w(10)? w=10.0 tie with u -> user asc
    assert got[2]["m_score"] == 1
    assert (got[1]["m_score"], got[3]["m_score"]) == (2, 3)


def test_hard_negatives_bits_auto(spark):
    """hard_negatives bits='auto' (the r12 ANN-rehearsal finding): when
    the corpus outgrows 2^bits × max_bucket, default bits=4 +
    on_hot='drop' silently returns ZERO pairs; bits='auto' sizes the
    bucket count to the corpus and recovers mid-similarity negatives."""
    import numpy as np

    from ixmp_spark.operators.similarity import hard_negatives

    # UNIFORM corpus — the regime the 200k finding is about: bucket
    # population n/2^bits outgrows max_bucket with no near-dup mass
    # (tight clusters are the OTHER hot-bucket regime, where no bits
    # value helps and dedup-first is the answer). dim=16 makes random
    # cosines sigma≈0.25, so mid-similarity [0.4, 0.9) pairs exist.
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((2000, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )

    # bits=4 -> 16 buckets/band over 2000 rows: ~125/bucket average,
    # so drop guts the result (at 200k/max_bucket=2000 the rehearsal
    # measured literally ZERO; at this size a few small sign-regions
    # squeak under the cap — sign-LSH buckets are not equal-measure)
    starved = hard_negatives(
        df, "vec_id", "embedding", k=3, max_bucket=60, on_hot="drop"
    ).collect()
    # auto -> ceil(log2(2000/60)) = 6 bits -> ~31/bucket: survives the
    # guard and recovers the mid-similarity mass the default dropped
    auto = hard_negatives(
        df, "vec_id", "embedding", k=3, max_bucket=60, on_hot="drop",
        bits="auto",
    ).collect()
    assert auto, "auto bits must recover pairs where bits=4 dropped most"
    assert len(auto) > 3 * max(len(starved), 1)
    anchors = lambda rows: {r["anchor_id"] for r in rows}  # noqa: E731
    assert len(anchors(auto)) > 3 * max(len(anchors(starved)), 1)
    assert all(0.4 <= r["cosine_sim"] < 0.9 for r in auto)
    per_anchor = {}
    for r in auto:
        per_anchor[r["anchor_id"]] = per_anchor.get(r["anchor_id"], 0) + 1
    assert max(per_anchor.values()) <= 3  # k respected


def test_cosine_lsh_footgun_auto_and_loud_empty(spark):
    """r13 footgun sweep (VERDICT r12 Next #7), cosine_lsh_pairs: in
    the regime where EVERY bucket is hot (fixed bits outgrown by n),
    on_hot='drop' must RAISE loudly instead of silently returning zero
    pairs; bits='auto' sizes the bucket count to the corpus and
    completes, finding the planted near-dup."""
    import numpy as np
    import pytest as _pytest

    from ixmp_spark.operators.similarity import _auto_bits, cosine_lsh_pairs

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((600, 16))
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16)  # planted near-dup
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    # bits=1 -> 2 buckets/band over 600 rows: EVERY bucket > 40 -> the
    # old behavior dropped them all and returned zero; now: loud raise
    with _pytest.raises(ValueError, match="every LSH bucket"):
        cosine_lsh_pairs(
            df, "vec_id", "embedding", threshold=0.95,
            bands=2, bits=1, max_bucket=40, on_hot="drop",
        ).collect()
    # bits='auto' under the same guard completes and finds the plant
    got = cosine_lsh_pairs(
        df, "vec_id", "embedding", threshold=0.95,
        bands=4, bits="auto", max_bucket=40, on_hot="drop",
    ).collect()
    assert (0, 1) in {(r["id_a"], r["id_b"]) for r in got}

    # the r12 incident arithmetic: at 200k vectors / max_bucket=2000,
    # auto must pick more than the log2(200k/2000)=6.6 floor bits=4 sat under
    assert _auto_bits(200_000, 6, 2000) >= 7
    # and the candidate-volume bound binds at huge n: target shrinks to
    # the 8-row floor, bits grows with log2(n)
    assert _auto_bits(50_000_000, 6, None) >= 22


def test_cosine_lsh_candidate_volume_guard(spark):
    """r13 live-500k finding: the worst-case candidate volume is
    bands·n·max_bucket/2 — independent of bits — so cosine_lsh_pairs
    carries the d14 raw-volume guard: Σ m(m−1)/2 over KEPT buckets
    over max_candidates raises CandidateVolumeExceeded (naming the
    remedies) instead of launching the JVM-killing verify join; a
    loose budget completes."""
    import numpy as np
    import pytest as _pytest

    from ixmp_spark.operators.dedup import CandidateVolumeExceeded
    from ixmp_spark.operators.similarity import cosine_lsh_pairs

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((500, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(CandidateVolumeExceeded, match="max_candidates"):
        cosine_lsh_pairs(
            df, "vec_id", "embedding", threshold=0.9,
            bands=4, bits=3, max_candidates=100,
        ).collect()
    got = cosine_lsh_pairs(
        df, "vec_id", "embedding", threshold=0.9,
        bands=4, bits=3, max_candidates=10_000_000,
    )
    assert got.count() >= 0  # completes under a loose budget


def test_minhash_band_drop_all_hot_raises(spark):
    """r13 footgun sweep, lsh_band_pairs: a corpus that is ONE giant
    duplicate family makes every band bucket hot; on_hot='drop' would
    return zero pairs — it must raise naming the dedup-first remedy."""
    import pytest as _pytest

    from ixmp_spark.operators.dedup import lsh_band_pairs, minhash_signature

    df = spark.range(50).selectExpr(
        "id AS doc_id",
        "'identical boilerplate body repeated verbatim everywhere' AS text",
    )
    sig = minhash_signature(df, "text", k=16)
    with _pytest.raises(ValueError, match="duplicate family"):
        lsh_band_pairs(
            sig, "doc_id", k=16, bands=4, max_bucket=10, on_hot="drop"
        ).collect()

    # r13: the mirrored raw-volume guard — 50 identical docs put all
    # C(50,2) pairs in every band; a tiny budget must raise the typed
    # exception naming the dedup-first remedy
    from ixmp_spark.operators.dedup import CandidateVolumeExceeded

    with _pytest.raises(CandidateVolumeExceeded, match="max_candidates"):
        lsh_band_pairs(
            sig, "doc_id", k=16, bands=4, max_candidates=100
        ).collect()


def test_lsh_guards_empty_input_returns_empty(spark):
    """r13 review regression: an EMPTY corpus under max_bucket +
    on_hot='drop' (and any max_candidates) must return an empty pairs
    frame in BOTH LSH families — not raise the all-hot error blaming a
    'duplicate family' on zero rows."""
    from ixmp_spark.operators.dedup import lsh_band_pairs, minhash_signature
    from ixmp_spark.operators.similarity import cosine_lsh_pairs

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    sig = minhash_signature(empty_docs, "text", k=16)
    assert (
        lsh_band_pairs(
            sig, "doc_id", k=16, bands=4, max_bucket=10, on_hot="drop",
            max_candidates=100,
        ).count()
        == 0
    )

    empty_vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert (
        cosine_lsh_pairs(
            empty_vecs, "vec_id", "embedding", dim=8,
            max_bucket=10, on_hot="drop",
        ).count()
        == 0
    )


def test_semantic_dedup_and_ivf_auto_clusters(spark):
    """r13 footgun sweep: n_clusters='auto' completes on a small corpus
    (floor 16) with output equal to the explicit-16 call, and the
    sizing arithmetic scales k with n (10M vectors -> ~2442 clusters,
    not 16 x 625k-row quadratic cells)."""
    import math

    import numpy as np

    from ixmp_spark.operators.similarity import ivf_build, semantic_dedup

    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((200, 8))
    vecs[7] = vecs[3]  # exact dup -> same component
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    auto = semantic_dedup(df, "vec_id", "embedding", n_clusters="auto")
    explicit = semantic_dedup(df, "vec_id", "embedding", n_clusters=16)
    a = sorted((r["vec_id"], r["rep_id"]) for r in auto.collect())
    b = sorted((r["vec_id"], r["rep_id"]) for r in explicit.collect())
    assert a == b and (7, 3) in a

    centers, assigned = ivf_build(df, "embedding", n_clusters="auto")
    assert len(centers) == 16 and assigned.count() == 200
    # sizing arithmetic at scale (driver-side, no data needed)
    assert max(16, int(math.ceil(10_000_000 / 4096.0))) == 2442


def test_peak_concurrency_hand(spark):
    """peak_concurrency (pins g18): hand-built intervals — nested
    overlap peaks at 3, closed semantics count boundary-touching and
    zero-length intervals, peak_at is the earliest attaining instant."""
    from ixmp_spark.operators.sessions import peak_concurrency

    rows = [
        ("a", 0.0, 10.0), ("a", 5.0, 15.0), ("a", 12.0, 20.0),
        ("a", 7.0, 9.0),
        ("b", 3.0, 3.0),                 # zero-length still registers
        ("c", 0.0, 5.0), ("c", 5.0, 8.0),  # touching = concurrent (closed)
        ("a", 8.0, 2.0),                 # inverted: filtered (ADVICE r12)
        ("d", 5.0, 1.0),                 # group of ONLY inverted: absent
    ]
    df = spark.createDataFrame(rows, "k string, s double, e double")
    got = {r["k"]: r for r in peak_concurrency(df, "k", "s", "e").collect()}
    assert (got["a"]["peak"], got["a"]["peak_at"]) == (3, 7.0)
    assert got["a"]["n_intervals"] == 4  # the inverted row didn't count
    assert (got["b"]["peak"], got["b"]["peak_at"]) == (1, 3.0)
    assert (got["c"]["peak"], got["c"]["peak_at"]) == (2, 5.0)
    assert "d" not in got
    # VERDICT r12 #3: the plan is JOIN-FREE — peak_at comes from a
    # second window over the same partition key, not a broadcast
    # self-join (which carried one build row per distinct key)
    plan = peak_concurrency(df, "k", "s", "e")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_filter_yield_curve_hand(spark):
    """filter_yield_curve (pins p28): 10 docs with scores 1..10 and
    weights equal to their scores, floors [9,7,5,3,1] — band counts,
    cumulative docs, and weight fractions match the hand arithmetic;
    boundary scores land in the HIGHER bucket (sc >= floor); NULL
    scores and sub-floor docs are excluded; empty bands emit zero
    rows; a non-descending threshold list raises."""
    import pytest as _pytest

    from ixmp_spark.operators.sampling import filter_yield_curve

    rows = [(i, float(i), float(i)) for i in range(1, 11)]
    rows.append((99, None, 5.0))   # NULL score excluded
    rows.append((98, 0.5, 100.0))  # below the last floor: excluded
    df = spark.createDataFrame(rows, "doc_id long, score double, w double")
    out = filter_yield_curve(
        df, "score", thresholds=[9.0, 7.0, 5.0, 3.0, 1.0], weight_col="w"
    ).collect()
    assert [r["bucket"] for r in out] == [1, 2, 3, 4, 5]
    assert [r["score_floor"] for r in out] == [9.0, 7.0, 5.0, 3.0, 1.0]
    assert [r["n_docs"] for r in out] == [2, 2, 2, 2, 2]
    assert [r["cum_docs"] for r in out] == [2, 4, 6, 8, 10]
    # cumulative weights: 19, 34, 45, 52, 55 of total 55
    assert [r["cum_weight"] for r in out] == [19.0, 34.0, 45.0, 52.0, 55.0]
    assert out[-1]["weight_frac"] == 1.0
    assert out[0]["weight_frac"] == round(19 / 55, 6)

    # empty band still emits its row (grid left join)
    sparse = filter_yield_curve(
        df.where("score >= 9"), "score",
        thresholds=[9.0, 7.0], weight_col="w",
    ).collect()
    assert [(r["bucket"], r["n_docs"]) for r in sparse] == [(1, 2), (2, 0)]

    with _pytest.raises(ValueError, match="descending"):
        filter_yield_curve(df, "score", thresholds=[1.0, 5.0])


def test_average_precision_hand(spark):
    """average_precision (pins x48): the sklearn step definition on a
    hand-ranked fixture — perfect ranking gives 1.0, a planted
    mid-rank miss matches the hand sum, ties collapse to one block."""
    from ixmp_spark.operators.sampling import average_precision

    perfect = spark.createDataFrame(
        [(4.0, 1.0), (3.0, 1.0), (2.0, 0.0), (1.0, 0.0)],
        "score double, label double",
    )
    r = average_precision(perfect, "score", "label").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["average_precision"]) == (2, 2, 1.0)
    assert r["prevalence"] == 0.5

    # ranking: P N P -> AP = (1/2)(1/1 + 2/3)
    mid = spark.createDataFrame(
        [(3.0, 1.0), (2.0, 0.0), (1.0, 1.0)], "score double, label double"
    )
    r = average_precision(mid, "score", "label").collect()[0]
    assert r["average_precision"] == round((1.0 + 2 / 3) / 2, 6)

    # tied scores form ONE block: scores [2,2] with labels [1,0] ->
    # block precision 1/2, AP = 0.5 regardless of intra-tie order
    tied = spark.createDataFrame(
        [(2.0, 1.0), (2.0, 0.0)], "score double, label double"
    )
    r = average_precision(tied, "score", "label").collect()[0]
    assert r["average_precision"] == 0.5


def test_graph_modularity_hand(spark):
    """graph_modularity (pins x49): two triangles joined by one bridge
    under the natural 2-community labeling — Q matches the hand value
    13/98; the all-one-community labeling scores exactly 0."""
    from ixmp_spark.operators.joins import graph_modularity

    tri = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edges = spark.createDataFrame(tri, "u long, v long")
    labels = spark.createDataFrame(
        [(n, "a" if n <= 3 else "b") for n in range(1, 7)],
        "n long, c string",
    )
    rows = graph_modularity(edges, "u", "v", labels, "n", "c").collect()
    q = sum(r["q_contrib"] for r in rows)
    # W=7; each community: w_in=3, strength=7 -> 2*(3/7 - (7/14)^2)
    assert abs(q - 2 * (3 / 7 - 0.25)) < 1e-6
    by = {r["community"]: r for r in rows}
    assert by["a"]["w_internal"] == 3.0 and by["a"]["strength"] == 7.0

    one = labels.select("n", F.lit("all").alias("c"))
    rows1 = graph_modularity(edges, "u", "v", one, "n", "c").collect()
    assert len(rows1) == 1 and abs(rows1[0]["q_contrib"]) < 1e-9


def test_sprt_monitor_hand(spark):
    """sprt_monitor (pins x50): planted Bernoulli stream against
    p0=0.2 vs p1=0.8 — the LLR trace matches the hand arithmetic, the
    first boundary crossing is marked `decided`, and later checkpoints
    keep reporting their own state; invalid probabilities raise."""
    import math

    import pytest as _pytest

    from ixmp_spark.operators.sampling import sprt_monitor

    rows = []
    # hour 0: one positive -> llr = ln4, continue
    rows.append(("2024-01-01 00:10:00", 1.0))
    # hour 1: two positives -> llr = 3 ln4 > ln(0.8/0.05): accept_h1
    rows.append(("2024-01-01 01:10:00", 1.0))
    rows.append(("2024-01-01 01:20:00", 1.0))
    # hour 2: six negatives -> llr = -3 ln4 < ln(0.2/0.95): accept_h0
    for m in range(6):
        rows.append((f"2024-01-01 02:0{m}:00", 0.0))
    df = spark.createDataFrame(rows, "ts_s string, y double").selectExpr(
        "CAST(ts_s AS TIMESTAMP) AS ts", "y"
    )
    out = sprt_monitor(df, "ts", "y", p0=0.2, p1=0.8).collect()
    l4 = math.log(4.0)
    assert [r["state"] for r in out] == ["continue", "accept_h1",
                                         "accept_h0"]
    assert [r["decided"] for r in out] == [False, True, False]
    assert [r["llr"] for r in out] == [
        round(l4, 6), round(3 * l4, 6), round(-3 * l4, 6)
    ]
    assert [(r["n_cum"], r["k_cum"]) for r in out] == [(1, 1), (3, 3), (9, 3)]

    with _pytest.raises(ValueError, match="probabilities"):
        sprt_monitor(df, "ts", "y", p0=0.5, p1=0.5)


def test_cosine_lsh_volume_clamp_routes(spark):
    """r14 (VERDICT r13 #1): volume_route='clamp' converts the
    candidate-volume guard into routing — the cap is derived from the
    REALIZED bucket-size distribution so kept-bucket Σ m(m−1)/2 fits
    max_candidates/2. A hot near-dup crowd is dropped (the miner
    trade); SMALL-bucket pairs survive, so the planted ordinary
    near-dup is still found. The same budget under 'raise' raises the
    typed exception."""
    import numpy as np
    import pytest as _pytest

    from ixmp_spark.operators.dedup import CandidateVolumeExceeded
    from ixmp_spark.operators.similarity import cosine_lsh_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((600, 16))
    base[1] = base[0] + 0.01 * rng.standard_normal(16)  # small-bucket plant
    crowd = np.tile(rng.standard_normal(16), (80, 1))  # identical crowd
    vecs = np.vstack([base, crowd])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    kw = dict(threshold=0.9, bands=4, bits=6, on_hot="drop",
              max_candidates=20_000)

    with _pytest.raises(CandidateVolumeExceeded, match="max_candidates"):
        cosine_lsh_pairs(
            df, "vec_id", "embedding", volume_route="raise", **kw
        ).collect()

    got = cosine_lsh_pairs(
        df, "vec_id", "embedding", volume_route="clamp", **kw
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (0, 1) in pairs  # small-bucket plant survives the clamp
    crowd_ids = set(range(600, 680))
    assert not any(
        a in crowd_ids and b in crowd_ids for a, b in pairs
    ), "the hot crowd's bucket must have been clamped away"

    # validation: clamp requires on_hot='drop'; route names validated
    with _pytest.raises(ValueError, match="requires on_hot='drop'"):
        cosine_lsh_pairs(
            df, "vec_id", "embedding", threshold=0.9,
            on_hot="raise", volume_route="clamp",
        )
    with _pytest.raises(ValueError, match="volume_route"):
        cosine_lsh_pairs(
            df, "vec_id", "embedding", threshold=0.9, volume_route="typo"
        )


def test_hard_negatives_clamp_default(spark):
    """r14: hard_negatives defaults to volume_route='clamp' — a budget
    the realized volume exceeds now yields a BOUNDED mining result
    instead of the r13 raise; volume_route='raise' restores the typed
    exception, and a non-'drop' on_hot implies it."""
    import numpy as np
    import pytest as _pytest

    from ixmp_spark.operators.dedup import CandidateVolumeExceeded
    from ixmp_spark.operators.similarity import hard_negatives

    rng = np.random.default_rng(11)
    df = spark.createDataFrame(
        [
            (i, [float(x) for x in v])
            for i, v in enumerate(rng.standard_normal((2000, 16)))
        ],
        "vec_id long, embedding array<double>",
    )
    tight = dict(k=3, bands=4, bits=4, max_candidates=3_000)
    with _pytest.raises(CandidateVolumeExceeded):
        hard_negatives(
            df, "vec_id", "embedding", volume_route="raise", **tight
        ).collect()
    got = hard_negatives(df, "vec_id", "embedding", **tight).collect()
    # bounded, valid negatives: every row respects the sim band and k
    assert all(0.4 <= r["cosine_sim"] < 0.9 for r in got)
    per_anchor = {}
    for r in got:
        per_anchor[r["anchor_id"]] = per_anchor.get(r["anchor_id"], 0) + 1
    assert not per_anchor or max(per_anchor.values()) <= 3


def _ranking_fixture(spark, n_hot=30_000):
    """One pathological group (g=0, n_hot rows) + 20 normal groups of
    50 rows; group 1 has NO relevant item (the NULL-rank path)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(21)
    gs = [0] * n_hot + [1 + (i // 50) for i in range(20 * 50)]
    n = len(gs)
    pdf = pd.DataFrame(
        {
            "g": gs,
            "item": np.arange(n, dtype=np.int64),
            "s": rng.random(n),
            "rel": (rng.random(n) < 0.02).astype(np.int64),
        }
    )
    pdf.loc[pdf["g"] == 1, "rel"] = 0
    return pdf, spark.createDataFrame(pdf)


def test_mrr_hot_group(spark):
    """VERDICT r13 #3 planted hot group: the r14 two-path MRR must (a)
    match the brute-force reference on every group including the
    pathological one, (b) keep the NULL-rank/rr=0 convention for the
    no-relevant group, and (c) carry WindowGroupLimit in its plan (the
    top-1-relevant frame) instead of an unfiltered whole-group rank
    window — no stage sorts the hot group in one task."""
    import numpy as np

    from ixmp_spark.operators.sampling import mean_reciprocal_rank
    from tools.audit_plans import formatted_plan

    pdf, df = _ranking_fixture(spark)
    res = mean_reciprocal_rank(df, "g", "s", "rel", "item")
    assert "WindowGroupLimit" in formatted_plan(res)
    got = {r["g"]: (r["first_rel_rank"], r["rr"]) for r in res.collect()}
    assert len(got) == 21
    for g, sub in pdf.groupby("g"):
        sub = sub.sort_values(
            ["s", "item"], ascending=[False, True]
        ).reset_index(drop=True)
        hits = np.nonzero(sub["rel"].to_numpy() > 0)[0]
        if len(hits):
            rank = int(hits[0]) + 1
            assert got[g] == (rank, round(1.0 / rank, 6)), f"group {g}"
        else:
            assert got[g][0] is None and got[g][1] == 0.0, f"group {g}"


def test_ndcg_hot_group(spark):
    """VERDICT r13 #3 planted hot group for x51's operator: results
    match the textbook reference on the pathological group too, and
    the plan keeps the r14 WindowGroupLimit shape."""
    import math

    import numpy as np

    from ixmp_spark.operators.sampling import ndcg_at_k
    from tools.audit_plans import formatted_plan

    k = 10
    pdf, df = _ranking_fixture(spark)
    res = ndcg_at_k(df, "g", "s", "rel", "item", k=k)
    assert "WindowGroupLimit" in formatted_plan(res)
    got = {r["g"]: (r["dcg"], r["idcg"], r["ndcg"]) for r in res.collect()}
    assert len(got) == 21
    for g in (0, 1, 5):
        sub = pdf[pdf["g"] == g]
        by_s = sub.sort_values(["s", "item"], ascending=[False, True]).head(k)
        by_r = sub.sort_values(["rel", "item"], ascending=[False, True]).head(k)
        dcg = sum(
            (2.0 ** r - 1.0) / math.log2(i + 2.0)
            for i, r in enumerate(by_s["rel"])
        )
        idcg = sum(
            (2.0 ** r - 1.0) / math.log2(i + 2.0)
            for i, r in enumerate(by_r["rel"])
        )
        want_ndcg = round(dcg / idcg, 6) if idcg > 0 else None
        assert got[g][0] == round(dcg, 6), f"group {g} dcg"
        assert got[g][1] == round(idcg, 6), f"group {g} idcg"
        assert got[g][2] == want_ndcg, f"group {g} ndcg"


def test_rbo_hot_input_depth_bound(spark):
    """x47's operator over an n_hot-scale input (r14 finding: the r13
    global row_number windows moved the ENTIRE input to one partition —
    InferWindowGroupLimit does not fire on empty partition specs): the
    rankings are now real TakeOrderedAndProject top-depth sorts, and
    the only single-partition frames hold ≤ depth rows; result matches
    the reference on a known overlap."""
    from ixmp_spark.operators.sampling import rank_biased_overlap
    from tools.audit_plans import formatted_plan

    n = 30_000
    a = spark.range(n).select(
        F.col("id").alias("item"), (F.col("id") * 1.0).alias("s")
    )
    # b: same scores — identical rankings → rbo == 1 at any depth
    res = rank_biased_overlap(a, a, "item", "s", p=0.9, depth=50)
    plan = formatted_plan(res)
    assert "TakeOrderedAndProject" in plan  # the distributed top-depth
    # no window ranks the raw input anymore: every Window sits above a
    # TakeOrderedAndProject, so its single partition holds ≤ depth rows
    row = res.collect()[0]
    assert row["n_common"] == 50
    # identical rankings truncated at depth d: RBO@d = 1 − p^d (the
    # residual mass past the prefix is simply not observed)
    assert row["rbo"] == pytest.approx(1.0 - 0.9**50, abs=2e-6)
