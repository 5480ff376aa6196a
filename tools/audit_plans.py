"""Plan-quality audit over the whole declared catalog: flags red-flag
physical operators (cartesian products, nested-loop joins on non-trivial
sides, Python evaluation, excess shuffles). Run after adding operators:

    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


#: queries whose plan legitimately contains a BroadcastNestedLoopJoin —
#: a broadcast 1-row probe / scalar-subquery crossJoin (e1/e2/e3/b_q22),
#: a 3-row band dimension (j10), or the explicitly max_rows-guarded
#: exact all-pairs verification path (e4)
BNLJ_OK = {
    "e1_embed_topk", "e2_embed_ann", "e3_embed_ivf", "j10_band_join",
    "b_q22", "e4_cosine_neardup",
    "e11_mips_topk",  # 1-row probe broadcast crossJoin (e1's plan, dot metric)
    "c15_fuzzy_match",  # 4-row query set x broadcast codelist
    "b_q11", "b_q15",  # 1-row scalar-subquery threshold broadcast
    "t9_tfidf_keywords",  # 1-row N-docs aggregate cross-broadcast (single-action tfidf)
    "t10_bigram_perplexity",  # 1-row vocab-count aggregate cross-broadcast
    "t17_bm25_search",  # 1-row N/avgdl corpus-stats aggregate cross-broadcast
    "p11_temperature_weights",  # 1-row normalizer-totals aggregate cross-broadcast
    "p12_dsir_logratio",  # 1-row corpus-totals (nt/nr/V) aggregate cross-broadcast
    "p13_perplexity_buckets",  # 1-row vocab-count cross-broadcast (inherits t10's LM)
    "p15_corpus_drift",  # 1-row per-column totals (ta/tb/n_bins) cross-broadcast
    "x6_hybrid_search",  # inherits t17's corpus-stats + e1's probe 1-row broadcasts
    "x8_cuped_lift",  # 1-row theta/mean-pre covariance aggregate cross-broadcast
    "a12_histogram_fd",  # 1-row five-scalar summary aggregate cross-broadcast
    "t23_cross_perplexity",  # 1-row train-vocab aggregate cross-broadcast (t10 pattern)
    "p17_pareto_frontier",  # 1-row x-min/max bounds cross-broadcast (lazy bucket edges)
    "t26_vocab_coverage",  # 1-row corpus-token-total aggregate cross-broadcast
    "g10_rolling_active",  # 1-row max-activity-day aggregate cross-broadcast (window clip)
    "p21_quantile_normalize",  # 1-row global quantile-grid aggregate cross-broadcast
    "x22_chisq_independence",  # r-row x c-row marginal cross (the full cell grid, zero cells included) + 1-row N broadcast
    "x28_ks_test",  # 1-row (n1, n2) group-size aggregate cross-broadcast onto the CDF frame
    "x29_js_divergence",  # 1-row (ta, tb) totals aggregate cross-broadcast onto the category frame
    "a14_concentration",  # 1-row top-share aggregate crossed with the 1-row Gini/HHI aggregate
    "x30_association_rules",  # 1-row basket-total aggregate cross-broadcast onto the rule grid
    "e12_matryoshka_recall",  # bounded probe-set frame broadcast onto the corpus (the e1 probe contract)
    "x31_hill_tail",  # 1-row threshold order statistic + 1-row n_keys cross-broadcasts onto the m+1-row frame
    "x33_cohens_kappa",  # 1-row cell-grid aggregate crossed with the 1-row marginal-product aggregate
    "x35_fleiss_kappa",  # 1-row P-bar aggregate crossed with the 1-row P-e marginal aggregate (the x33 shape)
    "d12_edit_join",  # short-string non-equi length-band join: both sides alphabet-bounded AND count-guarded (max_short converge-or-raise)
    "t33_pmi_collocations",  # 1-row N_u / N_b totals aggregate cross-broadcasts (the t9/t10 pattern)
    "t34_llr_keyness",  # 1-row (na, nb) slice-totals aggregate cross-broadcast
    "g17_rfm_scores",  # 1-row corpus-max-ts aggregate cross-broadcast onto the user aggregate
    "p28_filter_yield_curve",  # 1-row grand-total aggregate cross-broadcast onto the threshold-bounded bucket frame
}

#: multi-stage pipelines where >6 shuffles are inherent (documented):
#: d3 = repartition + banded self-join + 2 candidate joins + distinct
SHUFFLE_OK = {
    "d3_minhash_lsh",
    # p13 = t10's bigram-LM pipeline (gram explode + bg/ctx count aggs +
    # two gram-keyed joins + per-doc agg) plus ONE extra lang-keyed
    # ntile window over the per-document perplexity table — the added
    # shuffle moves one row per document, not grams
    "p13_perplexity_buckets",
    # e8 = the same banded-LSH candidate pipeline as d3/e5 plus the
    # symmetrize-union + per-anchor top-k window (7 total, documented)
    "e8_hard_negatives",
    # p17 = skyline reduction: one full-data per-x aggregate, then
    # bucket window + bucket-summary agg + bounded carry pass over the
    # DISTINCT-x frame, and the flag joins back on x (both sides keyed)
    # — 7 total; only the first and last move document-count rows
    "p17_pareto_frontier",
    # t23 = t10's LM pipeline with a train/score split: train-side gram
    # explode + bg/ctx count aggs + vocab distinct + TWO score-side
    # gram-keyed left joins + the per-doc agg (8 total; the score-side
    # shuffles carry (doc, w1, w2) hits, the train side count rows)
    "t23_cross_perplexity",
    # p15 = a 3-column drift report: per column 2 bin-count aggregates
    # + a full-outer bin join + the PSI fold (~5 each, 18 total) — every
    # shuffle moves BIN-COUNT rows (<= n_bins / #categories), never the
    # snapshots themselves; column count, not data volume, sets the
    # number
    "p15_corpus_drift",
    # w24 = TWO composed blocked-EWMA passes (each: key-ordered row
    # window + (key, block) scan window + block-summary agg + carry
    # window over block rows + the (key, block)-keyed summary join,
    # ~6 apiece). Every exchange hashes the SAME user key (or its
    # (key, block) refinement) and moves row-count or block-count
    # rows; pass composition, not data volume, sets the number
    "w24_double_ewma",
    # x16 = graph pipeline: co-occurrence edge build (order-keyed join
    # + distinct), degree aggregate, the wedge self-join keyed on the
    # shared neighbor, the per-pair count aggregate, and two node-keyed
    # degree joins (7 total). Every exchange hashes node/order ids and
    # moves edge- or pair-count rows; the stage list is the algorithm
    "x16_supplier_affinity",
    # x22 = ONE data-sized count aggregation, then marginal/total
    # aggregates, the grid left-join, and the final distinct-count
    # statistic pass — every exchange after the first moves CELL-GRID
    # rows (<= r x c, here 5 x 24), never events
    "x22_chisq_independence",
    # x30 = basket dedup (1) + the within-basket pair self-join (2,
    # basket-keyed both sides) + the (A,B) grid aggregate + the two
    # item-support joins (item-domain-keyed) + the 1-row total + the
    # bounded TakeOrdered — 9 total; every exchange moves distinct
    # (basket,item), item-count, or pair-grid rows, never raw lineitem
    "x30_association_rules",
    # x35 = one (item, category) cell aggregation (union of 3 rater
    # projections), then per-item and per-category aggregates off the
    # cell frame and two 1-row reductions — 9 total; every exchange
    # after the first moves CELL or item/category rows, never ratings
    "x35_fleiss_kappa",
    # d12 = ed-join: distinct-name collapse, gram explode + frequency
    # aggregate + rarest-prefix window, the gram-keyed candidate join +
    # pair distinct, the short-band union, and the two id expansion
    # joins — 11 total; every exchange moves VOCABULARY-sized name,
    # gram, or candidate-pair rows, never the data rows
    "d12_edit_join",
    # x33 = one data-sized cell-count aggregation, then the two
    # marginal aggregates, their full-outer category join, and the
    # diagonal/total aggregate — 9 total; every exchange after the
    # first moves CELL-GRID or category rows (<= |A| x |B|), never
    # the rated rows
    "x33_cohens_kappa",
    # e12 = FOUR rank pipelines over the probe-bounded scored frame
    # (full + one per requested dim: window exchange apiece) + three
    # (probe,neighbor)-keyed recall joins + per-dim probe aggregates +
    # the final 3-row union — 18 total; the dim list, not data volume,
    # sets the count, and every exchange carries (probe x corpus)
    # scored rows bounded by the probe-sample contract
    "e12_matryoshka_recall",
}

#: queries whose Python stage is DELIBERATE — an Arrow-batched kernel for
#: semantics Spark's built-ins cannot express (the operator docstrings
#: carry the justification). Any OTHER EvalPython is still a flag: the
#: hot path must stay JVM-side.
PYUDF_OK = {
    "t15_unicode_normalize",  # unicodedata.normalize — no Spark built-in
    "t13_bpe_encode",  # Arrow mapInPandas over DISTINCT words only (broadcast merge table)
    "m1_media_features",  # Arrow mapInPandas binary decode — no JVM codec surface
    "m2_audio_features",  # Arrow mapInPandas binary decode — no JVM codec surface
    "m3_video_features",  # Arrow mapInPandas binary decode — no JVM codec surface
    "m4_image_neardup",  # Arrow mapInPandas image decode + dHash; band joins stay JVM-side
    "m5_image_patches",  # Arrow mapInPandas image decode + numpy tiling — no JVM codec surface
}

#: every physical-plan node name that means "rows leave the JVM for
#: Python". EvalPython covers row-at-a-time AND ArrowEvalPython (pandas
#: UDF) via substring; the mapInPandas / applyInPandas families have
#: their own node names and previously slipped past the audit unflagged.
_PYTHON_STAGES = (
    "EvalPython",  # BatchEvalPython + ArrowEvalPython
    "MapInPandas",
    "FlatMapGroupsInPandas",  # applyInPandas
    "FlatMapCoGroupsInPandas",  # cogroup.applyInPandas
    "MapInArrow",
    "PythonMapInArrow",
)

#: nodes that pass data through without changing its cardinality class
_PASS_THROUGH = {
    "Project", "Filter", "Sort", "Coalesce", "AQEShuffleRead",
    "ShuffleQueryStage", "InputAdapter", "WholeStageCodegen", "ColumnarToRow",
    "Window", "WindowGroupLimit", "Expand",
}

#: a SinglePartition exchange is fine iff it reads a frame whose size is
#: bounded by a group domain, not the data: aggregates, top-k, literals
_BOUNDED_SOURCES = {
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "TakeOrderedAndProject", "LocalTableScan", "Range", "ReusedExchange",
    "Exchange",  # a nested exchange was already audited on its own
}


def single_partition_violations(plan: str) -> list[str]:
    """Find Exchange SinglePartition nodes whose input is NOT an
    aggregated/bounded frame — i.e. global sorts/windows over raw data,
    the classic 100 TB scale-killer. Parses the formatted-explain tree
    (node name column position encodes depth) + per-node detail blocks.
    """
    import re

    tree: list[tuple[int, str, int]] = []  # (name col, name, id)
    for line in plan.splitlines():
        m = re.match(r"^[\s+\-:*>=]*?([A-Za-z][A-Za-z ]*?) \((\d+)\)\s*$", line)
        if m:
            tree.append((line.index(m.group(1)), m.group(1).strip(), int(m.group(2))))
    single_ids = {
        int(m.group(1))
        for m in re.finditer(
            r"\((\d+)\) Exchange[^\n]*\n(?:[^\n]*\n)?Arguments: SinglePartition",
            plan,
        )
    }
    bad = []
    for i, (col, name, nid) in enumerate(tree):
        if name != "Exchange" or nid not in single_ids:
            continue
        # descend: first deeper line is the immediate child; skip
        # cardinality-preserving nodes until something significant
        j = i + 1
        child = None
        while j < len(tree):
            ccol, cname, cid = tree[j]
            if ccol <= col:
                break
            # a broadcast join's cardinality class follows its STREAM
            # (first) child — the build side is broadcast-bounded by
            # construction (r12: g17's global ntile sits on
            # user-aggregate × 1-row-max cross; p28's bounded-grid
            # window sits on grid-scan ⟕ aggregate; descending reaches
            # the HashAggregate/LocalTableScan, while a global window
            # over raw-scan × broadcast still reaches the scan and
            # flags). Node names carry join-type suffixes ("… Cross
            # BuildRight") — prefix match.
            if cname in _PASS_THROUGH or cname.startswith(
                ("BroadcastNestedLoopJoin", "BroadcastHashJoin")
            ):
                col = ccol
                j += 1
                continue
            child = cname
            break
        if child is not None and child not in _BOUNDED_SOURCES:
            bad.append(f"SinglePartition exchange over {child}")
    return bad


def audit_issues(name: str, plan: str) -> list[str]:
    """All red flags for one query's formatted plan — the single source
    of truth shared by the CLI sweep and the standing pytest gate
    (tests/test_plans.py::test_full_catalog_plan_audit), so the audited
    set can never drift from the declared catalog again (the r6 gap:
    a '0 flagged' claim measured 133 of 137 queries)."""
    import re

    issues = []
    if "CartesianProduct" in plan:
        issues.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
        issues.append("BroadcastNestedLoopJoin")
    py_hits = [s for s in _PYTHON_STAGES if s in plan]
    if py_hits and name not in PYUDF_OK:
        issues.append(f"Python stage in plan ({'/'.join(py_hits)})")
    # one count per shuffle-exchange NODE (detail-block headers name
    # each node exactly once; tree lines would double-count, and
    # BroadcastExchange / ReusedExchange are different node names)
    shuffles = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    if shuffles > 6 and name not in SHUFFLE_OK:
        issues.append(f"{shuffles} shuffle exchanges")
    issues.extend(single_partition_violations(plan))
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    from ixmp_spark.queries import QUERIES
    from ixmp_spark.session import get_spark

    spark = get_spark("plan_audit")
    bad = 0
    for name, fn in sorted(QUERIES.items()):
        issues = audit_issues(name, formatted_plan(fn(spark, sf_dir)))
        if issues:
            bad += 1
            print(f"FLAG  {name}: {', '.join(issues)}")
    print(f"\n{bad} flagged of {len(QUERIES)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
