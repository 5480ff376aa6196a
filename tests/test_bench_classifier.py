"""bench.classify_drift (VERDICT r10 #3): the >1.10x flag list must
self-adjudicate — a family-uniform shift including the pure-scan probe,
or a materially degraded disk probe, is ONE "uniform-ambient" verdict
(with above-shift outliers still surfaced), not N per-query flags.
Pure-Python unit test; no Spark session."""

from __future__ import annotations

from bench import classify_drift


def _rows(ratios: dict[str, float]) -> dict:
    return {n: {"prev": 1.0, "ratio": r, "spread_overlap": False}
            for n, r in ratios.items()}


def test_quiet_when_no_flags():
    v = classify_drift(_rows({"s1_scan_pushdown": 1.01}), [])
    assert v["class"] == "quiet" and v["per_query_flags"] == []


def test_family_uniform_including_s1_is_ambient():
    ratios = {
        "s1_scan_pushdown": 1.40, "a0_pricing_summary": 1.25,
        "b_q3_shipping_priority": 1.30, "d1_exact_dedup": 1.22,
        "t1_text_stats": 1.28, "w3_running_total": 1.19,
        "x19_bootstrap_ci": 1.24, "g1_sessionize": 1.05,
        "e1_cosine_topk": 2.60,  # a REAL regression riding the shift
    }
    flagged = [n for n, r in ratios.items() if r > 1.10]
    v = classify_drift(_rows(ratios), flagged)
    assert v["class"] == "uniform-ambient"
    assert any("families" in e for e in v["ambient_evidence"])
    # the rider above the uniform shift still surfaces; the ambient
    # majority does not
    assert v["per_query_flags"] == ["e1_cosine_topk", "s1_scan_pushdown"] or \
        v["per_query_flags"] == ["e1_cosine_topk"]


def test_probe_degradation_is_ambient_even_without_s1():
    ratios = {"d1_exact_dedup": 1.25, "t1_text_stats": 1.2,
              "s1_scan_pushdown": 1.02}
    flagged = ["d1_exact_dedup", "t1_text_stats"]
    sys_now = {"before": {"disk_probe_ms": 1100},
               "after": {"disk_probe_ms": 1150}}
    sys_prev = {"before": {"disk_probe_ms": 430},
                "after": {"disk_probe_ms": 440}}
    v = classify_drift(_rows(ratios), flagged, sys_now, sys_prev)
    assert v["class"] == "uniform-ambient"
    assert any("previous run" in e for e in v["ambient_evidence"])


def test_probe_degrading_during_run_is_ambient():
    ratios = {"d1_exact_dedup": 1.25, "s1_scan_pushdown": 1.0}
    sys_now = {"before": {"disk_probe_ms": 430},
               "after": {"disk_probe_ms": 1150}}
    v = classify_drift(_rows(ratios), ["d1_exact_dedup"], sys_now, None)
    assert v["class"] == "uniform-ambient"
    assert any("during this run" in e for e in v["ambient_evidence"])


def test_isolated_flags_stay_per_query():
    ratios = {
        "s1_scan_pushdown": 1.01, "a0_pricing_summary": 1.02,
        "d1_exact_dedup": 1.45, "d3_minhash_lsh": 1.30,
        "t1_text_stats": 0.99,
    }
    flagged = ["d1_exact_dedup", "d3_minhash_lsh"]
    sys_now = {"before": {"disk_probe_ms": 430},
               "after": {"disk_probe_ms": 450}}
    sys_prev = {"before": {"disk_probe_ms": 420},
                "after": {"disk_probe_ms": 440}}
    v = classify_drift(_rows(ratios), flagged, sys_now, sys_prev)
    assert v["class"] == "per-query"
    assert v["per_query_flags"] == flagged


def test_missing_sys_context_falls_back_to_family_rule():
    ratios = {"d1_exact_dedup": 1.45, "s1_scan_pushdown": 1.0}
    v = classify_drift(_rows(ratios), ["d1_exact_dedup"], None, None)
    assert v["class"] == "per-query"


def test_baseline_sys_keyed_to_ratio_baseline(tmp_path):
    """ADVICE r11 (medium): the previous-host probe context must come
    from the SAME run as the ratio baseline. When BENCH_DETAIL records
    the baseline run (identical per-query medians), its sys block is
    used; when a mid-round bench has overwritten BENCH_DETAIL with a
    different run, the adjudication falls back to no previous reading
    instead of comparing against mismatched host context."""
    import json

    from bench import _deltas_vs_prev

    base_q = {"d1_exact_dedup": 1.0, "s1_scan_pushdown": 0.5}
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"queries": base_q, "spread": {}})
    )
    sys_block = {"before": {"disk_probe_ms": 430},
                 "after": {"disk_probe_ms": 440}}
    now_t = {"d1_exact_dedup": 1.2, "s1_scan_pushdown": 0.51}

    # matched: BENCH_DETAIL fingerprints the same run as BENCH_r05
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({"queries": base_q, "sys": sys_block})
    )
    d = _deltas_vs_prev(now_t, {}, here=str(tmp_path))
    assert d["baseline"] == "BENCH_r05.json"
    assert d["baseline_sys_matched"] is True
    assert d["baseline_sys"] == sys_block

    # mismatched: a mid-round bench overwrote the detail with other
    # medians -> no previous sys, not a wrong one
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({"queries": {"d1_exact_dedup": 3.3}, "sys": sys_block})
    )
    d = _deltas_vs_prev(now_t, {}, here=str(tmp_path))
    assert d["baseline_sys_matched"] is False
    assert d["baseline_sys"] is None

    # missing detail file -> same graceful fallback
    (tmp_path / "BENCH_DETAIL.json").unlink()
    d = _deltas_vs_prev(now_t, {}, here=str(tmp_path))
    assert d["baseline_sys_matched"] is False and d["baseline_sys"] is None
