"""Physical-plan assertions: pushdown, pruning, broadcast, no-Python-UDF —
the 100 TB design contract (SURVEY.md §4), checked on explain output."""

from __future__ import annotations

from ixmp_spark.queries import QUERIES


def formatted_plan(df) -> str:
    # public-API route: capture explain output
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    plan = formatted_plan(QUERIES["s1_scan_pushdown"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_discount" in plan.split("PushedFilters")[1].splitlines()[0]
    # column pruning: only the needed columns in ReadSchema
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in read_schema
    assert "l_returnflag" not in read_schema


def test_star_join_broadcasts(spark, sf_dir):
    plan = formatted_plan(QUERIES["b_q5_star_join"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the single big-big join (lineitem x orders) may be SMJ or shuffled
    # hash; it must NOT be a nested-loop join
    assert "CartesianProduct" not in plan


def test_flagship_partial_aggregation(spark, sf_dir):
    plan = formatted_plan(QUERIES["a0_pricing_summary"](spark, sf_dir))
    # map-side partial agg: two HashAggregate nodes around the exchange
    # (WholeStageCodegen spans only appear in the executed AQE plan, not
    # the pre-execution formatted plan — covered by bench numbers instead.)
    assert plan.count("HashAggregate") >= 2


def test_no_python_udf_in_catalog(spark, sf_dir):
    """Core + LLM queries must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes) — UDFs are reserved for genuinely
    non-expressible ops, which must be explicitly allowlisted in
    tools/audit_plans.py:PYUDF_OK with their justification (t15:
    unicodedata.normalize has no Spark built-in; t13/m1/m2: Arrow
    mapInPandas kernels for BPE word-encode and binary media decode).
    The check covers the WHOLE family of Python stages — EvalPython
    (row-at-a-time + ArrowEvalPython) and the mapInPandas /
    applyInPandas node names, which carry no 'EvalPython' substring."""
    from tools.audit_plans import _PYTHON_STAGES, PYUDF_OK

    for name, fn in QUERIES.items():
        if name in PYUDF_OK:
            continue
        plan = formatted_plan(fn(spark, sf_dir))
        hits = [s for s in _PYTHON_STAGES if s in plan]
        assert not hits, f"{name} fell off the JVM path: {hits}"


def test_topk_is_take_ordered(spark, sf_dir):
    plan = formatted_plan(QUERIES["o1_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q3_selective_broadcast(spark, sf_dir):
    plan = formatted_plan(QUERIES["b_q3_shipping_priority"](spark, sf_dir))
    # the filtered customer dim must broadcast; the mktsegment filter must
    # reach its scan, not evaluate post-join
    assert "BroadcastHashJoin" in plan
    scan_sections = plan.split("PushedFilters")
    assert any("c_mktsegment" in s.splitlines()[0] for s in scan_sections[1:])
    assert "TakeOrderedAndProject" in plan


def test_asof_join_no_cartesian(spark, sf_dir):
    plan = formatted_plan(QUERIES["jx_asof_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union-sort-carry-forward: there is NO join operator at all — the
    # as-of resolves as one windowed pass over the keyed union stream
    assert "Join" not in plan
