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
@settings(max_examples=30)
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
