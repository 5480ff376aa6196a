"""The local comparator must match the external driver's strictness: the
driver's canonicalizer crashes on array/map result columns (pandas
sort_values over unhashable cells), so norm_frame must reject them loudly
instead of silently stringifying (VERDICT r2 "What's wrong" #5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tools.check_parity import NonScalarColumn, norm_frame


def test_list_column_rejected():
    df = pd.DataFrame({"cat": ["a", "b"], "elements": [["x", "y"], ["z"]]})
    with pytest.raises(NonScalarColumn, match="elements"):
        norm_frame(df)


def test_ndarray_column_rejected():
    # Spark toPandas() renders array<string> as numpy arrays, not lists.
    df = pd.DataFrame(
        {"k": [1, 2], "v": [np.array(["x"]), np.array(["y", "z"])]}
    )
    with pytest.raises(NonScalarColumn, match="'v'"):
        norm_frame(df)


def test_dict_column_rejected():
    df = pd.DataFrame({"k": [1], "m": [{"a": 1}]})
    with pytest.raises(NonScalarColumn, match="'m'"):
        norm_frame(df)


def test_scalar_columns_pass():
    df = pd.DataFrame(
        {
            "s": ["b", "a", None],
            "f": [1.0, 2.5, np.nan],
            "i": [3, 1, 2],
            "b": [True, False, True],
        }
    )
    out = norm_frame(df)
    assert list(out.columns) == ["b", "f", "i", "s"]
    # leading-None object column still normalizes (None cells are skipped
    # when probing for non-scalar cells)
    df2 = pd.DataFrame({"s": [None, "a"]})
    assert len(norm_frame(df2)) == 2


def test_timing_tripwire_trips_on_slowdown():
    """The full-catalog timing tripwire (check_parity.timing_regressions)
    flags a deliberately-slowed query — the d4_simhash regression class
    (36x slower, invisible to the headline bench) must fail the sweep,
    not wait for a human to read TIMINGS_CATALOG.json. Sub-second
    queries stay exempt (one-rep jitter), and queries with no committed
    time yet pass."""
    import time

    from tools.check_parity import timing_regressions

    committed = {"q_fast": 0.5, "q_slow": 2.0, "q_tiny": 0.02}

    def deliberately_slowed():  # 2.0 s committed -> ~8x slower
        time.sleep(0.02)

    t0 = time.perf_counter()
    deliberately_slowed()
    measured = 2.0 * (time.perf_counter() - t0) / 0.0025  # scale to ~16s

    new = {
        "q_fast": 0.6,         # within band
        "q_slow": measured,    # tripped
        "q_tiny": 0.09,        # >3x but under the 1 s floor
        "q_new": 9.9,          # no committed baseline -> pass
    }
    regs = timing_regressions(new, committed)
    assert len(regs) == 1 and regs[0].startswith("q_slow"), regs
    # healthy sweep: nothing flagged
    assert timing_regressions({"q_slow": 2.3}, committed) == []
