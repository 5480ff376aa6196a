"""Test fixtures: the Dantzig transport LP golden scenario.

Data is the classic Dantzig (1963) transportation problem as used by the
GAMS tutorial and the reference's test suite (FIXTURES.md §1; reference
ixmp/model/dantzig.py:16–71 pins the same public values). Used as the
semantics oracle for item CRUD, filters, cloning and solution handling.
"""

from __future__ import annotations

import pandas as pd

from ixmp_spark.core import Platform, Scenario

#: canonical solution of the transport LP (lvl/mrg for var x), cf.
#: reference tests/core/test_scenario.py:553–562
DANTZIG_SOLUTION = {
    "x": pd.DataFrame(
        [
            ("seattle", "new-york", 50.0, 0.0),
            ("seattle", "chicago", 300.0, 0.0),
            ("seattle", "topeka", 0.0, 0.036),
            ("san-diego", "new-york", 275.0, 0.0),
            ("san-diego", "chicago", 0.0, 0.009),
            ("san-diego", "topeka", 275.0, 0.0),
        ],
        columns=["i", "j", "lvl", "mrg"],
    ),
    "z": {"lvl": 153.675, "mrg": 0.0},
}


def make_dantzig(mp: Platform, solve: bool = False) -> Scenario:
    """Build the Dantzig transport scenario (canning plants → markets)."""
    for u in ("cases", "km", "USD/km", "USD", "case"):
        mp.add_unit(u)
    mp.add_region("DantzigLand", hierarchy="country")

    scen = Scenario(
        mp,
        model="canning problem",
        scenario="standard",
        version="new",
        scheme="dantzig",
        annotation="Dantzig's transportation problem",
    )
    scen.init_set("i")  # canning plants
    scen.add_set("i", ["seattle", "san-diego"])
    scen.init_set("j")  # markets
    scen.add_set("j", ["new-york", "chicago", "topeka"])

    scen.init_par("a", idx_sets=["i"])  # capacity, cases
    scen.add_par("a", "seattle", 350.0, "cases")
    scen.add_par("a", "san-diego", 600.0, "cases")

    scen.init_par("b", idx_sets=["j"])  # demand, cases
    scen.add_par(
        "b",
        pd.DataFrame(
            [
                ("new-york", 325.0),
                ("chicago", 300.0),
                ("topeka", 275.0),
            ],
            columns=["j", "value"],
        ),
        unit="cases",
    )

    scen.init_par("d", idx_sets=["i", "j"])  # distance, km (thousands of miles)
    scen.add_par(
        "d",
        pd.DataFrame(
            [
                ("seattle", "new-york", 2.5),
                ("seattle", "chicago", 1.7),
                ("seattle", "topeka", 1.8),
                ("san-diego", "new-york", 2.5),
                ("san-diego", "chicago", 1.8),
                ("san-diego", "topeka", 1.4),
            ],
            columns=["i", "j", "value"],
        ),
        unit="km",
    )

    scen.init_scalar("f", 90.0, "USD/km")  # freight cost per case per 1000 miles

    scen.init_var("x", idx_sets=["i", "j"])  # shipment quantities
    scen.init_var("z")  # total cost
    scen.init_equ("cost")
    scen.init_equ("supply", idx_sets=["i"])
    scen.init_equ("demand", idx_sets=["j"])
    scen.commit("Dantzig's transport problem")
    scen.set_as_default()

    if solve:
        solve_dantzig(scen)
    return scen


def solve_dantzig(scen: Scenario) -> None:
    """SOLVE the canning problem with the engine's built-in two-phase
    simplex (core/lp.py via TransportModel) — levels, duals, and reduced
    costs are computed, not replayed; tests assert the result equals the
    textbook optimum in ``DANTZIG_SOLUTION``."""
    from ixmp_spark.core.model import TransportModel

    TransportModel().run(scen)


HIST_DF = pd.DataFrame(
    {
        "model": "canning problem",
        "scenario": "standard",
        "region": "DantzigLand",
        "variable": "GDP",
        "unit": "USD",
        2000: [850.0],
        2005: [900.0],
        2010: [950.0],
    }
)
