"""Model adapters + solve orchestration (SURVEY.md §2.10 X4–X6, §3.3).

Reference: ixmp/model/base.py (Model ABC with initialize/enforce/run),
ixmp/model/gams.py (GAMSModel: scenario → GDX in → subprocess gams →
GDX out → solution import), scenario.solve's callback iteration
(scenario.py:974–1075).

The orchestration is driver-side by design (the reference's too): model
data is model-sized; Spark handles the data plane (writing input frames,
ingesting solutions as one commit). The GAMS/GDX bridge is stubbed behind
an import-try on the public ``gams.transfer`` API (not installed here);
``FunctionModel`` runs any Python callable as the solver, which the test
suite uses with the Dantzig analytic solution.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Callable

from ixmp_spark.core.scenario import Scenario

MODELS: dict[str, type["Model"]] = {}


class ModelError(RuntimeError):
    """Error in model code — :meth:`Model.run` or code called by it
    (reference model/base.py:18; gams.py:302 wraps solver failures in
    it). Subclasses RuntimeError so existing callers catching the
    generic error keep working."""


class Model(ABC):
    """Reference model/base.py:22 — name + initialize/enforce/run."""

    name: str = "model"

    def __init__(self, **kwargs: Any):
        self.options = kwargs

    @classmethod
    def initialize(cls, scenario: Scenario) -> None:
        """Set up required items on a bare scenario (X6; reference
        base.py:67–191 initialize_items). Default: no-op."""

    def enforce(self, scenario: Scenario) -> None:
        """Enforce scheme invariants before run (reference base.py:47)."""

    @abstractmethod
    def run(self, scenario: Scenario) -> None:
        """Solve and store the solution on the scenario."""


def register_model(cls: type[Model]) -> type[Model]:
    MODELS[cls.name] = cls
    return cls


def get_model(name: str, **kwargs) -> Model:
    return MODELS[name](**kwargs)


@register_model
class FunctionModel(Model):
    """Run an arbitrary Python callable as the solver; the callable
    receives the checked-in Scenario and must store solution data."""

    name = "function"

    def run(self, scenario: Scenario) -> None:
        fn: Callable[[Scenario], None] = self.options["solve_fn"]
        fn(scenario)


@register_model
class ExchangeModel(Model):
    """External-process solver over the portable exchange format (X4 —
    the reference's GAMSModel shape with the OS-process boundary intact,
    GDX swapped for the parquet bundle of sources/model_exchange):

        write_model_input → subprocess [command in_dir out_dir] →
        read_solution (one commit)

    Options: ``command`` (list[str]), ``workdir``, ``check_solution``,
    ``var_list``/``equ_list`` — mirroring reference gams.py:366–481.
    """

    name = "exchange"

    def run(self, scenario: Scenario) -> None:
        import subprocess
        import tempfile

        from ixmp_spark.sources.model_exchange import (
            read_solution,
            write_model_input,
        )

        command = self.options["command"]
        workdir = self.options.get("workdir") or tempfile.mkdtemp(
            prefix="ixmp_spark_solve_"
        )
        in_dir = f"{workdir}/in"
        out_dir = f"{workdir}/out"
        write_model_input(scenario, in_dir)
        proc = subprocess.run(
            [*command, in_dir, out_dir], capture_output=True, text=True
        )
        if proc.returncode != 0:
            raise ModelError(
                f"solver failed (rc={proc.returncode}):\n{proc.stderr[-2000:]}"
            )
        read_solution(
            scenario,
            out_dir,
            check_solution=self.options.get("check_solution", True),
            var_list=self.options.get("var_list"),
            equ_list=self.options.get("equ_list"),
            comment=f"solution via {command[0]}",
        )


@register_model
class TransportModel(Model):
    """Built-in LP solve of the canonical transport scheme (the
    reference's own test model — tutorial Dantzig, model/dantzig.py):
    sets ``i``/``j``; pars ``a(i)`` capacity, ``b(j)`` demand, ``d(i,j)``
    distance, scalar ``f`` freight. Solved with the engine's two-phase
    simplex (core/lp.py) — levels AND marginals are computed, not
    replayed; no external solver required. Writes vars ``x(i,j)``/``z``
    and equs ``supply(i)``/``demand(j)``/``cost`` exactly like the GAMS
    round-trip would."""

    name = "transport-lp"

    @classmethod
    def initialize(cls, scenario: Scenario) -> None:
        """X6 scheme hook: declare the transport items on a bare run."""
        import pandas as pd  # noqa: F401

        have = set(scenario.items())
        def need(n):
            return n not in have
        if need("i"):
            scenario.init_set("i")
        if need("j"):
            scenario.init_set("j")
        for name, idx in (("a", ["i"]), ("b", ["j"]), ("d", ["i", "j"])):
            if need(name):
                scenario.init_par(name, idx_sets=idx)
        if need("f"):
            scenario.init_par("f")
        for name, idx in (("x", ["i", "j"]), ("z", None)):
            if need(name):
                scenario.init_var(name, idx_sets=idx)
        for name, idx in (("supply", ["i"]), ("demand", ["j"]), ("cost", None)):
            if need(name):
                scenario.init_equ(name, idx_sets=idx)

    def run(self, scenario: Scenario) -> None:
        import pandas as pd

        from ixmp_spark.core.lp import solve_lp

        # declaration order, not sorted: among alternative optima the
        # simplex then lands on the same vertex as the reference's GAMS
        # run (which pivots in declaration order)
        I = list(scenario.set("i"))
        J = list(scenario.set("j"))
        cap = scenario.par("a").set_index("i")["value"]
        dem = scenario.par("b").set_index("j")["value"]
        dist = scenario.par("d").set_index(["i", "j"])["value"]
        f = scenario.scalar("f")["value"]
        pairs = [(i, j) for i in I for j in J if (i, j) in dist.index]
        c = [f * dist[p] / 1000.0 for p in pairs]
        A, b, senses = [], [], []
        for i in I:  # supply capacity
            A.append([1.0 if pi == i else 0.0 for pi, pj in pairs])
            b.append(float(cap[i]))
            senses.append("<=")
        for j in J:  # demand satisfaction
            A.append([1.0 if pj == j else 0.0 for pi, pj in pairs])
            b.append(float(dem[j]))
            senses.append(">=")
        res = solve_lp(c, A, b, senses)
        if res.status != "optimal":
            raise ModelError(f"transport LP: {res.status}")
        r9 = lambda v: round(float(v), 9)  # noqa: E731

        scenario.check_out(timeseries_only=True)
        scenario._ts_only = False  # solution write allowed in solve path
        scenario.add_solution(
            "x",
            pd.DataFrame(
                [
                    (i, j, r9(lvl), r9(rc))
                    for (i, j), lvl, rc in zip(pairs, res.x, res.reduced_costs)
                ],
                columns=["i", "j", "lvl", "mrg"],
            ),
            "var",
        )
        scenario.add_solution("z", {"lvl": r9(res.objective), "mrg": 0.0}, "var")
        scenario.add_solution("cost", {"lvl": 0.0, "mrg": 1.0}, "equ")
        shipped = {i: sum(res.x[k] for k, p in enumerate(pairs) if p[0] == i)
                   for i in I}
        received = {j: sum(res.x[k] for k, p in enumerate(pairs) if p[1] == j)
                    for j in J}
        scenario.add_solution(
            "supply",
            pd.DataFrame(
                [(i, r9(shipped[i]), r9(res.duals[k])) for k, i in enumerate(I)],
                columns=["i", "lvl", "mrg"],
            ),
            "equ",
        )
        scenario.add_solution(
            "demand",
            pd.DataFrame(
                [
                    (j, r9(received[j]), r9(res.duals[len(I) + k]))
                    for k, j in enumerate(J)
                ],
                columns=["j", "lvl", "mrg"],
            ),
            "equ",
        )
        scenario.commit("solved (built-in simplex)")


@register_model
class GAMSModel(Model):
    """S7/S8 bridge: scenario sets+pars → GDX → ``gams`` subprocess →
    solution GDX → sol_data commit. Requires the public GAMS Transfer
    Python API (``gams.transfer``) and a gams executable — both optional
    here; raises a clear error when missing."""

    name = "gams"

    def run(self, scenario: Scenario) -> None:
        try:
            import gams.transfer  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "GAMSModel needs the public 'gams' package (GAMS Transfer "
                "API) and a gams executable; install both or use "
                "model='function'"
            ) from e
        raise NotImplementedError("GDX round-trip: wire via gams.transfer")


def solve(
    scenario: Scenario,
    model: str = "function",
    callback: Callable[[Scenario], bool] | None = None,
    max_iterations: int = 100,
    **model_options: Any,
) -> Scenario:
    """Reference scenario.py:974–1075: refuse when a solution exists;
    iterate model.run until callback returns truthy (single run when no
    callback). ``record_versions`` analogue: the engine version is stored
    as scenario meta for provenance (reference gams.py:319–348 writes an
    ``ixmp_version`` set)."""
    if scenario.has_solution():
        raise ValueError(
            "Scenario has a solution; call remove_solution() first"
        )
    from ixmp_spark import __version__

    scenario.platform.set_meta(
        "ixmp_spark_version",
        __version__,
        model=scenario.model,
        scenario=scenario.scenario,
        version=scenario.version,
    )
    m = get_model(model, **model_options)
    m.enforce(scenario)
    for _ in range(max_iterations):
        m.run(scenario)
        if callback is None or callback(scenario):
            break
    else:
        raise RuntimeError(f"callback never converged in {max_iterations} runs")
    return scenario
