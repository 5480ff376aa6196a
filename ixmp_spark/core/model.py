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
            raise RuntimeError(
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
