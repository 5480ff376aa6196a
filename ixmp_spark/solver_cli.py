"""Standalone external solver: ``python -m ixmp_spark.solver_cli IN OUT``.

Plays the GAMS role in the reference's solve loop (model/gams.py:432–481:
write input → subprocess → read solution) against the portable exchange
bundle (sources/model_exchange.py): reads sets/pars from IN, assembles
the canonical transport LP, solves it with the built-in two-phase
simplex (core/lp.py), writes levels+marginals to OUT. Deliberately uses
no engine objects beyond the exchange readers — it is "the other side"
of the OS-process boundary, as a real solver binary would be.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print("usage: python -m ixmp_spark.solver_cli IN_DIR OUT_DIR",
              file=sys.stderr)
        return 2
    in_dir, out_dir = argv

    import pandas as pd

    from ixmp_spark.core.lp import solve_lp
    from ixmp_spark.sources.model_exchange import (
        read_model_input,
        write_solution,
    )

    data = read_model_input(in_dir)
    I = list(data["i"])  # noqa: E741 — the model's own index name
    J = list(data["j"])
    cap = data["a"].set_index("i")["value"]
    dem = data["b"].set_index("j")["value"]
    dist = data["d"].set_index(["i", "j"])["value"]
    f = data["f"]["value"]

    pairs = [(i, j) for i in I for j in J if (i, j) in dist.index]
    c = [f * dist[p] / 1000.0 for p in pairs]
    A, b, senses = [], [], []
    for i in I:
        A.append([1.0 if pi == i else 0.0 for pi, pj in pairs])
        b.append(float(cap[i]))
        senses.append("<=")
    for j in J:
        A.append([1.0 if pj == j else 0.0 for pi, pj in pairs])
        b.append(float(dem[j]))
        senses.append(">=")
    res = solve_lp(c, A, b, senses)
    if res.status != "optimal":
        print(f"LP status: {res.status}", file=sys.stderr)
        return 1

    r9 = lambda v: round(float(v), 9)  # noqa: E731
    x = pd.DataFrame(
        [
            (i, j, r9(lvl), r9(rc))
            for (i, j), lvl, rc in zip(pairs, res.x, res.reduced_costs)
        ],
        columns=["i", "j", "lvl", "mrg"],
    )
    shipped = {i: sum(res.x[k] for k, p in enumerate(pairs) if p[0] == i)
               for i in I}
    received = {j: sum(res.x[k] for k, p in enumerate(pairs) if p[1] == j)
                for j in J}
    write_solution(
        out_dir,
        {
            "x": x,
            "z": {"lvl": r9(res.objective), "mrg": 0.0},
            "cost": {"lvl": 0.0, "mrg": 1.0},
            "supply": pd.DataFrame(
                [(i, r9(shipped[i]), r9(res.duals[k]))
                 for k, i in enumerate(I)],
                columns=["i", "lvl", "mrg"],
            ),
            "demand": pd.DataFrame(
                [(j, r9(received[j]), r9(res.duals[len(I) + k]))
                 for k, j in enumerate(J)],
                columns=["j", "lvl", "mrg"],
            ),
        },
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
