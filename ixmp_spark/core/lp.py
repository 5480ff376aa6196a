"""Built-in LP solver (two-phase primal simplex, numpy-dense).

The reference delegates every solve to an external GAMS install
(model/gams.py); this module makes the engine self-sufficient for the
LP class the reference's own test model (Dantzig transport,
tutorial/transport/dantzig_model.py) belongs to: the solution — levels
AND marginals — is *computed*, not replayed.

Scope: small/medium dense LPs (model data is driver-sized by design —
SURVEY.md §1.2; the data plane stays in Spark, the solve is a driver
step exactly like the reference's GAMS subprocess). Bland's rule guards
against cycling; duals come from the final basis (y = c_B B⁻¹), reduced
costs give variable marginals — the same quantities GAMS reports as
``.m``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class LPResult:
    x: np.ndarray          #: primal solution (original variables)
    objective: float
    duals: np.ndarray      #: one per constraint (sign: GAMS convention
    #                         for a MIN problem — ≥ rows ≥ 0, ≤ rows ≤ 0)
    reduced_costs: np.ndarray  #: per original variable (x.m analogue)
    status: str            #: 'optimal' | 'infeasible' | 'unbounded'


def solve_lp(c, A, b, senses, max_iter: int = 20_000) -> LPResult:
    """min c·x  s.t.  A_i·x (senses_i) b_i,  x ≥ 0.

    senses: sequence of '<=', '>=', '=' per row.
    """
    c = np.asarray(c, dtype=float)
    A = np.asarray(A, dtype=float)
    b = np.asarray(b, dtype=float)
    m, n = A.shape
    senses = list(senses)
    assert len(senses) == m and len(c) == n and len(b) == m

    # normalize to b >= 0 (flip rows, flipping sense)
    flip = np.ones(m)
    for i in range(m):
        if b[i] < 0:
            A[i] *= -1
            b[i] *= -1
            flip[i] = -1.0
            senses[i] = {"<=": ">=", ">=": "<=", "=": "="}[senses[i]]

    # standard form: slack (+1) for <=, surplus (-1) + artificial for >=,
    # artificial for =
    cols = [A]
    slack_col_of_row: dict[int, int] = {}
    art_col_of_row: dict[int, int] = {}
    extra = []
    idx = n
    for i, s in enumerate(senses):
        col = np.zeros(m)
        if s == "<=":
            col[i] = 1.0
            extra.append(col)
            slack_col_of_row[i] = idx
            idx += 1
        elif s == ">=":
            col[i] = -1.0
            extra.append(col)
            slack_col_of_row[i] = idx
            idx += 1
        elif s != "=":
            raise ValueError(f"bad sense {s!r}")
    for i, s in enumerate(senses):
        if s in (">=", "="):
            col = np.zeros(m)
            col[i] = 1.0
            extra.append(col)
            art_col_of_row[i] = idx
            idx += 1
    W = np.column_stack([A] + [e.reshape(-1, 1) for e in extra]) if extra else A
    n_total = W.shape[1]
    artificials = sorted(art_col_of_row.values())

    # starting basis: slack for <=, artificial for >= and =
    basis = []
    for i, s in enumerate(senses):
        basis.append(
            slack_col_of_row[i] if s == "<=" else art_col_of_row[i]
        )

    def run_simplex(cost: np.ndarray, basis: list[int], banned: set[int]):
        for _ in range(max_iter):
            B = W[:, basis]
            xB = np.linalg.solve(B, b)
            y = np.linalg.solve(B.T, cost[basis])
            red = cost - y @ W
            red[basis] = 0.0
            entering = -1
            for j in range(n_total):  # Bland: smallest eligible index
                if j in banned or j in basis:
                    continue
                if red[j] < -1e-9:
                    entering = j
                    break
            if entering < 0:
                return basis, xB, y, red, "optimal"
            d = np.linalg.solve(B, W[:, entering])
            ratios = [
                (xB[i] / d[i], basis[i], i)
                for i in range(m)
                if d[i] > 1e-9
            ]
            if not ratios:
                return basis, xB, y, red, "unbounded"
            _, _, leave_pos = min(ratios, key=lambda t: (t[0], t[1]))
            basis[leave_pos] = entering
        raise RuntimeError("simplex iteration limit")

    # phase 1: drive artificials to zero
    if artificials:
        c1 = np.zeros(n_total)
        c1[artificials] = 1.0
        basis, xB, _, _, status = run_simplex(c1, basis, banned=set())
        if status != "optimal" or xB @ c1[basis] > 1e-7:
            nan = np.full(n, np.nan)
            return LPResult(nan, float("nan"), np.full(m, np.nan), nan,
                            "infeasible")
        # pivot any artificial still (degenerately) basic out if possible
        for pos, bj in enumerate(basis):
            if bj in artificials:
                B = np.linalg.inv(W[:, basis])
                for j in range(n_total):
                    if j in artificials or j in basis:
                        continue
                    if abs((B @ W[:, j])[pos]) > 1e-9:
                        basis[pos] = j
                        break

    # phase 2
    c2 = np.concatenate([c, np.zeros(n_total - n)])
    basis, xB, y, red, status = run_simplex(
        c2, basis, banned=set(artificials)
    )
    if status != "optimal":
        nan = np.full(n, np.nan)
        return LPResult(nan, float("nan"), np.full(m, np.nan), nan, status)
    x = np.zeros(n_total)
    x[basis] = xB
    # duals in the ORIGINAL row orientation (undo the b<0 flip)
    duals = y * flip
    return LPResult(
        x[:n], float(c @ x[:n]), duals, red[:n].copy(), "optimal"
    )
