"""Greedy EMD heuristic + exact-LP oracle (test/benchmark only).

TPU-native counterpart of the reference's greedy nearest-available
coupling (ref: crates/lloyd/src/heuristic.rs:7-30) — an O(N·M) upper
bound on the true EMD used to sanity-check the Sinkhorn kernel — plus an
exact linear-program EMD via scipy for oracle tests (the reference
validates against metric axioms only; we can afford the exact answer).
"""

from __future__ import annotations

import numpy as np


def greedy_emd(mu: np.ndarray, nu: np.ndarray, cost: np.ndarray) -> float:
    """Greedy transport: repeatedly move mass along the cheapest available
    (source, sink) pair. Upper-bounds the exact EMD."""
    mu = mu.astype(np.float64).copy()
    nu = nu.astype(np.float64).copy()
    order = np.dstack(np.unravel_index(np.argsort(cost, axis=None), cost.shape))[0]
    total = 0.0
    for i, j in order:
        if mu[i] <= 0 or nu[j] <= 0:
            continue
        flow = min(mu[i], nu[j])
        total += flow * cost[i, j]
        mu[i] -= flow
        nu[j] -= flow
        if mu.sum() <= 1e-12:
            break
    return float(total)


def exact_emd(mu: np.ndarray, nu: np.ndarray, cost: np.ndarray) -> float:
    """Exact optimal transport cost via linear programming."""
    from scipy.optimize import linprog

    n, m = len(mu), len(nu)
    c = cost.reshape(-1).astype(np.float64)
    a_eq = []
    b_eq = []
    for i in range(n):
        row = np.zeros(n * m)
        row[i * m:(i + 1) * m] = 1
        a_eq.append(row)
        b_eq.append(mu[i])
    for j in range(m):
        row = np.zeros(n * m)
        row[j::m] = 1
        a_eq.append(row)
        b_eq.append(nu[j])
    res = linprog(c, A_eq=np.array(a_eq), b_eq=np.array(b_eq),
                  bounds=(0, None), method="highs")
    assert res.success, res.message
    return float(res.fun)
