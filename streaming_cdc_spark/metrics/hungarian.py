"""Linear-sum assignment (Hungarian algorithm), pure numpy.

The reference uses scipy.optimize.linear_sum_assignment
(eval_clusters.py:136) on the (#true x #pred) CEAF score matrix; that
matrix is #clusters-sized, so a driver-side O(n^3) solve is the right
call at any data scale. scipy is not in this environment, so this is
a standard shortest-augmenting-path (Jonker-Volgenant style) solver.
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray, maximize: bool = False):
    """Return (row_ind, col_ind) minimizing (or maximizing) the total
    cost over a one-to-one assignment. Handles rectangular matrices by
    assigning min(n_rows, n_cols) pairs, like scipy."""
    c = np.asarray(cost, dtype=np.float64)
    if maximize:
        c = -c
    transposed = c.shape[0] > c.shape[1]
    if transposed:
        c = c.T
    n, m = c.shape  # n <= m
    # potentials
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    # p[j] = row assigned to column j (1-indexed sentinel at 0)
    p = np.full(m + 1, -1, dtype=np.int64)
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(n):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, np.inf)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = np.inf
            j1 = -1
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = c[i0, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == -1:
                break
        while j0 != 0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows = np.empty(n, dtype=np.int64)
    cols = np.empty(n, dtype=np.int64)
    k = 0
    for j in range(1, m + 1):
        if p[j] != -1:
            rows[k] = p[j]
            cols[k] = j - 1
            k += 1
    order = np.argsort(rows)
    rows, cols = rows[order], cols[order]
    if transposed:
        rows, cols = cols, rows
        order = np.argsort(rows)
        rows, cols = rows[order], cols[order]
    return rows, cols
