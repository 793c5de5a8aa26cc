"""Hungarian solver vs brute-force enumeration on small matrices."""

import itertools

import numpy as np
import pytest

from streaming_cdc_spark.metrics.hungarian import linear_sum_assignment


def brute_best(c, maximize):
    n, m = c.shape
    k = min(n, m)
    best = None
    if n <= m:
        for cols in itertools.permutations(range(m), k):
            total = sum(c[i, cols[i]] for i in range(k))
            if best is None or (total > best if maximize else total < best):
                best = total
    else:
        for rows in itertools.permutations(range(n), k):
            total = sum(c[rows[j], j] for j in range(k))
            if best is None or (total > best if maximize else total < best):
                best = total
    return best


@pytest.mark.parametrize("seed", range(20))
@pytest.mark.parametrize("shape", [(3, 3), (4, 4), (2, 5), (5, 2), (1, 4), (5, 5)])
@pytest.mark.parametrize("maximize", [False, True])
def test_matches_bruteforce(seed, shape, maximize):
    rng = np.random.default_rng(seed)
    c = rng.random(shape)
    ri, ci = linear_sum_assignment(c, maximize=maximize)
    assert len(ri) == min(shape)
    assert len(set(ri)) == len(ri) and len(set(ci)) == len(ci)
    total = c[ri, ci].sum()
    assert total == pytest.approx(brute_best(c, maximize), abs=1e-9)
