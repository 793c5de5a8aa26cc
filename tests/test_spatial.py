"""grid_knn: brute-force equivalence, 3x3 coverage at cell borders,
and the map-side WindowGroupLimit plan shape that keeps every shuffle
linear."""

from pyspark.sql import functions as F

from streaming_cdc_spark.operators.spatial import grid_knn

R = 1000
K = 3


def _pts(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, qx long, qy long")


def _brute(rows, r=R, k=K):
    out = []
    for i, xi, yi in rows:
        cand = []
        for j, xj, yj in rows:
            if j == i:
                continue
            d2 = (xi - xj) ** 2 + (yi - yj) ** 2
            if d2 < r * r:
                cand.append((d2, j))
        cand.sort()
        for rank, (d2, j) in enumerate(cand[:k], 1):
            out.append((i, j, d2, rank))
    return sorted(out)


def test_matches_bruteforce_random(spark):
    import random

    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 8000), rng.randrange(0, 8000)) for i in range(250)]
    got = sorted(map(tuple, grid_knn(_pts(spark, rows), R, K).collect()))
    assert got == _brute(rows)
    assert len(got) > 0


def test_cell_border_pairs_found(spark):
    # partners straddling a cell boundary (and a corner) sit in
    # adjacent cells — exactly what the 3x3 probe explode must cover
    rows = [
        (1, 999, 500),   # cell (0,0)
        (2, 1001, 500),  # cell (1,0), distance 2
        (3, 999, 999),   # cell (0,0)
        (4, 1001, 1001), # cell (1,1), corner-diagonal partner of 3
        (5, 5000, 5000), # isolated
    ]
    got = sorted(map(tuple, grid_knn(_pts(spark, rows), R, K).collect()))
    assert got == _brute(rows)
    assert (1, 2, 4, 1) in got
    assert any(q == 3 and n == 4 for q, n, _, _ in got)
    assert not any(q == 5 for q, _, _, _ in got)


def test_exact_radius_boundary_excluded(spark):
    # dist2 == R^2 must NOT match (strict <) on either engine
    rows = [(1, 0, 0), (2, R, 0), (3, R - 1, 0)]
    got = {(q, n) for q, n, _, _ in grid_knn(_pts(spark, rows), R, K).collect()}
    assert (1, 2) not in got
    assert (1, 3) in got


def test_plan_pushes_rank_limit_below_exchange(spark):
    rows = [(i, (i * 37) % 5000, (i * 91) % 5000) for i in range(200)]
    df = grid_knn(_pts(spark, rows), R, K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2
    head = plan.split("Exchange hashpartitioning")[0]
    assert "WindowGroupLimit" in head
    tail = plan.split("Exchange hashpartitioning", 1)[1]
    assert "WindowGroupLimit" in tail


def _brute_capped(rows, cap, r=R, k=K):
    # capped build membership: lowest-id `cap` points per home cell
    from collections import defaultdict

    cells = defaultdict(list)
    for i, x, y in rows:
        cells[(x // r, y // r)].append(i)
    keep = set()
    for ids in cells.values():
        keep.update(sorted(ids)[:cap])
    out = []
    for i, xi, yi in rows:
        cand = []
        for j, xj, yj in rows:
            if j == i or j not in keep:
                continue
            d2 = (xi - xj) ** 2 + (yi - yj) ** 2
            if d2 < r * r:
                cand.append((d2, j))
        cand.sort()
        for rank, (d2, j) in enumerate(cand[:k], 1):
            out.append((i, j, d2, rank))
    return sorted(out)


def test_cell_cap_matches_bruteforce_and_probes_survive(spark):
    # hot cell: 60 points piled into cell (0,0); cap 5 admits only
    # ids 0..4 to the build index, but ALL hot points keep their own
    # top-k as probes
    rows = [(i, 10 + i % 7, 10 + i % 9) for i in range(60)]
    rows += [(100 + i, 3000 + 13 * i, 3000) for i in range(6)]  # normal spread
    got = sorted(
        map(tuple, grid_knn(_pts(spark, rows), R, K, max_cell_population=5).collect())
    )
    assert got == _brute_capped(rows, cap=5)
    probes = {q for q, *_ in got}
    assert set(range(60)) <= probes  # capped-out points still probe
    hot_neighbors = {n for q, n, _, _ in got if q < 60}
    assert hot_neighbors <= set(range(5))  # only capped members indexed


def test_cell_cap_plan_is_map_side_limited(spark):
    # the cap's row_number filter must plant a WindowGroupLimit BELOW
    # its exchange too: the hot cell ships <= cap rows per input
    # partition instead of its whole population
    rows = [(i, (i * 37) % 5000, (i * 91) % 5000) for i in range(200)]
    df = grid_knn(_pts(spark, rows), R, K, max_cell_population=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two rank limits (cap + top-k), each with a map-side copy
    assert plan.count("WindowGroupLimit") >= 4
