"""Two-pass global-order operators: parity with the single-partition
window form, including ties and many-partition splits."""

import numpy as np
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from streaming_cdc_spark.operators.ranking import dense_rank_global, running_sum_global


def test_dense_rank_global_matches_window(spark):
    rng = np.random.default_rng(5)
    # duplicated keys force tie handling across the range partitioning
    keys = rng.integers(0, 40, size=200).tolist()
    df = spark.createDataFrame([(i, int(k)) for i, k in enumerate(keys)], "rid long, k long")
    expected = {
        (r["rid"], r["dr"])
        for r in df.withColumn("dr", F.dense_rank().over(W.orderBy("k"))).collect()
    }
    got = {
        (r["rid"], r["dr"])
        for r in dense_rank_global(df, "k", "dr", num_partitions=7).collect()
    }
    assert got == expected


def test_dense_rank_global_single_partition_degenerate(spark):
    df = spark.createDataFrame([(1, 10), (2, 10), (3, 20)], "rid long, k long")
    got = {(r["rid"], r["dr"]) for r in dense_rank_global(df, "k", "dr", num_partitions=1).collect()}
    assert got == {(1, 1), (2, 1), (3, 2)}


def test_running_sum_global_matches_window(spark):
    rng = np.random.default_rng(6)
    rows = [(int(p), int(d)) for p, d in zip(rng.permutation(300), rng.integers(-3, 4, 300))]
    df = spark.createDataFrame(rows, "pos long, delta long")
    w = W.orderBy("pos").rowsBetween(W.unboundedPreceding, W.currentRow)
    expected = {
        (r["pos"], r["run"]) for r in df.withColumn("run", F.sum("delta").over(w)).collect()
    }
    got = {
        (r["pos"], r["run"])
        for r in running_sum_global(df, ["pos"], "delta", "run", num_partitions=9).collect()
    }
    assert got == expected


def test_running_max_global_matches_single_window(spark):
    """Two-pass exclusive running max == the definitional python
    computation, across partition boundaries and with duplicates."""
    from streaming_cdc_spark.operators.ranking import running_max_global

    rows = [(i, (i * 37) % 19) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = {
        r["id"]: r["hi"]
        for r in running_max_global(
            df, ["id"], "v", "hi", num_partitions=7, exclusive=True
        ).collect()
    }
    run = None
    for i, v in rows:  # ascending id order
        assert out[i] == run
        run = v if run is None else max(run, v)


def test_pareto_front_equals_bruteforce(spark):
    """Skyline sweep == the O(n^2) dominance definition, including
    both-coordinate ties (mutually non-dominating -> all kept) and
    same-x groups."""
    from streaming_cdc_spark.operators.ranking import pareto_front

    pts = [(i, (i * 13) % 11, (i * 7) % 9) for i in range(60)]
    pts += [(100, 5, 8), (101, 5, 8)]  # exact tie pair
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {r["id"] for r in pareto_front(df, "x", "y", ["id"]).collect()}
    want = {
        i
        for (i, x, y) in pts
        if not any(
            ox >= x and oy >= y and (ox > x or oy > y)
            for (j, ox, oy) in pts
            if j != i
        )
    }
    assert got == want
    assert {100, 101} & got == ({100, 101} if (100 in want) else set())
