"""Deterministic sampling: reproducibility, exact-k, and the
map-side WindowGroupLimit plan shape."""

from pyspark.sql import functions as F

from streaming_cdc_spark.operators.sampling import (
    deterministic_group_topk,
    hash_rate_sample,
)


def corpus(spark):
    rows = [(f"g{i % 3}", i) for i in range(300)]
    return spark.createDataFrame(rows, "lang string, doc_id long")


def test_rate_sample_deterministic_and_partition_invariant(spark):
    df = corpus(spark)
    a = {tuple(r) for r in hash_rate_sample(df, "lang", "doc_id", 250).collect()}
    b = {
        tuple(r)
        for r in hash_rate_sample(df.repartition(13), "lang", "doc_id", 250).collect()
    }
    assert a == b and 0 < len(a) < 300
    # rate lands near 25% (hash uniformity, not an exact guarantee)
    assert 0.15 < len(a) / 300 < 0.35


def test_group_topk_exact_k_and_stable(spark):
    df = corpus(spark)
    got = deterministic_group_topk(df, "lang", "doc_id", 7)
    per = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"g0": 7, "g1": 7, "g2": 7}
    again = deterministic_group_topk(df.repartition(17), "lang", "doc_id", 7)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in again.collect()}
    # k larger than the group: whole group, no padding
    small = spark.createDataFrame([("g", 1), ("g", 2)], "lang string, doc_id long")
    assert deterministic_group_topk(small, "lang", "doc_id", 10).count() == 2


def test_group_topk_plan_pushes_limit_below_exchange(spark):
    """Spark's WindowGroupLimit must appear BOTH map-side (before the
    lang exchange) and finally — shuffle volume O(groups x k), the
    property that makes fixed-k-per-group viable at corpus scale."""
    df = deterministic_group_topk(corpus(spark), "lang", "doc_id", 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2
    head = plan.split("Exchange hashpartitioning")[0]
    assert "WindowGroupLimit" in head  # one sits above the exchange...
    tail = plan.split("Exchange hashpartitioning", 1)[1]
    assert "WindowGroupLimit" in tail  # ...and one below (map-side)


def test_sample_hash_null_group_cross_engine(spark):
    """NULL group values must hash identically on both engines:
    Spark's concat_ws drops a NULL argument AND its separator while
    DuckDB's concat only drops the NULL — _sample_hash coalesces the
    group to '' so both render '|<id>' (code-review r4)."""
    import duckdb

    from streaming_cdc_spark.operators.sampling import hash_rate_sample

    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("g", 3), ("g", 4)], "lang string, doc_id long"
    )
    got = {
        (r["lang"], r["doc_id"])
        for r in hash_rate_sample(df, "lang", "doc_id", 500).collect()
    }
    con = duckdb.connect()
    want = set(
        con.execute(
            """
        WITH d(lang, doc_id) AS (VALUES (NULL, 1), (NULL, 2), ('g', 3), ('g', 4))
        SELECT lang, doc_id FROM d
        WHERE CAST(concat('0x', substr(md5(concat(COALESCE(lang, ''), '|',
                  CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 < 500
        """
        ).fetchall()
    )
    assert got == want


def test_weighted_priority_sample_favors_heavy_rows(spark):
    """P(selected) grows with weight: with 500 weight-1 and 500
    weight-1000 rows, the bottom-100 priorities are dominated by the
    heavy rows (deterministic given the fixed ids — no flake)."""
    from streaming_cdc_spark.operators.sampling import weighted_priority_sample

    rows = [(i, 1000 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_priority_sample(df, "doc_id", "w", k=100).collect()
    heavy = sum(1 for r in got if r["doc_id"] < 500)
    assert heavy >= 90
    assert len(got) == 100


def test_weighted_priority_sample_partition_invariant(spark):
    from streaming_cdc_spark.operators.sampling import weighted_priority_sample

    rows = [(i, 1 + i % 13) for i in range(400)]
    a = weighted_priority_sample(
        spark.createDataFrame(rows, "doc_id long, w long").repartition(1),
        "doc_id", "w", k=50,
    ).collect()
    b = weighted_priority_sample(
        spark.createDataFrame(rows, "doc_id long, w long").repartition(16),
        "doc_id", "w", k=50,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
