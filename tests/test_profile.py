"""Data-quality profiling/constraint operators on crafted fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_cdc_spark.operators.profile import column_profile, constraint_checks


def test_column_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, None, 5.0), (3, "b", None)],
        "id long, s string, v double",
    )
    got = {r["col_name"]: r.asDict() for r in column_profile(df, ["id", "s", "v"]).collect()}
    assert got["id"] == {"col_name": "id", "n_rows": 4, "n_nulls": 0, "n_distinct": 3}
    assert got["s"] == {"col_name": "s", "n_rows": 4, "n_nulls": 1, "n_distinct": 2}
    assert got["v"] == {"col_name": "v", "n_rows": 4, "n_nulls": 2, "n_distinct": 1}


def test_constraint_checks_all_kinds(spark):
    child = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, -1.0), (3, 20, None), (3, 99, 2.0),
         # NULL keys are EXEMPT from uniqueness (SQL semantics:
         # NULL != NULL) — two NULL-k rows add no k_unique violations
         (None, 10, 1.0), (None, 20, 1.0)],
        "k long, parent long, v double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    got = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in constraint_checks(
            child,
            checks=[
                # NULL predicate result (row 3's v) must COUNT as a
                # violation, not silently pass
                ("v_positive", F.col("v") > 0),
            ],
            unique=[("k_unique", ["k"]), ("kp_unique", ["k", "parent"])],
            fk=[("parent_fk", parent, "parent", "pk")],
        ).collect()
    }
    assert got["v_positive"] == (2, False)  # -1.0 and the NULL
    assert got["k_unique"] == (1, False)  # k=3 twice
    assert got["kp_unique"] == (0, True)
    assert got["parent_fk"] == (1, False)  # parent=99 orphan


def test_k_anonymity_acctbal_floor_pinned_on_fixture(spark):
    # k_anonymity_risk's +100000-cents non-negativity shift only
    # covers balances down to -1000.00: below that, the shifted cents
    # go negative and Spark `div` (truncate) vs DuckDB `//` band
    # semantics are engine-coincidental again. Both engines happen to
    # truncate BIGINT division identically (r8 probe), so a deeper
    # floor would NOT hash-FAIL — it would silently compute different
    # bands than the docstring claims. Pin the floor on both gated
    # sfs so a testdata regen names this cause (the rank_tie_cents
    # convention).
    from streaming_cdc_spark.tables import load

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
        mn = (
            load(spark, sf_dir, "customer")
            .agg(F.min("c_acctbal"))
            .first()[0]
        )
        assert mn is not None and float(mn) >= -1000.00, (sf_dir, mn)


def test_fk_child_columns_nonnull_on_fixture(spark):
    # fk_candidate_profile filters NULL child keys to match the
    # oracle's COUNT(DISTINCT) semantics; pin that the fixture's four
    # child columns are in fact non-null today, so a regen that
    # introduces NULLs surfaces here by name (the NULL filter keeps
    # the oracle green either way — this is documentation-by-test).
    from streaming_cdc_spark.tables import load

    sf_dir = "/root/testdata/sf0.01"
    for table, col in (
        ("events", "user_id"),
        ("events", "event_id"),
        ("orders", "o_custkey"),
        ("lineitem", "l_orderkey"),
    ):
        n = load(spark, sf_dir, table).filter(F.col(col).isNull()).count()
        assert n == 0, (table, col, n)


def test_fk_negative_control_is_actually_negative(spark):
    # fk_candidate_profile's fourth pair (events.event_id ->
    # customer.c_custkey) is the PLANTED negative control — its value
    # is that ids overlap only coincidentally, so containment < 1.
    # That is data-dependent: a regen could make event ids a subset of
    # customer keys and silently turn the control positive. Pin it.
    from streaming_cdc_spark.tables import load

    sf_dir = "/root/testdata/sf0.01"
    ev = load(spark, sf_dir, "events").select(F.col("event_id").alias("k")).distinct()
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    n_child = ev.count()
    n_matched = ev.join(cust, "k", "left_semi").count()
    assert n_matched < n_child, (n_matched, n_child)
