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
