"""Data-quality queries: table profiling + declarative constraint
validation over the TPC-H-ish tables (the Deequ slice)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_cdc_spark.operators import profile as P
from streaming_cdc_spark.queries.registry import query
from streaming_cdc_spark.tables import load

_PROFILE_COLS = [
    "l_discount",
    "l_orderkey",
    "l_partkey",
    "l_quantity",
    "l_returnflag",
    "l_suppkey",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
        CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM lineitem"""
    for c in _PROFILE_COLS
)


@query("column_profile", oracle=_PROFILE_ORACLE)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column health profile of lineitem — row count, null count,
    exact distinct count for six columns — in ONE aggregate pass
    (multi-distinct plans through a single Expand stage; the result
    is one row unpivoted to one row per column, so nothing
    data-sized ever leaves the executors)."""
    li = load(spark, sf_dir, "lineitem")
    return P.column_profile(li, _PROFILE_COLS)


@query(
    "constraint_checks",
    oracle="""
    SELECT check_name, n_violations, n_violations = 0 AS passed FROM (
    SELECT 'l_quantity_positive' AS check_name,
           CAST(SUM(CASE WHEN NOT coalesce(l_quantity > 0, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity_max_30',
           CAST(SUM(CASE WHEN NOT coalesce(l_quantity <= 30, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount_range',
           CAST(SUM(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag_domain',
           CAST(SUM(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_pk_unique',
           CAST(COUNT(CASE WHEN l_orderkey IS NOT NULL
                            AND l_linenumber IS NOT NULL THEN 1 END)
                - COUNT(DISTINCT CASE WHEN l_orderkey IS NOT NULL
                                       AND l_linenumber IS NOT NULL
                        THEN struct_pack(k1 := l_orderkey,
                                         k2 := l_linenumber) END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey_unique',
           CAST(COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey_fk', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    )
    """,
)
def constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative table constraints over lineitem: row predicates
    (positivity, a deliberately-failing quantity cap so both passed
    branches appear, range, domain membership), key uniqueness (the
    real PK passes, bare l_orderkey fails — multi-line orders), and
    referential integrity against orders (one anti-join). Row
    predicates and uniqueness share ONE aggregate pass; the oracle
    recomputes every check independently. Output sorted upstream by
    the driver's canonicalization; passed = n_violations == 0."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return P.constraint_checks(
        li,
        checks=[
            ("l_quantity_positive", F.col("l_quantity") > 0),
            ("l_quantity_max_30", F.col("l_quantity") <= 30),
            ("l_discount_range", (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1)),
            ("l_returnflag_domain", F.col("l_returnflag").isin("A", "N", "R")),
        ],
        unique=[
            ("l_pk_unique", ["l_orderkey", "l_linenumber"]),
            ("l_orderkey_unique", ["l_orderkey"]),
        ],
        fk=[("l_orderkey_fk", orders, "l_orderkey", "o_orderkey")],
    )
