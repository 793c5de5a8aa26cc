"""Differential fuzzing: seeded template-generated relational queries
run against BOTH Spark and DuckDB on the sf0.001 tables and compared
with the gate's canonicalization. Extends correctness coverage past
the hand-written oracle pairs (SURVEY §5 test plan: differential
tests for every §2.8 operator family).

Templates only emit constructs both engines define identically:
integer/decimal-cast aggregates, equality/range filters, group-bys,
HAVING, and IN lists — all rounded like the gate queries.
"""

import math
import random

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

NUMERIC = ["l_quantity", "l_extendedprice", "l_discount"]
GROUPS = [
    ["l_returnflag"],
    ["l_linestatus"],
    ["l_returnflag", "l_linestatus"],
    ["l_linenumber"],
]


def gen_query(rng: random.Random) -> str:
    group = rng.choice(GROUPS)
    col = rng.choice(NUMERIC)
    preds = []
    if rng.random() < 0.7:
        preds.append(f"l_quantity {rng.choice(['<', '>=', '='])} {rng.randint(1, 50)}")
    if rng.random() < 0.5:
        preds.append(f"l_discount >= {rng.choice(['0.01', '0.03', '0.05', '0.08'])}")
    if rng.random() < 0.4:
        flags = rng.sample(["'A'", "'N'", "'R'"], rng.randint(1, 2))
        preds.append(f"l_returnflag IN ({', '.join(flags)})")
    where = f"WHERE {' AND '.join(preds)}" if preds else ""
    having = "HAVING COUNT(*) > 3" if rng.random() < 0.4 else ""
    gcols = ", ".join(group)
    return (
        f"SELECT {gcols}, COUNT(*) AS n, "
        f"ROUND(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE), 2) AS s, "
        f"ROUND(MIN({col}), 4) AS mn, ROUND(MAX({col}), 4) AS mx "
        f"FROM lineitem {where} GROUP BY {gcols} {having}"
    )


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    return str(v)


@pytest.fixture(scope="module")
def engines(spark):
    from streaming_cdc_spark.tables import load

    load(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'")
    yield spark, con
    spark.catalog.dropTempView("lineitem")


@pytest.mark.parametrize("seed", range(25))
def test_differential(engines, seed):
    spark, con = engines
    sql = gen_query(random.Random(seed))
    sdf = spark.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), sql
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ssig = sorted("\x01".join(canon(r[i]) for i in so) for r in srows)
    dsig = sorted("\x01".join(canon(r[i]) for i in do) for r in drows)
    assert ssig == dsig, f"{sql}\nspark={ssig[:2]}\nduck={dsig[:2]}"
