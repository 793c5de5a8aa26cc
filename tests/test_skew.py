"""Salted join / salted aggregation equal their plain counterparts."""

from pyspark.sql import functions as F

from streaming_cdc_spark.operators.skew import salted_agg, salted_join


def skewed_df(spark):
    # one hot key (90%) + a long tail
    rows = [(0 if i % 10 else i % 7, float(i)) for i in range(2000)]
    return spark.createDataFrame(rows, "k long, v double")


def test_salted_join_matches_plain(spark):
    big = skewed_df(spark)
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(7)], "k long, name string")
    plain = big.join(small, "k").groupBy("name").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = (
        salted_join(big, small, "k", n_salts=8)
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_matches_plain(spark):
    df = skewed_df(spark)
    plain = df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = salted_agg(df, "k", {"n": F.count("*"), "s": F.sum("v")}, n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
