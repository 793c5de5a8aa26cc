"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle entirely — the SCALING.md claim, proven on a plan.
"""

from pyspark.sql import functions as F

from streaming_cdc_spark.plans.inspect import formatted_plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    # external bucketed tables (warehouse dir is a static conf)
    left.write.bucketBy(8, "k").sortBy("k").option("path", str(tmp_path / "l")).mode(
        "overwrite"
    ).saveAsTable("bkt_left")
    right.write.bucketBy(8, "k").sortBy("k").option("path", str(tmp_path / "r")).mode(
        "overwrite"
    ).saveAsTable("bkt_right")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so bucketed reads apply (tiny test
        # tables would otherwise broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan  # no shuffle on either side
        assert joined.count() == 1000
        # sanity: the same join on unbucketed data DOES shuffle
        plain = left.join(right, "k")
        assert "Exchange" in formatted_plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_join_roundtrip_query_plans_without_exchange(spark, tmp_path):
    # the registered query's OWN table-builder must produce the
    # zero-shuffle sort-merge join (results are driver-hashed; the
    # physical claim is pinned here)
    from streaming_cdc_spark.queries.layout import _bucketed_join_tables

    tables: list = []
    try:
        joined = _bucketed_join_tables(
            spark, "/root/testdata/sf0.001", str(tmp_path / "w"), "plantest",
            tables,
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # NOTE: per-side Sort nodes REMAIN by design — Spark 3+
        # ignores bucket sortBy metadata for output ordering
        # (SPARK-28632, legacy-gated), so the bucketing win is the
        # EXCHANGE elimination (no data movement); the in-partition
        # sort is local and spillable. The claim pinned here is
        # exchange-free, deliberately not sort-free.
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
