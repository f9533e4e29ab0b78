"""Bucketed co-located join: pre-bucketing both fact tables on the join
key removes the shuffle from later joins — the standard way to make a
repeated fact-fact join survive a 100x scale-up. This test pins that
the bucketed plan has no Exchange on either side."""

import pyspark.sql.functions as F

from renkodf_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    import shutil

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    for orphan in ("orders_b", "lineitem_b"):  # dirs left by crashed runs
        shutil.rmtree(f"/tmp/renkodf-spark-test-warehouse/{orphan}", ignore_errors=True)
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )

    joined = (
        spark.table("lineitem_b")
        .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the join itself must not shuffle either side (bucket co-location);
    # disable AQE wrapping for a readable plan and the broadcast path so
    # the sort-merge join (the at-scale strategy) is what gets planned
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    join_part = plan.split("HashAggregate")[-1]  # below the agg: join + scans
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part

    # and it returns the same result as the unbucketed join
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
    want = {r["o_orderpriority"]: r["n"] for r in plain.collect()}
    assert got == want
