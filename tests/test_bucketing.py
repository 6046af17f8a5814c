"""Bucketed-table co-location: a join on the bucket key must read both
sides shuffle-free (no Exchange in the plan) — the 100 TB fact-fact join
strategy (SURVEY.md §2 'Partitioning & shuffle')."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import (
    load_table,
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    write_bucketed(orders, "orders_b", "o_custkey", 4, sort_col="o_custkey")
    write_bucketed(customer, "customer_b", "c_custkey", 4, sort_col="c_custkey")
    ob = spark.table("orders_b")
    cb = spark.table("customer_b")
    joined = ob.join(cb, ob.o_custkey == cb.c_custkey).groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # bucketing elided both shuffles
    # and the result is still right
    n = joined.agg(F.sum("n")).collect()[0][0]
    assert n == orders.count()


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).where(F.col("event_type") == "error")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert back.count() == ev.where(F.col("event_type") == "error").count()


def test_compaction_consolidates_small_files(spark, tmp_path):
    from gjenbruksstasjoner_kotid_estimering_spark.io import (
        compact_partitioned,
        load_table,
    )

    out = str(tmp_path / "events_part")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # simulate micro-batch accretion: 8 tiny writes per partition layout
    for i in range(8):
        ev.where(F.col("event_id") % 8 == i).repartition(4).write.mode(
            "append"
        ).partitionBy("event_type").parquet(out)
    before = spark.read.parquet(out)
    before_rows = before.count()
    before_sum = before.agg(F.sum("event_id")).collect()[0][0]

    stats = compact_partitioned(
        spark, out, ["event_type"], target_bytes_per_file=1 << 30
    )
    assert stats["files_after"] < stats["files_before"]

    after = spark.read.parquet(out)
    assert after.count() == before_rows
    assert after.agg(F.sum("event_id")).collect()[0][0] == before_sum
    # one file per partition at this tiny size
    import glob

    per_part = glob.glob(out + "/event_type=*/*.parquet")
    parts = glob.glob(out + "/event_type=*")
    assert len(per_part) <= len(parts) * 2
