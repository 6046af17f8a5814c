"""Round-6 wave 2: hive-partition pruning, table-arg UDTF, approx_top_k."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced5 as a5

from conftest import SF0001, SF001


def test_hive_partitioning_prunes_directories(spark):
    """A filter on the partition column must reach the scan as a
    PartitionFilter and the scan must touch ONLY that partition's
    directory — pruning at planning time, before any file opens."""
    scratch, part_dir = a5._write_partitioned_events(spark, SF001)
    try:
        def files_read(df) -> int:
            # inputFiles() lists the relation pre-pruning; the EXECUTED
            # scan's numFiles metric is what pruning actually touched
            df.collect()
            scan = df._jdf.queryExecution().executedPlan().collectLeaves().head()
            return scan.metrics().apply("numFiles").value()

        filtered = spark.read.parquet(part_dir).where(
            F.col("event_type") == a5._PART_TYPE
        )
        full = spark.read.parquet(part_dir)
        n_filtered, n_full = files_read(filtered), files_read(full)
        assert 0 < n_filtered < n_full  # only the one partition's files
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "event_type" in plan.split("PartitionFilters")[1][:200]
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_udtf_table_arg_matches_declarative_topk(spark):
    got = sorted(
        map(tuple, a5.udtf_table_arg_topk(spark, SF0001).collect())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), "event_id"
    )
    want = sorted(
        map(
            tuple,
            load_table(spark, SF0001, "events")
            .select(
                "event_type",
                F.row_number().over(w).alias("rank"),
                "value",
                "event_id",
            )
            .where(F.col("rank") <= 3)
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_approx_top_k_exact_below_capacity(spark):
    """With key cardinality far below maxItemsTracked the frequent-items
    sketch must be exact — here over user_id (hundreds of keys)."""
    est = {
        r["item"]: r["count"]
        for r in (
            load_table(spark, SF0001, "events")
            .agg(F.expr("approx_top_k(user_id, 1000)").alias("tk"))
            .select(F.inline("tk"))
            .collect()
        )
    }
    exact = {
        r["user_id"]: r["n"]
        for r in (
            load_table(spark, SF0001, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert est == exact
