"""Bucketed co-located fact-fact join as a driver-checked query.

Bucketing is THE 100 TB strategy for joins that repeat on one key: both
fact tables are hash-clustered into the same number of buckets on the
join key at WRITE time, so every subsequent join on that key reads
bucket-aligned splits and Catalyst elides both Exchanges — the shuffle
that would otherwise move the larger side across the cluster on every
run is paid once, at ingest. (tests/test_bucketing.py pins the
no-Exchange plan; this registry row puts driver oracle evidence behind
the same lane.)

The reference has no fact-fact join (its one relation is per-station
calibration lookup, estimate_queue.py:103-116); this generalizes the
engine's join surface the way SURVEY.md §2 'Partitioning & shuffle'
calls for.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, write_bucketed
from ..registry import register

N_BUCKETS = 8


@register(
    "join_bucketed_colocated",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    """,
    doc="Fact-fact join on pre-bucketed tables: orders and lineitem are "
    "written as managed tables bucketed 8 ways on the order key "
    "(hash-clustered + sorted at write), then joined WITHOUT any "
    "exchange below the join — the sort-merge join reads bucket-aligned "
    "splits directly; the only shuffle in the plan is the final "
    "5-group aggregate (plan pinned in tests/test_plans.py). Broadcast "
    "is disabled during the build so the co-location itself is what the "
    "plan proves at every scale factor. Tables are invocation-unique "
    "and dropped after the result detaches (hermetic, scratch.py "
    "convention). Exact integer-cents revenue for the oracle hash.",
    tags=("join", "bucketing", "colocation", "sink"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = uuid.uuid4().hex[:12]
    ob_name = f"orders_bk_{tag}"
    lb_name = f"lineitem_bk_{tag}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.round(F.col("l_extendedprice") * 100))
        .cast("long")
        .alias("price_cents"),
    )
    write_bucketed(orders, ob_name, "o_orderkey", N_BUCKETS, "o_orderkey")
    write_bucketed(lineitem, lb_name, "l_orderkey", N_BUCKETS, "l_orderkey")
    # pin the join strategy while the plan materializes: broadcast would
    # be legal (and at tiny SF chosen), but the lane under test is
    # bucket co-location — restore the session conf either way
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table(ob_name)
        lb = spark.table(lb_name)
        joined = (
            ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum("price_cents").alias("revenue_cents"),
            )
        )
        out = joined.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {ob_name}")
        spark.sql(f"DROP TABLE IF EXISTS {lb_name}")
    return out


def bucketed_join_plan(spark: SparkSession, sf_dir: str) -> str:
    """The (pre-materialization) plan of the co-located join, for the
    plan-shape test: SortMergeJoin with NO exchange below it."""
    tag = uuid.uuid4().hex[:12]
    ob_name = f"orders_bk_{tag}"
    lb_name = f"lineitem_bk_{tag}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(orders, ob_name, "o_orderkey", N_BUCKETS, "o_orderkey")
    write_bucketed(lineitem, lb_name, "l_orderkey", N_BUCKETS, "l_orderkey")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        ob = spark.table(ob_name)
        lb = spark.table(lb_name)
        joined = (
            ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        return joined._jdf.queryExecution().explainString(mode)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql(f"DROP TABLE IF EXISTS {ob_name}")
        spark.sql(f"DROP TABLE IF EXISTS {lb_name}")
