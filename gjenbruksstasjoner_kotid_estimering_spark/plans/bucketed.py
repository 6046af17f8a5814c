"""Bucketed co-located fact-fact join as a driver-checked query.

Bucketing is THE 100 TB strategy for joins that repeat on one key: both
fact tables are hash-clustered into the same number of buckets on the
join key at WRITE time, so every subsequent join on that key reads
bucket-aligned splits and Catalyst elides both Exchanges — the shuffle
that would otherwise move the larger side across the cluster on every
run is paid once, at ingest. (tests/test_bucketing.py pins the
no-Exchange plan for the library helper; this registry row puts driver
oracle evidence behind the same lane.)

Isolation discipline (review round 5): the broadcast-threshold pin runs
in a ``spark.newSession()`` (own SQLConf, shared context/catalog) so a
concurrent query in the caller's session never sees the toggled conf;
table data lives under a scratch dir (external-table LOCATION) so a
crashed run's files are age-GC'd like every other fixture; the tables
are invocation-unique and dropped after the result detaches.

The reference has no fact-fact join (its one relation is per-station
calibration lookup, estimate_queue.py:103-116); this generalizes the
engine's join surface the way SURVEY.md §2 'Partitioning & shuffle'
calls for.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir

N_BUCKETS = 8


def _build_bucketed_join(
    spark: SparkSession, sf_dir: str
) -> tuple[SparkSession, DataFrame, list[str], str]:
    """Shared scaffolding for the registry row and the plan probe: an
    isolated session with broadcast disabled, two invocation-unique
    bucketed external tables under scratch, and the co-located join.
    Returns (session, joined frame, table names, scratch dir) — caller
    materializes/explains, then cleans up via :func:`_cleanup`."""
    s = spark.newSession()  # own SQLConf: conf pins can't leak to callers
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    tag = uuid.uuid4().hex[:12]
    ob_name = f"orders_bk_{tag}"
    lb_name = f"lineitem_bk_{tag}"
    scratch = new_scratch_dir(f"bucketed_{os.path.basename(sf_dir.rstrip('/'))}")
    orders = load_table(s, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load_table(s, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.round(F.col("l_extendedprice") * 100))
        .cast("long")
        .alias("price_cents"),
    )
    try:
        for df, name in ((orders, ob_name), (lineitem, lb_name)):
            key = df.columns[0]
            (
                df.write.mode("overwrite")
                .format("parquet")
                .option("path", os.path.join(scratch, name))  # external:
                # files live under scratch → crash leftovers age-GC'd
                .bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(name)
            )
    except BaseException:
        # partial-failure hygiene: never leave a catalog entry pointing
        # at a scratch path the age-GC will later delete from under it
        _cleanup(s, [ob_name, lb_name], scratch)
        raise
    ob = s.table(ob_name)
    lb = s.table(lb_name)
    joined = (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("price_cents").alias("revenue_cents"),
        )
    )
    return s, joined, [ob_name, lb_name], scratch


def _cleanup(s: SparkSession, tables: list[str], scratch: str) -> None:
    for t in tables:
        s.sql(f"DROP TABLE IF EXISTS {t}")
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


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
    "written as external tables bucketed 8 ways on the order key "
    "(hash-clustered + sorted at write), then joined WITHOUT any "
    "exchange below the join — the sort-merge join reads bucket-aligned "
    "splits directly; the only shuffle in the plan is the final "
    "5-group aggregate (plan pinned in tests/test_plans.py). Broadcast "
    "is disabled in an isolated newSession so the co-location itself is "
    "what the plan proves at every scale factor, without touching the "
    "caller's confs. Hermetic: invocation-unique tables under scratch, "
    "dropped after the result detaches. Exact integer-cents revenue "
    "for the oracle hash.",
    tags=("join", "bucketing", "colocation", "sink"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, joined, tables, scratch = _build_bucketed_join(spark, sf_dir)
    try:
        # detach only (no dirs): _cleanup is the single owner of DROP +
        # rmtree, in that order — never delete files under a live table
        return detach_result(joined)
    finally:
        _cleanup(s, tables, scratch)


def bucketed_join_plan(spark: SparkSession, sf_dir: str) -> str:
    """The (pre-materialization) plan of the EXACT frame the registry row
    materializes — one scaffolding definition, so the pinned plan can't
    desynchronize from the shipped query. AQE is disabled only in the
    probe's isolated session (static explain hides codegen/exchange
    detail under AQE wrapping)."""
    s, joined, tables, scratch = _build_bucketed_join(spark, sf_dir)
    try:
        s.conf.set("spark.sql.adaptive.enabled", "false")
        # rebuild on the same tables so the plan reflects the AQE-off conf
        ob = s.table(tables[0])
        lb = s.table(tables[1])
        probe = (
            ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum("price_cents").alias("revenue_cents"),
            )
        )
        mode = s._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        return probe._jdf.queryExecution().explainString(mode)
    finally:
        _cleanup(s, tables, scratch)
