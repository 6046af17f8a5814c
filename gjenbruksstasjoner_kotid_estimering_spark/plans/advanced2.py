"""Round-2 engine-surface additions: interval (stream-stream-shaped)
joins, time-bounded dedup, null-safe equality join, and the TPC-H Q11
value-concentration shape.

The interval join is the batch twin of a Structured Streaming
stream-stream join (readStream a ⋈ readStream b ON key AND time-range):
the join condition — equi key + bounded time distance — is exactly what
the streaming engine uses to size its state-store retention (the range
bound IS the watermark horizon). Expressing it in batch keeps it
oracle-checkable; streaming/file_stream.py carries the infrastructure
twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "join_interval_events",
    oracle="""
        SELECT a.event_id AS view_id, b.event_id AS click_id,
               a.user_id,
               CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS lag_s
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts
         AND b.ts < a.ts + INTERVAL 10 MINUTE
         AND a.event_type = 'view' AND b.event_type = 'click'
        WHERE a.user_id < 30
    """,
    doc="Interval join (the stream-stream join shape): every 'view' event "
    "matches 'click' events by the same user within the following 10 "
    "minutes. Equi-join on user_id carries the shuffle; the time-range "
    "predicate is the join residual — in Structured Streaming this exact "
    "bound sizes state retention (watermark + 10 min), here it is the "
    "batch twin with a DuckDB oracle. Scoped to user_id < 30 for a "
    "compact gate result.",
    tags=("join", "interval", "streaming"),
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return (
        views.join(
            clicks,
            (views.user_id == clicks.c_user_id)
            & (clicks.click_ts >= views.view_ts)
            & (
                clicks.click_ts
                < views.view_ts + F.expr("INTERVAL 10 MINUTES")
            ),
        )
        .select(
            "view_id",
            "click_id",
            "user_id",
            (
                F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
            ).alias("lag_s"),
        )
    )


@register(
    "dedup_time_bounded",
    oracle="""
        WITH ranked AS (
          SELECT event_id, user_id, event_type, ts, value,
                 row_number() OVER (
                   PARTITION BY user_id, event_type,
                                date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn
          FROM events
        )
        SELECT event_id, user_id, event_type, ts, value
        FROM ranked WHERE rn = 1
    """,
    doc="Time-bounded dedup: first event per (user, type) per calendar "
    "hour — the batch semantics of streaming "
    "dropDuplicatesWithinWatermark, where the dedup key includes a "
    "bounded time scope so state can be evicted. Ranking window with the "
    "(ts, event_id) total order; at scale Spark keeps only rn=1 per "
    "partition frame (no full materialization). The streaming twin lives "
    "in streaming/file_stream.py (dropDuplicates inside the watermark).",
    tags=("dedup", "window", "streaming"),
)
def dedup_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy(
            "user_id", "event_type", F.date_trunc("hour", F.col("ts"))
        ).orderBy("ts", "event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


@register(
    "join_null_safe",
    oracle="""
        WITH probe AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN NULL
                      ELSE CAST(doc_id % 7 AS BIGINT) END AS k
          FROM documents
        ),
        dim AS (
          SELECT CAST(unnest([0,1,2,3]) AS BIGINT) AS k,
                 'g' || CAST(unnest([0,1,2,3]) AS VARCHAR) AS grp
          UNION ALL SELECT NULL, 'g_null'
        )
        SELECT p.doc_id, p.k, d.grp
        FROM probe p JOIN dim d ON p.k IS NOT DISTINCT FROM d.k
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match the dimension's NULL row instead of dropping out — the join "
    "semantics CDC merge keys need when NULL is a legitimate key value. "
    "Spark plans <=> as a hash join (null-safe keys hash like values), so "
    "the broadcast strategy is unchanged — contrast with the OR-based "
    "rewrite (k = d.k OR (k IS NULL AND d.k IS NULL)) which degrades to "
    "nested-loop.",
    tags=("join", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    probe = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise((F.col("doc_id") % 7).cast("long"))
        .alias("k"),
    )
    dim_rows = [(k, f"g{k}") for k in (0, 1, 2, 3)] + [(None, "g_null")]
    dim = d.sparkSession.createDataFrame(dim_rows, schema="k long, grp string")
    return probe.join(F.broadcast(dim), probe.k.eqNullSafe(dim.k)).select(
        "doc_id", probe.k.alias("k"), "grp"
    )


@register(
    "tpch_q11",
    oracle="""
        WITH supply_value AS (
            SELECT l.l_partkey,
                   CAST(sum(CAST(round(l.l_extendedprice * 100.0, 0)
                        AS BIGINT)) AS BIGINT) AS value_cents
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_2'
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, value_cents
        FROM supply_value
        WHERE value_cents > (
            SELECT CAST(sum(value_cents) AS DOUBLE) * 0.001
            FROM supply_value
        )
        ORDER BY value_cents DESC, l_partkey
    """,
    doc="TPC-H Q11 (important stock identification), adapted: per-part "
    "supply value from NATION_2's suppliers (lineitem-derived — no "
    "partsupp), keeping parts above 0.1% of the national total. The "
    "HAVING-against-global-fraction is a second aggregate over the "
    "ALREADY-AGGREGATED per-part frame, broadcast back as a scalar — the "
    "fact table is scanned once, the concentration threshold costs one "
    "tiny job. Exact cents make the > threshold comparison stable.",
    tags=("tpch", "agg", "subquery"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_2"
    )
    supply_value = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")
            ).alias("value_cents")
        )
    )
    thresh = supply_value.agg(
        (F.sum("value_cents").cast("double") * F.lit(0.001)).alias("cut")
    )
    return (
        supply_value.join(
            F.broadcast(thresh), F.col("value_cents") > F.col("cut")
        )
        .select("l_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), F.col("l_partkey"))
    )
