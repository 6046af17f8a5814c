"""Round-7 driver-round additions, wave 5: dynamic partition overwrite,
interval merging, and the Arrow-optimized scalar Python UDF.

Grounding: the reference's sink is an idempotent daily upsert
(tasks.py:32-41 memoizes on date; estimate_queue.py:166-178 overwrites
per key) — dynamic partition overwrite is that contract at
batch-pipeline granularity: re-running a day replaces exactly that
day's partitions and nothing else. Interval merging is the temporal
normalization every validity-window table needs (SCD cleanup, session
stitching). The Arrow-optimized scalar UDF is the remaining Python UDF
surface (beyond pandas UDF / UDAF / UDTF): row API, Arrow transport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir


# --- dynamic partition overwrite ------------------------------------------


@register(
    "sink_dynamic_partition_overwrite",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 2 * CAST(round(value * 100) AS BIGINT)
                             ELSE CAST(round(value * 100) AS BIGINT) END)
                    AS BIGINT) AS value_cents
        FROM events
        GROUP BY event_type
    """,
    doc="Dynamic partition overwrite — the idempotent-rerun sink "
    "contract: events land partitioned by event_type (5 partitions); "
    "a corrected batch containing ONLY recomputed purchase rows "
    "(cents doubled) is written with mode=overwrite + "
    "partitionOverwriteMode=dynamic, which replaces exactly the "
    "partitions PRESENT IN THE BATCH and leaves the other four "
    "untouched (static overwrite would truncate the whole table — "
    "the classic data-loss footgun this mode exists to close). The "
    "read-back per-type aggregate must show doubled purchase cents "
    "and bit-intact everything else, which the oracle recomputes "
    "relationally. This is how a 100 TB daily pipeline re-runs one "
    "bad day: rewrite day=X, never touch the other 3650 partitions.",
    tags=("sink", "partitioning", "overwrite", "scale"),
)
def sink_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scratch = new_scratch_dir("dyn_overwrite")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    table = f"{scratch}/table"
    ev.write.partitionBy("event_type").parquet(table)
    corrected = ev.where(F.col("event_type") == "purchase").withColumn(
        "cents", F.col("cents") * 2
    )
    (
        corrected.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(table)
    )
    out = (
        spark.read.parquet(table)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
    )
    return detach_result(out, scratch)


# --- merge overlapping intervals -------------------------------------------

IVL = "10 minutes"  # each event opens a 10-minute validity window


@register(
    "timeseries_merge_intervals",
    oracle="""
        WITH iv AS (
          SELECT user_id, ts, ts + INTERVAL 10 MINUTE AS te FROM events
        ), marked AS (
          SELECT user_id, ts, te,
                 CASE WHEN max(te) OVER w IS NULL
                           OR ts > max(te) OVER w
                      THEN 1 ELSE 0 END AS new_island
          FROM iv
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ), isl AS (
          SELECT user_id, ts, te,
                 sum(new_island) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island
          FROM marked
        )
        SELECT user_id, CAST(island AS BIGINT) AS island,
               min(ts) AS span_start, max(te) AS span_end,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(epoch_us(max(te)) - epoch_us(min(ts)) AS BIGINT)
                   AS span_us
        FROM isl
        GROUP BY user_id, island
    """,
    doc="Merge overlapping validity intervals per key (each event opens "
    "a 10-minute window; touching/overlapping windows coalesce into "
    "one span): the running max of interval-ends over STRICTLY "
    "PRECEDING rows marks island starts, a prefix sum numbers the "
    "islands, one aggregate emits (start, end, count, exact µs "
    "span). Two keyed window passes + one aggregate — all on the "
    "same user_id partitioning, so Spark plans ONE exchange for the "
    "whole pipeline. The temporal-normalization primitive behind SCD "
    "cleanup and session stitching; deterministic because event "
    "timestamps are µs-unique per fixture.",
    tags=("timeseries", "window", "intervals"),
)
def timeseries_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        (F.col("ts") + F.expr(f"INTERVAL {IVL}")).alias("te"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max("te").over(w_prev)
    marked = iv.select(
        "user_id",
        "ts",
        "te",
        F.when(
            prev_end.isNull() | (F.col("ts") > prev_end), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = marked.select(
        "user_id",
        "ts",
        "te",
        F.sum("new_island").over(w_run).alias("island"),
    )
    return isl.groupBy("user_id", "island").agg(
        F.min("ts").alias("span_start"),
        F.max("te").alias("span_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("te")) - F.unix_micros(F.min("ts"))).alias(
            "span_us"
        ),
    )


# --- Arrow-optimized scalar Python UDF --------------------------------------


@register(
    "udf_arrow_scalar",
    oracle="""
        SELECT norm_name,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM (
          SELECT regexp_replace(trim(lower(p_name)), ' +', '_', 'g')
                     AS norm_name
          FROM part
        )
        GROUP BY norm_name
    """,
    doc="Arrow-optimized scalar Python UDF (Spark 4 useArrow=True): the "
    "row-at-a-time udf() API with Arrow-batch transport instead of "
    "pickled rows — the migration path for legacy per-row UDFs that "
    "cannot be rewritten as pandas UDFs but should stop paying "
    "serialization tax. The UDF canonicalizes part names (lower, "
    "trim, whitespace->underscore); the oracle replays it in SQL, so "
    "the hash gate proves the Python and relational forms agree on "
    "every row. Registry-wide rule stays intact: this is a DECLARED "
    "Python boundary on a dimension-sized table, not a hot-path "
    "fact-table UDF.",
    tags=("udf", "arrow", "python"),
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    @F.udf(returnType=StringType(), useArrow=True)
    def norm_name(s: str) -> str:
        return re.sub(r" +", "_", s.strip().lower())

    parts = load_table(spark, sf_dir, "part")
    return (
        parts.select(norm_name(F.col("p_name")).alias("norm_name"))
        .groupBy("norm_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# --- modern selective aggregates: max_by / min_by ---------------------------


@register(
    "agg_max_by_min_by",
    oracle="""
        SELECT c_nationkey AS nationkey,
               CAST(max_by(c_custkey, ord) AS BIGINT) AS richest_custkey,
               CAST(min_by(c_custkey, ord) AS BIGINT) AS poorest_custkey,
               CAST(max(cents) AS BIGINT) AS max_cents,
               CAST(min(cents) AS BIGINT) AS min_cents
        FROM (
          SELECT c_nationkey, c_custkey,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
                 CAST(round(c_acctbal * 100) AS BIGINT) * 100000
                     + c_custkey AS ord
          FROM customer
        )
        GROUP BY c_nationkey
    """,
    doc="max_by/min_by (SQL:2023 ANY_VALUE-family selective aggregates): "
    "the argmax/argmin that replaces the rank-then-filter window "
    "pattern with ONE map-side-combinable aggregate — no sort, no "
    "window exchange, which at 100 TB is the difference between a "
    "partial-aggregating scan and a full shuffle+sort. Ties broken "
    "DETERMINISTICALLY by ordering on cents*100000+custkey — bare "
    "max_by on a tied value is engine-arbitrary (the any_value "
    "nondeterminism class), and DuckDB's max_by rejects STRUCT "
    "ordering values, so the portable tiebreak is the composite "
    "integer (custkey < 100000 at every tested sf; widen the factor "
    "with the key space).",
    tags=("agg", "selective"),
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    key = F.col("cents") * 100000 + F.col("c_custkey")
    return c.groupBy("nationkey").agg(
        F.max_by("c_custkey", key).alias("richest_custkey"),
        F.min_by("c_custkey", key).alias("poorest_custkey"),
        F.max("cents").alias("max_cents"),
        F.min("cents").alias("min_cents"),
    )


# --- exact re-aggregatable distinct via bitmap words ------------------------


@register(
    "agg_bitmap_distinct_rollup",
    oracle="""
        WITH words AS (
          SELECT CAST(date_trunc('day', ts) AS VARCHAR) AS day,
                 strftime(ts, '%Y-%m') AS month,
                 user_id // 32 AS word_idx,
                 bit_or(1::BIGINT << CAST(user_id % 32 AS INTEGER)) AS word
          FROM events
          GROUP BY 1, 2, 3
        )
        SELECT 'day' AS level, day AS bucket,
               CAST(sum(bit_count(word)) AS BIGINT) AS n_users
        FROM words GROUP BY day
        UNION ALL
        SELECT 'month', month,
               CAST(sum(bit_count(word)) AS BIGINT)
        FROM (
          SELECT month, word_idx, bit_or(word) AS word
          FROM words GROUP BY month, word_idx
        ) GROUP BY month
    """,
    doc="EXACT distinct-user rollup via bitmap words — the re-"
    "aggregatable exact-distinct pattern (ClickHouse/Doris bitmap "
    "aggregates, Roaring's dense case): users land as set bits in "
    "32-bit-populated words keyed by user_id//32 (shift stays under "
    "the signed-overflow guard DuckDB enforces at 1<<63), daily distinct = popcount "
    "sum, and the MONTHLY level is computed by bit_or-MERGING the "
    "daily words — never re-scanning the fact table, which is the "
    "whole point: count(DISTINCT) partials are not mergeable, bitmap "
    "partials are. At 100 TB the words relation is bounded by "
    "(groups x keyspace/64), each coarser rollup level costs one "
    "word-sized shuffle, and the counts stay EXACT where HLL would "
    "approximate. The oracle replays the identical word math in "
    "DuckDB, and both levels must hash-match the true distincts.",
    tags=("agg", "distinct", "bitmap", "rollup", "scale"),
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        (F.col("user_id") / 32).cast("long").alias("word_idx"),
        # F.shiftleft only takes a LITERAL bit count; the SQL form
        # accepts a column
        F.expr("shiftleft(1L, CAST(user_id % 32 AS INT))").alias("bit"),
    )
    words = ev.groupBy("day", "month", "word_idx").agg(
        F.bit_or("bit").alias("word")
    )
    daily = words.groupBy("day").agg(
        F.sum(F.bit_count("word")).alias("n_users")
    ).select(F.lit("day").alias("level"), F.col("day").alias("bucket"), "n_users")
    monthly_words = words.groupBy("month", "word_idx").agg(
        F.bit_or("word").alias("word")
    )
    monthly = monthly_words.groupBy("month").agg(
        F.sum(F.bit_count("word")).alias("n_users")
    ).select(
        F.lit("month").alias("level"), F.col("month").alias("bucket"), "n_users"
    )
    return daily.unionAll(monthly)
