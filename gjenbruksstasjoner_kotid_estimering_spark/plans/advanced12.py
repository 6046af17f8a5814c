"""Round-8 wave E — SQL-semantics and timezone correctness rows.

Grounding: the reference's one timezone operation (estimate_queue.py:
31-61 parses filename timestamps as Europe/Oslo wall time) is the
classic place pipelines silently corrupt event times; ``date_tz_convert``
states the UTC→Oslo phase shift as an oracle-checked contract.
``subquery_not_in_null_semantics`` pins SQL's least-intuitive rule —
three-valued NOT IN — side by side with the rewrites that behave the way
people expect, because an engine swap (the whole premise of this repo)
is exactly when such semantics bugs bite.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# --- NOT IN vs NOT EXISTS under NULL ---------------------------------------


@register(
    "subquery_not_in_null_semantics",
    oracle="""
        WITH neg AS (
          SELECT c_custkey FROM customer WHERE c_acctbal < 0
        )
        SELECT 'not_in_clean' AS variant,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM neg)
        UNION ALL
        SELECT 'not_in_with_null',
               CAST(count(*) AS BIGINT)
        FROM orders
        WHERE o_custkey NOT IN
              (SELECT c_custkey FROM neg
               UNION ALL SELECT CAST(NULL AS BIGINT))
        UNION ALL
        SELECT 'not_exists',
               CAST(count(*) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM neg WHERE neg.c_custkey =
                          o.o_custkey)
        UNION ALL
        SELECT 'anti_join',
               CAST(count(*) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM neg WHERE neg.c_custkey =
                          o.o_custkey)
    """,
    doc="Three-valued NOT IN, pinned: the same exclusion computed four "
    "ways — NOT IN against a clean subquery (normal result), NOT IN "
    "against the SAME subquery with one NULL added (SQL's answer is "
    "ZERO rows: x NOT IN (s, NULL) can never evaluate TRUE), NOT "
    "EXISTS (null-safe, matches the clean count), and a left-anti "
    "join (the DataFrame rewrite, identical to NOT EXISTS). Both "
    "engines must agree on all four counts — including the "
    "0-row trap — for the hash to match, which makes this row a "
    "cross-engine semantics contract, not just a query. The "
    "anti-join variant is the plan a 100 TB exclusion should use "
    "(null-aware anti join only when the NULL case is actually "
    "possible).",
    tags=("subquery", "semantics", "null", "join"),
)
def subquery_not_in_null_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    vo = f"orders_nin_{uuid.uuid4().hex[:8]}"
    vc = f"customer_nin_{uuid.uuid4().hex[:8]}"
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    orders.createOrReplaceTempView(vo)
    customer.createOrReplaceTempView(vc)
    try:
        sql_counts = spark.sql(f"""
            WITH neg AS (
              SELECT c_custkey FROM {vc} WHERE c_acctbal < 0
            )
            SELECT 'not_in_clean' AS variant,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM {vo}
            WHERE o_custkey NOT IN (SELECT c_custkey FROM neg)
            UNION ALL
            SELECT 'not_in_with_null',
                   CAST(count(*) AS BIGINT)
            FROM {vo}
            WHERE o_custkey NOT IN
                  (SELECT c_custkey FROM neg
                   UNION ALL SELECT CAST(NULL AS BIGINT))
            UNION ALL
            SELECT 'not_exists',
                   CAST(count(*) AS BIGINT)
            FROM {vo} o
            WHERE NOT EXISTS (SELECT 1 FROM neg
                              WHERE neg.c_custkey = o.o_custkey)
        """)
        neg = customer.where(F.col("c_acctbal") < 0).select(
            F.col("c_custkey").alias("o_custkey")
        )
        anti = (
            orders.join(neg, "o_custkey", "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
            .select(F.lit("anti_join").alias("variant"), "n_orders")
        )
        return sql_counts.unionByName(anti).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(vo)
        spark.catalog.dropTempView(vc)


# --- timezone conversion ---------------------------------------------------


@register(
    "date_tz_convert",
    oracle="""
        SELECT CAST(hour(ts) AS BIGINT) AS hour_utc,
               CAST(hour(ts + INTERVAL 1 HOUR) AS BIGINT) AS hour_oslo,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT CAST(ts + INTERVAL 1 HOUR AS DATE))
                    AS BIGINT) AS n_local_days
        FROM events
        GROUP BY 1, 2
    """,
    doc="UTC → Europe/Oslo conversion via the real tz database "
    "(from_utc_timestamp), aggregated as an hour-of-day phase table: "
    "every UTC hour maps to exactly one Oslo hour and the oracle "
    "states the shift as a fixed +1 (the events fixture is January "
    "2024 — all CET, no DST transition in range, which is what makes "
    "the constant-offset oracle exact; a summer fixture would need "
    "+2). n_local_days catches the midnight-rollover class: events "
    "late in the UTC day land on the NEXT Oslo calendar day. This is "
    "the reference's Europe/Oslo wall-time contract "
    "(estimate_queue.py:31-61) applied to the event stream.",
    tags=("date", "timezone", "semantics"),
)
def date_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    local = F.from_utc_timestamp(F.col("ts"), "Europe/Oslo")
    return (
        ev.select(
            F.hour("ts").cast("long").alias("hour_utc"),
            F.hour(local).cast("long").alias("hour_oslo"),
            local.cast("date").alias("local_day"),
        )
        .groupBy("hour_utc", "hour_oslo")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("local_day").alias("n_local_days"),
        )
    )
