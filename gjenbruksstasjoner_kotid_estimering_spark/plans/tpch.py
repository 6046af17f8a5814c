"""Canonical TPC-H query shapes over the driver's TPC-H-ish corpus.

agg_basic already carries the Q1 shape; these add the classic multi-join
plans — shipping-priority (Q3), regional-revenue 6-way join (Q5), and the
forecast filter-sum (Q6) — adapted to this corpus's columns/date ranges.
Revenue sums use the cents-exact pattern (plans/aggregates.py) so the
oracle hash can never drift under parallel summation.

Plan notes: Q3/Q5 broadcast every dimension side under the 64 MB
threshold; the lineitem⋈orders fact join shuffles on the key and AQE
handles skew. Q6 is a pure pushed-down scan-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def _rev_cents(price, discount):
    return F.round(price * (F.lit(1.0) - discount) * 100.0, 0).cast("long")


@register(
    "tpch_q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount))
                    * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               CAST(sum(CAST(round(((l_extendedprice * (1.0 - l_discount))
                    * (1.0 + l_tax)) * 100.0, 0) AS BIGINT)) AS BIGINT)
                    AS sum_charge_cents,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                    / count(*) AS avg_qty,
               CAST(sum(CAST(round(l_discount * 100.0, 0) AS BIGINT))
                    AS DOUBLE) / (100.0 * count(*)) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-06-30 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 (pricing summary report): the canonical scan-and-"
    "aggregate — one pushed-down date filter, partial+final hash agg onto "
    "~6 groups, zero joins. Sums use exact integer/cents arithmetic; "
    "averages derive from the exact sums by one double division so the "
    "hash can never drift under parallel summation. Reference analog: the "
    "per-batch summary posture of estimate_queue.py:181-192 generalized "
    "to a full-corpus rollup.",
    tags=("tpch", "agg", "filter"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    sum_qty = F.sum(F.col("l_quantity").cast("long"))
    sum_disc100 = F.sum(F.round(F.col("l_discount") * 100.0, 0).cast("long"))
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.where(
            F.col("l_shipdate") <= F.lit("1998-06-30 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")).alias(
                "sum_base_cents"
            ),
            F.sum(F.round(disc_price * 100.0, 0).cast("long")).alias(
                "sum_disc_cents"
            ),
            F.sum(F.round(charge * 100.0, 0).cast("long")).alias(
                "sum_charge_cents"
            ),
            (sum_qty.cast("double") / cnt).alias("avg_qty"),
            (sum_disc100.cast("double") / (F.lit(100.0) * cnt)).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q18",
    oracle="""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS BIGINT)) > 300
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, b.total_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18 (large-volume customers): lineitem pre-aggregated per "
    "order (the one big shuffle), HAVING keeps a tiny survivor set that is "
    "then BROADCAST into orders and customer — at 100 TB the fact table "
    "shuffles exactly once and no fact-fact join ever materializes. "
    "Deterministic top-100 via (o_totalprice DESC, o_orderkey) tie-break.",
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q3",
    oracle="""
        SELECT l.l_orderkey,
               CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                    * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 (shipping priority): segment-filtered customer ⋈ orders "
    "⋈ lineitem, grouped revenue, top-10 — two joins, one agg shuffle, "
    "TakeOrdered finish.",
    tags=("tpch", "join", "agg"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-06-30 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _rev_cents(F.col("l_extendedprice"), F.col("l_discount"))
            ).alias("revenue_cents")
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue_cents").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle="""
        SELECT n.n_name,
               CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                    * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5 (local-supplier volume): the classic 6-table join — "
    "region-filtered nations broadcast down the chain, fact-fact join on "
    "orderkey, revenue per nation.",
    tags=("tpch", "join", "agg"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _rev_cents(F.col("l_extendedprice"), F.col("l_discount"))
            ).alias("revenue_cents")
        )
    )


@register(
    "tpch_q6",
    oracle="""
        SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0, 0)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24.0
    """,
    doc="TPC-H Q6 (forecast revenue change): pure filter-and-sum — every "
    "predicate pushed to the parquet scan, single partial+final aggregate, "
    "no join, no wide shuffle.",
    tags=("tpch", "agg", "filter"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * F.col("l_discount") * 100.0, 0
                ).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
