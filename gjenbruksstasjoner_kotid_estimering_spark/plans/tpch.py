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
