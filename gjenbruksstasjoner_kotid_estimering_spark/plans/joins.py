"""Join plans (SURVEY.md §2 Part B "Joins").

Grounding: the reference's model-name→spec lookup (estimate_queue.py:85-88)
is an inner equi-join against a tiny dimension; Luigi's "skip if output
exists" (tasks.py:19-29) is an anti-join of inputs against produced outputs;
the interp bracket (estimate_queue.py:136-140) is a non-equi range join
(implemented in operators/asof_interp.py).

Scale posture: dimension sides (region/nation/supplier, inline bucket
tables) are explicitly ``F.broadcast()`` — at 100 TB the fact side streams
with zero shuffle. Fact-fact joins (customer⋈orders) shuffle on the key;
AQE handles skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "join_inner",
    oracle="""
        SELECT r.r_name, n.n_name,
               count(*) AS n_customers,
               CAST(sum(CAST(round(c.c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT)
                 AS sum_acctbal_cents
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    doc="Inner equi-join fact→dim→dim (broadcast both dims) + grouped agg — "
    "the reference's spec-lookup join (estimate_queue.py:85-88) at table "
    "scale. Plan: two BroadcastHashJoins, no shuffle until the final agg.",
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal") * 100.0, 0).cast("long")).alias(
                "sum_acctbal_cents"
            ),
        )
    )


@register(
    "join_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               count(o.o_orderkey) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
                 AS spent_cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    doc="Left outer join preserving customers with zero orders (count over "
    "nullable key → 0, sum → NULL). Shuffle join on c_custkey.",
    tags=("join", "outer"),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long")).alias(
                "spent_cents"
            ),
        )
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000.0)
    """,
    doc="Left semi join (EXISTS): customers having at least one big order. "
    "Projects only the left side; the probe stops at first match.",
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 100000.0
    )
    return c.join(big, big.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000.0)
    """,
    doc="Left anti join (NOT EXISTS): customers with no large order — the "
    "relational form of Luigi's output-existence skip "
    "(reference tasks.py:19-29: run only inputs whose target is absent).",
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 300000.0
    )
    return c.join(big, big.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
        SELECT r.r_name, s.s_name, s.s_acctbal
        FROM region r CROSS JOIN supplier s
    """,
    doc="Cartesian product of two tiny dimensions (5×10) — "
    "BroadcastNestedLoopJoin; never valid on two fact tables at scale.",
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return r.crossJoin(s).select("r_name", "s_name", "s_acctbal")


@register(
    "join_range",
    oracle="""
        SELECT e.event_id, e.value, b.bucket_label
        FROM events e
        JOIN (VALUES ('small', 0.0, 50.0),
                     ('medium', 50.0, 150.0),
                     ('large', 150.0, 1e9)) AS b(bucket_label, lo, hi)
          ON e.value >= b.lo AND e.value < b.hi
    """,
    doc="Non-equi range join against an inline bucket table — the general "
    "form of the interp bracket (reference estimate_queue.py:136-140). "
    "Broadcast nested-loop on a 3-row build side.",
    tags=("join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buckets = F.broadcast(
        spark.createDataFrame(
            [("small", 0.0, 50.0), ("medium", 50.0, 150.0), ("large", 150.0, 1e9)],
            schema="bucket_label string, lo double, hi double",
        )
    )
    return ev.join(
        buckets,
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    ).select("event_id", "value", "bucket_label")


@register(
    "join_full_outer",
    oracle="""
        WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                   FROM customer GROUP BY c_nationkey),
             s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
                   FROM supplier GROUP BY s_nationkey)
        SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
               c.n_cust, s.n_supp
        FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    doc="Full outer join of two pre-aggregated sides (customer vs supplier "
    "presence per nation) — rows survive from either side, NULL-filled on "
    "the other.",
    tags=("join", "outer", "full"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    joined = c.alias("c").join(
        s.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@register(
    "subquery_scalar",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               o_totalprice / (SELECT max(o_totalprice) FROM orders)
                 AS price_fraction,
               o_totalprice >= (SELECT max(o_totalprice) FROM orders) * 0.9
                 AS near_top
        FROM orders
    """,
    doc="Scalar subquery in the projection (normalize by the corpus max — "
    "max is order-insensitive-exact, unlike avg): Catalyst executes the "
    "subquery once and broadcasts the scalar.",
    tags=("join", "subquery"),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice / (SELECT max(o_totalprice) FROM _orders_sq)
                 AS price_fraction,
               o_totalprice >= (SELECT max(o_totalprice) FROM _orders_sq) * 0.9
                 AS near_top
        FROM _orders_sq
        """
    )


@register(
    "join_right_outer",
    oracle="""
        SELECT n.n_name, c.c_custkey, c.c_name
        FROM customer c
        RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc="Right outer join preserving every nation (including customer-less "
    "ones, NULL-filled left side) — completes the left/right/full outer "
    "row of SURVEY §2.",
    tags=("join", "outer", "right"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return c.join(n, c.c_nationkey == n.n_nationkey, "right").select(
        "n_name", "c_custkey", "c_name"
    )
