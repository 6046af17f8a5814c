"""Set-operation plans (SURVEY.md §2 Part B "Set ops").

Grounding: the reference generalizes from one station to many by listing
model specs (estimate_queue.py:24-28) — union of per-station streams; the
intersect/except pair is the driver-mandated completion of the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "set_union",
    oracle="""
        SELECT c_nationkey AS nationkey, 'customer' AS side
        FROM customer
        UNION
        SELECT s_nationkey AS nationkey, 'supplier' AS side
        FROM supplier
    """,
    doc="UNION (distinct) of customer- and supplier-side nation keys, tagged "
    "by origin; unionByName + distinct.",
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s).distinct()


@register(
    "set_union_all",
    oracle="""
        SELECT o_custkey AS custkey, round(o_totalprice, 2) AS amount
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_custkey AS custkey, round(o_totalprice, 2) AS amount
        FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="UNION ALL preserving duplicates — concatenation of per-branch "
    "streams (the multi-station generalization).",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_o = o.where(F.col("o_orderstatus") == "O")
    closed = o.where(F.col("o_orderstatus") == "F")
    pick = lambda df: df.select(  # noqa: E731
        F.col("o_custkey").alias("custkey"),
        F.round(F.col("o_totalprice"), 2).alias("amount"),
    )
    return pick(open_o).unionByName(pick(closed))


@register(
    "set_intersect_except",
    oracle="""
        SELECT 'both' AS side, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT
          SELECT s_nationkey AS nationkey FROM supplier)
        UNION ALL
        SELECT 'customer_only' AS side, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT
          SELECT s_nationkey AS nationkey FROM supplier)
    """,
    doc="INTERSECT and EXCEPT (distinct forms) over the two nation-key sets, "
    "tagged and unioned into one result.",
    tags=("setop",),
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = c.intersect(s).select(F.lit("both").alias("side"), "nationkey")
    cust_only = c.subtract(s).select(
        F.lit("customer_only").alias("side"), "nationkey"
    )
    return both.unionByName(cust_only)
