"""The pandas API on Spark — the engine's third query surface.

SQL (spark.sql / pipe syntax / variables) and the DataFrame DSL are
covered throughout the registry; this module covers `pyspark.pandas`:
pandas syntax compiled to the SAME Catalyst plans, which is how a
pandas-fluent team runs its existing idioms on 100 TB without a
rewrite. The registry row keeps the pandas-side work inside operations
that compile to relational plans (filter, groupby-agg, merge, sort) —
the pandas features that do NOT scale (default positional index,
row-order-dependent ops) are exactly the ones avoided, and the doc
says so, because knowing the safe subset IS the production skill.
Grounding: the reference itself is pandas/numpy-shaped single-node
code (estimate_queue.py) — this surface is its most direct migration
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table_path
from ..registry import register


@register(
    "pandas_api_pipeline",
    oracle="""
        SELECT o.o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 10
        GROUP BY o.o_orderpriority
    """,
    doc="pandas API on Spark end-to-end: read_parquet -> boolean-mask "
    "filter -> merge (join) -> assign -> groupby().agg(), written in "
    "pandas idiom and compiled by Catalyst into the same "
    "filter/join/aggregate plan the DSL produces (broadcast dim join "
    "and partial aggregation included — pandas syntax does not cost "
    "the optimizer anything). index_col is pinned on read and the "
    "pipeline stays inside the relationally-compilable subset: no "
    "default positional index (a zipWithIndex scan at 100 TB), no "
    "row-order dependence. The bridge back is to_spark(); the oracle "
    "restates the pipeline in SQL, so the hash gate proves the pandas "
    "surface computes exactly the relational answer.",
    tags=("api", "pandas", "join", "agg"),
)
def pandas_api_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import warnings

    with warnings.catch_warnings():
        # the advice warnings are for defaults this code deliberately
        # avoids (index_col IS specified)
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        li = ps.read_parquet(
            table_path(sf_dir, "lineitem"), index_col="l_orderkey"
        ).reset_index()
        orders = ps.read_parquet(
            table_path(sf_dir, "orders"), index_col="o_orderkey"
        ).reset_index()
        li = li[li["l_quantity"] >= 10]
        li = li.assign(
            price_cents=(li["l_extendedprice"] * 100).round().astype("int64"),
            qty=li["l_quantity"].astype("int64"),
        )
        joined = li.merge(
            orders[["o_orderkey", "o_orderpriority"]],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        agg = joined.groupby("o_orderpriority").agg(
            n_items=("l_linenumber", "count"),
            qty_sum=("qty", "sum"),
            price_cents=("price_cents", "sum"),
        )
        out = agg.reset_index().to_spark()
    return out.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("n_items").cast("long"),
        "qty_sum",
        "price_cents",
    )
