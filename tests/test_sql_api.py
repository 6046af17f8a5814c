"""SQL-API completeness: the oracle SQL strings are written in the
ANSI-portable dialect subset, so a user can run them UNCHANGED on this
engine via ``spark.sql`` over the registered table views — and get
row-identical results to the DataFrame builders.

This is the "switch without rewriting your queries" guarantee: every
TPC-H shape plus the core relational/window/setop surface executes as
plain SQL text on Spark (74 of the 125 oracles; the rest use
DuckDB-only list/JSON dialect and exist purely as cross-engine checks).
"""

from __future__ import annotations

import pytest

from gjenbruksstasjoner_kotid_estimering_spark import registry
from gjenbruksstasjoner_kotid_estimering_spark.io import register_views

SF = "/root/testdata/sf0.001"

# every name here was verified portable; the test fails loudly if an
# oracle edit breaks Spark-SQL compatibility
PORTABLE = [
    "agg_basic", "agg_bitwise", "agg_cube", "agg_distinct", "agg_filtered",
    "agg_grouping_sets", "agg_histogram", "agg_median_mode", "agg_rollup",
    "agg_salted_skew", "agg_stats_exact", "case_when_threshold",
    "conditional_projection", "date_trunc_agg", "decimal_cast",
    "dedup_exact", "dedup_time_bounded", "derived_arithmetic",
    "filter_predicates", "join_anti", "join_cross", "join_full_outer",
    "join_inner", "join_lateral", "join_outer", "join_range",
    "join_right_outer", "join_salted_skew", "join_semi", "range_filter",
    "scalar_math_projection", "scan_limit1", "scan_project",
    "scd2_intervals", "set_intersect_except", "set_union", "set_union_all",
    "sort_multi", "struct_map_funcs", "subquery_correlated_scalar",
    "subquery_exists", "subquery_scalar", "text_lang_agg", "topk_per_group",
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22", "unpivot_melt",
    "upsert_last_write_wins", "window_first_last_nth", "window_frame_agg",
    "window_lag_lead", "window_ntile", "window_percent_rank", "window_rank",
]


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF)
    return spark


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(repr(row[c]) for c in cols) for row in df.collect()
    )


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_matches_dataframe_builder(views, name):
    spec = registry.all_specs()[name]
    via_sql = _canon(views.sql(spec.oracle))
    via_df = _canon(spec.builder(views, SF))
    assert via_sql == via_df, name


def test_pandas_api_compiles_to_relational_plan(spark):
    """The pandas-idiom pipeline must compile to the same plan class as
    the DSL: broadcast dim join, partial aggregation, and — the scale
    claim — NO positional-index machinery (no zipWithIndex scan, no
    window over the whole table) anywhere in the plan."""
    from gjenbruksstasjoner_kotid_estimering_spark.plans import pandas_api

    from conftest import SF0001

    df = pandas_api.pandas_api_pipeline(spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "monotonically_increasing_id" not in plan
    assert "row_number" not in plan
    got = {r.priority: (r.n_items, r.qty_sum, r.price_cents) for r in df.collect()}
    from pyspark.sql import functions as F

    from gjenbruksstasjoner_kotid_estimering_spark.io import load_table

    li = load_table(spark, SF0001, "lineitem").where("l_quantity >= 10")
    o = load_table(spark, SF0001, "orders")
    want = {
        r.priority: (r.n_items, r.qty_sum, r.price_cents)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "price_cents"
            ),
        )
        .collect()
    }
    assert got == want
