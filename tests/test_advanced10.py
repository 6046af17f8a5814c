"""Round-8 wave A: SQL scripting, EXECUTE IMMEDIATE, lateral column
aliases, ordered listagg, DataFrame.transpose, join strategy hints, and
the composable count-min sketch."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced10 as a10

from conftest import SF0001


def test_scripting_block_matches_closed_form(spark):
    row = a10.sql_scripting_block(spark, SF0001).collect()[0]
    n = load_table(spark, SF0001, "orders").count()
    steps = math.ceil(math.log2(n))
    assert row.n_orders == n
    assert row.doubling_steps == steps
    assert row.pow2_ceiling == 2**steps
    assert row.pow2_ceiling >= n > row.pow2_ceiling // 2


def test_execute_immediate_binds_parameters_and_drops_state(spark):
    rows = a10.sql_execute_immediate(spark, SF0001).collect()
    # 5 TPC-H priorities survive the cutoff+status filter at sf0.001
    assert {r.o_orderpriority for r in rows} == {
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    }
    # the statement variable and view were dropped in the finally — a
    # second invocation re-declares cleanly instead of tripping over a
    # leaked variable or temp view from the first
    again = a10.sql_execute_immediate(spark, SF0001).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_lateral_alias_chain_spot_row(spark):
    out = a10.sql_lateral_column_alias(spark, SF0001)
    probe = out.orderBy("l_orderkey", "l_linenumber").first()
    src = (
        load_table(spark, SF0001, "lineitem")
        .where(F.col("l_quantity") >= 25)
        .orderBy("l_orderkey", "l_linenumber")
        .first()
    )
    gross = round(src.l_extendedprice * (1 - src.l_discount) * 100)
    taxed = round((gross / 100.0) * (1 + src.l_tax) * 100)
    assert probe.gross_cents == gross
    assert probe.taxed_cents == taxed


def test_listagg_orders_within_group(spark):
    rows = {
        r.r_name: r.nations
        for r in a10.agg_listagg_ordered(spark, SF0001).collect()
    }
    assert len(rows) == 5
    for nations in rows.values():
        parts = nations.split(",")
        assert parts == sorted(parts)  # WITHIN GROUP order is real
    # every nation appears exactly once across the five region strings
    n_nation = load_table(spark, SF0001, "nation").count()
    all_parts = [p for v in rows.values() for p in v.split(",")]
    assert len(all_parts) == len(set(all_parts)) == n_nation


def test_transpose_flips_metrics_to_rows(spark):
    out = a10.agg_transpose_matrix(spark, SF0001)
    assert "key" in out.columns
    regions = {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}
    assert regions <= set(out.columns)
    by_key = {r.key: r for r in out.collect()}
    assert set(by_key) == {"acctbal_cents", "n_customers"}
    # transpose preserves the cell values of the un-flipped aggregate
    n_total = sum(by_key["n_customers"][r] for r in regions)
    assert n_total == load_table(spark, SF0001, "customer").count()


def test_strategy_hints_produce_their_physical_operators(spark):
    wanted = {
        "BROADCAST": "BroadcastHashJoin",
        "SHUFFLE_HASH": "ShuffledHashJoin",
        "MERGE": "SortMergeJoin",
    }
    for hint, op in wanted.items():
        plan = a10.strategy_hint_plan(spark, SF0001, hint)
        assert op in plan, f"{hint} hint did not produce {op}"


def test_strategy_hints_value_identical_across_strategies(spark):
    out = a10.join_strategy_hints(spark, SF0001).collect()
    by_strategy: dict[str, dict[str, tuple]] = {}
    for r in out:
        by_strategy.setdefault(r.strategy, {})[r.c_mktsegment] = (
            r.n_orders,
            r.total_cents,
        )
    assert len(by_strategy) == 3
    vals = list(by_strategy.values())
    assert vals[0] == vals[1] == vals[2]


def test_count_min_sketch_never_underestimates(spark):
    out = a10.agg_count_min_sketch(spark, SF0001)
    rows = out.collect()
    assert all(r.cms_overestimates for r in rows)
    # the sketch rows partition the key mass: exact counts total |orders|
    assert sum(r.exact_n for r in rows) == load_table(
        spark, SF0001, "orders"
    ).count()
    # width 2048 >> distinct keys at test scale: collisions are rare, so
    # the estimate equals the exact count for the vast majority of keys —
    # a (loose) accuracy bound on top of the overestimate guarantee
    assert len(rows) <= a10.CMS_WIDTH
