"""Round-7 wave 1: observe metrics, GROUP BY ALL, multiset set-ops,
exact covariance, cume_dist deciles, touch attribution, mergeSchema,
vacuum retention."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.operators import merge_tx
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced6 as a6

from conftest import SF0001


def test_observe_metrics_match_direct_aggregate(spark):
    got = a6.scan_observe_metrics(spark, SF0001).collect()
    assert len(got) == 1
    want = (
        load_table(spark, SF0001, "lineitem")
        .agg(
            F.count(F.lit(1)),
            F.sum(F.col("l_quantity").cast("long")),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")),
            F.min("l_orderkey"),
            F.max("l_orderkey"),
        )
        .collect()[0]
    )
    assert tuple(got[0]) == tuple(want)


def test_group_by_all_matches_explicit_grouping(spark):
    got = sorted(map(tuple, a6.sql_group_by_all(spark, SF0001).collect()))
    want = sorted(
        map(
            tuple,
            load_table(spark, SF0001, "lineitem")
            .groupBy(
                F.col("l_returnflag").alias("rf"),
                F.col("l_linestatus").alias("ls"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
            )
            .collect(),
        )
    )
    assert got == want


def test_intersect_except_all_multiset_identities(spark):
    """Per key: |both| = min(m, n), |a_only| = max(m - n, 0); totals
    partition the A-side multiset."""
    li = load_table(spark, SF0001, "lineitem")
    cnt_a = Counter(
        r.l_suppkey for r in li.where("l_returnflag = 'A'").collect()
    )
    cnt_r = Counter(
        r.l_suppkey for r in li.where("l_returnflag = 'R'").collect()
    )
    out = Counter(
        (r.side, r.k)
        for r in a6.set_intersect_except_all(spark, SF0001).collect()
    )
    keys = set(cnt_a) | set(cnt_r)
    for k in keys:
        m, n = cnt_a.get(k, 0), cnt_r.get(k, 0)
        assert out.get(("both", k), 0) == min(m, n)
        assert out.get(("a_only", k), 0) == max(m - n, 0)
    assert sum(v for (s, _), v in out.items() if s == "both") + sum(
        v for (s, _), v in out.items() if s == "a_only"
    ) == sum(cnt_a.values())


def test_corr_covar_numerators_match_numpy(spark):
    import numpy as np

    rows = (
        load_table(spark, SF0001, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_discount") * 10000).cast("long").alias("y"),
        )
        .collect()
    )
    got = {r.rf: r for r in a6.stat_corr_covar_exact(spark, SF0001).collect()}
    for rf in {r.l_returnflag for r in rows}:
        xs = np.array([r.x for r in rows if r.l_returnflag == rf], dtype=object)
        ys = np.array([r.y for r in rows if r.l_returnflag == rf], dtype=object)
        n = len(xs)
        g = got[rf]
        assert g.n == n
        assert g.covar_num == n * int((xs * ys).sum()) - int(xs.sum()) * int(
            ys.sum()
        )
        assert g.var_x_num == n * int((xs * xs).sum()) - int(xs.sum()) ** 2
        assert g.var_y_num == n * int((ys * ys).sum()) - int(ys.sum()) ** 2
        assert g.var_x_num >= 0 and g.var_y_num >= 0  # Cauchy-Schwarz


def test_cume_dist_deciles_cover_every_customer(spark):
    out = a6.window_cume_dist_deciles(spark, SF0001).collect()
    per_nation = Counter()
    for r in out:
        assert 1 <= r.decile <= 10
        per_nation[r.nationkey] += r.n_customers
    want = {
        r.c_nationkey: r.n
        for r in load_table(spark, SF0001, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert dict(per_nation) == want
    # the top decile is never empty: cume_dist of the max row is 1.0
    tops = {r.nationkey for r in out if r.decile == 10}
    assert tops == set(want)


def test_attribution_matches_per_user_brute_force(spark):
    ev = sorted(
        load_table(spark, SF0001, "events")
        .where(F.col("event_type").isin("click", "view", "purchase"))
        .collect(),
        key=lambda r: (r.user_id, r.ts),
    )
    want = {}
    prior: dict[int, list] = {}
    for r in ev:
        touches = prior.setdefault(r.user_id, [])
        if r.event_type == "purchase":
            want[r.event_id] = (
                touches[0].event_type if touches else None,
                touches[-1].event_type if touches else None,
                len(touches),
            )
        else:
            touches.append(r)
    got = {
        r.event_id: (r.first_touch_type, r.last_touch_type, r.n_prior_touches)
        for r in a6.events_attribution_touch(spark, SF0001).collect()
    }
    assert got == want


def test_merge_schema_null_channel_is_the_old_generation(spark):
    out = {
        r.channel: (r.n_orders, r.cents_sum)
        for r in a6.scan_parquet_merge_schema(spark, SF0001).collect()
    }
    orders = load_table(spark, SF0001, "orders")
    n_open = orders.where("o_orderstatus = 'O'").count()
    assert out[None][0] == n_open
    assert set(out) == {None, "web", "store"}


def test_vacuum_preserves_retained_versions_exactly(spark):
    """v2/v3 summaries after vacuum equal the untouched cached fixture's
    time-travel summaries; v1 is the enforced-failure sentinel."""
    got = {
        r.version: tuple(r)[1:]
        for r in merge_tx.merge_tx_vacuum_retention(spark, SF0001).collect()
    }
    want = {
        r.version: tuple(r)[1:]
        for r in merge_tx.merge_tx_time_travel(spark, SF0001).collect()
    }
    assert got[1] == (-1, -1, -1)
    assert got[2] == want[2]
    assert got[3] == want[3]
