"""Semantics for the event-analytics operators (funnel, retention,
transition matrix, rollup cascade). Oracle parity runs in
test_correctness.py; here the right answers are known by construction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans.analytics import (
    events_funnel,
    events_retention_cohorts,
    events_transition_matrix,
    timeseries_rollup_cascade,
)

SF = "/root/testdata/sf0.001"

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, schema=EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_funnel_ordering_is_strict(spark, tmp_path):
    rows = [
        # user 1: full ordered funnel view(1) -> click(2) -> purchase(3)
        (1, _ts(1), 1, "view", 0.0, "{}"),
        (2, _ts(2), 1, "click", 0.0, "{}"),
        (3, _ts(3), 1, "purchase", 0.0, "{}"),
        # user 2: click BEFORE first view -> stops at view step
        (4, _ts(1), 2, "click", 0.0, "{}"),
        (5, _ts(2), 2, "view", 0.0, "{}"),
        # user 3: view then purchase but never click -> stops at view
        (6, _ts(1), 3, "view", 0.0, "{}"),
        (7, _ts(2), 3, "purchase", 0.0, "{}"),
        # user 4: no view at all
        (8, _ts(1), 4, "error", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = events_funnel(spark, sf).collect()[0]
    assert (r.n_users, r.n_view, r.n_view_click, r.n_full_funnel) == (4, 3, 1, 1)
    assert r.sum_us_view_to_click == 60 * 1_000_000  # user 1: 1 minute
    assert r.sum_us_view_to_purchase == 120 * 1_000_000


def test_funnel_counts_are_monotone(spark):
    r = events_funnel(spark, SF).collect()[0]
    assert r.n_users >= r.n_view >= r.n_view_click >= r.n_full_funnel >= 0


def test_retention_day_zero_equals_cohort_size(spark):
    """Every user is active on their own first day, so the offset-0 cells
    partition the user base: Σ n_active(offset=0) == n_users."""
    out = events_retention_cohorts(spark, SF)
    day0 = (
        out.where(F.col("day_offset") == 0).agg(F.sum("n_active")).collect()[0][0]
    )
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert day0 == n_users
    assert out.where(F.col("day_offset") < 0).count() == 0


def test_transition_matrix_probabilities(spark):
    rows = events_transition_matrix(spark, SF).collect()
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    ev = load_table(spark, SF, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every user's chain of k events yields k-1 transitions
    assert sum(r.n for r in rows) == n_events - n_users
    for rs in by_from.values():
        assert abs(sum(r.p for r in rs) - 1.0) < 1e-9
        assert all(r.p > 0 for r in rs)


def test_rollup_cascade_is_consistent(spark):
    out = timeseries_rollup_cascade(spark, SF).collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r.granularity, []).append(r)
    assert set(by_g) == {"hour", "day", "month"}
    # each level re-aggregates the finer one losslessly
    for fine, coarse in (("hour", "day"), ("day", "month")):
        assert sum(r.n for r in by_g[fine]) == sum(r.n for r in by_g[coarse])
        assert sum(r.value_cents for r in by_g[fine]) == sum(
            r.value_cents for r in by_g[coarse]
        )
    assert len(by_g["hour"]) >= len(by_g["day"]) >= len(by_g["month"])


def test_audio_stats_linear_form_matches_bytes(spark, tmp_path):
    """The hex-pair split must reproduce exact UTF-8 byte values."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.traindata3 import (
        multimodal_audio_stats,
    )

    rows = [(1, "AB0", "en", "x", 0)]  # bytes 65, 66, 48
    spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    r = multimodal_audio_stats(spark, str(tmp_path)).collect()[0]
    assert (r.n_samples, r.amp_sum, r.amp_peak, r.amp_floor) == (
        3,
        65 + 66 + 48,
        66,
        48,
    )


def test_pattern_peaks_on_known_sequence(spark, tmp_path):
    # user 1 values over time: 1, 3, 2, 5, 4  -> peaks at 3 and 5 (=2),
    # valley at 2 (=1), longest strictly-increasing run = 2 (e.g. 2->5)
    rows = [
        (i, _ts(i), 1, "view", v, "{}")
        for i, v in enumerate([1.0, 3.0, 2.0, 5.0, 4.0], 1)
    ]
    sf = _write_events(spark, tmp_path, rows)
    from gjenbruksstasjoner_kotid_estimering_spark.plans.analytics import (
        events_pattern_peaks,
    )

    r = events_pattern_peaks(spark, sf).collect()[0]
    assert (r.n_peaks, r.n_valleys, r.max_inc_run) == (2, 1, 2)


def test_triangle_count_on_clique(spark, tmp_path):
    """A 4-clique (users 10,20,30,40 all share station 0 on one day) has
    C(4,3)=4 triangles and every member sits in C(3,2)=3 of them; user 50
    (station 0, different day, alone) joins no triangle."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.graph import (
        graph_triangle_count,
    )

    rows = [
        (i, _ts(i), u, "view", 0.0, "{}")
        for i, u in enumerate([10, 20, 30, 40], 1)
    ] + [(5, dt.datetime(2024, 2, 1), 50, "view", 0.0, "{}")]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r.n_triangles for r in graph_triangle_count(spark, sf).collect()}
    assert got == {10: 3, 20: 3, 30: 3, 40: 3}


def test_triangle_count_bounds_on_corpus(spark):
    """On the real corpus: Σ n_triangles ≡ 0 (mod 3) and each node's
    count is bounded by C(degree, 2). Empty at sparse scale is legal."""
    from gjenbruksstasjoner_kotid_estimering_spark.operators.graph import (
        cooccurrence_edges,
        graph_triangle_count,
    )

    rows = graph_triangle_count(spark, SF).collect()
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0
    deg: dict = {}
    for e in cooccurrence_edges(spark, SF).collect():
        deg[e.user_a] = deg.get(e.user_a, 0) + 1
        deg[e.user_b] = deg.get(e.user_b, 0) + 1
    for r in rows:
        d = deg[r.user_id]
        assert r.n_triangles <= d * (d - 1) // 2


def test_regression_matches_numpy(spark):
    import numpy as np

    from gjenbruksstasjoner_kotid_estimering_spark.plans.stats import (
        stat_regression_exact,
    )

    got = {r.event_type: r for r in stat_regression_exact(spark, SF).collect()}
    pdf = load_table(spark, SF, "events").select(
        "event_type", "value", F.hour("ts").alias("h")
    ).toPandas()
    for etype, grp in pdf.groupby("event_type"):
        x = np.round(grp["value"].to_numpy() * 100.0)
        y = grp["h"].to_numpy().astype(float)
        r_np = np.corrcoef(x, y)[0, 1]
        slope_np = np.polyfit(x, y, 1)[0]
        assert abs(got[etype].r - r_np) < 1e-9
        assert abs(got[etype].slope - slope_np) < 1e-9


def test_ab_test_readout_consistent(spark):
    from gjenbruksstasjoner_kotid_estimering_spark.plans.stats import (
        events_ab_test,
    )

    r = events_ab_test(spark, SF).collect()[0]
    assert r.n_a + r.n_b == (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert 0 < r.conv_a <= r.n_a and 0 < r.conv_b <= r.n_b
    assert abs(r.rate_a - r.conv_a / r.n_a) < 1e-15
    import math

    pooled = (r.conv_a + r.conv_b) / (r.n_a + r.n_b)
    z = (r.rate_a - r.rate_b) / math.sqrt(
        pooled * (1 - pooled) * (1 / r.n_a + 1 / r.n_b)
    )
    assert abs(r.z - z) < 1e-12


def test_profile_columns_exact_distincts(spark):
    from gjenbruksstasjoner_kotid_estimering_spark.plans.stats import (
        profile_columns,
    )

    got = {r.column_name: r for r in profile_columns(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    n = li.count()
    for c, r in got.items():
        assert r.n_rows == n
        assert r.n_distinct == li.select(c).distinct().count()
        assert r.n_nulls == li.where(F.col(c).isNull()).count()


def test_basket_pairs_counts(spark, tmp_path):
    from gjenbruksstasjoner_kotid_estimering_spark.plans.stats import (
        basket_part_pairs,
    )

    # orders: o1 {1,2,3}, o2 {1,2}, o3 {1,2}, o4 {3}
    rows = []
    for ok, parts in [(1, [1, 2, 3]), (2, [1, 2]), (3, [1, 2]), (4, [3])]:
        for p in parts:
            rows.append((ok, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         dt.datetime(2024, 1, 1)))
    spark.createDataFrame(
        rows,
        schema="l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r.part_a, r.part_b): r
        for r in basket_part_pairs(spark, str(tmp_path)).collect()
    }
    # (1,2) co-occurs in 3 of 4 orders; (1,3)/(2,3) only once -> pruned
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r.n_pair, r.n_a, r.n_b) == (3, 3, 3)
    assert abs(r.support - 3 / 4) < 1e-15
    assert abs(r.confidence_a_b - 1.0) < 1e-15
    assert abs(r.lift - (3 * 4) / (3 * 3)) < 1e-15


def test_recursive_hierarchy_structure(spark):
    from gjenbruksstasjoner_kotid_estimering_spark.plans.analytics import (
        recursive_cte_hierarchy,
    )

    rows = {r.user_id: r for r in recursive_cte_hierarchy(spark, SF).collect()}
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert len(rows) == n_users  # every user reached exactly once
    for uid, r in rows.items():
        if uid < 2:
            assert r.depth == 0 and r.root_id == uid and r.path == str(uid)
        else:
            parent = rows[uid // 2]
            assert r.depth == parent.depth + 1
            assert r.root_id == parent.root_id
            assert r.path == f"{parent.path}/{uid}"


def test_approx_distinct_error_bound(spark):
    """Round-6: numeric accountability for the HLL estimate. At
    rsd=0.02 the relative error of approx_count_distinct against the
    exact per-group distinct count must stay under 5% (2.5 sigma) on
    real data at sf0.001 and sf0.01."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        pairs = (
            load_table(spark, sf, "lineitem")
            .select("l_returnflag", "l_partkey")
            .distinct()
        )
        rows = pairs.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("exact"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        ).collect()
        assert rows
        for r in rows:
            rel = abs(r.approx - r.exact) / r.exact
            assert rel < 0.05, f"{sf} {r.l_returnflag}: rel err {rel:.3f}"
