"""Scale guard for the co-occurrence graph derivation.

The station-day self-join is O(k²) per group; at 100 TB a hot group would
blow up before the groupBy. ``cooccurrence_edges`` caps each group at the
K most-active users, so pairs-per-group is bounded by K(K-1)/2 no matter
how skewed the input. These tests build a deliberately skewed events frame
(one hot station-day with far more users than the cap) and assert the
bound, determinism, and that rank invariants survive the cap.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.operators import graph


def _skewed_events(spark, n_hot_users: int):
    """events-shaped frame: one hot station-day (station = user_id%10 == 0)
    with ``n_hot_users`` distinct users, plus a handful of cold users."""
    day = datetime.datetime(2020, 5, 6, 9, 0, 0)
    rows = []
    # hot group: users 0,10,20,... all share station 0 on the same day;
    # activity varies so the top-K ordering is exercised
    for i in range(n_hot_users):
        uid = i * 10
        for rep in range(1 + i % 3):
            rows.append((len(rows), day, uid, "click", 1.0, "{}"))
    # cold groups: single-user station-days → no pairs at all
    for i in range(5):
        uid = i * 10 + 3
        rows.append((len(rows), day + datetime.timedelta(days=i + 1), uid,
                     "click", 1.0, "{}"))
    return spark.createDataFrame(
        rows,
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


def test_hot_group_pairs_bounded(spark, tmp_path, monkeypatch):
    cap = 16
    n_hot = 100  # far above the cap
    ev = _skewed_events(spark, n_hot)
    out = str(tmp_path / "events.parquet")
    ev.write.parquet(out)
    edges = graph.cooccurrence_edges(
        spark, str(tmp_path), max_users_per_group=cap
    )
    n_edges = edges.count()
    # uncapped would be C(100,2) = 4950 pairs; capped is C(16,2) = 120
    assert n_edges == cap * (cap - 1) // 2
    # and every pair weight is bounded by the number of shared station-days
    assert edges.agg(F.max("weight")).first()[0] == 1


def test_cap_keeps_most_active_users(spark, tmp_path):
    cap = 8
    ev = _skewed_events(spark, 30)
    ev.write.parquet(str(tmp_path / "events.parquet"))
    edges = graph.cooccurrence_edges(
        spark, str(tmp_path), max_users_per_group=cap
    )
    kept = {
        r[0]
        for r in edges.select(F.explode(F.array("user_a", "user_b")))
        .distinct()
        .collect()
    }
    # activity is 1 + i%3 events for user i*10 → the most-active cohort is
    # i%3==2 (3 events each: i = 2,5,8,...). With cap=8 every kept user
    # must come from that cohort (10 candidates ≥ cap).
    assert len(kept) == cap
    assert all((u // 10) % 3 == 2 for u in kept)


def test_capped_edges_deterministic(spark, tmp_path):
    ev = _skewed_events(spark, 50)
    ev.write.parquet(str(tmp_path / "events.parquet"))
    e1 = sorted(
        map(tuple, graph.cooccurrence_edges(
            spark, str(tmp_path), max_users_per_group=12).collect())
    )
    e2 = sorted(
        map(tuple, graph.cooccurrence_edges(
            spark, str(tmp_path), max_users_per_group=12).collect())
    )
    assert e1 == e2


def test_pagerank_invariants_survive_cap(spark, tmp_path):
    ev = _skewed_events(spark, 40)
    ev.write.parquet(str(tmp_path / "events.parquet"))
    edges = graph.cooccurrence_edges(
        spark, str(tmp_path), max_users_per_group=10
    )
    ranks = {r.node: r.rank for r in graph.pagerank(edges).collect()}
    assert ranks
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert all(r > 0 for r in ranks.values())
