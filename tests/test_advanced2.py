"""Property tests for the round-2 engine-surface operators: interval join
and time-bounded dedup checked against brute-force Python on random event
sets (hypothesis), plus a null-safe join row-conservation check."""

from __future__ import annotations

from datetime import datetime, timedelta
from unittest import mock

from gjenbruksstasjoner_kotid_estimering_spark import registry

from conftest import HYP_EXAMPLES

SF = "/root/testdata/sf0.001"


def _mk_events(spark, rows):
    # rows: (event_id, user_id, event_type, offset_seconds)
    base = datetime(2026, 1, 1)
    data = [
        (eid, uid, etype, base + timedelta(seconds=off), float(eid))
        for (eid, uid, etype, off) in rows
    ]
    return spark.createDataFrame(
        data,
        schema="event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )


def test_interval_join_matches_bruteforce_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    import gjenbruksstasjoner_kotid_estimering_spark.plans.advanced2 as adv2

    @settings(max_examples=HYP_EXAMPLES, deadline=None)
    @given(
        events=st.lists(
            st.tuples(
                st.integers(0, 2),  # user
                st.sampled_from(["view", "click"]),
                st.integers(0, 3600),  # offset seconds over 1 h
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(events):
        rows = [
            (i, uid, etype, off) for i, (uid, etype, off) in enumerate(events)
        ]
        df = _mk_events(spark, rows)
        with mock.patch.object(adv2, "load_table", lambda s, d, n: df):
            got = {
                (r.view_id, r.click_id)
                for r in adv2.join_interval_events(spark, "unused").collect()
            }
        want = {
            (a, b)
            for (a, ua, ta, eta) in [
                (i, u, o, e) for i, (u, e, o) in enumerate(events)
            ]
            for (b, ub, tb, etb) in [
                (i, u, o, e) for i, (u, e, o) in enumerate(events)
            ]
            if eta == "view"
            and etb == "click"
            and ua == ub
            and tb >= ta
            and tb - ta < 600
        }
        assert got == want

    check()


def test_time_bounded_dedup_matches_bruteforce_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    import gjenbruksstasjoner_kotid_estimering_spark.plans.advanced2 as adv2

    @settings(max_examples=HYP_EXAMPLES, deadline=None)
    @given(
        events=st.lists(
            st.tuples(
                st.integers(0, 1),  # user
                st.sampled_from(["view", "error"]),
                st.integers(0, 3 * 3600),  # 3 h horizon
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(events):
        rows = [
            (i, uid, etype, off) for i, (uid, etype, off) in enumerate(events)
        ]
        df = _mk_events(spark, rows)
        with mock.patch.object(adv2, "load_table", lambda s, d, n: df):
            got = sorted(
                r.event_id
                for r in adv2.dedup_time_bounded(spark, "unused").collect()
            )
        # brute force: first (ts, event_id) per (user, type, hour bucket)
        best = {}
        for i, (uid, etype, off) in enumerate(events):
            key = (uid, etype, off // 3600)
            if key not in best or (off, i) < best[key]:
                best[key] = (off, i)
        want = sorted(i for (_, i) in best.values())
        assert got == want

    check()


def test_null_safe_join_preserves_all_probe_rows(spark):
    # every probe row (including NULL keys) must appear exactly once: the
    # dim covers keys 0..3 and NULL, and doc_id % 7 ∈ {0..6} means keys
    # 4..6 drop — assert exactly the expected survivors
    rows = registry.all_specs()["join_null_safe"].builder(spark, SF).collect()
    import duckdb

    n_expected = duckdb.connect().execute(
        f"""SELECT count(*) FROM '{SF}/documents.parquet'
            WHERE doc_id % 5 = 0 OR doc_id % 7 <= 3"""
    ).fetchone()[0]
    assert len(rows) == n_expected
    assert all(r.grp == "g_null" for r in rows if r.k is None)
    assert all(r.k is not None or r.grp == "g_null" for r in rows)
