"""Streaming CDC→SCD2 fold: slicing invariance and interval hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.streaming import scd2_stream

from conftest import SF0001


def test_streamed_store_equals_batch_reconstruction(spark):
    got = {
        (r.user_id, r.valid_from): (r.status, r.valid_to, r.is_current)
        for r in scd2_stream.stream_scd2_dimension_true(
            spark, SF0001
        ).collect()
    }
    ev = load_table(spark, SF0001, "events").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        changes = [
            r
            for i, r in enumerate(rs)
            if i == 0 or r.event_type != rs[i - 1].event_type
        ]
        for i, c in enumerate(changes):
            nxt = changes[i + 1].ts if i + 1 < len(changes) else None
            want[(uid, c.ts)] = (c.event_type, nxt, nxt is None)
    assert got == want


def test_streamed_store_intervals_tile_per_user(spark):
    rows = scd2_stream.stream_scd2_dimension_true(spark, SF0001).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    n_events_users = (
        load_table(spark, SF0001, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(by_user) == n_events_users
    for ivs in by_user.values():
        ivs.sort(key=lambda r: r.valid_from)
        opens = [r for r in ivs if r.valid_to is None]
        assert len(opens) == 1 and opens[0] is ivs[-1]
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev.valid_to == nxt.valid_from
            # consecutive intervals always change status — SCD2 never
            # stores a no-op transition
            assert prev.status != nxt.status


def test_fold_is_slicing_invariant_on_random_streams_hypothesis(spark):
    """Property (hypothesis): folding ANY chronological slicing of an
    event stream — including the degenerate 1-slice and the
    max-slices-per-distinct-ts cuts — produces the same SCD2 store as
    the single-pass reference reconstruction. This is the load-bearing
    claim behind the approxQuantile slicer: boundaries are approximate
    and skew-arbitrary, so the fold must be history-slicing-invariant as
    long as equal-ts rows never split (slices cut BETWEEN distinct ts
    values, the lo < ts <= hi contract)."""
    import datetime
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from gjenbruksstasjoner_kotid_estimering_spark.streaming.scd2_stream import (
        _scd2_fold,
    )

    base = datetime.datetime(2020, 5, 6, 9, 0, 0)

    @st.composite
    def stream_and_cuts(draw):
        n_events = draw(st.integers(min_value=1, max_value=10))
        events = []
        for eid in range(n_events):
            events.append(
                (
                    draw(st.integers(min_value=0, max_value=2)),  # user
                    base
                    + datetime.timedelta(
                        seconds=draw(st.integers(min_value=0, max_value=5))
                    ),
                    eid,
                    draw(st.sampled_from(["open", "closed"])),
                )
            )
        distinct_ts = sorted({e[1] for e in events})
        # cut AFTER any subset of distinct ts values (equal-ts rows
        # therefore never split across a boundary)
        cuts = [
            t
            for t in distinct_ts[:-1]
            if draw(st.booleans())
        ]
        return events, cuts

    @settings(
        max_examples=6,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(stream_and_cuts())
    def check(sc):
        events, cuts = sc
        bounds = cuts + [max(e[1] for e in events)]
        slices, lo = [], None
        for hi in bounds:
            sl = [
                e
                for e in events
                if (lo is None or e[1] > lo) and e[1] <= hi
            ]
            if sl:
                slices.append(sl)
            lo = hi
        store_dir = tempfile.mkdtemp(prefix="scd2_prop_")
        try:
            fold = _scd2_fold(store_dir)
            for bid, sl in enumerate(slices):
                fold(
                    spark.createDataFrame(
                        sl,
                        "user_id long, ts timestamp, event_id long, "
                        "event_type string",
                    ),
                    bid,
                )
            # multiset compare, NOT a dict keyed by (user, valid_from):
            # equal-ts change points within a user produce several
            # legitimate intervals sharing valid_from (zero-length ones
            # included), and a dict would silently collapse them to a
            # collect-order-dependent survivor
            # None valid_to is not orderable against datetimes, so both
            # sides sort with the same None-last key
            row_key = lambda t: (  # noqa: E731
                t[0],
                t[1],
                t[2],
                t[3] is None,
                t[3] or t[1],
            )
            got = sorted(
                (
                    (r.user_id, r.valid_from, r.status, r.valid_to)
                    for r in spark.read.parquet(store_dir).collect()
                ),
                key=row_key,
            )
        finally:
            shutil.rmtree(store_dir, ignore_errors=True)
        by_user: dict[int, list] = {}
        for u, ts, eid, et in events:
            by_user.setdefault(u, []).append((ts, eid, et))
        want = []
        for uid, rs in by_user.items():
            rs.sort()
            changes = [
                r
                for i, r in enumerate(rs)
                if i == 0 or r[2] != rs[i - 1][2]
            ]
            for i, c in enumerate(changes):
                nxt = changes[i + 1][0] if i + 1 < len(changes) else None
                want.append((uid, c[0], c[2], nxt))
        assert got == sorted(want, key=row_key)

    check()
