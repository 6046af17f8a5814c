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
