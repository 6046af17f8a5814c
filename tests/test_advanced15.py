"""Round-9 wave J: PIT feature join and streaming late-data drop."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced15 as a15
from gjenbruksstasjoner_kotid_estimering_spark.streaming import latedrop

from conftest import SF0001


def test_pit_features_match_python_replay(spark):
    got = {
        r.event_id: (
            r.prior_events,
            r.prior_purchases,
            r.micros_since_prev,
            r.label_cents,
        )
        for r in a15.events_feature_store_pit(spark, SF0001).collect()
    }
    ev = load_table(spark, SF0001, "events").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    n_purchases = 0
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        for i, r in enumerate(rs):
            if r.event_type != "purchase":
                continue
            n_purchases += 1
            prior = rs[:i]
            if i:
                td = r.ts - rs[i - 1].ts
                since = (
                    td.days * 86_400_000_000
                    + td.seconds * 1_000_000
                    + td.microseconds
                )
            else:
                since = -1
            assert got[r.event_id] == (
                len(prior),
                sum(1 for p in prior if p.event_type == "purchase"),
                since,
                round(r.value * 100),
            )
    assert len(got) == n_purchases


def test_pit_features_never_leak_the_label_event(spark):
    """A purchase's own row must not count toward its features: the
    first purchase a user ever makes has prior_purchases == 0."""
    rows = a15.events_feature_store_pit(spark, SF0001).collect()
    first_by_user: dict[int, int] = {}
    ev = load_table(spark, SF0001, "events").where(
        F.col("event_type") == "purchase"
    ).collect()
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        first_by_user.setdefault(r.user_id, r.event_id)
    firsts = set(first_by_user.values())
    for r in rows:
        if r.event_id in firsts:
            assert r.prior_purchases == 0


def test_late_drop_emits_recent_half_only(spark):
    rows = latedrop.stream_late_data_drop_true(spark, SF0001).collect()
    ev = load_table(spark, SF0001, "events")
    split, wm = ev.agg(
        F.max("ts") - F.expr(f"INTERVAL {latedrop.SPLIT_DAYS} DAYS"),
        F.max("ts") - F.expr("INTERVAL 30 MINUTES"),
    ).collect()[0]
    want = {
        r.window_start: (r.n_events, r.sum_value_cents)
        for r in ev.where(F.col("ts") > F.lit(split))
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .where(F.col("w.end") <= F.lit(wm))
        .select(F.col("w.start").alias("window_start"), "n_events",
                "sum_value_cents")
        .collect()
    }
    got = {r.window_start: (r.n_events, r.sum_value_cents) for r in rows}
    assert got == want
    # the drop is visible in VALUES: full-table windows differ from the
    # drained ones in the split-bisected region
    full = {
        r.window_start: r.n_events
        for r in ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .collect()
    }
    assert any(
        full[w] != n for w, (n, _) in got.items() if w in full
    ) or len(full) > len(got)
