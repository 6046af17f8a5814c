"""Round-8 wave C: heterogeneous-source streaming union and the state
data source reader."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.streaming import multisrc as ms

from conftest import SF0001


def _batch_windows(spark):
    """Batch twin of the streamed aggregate: every 10-minute window with
    per-parity counts, plus the per-parity max event time."""
    ev = load_table(spark, SF0001, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("n_even"),
            F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("n_odd"),
        )
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
                "n_even", "n_odd")
    )


def test_union_sources_emits_min_watermark_closure(spark):
    out = {
        r.window_start: (r.n_parquet, r.n_jsonl, r.sum_value_cents)
        for r in ms.stream_union_sources_true(spark, SF0001).collect()
    }
    ev = load_table(spark, SF0001, "events")
    maxes = (
        ev.groupBy((F.col("user_id") % 2).alias("p"))
        .agg(F.max("ts").alias("mx"))
        .collect()
    )
    assert len(maxes) == 2
    cutoff = min(r.mx for r in maxes)  # min-policy watermark base
    batch = _batch_windows(spark).collect()
    import datetime

    wm = cutoff - datetime.timedelta(minutes=30)
    want_windows = {r.ws for r in batch if r.we <= wm}
    assert set(out) == want_windows
    # both feeds contributed: parity counts match the batch twin per window
    for r in batch:
        if r.ws in out:
            assert out[r.ws][0] == r.n_even
            assert out[r.ws][1] == r.n_odd


def test_statestore_holds_exactly_the_open_windows(spark):
    state = {
        (r.window_start, r.user_id): r.n_events
        for r in ms.stream_statestore_reader(spark, SF0001).collect()
    }
    ev = load_table(spark, SF0001, "events")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    import datetime

    wm = mx - datetime.timedelta(minutes=30)
    batch = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "user_id",
            "n",
        )
        .collect()
    )
    want = {(r.ws, r.user_id): r.n for r in batch if r.we > wm}
    assert state == want
    assert len(state) >= 1  # the tail window is always still open
