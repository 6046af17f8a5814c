"""Python Data Source API (Spark 4): partition planning, filter
pushdown absorption, and end-to-end parity for the graft_series source.
Oracle parity runs in test_correctness.py."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, LessThanOrEqual

from gjenbruksstasjoner_kotid_estimering_spark.sources.pyds import (
    BUCKET_MOD,
    GraftSeriesReader,
    _row,
    register_graft_series,
)


def _read_all(reader):
    # read() yields pyarrow RecordBatches (the Arrow fast path); flatten
    # back to (id, bucket, value_cents) tuples for the assertions
    rows = []
    for part in reader.partitions():
        for batch in reader.read(part):
            rows.extend(
                tuple(rec.values()) for rec in batch.to_pylist()
            )
    return rows


def test_pushdown_absorbs_bucket_predicates():
    reader = GraftSeriesReader({"rows": "1000", "partitions": "4"})
    remaining = list(
        reader.pushFilters(
            [GreaterThan(("bucket",), 9), LessThanOrEqual(("bucket",), 20)]
        )
    )
    assert remaining == []  # both fully absorbed
    rows = _read_all(reader)
    assert rows and all(10 <= r[1] <= 20 for r in rows)
    # absorption means filtered-out ids were never yielded
    assert len(rows) < 1000
    assert reader.rows_generated == len(rows)


def test_pushdown_equality_and_unsupported_passthrough():
    reader = GraftSeriesReader({"rows": "1000", "partitions": "4"})
    other = EqualTo(("value_cents",), 7)  # unsupported column
    remaining = list(
        reader.pushFilters([EqualTo(("bucket",), 5), other])
    )
    assert remaining == [other]  # returned by reference for Spark
    rows = _read_all(reader)
    assert rows and all(r[1] == 5 for r in rows)


def test_partitions_cover_range_exactly():
    reader = GraftSeriesReader({"rows": "103", "partitions": "8"})
    parts = reader.partitions()
    ids = []
    for p in parts:
        ids.extend(range(p.start, p.end))
    assert sorted(ids) == list(range(103))


def test_source_reads_in_spark(spark):
    register_graft_series(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("graft_series")
        .option("rows", 500)
        .option("partitions", 4)
        .load()
    )
    got = {r.id: (r.bucket, r.value_cents) for r in df.collect()}
    assert len(got) == 500
    for i in (0, 1, 499):
        _, b, c = _row(i)
        assert got[i] == (b, c)
    # a filtered read agrees with the unfiltered read filtered in Spark
    filt = df.where(F.col("bucket") == 3).collect()
    assert {r.id for r in filt} == {
        i for i, (b, _) in got.items() if b == 3
    }
    assert all(0 <= b < BUCKET_MOD for b, _ in got.values())


def test_stream_reader_drains_deterministically(spark, tmp_path):
    """The streaming source emits the full series across micro-batches
    with checkpointed offsets; a processing-time drain into a memory
    sink reproduces the batch relation exactly."""
    import time

    register_graft_series(spark)
    n = 1000
    q = (
        spark.readStream.format("graft_series")
        .option("rows", n)
        .load()
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("pyds_stream").count() >= n:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = {r.id: (r.bucket, r.value_cents) for r in spark.table("pyds_stream").collect()}
    assert len(got) == n  # no duplicates, no losses across batches
    for i in (0, 399, 400, 999):  # batch-boundary ids included once
        assert got[i] == _row(i)[1:]


def test_jsonl_sink_roundtrip_and_atomicity(spark, tmp_path):
    import os

    from gjenbruksstasjoner_kotid_estimering_spark.sources.pyds import (
        register_graft_jsonl,
    )

    register_graft_jsonl(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4)
    df.write.format("graft_jsonl").option("path", out).mode("append").save()
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert not [n for n in names if n.endswith(".tmp")]  # commit renamed all
    assert len([n for n in names if n.endswith(".jsonl")]) == 4
    back = spark.read.option("pathGlobFilter", "*.jsonl").json(out)
    assert sorted(map(tuple, back.select("k", "v").collect())) == [
        (i, i * 3) for i in range(100)
    ]
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert f.read() == "100"


def test_drain_watchdog_stops_and_flags_a_stuck_query():
    """arm_drain_watchdog (r9 advice): a query whose drain never returns
    must be stop()ped at the deadline with the timed_out flag SET, so the
    caller raises TimeoutError instead of reading a partial drain. A
    healthy drain that finishes first cancels the timer and the flag
    stays clear. Exercised against a fake query object — the real
    stalled-worker scenario would hang a test suite."""
    import threading
    import time

    from gjenbruksstasjoner_kotid_estimering_spark.streaming.pystream import (
        arm_drain_watchdog,
    )

    class FakeQuery:
        def __init__(self):
            self.stopped = threading.Event()

        def stop(self):
            self.stopped.set()

    # stuck drain: deadline fires, query stopped, flag set
    q = FakeQuery()
    watchdog, timed_out = arm_drain_watchdog(q, deadline=0.05)
    try:
        assert q.stopped.wait(timeout=5.0), "watchdog never stopped the query"
        assert timed_out.is_set()
    finally:
        watchdog.cancel()

    # healthy drain: caller cancels first, nothing fires
    q2 = FakeQuery()
    watchdog2, timed_out2 = arm_drain_watchdog(q2, deadline=30.0)
    watchdog2.cancel()
    time.sleep(0.1)
    assert not timed_out2.is_set()
    assert not q2.stopped.is_set()
