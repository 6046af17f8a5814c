"""Adversarial multi-micro-batch soak for the TRUE-streaming rows.

The registry's streaming queries drain a single-file source — one
micro-batch — so their r5 green rows prove correctness for that packing
only. These tests split events across several files with one file per
trigger (maxFilesPerTrigger=1), ordered NEWEST-FIRST so every later
micro-batch carries strictly older data than the one before it: the
worst legal packing for last-write-wins and watermark claims.

- stream_dedup_true's claim: with the watermark horizon exceeding the
  data span, the drained set equals SELECT DISTINCT under ANY packing.
- stream_merge_sink_true's claim: conditional MERGE makes LWW hold
  ACROSS micro-batches — an out-of-order batch cannot regress a key.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.operators import merge_tx as mt
from gjenbruksstasjoner_kotid_estimering_spark.streaming.file_stream import (
    read_events_stream,
)

SF = os.environ.get("SPARK_GRAFT_SOAK_SF", "/root/testdata/sf0.1")
N_FILES = 6


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """events split into N_FILES flat files, file-arrival order (mtime)
    = newest events first."""
    root = tmp_path_factory.mktemp("soak")
    ev = load_table(spark, str(SF), "events")
    # contiguous time slices: chunk 0 = newest sixth ... chunk 5 = oldest
    ranked = ev.withColumn(
        "_chunk",
        F.ntile(N_FILES).over(
            Window.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        ),
    )
    for i in range(1, N_FILES + 1):
        part_dir = str(root / f"_part{i}")
        ranked.where(F.col("_chunk") == i).drop("_chunk").coalesce(
            1
        ).write.parquet(part_dir)
        (src,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = str(root / f"events_{i}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(part_dir)
        # ascending mtimes: the file source processes oldest-mtime first,
        # so batch order presents newest EVENT TIMES first
        os.utime(dst, (1_600_000_000 + i, 1_600_000_000 + i))
    return str(root)


def _soak_reader(s, d):
    return read_events_stream(
        s, d, glob="events_*.parquet", max_files_per_trigger=1
    )


def test_stream_dedup_exact_under_adversarial_packing(
    spark, split_events_dir
):
    from gjenbruksstasjoner_kotid_estimering_spark.streaming.windows import (
        _drain_to_memory,
    )

    ev = _soak_reader(spark, split_events_dir)
    deduped = (
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .withWatermark("hour", "3650 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "hour"])
        .select("user_id", "event_type", "hour")
    )
    got = _drain_to_memory(deduped, "soak_dedup", split_events_dir, "append")
    want = (
        load_table(spark, str(SF), "events")
        .select(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .distinct()
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_stream_merge_lww_under_adversarial_packing(
    spark, split_events_dir, tmp_path
):
    table_dir = str(tmp_path / "soak_merge_table")
    ckpt = str(tmp_path / "soak_merge_ckpt")
    mt.run_streaming_merge(
        spark, split_events_dir, table_dir, ckpt, reader=_soak_reader
    )
    snap, _ = mt.snapshot(spark, table_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = (
        load_table(spark, str(SF), "events")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "event_type", "value", "ts", "event_id")
    )
    got = snap.select("user_id", "event_type", "value", "ts", "event_id")
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_file_sink_exactly_once_across_micro_batches(spark, split_events_dir):
    """The partitioned parquet file sink under one-file-per-trigger
    packing: (a) the committed output equals the batch table exactly
    once; (b) a re-drain against the same checkpoint adds NOTHING; (c)
    a reader sees no duplicate event_ids. The durable exactly-once
    claim, proven across 6 micro-batches, not just the single-file
    drain the registry row uses."""
    import tempfile

    from gjenbruksstasjoner_kotid_estimering_spark.streaming import filesink

    work = tempfile.mkdtemp(prefix="filesink_soak_")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    try:
        kwargs = dict(
            glob="events_*.parquet", max_files_per_trigger=1
        )
        filesink.drain_to_files(
            spark, split_events_dir, out_dir, ckpt, **kwargs
        )
        first = spark.read.parquet(out_dir)
        n_first = first.count()
        n_batch = load_table(spark, str(SF), "events").count()
        assert n_first == n_batch
        assert first.select("event_id").distinct().count() == n_batch

        # re-drain, same checkpoint: commit log blocks re-delivery
        filesink.drain_to_files(
            spark, split_events_dir, out_dir, ckpt, **kwargs
        )
        again = spark.read.parquet(out_dir)
        assert again.count() == n_batch
        assert again.select("event_id").distinct().count() == n_batch
    finally:
        shutil.rmtree(work, ignore_errors=True)
