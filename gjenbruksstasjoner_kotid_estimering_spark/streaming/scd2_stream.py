"""TRUE streaming CDC → SCD2 dimension maintenance.

The batch lane has both halves of the story — scd2_intervals (window
reconstruction from full history) and merge_tx_cdf_to_scd2 (folding a
version-level CDF) — but a production dimension is maintained from a
LIVE change stream: each micro-batch of events closes and opens validity
intervals against the accumulated store. This row runs exactly that:
the events table arrives as up to ``N_FEED_FILES`` time-ordered
micro-batches (mtime-sequenced single-file feeds; colliding
approxQuantile boundaries can merge adjacent slices, so fewer is
legitimate), a ``foreachBatch`` fold applies
SCD2 transition logic per batch (close the open interval at the first
in-batch status change, open one interval per change point), and the
final store must hash-match the from-scratch lag/lead reconstruction
over the whole table — the streaming fold converges to the batch
answer no matter how history was sliced into batches.

Scale posture: each fold touches the store keyed by user_id and the
batch's change points only; the store rewrite here is a plain parquet
swap (fixture scale), where a 100 TB deployment would MERGE into the
transactional table (operators/merge_tx.py) — the fold logic is
identical, and the stream_merge_sink_true row already proves that
half.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import new_scratch_dir
from .file_stream import read_events_stream

N_FEED_FILES = 4
_NO_STATUS = "\x00-none"  # sentinel unequal to every event_type


def _scd2_fold(store_dir: str):
    """foreachBatch fold: apply one micro-batch of (user_id, ts,
    event_id, event_type) change events to the SCD2 store at
    ``store_dir`` (parquet; empty dir = empty store)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        has_store = bool(globmod.glob(os.path.join(store_dir, "*.parquet")))
        if has_store:
            store = spark.read.parquet(store_dir)
        else:
            store = spark.createDataFrame(
                [],
                "user_id long, status string, valid_from timestamp, "
                "valid_to timestamp",
            )
        cur = store.where(F.col("valid_to").isNull())
        hist = store.where(F.col("valid_to").isNotNull())

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        b = (
            batch.select("user_id", "ts", "event_id", "event_type")
            .withColumn("prev_in_batch", F.lag("event_type").over(w))
            .join(
                cur.select(
                    "user_id", F.col("status").alias("open_status")
                ),
                "user_id",
                "left",
            )
        )
        # a row is a CHANGE POINT iff its type differs from what precedes
        # it: the previous in-batch row, or (for the batch's first row
        # per user) the store's open status
        prev = F.coalesce(
            F.col("prev_in_batch"),
            F.col("open_status"),
            F.lit(_NO_STATUS),
        )
        changes = b.where(F.col("event_type") != prev)
        wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
        new_intervals = changes.select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wc).alias("valid_to"),
        )
        first_change = changes.groupBy("user_id").agg(
            F.min("ts").alias("first_ts")
        )
        closed_cur = cur.join(first_change, "user_id").select(
            "user_id",
            "status",
            "valid_from",
            F.col("first_ts").alias("valid_to"),
        )
        untouched_cur = cur.join(first_change, "user_id", "left_anti")
        new_store = (
            hist.unionByName(closed_cur)
            .unionByName(untouched_cur)
            .unionByName(new_intervals)
            # detach from the files about to be overwritten
            .localCheckpoint(eager=True)
        )
        new_store.write.mode("overwrite").parquet(store_dir)

    return apply


@register(
    "stream_scd2_dimension_true",
    oracle="""
        WITH o AS (
            SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ),
        ch AS (
            SELECT user_id, ts, event_id, event_type
            FROM o WHERE prev IS NULL OR event_type != prev
        )
        SELECT user_id,
               event_type AS status,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               (lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL)
                   AS is_current
        FROM ch
    """,
    doc="TRUE streaming CDC→SCD2, oracle-checked: events arrive as up to "
    "N_FEED_FILES chronologically-sliced micro-batches (mtime-ordered "
    "files, maxFilesPerTrigger=1; colliding approxQuantile boundaries "
    "can produce fewer slices — empty slices are skipped) and a "
    "foreachBatch fold maintains the "
    "type-2 dimension — each batch closes the store's open interval "
    "at the first in-batch status change (seeded from the OPEN row's "
    "status, so a batch starting with an unchanged status opens "
    "nothing) and opens one interval per change point. The final "
    "store must hash-match the from-scratch lag/lead reconstruction "
    "over the whole table: the incremental fold is history-slicing-"
    "invariant, which is the correctness property a CDC consumer "
    "needs (redelivery boundaries move; the dimension must not). "
    "Store I/O is keyed by user_id and sized to change points; at "
    "100 TB the swap becomes a MERGE into the transactional table "
    "(stream_merge_sink_true proves that half).",
    tags=("streaming", "scd2", "cdc", "sink"),
)
def stream_scd2_dimension_true(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scratch = new_scratch_dir("scd2_stream")
    feed_dir = os.path.join(scratch, "feed")
    store_dir = os.path.join(scratch, "store")
    ckpt = os.path.join(scratch, "ckpt")
    os.makedirs(feed_dir)
    os.makedirs(store_dir)
    ev = load_table(spark, sf_dir, "events")
    # Disjoint, chronologically ordered slices from approxQuantile ts
    # boundaries — cross-batch event order equals event-time order (the
    # in-order CDC delivery contract) because equal-ts rows never split
    # across a boundary (slice_i = lo < ts_epoch <= hi). No global sort:
    # the fold is history-slicing-invariant, so approximate (even
    # skewed) boundaries cannot change the result, and the slicer stays
    # scan-parallel at any scale.
    tsl = ev.select(F.col("ts").cast("long").alias("tsl"))
    probs = [i / N_FEED_FILES for i in range(1, N_FEED_FILES)]
    bounds = sorted(set(tsl.stat.approxQuantile("tsl", probs, 0.001)))
    # one slice id per row: count of boundaries strictly below ts_epoch
    slice_col = F.lit(1)
    for b in bounds:
        slice_col = slice_col + F.when(
            F.col("ts").cast("long") > F.lit(int(b)), 1
        ).otherwise(0)
    try:
        # ONE scan writes every slice: repartition("slice") puts all rows
        # of a slice in one task (single value → single hash partition),
        # so partitionBy emits exactly one file per slice directory.
        tmp = os.path.join(scratch, "_slices")
        (
            ev.withColumn("slice", slice_col)
            .repartition("slice")
            .write.partitionBy("slice")
            .parquet(tmp)
        )
        for i in range(1, len(bounds) + 2):
            parts = globmod.glob(
                os.path.join(tmp, f"slice={i}", "part-*.parquet")
            )
            if not parts:  # colliding quantile boundaries → empty slice
                continue
            if len(parts) != 1:
                raise RuntimeError(
                    f"slice={i} wrote {len(parts)} files {parts}: the "
                    "one-file-per-slice feed relies on repartition('slice') "
                    "producing one task per slice value with no file "
                    "splitting — check spark.sql.files.maxRecordsPerFile "
                    "(must be unset/0 in this session)"
                )
            dst = os.path.join(feed_dir, f"{i:02d}_slice.parquet")
            shutil.move(parts[0], dst)
            os.utime(dst, (1_600_000_000 + i, 1_600_000_000 + i))
        shutil.rmtree(tmp, ignore_errors=True)
        feed = read_events_stream(
            spark, feed_dir, glob="*.parquet", max_files_per_trigger=1
        )
        q = (
            feed.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(_scd2_fold(store_dir))
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(store_dir)
            .withColumn("is_current", F.col("valid_to").isNull())
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
