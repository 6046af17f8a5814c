"""TRUE streaming late-data accounting: what the watermark DROPS.

Every other true-streaming row proves what arrives on time is computed
correctly; production streaming's other half is what happens to data
that arrives LATE. This row constructs lateness deliberately — the
events table is split by event time into a recent half and an old half,
and the OLD half is delivered in the SECOND micro-batch (mtime-ordered
files, the soak-harness convention), after the first batch has already
advanced the watermark past all of it. The append-mode drain therefore
contains exactly the windows of the recent half: every old-half row is
late beyond the watermark and is dropped by the engine, including from
the boundary window that the split bisects (which emits with only its
recent-side rows — the sharpest observable proof of the drop). The
oracle states that outcome relationally, so the driver hash gate checks
Spark's late-row semantics end to end, not just a row count.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import new_scratch_dir
from .file_stream import read_events_stream
from .windows import WM_DELAY, _drain_to_memory

SPLIT_DAYS = 15  # events span ~30 days; split at max(ts) − 15 days


def _write_single_file(df: DataFrame, scratch: str, name: str, mtime: int) -> None:
    """Materialize ``df`` as ONE parquet file ``scratch/name`` with a
    pinned mtime (the file source processes oldest-mtime first)."""
    tmp = os.path.join(scratch, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = globmod.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(scratch, name)
    shutil.move(part, dst)
    shutil.rmtree(tmp, ignore_errors=True)
    os.utime(dst, (mtime, mtime))


@register(
    "stream_late_data_drop_true",
    oracle=f"""
        WITH cut AS (
          SELECT max(ts) - INTERVAL {SPLIT_DAYS} DAY AS split_ts,
                 max(ts) - INTERVAL 30 MINUTE AS wm
          FROM events
        )
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS sum_value_cents
        FROM events, cut
        WHERE ts > cut.split_ts
          AND time_bucket(INTERVAL '10 minutes', ts) + INTERVAL 10 MINUTE
              <= cut.wm
        GROUP BY 1
    """,
    doc="TRUE streaming LATE-DATA DROP, oracle-checked: events split at "
    f"max(ts) − {SPLIT_DAYS} days into a recent half (micro-batch 0) "
    "and an old half delivered LAST (mtime-ordered single-file feeds, "
    "maxFilesPerTrigger=1, with a zero-row gap batch between — since "
    "Spark 3.4 the late-event filter uses the PREVIOUS batch's "
    "watermark, so the gap batch is what arms it). Batch 0 advances "
    "the watermark to max(ts) − 30 min; every old-half row then "
    "arrives beyond it and the engine drops all of them "
    "(numRowsDroppedByWatermark = old-half count) — the drained "
    "10-minute append-mode windows equal the batch aggregate of the "
    "RECENT HALF ONLY (the oracle), not of the full table. The window "
    "bisected by the split emits with only its recent-side rows, "
    "making the drop visible in values, not just counts. This is the "
    "semantics half of the watermark contract (the on-time rows' "
    "convergence is stream_tumbling_window_true); at 100 TB the same "
    "bound is what keeps state finite under out-of-order delivery.",
    tags=("streaming", "window", "watermark", "latedata"),
)
def stream_late_data_drop_true(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scratch = new_scratch_dir("latedrop")
    ev = load_table(spark, sf_dir, "events")
    split_ts = ev.agg(
        F.max("ts") - F.expr(f"INTERVAL {SPLIT_DAYS} DAYS")
    ).collect()[0][0]
    recent = ev.where(F.col("ts") > F.lit(split_ts))
    old = ev.where(F.col("ts") <= F.lit(split_ts))
    # oldest mtime is processed first → recent half FIRST, old half LAST.
    # The EMPTY middle file matters: since Spark 3.4 a stateful operator
    # filters late rows with the PREVIOUS batch's watermark
    # (watermarkForLateEvents) while evicting with the current one — so
    # a batch arriving right after the watermark-advancing batch is NOT
    # yet filtered. The zero-row batch lets the late-event watermark
    # catch up, so the old half is dropped (numRowsDroppedByWatermark
    # == its row count), which is the semantics this row exists to pin.
    _write_single_file(recent, scratch, "00_recent.parquet", 1_600_000_000)
    _write_single_file(
        ev.where(F.lit(False)), scratch, "01_gap.parquet", 1_600_000_100
    )
    _write_single_file(old, scratch, "02_late.parquet", 1_600_000_200)
    try:
        feed = read_events_stream(
            spark, scratch, glob="*.parquet", max_files_per_trigger=1
        )
        agg = (
            feed.withWatermark("ts", WM_DELAY)
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    F.round(F.col("value") * 100.0, 0).cast("long")
                ).alias("sum_value_cents"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "n_events",
                "sum_value_cents",
            )
        )
        return _drain_to_memory(agg, "latedrop", sf_dir, "append")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
