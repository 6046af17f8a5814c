"""Keyed upsert / last-write-wins (reference estimate_queue.py:166-178).

The reference upserts one prediction row at a time into DynamoDB keyed
``(station_id, timestamp)`` via ``update_item`` — last write wins per key.
Set-oriented restatement: a ranking window over the change stream picks the
newest record per key; ``apply_upserts`` is the batch MERGE primitive
(``foreachBatch``-compatible: union target + changes, keep winner), and the
registered query checks the window-dedup semantics against SQL.

Scale: the window partitions by the upsert key — one shuffle on the key,
no global ordering. With a transactional table format this becomes
``MERGE INTO``; the plan shape (shuffle on key, per-key top-1) is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Keep the newest row per key (ties broken by the last order col)."""
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_upserts(
    target: DataFrame, changes: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Batch MERGE: union target with changes, last write wins per key."""
    return latest_per_key(
        target.unionByName(changes), key_cols=key_cols, order_cols=order_cols
    )


def foreach_batch_upserter(
    target_dir: str, key_cols: list[str], order_cols: list[str]
):
    """``writeStream.foreachBatch`` sink: merge each micro-batch into a
    parquet target with last-write-wins semantics — the streaming form of
    the reference's DynamoDB update_item sink (estimate_queue.py:166-178).

    With a transactional table format this body becomes MERGE INTO; the
    read-merge-overwrite here is the format-agnostic equivalent (the
    checkpoint guarantees each batch applies exactly once).
    """

    def apply(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        if os.path.exists(target_dir):
            target = spark.read.parquet(target_dir)
            merged = apply_upserts(
                target, batch, key_cols=key_cols, order_cols=order_cols
            )
        else:  # first batch: no target yet
            merged = latest_per_key(batch, key_cols, order_cols)
        # Never overwrite the path being read: write aside, then swap.
        # (On an object store this whole body is a transactional MERGE.)
        tmp = f"{target_dir.rstrip('/')}.tmp-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(target_dir):
            shutil.rmtree(target_dir)
        os.replace(tmp, target_dir)

    return apply


@register(
    "upsert_last_write_wins",
    oracle="""
        SELECT user_id, event_type, ts AS last_ts, value AS last_value
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    doc="Last-write-wins per (station, metric) key over the event stream — "
    "the DynamoDB update_item semantics (estimate_queue.py:166-178) as a "
    "ranking-window dedup.",
    tags=("upsert", "window"),
)
def upsert_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(
        ev, key_cols=["user_id", "event_type"], order_cols=["ts", "event_id"]
    ).select(
        "user_id",
        "event_type",
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
    )
