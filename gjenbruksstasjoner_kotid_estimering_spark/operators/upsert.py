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
    target_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    partition_col: str | None = None,
):
    """``writeStream.foreachBatch`` sink: merge each micro-batch into a
    parquet target with last-write-wins semantics — the streaming form of
    the reference's DynamoDB update_item sink (estimate_queue.py:166-178).

    Partition-scoped MERGE: the target is partitioned by ``partition_col``
    (default: the first key column) and each micro-batch

    1. collects the distinct partition values present in the batch
       (bounded by batch size, never by target size),
    2. reads ONLY those partitions of the target (partition pruning),
    3. merges last-write-wins per key,
    4. writes back under ``partitionOverwriteMode=dynamic``, which
       replaces exactly the partitions present in the merged frame.

    Untouched partitions' files are never read or rewritten — the
    update_item semantics is per-key, not table-replace, so a micro-batch
    must cost O(batch), not O(target). With a transactional table format
    this body becomes MERGE INTO; the plan shape (prune → key shuffle →
    per-key top-1 → partition-scoped commit) is the same.
    """
    pcol = partition_col or key_cols[0]

    def apply(batch: DataFrame, batch_id: int) -> None:
        import os

        spark = batch.sparkSession
        touched = [r[0] for r in batch.select(pcol).distinct().collect()]
        if not touched:
            return
        if os.path.exists(target_dir):
            # Partition values round-trip through directory names; cast the
            # inferred partition column back to the batch's dtype so the
            # union/window see one type.
            target = (
                spark.read.parquet(target_dir)
                .withColumn(pcol, F.col(pcol).cast(batch.schema[pcol].dataType))
                .where(F.col(pcol).isin(touched))
            )
            merged = apply_upserts(
                target, batch, key_cols=key_cols, order_cols=order_cols
            )
        else:  # first batch: no target yet
            merged = latest_per_key(batch, key_cols, order_cols)
        # Break lineage before writing over the partitions just read.
        # Writer-level option, NOT spark.conf.set: mutating the shared
        # session conf inside foreachBatch would leak dynamic-overwrite
        # semantics to every later write on the session.
        merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(pcol)
            .parquet(target_dir)
        )

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


def _sink_shape_oracle() -> str:
    from ..functions import estimator as est
    from .asof_interp import _PRED_SQL

    arms = "\n        UNION ALL\n".join(
        f"""
        SELECT station_id,
               CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) || '.0' AS ts_key,
               '{m}' AS metric,
               CAST(CAST(CAST({c} AS VARCHAR) AS DECIMAL(38,18)) AS VARCHAR)
                 AS metric_value
        FROM est WHERE station_id % 5 = 0"""
        for m, c in [
            ("queue_end_pos", "x_pos"),
            ("queue_lanes", "lanes"),
            ("queue_full", "queue_full"),
            ("cars", "cars"),
            ("expected_queue_time", "expected_queue_time"),
        ]
    )
    return f"WITH est AS ({est.estimator_sql(_PRED_SQL)}) {arms}"


@register(
    "upsert_sink_shape",
    oracle=_sink_shape_oracle(),
    doc="The DynamoDB record shape at the sink boundary (reference "
    "estimate_queue.py:166-178 + conftest.py:12-21): one row per "
    "(station_id, str(epoch) RANGE key, metric) with the value passed "
    "through Decimal(38,18) exactly as the reference converts via "
    "Decimal(str(v)) — melt of the estimator output keyed like the "
    "reference's update_item.",
    tags=("upsert", "sink", "decimal"),
)
def upsert_sink_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import fan_out
    from .asof_interp import queue_estimate

    # The flagship is a deliberately zero-shuffle broadcast pipeline, so on
    # a one-split scan its output sits in a single partition; the x5 Expand
    # + per-output-row decimal/string casts below would serialize there.
    # fan_out spreads the melt across cores (structural no-op at scale).
    # Scoped to a 1-in-5 station shard: the record shape and the Decimal
    # boundary under test are identical per row; the unsliced melt fed
    # events×5 rows through the gate's hash for no extra coverage.
    est_df = fan_out(
        queue_estimate(spark, sf_dir).where(F.col("station_id") % 5 == 0)
    )
    melted = est_df.select(
        "station_id",
        F.concat(
            F.unix_timestamp("ts").cast("string"), F.lit(".0")
        ).alias("ts_key"),
        F.col("x_pos").alias("queue_end_pos"),
        F.col("lanes").alias("queue_lanes"),
        "queue_full",
        "cars",
        "expected_queue_time",
    ).unpivot(
        ids=["station_id", "ts_key"],
        values=[
            "queue_end_pos",
            "queue_lanes",
            "queue_full",
            "cars",
            "expected_queue_time",
        ],
        variableColumnName="metric",
        valueColumnName="_raw",
    )
    # Decimal(str(v)) exactly as the reference (estimate_queue.py:176):
    # shortest-repr string → exact decimal parse. The record carries the
    # decimal's canonical string (what the DynamoDB item stores) — a
    # decimal→double back-cast would round through int128/10^18 with
    # engine-specific error, so the decimal itself is the compared value.
    return melted.select(
        "station_id",
        "ts_key",
        "metric",
        F.col("_raw")
        .cast("string")
        .cast("decimal(38,18)")
        .cast("string")
        .alias("metric_value"),
    )
