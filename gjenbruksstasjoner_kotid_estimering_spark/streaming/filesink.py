"""Exactly-once streaming FILE sink: the lakehouse-ingest path.

The memory-sink drains (streaming/windows.py) prove windowed semantics;
this module proves the DURABLE side: writeStream → partitioned parquet
with a checkpoint, where the `_spark_metadata` transaction log — not the
files on disk — defines the committed snapshot. Re-running a drain
against the same checkpoint with no new input commits NOTHING new, and a
reader that respects the log sees each input row exactly once. At 100 TB
this is the continuous-ingest contract: restart-safe, no dedup pass, no
partial-file reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..scratch import detach_result, new_scratch_dir


def drain_to_files(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    ckpt: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """AvailableNow drain of the events stream into a partitioned parquet
    file sink. Safe to call repeatedly with the SAME checkpoint: the
    file-sink commit log makes re-delivery impossible (exactly-once per
    input file)."""
    from .file_stream import read_events_stream

    ev = read_events_stream(
        spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
    ).select(
        "event_id",
        "ts",
        "user_id",
        "value",
        "event_type",
    )
    q = (
        ev.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .partitionBy("event_type")
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
    q.stop()


@register(
    "stream_file_sink_exactly_once",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_ids,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events
        GROUP BY event_type
    """,
    doc="Exactly-once streaming file sink: the events stream drains via "
    "AvailableNow into an event_type-partitioned parquet sink with a "
    "checkpoint, is drained a SECOND time against the same checkpoint "
    "(must be a no-op — the _spark_metadata commit log already records "
    "the input files), and the committed output is read back and "
    "aggregated. n_rows = n_distinct_ids in the hash-checked result IS "
    "the exactly-once proof: a re-delivered batch would double rows "
    "without doubling distinct ids. The durable half of the streaming "
    "lane (the memory drains prove semantics; this proves the "
    "restart-safe ingest a 100 TB pipeline lands on). Hermetic "
    "per-invocation sink + checkpoint, result detached before scratch "
    "removal.",
    tags=("streaming", "sink", "exactly-once", "partitioning"),
)
def stream_file_sink_exactly_once(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    scratch = new_scratch_dir(f"filesink_{sf_tag}")
    out_dir = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")
    drain_to_files(spark, sf_dir, out_dir, ckpt)
    # second drain, same checkpoint: the commit log marks the input file
    # done — nothing new may be written (re-delivery = duplicate rows,
    # which the distinct-id column in the oracle-checked output exposes)
    drain_to_files(spark, sf_dir, out_dir, ckpt)
    out = (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("event_id").alias("n_distinct_ids"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
    )
    return detach_result(out, scratch)
