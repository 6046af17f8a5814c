"""Parquet table loaders for the driver testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
At 100 TB these would be partitioned datasets (partitioned by date /
station_id per SURVEY.md §4); the loader API is directory-shaped so swapping
a partitioned layout in changes nothing upstream — Catalyst still gets
predicate pushdown + column pruning from the parquet scan either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    # Timestamp normalization: the driver regenerates testdata between
    # rounds and the parquet annotation has drifted — round 1 wrote
    # TIMESTAMP(NANOS) (arrives as long nanos under
    # spark.sql.legacy.parquet.nanosAsLong, session.RUNTIME_CONFS); round 2+
    # writes TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads
    # as TIMESTAMP_NTZ. Everything downstream (unix_micros, withWatermark,
    # window()) requires plain TIMESTAMP, so normalize both lanes here —
    # lossless because the session timezone is pinned UTC (session.py).
    fixes = {}
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        fixes["ts"] = F.expr("timestamp_micros(ts div 1000)")
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            fixes[col] = F.col(col).cast("timestamp")
    if fixes:
        df = df.withColumns(fixes)
    return df


def fan_out(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Conditionally repartition a narrow-input frame so CPU-heavy
    downstream work (explode/Expand, JSON parsing, higher-order functions,
    Python UDFs) parallelizes.

    A single compacted parquet file with one row group scans as ONE input
    split, serializing everything until the next exchange; real clusters
    facing an unsplittable file repartition exactly like this. The guard
    makes it a structural NO-OP at scale: when the scan already has at
    least half the core count in splits (the 100 TB case — thousands of
    files), no exchange is added. With ``keys`` the repartition is keyed
    (reusable by a downstream groupBy on the same keys); otherwise
    round-robin. The explicit numPartitions keeps AQE from coalescing the
    small-by-bytes exchange back down (byte-based sizing can't see
    per-row CPU cost).
    """
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, want // 2):
        return df
    if keys:
        return df.repartition(want, *[F.col(k) for k in keys])
    return df.repartition(want)


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so SQL-form plans can refer to tables by name."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame, out_dir: str, partition_cols: list[str]
) -> None:
    """Partitioned parquet sink — the layout that buys partition pruning on
    every downstream read (reference's prefix-scoped S3 layout, tasks.py:19-29,
    done properly)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_dir)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_col) at write
    time so joins/aggregations on that key read shuffle-free — the 100 TB
    strategy for repeated fact-fact joins (bucket both sides identically;
    Catalyst elides the Exchange, verified in tests/test_bucketing.py)."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def compact_partitioned(
    spark: SparkSession,
    data_dir: str,
    partition_cols: list[str],
    target_bytes_per_file: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction for a partitioned parquet dataset.

    The operational job every long-lived 100 TB table needs: streaming
    micro-batches and per-key upserts accrete many small files per
    partition; reads then pay per-file open/footer costs and lose scan
    parallelism granularity. This rewrites each partition into
    ``ceil(partition_bytes / target_bytes_per_file)`` files via a
    partition-column repartition (one shuffle whose output IS the new
    layout — no driver-side looping over partitions).

    Returns {"files_before": n, "files_after": m} so callers/tests can
    assert the consolidation. Idempotent: re-running on a compacted
    dataset is a near-no-op rewrite with the same file count.
    """
    import glob as _glob
    import math

    df = spark.read.parquet(data_dir)
    data_files = [
        f
        for f in _glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                            recursive=True)
        if os.path.isfile(f)
    ]
    total_bytes = sum(os.path.getsize(f) for f in data_files)
    n_parts = max(
        len(df.select(*partition_cols).distinct().limit(10000).collect()), 1
    )
    files_per_part = max(
        1,
        math.ceil(total_bytes / max(n_parts, 1) / target_bytes_per_file),
    )
    compacted = df.repartition(
        n_parts * files_per_part, *[F.col(c) for c in partition_cols]
    )
    tmp = data_dir.rstrip("/") + "__compact_tmp"
    compacted.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    # atomic-ish swap (local fs; object stores would write to a new prefix
    # and flip a pointer/manifest instead)
    import shutil

    shutil.rmtree(data_dir)
    os.replace(tmp, data_dir)
    after = [
        f
        for f in _glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                            recursive=True)
        if os.path.isfile(f)
    ]
    return {"files_before": len(data_files), "files_after": len(after)}
