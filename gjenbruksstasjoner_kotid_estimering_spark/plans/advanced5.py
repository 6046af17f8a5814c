"""Round-6 driver-round additions, wave 2: hive-partitioned layout
pruning, table-argument UDTFs, and the frequent-items sketch.

Three more at-scale surfaces: directory-partitioned writes whose
partition column never touches the data files (the oldest and cheapest
data-skipping mechanism — a filter on the partition key prunes whole
directories at planning time), the Spark 4 UDTF TABLE(...) PARTITION BY
calling convention (per-group imperative logic with engine-managed
grouping — the set-based escape hatch that replaces driver-side loops),
and approx_top_k (Datasketches frequent-items): the heavy-hitters
sketch that replaces exact top-k when the key space no longer fits
anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir


# --- hive-partitioned scan pruning ------------------------------------

_PART_TYPE = "purchase"


@register(
    "scan_hive_partitioned",
    oracle=f"""
        SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events
        WHERE event_type = '{_PART_TYPE}'
        GROUP BY user_id % 10
    """,
    doc="Hive-style partitioned layout + partition pruning: events "
    "rewritten partitionBy(event_type) (one directory per type, the "
    "partition column encoded in the PATH, not the files), then a "
    "single-type query reads ONLY that directory — pruning happens at "
    "PLANNING time from the file listing, before any file is opened "
    "(cheaper than even footer-stats skipping). "
    "tests/test_advanced5.py pins PartitionFilters in the scan and "
    "that inputFiles() touches exactly the one partition's files. The "
    "oldest 100 TB layout decision there is: low-cardinality, "
    "always-filtered columns belong in the path. Oracle recomputes "
    "relationally from the unpartitioned table, so the hash proves the "
    "partitioned round-trip loses nothing.",
    tags=("scan", "partitioning", "pruning", "scale"),
)
def scan_hive_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch, part_dir = _write_partitioned_events(spark, sf_dir)
    out = (
        spark.read.parquet(part_dir)
        .where(F.col("event_type") == _PART_TYPE)
        .groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
    )
    return detach_result(out, scratch)


def _write_partitioned_events(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Write events partitioned by event_type under scratch; returns
    (scratch_root, partitioned_dir)."""
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    scratch = new_scratch_dir(f"hivepart_{sf_tag}")
    part_dir = os.path.join(scratch, "events_by_type")
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "value", "event_type")
        .write.mode("error")
        .partitionBy("event_type")
        .parquet(part_dir)
    )
    return scratch, part_dir


# --- UDTF with TABLE argument + PARTITION BY ---------------------------


@udtf(returnType="event_type: string, rank: int, value: double, event_id: long")
class PartitionTopK:
    """Per-partition top-3 by value: the engine hands eval() the rows of
    ONE partition in the declared ORDER BY; terminate() flushes at the
    partition boundary. Imperative per-group logic without collecting
    groups to the driver — state is O(k) per partition regardless of
    group size."""

    def __init__(self) -> None:
        self._rows: list[tuple[str, int, float, int]] = []

    def eval(self, row) -> None:  # noqa: D102 — rows arrive pre-sorted
        if len(self._rows) < 3:
            self._rows.append(
                (
                    row["event_type"],
                    len(self._rows) + 1,
                    row["value"],
                    row["event_id"],
                )
            )

    def terminate(self):  # noqa: D102
        yield from self._rows


@register(
    "udtf_table_arg_topk",
    oracle="""
        SELECT event_type, CAST(rank AS INT) AS rank, value, event_id
        FROM (
          SELECT event_type, value, event_id,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rank
          FROM events
        )
        WHERE rank <= 3
    """,
    doc="Spark 4 UDTF TABLE(...) argument with PARTITION BY / ORDER BY, "
    "fed by a map-side candidate pruner: a zero-shuffle mapInPandas "
    "keeps each Arrow batch's top-3 per event_type (any global top-3 "
    "row is in its batch's top-3 under the same total order), so only "
    "O(types x batches x 3) candidate rows ever cross into the UDTF, "
    "which the engine then groups by event_type, sorts (value DESC, "
    "event_id), and streams through eval() — O(k) state per group, "
    "never a per-group collect. At 100 TB the pruner bounds the Python "
    "row-at-a-time surface to the candidate set; without it the UDTF "
    "would pay per-row transport on the whole table (BENCH_r06's #5 "
    "slowest query). The oracle is the equivalent row_number window, "
    "so the Python path stays hash-checked. The declarative twin for "
    "plain top-k remains topk_per_group — a UDTF is the escape hatch, "
    "not the default.",
    tags=("udtf", "table-arg", "window", "python"),
)
def udtf_table_arg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    )

    def _partial_topk(batches):
        # Null alignment with the UDTF/oracle total order (value DESC,
        # event_id): pandas sort_values puts NaN last (na_position default)
        # exactly like Spark/DuckDB's DESC NULLS LAST, and dropna=False
        # keeps a NULL event_type as its own group instead of silently
        # dropping its rows (pandas groupby drops NaN keys by default).
        for pdf in batches:
            yield (
                pdf.sort_values(
                    ["value", "event_id"], ascending=[False, True]
                )
                .groupby("event_type", sort=False, dropna=False)
                .head(3)
            )

    candidates = ev.mapInPandas(_partial_topk, schema=ev.schema)
    candidates.createOrReplaceTempView("_events_topk_candidates")
    spark.udtf.register("partition_topk", PartitionTopK)
    return spark.sql(
        """
        SELECT event_type, rank, value, event_id
        FROM partition_topk(
          TABLE(SELECT event_type, value, event_id
                FROM _events_topk_candidates)
          PARTITION BY event_type
          ORDER BY (value DESC, event_id)
        )
        """
    )


# --- frequent-items sketch --------------------------------------------


@register(
    "agg_approx_top_k",
    oracle="""
        SELECT event_type AS item,
               CAST(count(*) AS BIGINT) AS est_count
        FROM events
        GROUP BY event_type
    """,
    doc="approx_top_k (Datasketches frequent-items) over the event-type "
    "stream, exploded to (item, est_count) rows (array output would "
    "break the driver's canonicalizer). With the key cardinality below "
    "the sketch's tracking capacity (5 types vs maxItemsTracked=10000) "
    "the sketch is EXACT — which is what lets the oracle hash-check a "
    "sketch aggregate at all; above capacity it degrades to "
    "guaranteed-error estimates, which is the 100 TB trade: heavy "
    "hitters over an unbounded key space in bounded memory, mergeable "
    "across partitions like the HLL lane (agg_hll_sketch). The exact "
    "twin for bounded keys stays profile_skew_keys.",
    tags=("agg", "sketch", "approx", "topk"),
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .agg(
            F.expr("approx_top_k(event_type, 5)").alias("tk")
        )
        .select(F.inline("tk"))
        .select(
            F.col("item"),
            F.col("count").cast("long").alias("est_count"),
        )
    )
