"""TRUE-streaming stream-static broadcast enrichment.

The single most common production streaming topology: an unbounded
fact stream joined to a small static dimension (feature store, config
table, account directory). Spark plans the static side as a broadcast
hash join INSIDE every micro-batch — no stream-stream state, no
watermark needed for the join itself, and the dim refreshes per batch
if the underlying files change. Grounding: the reference enriches each
incoming image's station_id with per-station model config
(estimate_queue.py:24-28 MODEL_SPECS) — this is that lookup done as a
streaming join instead of a dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from .file_stream import read_events_stream
from .windows import _drain_to_memory


@register(
    "stream_static_enrich_true",
    oracle="""
        SELECT s.s_nationkey AS nationkey,
               e.event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events e
        JOIN supplier s ON e.user_id % 100 = s.s_suppkey
        GROUP BY s.s_nationkey, e.event_type
    """,
    doc="TRUE streaming stream-static enrichment, oracle-checked: the "
    "events readStream joins the STATIC supplier dimension (user_id "
    "mod 100 -> s_suppkey, the same keyed-lookup shape as the "
    "reference's per-station MODEL_SPECS dict, estimate_queue.py:24-28) "
    "and aggregates per (nation, event_type) in COMPLETE mode. The "
    "static side broadcasts inside each micro-batch — no streaming "
    "state for the join, which is why this topology scales to any "
    "stream volume as long as the dim stays broadcastable. The "
    "drained table must hash-match the batch oracle: enrichment "
    "through the streaming path loses nothing.",
    tags=("streaming", "join", "enrich"),
)
def stream_static_enrich_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    enriched = events.join(
        F.broadcast(dim), events.user_id % 100 == dim.s_suppkey
    )
    agg = enriched.groupBy(
        F.col("s_nationkey").alias("nationkey"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "value_cents"
        ),
    )
    return _drain_to_memory(agg, "static_enrich", sf_dir, "complete")
