"""Skew-mitigation patterns (SURVEY.md §2 "Partitioning & shuffle": salting
for skew; AQE skew-join is on globally via session.RUNTIME_CONFS).

``events`` is naturally skewed for grouping: ~15 stations and 5 event types
over the whole corpus, so a direct groupBy concentrates each key's entire
volume in one reducer. The salted form spreads each hot key over
``N_SALT`` partial groups (map-side), then re-aggregates the partials —
both stages shuffle tiny grouped rows, never a hot key's raw volume.
Results are identical to the direct aggregate (the oracle proves it), and
everything summed is integer-exact so the two-stage reassembly cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

N_SALT = 16


@register(
    "agg_salted_skew",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT)
                 AS sum_value_cents,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
    doc="Salted two-stage aggregation over a hot-keyed stream (5 event "
    "types × all rows): stage 1 groups by (key, salt) spreading each hot "
    "key over 16 reducers, stage 2 merges the 16 partials per key — "
    "identical result to the direct aggregate (the oracle IS the direct "
    "form), no reducer ever sees a whole hot key.",
    tags=("agg", "skew", "salt"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(N_SALT)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).alias("_cents"),
        F.min("value").alias("_min"),
        F.max("value").alias("_max"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        F.sum("_cents").alias("sum_value_cents"),
        F.min("_min").alias("min_value"),
        F.max("_max").alias("max_value"),
    )


@register(
    "join_salted_skew",
    oracle="""
        SELECT e.event_id, e.event_type, e.value, d.weight
        FROM events e
        JOIN (
            SELECT DISTINCT event_type,
                   CAST(length(event_type) AS BIGINT) AS weight
            FROM events
        ) d USING (event_type)
    """,
    doc="Salted SKEWED JOIN: every fact row of a hot key (5 event types "
    "carry the whole corpus) would land on one reducer in a plain "
    "shuffle join; instead the fact side gets a deterministic salt "
    "(event_id mod 16) and the dim side is REPLICATED 16× (explode over "
    "the salt range), so the join key becomes (key, salt) and each hot "
    "key spreads over 16 reducers. hint('merge') forces the shuffle-join "
    "path the pattern exists for — with a broadcastable dim you'd "
    "broadcast instead; this is the fact-vs-too-big-to-broadcast shape. "
    "Join output is row-identical to the unsalted join (the oracle IS "
    "the plain join). AQE's skewedJoin handles the same problem "
    "adaptively; explicit salting is the portable, planner-independent "
    "form.",
    tags=("join", "skew", "salt"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("long"))
    )
    salted_fact = ev.withColumn(
        "_salt", F.pmod(F.col("event_id"), F.lit(N_SALT)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
    )
    return (
        salted_fact.hint("merge")
        .join(salted_dim, ["event_type", "_salt"])
        .select("event_id", "event_type", "value", "weight")
    )
