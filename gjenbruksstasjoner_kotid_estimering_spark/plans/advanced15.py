"""Round-9 wave J — the point-in-time feature join.

Grounding: the reference IS a feature pipeline — estimate_queue.py
derives model inputs (hour, lanes, cars) from the latest camera sample
and scores them. The production generalization is a feature store, and
its defining operator is the POINT-IN-TIME join: training labels must
see feature values as they stood STRICTLY BEFORE the label's timestamp,
or the model trains on leaked future (the classic silent ML bug).
Stated here as windows whose frame ends at 1 PRECEDING — PIT-correct by
construction, not by filtering — and oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "events_feature_store_pit",
    oracle="""
        WITH feat AS (
            SELECT user_id, event_id, ts, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   count(*) OVER w AS prior_events,
                   count(*) FILTER (WHERE event_type = 'purchase')
                       OVER w AS prior_purchases,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT user_id, event_id,
               CAST(prior_events AS BIGINT) AS prior_events,
               CAST(prior_purchases AS BIGINT) AS prior_purchases,
               CAST(COALESCE(epoch_us(ts) - epoch_us(prev_ts), -1)
                    AS BIGINT) AS micros_since_prev,
               cents AS label_cents
        FROM feat
        WHERE event_type = 'purchase'
    """,
    doc="Point-in-time correct feature extraction — the feature-store "
    "operator: for every purchase (the training label), behavioral "
    "features computed from the user's history STRICTLY BEFORE the "
    "label event (prior event count, prior purchase count, exact "
    "microseconds since the previous event) — leakage-proof by frame "
    "construction (ROWS ... AND 1 PRECEDING ends before the current "
    "row), not by an error-prone timestamp filter. Deterministic "
    "(ts, event_id) ordering; one user_id exchange serves every "
    "feature column; the label value is exact integer cents. At "
    "100 TB this replaces the per-label correlated lookup (O(labels × "
    "history) and leak-prone) with one windowed pass over the event "
    "log — the standard offline feature-store backfill plan.",
    tags=("events", "window", "ml", "feature-store", "exact"),
)
def events_feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior = order.rowsBetween(Window.unboundedPreceding, -1)
    feat = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("label_cents"),
        F.count(F.lit(1)).over(prior).alias("prior_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .over(prior)
        .alias("prior_purchases"),
        F.lag("ts").over(order).alias("prev_ts"),
    )
    return feat.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "prior_events",
        "prior_purchases",
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros("prev_ts"), F.lit(-1)
        ).alias("micros_since_prev"),
        "label_cents",
    )
