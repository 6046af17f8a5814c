"""Round-4 engine-surface additions: value-run gaps-and-islands and the
absolute-nearest as-of join, completing the as-of family
(backward = operators/asof_interp.join_asof_nearest, forward =
join_asof_forward, tolerance = join_asof_tolerance).

Both are single-shuffle window plans on the session key — the shape that
scales: partition once on user_id, and every window, running sum, and
final aggregate reuses that partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "window_islands_runs",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn_type
            FROM events
        )
        SELECT user_id, event_type,
               CAST(rn - rn_type AS BIGINT) AS island_key,
               CAST(count(*) AS BIGINT) AS run_len,
               min(ts) AS run_start,
               max(ts) AS run_end,
               CAST(min(event_id) AS BIGINT) AS first_event_id
        FROM ordered
        GROUP BY user_id, event_type, rn - rn_type
    """,
    doc="Gaps-and-islands over VALUES (not time): maximal runs of "
    "consecutive same-event_type rows per user via the classic "
    "rn − rn_per_value island key (two row_numbers, one subtraction — "
    "no self-join, no iteration). The value-run twin of "
    "sessionize_gaps' time-gap islands; finds streaks (N consecutive "
    "errors), state episodes, and repeated-status runs. Both "
    "row_numbers and the final aggregate share ONE shuffle on user_id "
    "(the second window's key is a superset).",
    tags=("window", "islands", "session"),
)
def window_islands_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    islands = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (
            F.row_number().over(w_all) - F.row_number().over(w_type)
        ).cast("long").alias("island_key"),
    )
    return islands.groupBy("user_id", "event_type", "island_key").agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min("ts").alias("run_start"),
        F.max("ts").alias("run_end"),
        F.min("event_id").cast("long").alias("first_event_id"),
    )


@register(
    "join_asof_abs_nearest",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value
            FROM events
        ),
        both_sides AS (
            SELECT event_id, user_id, us,
                   last_value(CASE WHEN event_type = 'error' THEN value END
                              IGNORE NULLS) OVER back AS bv,
                   last_value(CASE WHEN event_type = 'error' THEN us END
                              IGNORE NULLS) OVER back AS bu,
                   first_value(CASE WHEN event_type = 'error' THEN value END
                               IGNORE NULLS) OVER fwd AS fv,
                   first_value(CASE WHEN event_type = 'error' THEN us END
                               IGNORE NULLS) OVER fwd AS fu
            FROM e
            WINDOW back AS (PARTITION BY user_id ORDER BY us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW),
                   fwd AS (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN CURRENT ROW
                                    AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id, user_id,
               CASE WHEN bu IS NULL AND fu IS NULL THEN NULL
                    WHEN fu IS NULL THEN bv
                    WHEN bu IS NULL THEN fv
                    WHEN us - bu <= fu - us THEN bv
                    ELSE fv END AS nearest_error_value,
               CAST(CASE WHEN bu IS NULL AND fu IS NULL THEN NULL
                         WHEN fu IS NULL THEN us - bu
                         WHEN bu IS NULL THEN fu - us
                         ELSE least(us - bu, fu - us) END
                    AS BIGINT) AS nearest_error_dist_us
        FROM both_sides
    """,
    doc="Absolute-nearest as-of join: each event sees the 'error' "
    "reading closest in time in EITHER direction (backward wins exact "
    "ties — the deterministic convention), plus the exact integer-"
    "microsecond distance. Composition of the backward and forward "
    "windowed as-ofs in one pass: two frames over the SAME ordered "
    "partition = still one shuffle on user_id, no join. The semantics "
    "of pandas.merge_asof(direction='nearest') at engine scale.",
    tags=("join", "asof", "window"),
)
def join_asof_abs_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    mv = F.when(F.col("event_type") == "error", F.col("value"))
    mu = F.when(F.col("event_type") == "error", F.col("us"))
    sides = ev.select(
        "event_id",
        "user_id",
        "us",
        F.last(mv, ignorenulls=True).over(back).alias("bv"),
        F.last(mu, ignorenulls=True).over(back).alias("bu"),
        F.first(mv, ignorenulls=True).over(fwd).alias("fv"),
        F.first(mu, ignorenulls=True).over(fwd).alias("fu"),
    )
    back_dist = F.col("us") - F.col("bu")
    fwd_dist = F.col("fu") - F.col("us")
    value = (
        F.when(F.col("bu").isNull() & F.col("fu").isNull(), F.lit(None))
        .when(F.col("fu").isNull(), F.col("bv"))
        .when(F.col("bu").isNull(), F.col("fv"))
        .when(back_dist <= fwd_dist, F.col("bv"))
        .otherwise(F.col("fv"))
    )
    dist = (
        F.when(F.col("bu").isNull() & F.col("fu").isNull(), F.lit(None))
        .when(F.col("fu").isNull(), back_dist)
        .when(F.col("bu").isNull(), fwd_dist)
        .otherwise(F.least(back_dist, fwd_dist))
    )
    return sides.select(
        "event_id",
        "user_id",
        value.alias("nearest_error_value"),
        dist.cast("long").alias("nearest_error_dist_us"),
    )


@register(
    "string_collation_ci",
    oracle="""
        WITH mixed AS (
          SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                      ELSE lower(p_type) END AS t
          FROM part
        )
        SELECT lower(t) AS p_type_ci,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT t) AS BIGINT) AS n_case_variants
        FROM mixed GROUP BY lower(t)
    """,
    doc="Spark 4 collation support: part types are deliberately "
    "case-scrambled (even keys UPPER, odd lower), then grouped under "
    "the UNICODE_CI collation — the engine merges case variants in the "
    "grouping comparator itself, no lower() normalization column — "
    "while count(DISTINCT t) inside the group still runs binary-collated "
    "and counts the variants that were merged. Output key is lowered + "
    "cast back to the default collation so both engines canon "
    "identically (the oracle mirrors with GROUP BY lower(); exact for "
    "this ASCII domain, where CI equivalence == case folding).",
    tags=("string", "collation", "agg"),
)
def string_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.lower("p_type"))
        .alias("t")
    )
    return (
        mixed.groupBy(F.collate(F.col("t"), "UNICODE_CI").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("t")).alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("p_type_ci"),
            "n",
            "n_case_variants",
        )
    )
