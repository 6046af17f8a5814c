"""Event-analytics query shapes over the ``events`` stream table —
funnel conversion, cohort retention, Markov transition counts, and a
hierarchical multi-granularity rollup. All four are oracle-checked; time
arithmetic is exact integer microseconds (``epoch_us``) or date math, and
every money/value sum uses exact integer cents so no float accumulation
order can drift between engines.

These generalize the reference's "derive a per-entity timeline, then
aggregate" pattern (reference estimate_queue.py:133-178 builds per-station
time-keyed records) to the standard product-analytics suite a 100 TB
event warehouse runs daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import epoch_us
from ..io import load_table
from ..registry import register

FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "events_funnel",
    oracle="""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        ),
        s1 AS (
          SELECT user_id, min(us) AS t1 FROM ev
          WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, min(e.us) AS t2, min(s1.t1) AS t1
          FROM ev e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.us > s1.t1
          GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, min(e.us) AS t3
          FROM ev e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.us > s2.t2
          GROUP BY e.user_id
        ),
        users AS (SELECT DISTINCT user_id FROM ev)
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(count(s1.t1) AS BIGINT) AS n_view,
               CAST(count(s2.t2) AS BIGINT) AS n_view_click,
               CAST(count(s3.t3) AS BIGINT) AS n_full_funnel,
               CAST(coalesce(sum(s2.t2 - s2.t1), 0) AS BIGINT)
                 AS sum_us_view_to_click,
               CAST(coalesce(sum(s3.t3 - s2.t1), 0) AS BIGINT)
                 AS sum_us_view_to_purchase
        FROM users u
        LEFT JOIN s1 ON u.user_id = s1.user_id
        LEFT JOIN s2 ON u.user_id = s2.user_id
        LEFT JOIN s3 ON u.user_id = s3.user_id
    """,
    doc="Ordered conversion funnel view→click→purchase: each step's "
    "timestamp must strictly follow the previous step's (min qualifying "
    "time per user, the standard funnel semantics — a click BEFORE the "
    "first view does not count). Computed in ONE pass over events: the "
    "sequentially-dependent step times are chained conditional-min "
    "windows over user_id (t2 = min click with us > t1 references the "
    "t1 window result — three Window ops share one user_id exchange and "
    "one sort), collapsed per user, then one global fold. Conversion "
    "latencies are exact integer-µs sums. At 100 TB this is one events "
    "scan + one user-keyed shuffle of three narrow columns — the "
    "r17-measured before-shape was FOUR filtered events passes plus a "
    "distinct and three user-keyed joins (5 scans, 5 exchanges).",
    tags=("events", "funnel", "analytics", "window"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id")
    # chained conditional mins: each step's qualifying-time window
    # references the previous step's result, so Catalyst stacks three
    # Window operators over the SAME partitioning — one exchange, one
    # sort, zero self-joins. Null algebra gives the old join semantics
    # for free: no t1 ⇒ `us > t1` is NULL ⇒ t2 is NULL, etc.
    t1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w)
    )
    t2 = t1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") > F.col("t1")),
                F.col("us"),
            )
        ).over(w),
    )
    t3 = t2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") > F.col("t2")),
                F.col("us"),
            )
        ).over(w),
    )
    per_user = t3.groupBy("user_id").agg(
        F.min("t1").alias("t1"),
        F.min("t2").alias("t2"),
        F.min("t3").alias("t3"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
        F.coalesce(F.sum(F.col("t2") - F.col("t1")), F.lit(0))
        .cast("long")
        .alias("sum_us_view_to_click"),
        F.coalesce(
            F.sum(F.when(F.col("t3").isNotNull(), F.col("t3") - F.col("t1"))),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_us_view_to_purchase"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
        WITH act AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS d
          FROM events
        ),
        first AS (
          SELECT user_id, min(d) AS cohort_day FROM act GROUP BY user_id
        )
        SELECT f.cohort_day,
               CAST(date_diff('day', CAST(f.cohort_day AS DATE), CAST(a.d AS DATE)) AS BIGINT)
                 AS day_offset,
               CAST(count(*) AS BIGINT) AS n_active
        FROM act a JOIN first f ON a.user_id = f.user_id
        GROUP BY f.cohort_day, day_offset
    """,
    doc="Classic cohort retention matrix: cohort = a user's first active "
    "day, cell (cohort_day, day_offset) counts users from that cohort "
    "active offset days later. One pass: the (user, day) distinct (the "
    "only fact-sized shuffle, partial-deduped map-side) feeds a min-day "
    "window over user_id instead of a separate first-day aggregate "
    "joined back — the r17-measured before-shape evaluated the distinct "
    "subtree twice (2 events scans, 3 exchanges + a join). The output "
    "is cohort-days × offsets — tiny at any corpus scale.",
    tags=("events", "retention", "analytics", "agg"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    act = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
    )
    cohort = act.withColumn(
        "cohort_day", F.min("d").over(Window.partitionBy("user_id"))
    )
    return (
        cohort.groupBy(
            "cohort_day",
            F.datediff(F.to_date("d"), F.to_date("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "events_transition_matrix",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type AS from_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS to_type
          FROM events
        ),
        pairs AS (
          SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               CAST(n AS DOUBLE)
                 / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
                 AS p
        FROM pairs
    """,
    doc="First-order Markov transition matrix of the per-user event "
    "stream: adjacent (from, to) event-type pairs via a lead window "
    "ordered by exact event time (event_id tie-break), counted, with the "
    "row-conditional transition probability (single double division of "
    "exact integer counts). One user-keyed shuffle for the window; the "
    "pair aggregate is event-type²-sized — constant — so its exchange "
    "and the normalizing window are negligible at any scale.",
    tags=("events", "markov", "analytics", "window"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(total).cast("double")
        ).alias("p"),
    )


@register(
    "timeseries_rollup_cascade",
    oracle="""
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS bucket_ts,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT))
                      AS BIGINT) AS value_cents
          FROM events GROUP BY 1
        ),
        daily AS (
          SELECT date_trunc('day', bucket_ts) AS bucket_ts,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(value_cents) AS BIGINT) AS value_cents
          FROM hourly GROUP BY 1
        ),
        monthly AS (
          SELECT date_trunc('month', bucket_ts) AS bucket_ts,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(value_cents) AS BIGINT) AS value_cents
          FROM daily GROUP BY 1
        )
        SELECT 'hour' AS granularity, * FROM hourly
        UNION ALL SELECT 'day', * FROM daily
        UNION ALL SELECT 'month', * FROM monthly
    """,
    doc="Hypertable-style continuous-aggregate cascade: ONE fact-sized "
    "shuffle produces the hourly partials, then day and month roll up "
    "FROM the hourly frame (sums of sums — exact integer counts and "
    "cents, so re-aggregation is lossless). The naive form scans the "
    "fact table three times (the oracle does, for clarity); the cascade "
    "touches it once — the difference between 3×100 TB and 100 TB + "
    "two bucket-sized re-aggs. Value sums use exact integer cents "
    "(round(value·100) per row) — no float accumulation order anywhere.",
    tags=("events", "timeseries", "rollup", "agg"),
)
def timeseries_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("bucket_ts"),
        F.round(F.col("value") * 100.0, 0).cast("long").alias("cents"),
    )
    hourly = ev.groupBy("bucket_ts").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("value_cents")
    )
    hourly = hourly.localCheckpoint(eager=False)  # reused by 2 rollups + union
    daily = (
        hourly.groupBy(F.date_trunc("day", "bucket_ts").alias("bucket_ts"))
        .agg(F.sum("n").alias("n"), F.sum("value_cents").alias("value_cents"))
    )
    monthly = (
        daily.groupBy(F.date_trunc("month", "bucket_ts").alias("bucket_ts"))
        .agg(F.sum("n").alias("n"), F.sum("value_cents").alias("value_cents"))
    )
    tag = lambda df, g: df.select(  # noqa: E731
        F.lit(g).alias("granularity"),
        "bucket_ts",
        F.col("n").cast("long").alias("n"),
        F.col("value_cents").cast("long").alias("value_cents"),
    )
    return (
        tag(hourly, "hour")
        .unionAll(tag(daily, "day"))
        .unionAll(tag(monthly, "month"))
    )


@register(
    "events_pattern_peaks",
    oracle="""
        WITH ordered AS (
          SELECT user_id, value,
                 lag(value) OVER w AS prev_v,
                 lead(value) OVER w AS next_v,
                 CASE WHEN lag(value) OVER w IS NOT NULL
                           AND value > lag(value) OVER w
                      THEN 0 ELSE 1 END AS brk,
                 row_number() OVER w AS rn
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id)
        ),
        runs AS (
          SELECT user_id, rn,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY rn
                                ROWS UNBOUNDED PRECEDING) AS run_id
          FROM ordered
        ),
        run_len AS (
          SELECT user_id, run_id, count(*) AS len
          FROM runs GROUP BY user_id, run_id
        )
        SELECT o.user_id,
               CAST(count(*) FILTER (WHERE o.prev_v IS NOT NULL
                                       AND o.next_v IS NOT NULL
                                       AND o.value > o.prev_v
                                       AND o.value > o.next_v)
                    AS BIGINT) AS n_peaks,
               CAST(count(*) FILTER (WHERE o.prev_v IS NOT NULL
                                       AND o.next_v IS NOT NULL
                                       AND o.value < o.prev_v
                                       AND o.value < o.next_v)
                    AS BIGINT) AS n_valleys,
               CAST(max(l.max_len) AS BIGINT) AS max_inc_run
        FROM ordered o
        JOIN (SELECT user_id, max(len) AS max_len
              FROM run_len GROUP BY user_id) l
          ON o.user_id = l.user_id
        GROUP BY o.user_id
    """,
    doc="MATCH_RECOGNIZE-style sequence-pattern detection without the "
    "clause (Spark lacks it): per-user peak count (strict local "
    "maxima), valley count, and longest strictly-increasing run, all "
    "from lag/lead plus the reset-flag cumulative-sum island trick. "
    "Exact double comparisons on input values — no derived float "
    "arithmetic. ONE shuffle on user_id serves the lag/lead window, "
    "the running sum, and both per-user aggregates (keys are "
    "supersets). The relational form of V-shape / trend-break "
    "detection a time-series engine exposes as MATCH_RECOGNIZE.",
    tags=("events", "pattern", "window", "analytics"),
)
def events_pattern_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", "event_id", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    ordered = ev.select(
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
        F.when(
            F.lag("value").over(w).isNotNull()
            & (F.col("value") > F.lag("value").over(w)),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("brk"),
        F.row_number().over(w).alias("rn"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = ordered.withColumn("run_id", F.sum("brk").over(wsum))
    run_max = (
        runs.groupBy("user_id", "run_id")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("max_len"))
    )
    is_peak = (
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("value") > F.col("prev_v"))
        & (F.col("value") > F.col("next_v"))
    )
    is_valley = (
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("value") < F.col("prev_v"))
        & (F.col("value") < F.col("next_v"))
    )
    return (
        ordered.join(run_max, "user_id")
        .groupBy("user_id")
        .agg(
            F.count_if(is_peak).alias("n_peaks"),
            F.count_if(is_valley).alias("n_valleys"),
            F.max("max_len").cast("long").alias("max_inc_run"),
        )
    )


@register(
    "recursive_cte_hierarchy",
    oracle="""
        WITH RECURSIVE users AS (
          SELECT DISTINCT user_id FROM events
        ),
        tree(user_id, depth, root_id, path) AS (
          SELECT user_id, 0, user_id, CAST(user_id AS VARCHAR)
          FROM users WHERE user_id < 2
          UNION ALL
          SELECT u.user_id, t.depth + 1, t.root_id,
                 t.path || '/' || CAST(u.user_id AS VARCHAR)
          FROM users u JOIN tree t ON u.user_id // 2 = t.user_id
          WHERE u.user_id >= 2
        )
        SELECT user_id, CAST(depth AS BIGINT) AS depth,
               root_id, path
        FROM tree
    """,
    doc="NATIVE recursive CTE (Spark 4 WITH RECURSIVE): the user base "
    "forms an implicit binary referral tree (parent = user_id div 2); "
    "the recursion walks root→leaves accumulating depth, root id, and "
    "the materialized '/'-joined path — the org-chart / "
    "bill-of-materials traversal shape, expressed in ANSI recursion on "
    "BOTH engines rather than a hand-rolled iterative loop "
    "(dedup_clusters keeps the loop form for comparison; this is the "
    "declarative twin). Terminates structurally (child > parent); each "
    "recursive step is one join against the frontier, exactly how "
    "Spark executes it — frontier-sized state, not path-enumeration "
    "blowup.",
    tags=("recursive", "cte", "hierarchy", "sql"),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    # localCheckpoint: the recursive step re-executes its plan every
    # UnionLoop iteration, so an uncached distinct would re-scan and
    # re-aggregate the fact table once per tree level. View name is
    # sf-tagged (the streaming-drain convention) so interleaved builds
    # at different scales cannot bind each other's user sets.
    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    view = f"_rec_users_{sf_tag}"
    users.createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH RECURSIVE tree(user_id, depth, root_id, path) AS (
          SELECT user_id, 0, user_id, CAST(user_id AS STRING)
          FROM {view} WHERE user_id < 2
          UNION ALL
          SELECT u.user_id, t.depth + 1, t.root_id,
                 CONCAT(t.path, '/', CAST(u.user_id AS STRING))
          FROM {view} u JOIN tree t ON u.user_id div 2 = t.user_id
          WHERE u.user_id >= 2
        )
        SELECT user_id, CAST(depth AS BIGINT) AS depth, root_id, path
        FROM tree
    """)


PATH_LEN = 3  # trigram paths
TOP_PATHS = 20


@register(
    "events_top_paths",
    oracle=f"""
        WITH seq AS (
          SELECT event_type,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_type || '>' || e2 || '>' || e3 AS path,
               CAST(count(*) AS BIGINT) AS n
        FROM seq
        WHERE e3 IS NOT NULL
        GROUP BY 1
        ORDER BY n DESC, path
        LIMIT {TOP_PATHS}
    """,
    doc="Top event paths (behavioral sequence mining): each user's "
    "timeline ordered by (ts, event_id) yields consecutive "
    f"{PATH_LEN}-grams of event types via lead() — one shuffle on "
    "user_id, no self-joins however long the sequences — then a global "
    f"count with deterministic (count DESC, path) top-{TOP_PATHS} via "
    "TakeOrdered, never a full sort. The 'what do users do before X' "
    "query every product-analytics warehouse runs; at 100 TB the "
    "per-user window is the only stateful step and paths partial-"
    "aggregate map-side.",
    tags=("events", "analytics", "sequence", "topk"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(TOP_PATHS)
    )
