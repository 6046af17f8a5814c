"""Round-7 driver-round additions, wave 1: production observability,
Spark-4 SQL sugar, multiset set-ops, exact second-moment statistics,
distribution bucketing, marketing attribution, and schema-drift reads.

Grounding: the reference pipeline is a production service (estimate_queue.py
runs per-station on a schedule, tasks.py:32-41 memoizes daily outputs) —
the operational surfaces a team running the SAME pipeline over 100 TB asks
for next are exactly these: metrics on every scan (observe), bounded SQL
for ad-hoc analysis (GROUP BY ALL), duplicate-aware reconciliation
(INTERSECT/EXCEPT ALL), numerically exact grouped statistics (integer
power sums — the reference's estimator math, estimate_queue.py:111-163,
done without float drift), percentile bucketing for SLA reporting,
conversion attribution over the event stream, and reads that survive a
producer adding a column mid-stream.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir


# --- observability: metrics on the scan itself ------------------------


@register(
    "scan_observe_metrics",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS row_count,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents_sum,
               CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
               CAST(max(l_orderkey) AS BIGINT) AS max_orderkey
        FROM lineitem
    """,
    doc="Observation API: named accumulator-backed metrics attached to "
    "the lineitem scan and harvested after ONE pass (a noop-format "
    "write drives the action — no collect, no second job, no rows to "
    "the driver beyond the five scalars). This is how a 100 TB "
    "pipeline self-reports row counts / control totals without "
    "re-reading anything: the metrics ride the same job that does the "
    "work. The returned single-row frame is the harvested metrics; "
    "the oracle recomputes them relationally, so the hash gate proves "
    "observe() saw every row exactly once.",
    tags=("scan", "observability", "scale"),
)
def scan_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The observed action runs on an ISOLATED child session: a completed
    # Observation can linger in the session's ObservationManager long
    # enough (py4j release lag) that a LATER unrelated job on the same
    # session dies with "Task not serializable:
    # org.apache.spark.sql.classic.ObservationManager" when its closure
    # cleaner walks the session state (observed: MLlib
    # BinaryClassificationEvaluator.evaluate right after this query).
    # newSession() shares the SparkContext but owns its manager, so the
    # caller's session stays clean no matter when the JVM object dies.
    ns = spark.newSession()
    li = load_table(ns, sf_dir, "lineitem")
    obs = Observation(f"scan_metrics_{uuid.uuid4().hex[:8]}")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents_sum"
        ),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
    )
    # noop sink: full distributed scan, zero rows back to the driver —
    # the one action the metrics need, the cheapest one possible
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    cols = [
        "row_count",
        "qty_sum",
        "price_cents_sum",
        "min_orderkey",
        "max_orderkey",
    ]
    return spark.createDataFrame(
        [tuple(int(m[c]) for c in cols)],
        schema=", ".join(f"{c} long" for c in cols),
    )


# --- Spark 4 SQL sugar: GROUP BY ALL / ORDER BY ALL --------------------


@register(
    "sql_group_by_all",
    oracle="""
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
    """,
    doc="GROUP BY ALL + ORDER BY ALL (Spark 3.4+/4 and DuckDB agree on "
    "the inference rule: group on every non-aggregate select item, "
    "order on every select item left-to-right) — the ad-hoc-analysis "
    "sugar that keeps hand-written 100 TB SQL from silently dropping "
    "a grouping key when a column is added to the select list.",
    tags=("sql", "agg"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"lineitem_gba_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    try:
        out = spark.sql(f"""
            SELECT l_returnflag AS rf, l_linestatus AS ls,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
            FROM {view}
            GROUP BY ALL
            ORDER BY ALL
        """)
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(view)


# --- multiset set operations -------------------------------------------


@register(
    "set_intersect_except_all",
    oracle="""
        SELECT 'both' AS side, k FROM (
          SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
          INTERSECT ALL
          SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
        UNION ALL
        SELECT 'a_only' AS side, k FROM (
          SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
          EXCEPT ALL
          SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
    """,
    doc="INTERSECT ALL / EXCEPT ALL — duplicate-preserving (multiset) "
    "set ops via intersectAll/exceptAll: min(m,n) copies survive the "
    "intersection, max(m-n,0) the difference. The reconciliation "
    "primitive (ledger vs ledger, feed vs feed) where the DISTINCT "
    "forms would hide cardinality drift; Spark plans both as a single "
    "hash aggregate per side plus one join — no explosion.",
    tags=("setop",),
)
def set_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select(
        F.col("l_suppkey").alias("k")
    )
    r = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("k")
    )
    both = a.intersectAll(r).select(F.lit("both").alias("side"), "k")
    a_only = a.exceptAll(r).select(F.lit("a_only").alias("side"), "k")
    return both.unionByName(a_only)


# --- exact grouped second-moment statistics ----------------------------


@register(
    "stat_corr_covar_exact",
    oracle="""
        SELECT l_returnflag AS rf,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
                   AS covar_num,
               CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
                   AS var_x_num,
               CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT)
                   AS var_y_num
        FROM (
          SELECT l_returnflag,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(round(l_discount * 10000) AS BIGINT) AS y
          FROM lineitem
        )
        GROUP BY l_returnflag
    """,
    doc="Numerically EXACT grouped covariance/variance via integer power "
    "sums: x = quantity, y = discount in basis points; the emitted "
    "values are the integer numerators n*Sxy - Sx*Sy and n*Sxx - Sx^2 "
    "(covariance/variance times n^2) — corr's sign and magnitude are "
    "recoverable downstream, and the hash gate is immune to float "
    "summation order (Welford/pairwise differences across engines). "
    "One map-side-combined aggregate, no second pass; the float drift "
    "the reference's np.mean-based estimator tolerates on 36 rows "
    "(estimate_queue.py:111-136) is not tolerable on 100 TB. Bounds: "
    "qty<=50, bps<=1000, so n*Sxy fits int64 up to ~3.7e12 rows per "
    "group.",
    tags=("agg", "stats", "exact"),
)
def stat_corr_covar_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("y"),
    )
    agg = li.groupBy("rf").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return agg.select(
        "rf",
        "n",
        (n * F.col("sxy") - sx * sy).alias("covar_num"),
        (n * F.col("sxx") - sx * sx).alias("var_x_num"),
        (n * F.col("syy") - sy * sy).alias("var_y_num"),
    )


# --- distribution bucketing: cume_dist deciles -------------------------


@register(
    "window_cume_dist_deciles",
    oracle="""
        SELECT nationkey, decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS acctbal_cents_sum
        FROM (
          SELECT c_nationkey AS nationkey,
                 CAST(ceil(cume_dist() OVER (
                     PARTITION BY c_nationkey
                     ORDER BY CAST(round(c_acctbal * 100) AS BIGINT)
                 ) * 10) AS BIGINT) AS decile,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS cents
          FROM customer
        )
        GROUP BY nationkey, decile
    """,
    doc="cume_dist() decile bucketing, partitioned by nation so every "
    "window parallelizes (no global single-partition sort — the "
    "classic 100 TB window mistake). Ties share a decile (cume_dist "
    "is RANGE-framed over peers), so bucket assignment is order- "
    "deterministic without a tiebreaker; ceil(k/n*10) is identical "
    "across engines because k,n are the same integers and IEEE "
    "division/multiplication are deterministic. Output is the "
    "aggregated (nation, decile) profile in exact integer cents — "
    "the SLA/percentile report shape.",
    tags=("window", "distribution"),
)
def window_cume_dist_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_nationkey").orderBy(cents)
    per_row = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.ceil(F.cume_dist().over(w) * 10).alias("decile"),
        cents.alias("cents"),
    )
    return per_row.groupBy("nationkey", "decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("acctbal_cents_sum"),
    )


# --- marketing attribution over the event stream -----------------------


@register(
    "events_attribution_touch",
    oracle="""
        SELECT event_id, user_id, first_touch_type, first_touch_ts,
               last_touch_type, last_touch_ts, n_prior_touches
        FROM (
          SELECT event_id, user_id, event_type,
                 first_value(tt IGNORE NULLS) OVER w AS first_touch_type,
                 first_value(tts IGNORE NULLS) OVER w AS first_touch_ts,
                 last_value(tt IGNORE NULLS) OVER w AS last_touch_type,
                 last_value(tts IGNORE NULLS) OVER w AS last_touch_ts,
                 CAST(count(tt) OVER w AS BIGINT) AS n_prior_touches
          FROM (
            SELECT event_id, user_id, ts, event_type,
                   CASE WHEN event_type IN ('click', 'view')
                        THEN event_type END AS tt,
                   CASE WHEN event_type IN ('click', 'view')
                        THEN ts END AS tts
            FROM events
            WHERE event_type IN ('click', 'view', 'purchase')
          )
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        WHERE event_type = 'purchase'
    """,
    doc="First-touch / last-touch conversion attribution: for every "
    "purchase, the earliest and latest click-or-view by the same user "
    "STRICTLY before it (ROWS ... 1 PRECEDING) via first/last with "
    "ignoreNulls over a null-marked touch column — one keyed window, "
    "no self-join, no per-user collect. Purchases with no prior touch "
    "keep NULL attribution (organic). Deterministic because event "
    "timestamps are microsecond-unique per fixture (pinned by "
    "tests/test_streaming.py). At 100 TB this is one shuffle on "
    "user_id; the naive as-of self-join it replaces is two plus a "
    "range filter.",
    tags=("events", "window", "attribution"),
)
def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "view", "purchase"))
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.when(
                F.col("event_type").isin("click", "view"),
                F.col("event_type"),
            ).alias("tt"),
            F.when(
                F.col("event_type").isin("click", "view"), F.col("ts")
            ).alias("tts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.first("tt", ignorenulls=True).over(w).alias("first_touch_type"),
        F.first("tts", ignorenulls=True).over(w).alias("first_touch_ts"),
        F.last("tt", ignorenulls=True).over(w).alias("last_touch_type"),
        F.last("tts", ignorenulls=True).over(w).alias("last_touch_ts"),
        F.count("tt").over(w).alias("n_prior_touches"),
    )
    return attributed.where(F.col("event_type") == "purchase").drop(
        "event_type"
    )


# --- schema-drift reads: parquet mergeSchema ---------------------------


@register(
    "scan_parquet_merge_schema",
    oracle="""
        SELECT channel,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM (
          SELECT CAST(NULL AS VARCHAR) AS channel,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders WHERE o_orderstatus = 'O'
          UNION ALL
          SELECT CASE WHEN o_custkey % 2 = 0 THEN 'web' ELSE 'store' END,
                 CAST(round(o_totalprice * 100) AS BIGINT)
          FROM orders WHERE o_orderstatus = 'F'
        )
        GROUP BY channel
    """,
    doc="Producer-side schema drift survived at read time: an old batch "
    "(custkey, cents) and a new batch that ADDED a channel column land "
    "in the same dataset; option(mergeSchema=true) unifies the footers "
    "at planning time and old rows surface NULL for the new column — "
    "no rewrite of historical data (the only affordable answer when "
    "history is 100 TB). mergeSchema costs a footer read per file, so "
    "production pins the superset schema instead; the row demonstrates "
    "the drift-discovery path. Aggregated by channel; the oracle "
    "recomputes both generations relationally.",
    tags=("scan", "schema-evolution"),
)
def scan_parquet_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = new_scratch_dir("merge_schema")
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    old = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"), cents
    )
    new = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey"),
        cents,
        F.when(F.col("o_custkey") % 2 == 0, F.lit("web"))
        .otherwise(F.lit("store"))
        .alias("channel"),
    )
    old.write.mode("overwrite").parquet(f"{scratch}/gen=1")
    new.write.mode("overwrite").parquet(f"{scratch}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{scratch}/gen=1", f"{scratch}/gen=2"
    )
    out = merged.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("cents_sum"),
    )
    return detach_result(out, scratch)
