"""Window-function plans (SURVEY.md §2 Part B "Window fns", "Sort/limit").

Grounding: "first object under prefix" (reference preprocess_image.py:27) is
a ranking window; the interp bracket uses lead-over-points
(operators/asof_interp.py); queue evolution per station over time (the
domain's prediction series) motivates frame aggregates.

Determinism: every window ORDER BY carries a unique tiebreaker column
(event_id / o_orderkey) so row_number and frame contents are reproducible —
a window ordered on a non-unique key is nondeterministic in ANY engine and
would fail the oracle by construction.

Scale: windows partitioned by a high-cardinality key (user, customer)
shuffle once on the partition key; no global sort anywhere except the
explicit top-k, which Spark executes as TakeOrderedAndProject (no full
sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "window_rank",
    oracle="""
        SELECT * FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER w AS rn,
                 rank()       OVER w AS rnk,
                 dense_rank() OVER w AS drnk
          FROM customer
          WINDOW w AS (PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey)
        ) WHERE rn <= 5
    """,
    doc="row_number/rank/dense_rank per segment, top-5 — the set form of "
    "'take the first object under the prefix' (preprocess_image.py:27).",
    tags=("window", "rank"),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 5)
    )


@register(
    "window_lag_lead",
    oracle="""
        SELECT event_id, user_id, ts, value,
               lag(value)  OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               value - lag(value) OVER w AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead per station (user) over the event time series — the "
    "point-bracketing primitive behind the interp join "
    "(estimate_queue.py:136-140).",
    tags=("window", "lag"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lag_v = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        lag_v.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - lag_v).alias("delta"),
    )


@register(
    "window_frame_agg",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS running_cents,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents,
               count(*) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_n
        FROM events
    """,
    doc="Frame aggregates: running total + 3-row moving window per station — "
    "queue evolution over time (domain series, SURVEY.md §2 W-frame row). "
    "Cents-scaled so running sums are exact integers.",
    tags=("window", "frame"),
)
def window_frame_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100.0, 0).cast("long")
    df = ev.withColumn("_cents", cents)
    return df.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("_cents")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("running_cents"),
        F.sum("_cents").over(w.rowsBetween(-2, W.currentRow)).alias("moving_cents"),
        F.count(F.lit(1))
        .over(w.rowsBetween(-2, W.currentRow))
        .alias("moving_n"),
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 2
    """,
    doc="Top-k per group via ranking window — at scale Spark rewrites "
    "rank-filter to a per-partition top-k (WindowGroupLimit), no full sort.",
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 2)
    )


@register(
    "explode_unpivot",
    oracle="""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    """,
    doc="Table-generating explode: tokenize documents and count tokens — the "
    "one-row-to-many shape of the reference's prediction-dict fanout "
    "(estimate_queue.py:85-88).",
    tags=("explode", "text"),
)
def explode_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "struct_map_funcs",
    oracle="""
        SELECT o_orderkey,
               o_orderstatus AS s_status,
               o_totalprice AS s_total,
               o_orderstatus AS m_status,
               concat(o_orderstatus, '|', o_orderpriority) AS packed
        FROM orders
    """,
    doc="Struct/map construction and field access (the reference's "
    "prediction dict, estimate_queue.py:85-88): build a struct and a map, "
    "project fields back out. Oracle states the equivalent flat values.",
    tags=("struct", "map"),
)
def struct_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("total")
    )
    m = F.create_map(F.lit("status"), F.col("o_orderstatus"))
    df = o.withColumn("_s", s).withColumn("_m", m)
    return df.select(
        "o_orderkey",
        F.col("_s.status").alias("s_status"),
        F.col("_s.total").alias("s_total"),
        F.element_at("_m", "status").alias("m_status"),
        F.concat_ws("|", F.col("_s.status"), F.col("o_orderpriority")).alias(
            "packed"
        ),
    )


@register(
    "array_funcs",
    oracle="""
        SELECT vec_id, label,
               len(embedding) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               list_aggregate(list_transform(embedding,
                   x -> CAST(x AS DOUBLE)), 'sum') AS vec_sum,
               list_max(list_transform(embedding,
                   x -> CAST(x AS DOUBLE))) AS vec_max,
               list_aggregate(list_transform(embedding[1:8],
                   x -> CAST(x AS DOUBLE)), 'sum') AS head_sum
        FROM embeddings
    """,
    doc="Array surface over the embedding vectors (the reference's flattened "
    "feature arrays, preprocess_image.py:195): size, element_at, slice, "
    "transform + ordered-fold aggregate, max. Elements cast to double "
    "before folding so both engines sum float32 identically.",
    tags=("array",),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    head = F.transform(F.slice(F.col("embedding"), 1, 8), lambda x: x.cast("double"))
    fold = lambda arr: F.aggregate(  # noqa: E731 — ordered left fold, exact parity
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        fold(as_double).alias("vec_sum"),
        F.array_max(as_double).alias("vec_max"),
        fold(head).alias("head_sum"),
    )


@register(
    "window_ntile",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cum_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="Distribution windows: ntile/percent_rank/cume_dist per segment — "
    "quantile bucketing for the quality-score stratification a training "
    "pipeline runs before sampling.",
    tags=("window", "ntile"),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@register(
    "window_first_last_nth",
    oracle="""
        SELECT event_id, user_id, value,
               first_value(value) OVER w AS first_v,
               last_value(value) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING) AS last_v,
               nth_value(value, 3) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING) AS third_v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="first_value/last_value/nth_value over the station time series — "
    "the boundary-reading analytics of the as-of family; last/nth use the "
    "full-partition frame (the default running frame would make them "
    "trivially equal to the current row).",
    tags=("window", "analytic"),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    running = W.partitionBy("user_id").orderBy("ts", "event_id")
    full = running.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.first("value").over(running).alias("first_v"),
        F.last("value").over(full).alias("last_v"),
        F.nth_value("value", 3).over(full).alias("third_v"),
    )


@register(
    "window_range_frame",
    oracle="""
        WITH e AS (SELECT event_id, user_id,
                          CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
                          CAST(round(value * 100.0, 0) AS BIGINT) AS cents
                   FROM events)
        SELECT event_id, user_id, epoch_s,
               CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY epoch_s
                    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cents_10m,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch_s
                    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10m
        FROM e
    """,
    doc="RANGE-framed window: per-station trailing 10-minute totals by "
    "VALUE distance on the epoch axis (rows at equal epoch share a frame — "
    "RANGE, unlike ROWS, is tie-stable so no unique tiebreaker is needed).",
    tags=("window", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.round(F.col("value") * 100.0, 0).cast("long").alias("_cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-600, W.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        "epoch_s",
        F.sum("_cents").over(w).alias("cents_10m"),
        F.count(F.lit(1)).over(w).alias("n_10m"),
    )


@register(
    "array_predicates",
    oracle="""
        SELECT vec_id,
               len(list_filter(embedding, x -> x > 2.0)) > 0 AS any_gt2,
               len(list_filter(embedding, x -> x > -10.0)) = len(embedding)
                 AS all_gt_neg10,
               CAST(len(list_filter(embedding, x -> x < 0.0)) AS INT)
                 AS n_negative,
               list_aggregate(list_transform(embedding[1:4],
                   (x, i) -> CAST(x AS DOUBLE) * CAST(i AS DOUBLE)), 'sum')
                 AS weighted_head
        FROM embeddings
    """,
    doc="Higher-order array predicates: exists / forall / filtered count / "
    "indexed zip-fold over the embedding vectors — the expression-level "
    "toolkit the similarity and dedup lanes are built from.",
    tags=("array", "hof"),
)
def array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head = F.slice(emb, 1, 4)
    idx = F.sequence(F.lit(1), F.size(head))
    return e.select(
        "vec_id",
        F.exists(emb, lambda x: x > 2.0).alias("any_gt2"),
        F.forall(emb, lambda x: x > -10.0).alias("all_gt_neg10"),
        F.size(F.filter(emb, lambda x: x < 0.0)).alias("n_negative"),
        F.aggregate(
            F.zip_with(
                head, idx, lambda x, i: x.cast("double") * i.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("weighted_head"),
    )


@register(
    "agg_histogram",
    oracle="""
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
               count(*) AS n,
               min(value) AS lo,
               max(value) AS hi
        FROM events
        GROUP BY CAST(floor(value / 50.0) AS BIGINT)
    """,
    doc="Equi-width histogram binning (floor-divide bucketing + grouped "
    "counts) — the distribution profile a pipeline computes before "
    "choosing sampling thresholds.",
    tags=("agg", "histogram"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50.0).cast("long")
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@register(
    "map_funcs",
    oracle="""
        SELECT o_orderkey,
               'status,priority' AS m_keys,
               concat(o_orderstatus, ',', o_orderpriority) AS m_values,
               o_orderstatus AS status_val,
               2 AS m_size,
               concat(o_orderstatus, '|', CAST(o_orderkey AS VARCHAR))
                 AS merged_probe
        FROM orders
    """,
    doc="Map surface: map_from_arrays construction, map_keys/map_values "
    "(canonical joined form), element access, map_concat — the engine's "
    "key-value column toolkit (the reference's prediction dict, "
    "estimate_queue.py:85-88). Oracle states equivalent flat values since "
    "map internals are engine-specific.",
    tags=("map",),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("priority")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    merged = F.map_concat(
        F.create_map(F.lit("id"), F.col("o_orderkey").cast("string")), m
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.array_join(F.map_values(m), ",").alias("m_values"),
        F.element_at(m, "status").alias("status_val"),
        F.size(m).alias("m_size"),
        F.concat_ws(
            "|", F.element_at(merged, "status"), F.element_at(merged, "id")
        ).alias("merged_probe"),
    )


@register(
    "window_running_distinct",
    oracle="""
        WITH firsts AS (
          SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                 CASE WHEN row_number() OVER (
                        PARTITION BY event_type, user_id
                        ORDER BY ts, event_id) = 1
                      THEN 1 ELSE 0 END AS is_first
          FROM events
        ),
        daily AS (
          SELECT event_type, day,
                 CAST(sum(is_first) AS BIGINT) AS new_users
          FROM firsts GROUP BY event_type, day
        )
        SELECT event_type, day, new_users,
               CAST(sum(new_users) OVER (
                      PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cumulative_distinct_users
        FROM daily
    """,
    doc="Running COUNT(DISTINCT) — the window aggregate SQL engines "
    "refuse to evaluate directly (distinct state per frame) — via the "
    "standard linearization: a per-(group, user) first-occurrence flag "
    "(row_number = 1), daily sums of new users, then a cumulative sum "
    "over days. Three window/agg steps that all shuffle on bounded keys "
    "— no per-frame distinct state however long the history grows, "
    "which is why every 100 TB 'cumulative uniques' dashboard computes "
    "it exactly this way.",
    tags=("window", "distinct", "cumulative", "events"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_first = W.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    firsts = ev.select(
        "event_type",
        # string day: Spark date objects and DuckDB datetime64 canon
        # differently — ISO strings hash identically on both engines
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.when(F.row_number().over(w_first) == 1, 1)
        .otherwise(0)
        .alias("is_first"),
    )
    daily = firsts.groupBy("event_type", "day").agg(
        F.sum("is_first").alias("new_users")
    )
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w_cum).alias("cumulative_distinct_users"),
    )
