"""Round-2 engine-surface additions: interval (stream-stream-shaped)
joins, time-bounded dedup, null-safe equality join, and the TPC-H Q11
value-concentration shape.

The interval join is the batch twin of a Structured Streaming
stream-stream join (readStream a ⋈ readStream b ON key AND time-range):
the join condition — equi key + bounded time distance — is exactly what
the streaming engine uses to size its state-store retention (the range
bound IS the watermark horizon). Expressing it in batch keeps it
oracle-checkable; streaming/file_stream.py carries the infrastructure
twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "join_interval_events",
    oracle="""
        SELECT a.event_id AS view_id, b.event_id AS click_id,
               a.user_id,
               CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS lag_s
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts
         AND b.ts < a.ts + INTERVAL 10 MINUTE
         AND a.event_type = 'view' AND b.event_type = 'click'
        WHERE a.user_id < 30
    """,
    doc="Interval join (the stream-stream join shape): every 'view' event "
    "matches 'click' events by the same user within the following 10 "
    "minutes. Equi-join on user_id carries the shuffle; the time-range "
    "predicate is the join residual — in Structured Streaming this exact "
    "bound sizes state retention (watermark + 10 min), here it is the "
    "batch twin with a DuckDB oracle. Scoped to user_id < 30 for a "
    "compact gate result.",
    tags=("join", "interval", "streaming"),
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return (
        views.join(
            clicks,
            (views.user_id == clicks.c_user_id)
            & (clicks.click_ts >= views.view_ts)
            & (
                clicks.click_ts
                < views.view_ts + F.expr("INTERVAL 10 MINUTES")
            ),
        )
        .select(
            "view_id",
            "click_id",
            "user_id",
            (
                F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
            ).alias("lag_s"),
        )
    )


@register(
    "dedup_time_bounded",
    oracle="""
        WITH ranked AS (
          SELECT event_id, user_id, event_type, ts, value,
                 row_number() OVER (
                   PARTITION BY user_id, event_type,
                                date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn
          FROM events
        )
        SELECT event_id, user_id, event_type, ts, value
        FROM ranked WHERE rn = 1
    """,
    doc="Time-bounded dedup: first event per (user, type) per calendar "
    "hour — the batch semantics of streaming "
    "dropDuplicatesWithinWatermark, where the dedup key includes a "
    "bounded time scope so state can be evicted. Ranking window with the "
    "(ts, event_id) total order; at scale Spark keeps only rn=1 per "
    "partition frame (no full materialization). The streaming twin lives "
    "in streaming/file_stream.py (dropDuplicates inside the watermark).",
    tags=("dedup", "window", "streaming"),
)
def dedup_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy(
            "user_id", "event_type", F.date_trunc("hour", F.col("ts"))
        ).orderBy("ts", "event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


@register(
    "join_null_safe",
    oracle="""
        WITH probe AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN NULL
                      ELSE CAST(doc_id % 7 AS BIGINT) END AS k
          FROM documents
        ),
        dim AS (
          SELECT CAST(unnest([0,1,2,3]) AS BIGINT) AS k,
                 'g' || CAST(unnest([0,1,2,3]) AS VARCHAR) AS grp
          UNION ALL SELECT NULL, 'g_null'
        )
        SELECT p.doc_id, p.k, d.grp
        FROM probe p JOIN dim d ON p.k IS NOT DISTINCT FROM d.k
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match the dimension's NULL row instead of dropping out — the join "
    "semantics CDC merge keys need when NULL is a legitimate key value. "
    "Spark plans <=> as a hash join (null-safe keys hash like values), so "
    "the broadcast strategy is unchanged — contrast with the OR-based "
    "rewrite (k = d.k OR (k IS NULL AND d.k IS NULL)) which degrades to "
    "nested-loop.",
    tags=("join", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    probe = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise((F.col("doc_id") % 7).cast("long"))
        .alias("k"),
    )
    dim_rows = [(k, f"g{k}") for k in (0, 1, 2, 3)] + [(None, "g_null")]
    dim = d.sparkSession.createDataFrame(dim_rows, schema="k long, grp string")
    return probe.join(F.broadcast(dim), probe.k.eqNullSafe(dim.k)).select(
        "doc_id", probe.k.alias("k"), "grp"
    )


@register(
    "tpch_q11",
    oracle="""
        WITH supply_value AS (
            SELECT l.l_partkey,
                   CAST(sum(CAST(round(l.l_extendedprice * 100.0, 0)
                        AS BIGINT)) AS BIGINT) AS value_cents
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_2'
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, value_cents
        FROM supply_value
        WHERE value_cents > (
            SELECT CAST(sum(value_cents) AS DOUBLE) * 0.001
            FROM supply_value
        )
        ORDER BY value_cents DESC, l_partkey
    """,
    doc="TPC-H Q11 (important stock identification), adapted: per-part "
    "supply value from NATION_2's suppliers (lineitem-derived — no "
    "partsupp), keeping parts above 0.1% of the national total. The "
    "HAVING-against-global-fraction is a second aggregate over the "
    "ALREADY-AGGREGATED per-part frame, broadcast back as a scalar — the "
    "fact table is scanned once, the concentration threshold costs one "
    "tiny job. Exact cents make the > threshold comparison stable.",
    tags=("tpch", "agg", "subquery"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_2"
    )
    supply_value = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")
            ).alias("value_cents")
        )
    )
    thresh = supply_value.agg(
        (F.sum("value_cents").cast("double") * F.lit(0.001)).alias("cut")
    )
    return (
        supply_value.join(
            F.broadcast(thresh), F.col("value_cents") > F.col("cut")
        )
        .select("l_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), F.col("l_partkey"))
    )


@register(
    "window_ignore_nulls",
    oracle="""
        WITH sparse AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'error' THEN value END AS v
          FROM events WHERE user_id < 10
        )
        SELECT event_id, user_id, v,
               lag(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS carry_v
        FROM sparse
    """,
    doc="IGNORE NULLS analytics: carry-forward of a sparse signal (only "
    "'error' events carry a value) — prev non-null and running last "
    "non-null per user. Spark's functions API exposes ignorenulls on "
    "first/last but not lag, so prev_v uses the frame equivalence "
    "lag IGNORE NULLS ≡ last(v, ignorenulls) over rows(-∞, -1) — same "
    "single window sort serves both outputs, one shuffle on user_id. "
    "This is the gap-fill primitive behind sensor/feature forward-fill "
    "at 100 TB (the as-of join family expressed as a window).",
    tags=("window", "null", "analytic"),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    sparse = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = (
        F.last("v", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    carry = (
        F.last("v", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return sparse.select(
        "event_id", "user_id", "v",
        prev.alias("prev_v"), carry.alias("carry_v"),
    )


@register(
    "agg_bitwise",
    oracle="""
        SELECT event_type,
               bit_or(CAST(event_id % 256 AS BIGINT)) AS mask_or,
               bit_and(CAST(event_id % 256 AS BIGINT)) AS mask_and,
               bit_xor(CAST(event_id % 256 AS BIGINT)) AS mask_xor,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Bitwise aggregates (bit_or / bit_and / bit_xor) over a derived "
    "8-bit mask per event type — the flag-set union/intersection rollup "
    "of permission and feature-flag pipelines. All three are associative "
    "+ commutative, so they combine map-side like sums and are "
    "order-insensitive by construction (no cents trick needed).",
    tags=("agg", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mask = (F.col("event_id") % 256).cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_or(mask).alias("mask_or"),
            F.bit_and(mask).alias("mask_and"),
            F.bit_xor(mask).alias("mask_xor"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "explode_outer_slices",
    oracle="""
        WITH sliced AS (
          SELECT vec_id,
                 embedding[1 : CAST(vec_id % 3 AS INT)] AS arr
          FROM embeddings WHERE vec_id < 100
        ),
        tagged AS (
          SELECT vec_id,
                 CASE WHEN len(arr) = 0
                      THEN [{'pos': CAST(NULL AS INT),
                             'val': CAST(NULL AS DOUBLE)}]
                      ELSE list_transform(arr, (v, i) ->
                             {'pos': CAST(i - 1 AS INT),
                              'val': CAST(v AS DOUBLE)})
                 END AS entries
          FROM sliced
        )
        SELECT vec_id, e.pos AS pos, e.val AS val
        FROM (SELECT vec_id, unnest(entries) AS e FROM tagged)
    """,
    doc="posexplode_outer: fan out variable-length array slices KEEPING "
    "zero-length rows as (NULL, NULL) — the outer-join semantics of "
    "explode that row-count-preserving pipelines need (a doc with no "
    "attachments must survive the attachment fanout). The oracle "
    "emulates OUTER via a sentinel single-element list on empties — "
    "DuckDB's unnest drops them, which is exactly the difference under "
    "test.",
    tags=("explode", "array", "null"),
)
def explode_outer_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    sliced = e.select(
        "vec_id",
        F.slice(
            F.col("embedding"), 1, (F.col("vec_id") % 3).cast("int")
        ).alias("arr"),
    )
    return sliced.select(
        "vec_id",
        F.posexplode_outer("arr").alias("pos", "val"),
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("val").cast("double").alias("val"),
    )


@register(
    "map_hof_funcs",
    oracle="""
        SELECT event_id,
               'type=' || event_type || '!,user=' ||
                 CAST(user_id AS VARCHAR) || '!' AS upper_entries,
               'type=' || event_type AS filtered_entries,
               'type=' || event_type || '|' || event_type AS zipped_entries
        FROM events
        WHERE user_id < 5
    """,
    doc="Map higher-order functions: transform_values / map_filter / "
    "map_zip_with over a per-row constructed map, canonicalized to sorted "
    "'k=v' strings (map iteration order is engine-specific; the canonical "
    "form is the contract). The oracle states the expected OUTPUT "
    "directly — with literal keys the whole HOF chain folds to string "
    "concatenation, which is exactly what Catalyst's constant-folding "
    "cannot do here because values are per-row columns. All JVM-side "
    "expression work, zero shuffles.",
    tags=("map", "hof"),
)
def map_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 5)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("user")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    canon = lambda mm: F.concat_ws(  # noqa: E731
        ",",
        F.transform(
            F.array_sort(F.map_entries(mm)),
            lambda e: F.concat(e.key, F.lit("="), e.value),
        ),
    )
    bang = F.transform_values(m, lambda k, v: F.concat(v, F.lit("!")))
    filtered = F.map_filter(m, lambda k, v: k == "type")
    zipped = F.map_zip_with(
        filtered,
        filtered,
        lambda k, v1, v2: F.concat(v1, F.lit("|"), v2),
    )
    return ev.select(
        "event_id",
        canon(bang).alias("upper_entries"),
        canon(filtered).alias("filtered_entries"),
        canon(zipped).alias("zipped_entries"),
    )


@register(
    "array_funcs2",
    oracle="""
        WITH base AS (
          SELECT vec_id,
                 CAST(vec_id % 5 + 1 AS BIGINT) AS n,
                 list_transform(embedding[1:8],
                     v -> CAST(round(CAST(v AS DOUBLE) * 10.0, 0)
                          AS BIGINT)) AS deci
          FROM embeddings WHERE vec_id < 200
        )
        SELECT vec_id,
               CAST(n * (n + 1) / 2 AS BIGINT) AS seq_sum,
               CAST(len(flatten([deci[1:4], deci[5:8]])) AS INT) AS flat_len,
               CAST(len(list_distinct(deci)) AS INT) AS n_distinct,
               CAST(list_aggregate(
                   list_transform(list_zip(deci, list_reverse_sort(deci)),
                                  p -> p[1] * p[2]),
                   'sum') AS BIGINT) AS zip_dot
        FROM base
    """,
    doc="Array surface 2: sequence generation (+ fold to the closed-form "
    "sum, asserting generator semantics), flatten of re-sliced halves, "
    "array_distinct cardinality, and a zip_with dot product of the array "
    "against its descending sort — exercising sequence / flatten / "
    "array_distinct / sort_array(desc) / zip_with together on integer-"
    "quantized embedding prefixes (exact cross-engine arithmetic). Pure "
    "expression work on a pruned 8-element slice; no shuffle.",
    tags=("array", "hof"),
)
def array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    base = e.select(
        "vec_id",
        ((F.col("vec_id") % 5) + 1).cast("long").alias("n"),
        F.transform(
            F.slice(F.col("embedding"), 1, 8),
            lambda v: F.round(v.cast("double") * 10.0, 0).cast("long"),
        ).alias("deci"),
    )
    seq_sum = F.aggregate(
        F.sequence(F.lit(1).cast("long"), F.col("n")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    flat_len = F.size(
        F.flatten(
            F.array(
                F.slice(F.col("deci"), 1, 4), F.slice(F.col("deci"), 5, 4)
            )
        )
    )
    zip_dot = F.aggregate(
        F.zip_with(
            F.col("deci"),
            F.sort_array(F.col("deci"), asc=False),
            lambda x, y: x * y,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return base.select(
        "vec_id",
        seq_sum.alias("seq_sum"),
        flat_len.alias("flat_len"),
        F.size(F.array_distinct(F.col("deci"))).alias("n_distinct"),
        zip_dot.alias("zip_dot"),
    )


@register(
    "json_variant_get",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
               CAST(json_extract(props, '$.k') AS DOUBLE) / 10.0 AS k_scaled,
               (json_extract(props, '$.missing') IS NULL) AS missing_is_null
        FROM events
        WHERE user_id < 20
    """,
    doc="VARIANT semi-structured access (Spark 4): parse_json once into a "
    "binary variant, then typed variant_get path extraction — the "
    "open-schema ingestion pattern that replaces per-path string "
    "re-parsing (each json_extract re-tokenizes the whole document; a "
    "variant parses once and navigates an index). The oracle states the "
    "same paths via DuckDB's JSON extraction. Missing paths yield NULL, "
    "not errors — the semi-structured contract.",
    tags=("json", "variant"),
)
def json_variant_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        (F.variant_get(v, "$.k", "double") / F.lit(10.0)).alias("k_scaled"),
        F.variant_get(v, "$.missing", "string").isNull().alias(
            "missing_is_null"
        ),
    )


@register(
    "timeseries_gapfill",
    oracle="""
        WITH scoped AS (
          SELECT user_id, ts, value FROM events
          WHERE user_id < 5 AND event_type = 'error'
            AND ts < TIMESTAMP '2024-01-08 00:00:00'
        ),
        bounds AS (
          SELECT user_id,
                 date_trunc('hour', min(ts)) AS t0,
                 date_trunc('hour', max(ts)) AS t1
          FROM scoped GROUP BY user_id
        ),
        spine AS (
          SELECT user_id, unnest(generate_series(t0, t1,
                 INTERVAL 10 MINUTE)) AS slot
          FROM bounds
        ),
        slotted AS (
          SELECT user_id, time_bucket(INTERVAL 10 MINUTE, ts) AS slot,
                 CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT))
                      AS BIGINT) AS obs_cents
          FROM scoped GROUP BY user_id, slot
        )
        SELECT sp.user_id, sp.slot,
               sl.obs_cents,
               (sl.obs_cents IS NULL) AS is_gap,
               last_value(sl.obs_cents IGNORE NULLS) OVER (
                 PARTITION BY sp.user_id ORDER BY sp.slot
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS filled_cents
        FROM spine sp LEFT JOIN slotted sl
          ON sl.user_id = sp.user_id AND sl.slot = sp.slot
    """,
    doc="Time-series gap fill: per-user 10-minute calendar spine "
    "(sequence() generator — rows that DON'T exist in the source), left "
    "join of bucketed observations, then forward-fill through the gaps "
    "with last-IGNORE-NULLS. This is the canonical sensor/feature "
    "regularization op: generator + outer join + carry-forward window, "
    "all JVM-side. The spine generates from per-user bounds (not a "
    "global calendar), so a 100 TB run generates ~rows-present × "
    "fill-factor, never the cross product of all users × all time.",
    tags=("window", "generator", "join", "timeseries"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # Materialize the triple-filtered slice once: the spine bounds and
    # the slot aggregate each re-scanned events to rebuild it (2 fact
    # passes, measured r17); the slice is a handful of users' error rows.
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("user_id") < 5)
        & (F.col("event_type") == "error")
        & (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
    ).localCheckpoint(eager=False)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 10 MINUTES"))
        ).alias("slot"),
    )
    slotted = ev.groupBy(
        "user_id",
        F.window("ts", "10 minutes")["start"].alias("s_slot"),
    ).agg(
        F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).alias(
            "obs_cents"
        )
    ).withColumnRenamed("user_id", "s_user_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(
            slotted,
            (spine.user_id == F.col("s_user_id"))
            & (spine.slot == F.col("s_slot")),
            "left",
        )
        .select(
            spine.user_id,
            spine.slot,
            "obs_cents",
            F.col("obs_cents").isNull().alias("is_gap"),
            F.last("obs_cents", ignorenulls=True).over(w).alias(
                "filled_cents"
            ),
        )
    )
