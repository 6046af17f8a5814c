"""Statistics / profiling lane — table profiling, exact-moment
correlation + regression, and an A/B significance test, all
oracle-checked.

Cross-engine float discipline (the repo convention): every sum is an
exact integer sum (counts, cents, squared cents — BIGINT), and the final
statistic is a short fixed-order chain of +, −, ×, ÷ and sqrt, every one
of which IEEE-754 requires to be exactly rounded — so identical operand
order ⇒ identical bits on Spark and DuckDB. No float accumulations, no
libm transcendentals.

The reference's analytics surface is a single linear estimate
(reference estimate_queue.py:103-116, np.interp over calibration points);
this lane generalizes to the standard statistics a warehouse exposes
(profiling/ANALYZE, corr/regr_* aggregates, experiment readouts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

PROFILE_COLS = (
    "l_orderkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)


@register(
    "profile_columns",
    oracle=f"""
        {" UNION ALL ".join(
            f'''SELECT '{c}' AS column_name,
                       CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
                       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
                FROM lineitem'''
            for c in PROFILE_COLS
        )}
    """,
    doc="Table profiling (the ANALYZE/SUMMARIZE surface): per column — "
    "row count, null count, EXACT distinct count — emitted long-format "
    "so downstream quality checks join on column_name. One pass over "
    "the fact table; multiple exact distincts expand via Spark's "
    "Expand operator (rows × columns), the price of exactness — the "
    "100 TB form swaps in approx_count_distinct (see "
    "agg_approx_distinct) with the identical plan minus Expand.",
    tags=("stats", "profile", "agg"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    prof = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}")
            for c in PROFILE_COLS
        ],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in PROFILE_COLS],
    )
    # pivot the single aggregate row to long format by exploding an
    # array of per-column structs — ONE aggregate subtree in the plan
    # (a 5-way unionAll of selects over the same agg relies on exchange
    # reuse to avoid 5 full scans; this needs no reuse at all)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
            )
            for c in PROFILE_COLS
        ]
    )
    return (
        prof.select("n_rows", F.explode(per_col).alias("p"))
        .select(
            F.col("p.column_name").alias("column_name"),
            "n_rows",
            F.col("p.n_nulls").alias("n_nulls"),
            F.col("p.n_distinct").alias("n_distinct"),
        )
    )


@register(
    "stat_regression_exact",
    oracle="""
        WITH pts AS (
          SELECT event_type,
                 CAST(round(value * 100.0, 0) AS BIGINT) AS x,
                 CAST(hour(ts) AS BIGINT) AS y
          FROM events
        ),
        moments AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM pts GROUP BY event_type
        )
        SELECT event_type, n, sx, sy, sxx, syy, sxy,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
        FROM moments
    """,
    doc="Exact-moment Pearson correlation + least-squares slope per "
    "group (value-cents vs hour-of-day): the five sufficient moments "
    "are EXACT integer sums (so the shuffle carries six bigints per "
    "group and map-side combines), and r/slope are fixed-order chains "
    "of exactly-rounded IEEE ops (÷, ×, sqrt) — bit-stable across "
    "engines, unlike corr()'s engine-internal float accumulation "
    "order. At 100 TB moment magnitudes approach BIGINT limits ⇒ the "
    "production variant widens the sums to DECIMAL(38,0) with the "
    "same plan.",
    tags=("stats", "corr", "regression", "agg"),
)
def stat_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("long").alias("x"),
        F.hour("ts").cast("long").alias("y"),
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        "event_type",
        "n",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        (cov_n / (F.sqrt(var_x) * F.sqrt(var_y))).alias("r"),
        (cov_n / var_x).alias("slope"),
    )


@register(
    "events_ab_test",
    oracle="""
        WITH per_user AS (
          SELECT user_id, user_id % 2 AS variant,
                 max(CASE WHEN event_type = 'purchase'
                              AND value > 100.0 THEN 1 ELSE 0 END)
                   AS converted
          FROM events GROUP BY user_id
        ),
        arms AS (
          SELECT CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_a,
                 CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_b,
                 CAST(sum(converted) FILTER (WHERE variant = 0)
                      AS BIGINT) AS conv_a,
                 CAST(sum(converted) FILTER (WHERE variant = 1)
                      AS BIGINT) AS conv_b
          FROM per_user
        )
        SELECT n_a, n_b, conv_a, conv_b,
               CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
               CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
               (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE))) AS z
        FROM arms
    """,
    doc="Two-proportion z-test readout for an A/B split (variant = "
    "user_id parity, conversion = any purchase over 100): per-user conversion "
    "flags reduce to four exact integers, then rates and the pooled "
    "z-statistic are fixed-order exactly-rounded IEEE chains (÷, ×, "
    "sqrt — no libm). The whole experiment readout is ONE user-keyed "
    "aggregate plus a single-row reduction; at 100 TB the per-user "
    "frame partial-aggregates map-side and nothing else is "
    "fact-sized.",
    tags=("stats", "abtest", "agg"),
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 100.0),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    arms = per_user.agg(
        F.count_if(F.col("variant") == 0).alias("n_a"),
        F.count_if(F.col("variant") == 1).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (rate_a - rate_b) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        z.alias("z"),
    )


MIN_PAIR_SUPPORT = 2
TOP_BASKET_PAIRS = 100


@register(
    "basket_part_pairs",
    oracle=f"""
        WITH baskets AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        n_orders AS (
          SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
          FROM baskets
        ),
        item_counts AS (
          SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
          FROM baskets GROUP BY l_partkey
        ),
        pairs AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 CAST(count(*) AS BIGINT) AS n_pair
          FROM baskets a JOIN baskets b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= {MIN_PAIR_SUPPORT}
        )
        SELECT p.part_a, p.part_b, p.n_pair,
               ia.n_item AS n_a, ib.n_item AS n_b,
               CAST(p.n_pair AS DOUBLE) / CAST(o.n AS DOUBLE) AS support,
               CAST(p.n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
                 AS confidence_a_b,
               (CAST(p.n_pair AS DOUBLE) * CAST(o.n AS DOUBLE))
                 / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE))
                 AS lift
        FROM pairs p
        JOIN item_counts ia ON p.part_a = ia.l_partkey
        JOIN item_counts ib ON p.part_b = ib.l_partkey
        CROSS JOIN n_orders o
        ORDER BY n_pair DESC, part_a, part_b
        LIMIT {TOP_BASKET_PAIRS}
    """,
    doc="Market-basket association rules over order baskets: co-purchased "
    "part pairs with support, confidence and lift (exact integer counts; "
    "each statistic one fixed-order division chain). Pair generation "
    "collects each order's distinct item set with one exchange and "
    "emits the C(items,2) pairs map-side from the sorted array — TPC-H "
    "orders hold ≤7 items, and real baskets are similarly tiny, so the "
    "pair space is linear in orders at any scale and no order-keyed "
    "self-join (a second+third basket shuffle) is needed; min-support "
    "pruning happens IN the pair aggregate (HAVING) before the "
    "dimension joins, and the bounded result is TakeOrdered. The "
    "item-count and order-count sides are item-/one-row-sized and "
    "broadcast.",
    tags=("stats", "basket", "association", "join"),
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r17 optimization (guide §2.3 "aggregate before you shuffle" /
    # §2.4 "remove shuffles outright"): baskets are tiny (TPC-H orders
    # hold ≤7 distinct parts), so pair generation needs no order-keyed
    # SELF-JOIN at all — collect each order's distinct item set with ONE
    # exchange on l_orderkey (collect_set dedups, replacing the old
    # distinct's separate exchange) and emit the C(items,2) pairs
    # map-side from the sorted array. Before: 5 exchanges incl. a
    # duplicate-basket shuffle join; after: 3 (set build, pair count,
    # item count) — and at 100 TB the basket relation crosses the
    # network once instead of three times.
    sets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
        .localCheckpoint(eager=False)  # reused by pairs + item counts + n
    )
    # one-row order count folded back via broadcast cross join (the
    # text_bm25_rank stats pattern) — no eager driver-side action at
    # plan-build time, no snapshot constant baked into the plan
    n_orders = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    item_counts = (
        sets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    # sorted array ⇒ part_a < part_b for i < j by construction
    pair_structs = F.flatten(
        F.transform(
            "items",
            lambda x, i: F.transform(
                F.slice(F.col("items"), i + F.lit(2), F.size("items")),
                lambda y: F.struct(
                    x.alias("part_a"), y.alias("part_b")
                ),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_structs).alias("pr"))
        .select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= MIN_PAIR_SUPPORT)
    )
    ia = item_counts.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item_counts.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .join(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            (
                F.col("n_pair").cast("double")
                / F.col("n_orders").cast("double")
            ).alias("support"),
            (
                F.col("n_pair").cast("double") / F.col("n_a").cast("double")
            ).alias("confidence_a_b"),
            (
                (
                    F.col("n_pair").cast("double")
                    * F.col("n_orders").cast("double")
                )
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("n_pair").desc(), "part_a", "part_b"
    ).limit(TOP_BASKET_PAIRS)
