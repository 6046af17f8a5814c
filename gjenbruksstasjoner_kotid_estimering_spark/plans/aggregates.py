"""Aggregation plans (SURVEY.md §2 Part B "Aggregation").

Grounding: the reference's only literal aggregate is ``max(meters)`` over the
calibration table (estimate_queue.py:136); the driver contract requires the
full hash-agg surface. All aggregates here are map-side-combinable
(sum/count/min/max), so Spark executes partial aggregation before the
shuffle — the shuffle moves one row per (group × partition), not the data.

Float-determinism note: double summation is order-sensitive in ANY parallel
engine (Spark and DuckDB both), so oracle-checked sums use exact arithmetic
only — integer-valued doubles (l_quantity is integral in this corpus, as in
TPC-H) or cents-scaled BIGINT sums (round(x*100) per row is bit-identical in
both engines; integer sums are associative). Derived means are quotients of
those exact parts. ``approx_count_distinct`` is declared rows-only (sketch ≠
oracle-exact, SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def _cents(col: F.Column) -> F.Column:
    """Exact cents representation: round half-away-from-zero in both engines."""
    return F.round(col * F.lit(100.0), 0).cast("long")


@register(
    "agg_basic",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS count_order,
               CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT)
                 AS sum_price_cents,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0)
                        AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price,
               sum(l_quantity) / count(*) AS avg_qty
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped hash aggregate: grouped sums/counts/min/max + "
    "derived mean. Map-side partial agg → 6-group shuffle. Generalizes the "
    "reference's max-over-calibration (estimate_queue.py:136).",
    tags=("agg",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("count_order"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
            F.sum(
                _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("sum_disc_cents"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
    )


@register(
    "agg_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Grouped multi-column count-distinct (expand + two-phase agg under "
    "the hood; at 100 TB prefer approx_count_distinct — see "
    "agg_approx_distinct).",
    tags=("agg", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No fan_out here: Expand already multiplies rows 3x before the partial
    # agg, and the map-side partial dedup shrinks the shuffle far more than
    # an extra exchange would buy back (measured: plain 0.6s vs fanned 1.4s
    # at sf0.1).
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # HLL sketch is engine-specific → rows-only check
    doc="approx_count_distinct (HyperLogLog++) vs the exact count, both "
    "derived from ONE pre-deduplicated (flag, partkey) pass instead of a "
    "multi-distinct Expand: the dedup groupBy gets map-side partial "
    "aggregation (the shuffle carries unique pairs, not raw rows), then "
    "exact = count(*) and approx = HLL over the distinct set — identical "
    "estimate, since HLL is duplicate-insensitive. At 100 TB this halves "
    "shuffle volume vs the Expand plan. Rows-only: sketches are "
    "engine-specific.",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    return pairs.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


@register(
    "agg_distinct_exact_vs_approx",
    oracle="""
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="The oracle-checkable half of the approx-distinct pair: the same "
    "single pre-deduplicated pass agg_approx_distinct runs, emitting "
    "only the EXACT per-flag distinct count so the hash gate covers the "
    "dedup+count plan numerically. The HLL estimate it travels with is "
    "accounted for separately by a bounded-relative-error pytest "
    "(tests/test_analytics.py::test_approx_distinct_error_bound, <5% at "
    "rsd=0.02) — closing the 'approx ops have no numeric accountability' "
    "gap without pretending sketches are bit-portable across engines.",
    tags=("agg", "distinct", "approx"),
)
def agg_distinct_exact_vs_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    return pairs.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("exact_parts"),
    )


@register(
    "agg_rollup",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
                 AS sum_total_cents
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Hierarchical ROLLUP (status → priority → grand total): one pass, "
    "grouping-set expansion handled by the planner.",
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).alias("sum_total_cents"),
    )


@register(
    "agg_filtered",
    oracle="""
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_quantity > 25.0) AS n_bulk,
               sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_discounted,
               count(*) AS n_all
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Filtered/conditional aggregation — sum(when(...)) / count_if, the "
    "set form of the reference tests' branch probes "
    "(estimate_queue_test.py:79-94).",
    tags=("agg", "filter"),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25.0, F.lit(1))).alias("n_bulk"),
        F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_quantity"))).alias(
            "qty_discounted"
        ),
        F.count(F.lit(1)).alias("n_all"),
    )


@register(
    "date_trunc_agg",
    oracle="""
        SELECT date_trunc('day', ts) AS day, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY date_trunc('day', ts), event_type
    """,
    doc="Calendar bucketing + grouped agg over the event stream — the batch "
    "form of predictions-per-interval (reference domain: one prediction row "
    "per station per timestamp, estimate_queue.py:181-192).",
    tags=("agg", "datetime"),
)
def date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus): all 2^2 grouping sets in one "
    "pass — grouping-set expansion, not four scans.",
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("sum_qty"),
    )


@register(
    "agg_pivot",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS "O",
               CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS "F",
               CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS DOUBLE)
                 AS qty_O,
               CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE)
                 AS qty_F
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Pivot: linestatus values become columns (explicit value list — at "
    "scale never let pivot infer distinct values with an extra pass). "
    "Oracle states the equivalent FILTER aggregates.",
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
        )
    )
    return counts.select(
        "l_returnflag",
        F.col("O_n").alias("O"),
        F.col("F_n").alias("F"),
        F.col("O_qty").alias("qty_O"),
        F.col("F_qty").alias("qty_F"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (status-only, priority-only, grand total) "
    "with grouping() markers distinguishing real NULLs from rollup NULLs — "
    "expressed through the SQL API (same Catalyst plan as the DataFrame "
    "form).",
    tags=("agg", "grouping_sets", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "unpivot_melt",
    oracle="""
        WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 20 = 0)
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
               l_quantity AS metric_value
        FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount' AS metric,
               l_discount AS metric_value
        FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax' AS metric, l_tax AS metric_value
        FROM li
    """,
    doc="Unpivot/melt: wide metric columns → long (key, metric, value) form "
    "— the inverse of agg_pivot, one pass (Spark Expand node, not three "
    "scans). Scoped to a 1-in-20 orderkey slice: the Expand shape under "
    "test is identical while the gate result stays hashable-sized (the "
    "unsliced melt tripled the whole fact table into the compare "
    "harness).",
    tags=("unpivot",),
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import fan_out

    # fan_out: the Expand node triples the row count; on a one-split scan
    # all of it serializes into a single task otherwise (no-op at scale).
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").where(
            F.col("l_orderkey") % 20 == 0
        )
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    ).withColumn(
        # strip the 'l_' prefix: fixed-offset substring, not a per-row
        # regex split (this runs once per OUTPUT row — 3x the input)
        "metric",
        F.substring(F.col("metric"), 3, 64),
    )


@register(
    "agg_stats_exact",
    oracle="""
        WITH cents AS (
          SELECT l_returnflag,
                 CAST(round(l_quantity * 100.0, 0) AS BIGINT) AS q,
                 CAST(round(l_discount * 10000.0, 0) AS BIGINT) AS d
          FROM lineitem
        ),
        sums AS (
          SELECT l_returnflag,
                 count(*) AS n,
                 CAST(sum(q) AS BIGINT) AS sq,
                 CAST(sum(d) AS BIGINT) AS sd,
                 CAST(sum(q * q) AS BIGINT) AS sqq,
                 CAST(sum(d * d) AS BIGINT) AS sdd,
                 CAST(sum(q * d) AS BIGINT) AS sqd
          FROM cents GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               (CAST(sq AS DOUBLE) / n) / 100.0 AS mean_qty,
               (CAST(sqq AS DOUBLE) / n - (CAST(sq AS DOUBLE) / n)
                    * (CAST(sq AS DOUBLE) / n)) / 10000.0 AS var_qty,
               (CAST(sqd AS DOUBLE) / n - (CAST(sq AS DOUBLE) / n)
                    * (CAST(sd AS DOUBLE) / n))
               / sqrt((CAST(sqq AS DOUBLE) / n - (CAST(sq AS DOUBLE) / n)
                           * (CAST(sq AS DOUBLE) / n))
                      * (CAST(sdd AS DOUBLE) / n - (CAST(sd AS DOUBLE) / n)
                           * (CAST(sd AS DOUBLE) / n))) AS corr_qd
        FROM sums
    """,
    doc="Statistical moments (mean/variance/correlation) computed from "
    "exact integer power sums — order-insensitive under any parallelism, "
    "unlike naive float sum-of-products, so even corr() is oracle-exact. "
    "The pattern for deterministic stats at 100 TB.",
    tags=("agg", "stats"),
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity") * 100.0, 0).cast("long")
    d = F.round(F.col("l_discount") * 10000.0, 0).cast("long")
    sums = li.select(F.col("l_returnflag"), q.alias("q"), d.alias("d")).groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
    )
    n = F.col("n")
    mq = F.col("sq").cast("double") / n
    md = F.col("sd").cast("double") / n
    vq = F.col("sqq").cast("double") / n - mq * mq
    vd = F.col("sdd").cast("double") / n - md * md
    cov = F.col("sqd").cast("double") / n - mq * md
    return sums.select(
        "l_returnflag",
        "n",
        (mq / F.lit(100.0)).alias("mean_qty"),
        (vq / F.lit(10000.0)).alias("var_qty"),
        (cov / F.sqrt(vq * vd)).alias("corr_qd"),
    )


@register(
    "sample_stratified",
    oracle=None,  # seeded RNG streams are engine-specific → rows-only
    doc="Stratified sampling per returnflag (seeded sampleBy) — the "
    "corpus-mixing primitive of a training-data pipeline; sampling "
    "fractions are pytest-asserted within binomial bounds.",
    tags=("sample",),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.sampleBy(
        "l_returnflag", fractions={"A": 0.5, "N": 0.1, "R": 0.25}, seed=42
    ).select("l_orderkey", "l_linenumber", "l_returnflag")


@register(
    "agg_collect",
    oracle="""
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',')
                 AS types_seen,
               CAST(len(list(DISTINCT event_type)) AS INT) AS n_types
        FROM events
        GROUP BY user_id
    """,
    doc="Collection aggregate: the set of event types per station as a "
    "canonical sorted joined string — collect_set is unordered by "
    "definition, so the canonical form (sort + join) is what's comparable "
    "(and what's safe to hash downstream).",
    tags=("agg", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = F.sort_array(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.array_join(types, ",").alias("types_seen"),
        F.size(types).alias("n_types"),
    )
