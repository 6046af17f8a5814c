"""Advanced analytic surfaces: order statistics, mergeable sketches,
lateral (correlated) joins, and distribution-rank windows.

These extend SURVEY.md §2 Part B beyond the round-1 checklist:

- ``agg_median_mode`` — exact median + deterministic mode per group.
  Mode is computed as count-then-rank (not the built-in ``mode()``,
  whose tie-breaking is engine-specific), so the DuckDB oracle hashes
  exactly.
- ``agg_hll_sketch`` — Apache DataSketches HLL via ``hll_sketch_agg``:
  per-group sketches PLUS a union-merged global row. The point at 100 TB
  is mergeability: partial sketches combine map-side and across
  partitions/time-slices without rescanning raw data (the same property
  the reference's Luigi memoization approximates by caching task
  outputs, tasks.py:19-29). Approximate → rows-only check by contract.
- ``join_lateral`` — correlated LATERAL subquery with per-row ORDER BY
  ... LIMIT (top-2 orders per customer). Spark decorrelates this into a
  window/rank plan — no per-row re-execution, unlike a driver loop.
- ``window_percent_rank`` — percent_rank + cume_dist: rank ratios are
  exact rational arithmetic on counts, so they hash exactly cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import epoch_us
from ..io import load_table, register_views
from ..registry import register


@register(
    "agg_median_mode",
    oracle="""
        WITH c AS (
            SELECT l_returnflag, l_quantity, count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_quantity
        ),
        m AS (
            SELECT l_returnflag, l_quantity AS mode_qty,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY cnt DESC, l_quantity
                   ) AS rn
            FROM c
        )
        SELECT g.l_returnflag,
               g.median_qty,
               m.mode_qty,
               g.n_rows
        FROM (
            SELECT l_returnflag,
                   median(l_quantity) AS median_qty,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        ) g
        JOIN m ON g.l_returnflag = m.l_returnflag AND m.rn = 1
    """,
    doc="Exact median (interpolating percentile, exact on the corpus's "
    "integral quantities) + deterministic mode per return flag. Mode "
    "tie-breaks (count DESC, value ASC) explicitly because built-in "
    "mode() resolves ties engine-specifically. Scale shape (r17): ONE "
    "lineitem pass builds the (flag, qty, cnt) relation — bounded "
    "fan-in, partial-aggregated map-side — and BOTH order statistics "
    "derive from those few hundred rows: the mode by a rank window, the "
    "median by the interpolating-percentile identity over cumulative "
    "counts (v@floor + frac·(v@ceil − v@floor) at position (n−1)/2 — "
    "exact, same definition as median()). The before-shape ran a second "
    "full lineitem pass just for median/count.",
    tags=("agg", "orderstats"),
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # One fact pass consumed twice; the two consumers share the IDENTICAL
    # aggregate subtree, so runtime exchange reuse computes it once — an
    # r17 warm A/B read cp/no-cp within noise (0.74/0.70s) and no second
    # lineitem scan either way, so no checkpoint is carried.
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wf = Window.partitionBy("l_returnflag")
    wo = wf.orderBy("l_quantity").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("n", F.sum("cnt").over(wf)).withColumn(
        "cum", F.sum("cnt").over(wo)
    )
    # 0-based interpolation position r = (n-1)/2; v1/v2 are the values
    # covering floor(r)/ceil(r) — the smallest qty whose cumulative
    # count exceeds the index (values ascend with cum, so min-when is
    # exactly "value at sorted position k").
    k1 = F.floor((F.col("n") - 1) / 2)
    k2 = F.ceil((F.col("n") - 1) / 2)
    med = cum.groupBy("l_returnflag").agg(
        F.max("n").alias("n_rows"),
        F.min(F.when(F.col("cum") > k1, F.col("l_quantity"))).alias("v1"),
        F.min(F.when(F.col("cum") > k2, F.col("l_quantity"))).alias("v2"),
    ).select(
        "l_returnflag",
        F.when(F.col("n_rows") % 2 == 1, F.col("v1"))
        .otherwise(F.col("v1") + (F.col("v2") - F.col("v1")) * 0.5)
        .alias("median_qty"),
        "n_rows",
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity")
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return med.join(mode, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty", "n_rows"
    )


@register(
    "agg_hll_sketch",
    oracle=None,  # approximate by design → rows-only check
    doc="DataSketches HLL distinct-count rollup: per-returnflag sketches "
    "(hll_sketch_agg, lgConfigK=14 ≈ 0.8% rsd) estimated per group, then "
    "hll_union_agg merges the SAME partial sketches into an 'ALL' row — "
    "no second scan. This mergeability is the 100 TB contract: partial "
    "sketches combine map-side, across partitions, and across incremental "
    "runs (store the binary sketch column, union tomorrow's). Invariants "
    "(estimate within rsd of exact, union ≥ max part) are pytest-checked.",
    tags=("agg", "sketch", "approx"),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey", 14).alias("sk")
    )
    # One cached pass over the tiny per-group sketch table feeds both the
    # per-group rows and the merged ALL row.
    per = per.localCheckpoint(eager=False)
    groups = per.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").alias("approx_parts"),
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("l_returnflag"),
        F.hll_sketch_estimate("sk").alias("approx_parts"),
    )
    return groups.unionByName(merged)


@register(
    "join_lateral",
    oracle="""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (
                 SELECT o_orderkey, o_totalprice
                 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2
             ) t
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc="Correlated LATERAL subquery: top-2 orders by totalprice per "
    "BUILDING-segment customer, deterministic tie-break on o_orderkey. "
    "Catalyst decorrelates the per-row ORDER BY/LIMIT into a single "
    "ranked window over one shuffled join — set-at-a-time, not the "
    "reference's per-entity loop (tasks.py one task per image). The "
    "segment filter pushes into the customer scan.",
    tags=("join", "lateral", "subquery"),
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.50) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               quantile_disc(l_quantity, 0.90) AS p90_disc
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Grouped exact percentiles: interpolated (percentile_cont) at "
    "quartiles + discrete (percentile_disc) at p90. Hash-exact because "
    "the corpus quantities are small integers and quartile fractions "
    "are dyadic — both engines' interpolation forms (lo+(hi-lo)*f vs "
    "lo*(1-f)+hi*f) are exact, sidestepping their 1-ulp divergence on "
    "arbitrary doubles. Exact percentiles need a per-group sort — the "
    "100 TB path is agg_approx_quantile's mergeable KLL-style sketch; "
    "this is the correctness baseline.",
    tags=("agg", "percentile", "orderstats"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.50).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
        F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY l_quantity)").alias(
            "p90_disc"
        ),
    )


@register(
    "subquery_exists",
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000.0
              )
          AND NOT EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F'
              )
    """,
    doc="Correlated EXISTS + NOT EXISTS: customers with at least one "
    "big-ticket order and no finished order. Catalyst rewrites the pair "
    "into a left-semi ⋈ left-anti cascade on the correlation key — two "
    "key-partitioned joins, no per-row subquery execution; the "
    "subquery-side predicates push into the orders scans.",
    tags=("subquery", "exists", "join"),
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000.0
              )
          AND NOT EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F'
              )
        """
    )


@register(
    "subquery_correlated_scalar",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_lines,
               (SELECT CAST(coalesce(sum(CAST(l_quantity AS BIGINT)), 0)
                            AS BIGINT)
                FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS total_qty
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
    doc="Correlated SCALAR subqueries in the projection: per-order line "
    "count and quantity sum. Catalyst decorrelates each into an "
    "aggregate-then-left-outer-join on the correlation key (count(*) "
    "coalesced to 0 for orders with no lines — the classic COUNT-bug "
    "case, handled by the rewrite) — set-at-a-time, never one subquery "
    "per row.",
    tags=("subquery", "scalar", "join"),
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               (SELECT count(*) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_lines,
               (SELECT coalesce(sum(CAST(l_quantity AS BIGINT)), CAST(0 AS BIGINT))
                FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS total_qty
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        """
    )


@register(
    "sessionize_gaps",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        numbered AS (
            SELECT user_id, ts, us,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY us, ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               CAST(max(us) - min(us) AS BIGINT) AS duration_us
        FROM numbered
        GROUP BY user_id, session_id
    """,
    doc="Batch sessionization as gaps-and-islands: a new session starts "
    "after a >30 min silence; session id = running count of gap flags "
    "per user (lag + cumulative sum), then one aggregate row per "
    "session. Gap arithmetic is exact integer microseconds "
    "(unix_micros ≡ epoch_us), so the oracle hashes exactly — the "
    "deterministic batch twin of the rows-only session_window_agg. "
    "Scale shape: ONE shuffle on user_id; the lag window, the running "
    "sum, and the final groupBy (keys ⊇ partition key) all reuse that "
    "partitioning.",
    tags=("window", "session", "streaming"),
)
def sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("us") - F.lag("us").over(w) > 1800 * 1_000_000, 1
        ).otherwise(0),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("us", "ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn(
        "session_id", F.sum("new_session").over(wsum).cast("long")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max("us") - F.min("us")).cast("long").alias("duration_us"),
    )


@register(
    "window_percent_rank",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    """,
    doc="Distribution ranks: percent_rank ((rank-1)/(n-1)) and cume_dist "
    "(peers≤x / n) of account balance within market segment. Ratios of "
    "exact integer counts → bit-identical doubles cross-engine, ties "
    "handled by SQL rank semantics (no ordering ambiguity in output). "
    "One shuffle on the partition key; WindowExec streams each segment.",
    tags=("window", "rank"),
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
