"""Round-9 wave L — nonparametric two-sample tests, integer-exact.

Grounding: the fleet-analytics question behind the reference ("do
purchase-event values and click-event values follow the same
distribution?") is what two-sample tests answer without normality
assumptions. Both classical tests are carried as EXACT integers — the
KS statistic as its cross-multiplied numerator over a constant-size
binned support, the Mann-Whitney U as doubled tie-averaged rank sums —
so the driver hash gate checks the statistics themselves, not a float
approximation of them. (The parametric siblings live in
stat_corr_covar_exact / stat_regression_exact / events_ab_test;
chi-square independence is advanced13.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

KS_A, KS_B = "purchase", "click"
KS_BIN = 100  # cents → whole-currency bins: constant-size ECDF support


@register(
    "stat_ks_two_sample_exact",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(round(value * 100) AS BIGINT) // {KS_BIN} AS b,
                   event_type
            FROM events
            WHERE event_type IN ('{KS_A}', '{KS_B}')
              AND value IS NOT NULL
        ),
        bins AS (
            SELECT b,
                   CAST(count(*) FILTER (WHERE event_type = '{KS_A}')
                        AS BIGINT) AS na,
                   CAST(count(*) FILTER (WHERE event_type = '{KS_B}')
                        AS BIGINT) AS nb
            FROM pts GROUP BY b
        ),
        tot AS (
            SELECT CAST(sum(na) AS BIGINT) AS n,
                   CAST(sum(nb) AS BIGINT) AS m
            FROM bins
        ),
        ecdf AS (
            SELECT b,
                   sum(na) OVER (ORDER BY b) AS ca,
                   sum(nb) OVER (ORDER BY b) AS cb
            FROM bins
        )
        SELECT tot.n, tot.m,
               CAST(max(abs(ca * tot.m - cb * tot.n)) AS BIGINT)
                   AS d_num,
               CAST(min(b) FILTER (
                   WHERE abs(ca * tot.m - cb * tot.n) =
                         (SELECT max(abs(e2.ca * tot.m - e2.cb * tot.n))
                          FROM ecdf e2)
               ) AS BIGINT) AS at_bin
        FROM ecdf, tot
        GROUP BY tot.n, tot.m
    """,
    doc=f"Two-sample Kolmogorov–Smirnov statistic ({KS_A} vs {KS_B} "
    "event values), exact: D = max |ECDF_a − ECDF_b| carried as its "
    "cross-multiplied integer numerator max|ca·m − cb·n| (D = that / "
    "(n·m)), with the arg-max bin — no float CDF ever materializes. "
    "Values are binned to whole-currency units first, which makes the "
    "ECDF support a CONSTANT-cardinality relation: the cumulative "
    "window runs over ~hundreds of bins no matter how many input rows "
    "exist, so the one global-order window is bounded at 100 TB (the "
    "same reason histogram-based quantiles scale). One groupBy "
    "shuffle; everything after is bin-sized.",
    tags=("stats", "nonparametric", "exact", "window"),
)
def stat_ks_two_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        load_table(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin(KS_A, KS_B)
            & F.col("value").isNotNull()
        )
        .select(
            F.expr(f"CAST(round(value * 100) AS BIGINT) div {KS_BIN}")
            .alias("b"),
            "event_type",
        )
    )
    # Materialize the domain-bounded bin histogram once: the ECDF window
    # and the totals row both consume it, and each re-ran the events
    # scan + binning aggregate (2 fact passes, measured r17).
    bins = pts.groupBy("b").agg(
        F.count(F.when(F.col("event_type") == KS_A, 1)).alias("na"),
        F.count(F.when(F.col("event_type") == KS_B, 1)).alias("nb"),
    ).localCheckpoint(eager=False)
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = bins.select(
        "b",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    )
    tot = bins.agg(
        F.sum("na").alias("n"), F.sum("nb").alias("m")
    )
    scored = ecdf.crossJoin(F.broadcast(tot)).select(
        "b",
        "n",
        "m",
        F.abs(F.col("ca") * F.col("m") - F.col("cb") * F.col("n")).alias(
            "d"
        ),
    )
    return scored.groupBy("n", "m").agg(
        F.max("d").alias("d_num"),
        F.min_by("b", F.struct(-F.col("d"), F.col("b"))).alias("at_bin"),
    )


MW_A, MW_B = "purchase", "view"


@register(
    "stat_mann_whitney_u_exact",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                   event_type
            FROM events
            WHERE event_type IN ('{MW_A}', '{MW_B}')
              AND value IS NOT NULL
        ),
        ranked AS (
            -- tie-averaged rank × 2 is an integer: 2·avg = rank() +
            -- (rank of the tie group's last member) = 2·rank + ties − 1
            SELECT event_type,
                   2 * rank() OVER (ORDER BY cents)
                     + count(*) OVER (PARTITION BY cents) - 1 AS r2
            FROM pts
        ),
        agg AS (
            SELECT CAST(count(*) FILTER (WHERE event_type = '{MW_A}')
                        AS BIGINT) AS n1,
                   CAST(count(*) FILTER (WHERE event_type = '{MW_B}')
                        AS BIGINT) AS n2,
                   CAST(sum(r2) FILTER (WHERE event_type = '{MW_A}')
                        AS BIGINT) AS r2sum
            FROM ranked
        )
        SELECT n1, n2,
               CAST(r2sum - n1 * (n1 + 1) AS BIGINT) AS u1_x2
        FROM agg
    """,
    doc=f"Mann–Whitney U ({MW_A} vs {MW_B} event values), exact with "
    "ties: 2·U₁ = 2·R₁ − n₁(n₁+1), where the tie-averaged rank is "
    "kept doubled (2·avg-rank = 2·rank + ties − 1, an integer "
    "identity) — the midrank convention every stats package uses, "
    "with no half-integer ever stored. Computed from BIN-LEVEL "
    "cumulative counts, never a row-level rank: group to (cents → "
    "total count c, group-A count c1), prefix-sum c over the bounded "
    "distinct-cents support, and every row in a bin contributes "
    "r2 = 2·cum_before + c + 1, so R₂sum = Σ c1·(2·cum_before + c + "
    "1). The one ordered window runs over the constant-cardinality "
    "bin relation (the KS row's shape), not the event rows — at "
    "100 TB the sort input stays bin-sized. One groupBy shuffle; "
    "everything after is bin-sized.",
    tags=("stats", "nonparametric", "exact", "window"),
)
def stat_mann_whitney_u_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = (
        load_table(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin(MW_A, MW_B)
            & F.col("value").isNotNull()
        )
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "event_type",
        )
    )
    bins = pts.groupBy("cents").agg(
        F.count(F.lit(1)).alias("c"),
        F.count(F.when(F.col("event_type") == MW_A, 1)).alias("c1"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    scored = bins.select(
        "c",
        "c1",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_before"),
    )
    agg = scored.agg(
        F.sum("c1").alias("n1"),
        (F.sum("c") - F.sum("c1")).alias("n2"),
        F.sum(
            F.col("c1")
            * (2 * F.col("cum_before") + F.col("c") + 1)
        ).alias("r2sum"),
    )
    return agg.select(
        "n1",
        "n2",
        (F.col("r2sum") - F.col("n1") * (F.col("n1") + 1)).alias("u1_x2"),
    )
