"""Round-9 wave I — mergeable distinct sketches, sequence matching, and
interval arithmetic.

Grounding: the approx-distinct family (agg_approx_distinct /
agg_hll_sketch) is rows-only because engine HLLs differ; ``agg_kmv_
sketch_rollup`` closes that accountability gap with a K-minimum-values
sketch built from PORTABLE integer hashes (48-bit md5 prefixes, the
repo's cross-engine fingerprint convention) — the estimate itself
hash-matches across engines, AND the row proves the defining sketch
property: merging per-group sketches gives the identical estimate a
direct sketch of the union gives. ``events_regex_sequence_match`` is the
MATCH_RECOGNIZE-shaped operator (SQL:2016 row-pattern matching, absent
from Spark) compiled to the ordered-aggregate + regex composition that
DOES scale. ``sql_interval_arithmetic`` pins calendar semantics
(month-add clamping, interval subtraction) that silently differ across
engines if untested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

KMV_K = 64
_HASH_SPACE = 1 << 48  # 12 hex chars of md5


def _kmv48(col):
    """Portable 48-bit hash: md5 prefix as BIGINT (same construction as
    the JSONL fingerprint rows — reproducible in any engine)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
    ).cast("long")


def _kmv_estimate(n_kept, kth):
    """KMV cardinality estimate as exact integer arithmetic: with fewer
    than K distinct hashes the sketch IS the exact set; otherwise
    (K-1)·2^48 div kth-smallest-hash. Integer `div`, not float `/`:
    63·2^48 exceeds 2^53, so a double quotient could floor differently
    than the oracle's BIGINT division."""
    return F.when(n_kept < KMV_K, n_kept).otherwise(
        F.expr(f"{(KMV_K - 1) * _HASH_SPACE}L div kth")
    )


@register(
    "agg_kmv_sketch_rollup",
    oracle=f"""
        WITH hashed AS (
            SELECT DISTINCT o_orderpriority AS grp,
                   ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)),
                                      1, 12))::BIGINT AS h
            FROM orders
        ),
        kmin AS (
            SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM hashed
        ),
        sketch AS (SELECT grp, h FROM kmin WHERE rn <= {KMV_K}),
        per_group AS (
            SELECT grp,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(max(h) AS BIGINT) AS kth
            FROM sketch GROUP BY grp
        ),
        merged_kmin AS (
            SELECT h, row_number() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT h FROM sketch)
        ),
        merged AS (
            SELECT 'ALL' AS grp,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(max(h) AS BIGINT) AS kth
            FROM merged_kmin WHERE rn <= {KMV_K}
        ),
        both_ AS (
            SELECT * FROM per_group UNION ALL SELECT * FROM merged
        )
        SELECT grp, n_kept, kth,
               CAST(CASE WHEN n_kept < {KMV_K} THEN n_kept
                    ELSE ({(KMV_K - 1) * _HASH_SPACE} // kth)
                    END AS BIGINT) AS distinct_est
        FROM both_
    """,
    doc="K-minimum-values distinct sketch with a PORTABLE hash (48-bit "
    "md5 prefix), fully oracle-checked — the accountability the "
    "engine-specific HLL rows (agg_approx_distinct, agg_hll_sketch, "
    "rows-only by design) cannot have: estimate = (K−1)·2^48 div "
    "kth-min-hash, pure integers, identical in any engine. Emits the "
    "per-priority sketches AND their rollup merge, where the merged "
    "row exercises the property that makes sketches matter at 100 TB: "
    "k-min(∪ sketches) = k-min(∪ raw sets), so daily sketches of "
    "64·8 bytes re-aggregate to monthly/yearly distinct counts with "
    "no second pass over the data. One distinct-hash shuffle, then "
    "window top-K per group — sketch-sized data past the first "
    "aggregate. Accuracy (~1/√K) is pinned against exact counts in "
    "tests/test_advanced14.py.",
    tags=("agg", "sketch", "approx", "exact", "rollup"),
)
def agg_kmv_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    hashed = orders.select(
        F.col("o_orderpriority").alias("grp"),
        _kmv48(F.col("o_custkey")).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    per_group = sketch.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
    )
    merged = (
        sketch.select("h")
        .distinct()
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy().orderBy("h"))
        )
        .where(F.col("rn") <= KMV_K)
        .agg(
            F.lit("ALL").alias("grp"),
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth"),
        )
    )
    both = per_group.unionByName(merged)
    return both.select(
        "grp",
        "n_kept",
        "kth",
        _kmv_estimate(F.col("n_kept"), F.col("kth")).alias("distinct_est"),
    )


SEQ_PATTERN = "cv*p"  # click, any views, purchase


@register(
    "events_regex_sequence_match",
    oracle=f"""
        WITH seq AS (
            SELECT user_id,
                   string_agg(substring(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS s
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(s) AS BIGINT) AS n_events,
               CAST(len(regexp_extract_all(s, '{SEQ_PATTERN}'))
                    AS BIGINT) AS n_matches
        FROM seq
        WHERE len(regexp_extract_all(s, '{SEQ_PATTERN}')) > 0
    """,
    doc="Row-pattern matching (SQL:2016 MATCH_RECOGNIZE, which Spark "
    "lacks) compiled to the composition that scales: each user's "
    "event-type stream becomes ONE string of initials in event order "
    "(deterministic (ts, event_id) sort inside the aggregate), and "
    f"the pattern '{SEQ_PATTERN}' (click → views → purchase) is "
    "counted with non-overlapping regex semantics — exactly "
    "MATCH_RECOGNIZE's default SKIP PAST LAST ROW. One user_id "
    "exchange; the regex runs per user-string, JVM-side. Per-user "
    "strings are session-bounded in practice (here ≤ a few hundred "
    "events); an unbounded-history user would be windowed by day "
    "first, same composition. Exact integer counts; the match-count "
    "filter keeps the gate result to converting users.",
    tags=("events", "pattern", "regex", "sessionize"),
)
def events_regex_sequence_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("chr"),
    )
    # order inside the aggregate: sort (ts, event_id, chr) structs, then
    # project the chr field — deterministic without a second window pass
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "chr"))
                ),
                lambda x: x["chr"],
            ),
            "",
        ).alias("s")
    )
    n_matches = F.regexp_count(F.col("s"), F.lit(SEQ_PATTERN))
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        n_matches.cast("long").alias("n_matches"),
    ).where(F.col("n_matches") > 0)


@register(
    "sql_interval_arithmetic",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day,
               CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)
                    AS VARCHAR) AS plus_3_months,
               CAST(CAST(o_orderdate - INTERVAL 10 DAY AS DATE)
                    AS VARCHAR) AS minus_10_days,
               CAST(CAST(o_orderdate + INTERVAL '36 hours' AS DATE)
                    AS VARCHAR) AS plus_36_hours,
               CAST(date_diff('day', DATE '2020-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS days_since_2020
        FROM orders
        WHERE o_orderkey % 17 = 0
    """,
    doc="Calendar-interval arithmetic pinned cross-engine: +3 months "
    "(END-OF-MONTH CLAMPING — Jan 31 + 1 month is the last day of "
    "February in both engines, the rule that silently diverges in "
    "hand-rolled date math), −10 days, +36 hours (day-time interval "
    "crossing a date boundary), and an epoch-anchored day diff. All "
    "results emitted as ISO DATE STRINGS (raw DATE columns canonicalize "
    "differently between Spark and DuckDB — repo convention) and exact "
    "BIGINT day counts. Pure projection — zero shuffles, whole-stage "
    "codegen; the %17 filter is pushed to the parquet scan.",
    tags=("sql", "date", "interval", "semantics"),
)
def sql_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 17 == 0
    )
    d = F.col("o_orderdate")
    iso = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return orders.select(
        "o_orderkey",
        iso(d).alias("order_day"),
        iso(F.add_months(d, 3)).alias("plus_3_months"),
        iso(F.date_sub(d.cast("date"), 10)).alias("minus_10_days"),
        iso(d + F.expr("INTERVAL 36 HOURS")).alias("plus_36_hours"),
        F.datediff(d.cast("date"), F.lit("2020-01-01").cast("date"))
        .cast("long")
        .alias("days_since_2020"),
    )
