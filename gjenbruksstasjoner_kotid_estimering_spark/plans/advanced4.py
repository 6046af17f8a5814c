"""Round-6 engine-surface additions: runtime-filtered joins, blocked
fuzzy/geo joins, Z-order data skipping, weighted order statistics, OHLC
resampling, data-quality constraint suites, and key-skew profiling.

Common thread: every operator here is a 100 TB shape — semi-join
reduction before the shuffle (runtime bloom filter), candidate blocking
instead of all-pairs (fuzzy levenshtein, geo grid), multi-dimensional
file skipping (Z-order), and single-pass diagnostics (DQ suite, skew
profile) that gate the expensive stages of a training-data pipeline.

Generalizes the reference's single-table scan-and-score loop
(queue_time_predictions/estimate_queue.py:91-163) to the join/maintenance
surface a lakehouse needs around it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir


# --- runtime bloom-filter join ----------------------------------------

# Creation side: the selective orders filter. At real scale the
# application-side threshold (default 10 GiB) triggers on its own; the
# local fixture is far below it, so the builder scopes the threshold down
# to demonstrate the same plan shape the 100 TB run would get.
_BLOOM_SCOPED_CONFS = {
    # let the filtered orders side build a bloom filter even though the
    # local lineitem scan is only ~10 MB (prod default: 10 GiB)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # force a shuffle join: a broadcast join already ships the whole dim,
    # so Spark (correctly) never bothers with a bloom filter there — at
    # 100 TB the creation side exceeds the broadcast threshold and this
    # is the plan that actually runs
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_scoped_confs(
    spark: SparkSession, confs: dict[str, str], build
) -> DataFrame:
    """Run ``build()`` and EAGERLY materialize its result while ``confs``
    are set, restoring previous values after. Materializing inside the
    scope matters: optimizer rules (runtime-filter injection) fire at
    action time, so a lazily returned frame would be planned under
    whatever confs the caller has."""
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        return build().localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@register(
    "join_runtime_bloom",
    oracle="""
        SELECT l.l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag
    """,
    doc="Runtime bloom-filter join (Spark's InjectRuntimeFilter): the "
    "selective orders filter builds a bloom filter over o_orderkey that "
    "is pushed into the lineitem scan as might_contain(l_orderkey) — "
    "the fact side drops non-matching rows BEFORE the join shuffle, the "
    "semi-join-reduction plan that decides a 100 TB fact-dim join. The "
    "builder scopes the application-side threshold down so the local "
    "fixture gets the same injected plan the at-scale run would "
    "(tests/test_advanced4.py pins might_contain in the optimized "
    "plan); the result is materialized inside the scope because "
    "injection happens at action time. Integer-cents revenue keeps the "
    "hash exact under any join order.",
    tags=("join", "bloom", "runtime-filter", "scale"),
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_extendedprice"
        )
        od = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey")
        return (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                ).alias("revenue_cents"),
            )
        )

    return _with_scoped_confs(spark, _BLOOM_SCOPED_CONFS, build)


# --- blocked fuzzy join (levenshtein) ---------------------------------

_FUZZY_MAX_DIST = 2


@register(
    "join_fuzzy_levenshtein",
    oracle=f"""
        WITH names AS (
            SELECT p_name, CAST(count(*) AS BIGINT) AS cnt,
                   split_part(p_name, ' ', 1) AS tok_adj,
                   split_part(p_name, ' ', 2) AS tok_noun
            FROM part GROUP BY p_name
        ),
        blocked AS (
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   a.cnt AS cnt_a, b.cnt AS cnt_b
            FROM names a JOIN names b
              ON a.tok_adj = b.tok_adj AND a.p_name < b.p_name
            UNION
            SELECT a.p_name, b.p_name, a.cnt, b.cnt
            FROM names a JOIN names b
              ON a.tok_noun = b.tok_noun AND a.p_name < b.p_name
        )
        SELECT name_a, name_b,
               CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist,
               CAST(cnt_a * cnt_b AS BIGINT) AS pair_count
        FROM blocked
        WHERE levenshtein(name_a, name_b) <= {_FUZZY_MAX_DIST}
    """,
    doc="Blocked fuzzy self-join: near-identical part names (edit "
    "distance ≤ 2) found WITHOUT an all-pairs comparison. Dedupe-first "
    "collapses the fact table to its name vocabulary (100 TB of rows → "
    "thousands of distinct names), then two blocking passes — same "
    "first token, same second token — propose candidates (an edit-"
    "distance-2 pair of 'adjective noun' names keeps at least one "
    "token intact on this vocabulary; "
    "tests/test_advanced4.py::test_fuzzy_blocking_is_lossless proves "
    "recall against brute-force all-pairs), and exact JVM-side "
    "levenshtein verifies. pair_count = cnt_a·cnt_b recovers the "
    "row-level match cardinality without materializing the row pairs — "
    "the entity-resolution join of record-linkage pipelines.",
    tags=("join", "fuzzy", "levenshtein", "blocking", "dedup"),
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("tok_adj", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)))
        .withColumn("tok_noun", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("cnt").alias("cnt_a"),
        F.col("tok_adj").alias("adj_a"),
        F.col("tok_noun").alias("noun_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("cnt").alias("cnt_b"),
        F.col("tok_adj").alias("adj_b"),
        F.col("tok_noun").alias("noun_b"),
    )
    lt = F.col("name_a") < F.col("name_b")
    pass_adj = a.join(b, (F.col("adj_a") == F.col("adj_b")) & lt)
    pass_noun = a.join(b, (F.col("noun_a") == F.col("noun_b")) & lt)
    cols = ["name_a", "name_b", "cnt_a", "cnt_b"]
    candidates = pass_adj.select(*cols).union(pass_noun.select(*cols)).distinct()
    return (
        candidates.withColumn(
            "edit_dist",
            F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long"),
        )
        .where(F.col("edit_dist") <= _FUZZY_MAX_DIST)
        .select(
            "name_a",
            "name_b",
            "edit_dist",
            (F.col("cnt_a") * F.col("cnt_b")).cast("long").alias("pair_count"),
        )
    )


# --- grid-blocked geo radius join -------------------------------------

# Synthetic integer micro-degree coordinates derived from the keys (the
# corpus has no geo columns): pure int64 arithmetic, so Spark and the
# oracle derive bit-identical positions. Kept non-negative so integer
# floor-division agrees across engines.
_GEO_X_RANGE = 120_000_000  # 120° in micro-degrees
_GEO_Y_RANGE = 60_000_000
_GEO_RADIUS = 500_000  # 0.5° — also the grid cell size
_GEO_R2 = _GEO_RADIUS * _GEO_RADIUS

_GEO_CUST_SQL = f"""
            SELECT c_custkey,
                   (c_custkey * 48271 + 11) % {_GEO_X_RANGE} AS x,
                   (c_custkey * 69621 + 7) % {_GEO_Y_RANGE} AS y
            FROM customer
"""
_GEO_SUPP_SQL = f"""
            SELECT s_suppkey,
                   (s_suppkey * 40692 + 3) % {_GEO_X_RANGE} AS x,
                   (s_suppkey * 50653 + 13) % {_GEO_Y_RANGE} AS y
            FROM supplier
"""


def _geo_points(df: DataFrame, key: str, mx: int, ax: int, my: int, ay: int) -> DataFrame:
    x = (F.col(key) * mx + ax) % _GEO_X_RANGE
    y = (F.col(key) * my + ay) % _GEO_Y_RANGE
    return df.select(
        F.col(key),
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.floor(x / _GEO_RADIUS).alias("cx"),
        F.floor(y / _GEO_RADIUS).alias("cy"),
    )


@register(
    "join_geo_gridblock",
    oracle=f"""
        WITH cust AS ({_GEO_CUST_SQL}),
             supp AS ({_GEO_SUPP_SQL}),
             pairs AS (
            SELECT s.s_suppkey,
                   (s.x - c.x) * (s.x - c.x)
                     + (s.y - c.y) * (s.y - c.y) AS d2
            FROM supp s JOIN cust c
              ON floor(c.x / {_GEO_RADIUS})
                   BETWEEN floor(s.x / {_GEO_RADIUS}) - 1
                       AND floor(s.x / {_GEO_RADIUS}) + 1
             AND floor(c.y / {_GEO_RADIUS})
                   BETWEEN floor(s.y / {_GEO_RADIUS}) - 1
                       AND floor(s.y / {_GEO_RADIUS}) + 1
            WHERE (s.x - c.x) * (s.x - c.x)
                    + (s.y - c.y) * (s.y - c.y) <= {_GEO_R2}
        )
        SELECT s_suppkey,
               CAST(count(*) AS BIGINT) AS n_within,
               CAST(min(d2) AS BIGINT) AS min_dist2
        FROM pairs GROUP BY s_suppkey
    """,
    doc="Grid-blocked radius join: every supplier matched to the "
    "customers within radius R of its (synthetic, key-derived, integer "
    "micro-degree) position. Candidates come from an equi-join on grid "
    "cells — each supplier probes its 3×3 cell neighborhood (cell size "
    "= R makes the blocking LOSSLESS: any pair within R differs by ≤1 "
    "cell per axis) — so the spatial join is a hash join on cell ids, "
    "never an all-pairs distance scan; the residual exact predicate is "
    "pure int64 squared distance. The geohash-bucketed spatial-join "
    "shape that scales to planetary point sets; all-integer math keeps "
    "the oracle hash exact.",
    tags=("join", "geo", "grid", "blocking", "scale"),
)
def join_geo_gridblock(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _geo_points(
        load_table(spark, sf_dir, "customer"), "c_custkey", 48271, 11, 69621, 7
    )
    supp = _geo_points(
        load_table(spark, sf_dir, "supplier"), "s_suppkey", 40692, 3, 50653, 13
    )
    # supplier side fans out to its 9 candidate cells; the customer side
    # (the big one at scale) stays un-exploded and is joined on its own
    # cell — fan out the small side, shuffle the big side once
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), dx ->"
        " transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    supp9 = supp.select(
        "s_suppkey", "x", "y", "cx", "cy", offsets.alias("o")
    ).select(
        "s_suppkey",
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    d2 = (F.col("sx") - F.col("x")) * (F.col("sx") - F.col("x")) + (
        F.col("sy") - F.col("y")
    ) * (F.col("sy") - F.col("y"))
    return (
        supp9.join(
            cust, (F.col("jx") == cust.cx) & (F.col("jy") == cust.cy)
        )
        .select("s_suppkey", d2.alias("d2"))
        .where(F.col("d2") <= _GEO_R2)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min("d2").cast("long").alias("min_dist2"),
        )
    )


# --- Z-order data skipping --------------------------------------------

# Box constants sized for the SMALLEST fixture (150 customers at
# sf0.001): a ~1/3 key slice × 1/5 nation slice stays non-empty at every
# scale while remaining selective enough to skip files at sf0.1.
_ZBOX_CUST_LO, _ZBOX_CUST_HI = 40, 89
_ZBOX_NATION_LO, _ZBOX_NATION_HI = 5, 9
_ZORDER_FILES = 16
_ZORDER_BUCKET_BITS = 4


def zorder_bucketed_expr(df: DataFrame, col_a: str, col_b: str):
    """Z-value over RANK-ALIGNED dimensions: each column is quantized to
    2^bits equal-width buckets of ITS OWN value range before the bits
    interleave. Interleaving raw values is wrong when cardinalities
    differ (an 11-bit key swamps a 5-bit dimension and the layout
    degenerates to single-column clustering — no skipping on the small
    dimension); bucketing first is the Delta OPTIMIZE ZORDER range-ID
    convention. The min/max probe is a 4-scalar driver collect —
    bounded at any scale."""
    n = 1 << _ZORDER_BUCKET_BITS
    row = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    lo_a, hi_a, lo_b, hi_b = (int(v) for v in row)

    def bucket(c: str, lo: int, hi: int):
        span = max(hi - lo + 1, 1)
        return F.least(
            F.lit(n - 1), F.floor((F.col(c) - lo) * n / span)
        ).cast("long")

    ba = bucket(col_a, lo_a, hi_a)
    bb = bucket(col_b, lo_b, hi_b)
    z = F.lit(0).cast("long")
    for i in range(_ZORDER_BUCKET_BITS):
        bit_a = F.shiftright(ba, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(bb, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def zorder_layout_stats(
    spark: SparkSession, sf_dir: str, cluster_fn, tag: str
) -> tuple[str, list[str], dict[str, tuple]]:
    """Write customer clustered by ``cluster_fn(base)`` into
    _ZORDER_FILES files; return (scratch_dir, files, per-file (min,max)
    stats for BOTH box dims) — the Delta/Iceberg multi-column
    file-statistics convention, computed with one column-pruned scan of
    the written files."""
    scratch = new_scratch_dir(tag)
    data_dir = os.path.join(scratch, "data")  # scratch dir pre-exists
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
    )
    base.repartitionByRange(_ZORDER_FILES, cluster_fn(base)).write.mode(
        "error"
    ).parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, n)
        for n in os.listdir(data_dir)
        if n.endswith(".parquet")
    )
    stats: dict[str, tuple] = {}
    from urllib.parse import unquote, urlparse

    rows = (
        spark.read.parquet(*files)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(
            F.min("c_custkey").alias("klo"),
            F.max("c_custkey").alias("khi"),
            F.min("c_nationkey").alias("nlo"),
            F.max("c_nationkey").alias("nhi"),
        )
        .collect()
    )
    for r in rows:
        stats[unquote(urlparse(r["_f"]).path)] = (
            r["klo"], r["khi"], r["nlo"], r["nhi"],
        )
    return scratch, files, stats


def zbox_prune(files: list[str], stats: dict[str, tuple]) -> list[str]:
    """Files whose [min,max] on EITHER box dimension cannot intersect
    the 2-d predicate box are skipped; missing stats → read (correctness
    over optimism)."""
    chosen = []
    for f in files:
        st = stats.get(f)
        if st is None:
            chosen.append(f)
            continue
        klo, khi, nlo, nhi = st
        if klo is None or nlo is None:
            chosen.append(f)
            continue
        if (
            klo <= _ZBOX_CUST_HI
            and khi >= _ZBOX_CUST_LO
            and nlo <= _ZBOX_NATION_HI
            and nhi >= _ZBOX_NATION_LO
        ):
            chosen.append(f)
    return chosen


@register(
    "scan_zorder_skipping",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS acctbal_sum_cents,
               CAST(min(c_custkey) AS BIGINT) AS min_custkey,
               CAST(max(c_custkey) AS BIGINT) AS max_custkey
        FROM customer
        WHERE c_custkey BETWEEN {_ZBOX_CUST_LO} AND {_ZBOX_CUST_HI}
          AND c_nationkey BETWEEN {_ZBOX_NATION_LO} AND {_ZBOX_NATION_HI}
    """,
    doc="Z-order clustering + multi-dimensional data skipping: customer "
    "rewritten as 16 files range-clustered on the interleaved-bit "
    "Z-value of RANK-ALIGNED (c_custkey, c_nationkey) buckets (raw-bit "
    "interleaving degenerates to single-column clustering when "
    "cardinalities differ — zorder_bucketed_expr quantizes each dim to "
    "its own range first, the Delta OPTIMIZE ZORDER range-ID "
    "convention), per-file [min,max] stats collected for BOTH "
    "dimensions, then a 2-d box predicate reads ONLY the files whose "
    "stats intersect the box. tests/test_advanced4.py proves the skip "
    "(files_read < files_total) AND that Z-order skips on a nation-only "
    "predicate where custkey-clustering reads every file. Oracle "
    "recomputes the box relationally, so the hash proves skipping "
    "loses no rows.",
    tags=("scan", "pruning", "zorder", "maintenance", "scale"),
)
def scan_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    scratch, files, stats = zorder_layout_stats(
        spark,
        sf_dir,
        lambda df: zorder_bucketed_expr(df, "c_custkey", "c_nationkey"),
        f"zorder_{sf_tag}",
    )
    chosen = zbox_prune(files, stats)
    # fully-pruned corner (tiny fixtures): keep the schema by reading the
    # full file list under a false predicate — same convention as
    # merge_tx.snapshot_pruned
    src = (
        spark.read.parquet(*chosen)
        if chosen
        else spark.read.parquet(*files).where(F.lit(False))
    )
    out = (
        src
        .where(
            F.col("c_custkey").between(_ZBOX_CUST_LO, _ZBOX_CUST_HI)
            & F.col("c_nationkey").between(_ZBOX_NATION_LO, _ZBOX_NATION_HI)
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("acctbal_cents").alias("acctbal_sum_cents"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
    )
    return detach_result(out, scratch)


# --- weighted median ---------------------------------------------------


@register(
    "agg_weighted_median",
    oracle="""
        WITH cum AS (
            SELECT l_returnflag, l_extendedprice,
                   CAST(l_quantity AS BIGINT) AS w,
                   sum(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cw,
                   sum(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_returnflag
                   ) AS tw
            FROM lineitem
        )
        SELECT l_returnflag,
               min(l_extendedprice) AS weighted_median_price,
               CAST(min(tw) AS BIGINT) AS total_weight
        FROM cum
        WHERE 2 * cw >= tw
        GROUP BY l_returnflag
    """,
    doc="Weighted (lower) median per group: the smallest price whose "
    "cumulative quantity-weight reaches half the group's total — the "
    "quantity-weighted 'typical price' of demand-weighted analytics. "
    "RANGE-framed cumulative sum (not ROWS) makes ties on the order key "
    "accumulate deterministically under any parallelism, and the answer "
    "is a SELECTED input value (exact, like events_anomaly_mad's "
    "median), never an interpolated float. One shuffle on the group "
    "key; both windows and the final aggregate reuse it.",
    tags=("agg", "orderstats", "weighted", "window"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("long").alias("w"),
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.min("tw").alias("total_weight"),
        )
    )


# --- OHLC resample -----------------------------------------------------

_OHLC_BUCKET_SECONDS = 900


@register(
    "timeseries_resample_ohlc",
    oracle=f"""
        WITH ordered AS (
            SELECT event_type,
                   make_timestamp(
                       CAST(floor(epoch(ts) / {_OHLC_BUCKET_SECONDS})
                            * {_OHLC_BUCKET_SECONDS} AS BIGINT)
                       * 1000000) AS bucket_start,
                   value, ts, event_id,
                   row_number() OVER (
                       PARTITION BY event_type,
                           floor(epoch(ts) / {_OHLC_BUCKET_SECONDS})
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (
                       PARTITION BY event_type,
                           floor(epoch(ts) / {_OHLC_BUCKET_SECONDS})
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        SELECT event_type, bucket_start,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS volume_cents
        FROM ordered
        GROUP BY event_type, bucket_start
    """,
    doc="OHLC downsampling: the event stream resampled to 15-minute "
    "bars per event type — open/close are the first/last values by "
    "(ts, event_id) (row_number flags, deterministic under ties), "
    "high/low are min/max, volume is integer cents. All five statistics "
    "are SELECTED or integer values, so the hash is exact despite the "
    "double value column. The windows and the final aggregate share "
    "one shuffle on (event_type, bucket) — the time-series rollup that "
    "turns a raw 100 TB tick stream into queryable bars.",
    tags=("timeseries", "resample", "ohlc", "window"),
)
def timeseries_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.floor(
        F.unix_timestamp(F.col("ts")) / _OHLC_BUCKET_SECONDS
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        "value",
        bucket.alias("b"),
    )
    w_a = Window.partitionBy("event_type", "b").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "b").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    flagged = ev.select(
        "event_type",
        "b",
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return (
        flagged.groupBy(
            "event_type",
            F.timestamp_seconds(
                F.col("b") * _OHLC_BUCKET_SECONDS
            ).alias("bucket_start"),
        )
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "volume_cents"
            ),
        )
    )


# --- data-quality constraint suite ------------------------------------


@register(
    "dq_constraint_checks",
    oracle="""
        WITH m AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) FILTER (WHERE o_custkey IS NULL)
                        AS BIGINT) AS n_null_cust,
                   CAST(count(*) AS BIGINT)
                     - CAST(count(DISTINCT o_orderkey) AS BIGINT)
                        AS n_dup_key,
                   CAST(count(*) FILTER (
                        WHERE o_totalprice <= 0 OR o_totalprice > 1000000)
                        AS BIGINT) AS n_bad_price,
                   CAST(count(*) FILTER (
                        WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
                        AS BIGINT) AS n_bad_status
            FROM orders
        )
        SELECT c.constraint_name, c.violations, c.passed
        FROM m, LATERAL (VALUES
            ('completeness_custkey', n_null_cust, n_null_cust = 0),
            ('uniqueness_orderkey', n_dup_key, n_dup_key = 0),
            ('range_totalprice', n_bad_price, n_bad_price = 0),
            ('domain_orderstatus', n_bad_status, n_bad_status = 0),
            ('size_nonempty', n_rows, n_rows > 0)
        ) AS c(constraint_name, violations, passed)
    """,
    doc="Deequ-style data-quality constraint suite over orders: "
    "completeness (no NULL foreign keys), key uniqueness, value-range "
    "and domain-membership checks, and a non-empty guard — ALL metrics "
    "from ONE aggregation pass over the table (a single scan at 100 TB, "
    "where five separate validation scans is the anti-pattern), then "
    "unpivoted to one row per constraint with its violation count and "
    "verdict. The ingest gate a training-data pipeline runs before "
    "promoting a snapshot; integer counts keep the hash exact.",
    tags=("quality", "validation", "agg", "traindata"),
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    m = od.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_custkey").isNull()).alias("n_null_cust"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))
        ).alias("n_dup_key"),
        F.count_if(
            (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 1_000_000)
        ).alias("n_bad_price"),
        F.count_if(
            ~F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("n_bad_status"),
    )
    checks = m.select(
        F.expr(
            "stack(5,"
            " 'completeness_custkey', n_null_cust, n_null_cust = 0,"
            " 'uniqueness_orderkey', n_dup_key, n_dup_key = 0,"
            " 'range_totalprice', n_bad_price, n_bad_price = 0,"
            " 'domain_orderstatus', n_bad_status, n_bad_status = 0,"
            " 'size_nonempty', n_rows, n_rows > 0)"
            " AS (constraint_name, violations, passed)"
        )
    )
    return checks


# --- key-skew profile --------------------------------------------------

_SKEW_TOP_N = 10


@register(
    "profile_skew_keys",
    oracle=f"""
        WITH per_key AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(cnt) AS BIGINT) AS n_rows
            FROM per_key
        )
        SELECT k.user_id, k.cnt, t.n_keys, t.n_rows,
               CAST(k.cnt * t.n_keys AS DOUBLE) / t.n_rows AS skew_ratio
        FROM per_key k, tot t
        ORDER BY k.cnt DESC, k.user_id
        LIMIT {_SKEW_TOP_N}
    """,
    doc="Key-skew profile: the top-10 hottest join/aggregation keys with "
    "their share versus a uniform spread (skew_ratio = cnt·n_keys/"
    "n_rows; 1.0 = perfectly uniform) — the diagnostic run BEFORE "
    "choosing salting (join_salted_skew, agg_salted_skew) or AQE skew "
    "handling at 100 TB. One count-per-key pass, a TakeOrdered top-k "
    "(never a full sort), and a broadcast one-row totals frame; the "
    "ratio is one fixed-order division of exact integers.",
    tags=("profile", "skew", "agg", "scale"),
)
def profile_skew_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            "n_keys",
            "n_rows",
            (
                F.col("cnt").cast("double")
                * F.col("n_keys")
                / F.col("n_rows")
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), "user_id")
        .limit(_SKEW_TOP_N)
    )
