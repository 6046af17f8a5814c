"""Round-8 wave D — at-scale operational additions: AQE skew-join
splitting and the hidden file-metadata column.

Grounding: ``join_salted_skew`` (Part B) handles skew MANUALLY (explicit
salting); this wave adds the runtime answer — AQE's OptimizeSkewedJoin
detecting an oversized shuffle partition at execution time and splitting
it, which is what a 1000-executor job leans on when the skew isn't known
at authoring time. The ``_metadata`` column is the lineage surface: at
100 TB, per-file row counts and file identity are how pipelines audit
partitioned sinks (which file holds what, did the writer produce the
expected layout) without a separate manifest system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir
from .advanced4 import _with_scoped_confs

# --- AQE skew join ---------------------------------------------------------

def _skew_key():
    # ~75% of lineitem rows collapse onto key 0; the rest keep their
    # order key (built lazily — Column exprs need an active session)
    return F.when(F.col("l_orderkey") % 4 != 0, F.lit(0)).otherwise(
        F.col("l_orderkey")
    )


def _skew_confs(sf_dir: str) -> dict[str, str]:
    """Skew-detection thresholds scaled RELATIVE to the input volume —
    the same factor-over-median criteria the 256 MB prod defaults encode,
    shrunk so a locally-sized hot partition (≈ input/8 after shuffle
    compression) still trips them at every test scale factor."""
    import os

    path = os.path.join(sf_dir, "lineitem.parquet")
    if os.path.isdir(path):
        size = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        size = os.path.getsize(path)
    threshold = max(4096, size // 32)  # hot partition is ~4x this
    return {
        # a broadcast join has no shuffle partitions to skew; at 100 TB
        # both sides exceed the broadcast threshold, so force the
        # shuffle plan
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            threshold
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            threshold // 2
        ),
        # the split target is clamped to coalescePartitions.
        # minPartitionSize (1 MB default): a locally-sized hot partition
        # could never split into >1 chunk under that clamp, so the rule
        # would report zero skewed partitions — scale the clamp too
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": str(
            threshold // 2
        ),
        # the aggregate ABOVE the join re-shuffles its output, and
        # OptimizeSkewedJoin normally declines when splitting would add
        # an exchange — force it, the documented switch for exactly this
        # agg-over-skewed-join shape
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }


def _skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import fan_out

    # AQE can only split a skewed reduce partition at MAP-OUTPUT
    # granularity: with a single-split scan (one compacted parquet file
    # = one map task) the hot partition is one indivisible block and the
    # rule reports zero skewed partitions. fan_out gives the fact stage
    # real map parallelism — at 100 TB the scan has thousands of splits
    # and this is a structural no-op (fan_out's guard).
    fact = fan_out(load_table(spark, sf_dir, "lineitem")).select(
        _skew_key().alias("k"),
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    dim = (
        load_table(spark, sf_dir, "orders")
        # o_orderkey 0 exists in the data and 0 % 4 == 0 — without the
        # exclusion the dim would carry TWO k=0 rows (one COLD, one HOT)
        # and every hot fact row would double-join
        .where((F.col("o_orderkey") % 4 == 0) & (F.col("o_orderkey") != 0))
        .select(F.col("o_orderkey").alias("k"))
        .unionByName(
            spark.range(1).select(F.lit(0).cast("long").alias("k"))
        )
        .select(
            "k",
            F.when(F.col("k") == 0, F.lit("HOT"))
            .otherwise(F.lit("COLD"))
            .alias("heat"),
        )
    )
    return (
        fact.join(dim, "k")
        .groupBy("l_returnflag", "heat")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").alias("qty_sum"),
        )
    )


@register(
    "join_aqe_skew",
    oracle="""
        WITH fact AS (
          SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
                      ELSE l_orderkey END AS k,
                 l_returnflag, CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem
        ),
        dim AS (
          SELECT o_orderkey AS k, 'COLD' AS heat
          FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey <> 0
          UNION ALL SELECT 0, 'HOT'
        )
        SELECT f.l_returnflag, d.heat,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(f.qty) AS BIGINT) AS qty_sum
        FROM fact f JOIN dim d ON f.k = d.k
        GROUP BY f.l_returnflag, d.heat
    """,
    doc="AQE skew-join splitting: ~75% of the fact rows collapse onto "
    "one join key, so one shuffle partition dwarfs the median; "
    "OptimizeSkewedJoin detects it AT EXECUTION TIME (factor-x-median "
    "+ absolute threshold, scaled to local data volume) and splits "
    "the hot partition across tasks, replicating the matching dim "
    "rows — no salting in the query text at all. Values are strategy-"
    "independent (the oracle is the plain relational join); the "
    "executed plan carrying SortMergeJoin(skew=true) is pinned in "
    "tests/test_advanced11.py via aqe_skew_plan. Complements "
    "join_salted_skew (the manual fix) and agg_salted_skew: this is "
    "the runtime fix for skew you didn't author around.",
    tags=("join", "skew", "aqe", "scale"),
)
def join_aqe_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_scoped_confs(
        spark, _skew_confs(sf_dir), lambda: _skew_join(spark, sf_dir)
    )


def aqe_skew_plan(spark: SparkSession, sf_dir: str) -> str:
    """Executed (post-AQE) plan string for the skew join — plan-pin
    support: materializes the join under the scoped confs, then renders
    the final adaptive plan."""
    saved: dict[str, str | None] = {}
    for k, v in _skew_confs(sf_dir).items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        df = _skew_join(spark, sf_dir)
        df.collect()  # drive AQE to its final plan
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --- hidden file-metadata column -------------------------------------------

N_BUCKETS = 8


@register(
    "scan_file_metadata",
    oracle=f"""
        SELECT CAST(user_id % {N_BUCKETS} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(1 AS BIGINT) AS n_files,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS value_cents
        FROM events
        GROUP BY 1
    """,
    doc="The hidden _metadata column as a lineage audit: events are "
    "written partitioned by an 8-way bucket (repartitioned by the "
    "bucket column first, so each partition directory gets EXACTLY "
    "one file), then the read-back groups by the bucket value parsed "
    "out of _metadata.file_path and counts rows AND distinct "
    "_metadata.file_name per bucket. The oracle pins all three "
    "claims: the path-derived bucket matches the data (counts and "
    "cent sums equal the relational group-by), and the writer laid "
    "out one file per partition (n_files = 1, a literal in the "
    "oracle — a multi-file or misrouted layout breaks the hash). "
    "This is the audit a 100 TB partitioned sink runs after every "
    "backfill: file-level lineage from the engine's own metadata "
    "column, no manifest service needed.",
    tags=("scan", "metadata", "partitioning", "operational"),
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = new_scratch_dir("file_metadata")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % N_BUCKETS).alias("bucket"),
        F.round(F.col("value") * 100.0, 0).cast("long").alias("cents"),
    )
    table = f"{scratch}/table"
    (
        ev.repartition(N_BUCKETS, "bucket")
        .write.partitionBy("bucket")
        .parquet(table)
    )
    back = spark.read.parquet(table)
    out = (
        back.select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"bucket=(\d+)/", 1
            )
            .cast("long")
            .alias("bucket"),
            F.col("_metadata.file_name").alias("file_name"),
            "cents",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("file_name").alias("n_files"),
            F.sum("cents").alias("value_cents"),
        )
    )
    return detach_result(out, scratch)
