"""Round-7 driver-round additions, wave 3: dynamic partition pruning,
the hashing trick, permissive CSV ingestion, and Zipf vocabulary stats.

Grounding: the remaining at-scale read-path features. Dynamic partition
pruning is THE star-schema join optimization (the dim filter's matching
keys are computed at runtime and pushed into the fact scan's partition
listing — planning-time pruning can't see through a join). Hashed
features are how text becomes fixed-width vectors without a vocabulary
shuffle. PERMISSIVE CSV parsing is the ingestion reality of any 100 TB
raw feed (bad lines must be quarantined, not crash the job). Zipf rank/
coverage tables are how tokenizer vocab sizes get chosen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir


# --- dynamic partition pruning ------------------------------------------


def final_scan_metric(df: DataFrame, path_marker: str, metric: str):
    """Walk the EXECUTED (post-AQE) plan — through QueryStage boundaries,
    which collectLeaves() treats as leaves — and return ``metric`` from
    the file scan whose location contains ``path_marker``. Used by the
    DPP proof: the scan's runtime ``numFiles`` is the number of files
    actually read AFTER dynamic pruning (the static inputFiles() listing
    is pre-pruning and would prove nothing)."""
    found: list = []

    def walk(node) -> None:
        name = node.nodeName()
        if "Scan" in name and path_marker in node.toString():
            found.append(node)
            return
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStage"):
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    if not found:
        return None
    return found[0].metrics().apply(metric).value()


_CONVERSION_TYPES = ("purchase", "signup")


def _dpp_join(spark: SparkSession, scratch: str) -> DataFrame:
    fact = spark.read.parquet(f"{scratch}/fact")
    dim = spark.read.parquet(f"{scratch}/dim")
    return (
        fact.join(dim, "event_type")
        .where(F.col("category") == "conversion")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
    )


def _write_dpp_fixture(spark: SparkSession, sf_dir: str) -> str:
    scratch = new_scratch_dir("dpp")
    load_table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(f"{scratch}/fact")
    # dim derived from the fact's own type space, persisted as a FILE
    # relation: DPP needs a statistics-bearing scan on the build side
    # (an in-memory LocalRelation degrades the pruning expression to a
    # constant-true no-op — observed, not hypothetical)
    cat = (
        F.when(
            F.col("event_type").isin(*_CONVERSION_TYPES), F.lit("conversion")
        )
        .when(F.col("event_type").isin("click", "view"), F.lit("engagement"))
        .otherwise(F.lit("noise"))
    )
    load_table(spark, sf_dir, "events").select("event_type").distinct().select(
        "event_type", cat.alias("category")
    ).coalesce(1).write.mode("overwrite").parquet(f"{scratch}/dim")
    return scratch


@register(
    "join_dynamic_partition_pruning",
    oracle=f"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events
        WHERE event_type IN {_CONVERSION_TYPES!r}
        GROUP BY event_type
    """,
    doc="Dynamic partition pruning: the fact table lives partitioned by "
    "event_type, the dim carries a category the query filters on — so "
    "WHICH partitions survive is only knowable after evaluating the "
    "dim filter. Spark computes the dim's matching keys at runtime "
    "(reusing the broadcast) and injects them into the fact scan's "
    "partition listing: the executed plan carries "
    "dynamicpruningexpression(event_type IN dynamicpruning#N) — the "
    "builder asserts the expression is the real subquery form, not "
    "the constant-true fallback, and tests/test_advanced8.py proves "
    "the runtime numFiles drops from 5 partitions to 2. On a 100 TB "
    "star schema this is the difference between scanning the whole "
    "fact and scanning the two partitions the dim selects.",
    tags=("join", "partitioning", "pruning", "scale"),
)
def join_dynamic_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scratch = _write_dpp_fixture(spark, sf_dir)
    out = _dpp_join(spark, scratch)
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruningexpression" not in plan or (
        "dynamicpruningexpression(true)" in plan
    ):
        raise AssertionError(
            "expected a real runtime dynamicpruningexpression(... IN "
            "dynamicpruning#N) in the fact scan's PartitionFilters"
        )
    return detach_result(out, scratch)


# --- the hashing trick ---------------------------------------------------

N_FEATURE_BUCKETS = 256


@register(
    "text_feature_hashing",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(CASE WHEN text = '' THEN []
                        ELSE string_split_regex(text, '\\s+') END) AS tok
          FROM documents
        )
        SELECT ('0x' || substring(md5(tok), 1, 12))::BIGINT
                   % {N_FEATURE_BUCKETS} AS bucket,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM toks
        GROUP BY bucket
    """,
    doc="The hashing trick (HashingTF's semantics with a portable md5 "
    "bucket function instead of murmur3, so the oracle can replay "
    "it): token -> 48-bit md5 prefix mod 256 buckets, no vocabulary "
    "build, no dictionary broadcast, fixed feature width known before "
    "the data is seen — the property that matters at 100 TB, where "
    "the true vocabulary is unbounded and a fit-then-transform "
    "two-pass is a full extra scan. Output is the corpus-level "
    "feature-space profile (tokens and document frequency per "
    "bucket); per-doc vectors are the same explode one groupBy "
    "earlier.",
    tags=("text", "traindata", "features"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
        % N_FEATURE_BUCKETS
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# --- permissive CSV ingestion --------------------------------------------

N_BAD_LINES = 7


@register(
    "scan_csv_permissive_corrupt",
    oracle=f"""
        SELECT o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM orders
        GROUP BY o_orderstatus
        UNION ALL
        SELECT '_corrupt', CAST({N_BAD_LINES} AS BIGINT),
               CAST(NULL AS BIGINT)
    """,
    doc="PERMISSIVE CSV ingestion with corrupt-record quarantine: a raw "
    "feed of well-formed order lines plus deliberately malformed ones "
    "(wrong arity / unparseable numerics) is read with an explicit "
    "schema + columnNameOfCorruptRecord. Bad lines do NOT fail the "
    "job (FAILFAST would) and do NOT silently vanish (DROPMALFORMED "
    "would): they surface as rows whose _corrupt column holds the "
    "raw line, counted here alongside the per-status aggregates of "
    "the clean rows. The only acceptable posture for a 100 TB raw "
    "feed — you keep the evidence. Spark caveat encoded here: the "
    "corrupt column must be materialized via a cache-free select "
    "(referencing it requires it in the schema) and counts are "
    "deterministic because the bad lines are constructed, not "
    "sampled.",
    tags=("scan", "csv", "quality"),
)
def scan_csv_permissive_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = new_scratch_dir("csv_perm")
    orders = load_table(spark, sf_dir, "orders")
    good = orders.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey"),
            F.round(F.col("o_totalprice") * 100).cast("long"),
            F.col("o_orderstatus"),
        ).alias("value")
    )
    # the malformed field is CENTS — a column the downstream aggregate
    # references. CSV required-schema pruning (on by default) only
    # CONVERTS referenced columns, so a line that is malformed in an
    # unreferenced position (wrong arity, bad first field) parses
    # "clean" under pruning and never reaches the quarantine — the bad
    # value must sit where the query looks
    bad = spark.range(N_BAD_LINES).select(
        F.concat(
            F.lit("900000"),
            F.col("id"),
            F.lit(",not_a_number_"),
            F.col("id"),
            F.lit(",B"),
        ).alias("value")
    )
    good.unionAll(bad).write.mode("overwrite").text(f"{scratch}/feed")
    parsed = (
        spark.read.schema(
            "o_orderkey long, cents long, status string, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(f"{scratch}/feed")
    )
    # ONE aggregation pass over clean and quarantined rows together: a
    # corrupt-only branch would trip Spark's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN guard (the pruned scan may not
    # reference only the corrupt column), and one pass is cheaper anyway
    key = (
        F.when(F.col("_corrupt").isNotNull(), F.lit("_corrupt"))
        .otherwise(F.col("status"))
        .alias("status")
    )
    out = parsed.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("_corrupt").isNull(), F.col("cents"))
        ).alias("cents_sum"),
    )
    return detach_result(out, scratch)


# --- Zipf vocabulary statistics -------------------------------------------


# Zipf coverage is only ever read for a top-K vocabulary prefix, so the
# stats table is bounded to the top ZIPF_VOCAB_K tokens BEFORE any global
# window runs. A 100 TB web corpus has hundreds of millions of distinct
# whitespace tokens (typos, URLs, numerals) — a row_number/cumsum window
# over that unbounded relation would funnel the whole vocabulary through
# one task, the exact shape operators/traindata.py's text_vocab_encode
# refuses. Truncation is exact: the running cumulative count over the
# (cnt DESC, tok) prefix is unchanged by dropping the tail.
ZIPF_VOCAB_K = 65536


@register(
    "text_vocab_zipf_stats",
    oracle=f"""
        WITH counts AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt
          FROM (
            SELECT unnest(CASE WHEN text = '' THEN []
                          ELSE string_split_regex(text, '\\s+') END) AS tok
            FROM documents
          )
          GROUP BY tok
        ),
        ranked AS (
          SELECT tok, cnt,
                 CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
                     AS rank,
                 CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_cnt
          FROM counts
        )
        SELECT tok, cnt, rank, cum_cnt FROM ranked
        WHERE rank <= {ZIPF_VOCAB_K}
    """,
    doc="Zipf rank/coverage table over the top-ZIPF_VOCAB_K tokens: global "
    "token counts ranked by frequency with a running cumulative count — "
    "divide cum_cnt by the corpus total and you read off exactly how much "
    "of the corpus a top-K vocabulary covers, which is how tokenizer vocab "
    "sizes are actually chosen. The distinct-token relation is UNBOUNDED "
    "at corpus scale, so the plan takes the top-K by (cnt DESC, tok) first "
    "(Spark compiles orderBy+limit to TakeOrderedAndProject — per-partition "
    "heaps, no global sort) and only then runs the rank/cumsum window over "
    "the ≤K surviving rows; truncation does not change any retained "
    "cum_cnt. Ties break lexicographically so the rank is deterministic.",
    tags=("text", "traindata", "vocab"),
)
def text_vocab_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "tok").limit(ZIPF_VOCAB_K)
    w = Window.orderBy(F.col("cnt").desc(), "tok")
    return top.select(
        "tok",
        "cnt",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_cnt"),
    )
