"""Round-9 wave G — integer-exact statistics, windowed selection, and
remaining SQL/string surface.

Grounding: the reference's analytics are threshold CASE logic over a
single station's samples (estimate_queue.py:111-163). A fleet-wide
version of the same product question — "is queue length independent of
day-of-week?", "what is the smoothed recent queue level?", "what is the
robust (median) recent level?" — needs a chi-square independence test, an
exponentially-weighted moving average, and a running median, each stated
here so they are EXACT (integer arithmetic or dyadic-rational weights)
and therefore oracle-checkable across engines; float recurrences would
make cross-engine hashing meaningless. The DDL-defaults and URL rows pin
two more engine surfaces a migrating user hits on day one (CREATE TABLE
defaults; log/URL parsing), and the TTR row extends the text-quality lane
(SURVEY.md §2 LLM-data pipeline) with the classic lexical-diversity
score.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir

# --- chi-square independence, exact ingredients ----------------------------


@register(
    "stat_chi_square_independence",
    oracle="""
        WITH cells AS (
            SELECT o_orderstatus AS status, o_orderpriority AS priority,
                   CAST(count(*) AS BIGINT) AS observed
            FROM orders GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM cells)
        SELECT status, priority, observed,
               CAST(sum(observed) OVER (PARTITION BY status) AS BIGINT)
                   AS row_total,
               CAST(sum(observed) OVER (PARTITION BY priority) AS BIGINT)
                   AS col_total,
               n_total,
               CAST(sum(observed) OVER (PARTITION BY status) *
                    sum(observed) OVER (PARTITION BY priority) AS BIGINT)
                   AS expected_num
        FROM cells CROSS JOIN tot
    """,
    doc="Chi-square test of independence (order status × priority), "
    "carried as EXACT integers: per contingency cell the observed "
    "count, row/column marginals, grand total, and the expected-count "
    "numerator row_total*col_total (expected = that / n_total; the "
    "statistic Σ(obs·N − r·c)²/(N·r·c) is a pure function of these "
    "columns, left to the caller so no float ever enters the gate). "
    "One groupBy shuffle builds the cells; the marginals are windows "
    "over the tiny aggregated frame — at 100 TB the heavy pass is the "
    "first map-side-combinable count, and the contingency table that "
    "reaches the windows is |status|×|priority| rows regardless of "
    "input size.",
    tags=("stats", "agg", "window", "exact"),
)
def stat_chi_square_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cells = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    w_row = Window.partitionBy("status")
    w_col = Window.partitionBy("priority")
    w_all = Window.partitionBy()
    return cells.select(
        "status",
        "priority",
        "observed",
        F.sum("observed").over(w_row).alias("row_total"),
        F.sum("observed").over(w_col).alias("col_total"),
        F.sum("observed").over(w_all).alias("n_total"),
        (
            F.sum("observed").over(w_row) * F.sum("observed").over(w_col)
        ).alias("expected_num"),
    )


# --- dyadic EWMA -----------------------------------------------------------

_EWMA_LAGS = 8  # α = 1/2 over the last 8 observations — weights 128..1


@register(
    "timeseries_ewma_dyadic",
    oracle=f"""
        WITH pts AS (
            SELECT user_id, event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   ts
            FROM events
            WHERE user_id < 16 AND value IS NOT NULL
        )
        SELECT user_id, event_id,
               {' + '.join(
                   f"COALESCE(lag(cents, {j}) OVER w, 0) * "
                   f"{1 << (_EWMA_LAGS - 1 - j)}"
                   for j in range(_EWMA_LAGS)
               )} AS ewma_num,
               {' + '.join(
                   f"(CASE WHEN lag(cents, {j}) OVER w IS NOT NULL "
                   f"THEN {1 << (_EWMA_LAGS - 1 - j)} ELSE 0 END)"
                   for j in range(_EWMA_LAGS)
               )} AS weight_sum
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Exponentially-weighted moving average with DYADIC weights "
    "(α = 1/2, depth 8): per user-ordered event, "
    "ewma = Σ cents[t−j]·2^(7−j) / Σ 2^(7−j) — numerator and weight "
    "sum emitted as exact BIGINTs so the gate hashes integers, never "
    "a float recurrence (the float EWMA y=αx+(1−α)y is order-"
    "sensitive and engine-divergent; powers of two make every term "
    "exactly representable and the division the caller's one float "
    "op). Expressed as 8 fixed lag terms — one user_id exchange, no "
    "iteration, whole-stage-codegen arithmetic; depth is a constant "
    "so the plan is identical at 100 TB.",
    tags=("timeseries", "window", "exact", "smoothing"),
)
def timeseries_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        load_table(spark, sf_dir, "events")
        .where((F.col("user_id") < 16) & F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "ts",
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    wsum = None
    for j in range(_EWMA_LAGS):
        weight = 1 << (_EWMA_LAGS - 1 - j)
        lagged = F.lag("cents", j).over(w) if j else F.col("cents")
        term = F.coalesce(lagged, F.lit(0)) * weight
        avail = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(
            F.lit(0)
        )
        num = term if num is None else num + term
        wsum = avail if wsum is None else wsum + avail
    return pts.select(
        "user_id",
        "event_id",
        num.alias("ewma_num"),
        wsum.alias("weight_sum"),
    )


# --- exact running median --------------------------------------------------


@register(
    "window_running_median_exact",
    oracle="""
        WITH pts AS (
            SELECT user_id, event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents, ts
            FROM events
            WHERE user_id < 16 AND value IS NOT NULL
        )
        SELECT user_id, event_id,
               CAST(2 * median(cents) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS median_x2
        FROM pts
    """,
    doc="EXACT running median over a 10-row trailing window per user — "
    "the robust twin of the EWMA row (one outlier sample shifts a mean "
    "but not a median; the reference's visibility gate, "
    "estimate_queue.py:145-152, is precisely an outlier guard). "
    "Spark's `percentile` (exact, not percentile_approx) over a ROWS "
    "frame vs DuckDB's windowed `median`; emitted as 2×median cast to "
    "BIGINT — an even-sized frame's median is a midpoint ending in "
    ".5, and doubling makes it integer-exact so the hash gate never "
    "compares floats. Exact percentile over a bounded 10-row frame is "
    "O(frame log frame) per row and shuffles once on user_id — "
    "constant-factor at 100 TB (it is UNBOUNDED exact medians that "
    "don't scale; bounded frames do).",
    tags=("window", "timeseries", "exact", "robust"),
)
def window_running_median_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = (
        load_table(spark, sf_dir, "events")
        .where((F.col("user_id") < 16) & F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "ts",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return pts.select(
        "user_id",
        "event_id",
        (2 * F.expr("percentile(cents, 0.5)").over(w))
        .cast("long")
        .alias("median_x2"),
    )


# --- CREATE TABLE ... DEFAULT ----------------------------------------------


@register(
    "sql_ddl_default_columns",
    oracle="""
        WITH ins AS (
            SELECT o_orderkey AS id,
                   CASE WHEN o_orderkey % 2 = 1
                        THEN o_orderstatus ELSE 'new' END AS status,
                   CASE WHEN o_orderkey % 3 = 0
                        THEN CAST(o_orderkey % 5 AS INTEGER)
                        ELSE 7 END AS prio
            FROM orders WHERE o_orderkey < 500
        )
        SELECT status, prio,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(id) AS BIGINT) AS sum_id
        FROM ins GROUP BY status, prio
    """,
    doc="Column DEFAULT values (SQL:2011, Spark 3.4+ DDL surface): a "
    "table declared with `status STRING DEFAULT 'new', prio INT "
    "DEFAULT 7` takes three INSERT shapes — id only (both defaults "
    "fire), explicit status (prio defaults), explicit prio via the "
    "DEFAULT keyword mixed with a real value — then aggregates the "
    "result. The oracle restates which default each modular slice "
    "should have received, so the hash gate verifies the engine "
    "filled defaults exactly where the column list omitted a value "
    "and nowhere else. Hermetic: uuid table name, external LOCATION "
    "under a per-invocation scratch dir, dropped in finally.",
    tags=("sql", "ddl", "catalog", "defaults"),
)
def sql_ddl_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = f"orders_def_{uuid.uuid4().hex[:12]}"
    src = f"src_{t}"
    scratch = new_scratch_dir(
        f"ddldef_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    loc = os.path.join(scratch, t)
    load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 500
    ).createOrReplaceTempView(src)
    try:
        spark.sql(
            f"CREATE TABLE {t} (id BIGINT, "
            f"status STRING DEFAULT 'new', prio INT DEFAULT 7) "
            f"USING PARQUET LOCATION '{loc}'"
        )
        # four column-list shapes; a default fires exactly where the
        # list omits the column
        spark.sql(
            f"INSERT INTO {t} (id) SELECT o_orderkey FROM {src} "
            f"WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 != 0"
        )
        spark.sql(
            f"INSERT INTO {t} (id, status) "
            f"SELECT o_orderkey, o_orderstatus FROM {src} "
            f"WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 != 0"
        )
        spark.sql(
            f"INSERT INTO {t} (id, prio) "
            f"SELECT o_orderkey, CAST(o_orderkey % 5 AS INT) FROM {src} "
            f"WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 = 0"
        )
        spark.sql(
            f"INSERT INTO {t} (id, status, prio) "
            f"SELECT o_orderkey, o_orderstatus, "
            f"CAST(o_orderkey % 5 AS INT) FROM {src} "
            f"WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 = 0"
        )
        agg = spark.sql(
            f"SELECT status, prio, count(*) AS n, "
            f"CAST(sum(id) AS BIGINT) AS sum_id "
            f"FROM {t} GROUP BY status, prio"
        )
        out = detach_result(agg, scratch)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.catalog.dropTempView(src)
    return out


# --- URL parsing -----------------------------------------------------------


@register(
    "string_url_parse",
    oracle="""
        WITH urls AS (
            SELECT c_custkey, c_nationkey,
                   lower(replace(c_mktsegment, ' ', '-'))
                       || '.example.com' AS host,
                   '/cust/' || CAST(c_custkey AS VARCHAR) AS path
            FROM customer
        )
        SELECT host,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(length(path)) AS BIGINT) AS path_len_sum,
               CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
               CAST(sum(c_custkey) AS BIGINT) AS custkey_sum
        FROM urls GROUP BY host
    """,
    doc="URL decomposition with Spark's `parse_url` (HOST / PATH / "
    "QUERY-parameter extraction) — the first operation of any web-"
    "corpus pipeline (URL-keyed dedup, domain filtering, per-host "
    "crawl stats; cf. the dedup lane's normalized-URL row). URLs are "
    "built deterministically from customer attributes, parsed back "
    "with parse_url, and aggregated per host; the oracle states what "
    "each component must decompose to, so the gate pins parse_url's "
    "semantics (host casing, path boundaries, query-param isolation) "
    "against a string-algebra reconstruction. parse_url is a JVM "
    "intrinsic inside whole-stage codegen — per-row parsing with no "
    "Python and no extra exchange beyond the final host groupBy.",
    tags=("string", "url", "text", "web"),
)
def string_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower(F.replace(F.col("c_mktsegment"), F.lit(" "), F.lit("-"))),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?nation="),
        F.col("c_nationkey").cast("string"),
        F.lit("&src=sim"),
    )
    parsed = cust.select(
        "c_custkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("nation")).alias(
            "nation_param"
        ),
    )
    return parsed.groupBy("host").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("path")).alias("path_len_sum"),
        F.countDistinct(F.col("nation_param").cast("int")).alias(
            "n_nations"
        ),
        F.sum("c_custkey").alias("custkey_sum"),
    )


# --- lexical diversity (TTR) ----------------------------------------------


@register(
    "text_ttr_lexical_diversity",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' ')))
                        AS BIGINT) AS n_types
            FROM documents
        )
        SELECT doc_id, lang, n_tokens, n_types,
               CAST((1000 * n_types) // n_tokens AS BIGINT) AS ttr_milli,
               CAST(((1000 * n_types) // n_tokens) // 100 AS BIGINT)
                   AS ttr_band
        FROM toks
    """,
    doc="Type-token ratio (lexical diversity) per document — the classic "
    "quality signal next to the Gopher gates in the text-quality lane: "
    "repetitive machine-generated text has low TTR, natural prose "
    "high. Token count, distinct-type count, and TTR in integer "
    "millis (1000·types ÷ tokens, floor division — no float ratio "
    "ever materializes) plus a decile band for downstream filtering. "
    "Pure per-row array work (split → array_distinct → size) with "
    "ZERO shuffles — the shape that matters at 100 TB, where quality "
    "scoring must be a map-only pass.",
    tags=("text", "quality", "llm-data", "exact"),
)
def text_ttr_lexical_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    counted = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
    )
    # integer floor-division end to end (`div`): no float ratio exists
    # anywhere, so the hash gate compares pure BIGINTs
    return counted.selectExpr(
        "doc_id",
        "lang",
        "n_tokens",
        "n_types",
        "(1000 * n_types) div n_tokens AS ttr_milli",
        "((1000 * n_types) div n_tokens) div 100 AS ttr_band",
    )
