"""Round-6 driver-round additions, wave A: the Spark 4 procedural-SQL
surface (SQL scripting, EXECUTE IMMEDIATE, lateral column aliases),
ordered listagg, DataFrame.transpose, join strategy hints, and a
composable count-min sketch.

Grounding: the reference drives its pipeline imperatively (tasks.py
wires Luigi tasks; estimate_queue.py:181-192 sequences load → score →
upsert in Python). Spark 4's SQL scripting and EXECUTE IMMEDIATE are
that orchestration surface expressed *inside* the engine — control flow
and dynamic statement construction without leaving SQL — while the
strategy-hint row makes the physical-join contract explicit (the
decision a 100 TB deployment cannot leave to chance), and the count-min
sketch is the mergeable frequency summary a streaming-scale pipeline
uses where exact per-key counts would be state-unbounded.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# --- SQL scripting ---------------------------------------------------------


@register(
    "sql_scripting_block",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(power(2, ceil(log2(count(*)))) AS BIGINT)
                   AS pow2_ceiling,
               CAST(ceil(log2(count(*))) AS BIGINT) AS doubling_steps
        FROM orders
    """,
    doc="Spark 4 SQL scripting (SQL/PSM BEGIN ... END): a WHILE loop "
    "doubles an accumulator until it reaches count(orders), returning "
    "the power-of-two ceiling and the step count — genuinely "
    "procedural control flow executed INSIDE the engine (the script's "
    "last SELECT is the result set). This is the reference's Python "
    "driver loop (estimate_queue.py:181-192 sequences statements "
    "imperatively) moved server-side, where a cluster deployment "
    "needs it: no driver round-trip per iteration, variables are "
    "session-scoped and dropped with the script. The oracle states "
    "the closed form (2^ceil(log2 n)) the loop computes.",
    tags=("sql", "scripting", "procedural"),
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"orders_script_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    try:
        out = spark.sql(f"""
            BEGIN
              DECLARE n BIGINT;
              DECLARE p BIGINT DEFAULT 1;
              DECLARE steps BIGINT DEFAULT 0;
              SET n = (SELECT count(*) FROM {view});
              WHILE p < n DO
                SET p = p * 2;
                SET steps = steps + 1;
              END WHILE;
              SELECT n AS n_orders, p AS pow2_ceiling,
                     steps AS doubling_steps;
            END
        """)
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(view)


# --- EXECUTE IMMEDIATE -----------------------------------------------------


@register(
    "sql_execute_immediate",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderstatus = 'O'
        GROUP BY o_orderpriority
    """,
    doc="EXECUTE IMMEDIATE over a session variable holding the query "
    "text, with positional USING parameters — dynamic SQL without "
    "f-string injection: the statement template is data, the cutoff "
    "timestamp and status are bound as typed parameters, and Catalyst "
    "compiles the same plan as the static query (which is what the "
    "oracle states). Complements sql_parameterized (parameter "
    "markers) and sql_session_variables (typed session state); this "
    "row is the remaining piece: statements CONSTRUCTED at runtime, "
    "the pattern ETL frameworks use for metadata-driven jobs.",
    tags=("sql", "dynamic", "parameters"),
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"orders_exec_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    qvar = f"stmt_{uuid.uuid4().hex[:8]}"
    try:
        spark.sql(f"DECLARE VARIABLE {qvar} STRING")
        # the statement template is DATA (a variable), not code —
        # parameters arrive via USING, never via string interpolation
        template = (
            "SELECT o_orderpriority, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS total_cents "
            f"FROM {view} "
            "WHERE o_orderdate >= ? AND o_orderstatus = ? "
            "GROUP BY o_orderpriority"
        )
        spark.sql(
            f"SET VARIABLE {qvar} = '{template.replace(chr(39), chr(39) * 2)}'"
        )
        out = spark.sql(
            f"EXECUTE IMMEDIATE {qvar} "
            "USING TIMESTAMP '1998-01-01 00:00:00', 'O'"
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TEMPORARY VARIABLE IF EXISTS {qvar}")
        spark.catalog.dropTempView(view)


# --- lateral column aliases ------------------------------------------------


@register(
    "sql_lateral_column_alias",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS gross_cents,
               CAST(round((gross_cents / 100.0) * (1 + l_tax) * 100)
                    AS BIGINT) AS taxed_cents
        FROM lineitem
        WHERE l_quantity >= 25
    """,
    doc="Lateral column aliases: a SELECT-list expression references a "
    "sibling alias defined earlier in the SAME select list "
    "(taxed_cents is built from gross_cents), so derived-column "
    "chains need no nested subquery or repeated expression text — "
    "the reference's estimator derives each column from the previous "
    "one exactly this way in pandas (estimate_queue.py:111-163). "
    "Catalyst inlines the alias, so the plan is identical to the "
    "expanded form; DuckDB supports the same SQL:2016 surface, so "
    "the oracle is textually the same query.",
    tags=("sql", "projection"),
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"lineitem_lca_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    try:
        out = spark.sql(f"""
            SELECT l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS gross_cents,
                   CAST(round((gross_cents / 100.0) * (1 + l_tax) * 100)
                        AS BIGINT) AS taxed_cents
            FROM {view}
            WHERE l_quantity >= 25
        """)
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(view)


# --- ordered listagg -------------------------------------------------------


@register(
    "agg_listagg_ordered",
    oracle="""
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               CAST(count(*) AS BIGINT) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    doc="listagg(... ) WITHIN GROUP (ORDER BY ...) — the SQL:2016 "
    "ordered string aggregate added in Spark 4.0: nations "
    "concatenated per region in deterministic name order. Unlike "
    "collect_list (array, order undefined without a window trick), "
    "the WITHIN GROUP clause makes the concatenation order part of "
    "the aggregate's semantics, so the result is hash-stable by "
    "construction — which is exactly what a value-hash oracle gate "
    "needs. DuckDB's equivalent is string_agg(expr, sep ORDER BY k).",
    tags=("aggregate", "string", "sql2016"),
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    vn = f"nation_la_{uuid.uuid4().hex[:8]}"
    vr = f"region_la_{uuid.uuid4().hex[:8]}"
    nation.createOrReplaceTempView(vn)
    region.createOrReplaceTempView(vr)
    try:
        out = spark.sql(f"""
            SELECT r_name,
                   listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                       AS nations,
                   CAST(count(*) AS BIGINT) AS n_nations
            FROM {vn} JOIN {vr} ON n_regionkey = r_regionkey
            GROUP BY r_name
        """)
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(vn)
        spark.catalog.dropTempView(vr)


# --- DataFrame.transpose ---------------------------------------------------


@register(
    "agg_transpose_matrix",
    oracle="""
        WITH j AS (
          SELECT r_name, c_acctbal
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        )
        SELECT 'acctbal_cents' AS key,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                    FILTER (r_name = 'AFRICA') AS BIGINT) AS "AFRICA",
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                    FILTER (r_name = 'AMERICA') AS BIGINT) AS "AMERICA",
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                    FILTER (r_name = 'ASIA') AS BIGINT) AS "ASIA",
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                    FILTER (r_name = 'EUROPE') AS BIGINT) AS "EUROPE",
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                    FILTER (r_name = 'MIDDLE EAST') AS BIGINT)
                   AS "MIDDLE EAST"
        FROM j
        UNION ALL
        SELECT 'n_customers',
               CAST(count(*) FILTER (r_name = 'AFRICA') AS BIGINT),
               CAST(count(*) FILTER (r_name = 'AMERICA') AS BIGINT),
               CAST(count(*) FILTER (r_name = 'ASIA') AS BIGINT),
               CAST(count(*) FILTER (r_name = 'EUROPE') AS BIGINT),
               CAST(count(*) FILTER (r_name = 'MIDDLE EAST') AS BIGINT)
        FROM j
    """,
    doc="DataFrame.transpose (Spark 4.0): a per-region metrics frame "
    "(5 region rows x 2 metric columns) flipped into a metrics-as-"
    "rows matrix (2 rows x 5 region columns) — the report-shaped "
    "pivot analysts ask for without hand-writing a conditional "
    "aggregation per output column. Both metrics are cast to BIGINT "
    "first because transpose unifies all value columns to one type "
    "(the same reason the oracle CASTs every FILTER aggregate). The "
    "oracle is the hand-written conditional aggregation transpose "
    "replaces.",
    tags=("aggregate", "pivot", "transpose"),
)
def agg_transpose_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    metrics = (
        customer.join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy("r_name")
        .agg(
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("long")
            .alias("acctbal_cents"),
            F.count(F.lit(1)).cast("long").alias("n_customers"),
        )
    )
    return metrics.transpose()


# --- join strategy hints ---------------------------------------------------


_HINT_STRATEGIES = ("BROADCAST", "SHUFFLE_HASH", "MERGE")

_STRATEGY_AGG = """
    SELECT /*+ {hint}(c) */ '{hint}' AS strategy,
           c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM {orders} o JOIN {customer} c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


@register(
    "join_strategy_hints",
    oracle="""
        WITH seg AS (
          SELECT c_mktsegment,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS total_cents
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment
        )
        SELECT s.strategy, seg.c_mktsegment, seg.n_orders, seg.total_cents
        FROM seg CROSS JOIN (
          SELECT unnest(['BROADCAST', 'SHUFFLE_HASH', 'MERGE']) AS strategy
        ) s
    """,
    doc="Physical join strategy hints — the SAME orders-by-customer "
    "aggregate computed three times under BROADCAST, SHUFFLE_HASH and "
    "MERGE hints, tagged and unioned. The value contract: strategy "
    "choice NEVER changes results (the oracle states one aggregate "
    "cross-joined with the three tags), while the plan contract — "
    "each hint produces its named physical operator "
    "(BroadcastHashJoin / ShuffledHashJoin / SortMergeJoin) — is "
    "pinned in tests/test_advanced10.py. At 100 TB this is the "
    "difference between a 2-minute broadcast join and an hour-long "
    "shuffle: the hint surface is how a pipeline makes that choice "
    "explicit instead of trusting size estimates at the planner "
    "boundary.",
    tags=("join", "hints", "scale"),
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    vo = f"orders_hint_{uuid.uuid4().hex[:8]}"
    vc = f"customer_hint_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(vo)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(vc)
    try:
        parts = [
            spark.sql(
                _STRATEGY_AGG.format(hint=h, orders=vo, customer=vc)
            )
            for h in _HINT_STRATEGIES
        ]
        out = parts[0].unionAll(parts[1]).unionAll(parts[2])
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(vo)
        spark.catalog.dropTempView(vc)


def strategy_hint_plan(spark: SparkSession, sf_dir: str, hint: str) -> str:
    """Formatted physical plan for one hinted variant (plan-pin tests)."""
    vo = f"orders_hintp_{uuid.uuid4().hex[:8]}"
    vc = f"customer_hintp_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(vo)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(vc)
    try:
        df = spark.sql(_STRATEGY_AGG.format(hint=hint, orders=vo, customer=vc))
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(mode)
    finally:
        spark.catalog.dropTempView(vo)
        spark.catalog.dropTempView(vc)


# --- count-min sketch ------------------------------------------------------

CMS_WIDTH = 2048  # buckets per row: >> 1500 distinct custkeys at sf0.01
CMS_SEEDS = (17, 71, 179)  # depth 3: three independent xxhash64 rows


@register(
    "agg_count_min_sketch",
    oracle="""
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS exact_n,
               TRUE AS cms_overestimates
        FROM orders
        GROUP BY o_custkey
    """,
    doc="Count-min sketch as a DataFrame composition: depth-3 x "
    "width-2048 bucket counts via pmod(xxhash64(key, seed), width) — "
    "ONE shuffle over (seed, bucket) after a 3-way explode — then "
    "each key's estimate is the least of its three bucket counts, "
    "joined in from three broadcast-sized (width-row) maps. The CMS "
    "guarantee (estimate >= exact, always, for every key) is emitted "
    "as a per-key boolean the oracle states as literal TRUE — the "
    "hash gate thereby verifies the sketch's defining inequality on "
    "real data, giving the approx family numeric accountability "
    "(agg_approx_distinct / approx_top_k are rows-only; this row is "
    "oracle-checked). At stream scale the bucket matrix is fixed-size "
    "mergeable state (3 x 2048 longs) where exact per-key counts "
    "grow without bound.",
    tags=("aggregate", "sketch", "approx", "scale"),
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select("o_custkey")
    # one pass: each key row contributes one (seed, bucket) increment per
    # depth row; a single groupBy builds the whole 3 x 2048 bucket matrix
    exploded = keys.select(
        F.explode(
            F.array(*[F.lit(s) for s in CMS_SEEDS])
        ).alias("seed"),
        F.col("o_custkey"),
    ).select(
        "seed",
        F.pmod(F.xxhash64("o_custkey", "seed"), F.lit(CMS_WIDTH)).alias(
            "bucket"
        ),
    )
    # The 3 x CMS_WIDTH bucket matrix is consumed once PER SEED by the
    # broadcast maps below — without materialization each per-seed slice
    # re-ran the explode+groupBy from its own orders scan (4 scans
    # total, measured r17). Materialize the <=6144-row matrix once.
    matrix = exploded.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_n")
    ).localCheckpoint(eager=False)
    exact = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    est = exact.select("o_custkey", "exact_n")
    for s in CMS_SEEDS:
        row = matrix.where(F.col("seed") == s).select(
            F.col("bucket").alias(f"b_{s}"),
            F.col("bucket_n").alias(f"n_{s}"),
        )
        est = est.join(
            F.broadcast(row),
            F.pmod(F.xxhash64("o_custkey", F.lit(s)), F.lit(CMS_WIDTH))
            == F.col(f"b_{s}"),
            "left",
        )
    estimate = F.least(*[F.col(f"n_{s}") for s in CMS_SEEDS])
    return est.select(
        "o_custkey",
        "exact_n",
        (estimate >= F.col("exact_n")).alias("cms_overestimates"),
    )
