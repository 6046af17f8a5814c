"""SQL DDL/DML catalog surface: CREATE TABLE AS SELECT + INSERT INTO.

Everything else in the registry drives the DataFrame API; a user migrating
from a SQL warehouse also needs the catalog verbs to work — CTAS into a
managed parquet table, appending with INSERT INTO, and reading the result
back by name through ``spark.sql``. This row proves that path end-to-end
under the oracle hash gate (and the bucketed lane, plans/bucketed.py,
already proves ``bucketBy`` managed tables; io.py the path-based sinks).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..scratch import detach_result, new_scratch_dir


@register(
    "sql_ddl_roundtrip",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS acctbal_cents
        FROM customer
        GROUP BY c_mktsegment
    """,
    doc="Catalog DDL/DML round-trip, all through spark.sql: CREATE TABLE "
    "... USING PARQUET AS SELECT loads the even-key half of customer "
    "into a managed table, INSERT INTO appends the odd-key half, and "
    "the aggregate read back BY NAME must hash-equal the full-table "
    "oracle — CTAS, append atomicity, and catalog resolution in one "
    "gate. Table names are invocation-unique and dropped after the "
    "result detaches (hermetic). Exact integer cents.",
    tags=("sql", "ddl", "catalog", "sink"),
)
def sql_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = f"cust_ddl_{uuid.uuid4().hex[:12]}"
    src = f"src_{t}"
    # table data lives under a scratch dir (external LOCATION), so a
    # crashed run's files are age-GC'd like every other fixture instead
    # of accumulating in the warehouse (review round 5)
    scratch = new_scratch_dir(f"ddl_{os.path.basename(sf_dir.rstrip('/'))}")
    loc = os.path.join(scratch, t)
    load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        (F.round(F.col("c_acctbal") * 100)).cast("long").alias("cents"),
    ).createOrReplaceTempView(src)
    try:
        spark.sql(
            f"CREATE TABLE {t} USING PARQUET LOCATION '{loc}' AS "
            f"SELECT * FROM {src} WHERE c_custkey % 2 = 0"
        )
        spark.sql(
            f"INSERT INTO {t} SELECT * FROM {src} WHERE c_custkey % 2 = 1"
        )
        agg = spark.sql(
            f"""
            SELECT c_mktsegment,
                   count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS acctbal_cents
            FROM {t} GROUP BY c_mktsegment
            """
        )
        out = detach_result(agg, scratch)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.catalog.dropTempView(src)
    return out


@register(
    "sql_pipe_syntax",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM lineitem
        WHERE l_quantity >= 10
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="Spark 4 SQL pipe syntax (SQL:2023-style |> chaining, the "
    "GoogleSQL/ZetaSQL form): FROM lineitem |> WHERE ... |> AGGREGATE "
    "... GROUP BY ... |> ORDER BY — the linear query style warehouse "
    "migrations increasingly arrive in. Catalyst parses pipes into the "
    "same logical plan as the classic form, so pushdown/codegen are "
    "identical; the oracle is the classic-syntax equivalent, proving "
    "the two spellings agree to the hash.",
    tags=("sql", "pipe", "agg"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"lineitem_pipe_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    try:
        out = spark.sql(f"""
            FROM {view}
            |> WHERE l_quantity >= 10
            |> AGGREGATE count(*) AS n_rows,
                         sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                             AS price_cents
               GROUP BY l_returnflag, l_linestatus
            |> ORDER BY l_returnflag, l_linestatus
        """)
        out = out.select(
            "l_returnflag",
            "l_linestatus",
            "n_rows",
            F.col("price_cents").cast("long").alias("price_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(view)


@register(
    "sql_udf_functions",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_totalprice >= 150000.0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Spark 4 SQL-defined functions (CREATE FUNCTION ... RETURN — "
    "the ANSI SQL/PSM form, no Python or JVM code): a SCALAR function "
    "(price→integer cents) and a TABLE function (orders above a "
    "threshold parameter) are declared in SQL and composed in one "
    "query. Catalyst INLINES both bodies into the calling plan — the "
    "scalar into the projection, the table function like a "
    "parameterized view — so pushdown and codegen are what the "
    "hand-inlined query gets, which is exactly what the oracle runs. "
    "Session-scoped temp functions with uuid names keep concurrent "
    "invocations hermetic.",
    tags=("sql", "udf", "function"),
)
def sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = uuid.uuid4().hex[:8]
    view, cents, hv = f"orders_{tag}", f"cents_{tag}", f"high_value_{tag}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {cents}(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)"
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {hv}(thresh DOUBLE) "
        "RETURNS TABLE(o_orderpriority STRING, o_totalprice DOUBLE) "
        f"RETURN SELECT o_orderpriority, o_totalprice FROM {view} "
        "WHERE o_totalprice >= thresh"
    )
    try:
        out = spark.sql(f"""
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   sum({cents}(o_totalprice)) AS total_cents
            FROM {hv}(CAST(150000.0 AS DOUBLE))
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """).select(
            "o_orderpriority",
            "n_orders",
            F.col("total_cents").cast("long").alias("total_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {cents}")
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {hv}")
        spark.catalog.dropTempView(view)


@register(
    "sql_parameterized",
    oracle="""
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS acctbal_cents
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal >= 1000.0
        GROUP BY n_name
        ORDER BY n_name
    """,
    doc="Parameterized SQL with named markers plus the IDENTIFIER() "
    "clause (Spark 4): table names bind through IDENTIFIER(:tbl) and "
    "the threshold through :min_bal, so neither is string-interpolated "
    "— the injection-safe form a SQL-warehouse migration should land "
    "on. Parameters bind at parse time into the same plan as literal "
    "SQL (pushdown intact), which the hash against the literal-SQL "
    "oracle proves.",
    tags=("sql", "parameterized", "join", "agg"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = uuid.uuid4().hex[:8]
    sup, nat = f"supplier_{tag}", f"nation_{tag}"
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(sup)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(nat)
    try:
        out = spark.sql(
            """
            SELECT n_name,
                   count(*) AS n_suppliers,
                   sum(CAST(round(s_acctbal * 100) AS BIGINT))
                       AS acctbal_cents
            FROM IDENTIFIER(:sup) JOIN IDENTIFIER(:nat)
              ON s_nationkey = n_nationkey
            WHERE s_acctbal >= :min_bal
            GROUP BY n_name
            ORDER BY n_name
            """,
            args={"sup": sup, "nat": nat, "min_bal": 1000.0},
        ).select(
            "n_name",
            "n_suppliers",
            F.col("acctbal_cents").cast("long").alias("acctbal_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(sup)
        spark.catalog.dropTempView(nat)


@register(
    "sql_session_variables",
    oracle="""
        SELECT l_returnflag AS rf,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        FROM lineitem
        WHERE l_quantity >= 30 AND l_discount <= 0.05
        GROUP BY l_returnflag
    """,
    doc="Spark 4 SQL session variables (SQL:2023 DECLARE / SET VARIABLE): "
    "thresholds live as typed session state and the query references "
    "them by name — the injection-safe alternative to f-string SQL "
    "for ad-hoc parameterization (sql_parameterized covers the "
    "parameter-marker form; variables persist across statements). "
    "Catalyst folds the variable reference to its literal at analysis "
    "time, so the plan is byte-identical to the constant query — "
    "which the oracle states directly. Variables are dropped in a "
    "finally so the shared session never leaks state between "
    "registry queries.",
    tags=("sql", "variables"),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"lineitem_var_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    qty_var = f"qty_floor_{uuid.uuid4().hex[:8]}"
    disc_var = f"disc_cap_{uuid.uuid4().hex[:8]}"
    try:
        spark.sql(f"DECLARE VARIABLE {qty_var} INT")
        spark.sql(f"SET VARIABLE {qty_var} = 30")
        spark.sql(f"DECLARE VARIABLE {disc_var} DOUBLE")
        spark.sql(f"SET VARIABLE {disc_var} = 0.05")
        out = spark.sql(f"""
            SELECT l_returnflag AS rf,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS qty_sum
            FROM {view}
            WHERE l_quantity >= {qty_var} AND l_discount <= {disc_var}
            GROUP BY l_returnflag
        """)
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TEMPORARY VARIABLE IF EXISTS {qty_var}")
        spark.sql(f"DROP TEMPORARY VARIABLE IF EXISTS {disc_var}")
        spark.catalog.dropTempView(view)
