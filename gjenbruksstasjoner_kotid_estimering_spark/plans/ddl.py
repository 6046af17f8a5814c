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
