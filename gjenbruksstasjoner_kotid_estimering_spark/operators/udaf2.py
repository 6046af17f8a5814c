"""Round-9 wave M — the Pandas GROUPED_AGG UDF lane.

The UDAF surface has three distinct engine paths, and a migrating user
hits all of them: ``applyInPandas`` (operators/udaf.py — full-group
DataFrame in, DataFrame out), SQL-registered Python UDFs
(plans/ddl.py), and the one covered here: ``@pandas_udf`` with a scalar
return used as a GROUPED AGGREGATE — Spark plans it as
``AggregateInPandas`` (Arrow-batched partial aggregation surface), the
shape that composes with ``groupBy().agg(...)`` alongside built-in
aggregates in the same plan. The aggregated quantity is an exact
integer (median×2 of cents, the repo's even-count-exactness trick), so
the row is fully oracle-checkable despite crossing the Python
boundary.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table
from ..registry import register


def _median_x2_udf():
    """Build the GROUPED_AGG pandas UDF lazily — @pandas_udf resolves its
    return type against the active session, so decoration must happen at
    call time, not module import."""

    @pandas_udf("long")
    def _median_x2_cents(cents: pd.Series) -> int:
        # Exact doubled median of an integer series: sorts once, returns
        # lo+hi of the middle pair (equal for odd counts) — integer math
        # only, no float percentile.
        s = cents.sort_values().reset_index(drop=True)
        n = len(s)
        lo = s.iloc[(n - 1) // 2]
        hi = s.iloc[n // 2]
        return int(lo) + int(hi)

    return _median_x2_cents


@register(
    "udf_pandas_grouped_agg",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(2 * median(CAST(round(value * 100) AS BIGINT))
                    AS BIGINT) AS median_x2_cents,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events
        WHERE value IS NOT NULL
        GROUP BY event_type
    """,
    doc="Pandas GROUPED_AGG UDF — the third UDAF engine path "
    "(AggregateInPandas): a @pandas_udf('long') scalar aggregate "
    "(exact doubled median over integer cents). Spark REFUSES to mix "
    "grouped-agg pandas UDFs with JVM aggregates in one agg() "
    "(INVALID_PANDAS_UDF_PLACEMENT), so the engine-correct composition "
    "is two aggregate branches over the same key joined back — the "
    "JVM count/sum side stays in codegen HashAggregate and the Python "
    "side is the Arrow-batched AggregateInPandas, with the ~100-row "
    "aggregated join broadcast. Doubled-median keeps even-count "
    "midpoints integer so the Python-side result hash-matches DuckDB's "
    "median()·2 exactly. Per-group data crosses to Python ONCE as "
    "Arrow columns — at 100 TB the cost model is bytes-per-group over "
    "Arrow, not per-row pickling; plan shape pinned in "
    "tests/test_udaf2.py.",
    tags=("udf", "udaf", "pandas", "arrow", "agg"),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialize the 2-column projection once: Spark refuses to mix a
    # built-in aggregate with a grouped-agg pandas UDF in one agg(), so
    # the JVM side and the Python side must stay separate aggregates —
    # but they re-scanned events independently (2 fact passes, r17).
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .localCheckpoint(eager=False)
    )
    median_x2 = _median_x2_udf()
    jvm_side = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    )
    py_side = ev.groupBy("event_type").agg(
        median_x2(F.col("cents")).alias("median_x2_cents")
    )
    return jvm_side.join(F.broadcast(py_side), "event_type").select(
        "event_type", "n", "median_x2_cents", "sum_cents"
    )
