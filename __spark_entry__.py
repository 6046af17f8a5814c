"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``gjenbruksstasjoner_kotid_estimering_spark``; this
module only adapts the registry to the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gjenbruksstasjoner_kotid_estimering_spark import registry  # noqa: E402
from gjenbruksstasjoner_kotid_estimering_spark.session import tune  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The whole reference pipeline (estimate_queue.py:181-192) as one
    declarative plan — see operators/asof_interp.queue_estimate.
    """
    tune(spark)
    return registry.queries()["queue_estimate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = registry.queries()
    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(tune(spark), sf_dir))
        for name, fn in base.items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per oracle-checkable query; rows-only ops
    (sketches, LSH, streaming state) are intentionally absent."""
    return registry.oracle_sql()
