"""Pandas GROUPED_AGG UDF: values and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.operators import udaf2

from conftest import SF0001


def test_grouped_agg_matches_python_median(spark):
    got = {
        r.event_type: (r.n, r.median_x2_cents, r.sum_cents)
        for r in udaf2.udf_pandas_grouped_agg(spark, SF0001).collect()
    }
    ev = (
        load_table(spark, SF0001, "events")
        .where(F.col("value").isNotNull())
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(round(r.value * 100))
    for t, cents in groups.items():
        cents.sort()
        n = len(cents)
        med2 = cents[(n - 1) // 2] + cents[n // 2]
        assert got[t] == (n, med2, sum(cents))


def test_grouped_agg_plans_mixed_python_and_jvm_sections(spark):
    df = udaf2.udf_pandas_grouped_agg(spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the Python aggregate runs as the Arrow-batched grouped-agg node
    # (Spark 4 spells it ArrowAggregatePython) while count/sum stay in the
    # JVM HashAggregate branch, joined by a broadcast of the tiny agg
    assert "ArrowAggregatePython" in plan
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
