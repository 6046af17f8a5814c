"""Round-7 wave 5: dynamic partition overwrite, interval merge,
Arrow-optimized scalar UDF."""

from __future__ import annotations

import os
import shutil
from collections import defaultdict

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced9 as a9
from gjenbruksstasjoner_kotid_estimering_spark.scratch import new_scratch_dir

from conftest import SF0001


def _partition_files(table: str) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for sub in os.listdir(table):
        if sub.startswith("event_type="):
            out[sub] = {
                n
                for n in os.listdir(os.path.join(table, sub))
                if n.endswith(".parquet")
            }
    return out


def test_dynamic_overwrite_replaces_only_present_partitions(spark):
    scratch = new_scratch_dir("dyn_ow_unit")
    try:
        ev = load_table(spark, SF0001, "events").select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        table = f"{scratch}/t"
        ev.write.partitionBy("event_type").parquet(table)
        before = _partition_files(table)
        corrected = ev.where(F.col("event_type") == "purchase").withColumn(
            "cents", F.col("cents") * 2
        )
        (
            corrected.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_type")
            .parquet(table)
        )
        after = _partition_files(table)
        # untouched partitions keep their EXACT files; purchase is new
        for part in before:
            if part == "event_type=purchase":
                assert after[part] != before[part]
            else:
                assert after[part] == before[part]
        # contrast: STATIC overwrite truncates the whole table — the
        # footgun dynamic mode exists to close
        (
            corrected.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("event_type")
            .parquet(table)
        )
        assert set(_partition_files(table)) == {"event_type=purchase"}
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_merge_intervals_matches_brute_force(spark):
    rows = sorted(
        load_table(spark, SF0001, "events").collect(),
        key=lambda r: (r.user_id, r.ts),
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r.ts)
    want = set()
    horizon_us = 600 * 1_000_000  # = IVL, in integer microseconds
    for uid, tss in per_user.items():
        us = [round(ts.timestamp() * 1e6) for ts in tss]
        island, start, end, n = 0, None, None, 0
        for t in us:
            if start is None or t > end:
                if start is not None:
                    want.add((uid, island, n, end - start))
                island += 1
                start, end, n = t, t + horizon_us, 1
            else:
                end = max(end, t + horizon_us)
                n += 1
        want.add((uid, island, n, end - start))
    got = {
        (r.user_id, r.island, r.n_events, r.span_us)
        for r in a9.timeseries_merge_intervals(spark, SF0001).collect()
    }
    assert got == want


def test_arrow_udf_runs_arrow_side_and_matches_sql(spark):
    df = a9.udf_arrow_scalar(spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # Arrow transport, not BatchEvalPython
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(
            tuple,
            load_table(spark, SF0001, "part")
            .select(
                F.regexp_replace(
                    F.trim(F.lower(F.col("p_name"))), " +", "_"
                ).alias("norm_name")
            )
            .groupBy("norm_name")
            .agg(F.count(F.lit(1)).alias("n_parts"))
            .collect(),
        )
    )
    assert got == want


def test_bitmap_rollup_equals_count_distinct(spark):
    out = a9.agg_bitmap_distinct_rollup(spark, SF0001).collect()
    ev = load_table(spark, SF0001, "events")
    want_day = {
        r.day: r.n
        for r in ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    want_month = {
        r.month: r.n
        for r in ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got_day = {r.bucket: r.n_users for r in out if r.level == "day"}
    got_month = {r.bucket: r.n_users for r in out if r.level == "month"}
    assert got_day == want_day
    assert got_month == want_month
    # the monthly level is a MERGE of daily words, so it must not be
    # the sum of daily distincts (users repeat across days)
    assert sum(want_day.values()) > sum(want_month.values())
