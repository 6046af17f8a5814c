"""Round-8 wave D: AQE skew-join splitting and the _metadata column."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced11 as a11

from conftest import SF0001


def test_aqe_splits_the_skewed_partition(spark):
    plan = a11.aqe_skew_plan(spark, SF0001)
    # OptimizeSkewedJoin marks the final join node when it split a
    # partition — absent the skew, this literal never appears
    assert "skew=true" in plan
    assert "SortMergeJoin" in plan


def test_aqe_skew_values_match_unskewed_relational_join(spark):
    out = {
        (r.l_returnflag, r.heat): (r.n_rows, r.qty_sum)
        for r in a11.join_aqe_skew(spark, SF0001).collect()
    }
    li = load_table(spark, SF0001, "lineitem")
    # hot group = collapsed keys PLUS genuine l_orderkey=0 rows (0 % 4
    # == 0, so they keep key 0 and land on the HOT dim row)
    hot = (
        li.where((F.col("l_orderkey") % 4 != 0) | (F.col("l_orderkey") == 0))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        )
        .collect()
    )
    for r in hot:
        assert out[(r.l_returnflag, "HOT")] == (r.n, r.q)
    # totals conserved: every lineitem row lands in exactly one group
    assert sum(v[0] for v in out.values()) == li.count()


def test_file_metadata_layout_one_file_per_bucket(spark):
    rows = a11.scan_file_metadata(spark, SF0001).collect()
    assert len(rows) == a11.N_BUCKETS
    assert all(r.n_files == 1 for r in rows)
    ev = load_table(spark, SF0001, "events")
    assert sum(r.n_rows for r in rows) == ev.count()
    want = {
        r.bucket: r.n
        for r in ev.groupBy(
            (F.col("user_id") % a11.N_BUCKETS).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.bucket: r.n_rows for r in rows} == want
