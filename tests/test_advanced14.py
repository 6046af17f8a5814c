"""Round-9 wave I: KMV sketch, regex sequence matching, interval
arithmetic, and the streaming Python data source."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.io import load_table
from gjenbruksstasjoner_kotid_estimering_spark.plans import advanced14 as a14
from gjenbruksstasjoner_kotid_estimering_spark.sources.pyds import _row
from gjenbruksstasjoner_kotid_estimering_spark.streaming import (
    pystream,
)

from conftest import SF0001


def test_kmv_estimate_within_sketch_error_of_exact(spark):
    rows = {
        r.grp: r for r in a14.agg_kmv_sketch_rollup(spark, SF0001).collect()
    }
    orders = load_table(spark, SF0001, "orders")
    exact = {
        r.grp: r.n
        for r in orders.groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = orders.select("o_custkey").distinct().count()
    assert set(rows) == set(exact)
    for grp, r in rows.items():
        want = exact[grp]
        if r.n_kept < a14.KMV_K:
            # under K distinct hashes the sketch is exact (md5-48
            # collisions are negligible at this cardinality)
            assert r.distinct_est == want
        else:
            # 3/sqrt(K) relative-error envelope (~3 sigma at K=64)
            assert abs(r.distinct_est - want) <= want * 3 / (a14.KMV_K**0.5)


def test_kmv_merge_equals_sketch_of_union(spark):
    """The mergeability property, directly: the ALL row must equal a
    sketch built from the raw union (not just approximate it)."""
    rows = {
        r.grp: (r.n_kept, r.kth, r.distinct_est)
        for r in a14.agg_kmv_sketch_rollup(spark, SF0001).collect()
    }
    orders = load_table(spark, SF0001, "orders")
    direct = (
        orders.select(a14._kmv48(F.col("o_custkey")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(a14.KMV_K)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth"))
        .collect()[0]
    )
    assert rows["ALL"][0] == direct.n_kept
    assert rows["ALL"][1] == direct.kth


def test_regex_sequence_match_agrees_with_python_re(spark):
    got = {
        r.user_id: (r.n_events, r.n_matches)
        for r in a14.events_regex_sequence_match(spark, SF0001).collect()
    }
    ev = load_table(spark, SF0001, "events").collect()
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r.user_id, []).append(r)
    pat = re.compile(a14.SEQ_PATTERN)
    for uid, rs in seqs.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        s = "".join(r.event_type[0] for r in rs)
        n = len(pat.findall(s))
        if n > 0:
            assert got[uid] == (len(s), n)
        else:
            assert uid not in got


def test_interval_arithmetic_month_add_clamps(spark):
    rows = a14.sql_interval_arithmetic(spark, SF0001).collect()
    assert rows
    import datetime

    for r in rows:
        day = datetime.date.fromisoformat(r.order_day)
        plus3 = datetime.date.fromisoformat(r.plus_3_months)
        # add_months semantics: month index advances by exactly 3 and the
        # day clamps to the target month's length
        assert (plus3.year * 12 + plus3.month) - (
            day.year * 12 + day.month
        ) == 3
        assert plus3.day <= day.day or plus3.day in (28, 29, 30, 31)
        minus10 = datetime.date.fromisoformat(r.minus_10_days)
        assert (day - minus10).days == 10
        assert r.days_since_2020 == (day - datetime.date(2020, 1, 1)).days


def test_stream_python_datasource_drains_whole_series(spark):
    rows = pystream.stream_python_datasource_true(spark, SF0001).collect()
    want: dict[int, list] = {}
    for i in range(pystream.STREAM_ROWS):
        _, bucket, cents = _row(i)
        want.setdefault(bucket % 8, []).append((i, cents))
    assert {r.bucket_band for r in rows} == set(want)
    for r in rows:
        ids = [i for i, _ in want[r.bucket_band]]
        assert r.n == len(ids)
        assert r.sum_cents == sum(c for _, c in want[r.bucket_band])
        assert (r.first_id, r.last_id) == (min(ids), max(ids))
