"""Python Data Source API (Spark 4): partition planning, filter
pushdown absorption, and end-to-end parity for the graft_series source.
Oracle parity runs in test_correctness.py."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, LessThanOrEqual

from gjenbruksstasjoner_kotid_estimering_spark.sources.pyds import (
    BUCKET_MOD,
    GraftSeriesReader,
    _row,
    register_graft_series,
)


def _read_all(reader):
    rows = []
    for part in reader.partitions():
        rows.extend(reader.read(part))
    return rows


def test_pushdown_absorbs_bucket_predicates():
    reader = GraftSeriesReader({"rows": "1000", "partitions": "4"})
    remaining = list(
        reader.pushFilters(
            [GreaterThan(("bucket",), 9), LessThanOrEqual(("bucket",), 20)]
        )
    )
    assert remaining == []  # both fully absorbed
    rows = _read_all(reader)
    assert rows and all(10 <= r[1] <= 20 for r in rows)
    # absorption means filtered-out ids were never yielded
    assert len(rows) < 1000
    assert reader.rows_generated == len(rows)


def test_pushdown_equality_and_unsupported_passthrough():
    reader = GraftSeriesReader({"rows": "1000", "partitions": "4"})
    other = EqualTo(("value_cents",), 7)  # unsupported column
    remaining = list(
        reader.pushFilters([EqualTo(("bucket",), 5), other])
    )
    assert remaining == [other]  # returned by reference for Spark
    rows = _read_all(reader)
    assert rows and all(r[1] == 5 for r in rows)


def test_partitions_cover_range_exactly():
    reader = GraftSeriesReader({"rows": "103", "partitions": "8"})
    parts = reader.partitions()
    ids = []
    for p in parts:
        ids.extend(range(p.start, p.end))
    assert sorted(ids) == list(range(103))


def test_source_reads_in_spark(spark):
    register_graft_series(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("graft_series")
        .option("rows", 500)
        .option("partitions", 4)
        .load()
    )
    got = {r.id: (r.bucket, r.value_cents) for r in df.collect()}
    assert len(got) == 500
    for i in (0, 1, 499):
        _, b, c = _row(i)
        assert got[i] == (b, c)
    # a filtered read agrees with the unfiltered read filtered in Spark
    filt = df.where(F.col("bucket") == 3).collect()
    assert {r.id for r in filt} == {
        i for i, (b, _) in got.items() if b == 3
    }
    assert all(0 <= b < BUCKET_MOD for b, _ in got.values())
