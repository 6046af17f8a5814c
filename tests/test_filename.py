"""Filename-metadata parsing goldens (reference estimate_queue_test.py:29-39
and FIXTURES.md §2 image_files table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.functions import filename as fnm


def _parse(spark, names, ext="bin"):
    df = spark.createDataFrame([(n,) for n in names], schema="filename string")
    out = df.select(
        "filename",
        fnm.station_id_col(F.col("filename"), ext=ext).alias("station_id"),
        fnm.epoch_col(F.col("filename"), ext=ext).alias("epoch"),
    )
    return {r.filename: (r.station_id, r.epoch) for r in out.collect()}


def test_golden_parse(spark):
    """station_id_41_20200506T094000.bin → (41, 1588750800) — the Europe/Oslo
    DST anchor (estimate_queue_test.py:30)."""
    got = _parse(spark, ["station_id_41_20200506T094000.bin"])
    assert got["station_id_41_20200506T094000.bin"] == (41, 1588750800)


def test_malformed_names_null(spark):
    """The three malformed shapes the reference raises on
    (estimate_queue_test.py:33-39) → NULL in the set-oriented engine."""
    names = [
        "41_20200506T094000.bin",          # missing prefix
        "station_id_20200506T094000.bin",  # missing id
        "station_id_41_20200506T094000.jpg",  # wrong extension for .bin parse
    ]
    got = _parse(spark, names)
    for n in names:
        assert got[n] == (None, None), n


def test_winter_time(spark):
    """CET (UTC+1, no DST): 2020-01-15T12:00:00 Oslo = 11:00 UTC."""
    got = _parse(spark, ["station_id_7_20200115T120000.bin"])
    assert got["station_id_7_20200115T120000.bin"] == (7, 1579086000)
