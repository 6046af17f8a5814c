"""File-source smoke: CSV / JSON-lines / text round-trips with explicit
schemas (testdata is parquet-only, so these verify the reader surface)."""

from __future__ import annotations

from gjenbruksstasjoner_kotid_estimering_spark.sources import files as fsrc


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], schema="id long, name string, v double"
    )
    out = str(tmp_path / "csv")
    fsrc.write_csv(df, out)
    back = fsrc.read_csv(spark, out, "id long, name string, v double")
    assert {tuple(r) for r in back.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y")], schema="id long, name string"
    )
    out = str(tmp_path / "jsonl")
    fsrc.write_jsonl(df, out)
    back = fsrc.read_jsonl(spark, out, "id long, name string")
    assert {tuple(r) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_text_read(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("line one\nline two\n")
    back = fsrc.read_text(spark, str(p))
    assert {r.value for r in back.collect()} == {"line one", "line two"}


def test_csv_malformed_row_permissive(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,v\n1,a,1.5\nnot_a_number,b,oops\n")
    back = fsrc.read_csv(spark, str(p), "id long, name string, v double")
    rows = back.collect()
    assert len(rows) == 2  # malformed row survives as nulls, not a crash
    assert any(r.id is None for r in rows)
