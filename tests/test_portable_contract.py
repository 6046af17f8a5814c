"""Cross-engine contract tests for the portable primitives.

The oracle gate works only because a handful of expressions evaluate
bit-identically in Spark and DuckDB: the 56-bit md5 integer
(functions.md5_long_col), whitespace tokenization (functions.text
.tokens_col vs the CASE-guarded string_split_regex), and epoch
microseconds (functions.epoch_us vs epoch_us()). These tests feed both
engines the same adversarial value set — unicode, empty strings,
whitespace runs, long strings — and compare column-for-column, so a
drift in either engine's semantics fails HERE with a value diff instead
of as an opaque hash mismatch in some downstream operator.
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from gjenbruksstasjoner_kotid_estimering_spark.functions import md5_long_col
from gjenbruksstasjoner_kotid_estimering_spark.functions.text import tokens_col


def _sample_strings() -> list[str]:
    rng = random.Random(7)
    words = ["alpha", "beta", "Ω", "ß", "中文", "naïve", "x" * 50, "0", "-1"]
    out = ["", " ", "  ", "a", "a b", "a  b", "tab\tsep", "nl\nsep"]
    for _ in range(150):
        n = rng.randint(1, 12)
        out.append(" ".join(rng.choice(words) for _ in range(n)))
    out.append(" leading")
    out.append("trailing ")
    return out


def test_md5_long_col_matches_duckdb(spark):
    vals = [s for s in _sample_strings() if s]  # md5('') is fine too; keep non-null
    vals.append("")
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, s string")
    got = {
        r.i: r.h
        for r in sdf.select("i", md5_long_col(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, v) for i, v in enumerate(vals)])
    want = dict(
        con.execute(
            "SELECT i, ('0x' || substring(md5(s), 1, 14))::BIGINT FROM t"
        ).fetchall()
    )
    assert got == want


def test_tokens_col_matches_duckdb_case_expr(spark):
    vals = _sample_strings()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, s string")
    got = {
        r.i: r.t
        for r in sdf.select("i", tokens_col(F.col("s")).alias("t")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, v) for i, v in enumerate(vals)])
    want = dict(
        con.execute(
            "SELECT i, CASE WHEN s = '' THEN [] "
            "ELSE string_split_regex(s, '\\s+') END FROM t"
        ).fetchall()
    )
    assert got == want


def test_epoch_us_matches_duckdb(spark):
    import datetime

    from gjenbruksstasjoner_kotid_estimering_spark.functions import epoch_us

    vals = [
        datetime.datetime(2020, 5, 6, 9, 40, 0),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(2038, 1, 19, 3, 14, 8, 123456),
        datetime.datetime(1900, 1, 1, 0, 0, 0, 1),
    ]
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, ts timestamp"
    )
    got = {
        r.i: r.us for r in sdf.select("i", epoch_us("ts").alias("us")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, v) for i, v in enumerate(vals)])
    want = dict(con.execute("SELECT i, epoch_us(ts) FROM t").fetchall())
    assert got == want


def test_no_oracle_emits_hugeint_or_wide_decimal():
    """Sweep every oracle's OUTPUT types through DuckDB's binder.

    DuckDB types sum(BIGINT) as HUGEINT and wide decimal aggregates as
    DECIMAL(38,x); both convert to float64 (or object) in pandas, so the
    driver's value-hash can never match Spark's int64 even when the values
    are equal — the r4/r5 merge_tx_time_travel red row. Plan-only (.types
    binds without executing), so this sweeps all ~180 oracles in seconds.
    """
    import os

    from gjenbruksstasjoner_kotid_estimering_spark import registry
    from gjenbruksstasjoner_kotid_estimering_spark.io import TABLES

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders = []
    for name, spec in sorted(registry.all_specs().items()):
        if spec.oracle is None:
            continue
        types = con.sql(spec.oracle).types
        for col, typ in zip(con.sql(spec.oracle).columns, types):
            t = str(typ).upper()
            wide_decimal = t.startswith("DECIMAL(") and int(
                t.split("(")[1].split(",")[0]
            ) > 18
            if t in ("HUGEINT", "UHUGEINT") or wide_decimal:
                offenders.append(f"{name}.{col}: {t}")
    assert not offenders, (
        "oracle columns that pandas will widen to float64/object "
        f"(add explicit CASTs): {offenders}"
    )
